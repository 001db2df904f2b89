from rdkafka_streams_spark.llm.dedup import (
    exact_dedup_stats,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    simhash,
)
from rdkafka_streams_spark.llm.similarity import cosine_topk, embedding_near_dups
from rdkafka_streams_spark.llm.text import (
    detect_language,
    fingerprint,
    text_quality,
    token_stats,
)

__all__ = [
    "cosine_topk",
    "detect_language",
    "embedding_near_dups",
    "exact_dedup_stats",
    "fingerprint",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_near_dups",
    "minhash_signatures",
    "simhash",
    "text_quality",
    "token_stats",
]
