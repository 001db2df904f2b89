from rdkafka_streams_spark.llm.dedup import (
    char_shingles,
    exact_dedup,
    exact_dedup_stats,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from rdkafka_streams_spark.llm.similarity import (
    build_ivf_index,
    cosine_topk,
    embedding_near_dups,
    ivf_search,
)
from rdkafka_streams_spark.llm.text import (
    detect_language,
    fingerprint,
    text_quality,
    tfidf_top_terms,
    token_stats,
)

__all__ = [
    "build_ivf_index",
    "char_shingles",
    "cosine_topk",
    "detect_language",
    "embedding_near_dups",
    "exact_dedup",
    "exact_dedup_stats",
    "fingerprint",
    "ivf_search",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_near_dups",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "text_quality",
    "tfidf_top_terms",
    "token_stats",
]
