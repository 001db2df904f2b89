from rdkafka_streams_spark.operators.asof import asof_join
from rdkafka_streams_spark.operators.topk import top_k, top_k_per_group
from rdkafka_streams_spark.operators.sampling import hash_sample

__all__ = ["asof_join", "top_k", "top_k_per_group", "hash_sample"]
