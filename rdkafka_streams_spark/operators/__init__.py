from rdkafka_streams_spark.operators.asof import asof_join
from rdkafka_streams_spark.operators.bloomjoin import bloom_build, bloom_prune
from rdkafka_streams_spark.operators.bucketing import read_bucketed, write_bucketed
from rdkafka_streams_spark.operators.cdc import scd2_build, scd2_merge
from rdkafka_streams_spark.operators.editdist import deletion_variants, fuzzy_join_dist1
from rdkafka_streams_spark.operators.funnel import funnel_steps
from rdkafka_streams_spark.operators.graph import (
    connected_components,
    connected_components_star,
    count_triangles,
)
from rdkafka_streams_spark.operators.ranking import global_rank
from rdkafka_streams_spark.operators.profiling import profile_table
from rdkafka_streams_spark.operators.sampling import hash_sample, temperature_sample
from rdkafka_streams_spark.operators.skew import key_skew_profile, salted_join
from rdkafka_streams_spark.operators.zorder import morton_key, zorder_by
from rdkafka_streams_spark.operators.topk import (
    top_k,
    top_k_per_group,
    top_k_per_group_salted,
)

__all__ = [
    "asof_join",
    "bloom_build",
    "bloom_prune",
    "connected_components",
    "connected_components_star",
    "count_triangles",
    "deletion_variants",
    "funnel_steps",
    "fuzzy_join_dist1",
    "global_rank",
    "hash_sample",
    "morton_key",
    "profile_table",
    "read_bucketed",
    "key_skew_profile",
    "salted_join",
    "scd2_build",
    "scd2_merge",
    "temperature_sample",
    "top_k",
    "top_k_per_group",
    "top_k_per_group_salted",
    "write_bucketed",
    "zorder_by",
]
