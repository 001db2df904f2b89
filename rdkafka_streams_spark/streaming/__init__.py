from rdkafka_streams_spark.streaming.consumer import KConsumer, consume_n, decode_values
from rdkafka_streams_spark.streaming.producer import KProducer, encode_records
from rdkafka_streams_spark.streaming.duplex import Duplex, get_duplex
from rdkafka_streams_spark.streaming.listeners import DeliveryListener
from rdkafka_streams_spark.streaming.stateful import (
    running_count_stateful,
    running_count_with_ttl,
)
from rdkafka_streams_spark.streaming.sinks import foreach_batch_overwrite, write_batch_overwrite
from rdkafka_streams_spark.streaming.lifecycle import shutdown, shutdown_all
from rdkafka_streams_spark.streaming.topiclog import (
    IllegalGenerationError,
    TopicLog,
    TopicLogDataSource,
    commit_query_progress,
    read_topic,
)
from rdkafka_streams_spark.streaming.avro_codec import (
    avro_functions,
    from_avro_py,
    spark_to_avro_schema,
    to_avro_py,
)
from rdkafka_streams_spark.streaming.assignors import (
    cooperative_rebalance,
    range_assign,
    roundrobin_assign,
    sticky_assign,
)
from rdkafka_streams_spark.streaming.mirror import (
    checkpoint_group,
    checkpoint_group_failback,
    mirror_topic,
    translate_offsets,
    translate_offsets_upstream,
)
from rdkafka_streams_spark.streaming.acl import (
    AclBinding,
    AclStore,
    AuthorizationError,
)
from rdkafka_streams_spark.streaming.sharegroups import (
    FencedShareCoordinatorError,
    InvalidRecordStateError,
    ShareGroup,
)

__all__ = [
    "AclBinding",
    "AclStore",
    "AuthorizationError",
    "FencedShareCoordinatorError",
    "InvalidRecordStateError",
    "ShareGroup",
    "DeliveryListener",
    "Duplex",
    "IllegalGenerationError",
    "KConsumer",
    "KProducer",
    "TopicLog",
    "TopicLogDataSource",
    "consume_n",
    "decode_values",
    "encode_records",
    "foreach_batch_overwrite",
    "get_duplex",
    "read_topic",
    "commit_query_progress",
    "running_count_stateful",
    "range_assign",
    "roundrobin_assign",
    "sticky_assign",
    "cooperative_rebalance",
    "mirror_topic",
    "translate_offsets",
    "checkpoint_group",
    "checkpoint_group_failback",
    "translate_offsets_upstream",
    "running_count_with_ttl",
    "shutdown",
    "shutdown_all",
    "write_batch_overwrite",
    "avro_functions",
    "from_avro_py",
    "spark_to_avro_schema",
    "to_avro_py",
]
