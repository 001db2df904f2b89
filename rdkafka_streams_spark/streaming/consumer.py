"""KConsumer — the reference Consumer re-expressed on Structured Streaming.

Reference behavior being replicated (SURVEY.md §2.1 S1, §3.1):

- subscribe to one or many Kafka topics          (src/Consumer.coffee:45)
- JSON-decode each message value                 (src/Consumer.coffee:91)
- emit the full envelope (topic/partition/offset/key/timestamp) with the
  decoded value merged in                        (src/Consumer.coffee:96)
- malformed JSON is a hard stream error          (src/Consumer.coffee:84-94,
  106-108) → FAILFAST parse mode
- `fromOffset` → auto.offset.reset               (src/Consumer.coffee:26)
- pull-batch bound (16 msgs/loop)                (src/Consumer.coffee:57)
  → maxOffsetsPerTrigger (per-micro-batch cap); backpressure itself is
  built into the micro-batch engine (§2.2 F2/F4).

Divergence by design: the reference is schemaless (whatever JSON.parse
yields); at 100 TB a declared schema is non-negotiable, so KConsumer takes a
StructType/DDL string. ``infer_schema_from_sample`` covers migration from
schemaless topics.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Columns of Spark's Kafka source — the analog of the reference's message
#: envelope (src/Consumer.coffee:96 keeps all of these alongside `value`).
ENVELOPE_COLUMNS = ("key", "topic", "partition", "offset", "timestamp", "timestampType")


def decode_values(
    raw: DataFrame,
    schema: StructType | str,
    mode: str = "FAILFAST",
    value_col: str = "value",
) -> DataFrame:
    """Envelope-preserving JSON decode: binary/string value → typed struct.

    FAILFAST reproduces the reference's error-on-bad-JSON (a malformed record
    aborts the stream, src/Consumer.coffee:106-108); PERMISSIVE is the
    dead-letter-friendly alternative the reference lacks.
    """
    envelope = [c for c in raw.columns if c != value_col]
    return raw.select(
        *envelope,
        # node-rdkafka's message struct carries the value byte length as
        # `size`; the reference keeps it in the envelope (src/Consumer.coffee:96)
        F.octet_length(F.col(value_col)).alias("size"),
        F.from_json(
            F.col(value_col).cast("string"), schema, {"mode": mode}
        ).alias(value_col),
    )


def decode_with_dlq(
    raw: DataFrame,
    schema: StructType | str,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter decode: (good, bad) split of the stream.

    The reference aborts the whole stream on one malformed record
    (src/Consumer.coffee:106-108) — unacceptable when one poisoned message
    can stall a 100 TB/day topic. Here a malformed value yields a NULL
    struct (PERMISSIVE), and the raw record is routed to the dead-letter
    frame (original bytes + envelope intact for replay) while good records
    flow on. Both frames share one source scan; sinks attach to each.
    """
    # PERMISSIVE from_json yields a struct of NULL fields for bad input (not
    # a NULL struct), so malformedness is detected the supported way: a
    # corrupt-record column inside the parse schema.
    corrupt = "__corrupt"
    if isinstance(schema, str):
        aug = f"{schema}, {corrupt} string"
    else:
        aug = schema.add(corrupt, "string")
    decoded = raw.withColumn(
        "__parsed",
        F.from_json(
            F.col(value_col).cast("string"),
            aug,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
        ),
    )
    is_bad = F.col(f"__parsed.{corrupt}").isNotNull()
    envelope = [c for c in raw.columns if c != value_col]
    good = decoded.where(~is_bad).select(
        *envelope, F.col("__parsed").dropFields(corrupt).alias(value_col)
    )
    bad = decoded.where(is_bad).drop("__parsed")
    return good, bad


def infer_schema_from_sample(spark: SparkSession, sample_values: Sequence[str]) -> str:
    """Schema migration helper for schemaless topics: schema inferred from a
    bounded JSON sample via the JSON datasource's own cross-row schema merge
    (schema_of_json needs a single foldable literal, so it can't union a
    sample).

    Cluster-safe (ADVICE r6): the sample ships INSIDE the job via a
    distributed dataset of strings — never a driver-local tempfile path,
    which executors on a real cluster (or with fs.defaultFS=HDFS) cannot
    resolve. Each value is compacted (``json.dumps(json.loads(v))``) first
    so pretty-printed/multiline documents stay one logical record instead
    of shattering into malformed JSONL lines; unparseable values pass
    through untouched and surface as ``_corrupt_record``, same as the
    decode path would classify them. The bounded driver-side sample is the
    one sanctioned RDD use in the repo (SURVEY §7.0 exception): it is the
    documented Spark API for multi-document JSON inference and the data is
    O(sample), not O(topic)."""
    import json

    compacted = []
    for v in sample_values:
        try:
            compacted.append(json.dumps(json.loads(v), ensure_ascii=False))
        except ValueError:
            compacted.append(v)
    strings = spark.createDataFrame(
        [(v,) for v in compacted], "value string"
    ).rdd.map(lambda r: r[0])
    schema = spark.read.json(strings).schema
    return schema.simpleString()[7:-1]  # strip struct<...> wrapper


def consume_n(
    stream_df: DataFrame,
    n: int,
    timeout_s: float = 60.0,
    checkpoint: str | None = None,
) -> list:
    """Consume exactly ``n`` records from a stream, then stop the query —
    the reference's take-N-and-destroy pattern (``++count === total →
    @destroy()``, test/test_Consumer.coffee:65-66; SURVEY.md §2.3 R6).

    Driver-side accumulation is bounded by ``n`` (never the stream), the
    query is stopped gracefully at a batch boundary, and the checkpoint (if
    given) records only fully processed batches — a restarted consumer
    re-reads anything beyond ``n`` from the interrupted batch
    (at-least-once, matching the reference). Returns the first ``n`` rows.
    """
    import tempfile
    import time

    from rdkafka_streams_spark.streaming.lifecycle import shutdown

    rows: list = []

    def sink(batch: DataFrame, _bid: int) -> None:
        needed = n - len(rows)
        if needed > 0:
            rows.extend(batch.limit(needed).collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint or tempfile.mkdtemp(prefix="consume_n_ck"))
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    deadline = time.monotonic() + timeout_s
    while len(rows) < n and time.monotonic() < deadline:
        time.sleep(0.2)
    shutdown(q, timeout_s)
    return rows[:n]


@dataclass
class KConsumer:
    """Kafka topic(s) → streaming DataFrame of envelope + decoded value.

    Mirrors ``new Consumer({host, topic, groupId, fromOffset})``
    (src/Consumer.coffee:9-27). ``batch_size`` mirrors the ≤16-message pull
    loop as a per-trigger offset cap.
    """

    host: str
    topic: str | Sequence[str]
    group_id: str | None = None
    #: "earliest" | "latest" (src/Consumer.coffee:26), or the Kafka-source
    #: per-partition JSON form '{"topic": {"0": 23, "1": -2}}' (-2 earliest,
    #: -1 latest) — honored by both transports.
    from_offset: str = "latest"
    #: seek-by-time (``Consumer.offsetsForTimes`` / the Kafka source's
    #: ``startingTimestamp``): epoch-ms; overrides ``from_offset``. A
    #: partition with no record at/after the timestamp starts at LATEST
    #: (the Kafka source's startingOffsetsByTimestampStrategy="latest").
    from_timestamp: int | None = None
    pattern: bool = False  # subscribe to a topic regex instead of a list
    #: manual partition assignment (librdkafka ``assign()``; the Kafka
    #: source's third subscription mode): JSON '{"topic": [0, 2]}' —
    #: overrides ``topic``/``pattern``
    assign: str | None = None
    #: Kafka source includeHeaders: envelope grows a
    #: headers array<struct<key,value>> column (ordered, duplicates legal)
    include_headers: bool = False
    schema: StructType | str | None = None
    mode: str = "FAILFAST"
    batch_size: int | None = None
    options: dict[str, str] = field(default_factory=dict)
    #: "kafka" (production; needs the connector jar) or "topiclog" (the
    #: in-repo durable log, streaming/topiclog.py — ``host`` is the log root
    #: dir). Same envelope either way; queries don't change.
    transport: str = "kafka"
    #: value deserialization: "json" (src/Consumer.coffee:91), "avro"
    #: (streaming/avro_codec.py; ``schema`` is then the Avro schema JSON),
    #: or "avro-confluent" (Confluent wire format: writer schema resolved by
    #: id from the registry, decoded with Avro schema resolution against
    #: ``schema`` as the READER schema — or the subject's latest when
    #: ``schema`` is None; streaming/schema_registry.py).
    value_format: str = "json"
    #: schema-registry directory for "avro-confluent"; defaults to
    #: ``<host>/.schema_registry`` on the topiclog transport.
    registry_root: str | None = None
    #: registry subject for the reader-schema default (TopicNameStrategy
    #: ``<topic>-value`` when None).
    subject: str | None = None
    #: Kafka ``isolation.level``: "read_uncommitted" (default — all data
    #: records) or "read_committed" (records of aborted/open producer
    #: transactions filtered; control records invisible at both levels).
    isolation: str = "read_uncommitted"
    #: key deserialization: "string" (leave the envelope's binary key) or
    #: "avro-confluent" (framed one-field Avro record decoded from subject
    #: ``<topic>-key`` — the CDC/compacted-topic shape).
    key_format: str = "string"

    def _topics(self) -> str:
        t = self.topic
        return t if isinstance(t, str) else ",".join(t)  # src/Consumer.coffee:45

    def stream(self, spark: SparkSession) -> DataFrame:
        """Build the streaming DataFrame (the Readable-stream analog)."""
        if self.transport == "topiclog":
            from rdkafka_streams_spark.streaming import topiclog

            topiclog.register(spark)
            starting = self.from_offset
            if self.from_timestamp is not None:
                # resolve time → offsets at build, like the Kafka source's
                # driver-side offsetsForTimes lookup behind startingTimestamp
                import json as _json

                log = topiclog.TopicLog(self.host)
                if self.assign is not None:
                    seek_topics = list(_json.loads(self.assign))
                elif self.pattern:
                    # expand the regex to real topics BEFORE the time→offset
                    # lookup; seeking on the raw pattern string would resolve
                    # zero partitions and silently replay from earliest
                    import re as _re

                    pat = _re.compile(self._topics())
                    seek_topics = [t for t in log.topics() if pat.fullmatch(t)]
                else:
                    seek_topics = self._topics().split(",")
                starting = _json.dumps({
                    t: {
                        str(pid): (-1 if off is None else off)
                        for pid, off in log.offsets_for_times(
                            t, self.from_timestamp
                        ).items()
                    }
                    for t in seek_topics
                })
            reader = (
                spark.readStream.format(topiclog.FORMAT_NAME)
                .option("path", self.host)
                .option("startingOffsets", starting)
            )
            if self.assign is not None:
                reader = reader.option("assign", self.assign)
            else:
                reader = reader.option(
                    "subscribePattern" if self.pattern else "subscribe", self._topics()
                )
            if self.include_headers:
                reader = reader.option("includeHeaders", "true")
            if self.batch_size is not None:
                reader = reader.option("batchSize", str(self.batch_size))
            if self.isolation != "read_uncommitted":
                reader = reader.option("isolation", self.isolation)
            for k, v in self.options.items():
                reader = reader.option(k, v)
            return self.decode(reader.load())
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.host)
        )
        if self.assign is not None:
            reader = reader.option("assign", self.assign)
        else:
            reader = reader.option(
                "subscribePattern" if self.pattern else "subscribe", self._topics()
            )
        if self.from_timestamp is not None:
            reader = reader.option(
                "startingTimestamp", str(self.from_timestamp)
            ).option("startingOffsetsByTimestampStrategy", "latest")
        else:
            reader = reader.option("startingOffsets", self.from_offset)
        if self.include_headers:
            reader = reader.option("includeHeaders", "true")
        if self.group_id:
            reader = reader.option("kafka.group.id", self.group_id)
        if self.batch_size is not None:
            reader = reader.option("maxOffsetsPerTrigger", str(self.batch_size))
        if self.isolation != "read_uncommitted":
            reader = reader.option("kafka.isolation.level", self.isolation)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        try:
            raw = reader.load()
        except Exception as e:  # connector jar not on the classpath
            if "kafka" in str(e).lower():
                raise RuntimeError(
                    "Kafka source requires the spark-sql-kafka connector on the "
                    "classpath (spark-submit --packages "
                    "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); "
                    "for broker-free use, call .decode(df) on any Kafka-shaped frame"
                ) from e
            raise
        return self.decode(raw)

    def _resolve_registry_root(self) -> str:
        import os

        root = self.registry_root
        if root is None:
            if self.transport != "topiclog":
                raise ValueError(
                    "'avro-confluent' decode on transport='kafka' needs an "
                    "explicit registry_root"
                )
            root = os.path.join(self.host, ".schema_registry")
        return root

    def decode(self, raw: DataFrame) -> DataFrame:
        """Apply the envelope-preserving decode to any Kafka-shaped frame —
        the broker-free seam used by tests (memory/file sources provide the
        same columns)."""
        def _sole_topic(why: str) -> str:
            # TopicNameStrategy subjects are per-topic: auto-resolving the
            # reader schema across a topic LIST (comma form, typed list, a
            # multi-topic manual ASSIGN, or a regex subscription) would
            # silently decode every topic's records against one arbitrary
            # subject — reject, like a client without a subject to look
            # up. The remedies genuinely available: subscribe to one
            # topic, pass an explicit reader (``schema`` / ``subject`` on
            # the value side), or decode per-topic after a filter.
            if self.pattern:
                raise ValueError(
                    f"{why} with subscribePattern cannot auto-resolve a "
                    "reader: a regex names no TopicNameStrategy subject — "
                    "subscribe to one concrete topic, or split the stream "
                    "per topic and decode each against its own subject"
                )
            if self.assign is not None:
                import json as _json

                topics = sorted(_json.loads(self.assign))
            else:
                topics = (self.topic.split(",")
                          if isinstance(self.topic, str)
                          else list(self.topic))
            if len(topics) == 1:
                return topics[0]
            raise ValueError(
                f"{why} with a multi-topic subscription cannot "
                f"auto-resolve a reader: TopicNameStrategy is per topic, "
                f"and {sorted(topics)} would all decode under "
                f"{topics[0]!r}'s subject — subscribe to one topic, or "
                "split the stream per topic and decode each against its "
                "own subject"
            )

        if self.key_format == "avro-confluent":
            # framed Avro key (subject <topic>-key): decode to its record
            # struct in place, orthogonal to the value format
            from rdkafka_streams_spark.streaming.schema_registry import (
                SchemaRegistry,
                from_avro_confluent,
            )

            kroot = self._resolve_registry_root()
            t = _sole_topic("key_format='avro-confluent'")
            _, kreader = SchemaRegistry(kroot).latest(f"{t}-key")
            raw = raw.select(*[
                from_avro_confluent(F.col("key"), kroot, kreader).alias("key")
                if c == "key" else c
                for c in raw.columns
            ])
        if self.value_format == "avro-confluent":
            from rdkafka_streams_spark.streaming.schema_registry import (
                SchemaRegistry,
                from_avro_confluent,
            )

            root = self._resolve_registry_root()
            reader = self.schema
            if reader is None:
                if self.subject is not None:
                    _, reader = SchemaRegistry(root).latest(self.subject)
                else:
                    t = _sole_topic("value_format='avro-confluent'")
                    _, reader = SchemaRegistry(root).latest(f"{t}-value")
            envelope = [c for c in raw.columns if c != "value"]
            return raw.select(
                *envelope,
                F.octet_length(F.col("value")).alias("size"),
                from_avro_confluent(F.col("value"), root, reader).alias("value"),
            )
        if self.schema is None:
            return raw
        if self.value_format == "avro":
            from rdkafka_streams_spark.streaming.avro_codec import from_avro_py

            envelope = [c for c in raw.columns if c != "value"]
            return raw.select(
                *envelope,
                F.octet_length(F.col("value")).alias("size"),
                from_avro_py(F.col("value"), self.schema).alias("value"),
            )
        return decode_values(raw, self.schema, self.mode)
