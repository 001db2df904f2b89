"""KProducer — the reference Producer re-expressed on Structured Streaming.

Reference behavior being replicated (SURVEY.md §2.1 S2, §3.2):

- serialize the whole record to JSON bytes          (src/Producer.coffee:77)
- produce to a fixed topic                          (src/Producer.coffee:73-78)
- partition routing by a record's `partition` field (src/Producer.coffee:71 —
  buggy in the reference: CoffeeScript `?` makes it a boolean; implemented
  here with the *intended* semantics, SURVEY.md §1.4.1)
- queue-full retry / delivery buffering is the Kafka producer's own
  buffering inside Spark's sink (§2.2 F3) — no user code
- delivery tracking (`dr` / `total-delivered`, src/Producer.coffee:42-61) →
  micro-batch commits + DeliveryListener (listeners.py)

Delivery semantics match the reference's at-least-once (it calls cb() on
enqueue, src/Producer.coffee:87); Spark's checkpointing adds effective
exactly-once per micro-batch into idempotent/transactional sinks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def encode_records(
    df: DataFrame,
    key: str | Column | None = None,
    partition: str | None = None,
    value_format: str = "json",
    avro_schema: str | None = None,
    timestamp: str | None = None,
    headers: str | None = None,
    schema_id: int | None = None,
    key_format: str = "string",
    key_avro_schema: str | None = None,
    key_schema_id: int | None = None,
) -> DataFrame:
    """Record → Kafka sink frame: serialize all payload columns into
    ``value``, optionally keeping a key and an explicit partition column
    (intended semantics of src/Producer.coffee:71).

    ``value_format="json"`` is the reference's JSON.stringify analog
    (JVM-side ``to_json``). ``"avro"`` emits Avro binary records via
    streaming/avro_codec.py — schema auto-derived from the payload columns
    when ``avro_schema`` is None (spark-avro SchemaConverters rule:
    nullable fields → ``["null", T]`` unions).

    ``timestamp`` names a column to carry as the record's CreateTime
    (``offsetsForTimes`` / ``startingTimestamp`` seek against it). It stays
    OUT of the serialized value, like key and partition. TOPICLOG-ONLY:
    Spark's Kafka sink schema is key/value/headers/topic/partition — no
    timestamp column — so on ``transport="kafka"`` the broker stamps
    produce time instead and time seeks would run against the wrong clock;
    KProducer raises there rather than silently drift.

    ``headers`` names a column of Kafka record headers
    (``array<struct<key:string, value:binary>>``, the sink contract shape —
    ordered, duplicate keys legal); it likewise rides the envelope, not the
    value."""
    payload = [c for c in df.columns if c not in (partition, timestamp, headers)]
    if value_format == "avro-confluent":
        # Confluent wire format: 0x00 + u32 schema id + Avro body — the
        # framing every registry-backed estate actually ships. The caller
        # (KProducer.encode) has already registered the schema and owns the
        # id; this stage is pure serialization.
        from rdkafka_streams_spark.streaming.schema_registry import (
            to_avro_confluent,
        )

        if avro_schema is None or schema_id is None:
            raise ValueError(
                "value_format='avro-confluent' needs avro_schema AND "
                "schema_id (register via SchemaRegistry, or use KProducer "
                "which does it for you)"
            )
        out = [
            to_avro_confluent(
                F.struct(*payload), avro_schema, schema_id
            ).alias("value")
        ]
    elif value_format == "avro":
        from rdkafka_streams_spark.streaming.avro_codec import (
            spark_to_avro_schema,
            to_avro_py,
        )

        schema = avro_schema or spark_to_avro_schema(
            df.select(*payload).schema, name="value"
        )
        out = [to_avro_py(F.struct(*payload), schema).alias("value")]
    elif value_format == "json":
        out = [F.to_json(F.struct(*payload)).alias("value")]
    else:
        raise ValueError(f"unknown value_format {value_format!r}")
    if key is not None:
        k = F.col(key) if isinstance(key, str) else key
        if key_format == "avro-confluent":
            # framed Avro KEY (subject <topic>-key): the CDC/compaction
            # shape — the key is a one-field record, so key equality is
            # byte equality (Avro binary encoding is deterministic) and
            # compaction/tombstones work unchanged on framed keys
            from rdkafka_streams_spark.streaming.schema_registry import (
                to_avro_confluent,
            )

            if key_avro_schema is None or key_schema_id is None:
                raise ValueError(
                    "key_format='avro-confluent' needs key_avro_schema AND "
                    "key_schema_id (KProducer registers them for you)"
                )
            out.insert(0, to_avro_confluent(
                F.struct(k), key_avro_schema, key_schema_id
            ).alias("key"))
        elif key_format == "string":
            out.insert(0, k.cast("string").alias("key"))
        else:
            raise ValueError(f"unknown key_format {key_format!r}")
    if partition is not None:
        out.append(F.col(partition).cast("int").alias("partition"))
    if timestamp is not None:
        out.append(F.col(timestamp).cast("timestamp").alias("timestamp"))
    if headers is not None:
        out.append(
            F.col(headers)
            .cast("array<struct<key: string, value: binary>>")
            .alias("headers")
        )
    return df.select(*out)


@dataclass
class KProducer:
    """Writable-stream analog: ``df → Kafka topic`` with JSON values.

    Mirrors ``new Producer({host, topic})`` (src/Producer.coffee:8-27).
    """

    host: str
    topic: str
    key: str | None = None
    partition_col: str | None = None
    checkpoint: str | None = None
    #: transactional producer id (Kafka ``transactional.id`` analog): on the
    #: topiclog transport, streaming commits marked with (txn_id, batchId)
    #: dedup replayed micro-batches sink-side — at-least-once upgrades to
    #: effectively-exactly-once across restarts (topiclog.py
    #: _commit_staged_txn; restart-window caveat documented there).
    txn_id: str | None = None
    #: topiclog streaming sink only: publish each micro-batch as ONE
    #: producer transaction (records batch-tagged, WAL'd segment links,
    #: commit markers, single-rename visibility flip) — a read_committed
    #: consumer sees every batch exactly once and never partially, even
    #: across crash-replay; read_uncommitted degrades to at-least-once
    #: (topiclog.py _commit_staged_atomic).
    atomic: bool = False
    options: dict[str, str] = field(default_factory=dict)
    #: "kafka" (production) or "topiclog" (in-repo durable log; ``host`` is
    #: the log root dir). Identical sink contract (value/key/partition cols).
    transport: str = "kafka"
    #: value serialization: "json" (reference-faithful), "avro" (raw binary
    #: records via streaming/avro_codec.py; schema auto-derived when
    #: ``avro_schema`` is None), or "avro-confluent" (Confluent wire format:
    #: magic + schema id + body, schema auto-REGISTERED under ``subject`` in
    #: the registry at ``registry_root`` with ``compatibility`` checking —
    #: streaming/schema_registry.py).
    value_format: str = "json"
    avro_schema: str | None = None
    #: schema-registry directory for "avro-confluent"; defaults to
    #: ``<host>/.schema_registry`` on the topiclog transport (the registry
    #: lives beside the log, like __consumer_offsets does).
    registry_root: str | None = None
    #: registry subject; defaults to Confluent's TopicNameStrategy
    #: ``<topic>-value``.
    subject: str | None = None
    #: compatibility gate applied at auto-registration (BACKWARD / FORWARD /
    #: FULL / NONE — Confluent's modes). None = resolve from registry
    #: config (``set_compatibility``: subject override → global default →
    #: BACKWARD), so the estate's contract is registry state, not a
    #: per-producer argument.
    compatibility: str | None = None
    #: key serialization: "string" (reference-faithful cast) or
    #: "avro-confluent" (the key rides as a framed one-field Avro record
    #: under subject ``<topic>-key`` — the CDC/compacted-topic shape; key
    #: equality stays byte equality, so compaction and tombstones work
    #: unchanged on framed keys).
    key_format: str = "string"
    key_avro_schema: str | None = None
    #: column carried as the record's CreateTime (``offsetsForTimes`` /
    #: ``startingTimestamp`` seek against it); default: produce wall-clock.
    #: topiclog-only — the real Kafka sink has no timestamp column
    #: (_sink_format raises rather than let the broker silently stamp
    #: produce time under a CreateTime-seeking caller).
    timestamp_col: str | None = None
    #: column of Kafka record headers (array<struct<key,value>>), carried on
    #: the envelope like the real sink's optional headers column.
    headers_col: str | None = None

    def _registry_root(self) -> str:
        import os

        if self.registry_root is not None:
            return self.registry_root
        if self.transport == "topiclog":
            return os.path.join(self.host, ".schema_registry")
        raise ValueError(
            "value_format='avro-confluent' on transport='kafka' needs an "
            "explicit registry_root (a path every executor can read)"
        )

    def encode(self, df: DataFrame) -> DataFrame:
        """The pure serialization stage (broker-free testable seam).

        For ``avro-confluent`` this is also where the schema meets the
        registry: derive (or take) the Avro schema, register it under the
        subject (idempotent; compatibility-gated against the latest
        version), and frame every record with the returned id — the
        produce-time half of rolling schema evolution."""
        schema, sid = self.avro_schema, None
        if self.value_format == "avro-confluent":
            from rdkafka_streams_spark.streaming.avro_codec import (
                spark_to_avro_schema,
            )
            from rdkafka_streams_spark.streaming.schema_registry import (
                SchemaRegistry,
            )

            payload = [
                c for c in df.columns
                if c not in (self.partition_col, self.timestamp_col,
                             self.headers_col)
            ]
            if schema is None:
                schema = spark_to_avro_schema(
                    df.select(*payload).schema, name="value"
                )
            sid = SchemaRegistry(self._registry_root()).register(
                self.subject or f"{self.topic}-value", schema,
                compatibility=self.compatibility,
            )
        kschema, ksid = self.key_avro_schema, None
        if self.key_format == "avro-confluent":
            if self.key is None:
                raise ValueError("key_format='avro-confluent' needs a key")
            from rdkafka_streams_spark.streaming.avro_codec import (
                spark_to_avro_schema,
            )
            from rdkafka_streams_spark.streaming.schema_registry import (
                SchemaRegistry,
            )

            k = F.col(self.key) if isinstance(self.key, str) else self.key
            if kschema is None:
                kschema = spark_to_avro_schema(df.select(k).schema, name="key")
            ksid = SchemaRegistry(self._registry_root()).register(
                f"{self.topic}-key", kschema,
                compatibility=self.compatibility,
            )
        return encode_records(
            df,
            key=self.key,
            partition=self.partition_col,
            value_format=self.value_format,
            avro_schema=schema,
            timestamp=self.timestamp_col,
            headers=self.headers_col,
            schema_id=sid,
            key_format=self.key_format,
            key_avro_schema=kschema,
            key_schema_id=ksid,
        )

    def _sink_format(self, df: DataFrame):
        if self.transport == "topiclog":
            from rdkafka_streams_spark.streaming import topiclog

            topiclog.register(df.sparkSession)
            opts = {"path": self.host, "topic": self.topic}
            if self.txn_id is not None:
                opts["txnId"] = self.txn_id
            if self.atomic:
                lowered = {k.lower(): v for k, v in self.options.items()}
                comp = topiclog._norm_compression(
                    lowered.get("compression.type")
                )
                if comp or lowered.get("client.id"):
                    # fail HERE, synchronously — the sink writer raises the
                    # same error, but only once the stream thread starts.
                    # Value-normalized, matching the writer: an explicit
                    # compression.type=none is NOT a conflict.
                    raise ValueError(
                        "atomic=true is incompatible with compression.type/"
                        "client.id: the atomic WAL hard-links staged files, "
                        "so it can neither recompress nor meter at commit"
                    )
                opts["atomic"] = "true"
            return topiclog.FORMAT_NAME, opts
        if self.atomic:
            raise ValueError(
                "atomic=True is topiclog-only: Spark's Kafka sink has no "
                "transactional produce (each task's records become visible "
                "as they are sent); use txn_id for replay dedup instead"
            )
        if self.timestamp_col is not None:
            raise ValueError(
                "timestamp_col is topiclog-only: Spark's Kafka sink schema "
                "(key/value/headers/topic/partition) has no timestamp column, "
                "so the broker would stamp produce time and CreateTime seeks "
                "(offsetsForTimes/startingTimestamp) would read the wrong clock"
            )
        opts = {"kafka.bootstrap.servers": self.host, "topic": self.topic}
        if self.txn_id is not None:
            opts["kafka.transactional.id"] = self.txn_id
        return "kafka", opts

    def write(
        self, df: DataFrame, trigger: str | None = None, available_now: bool = False
    ) -> StreamingQuery:
        """Start the streaming write (the `.write(obj)` loop analog)."""
        fmt, base_opts = self._sink_format(df)
        writer = self.encode(df).writeStream.format(fmt)
        for k, v in base_opts.items():
            writer = writer.option(k, v)
        if self.checkpoint:
            writer = writer.option("checkpointLocation", self.checkpoint)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        if trigger:
            writer = writer.trigger(processingTime=trigger)
        elif available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def write_batch(self, df: DataFrame) -> None:
        """One-shot batch produce (the reference has no analog — its tests
        hand-pump records; this is the availableNow-style convenience)."""
        fmt, base_opts = self._sink_format(df)
        writer = self.encode(df).write.format(fmt).mode("append")
        for k, v in base_opts.items():
            writer = writer.option(k, v)
        for k, v in self.options.items():  # same passthrough as write():
            writer = writer.option(k, v)   # producer configs apply to both
        writer.save()
