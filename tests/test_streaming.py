"""Broker-free streaming tests replicating the reference's scenarios
(SURVEY.md §5): produce-N-consume-N, JSON decode with hard-error semantics,
micro-batch pacing, filtered loop-back convergence, windowed agg with
watermark, stateful running count, delivery tracking.

File source + availableNow trigger stands in for the Kafka broker — the
micro-batch engine, state store, and sink paths are identical.
"""

from __future__ import annotations

import json
import shutil
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from rdkafka_streams_spark.streaming import (
    DeliveryListener,
    Duplex,
    KConsumer,
    KProducer,
    decode_values,
    encode_records,
    get_duplex,
)
from rdkafka_streams_spark.streaming.consumer import infer_schema_from_sample

VALUE_SCHEMA = "count long, source string"


def _kafka_shaped(spark, records, topic="bus"):
    """Batch frame shaped like Spark's Kafka source (envelope + JSON value)."""
    rows = [
        (None, json.dumps(r).encode(), topic, i % 3, i, None, 0)
        for i, r in enumerate(records)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )


# ------------------------------------------------- decode (Consumer semantics)
def test_decode_preserves_envelope_and_parses_value(spark):
    records = [{"count": i, "source": "origin"} for i in range(100)]
    raw = _kafka_shaped(spark, records)
    out = decode_values(raw, VALUE_SCHEMA)
    rows = out.collect()
    assert len(rows) == 100  # produce N → consume N (test_Consumer.coffee:55-69)
    assert set(out.columns) == {"key", "topic", "partition", "offset",
                                "timestamp", "timestampType", "size", "value"}
    assert rows[0]["size"] == len(json.dumps(records[0]).encode())
    assert rows[0]["value"]["source"] == "origin"
    assert rows[0]["offset"] == 0 and rows[0]["topic"] == "bus"


def test_decode_failfast_on_malformed(spark):
    raw = _kafka_shaped(spark, [{"count": 1, "source": "origin"}]).union(
        spark.createDataFrame(
            [(None, b"{not json", "bus", 0, 99, None, 0)],
            "key binary, value binary, topic string, partition int, offset long, "
            "timestamp timestamp, timestampType int",
        )
    )
    out = decode_values(raw, VALUE_SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception):  # stream error analog (src/Consumer.coffee:106-108)
        out.collect()


def test_decode_permissive_yields_null(spark):
    raw = spark.createDataFrame(
        [(None, b"{broken", "bus", 0, 0, None, 0)],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    rows = decode_values(raw, VALUE_SCHEMA, mode="PERMISSIVE").collect()
    assert rows[0]["value"] is None or rows[0]["value"]["count"] is None


def test_infer_schema_from_sample(spark):
    ddl = infer_schema_from_sample(spark, ['{"count": 1, "source": "x"}'])
    assert "count" in ddl and "source" in ddl


def test_infer_schema_from_multiline_and_mixed_sample(spark):
    """ADVICE r6: pretty-printed (embedded-newline) sample values must stay
    one logical document each — cross-row merge still unions fields — and a
    malformed value surfaces as _corrupt_record instead of shattering the
    whole sample."""
    pretty = '{\n  "count": 1,\n  "nested": {\n    "a": 2\n  }\n}'
    ddl = infer_schema_from_sample(spark, [pretty, '{"source": "x"}'])
    assert "count" in ddl and "nested" in ddl and "source" in ddl
    assert "_corrupt_record" not in ddl

    ddl_bad = infer_schema_from_sample(spark, [pretty, "not json at all"])
    assert "count" in ddl_bad and "_corrupt_record" in ddl_bad


# ------------------------------------------------- encode (Producer semantics)
def test_encode_roundtrip_and_partition_routing(spark):
    df = spark.createDataFrame(
        [(1, "origin", 2), (2, "origin", 0)], "count long, source string, part int"
    )
    out = encode_records(df, partition="part")
    rows = out.collect()
    assert set(out.columns) == {"value", "partition"}
    payload = json.loads(rows[0]["value"])
    assert payload == {"count": 1, "source": "origin"}  # whole-record JSON
    assert rows[0]["partition"] == 2  # intended semantics of Producer.coffee:71


def test_timestamp_col_rejected_on_kafka_transport(spark):
    """Advisor r7: Spark's Kafka sink schema (key/value/headers/topic/
    partition) has no timestamp column — carrying one on transport="kafka"
    would be silently ignored and the broker would stamp produce time, so
    CreateTime seeks (offsetsForTimes/startingTimestamp) read the wrong
    clock. KProducer raises instead; topiclog keeps honoring it."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "n long, s string") \
        .withColumn("ts", F.current_timestamp())
    p = KProducer(host="h:9092", topic="t", timestamp_col="ts", transport="kafka")
    with pytest.raises(ValueError, match="topiclog-only"):
        p._sink_format(df)
    # encode itself is transport-agnostic and still carries the column
    assert "timestamp" in p.encode(df).columns


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame([(7, "origin")], "count long, source string")
    enc = encode_records(df)
    raw = enc.select(
        F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("bus").alias("topic"), F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    back = decode_values(raw, VALUE_SCHEMA).collect()[0]["value"]
    assert back["count"] == 7 and back["source"] == "origin"


# ------------------------------------------------- duplex loop-back (§3.3)
def test_duplex_loopback_converges(spark):
    """The reference's 500-of-1000 filtered round-trip: transform re-tags, the
    guard drops re-tagged records → second hop produces nothing (no runaway
    amplification on the shared topic)."""
    d = get_duplex("nohost:9092", "bus", schema=VALUE_SCHEMA)
    records = [{"count": i, "source": "origin" if i % 2 else "transform"}
               for i in range(1000)]
    batch = decode_values(_kafka_shaped(spark, records), VALUE_SCHEMA)

    def transform(df):
        return df.withColumn(
            "value", F.struct(F.col("value.count").alias("count"),
                              F.lit("transform").alias("source"))
        )

    guard = F.col("value.source") == "origin"
    hop1 = d.apply_batch(batch, transform, guard)
    assert hop1.count() == 500  # test_getDuplex.coffee:69 — half round-trip
    hop2 = d.apply_batch(hop1, transform, guard)
    assert hop2.count() == 0  # convergence: guard stops the loop


def test_duplex_wiring():
    d = get_duplex("h:9092", "t", group_id="g", schema=VALUE_SCHEMA)
    assert isinstance(d, Duplex)
    assert d.consumer.topic == d.producer.topic == "t"
    assert d.consumer.group_id == "g"


def test_consumer_multi_topic_and_offsets():
    c = KConsumer(host="h:9092", topic=["a", "b"], from_offset="earliest")
    assert c._topics() == "a,b"  # asArray topic (src/Consumer.coffee:45)


# ------------------------------------------- micro-batch engine (file source)
@pytest.fixture()
def event_stream_dir(spark, sf_dir, tmp_path):
    # rewrite via Spark so ts is µs (raw fixture is TIMESTAMP(NANOS), which
    # the file stream source can't consume directly)
    from rdkafka_streams_spark.core.io import load_table

    d = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").coalesce(2).write.parquet(d)
    return d


def test_windowed_stream_with_watermark_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """T1+T4: tumbling window + watermark on a real micro-batch run
    (availableNow) equals the batch computation — no late data in replay, so
    the watermark drops nothing."""
    from rdkafka_streams_spark.core.io import load_table

    schema = load_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_stream_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) AS total FROM win_agg").collect()[0]["total"]
    expect = load_table(spark, sf_dir, "events").count()
    # append mode emits only watermark-closed windows; all but the last open
    # window close on the final batch → allow the open-window remainder
    assert got is not None and expect * 0.9 <= got <= expect


def test_stateful_running_count(spark, sf_dir, event_stream_dir, tmp_path):
    """T7: applyInPandasWithState running count per event_type equals batch
    groupBy count after the availableNow replay."""
    from rdkafka_streams_spark.core.io import load_table
    from rdkafka_streams_spark.streaming.stateful import running_count_stateful

    schema = load_table(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    counted = running_count_stateful(stream, ["event_type"])
    q = (
        counted.writeStream.format("memory")
        .queryName("state_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, max(n) AS n FROM state_counts GROUP BY event_type"
        ).collect()
    }
    expect = {
        r["event_type"]: r["count"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    assert final == expect


def test_stateful_ttl_evicts_idle_keys(spark, tmp_path):
    """T7 eviction: a key idle past its TTL emits a final expired=true row
    and its state leaves the store — the discipline unbounded-key streams
    need at scale (the reference's closure state never evicts)."""
    import time

    from rdkafka_streams_spark.streaming.lifecycle import shutdown
    from rdkafka_streams_spark.streaming.stateful import running_count_with_ttl

    src = tmp_path / "ttl_src"
    src.mkdir()
    spark.createDataFrame([("a",), ("a",), ("b",)], "k string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = spark.readStream.schema("k string").parquet(str(src))
    q = (
        running_count_with_ttl(stream, ["k"], ttl_ms=2000)
        .writeStream.format("memory").queryName("ttlq").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0.3 seconds")
        .start()
    )

    # NOTE: processAllAvailable() never returns for queries with
    # processing-time timers (pending timers keep work "available"), so the
    # drain pattern here is poll-until-condition with a deadline.
    def wait_for(cond, deadline_s=90):
        end = time.monotonic() + deadline_s
        while time.monotonic() < end:
            rows = spark.sql("SELECT * FROM ttlq").collect()
            if cond(rows):
                return rows
            time.sleep(0.5)
        raise AssertionError(f"condition not reached; table = {rows}")

    rows = wait_for(lambda rs: len(rs) >= 2)
    live = {(r["k"], r["expired"]): r["n"] for r in rows}
    assert live[("a", False)] == 2 and live[("b", False)] == 1

    time.sleep(4)  # let both keys sit idle past the 2 s TTL
    # new data (a different key) guarantees a batch in which timers fire
    spark.createDataFrame([("c",), ("c",), ("c",)], "k string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    rows = wait_for(
        lambda rs: sum(1 for r in rs if r["expired"]) >= 2
        and any(r["k"] == "c" for r in rs)
    )
    shutdown(q, 60)
    expired = {r["k"]: r["n"] for r in rows if r["expired"]}
    assert expired == {"a": 2, "b": 1}  # final counts flushed on eviction
    assert {r["k"]: r["n"] for r in rows if not r["expired"]}["c"] == 3


def test_stream_static_join(spark, sf_dir, event_stream_dir, tmp_path):
    """T6 (stream-static): streaming events enriched against a static dim;
    availableNow replay equals the batch join."""
    from rdkafka_streams_spark.core.io import load_table

    schema = load_table(spark, sf_dir, "events").schema
    static_dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id").count().withColumnRenamed("count", "user_total")
    )
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    joined = stream.join(static_dim, "user_id").where(F.col("user_total") > 0)
    q = (
        joined.writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ck_ssj"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM ss_join").collect()[0]["n"]
    assert got == load_table(spark, sf_dir, "events").count()


def test_streaming_dedup_within_watermark(spark, sf_dir, event_stream_dir, tmp_path):
    """T5: streaming dropDuplicates on a key subset keeps exactly one row per
    key across micro-batches (state-store backed)."""
    from rdkafka_streams_spark.core.io import load_table

    schema = load_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_stream_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["user_id", "event_type"])
    )
    q = (
        stream.writeStream.format("memory").queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT user_id || '|' || event_type) AS d FROM dedup_stream"
    ).collect()[0]
    expect = (
        load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct().count()
    )
    assert got["n"] == got["d"] == expect


def test_delivery_listener_counts_rows(spark, sf_dir, event_stream_dir, tmp_path):
    """F7: listener totals == rows delivered (the total-delivered event)."""
    from rdkafka_streams_spark.core.io import load_table

    listener = DeliveryListener()
    spark.streams.addListener(listener)
    try:
        schema = load_table(spark, sf_dir, "events").schema
        stream = spark.readStream.schema(schema).parquet(event_stream_dir)
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        expect = load_table(spark, sf_dir, "events").count()
        deadline = time.time() + 30
        while listener.total_delivered < expect and time.time() < deadline:
            time.sleep(0.5)  # listener events are async
        assert listener.total_delivered == expect
    finally:
        spark.streams.removeListener(listener)


def test_stream_stream_join_with_watermarks(spark, sf_dir, event_stream_dir, tmp_path):
    """T6 (stream-stream): purchases⋈errors per user within a 1-hour lookback,
    watermarks on BOTH sides (required for state cleanup in stream-stream
    joins); availableNow replay emits exactly the batch join's matches."""
    from rdkafka_streams_spark.core.io import load_table

    schema = load_table(spark, sf_dir, "events").schema

    def side(event_type, prefix):
        return (
            spark.readStream.schema(schema)
            .parquet(event_stream_dir)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("event_id").alias(f"{prefix}_id"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    cond = (
        "p_user = e_user AND "
        "e_ts BETWEEN p_ts - interval 1 hour AND p_ts"
    )
    joined = side("purchase", "p").join(side("error", "e"), F.expr(cond), "inner")
    q = (
        joined.writeStream.format("memory").queryName("sss_join")
        .option("checkpointLocation", str(tmp_path / "ck_sssj"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM sss_join").collect()[0]["n"]

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    e = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
    expect = p.join(e, F.expr("p_user = e_user AND e_ts BETWEEN p_ts - interval 1 hour AND p_ts")).count()
    assert got == expect and expect > 0


def test_transform_with_state_running_stats(spark, sf_dir, event_stream_dir, tmp_path):
    """T7 on the newer transformWithStateInPandas API — skipped where the
    protobuf wire dependency is absent (this container); the
    applyInPandasWithState path above is the tested equivalent."""
    from rdkafka_streams_spark.core.io import load_table
    from rdkafka_streams_spark.streaming.stateful import running_stats_tws, tws_available

    if not tws_available():
        pytest.skip("google.protobuf not available: TWS python worker cannot start")

    schema = load_table(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = running_stats_tws(stream, "event_type")
    q = (
        out.writeStream.format("memory").queryName("tws_stats").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, max(n) AS n FROM tws_stats GROUP BY event_type"
        ).collect()
    }
    expect = {
        r["event_type"]: r["count"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    assert got == expect


def test_foreach_batch_idempotent_sink(spark, sf_dir, event_stream_dir, tmp_path):
    """T8: foreachBatch per-batch-id overwrite sink — a replayed batch
    replaces its own output instead of duplicating it (effectively-exactly-
    once for file sinks over the engine's at-least-once replay)."""
    from rdkafka_streams_spark.core.io import load_table
    from rdkafka_streams_spark.streaming.sinks import (
        foreach_batch_overwrite,
        write_batch_overwrite,
    )

    schema = load_table(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        event_stream_dir
    )
    out = str(tmp_path / "sink_out")
    q = foreach_batch_overwrite(stream, out, str(tmp_path / "ck_fbo"))
    q.awaitTermination(120)

    expect = load_table(spark, sf_dir, "events").count()
    got = spark.read.parquet(out).count()
    assert got == expect

    # simulate an at-least-once redelivery: re-write batch 0 with the same id
    # (materialized first — a real redelivery comes from the source, not from
    # the directory being overwritten)
    src0 = spark.read.parquet(f"{out}/batch_id=0").drop("batch_id")
    batch0 = spark.createDataFrame(src0.collect(), src0.schema)
    write_batch_overwrite(batch0, 0, out)
    assert spark.read.parquet(out).count() == expect  # replaced, not duplicated


def test_decode_with_dlq_splits_good_and_bad(spark):
    """Dead-letter decode: malformed records keep their raw bytes + envelope
    on the DLQ side; good records decode; nothing is dropped or aborts."""
    from rdkafka_streams_spark.streaming.consumer import decode_with_dlq

    records = [{"count": i, "source": "origin"} for i in range(10)]
    raw = _kafka_shaped(spark, records)
    # poison two records
    poisoned = raw.withColumn(
        "value",
        F.when(F.col("offset").isin(3, 7), F.lit(b"{not json")).otherwise(F.col("value")),
    )
    good, bad = decode_with_dlq(poisoned, VALUE_SCHEMA)
    assert good.count() == 8
    assert {r["offset"] for r in bad.collect()} == {3, 7}
    # DLQ keeps original bytes for replay
    assert bad.collect()[0]["value"] == b"{not json"
    # good side fully decoded
    assert all(r["value"]["source"] == "origin" for r in good.collect())


def test_micro_batch_cap_bounds_batches(spark, sf_dir, tmp_path):
    """F1: the reference pulls ≤16 messages per loop iteration
    (src/Consumer.coffee:57); the Spark analog caps per-trigger intake.
    With maxFilesPerTrigger=1 over N files the replay must take exactly N
    micro-batches — the pacing contract backpressure relies on."""
    from rdkafka_streams_spark.core.io import load_table

    n_files = 5
    d = str(tmp_path / "paced")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(n_files).write.parquet(d)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        stream.writeStream.format("memory").queryName("paced")
        .option("checkpointLocation", str(tmp_path / "ck_paced"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) == n_files
    assert sum(p["numInputRows"] for p in batches) == ev.count()


def test_shutdown_idempotent_and_complete(spark, sf_dir, event_stream_dir, tmp_path):
    """F6: graceful shutdown is idempotent (double-destroy safe, unlike the
    reference's §1.4.3 bug) and leaves no active query behind."""
    from rdkafka_streams_spark.core.io import load_table
    from rdkafka_streams_spark.streaming import shutdown, shutdown_all

    schema = load_table(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    q = (
        stream.writeStream.format("memory").queryName("lc")
        .option("checkpointLocation", str(tmp_path / "ck_lc"))
        .trigger(processingTime="1 second").start()
    )
    assert shutdown(q) and shutdown(q)  # idempotent
    assert not q.isActive
    assert shutdown_all(spark) == 0  # nothing left running


def test_streaming_duplex_loopback_drains(spark, tmp_path):
    """§3.3 end-to-end in STREAMING mode (file dir as the shared topic):
    run 1 filters source=origin, re-tags, writes back to the same dir;
    run 2 (same checkpoint) sees only re-tagged records → the guard drops
    them all and writes nothing; run 3 confirms the fixpoint. This is the
    reference's 500-of-1000 round-trip with real micro-batches."""
    topic_dir = str(tmp_path / "topic")
    ck = str(tmp_path / "ck_loop")
    records = [
        (i, "origin" if i % 2 else "transform") for i in range(1000)
    ]
    spark.createDataFrame(records, "count long, source string").coalesce(2).write.parquet(topic_dir)

    def run_once() -> None:
        stream = spark.readStream.schema("count long, source string").parquet(topic_dir)
        hop = stream.where(F.col("source") == "origin").withColumn("source", F.lit("transform"))
        q = (
            hop.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(topic_dir)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # 500 origin records re-tagged and written back
    assert spark.read.parquet(topic_dir).count() == 1500
    run_once()  # loop-back records all fail the guard → nothing new
    assert spark.read.parquet(topic_dir).count() == 1500
    run_once()  # fixpoint stable
    counts = dict(
        spark.read.parquet(topic_dir).groupBy("source").count().collect()
    )
    assert counts == {"origin": 500, "transform": 1000}


def test_observed_metrics_report_per_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """F7 via in-plan observation: observedMetrics carries the exact
    delivered-row count per committed batch (dr-report analog, no extra
    aggregation pass over the stream)."""
    from rdkafka_streams_spark.core.io import load_table
    from rdkafka_streams_spark.streaming.listeners import with_observed_count

    schema = load_table(spark, sf_dir, "events").schema
    stream = with_observed_count(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(event_stream_dir)
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck_obs"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    observed = sum(
        int(p["observedMetrics"]["delivered"]["rows"])
        for p in q.recentProgress
        if "delivered" in (p.get("observedMetrics") or {})
    )
    assert observed == load_table(spark, sf_dir, "events").count()


def test_streaming_dlq_single_pass_fanout(spark, tmp_path):
    """DLQ in streaming: ONE foreachBatch splits each micro-batch into good
    and dead-letter sinks (single source pass — two writeStreams would scan
    the topic twice). Poisoned records land raw+replayable in the DLQ."""
    import json as _json

    from rdkafka_streams_spark.streaming.consumer import decode_with_dlq

    src_dir = str(tmp_path / "src")
    rows = []
    for i in range(100):
        payload = b"{broken" if i % 10 == 0 else _json.dumps(
            {"count": i, "source": "origin"}
        ).encode()
        rows.append((payload, i))
    spark.createDataFrame(rows, "value binary, offset long").write.parquet(src_dir)

    good_dir, bad_dir = str(tmp_path / "good"), str(tmp_path / "bad")

    def split(batch, batch_id):
        good, bad = decode_with_dlq(batch, VALUE_SCHEMA)
        good.write.mode("append").parquet(good_dir)
        bad.write.mode("append").parquet(bad_dir)

    q = (
        spark.readStream.schema("value binary, offset long").parquet(src_dir)
        .writeStream.foreachBatch(split)
        .option("checkpointLocation", str(tmp_path / "ck_dlqs"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(good_dir).count() == 90
    bad = spark.read.parquet(bad_dir)
    assert bad.count() == 10
    assert bad.first()["value"] == b"{broken"  # raw bytes kept for replay


def test_observe_metrics_on_stream(spark, sf_dir, event_stream_dir, tmp_path):
    """F7/T8 via the engine's own metric channel: DataFrame.observe attaches
    named aggregates that surface per-batch in QueryProgress.observedMetrics
    — in-flight row counts and value sums without a second query (the
    engine-native form of the reference's periodic total-delivered event,
    src/Producer.coffee:54-61, measured on the data plane itself)."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    from rdkafka_streams_spark.core.io import load_table

    seen: dict[str, int] = {"rows": 0, "purchases": 0}

    class Collect(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            m = e.progress.observedMetrics.get("delivery")
            if m is not None:
                seen["rows"] += m["n_rows"]
                seen["purchases"] += m["n_purchases"]

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            pass

    listener = Collect()
    spark.streams.addListener(listener)
    try:
        schema = load_table(spark, sf_dir, "events").schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(event_stream_dir)
            .observe(
                "delivery",
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
            )
        )
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck_obs"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ev = load_table(spark, sf_dir, "events")
        want_rows = ev.count()
        want_purch = ev.where(F.col("event_type") == "purchase").count()
        deadline = time.time() + 30
        while seen["rows"] < want_rows and time.time() < deadline:
            time.sleep(0.5)  # listener events are async
        assert seen["rows"] == want_rows
        assert seen["purchases"] == want_purch
    finally:
        spark.streams.removeListener(listener)


def test_session_windows_stateful_cross_batch(spark, tmp_path):
    """T7: session_windows_stateful closes sessions across MICRO-BATCH
    boundaries — an open session carried in state must merge with the next
    batch's continuation rows, and only closed sessions are ever emitted."""
    import pandas as pd

    from rdkafka_streams_spark.streaming.stateful import session_windows_stateful

    gap = 100
    # user a: [0, 50, 80] | gap | [300] | gap | [600]  -> closes (0..80), (300..300)
    # user b: [10] | gap | [400, 450]                  -> closes (10..10)
    batches = [
        [("a", 0), ("a", 50), ("b", 10)],
        [("a", 80), ("a", 300)],
        [("b", 400), ("a", 600), ("b", 450)],
    ]
    src = tmp_path / "sess_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        pd.DataFrame(rows, columns=["user_id", "ts_us"]).to_parquet(
            src / f"b{i}.parquet"
        )
    stream = spark.readStream.schema("user_id string, ts_us long").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = session_windows_stateful(stream, gap_us=gap)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.table("sess_out").collect()
    }
    assert got == {("a", 0, 80, 3), ("a", 300, 300, 1), ("b", 10, 10, 1)}


def test_progress_latency_percentiles_nearest_rank():
    """VERDICT r6 item 5: p50/p95 extraction from QueryProgress dicts —
    nearest-rank percentiles over row-moving batches only; idle ticks and
    missing duration keys are skipped, not zero-filled."""
    from rdkafka_streams_spark.streaming.listeners import progress_latency_percentiles

    progresses = [
        {"numInputRows": 10,
         "durationMs": {"triggerExecution": ms, "addBatch": ms - 5}}
        for ms in (10, 20, 30, 40, 50, 60, 70, 80, 90, 100)
    ]
    progresses.insert(3, {"numInputRows": 0,
                          "durationMs": {"triggerExecution": 9999}})  # idle tick
    progresses.append({"numInputRows": 5, "durationMs": {}})  # no durations
    got = progress_latency_percentiles(progresses)
    assert got["batches"] == 11  # 10 with durations + 1 without, idle excluded
    # nearest-rank over [10..100]: p50 = 5th value = 50, p95 = 10th = 100
    assert got["triggerExecution_p50_ms"] == 50.0
    assert got["triggerExecution_p95_ms"] == 100.0
    assert got["addBatch_p50_ms"] == 45.0
    assert got["addBatch_p95_ms"] == 95.0

    empty = progress_latency_percentiles([])
    assert empty == {"batches": 0}


def test_streaming_hdr_sketch_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """r13: the mergeable quantile sketch (llm/text.py hdr_bucket_expr)
    as a STREAMING aggregation — bucket is a stateless map-side
    expression, so the sketch table is an ordinary streaming groupBy:
    per micro-batch partial sketches merge by cell-wise add (the
    mergeability the unit pins is exactly what makes the operator
    streaming-safe in complete/update mode). The replayed stream's
    final table equals the batch-built sketch cell for cell."""
    from rdkafka_streams_spark.core.io import load_table
    from rdkafka_streams_spark.llm.text import (
        hdr_bucket_expr,
        hdr_histogram_table,
    )

    schema = load_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_stream_dir)
        .select(
            F.expr(hdr_bucket_expr("CAST(value AS BIGINT)"))
            .cast("bigint").alias("idx")
        )
        .groupBy("idx")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hdr_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_hdr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["idx"]: r["cnt"]
        for r in spark.sql("SELECT idx, cnt FROM hdr_stream").collect()
    }
    batch = {
        r["idx"]: r["cnt"]
        for r in hdr_histogram_table(
            load_table(spark, sf_dir, "events").select(
                F.col("value").cast("bigint").alias("v")
            ),
            "v",
        ).collect()
    }
    assert got == batch and len(got) > 3
