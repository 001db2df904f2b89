"""Cross-cluster topic replication with offset translation — the
MirrorMaker 2 surface (KIP-382) over the topiclog transport.

The reference is a single-cluster client (`/root/reference/src/
Consumer.coffee` takes one ``host``), but every estate it would run in
eventually mirrors topics across clusters for DR — and the moment a
consumer group fails over, its committed offsets are meaningless on the
target cluster: the target topic starts at 0 while the source's head was
retention-trimmed, and read_committed replication drops aborted records,
so source offset ``c`` does NOT point at the same record downstream.
MM2 solves that with three pieces, replicated here:

- **DefaultReplicationPolicy naming**: source topic ``t`` lands as
  ``<alias>.t`` downstream, so cycles are detectable and provenance is
  in the name.
- **offset-syncs**: a compacted internal topic
  (``mm2-offset-syncs.<alias>.internal``) of sparse
  (source offset → target offset) pairs per partition. We emit one sync
  every ``sync_interval`` replicated records AND one immediately after
  any gap (filtered aborted record) — which makes every inter-sync
  region exactly 1:1, so translation is EXACT everywhere, not just
  conservative (an improvement over MM2's nearest-sync-below answer,
  affordable because gaps are rare).
- **checkpoints**: ``checkpoint_group`` reads a group's committed
  offsets on the source, translates them through the sync store, and
  commits them under the same group on the target (MM2's
  ``sync.group.offsets.enabled`` behavior) — a failed-over consumer
  resumes exactly where the source group left off.

Scale shape: replication is ONE pass over the source topic with ONE
shuffle (repartition to target partitions + in-partition sort by source
offset — the order-preservation MM2 gets from its single-threaded
per-partition copy loop). Without isolation filtering the offset map is
the pure arithmetic ``dst = src - log_start`` (map-side, no window);
with read_committed filtering the running filtered-count needs the same
per-partition window the sort already paid for. The sync store is
O(records / sync_interval + gaps) — metadata-sized; translation collects
only it, never record data.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rdkafka_streams_spark.streaming.topiclog import (
    FORMAT_NAME,
    TopicLog,
    read_topic,
    register,
)


def remote_topic(alias: str, topic: str) -> str:
    """DefaultReplicationPolicy: ``t`` on cluster ``alias`` → ``alias.t``."""
    return f"{alias}.{topic}"


def syncs_topic(alias: str) -> str:
    return f"mm2-offset-syncs.{alias}.internal"


def mirror_topic(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    topic: str,
    *,
    alias: str = "primary",
    isolation: str = "read_uncommitted",
    sync_interval: int = 64,
    include_headers: bool = True,
) -> dict:
    """Replicate ``topic`` from the source log to ``<alias>.topic`` on the
    target log, byte-faithfully (key/value/partition/CreateTime/headers),
    and write the offset-sync records translation needs.

    INCREMENTAL: each run replicates only source records past the last
    run's high-water mark (every run seals each partition with a final
    sync for its last replicated record, so the resume point — and the
    next target offset — is the last sync, durably). Run it repeatedly
    and you have MM2's continuous copy as a sequence of batch deltas.
    The target must be owned by this mirror alone (MM2's rule — it is
    the sole producer of remote topics): a remote partition holding
    records that the sync store doesn't account for fails the
    consistency check. ``isolation="read_committed"`` additionally
    requires no OPEN transaction touching the topic at run time (the
    LSO gate: an open txn's records occupy source offsets this run would
    skip past and never revisit once it commits). Returns
    ``{"topic", "syncs_topic", "partitions", "start_offsets"}``."""
    if sync_interval < 1:
        raise ValueError("sync_interval must be >= 1")
    src = TopicLog(src_root)
    dst = TopicLog(dst_root)
    n_parts = len(src.partitions(topic))
    if n_parts == 0:
        raise ValueError(f"unknown source topic {topic!r}")
    if isolation == "read_committed":
        for txn in sorted(src.unresolved_txn_ids()):
            st = src.txn_state(txn)
            if st["state"] == "open" and topic in st.get("partitions", {}):
                raise ValueError(
                    f"open transaction {txn!r} touches {topic!r}: a "
                    "read_committed mirror would skip its offsets and lose "
                    "the records if it later commits (LSO gate) — commit or "
                    "abort it first"
                )
    dtopic = remote_topic(alias, topic)
    dst.create_topic(dtopic, partitions=n_parts)
    dst_ends = dst.end_offsets(dtopic)
    prior = _load_syncs(spark, dst_root, alias, topic) if (
        any(dst_ends.values()) and syncs_topic(alias) in dst.topics()
    ) else {}
    start_src: dict[int, int] = {}
    dst_base: dict[int, int] = {}
    for p in range(n_parts):
        if prior.get(p):
            last_src, last_dst = prior[p][-1]
            if dst_ends.get(p, 0) != last_dst + 1:
                raise ValueError(
                    f"target {dtopic!r} p{p} ends at {dst_ends.get(p, 0)} "
                    f"but the sync store accounts for {last_dst + 1} — a "
                    "foreign writer broke the mirror's ownership"
                )
            start_src[p], dst_base[p] = last_src + 1, last_dst + 1
        else:
            if dst_ends.get(p, 0):
                raise ValueError(
                    f"target {dtopic!r} p{p} is non-empty with no sync "
                    "records — not this mirror's topic"
                )
            start_src[p], dst_base[p] = -2, 0  # -2 = earliest

    raw = read_topic(
        spark, src_root, topic,
        include_headers=include_headers, isolation=isolation,
        startingOffsets=json.dumps(
            {topic: {str(p): o for p, o in start_src.items()}}
        ),
    )
    # Target offset = base + count of surviving records before this one.
    # The window's exchange+sort IS the order-preservation replication
    # needs anyway (each target partition written by one task in
    # source-offset order, MM2's per-partition copy loop) — no second
    # shuffle; the trailing sortWithinPartitions collapses into the
    # window's sort. row_number (not offset arithmetic) stays correct
    # under retention trims, compaction holes, and read_committed
    # filtering alike.
    base_map = F.create_map(
        *[x for p, b in sorted(dst_base.items()) for x in (F.lit(p), F.lit(b))]
    )
    w = Window.partitionBy("partition").orderBy("offset")
    ordered = (
        raw.repartition(n_parts, "partition")
        .withColumn(
            "__dst",
            base_map[F.col("partition")] + F.row_number().over(w) - F.lit(1),
        )
        .sortWithinPartitions("partition", "offset")
    )
    # sync points: every sync_interval-th record, the record right after
    # any source-offset gap (keeps regions 1:1 exact), the first record
    # of the run (covers the inter-run boundary), and the LAST record of
    # each partition (the high-water mark the next run resumes from)
    prev_off = F.lag("offset").over(w)
    is_sync = (
        (F.col("__dst") % sync_interval == 0)
        | prev_off.isNull()
        | (F.col("offset") - prev_off > 1)
        | F.lead("offset").over(w).isNull()
    )
    marked = ordered.withColumn("__sync", is_sync)

    sink_cols = ["key", "value", "partition", "timestamp"]
    if include_headers:
        sink_cols.append("headers")
    register(spark)
    (
        marked.select(*sink_cols)
        .write.format(FORMAT_NAME).mode("append")
        .option("path", dst_root).option("topic", dtopic)
        .option("tombstones", "true")  # preserve compacted-topic deletes
        .save()
    )
    stopic = syncs_topic(alias)
    if stopic not in dst.topics():
        dst.create_topic(stopic, partitions=1)
    (
        marked.where("__sync")
        .select(
            F.to_json(
                F.struct(
                    F.lit(topic).alias("topic"),
                    F.col("partition").alias("p"),
                    F.col("offset").alias("src"),
                    F.col("__dst").alias("dst"),
                )
            ).alias("value")
        )
        .write.format(FORMAT_NAME).mode("append")
        .option("path", dst_root).option("topic", stopic)
        .save()
    )
    return {
        "topic": dtopic,
        "syncs_topic": stopic,
        "partitions": n_parts,
        "start_offsets": start_src,  # -2 = from earliest (bootstrap run)
    }


def _load_syncs(
    spark: SparkSession, dst_root: str, alias: str, topic: str
) -> dict[int, list[tuple[int, int]]]:
    """Sync store for one topic: {partition: [(src, dst), ...] sorted}.
    Collects ONLY the sparse sync records (O(records/interval + gaps))."""
    rows = (
        read_topic(spark, dst_root, syncs_topic(alias))
        .select(
            F.from_json(
                F.col("value").cast("string"),
                "topic string, p int, src bigint, dst bigint",
            ).alias("s")
        )
        .where(F.col("s.topic") == topic)
        .select("s.p", "s.src", "s.dst")
        .collect()
    )
    out: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        out.setdefault(r["p"], []).append((r["src"], r["dst"]))
    return {p: sorted(v) for p, v in out.items()}


def translate_offsets(
    spark: SparkSession,
    dst_root: str,
    topic: str,
    src_offsets: dict[int, int],
    *,
    alias: str = "primary",
) -> dict[int, int]:
    """RemoteClusterUtils.translateOffsets: source-cluster committed
    offsets → target-cluster offsets for ``<alias>.topic``.

    For each partition, takes the latest sync at-or-below the committed
    offset and extends it linearly (regions between syncs are 1:1 by
    construction), bounded above by the next sync's target offset (a
    commit pointing inside a filtered run must not overshoot past it)
    and clamped into the target's valid offset range. A commit below the
    first replicated record (source head was retention-trimmed before
    mirroring) resumes at the target's beginning — re-read everything
    that still exists, Kafka's auto.offset.reset=earliest posture."""
    syncs = _load_syncs(spark, dst_root, alias, topic)
    dst = TopicLog(dst_root)
    dtopic = remote_topic(alias, topic)
    ends = dst.end_offsets(dtopic)
    begins = dst.beginning_offsets(dtopic)
    out: dict[int, int] = {}
    for p, c in src_offsets.items():
        ss = syncs.get(p, [])
        below = [s for s in ss if s[0] <= c]
        above = [s for s in ss if s[0] > c]
        if not below:
            out[p] = begins.get(p, 0)
            continue
        s_src, s_dst = below[-1]
        cand = s_dst + (c - s_src)
        if above:
            cand = min(cand, above[0][1])
        out[p] = max(begins.get(p, 0), min(cand, ends.get(p, cand)))
    return out


def translate_offsets_upstream(
    spark: SparkSession,
    dst_root: str,
    src_root: str,
    topic: str,
    dst_offsets: dict[int, int],
    *,
    alias: str = "primary",
) -> dict[int, int]:
    """The FAILBACK direction: target-cluster offsets on ``<alias>.topic``
    → source-cluster offsets on ``topic`` (MM2's upstream translation,
    the half RemoteClusterUtils does when traffic returns to the primary
    after a DR exercise). Same sync store read the other way: linear
    extension of the nearest sync at-or-below the target offset —
    exact, because every inter-sync region is 1:1 by construction —
    bounded by the next sync's source offset and clamped into the
    source's live offset range (the primary may have retention-trimmed
    or appended while traffic was away)."""
    syncs = _load_syncs(spark, dst_root, alias, topic)
    src = TopicLog(src_root)
    ends = src.end_offsets(topic)
    begins = src.beginning_offsets(topic)
    out: dict[int, int] = {}
    for p, d in dst_offsets.items():
        ss = syncs.get(p, [])
        below = [s for s in ss if s[1] <= d]
        above = [s for s in ss if s[1] > d]
        if not below:
            out[p] = begins.get(p, 0)
            continue
        s_src, s_dst = below[-1]
        cand = s_src + (d - s_dst)
        if above:
            cand = min(cand, above[0][0])
        out[p] = max(begins.get(p, 0), min(cand, ends.get(p, cand)))
    return out


def checkpoint_group_failback(
    spark: SparkSession,
    dst_root: str,
    src_root: str,
    group: str,
    topic: str,
    *,
    alias: str = "primary",
) -> dict[int, int]:
    """Failback checkpointing: the group consumed further on the TARGET
    during the outage; returning home, translate its ``<alias>.topic``
    commits upstream and commit them on the source under the same group
    (new generation — coming home is a rebalance too). The consumer
    resumes on the primary exactly where it left the secondary."""
    dst_committed = TopicLog(dst_root).committed(
        group, remote_topic(alias, topic)
    )
    if not dst_committed:
        raise ValueError(
            f"group {group!r} has no commits for {remote_topic(alias, topic)!r}"
        )
    translated = translate_offsets_upstream(
        spark, dst_root, src_root, topic, dst_committed, alias=alias
    )
    src = TopicLog(src_root)
    gen = src.join_group(group)
    src.commit_offsets(group, topic, translated, generation=gen)
    return translated


def checkpoint_group(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    group: str,
    topic: str,
    *,
    alias: str = "primary",
) -> dict[int, int]:
    """MirrorCheckpointConnector with ``sync.group.offsets.enabled``: read
    the group's committed offsets on the source, translate through the
    sync store, and commit them under the SAME group on the target (new
    generation — a failover is a rebalance). Returns what was committed;
    the failed-over consumer just resumes from its group like nothing
    happened, minus zero records."""
    src_committed = TopicLog(src_root).committed(group, topic)
    if not src_committed:
        raise ValueError(f"group {group!r} has no commits for {topic!r}")
    translated = translate_offsets(
        spark, dst_root, topic, src_committed, alias=alias
    )
    dst = TopicLog(dst_root)
    gen = dst.join_group(group)
    dst.commit_offsets(
        group, remote_topic(alias, topic), translated, generation=gen
    )
    return translated
