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
  (``mm2-offset-syncs.<alias>.internal``) holding, per source
  partition, ONE snapshot record with a BOUNDED list of
  (source offset → target offset) sync points. Like Kafka's own
  ``OffsetSyncStore`` (which keeps ≤64 exponentially-spaced syncs per
  partition), the list is re-thinned after every run to at most
  ``MAX_GRID`` (64) entries exponentially spaced behind the partition
  head, plus at most ``MAX_GAP_ANCHORS`` (32) most-recent gap anchors
  (records that re-anchor translation right after a filtered/aborted
  run; each carries the gap's first skipped source offset), plus the
  seal (high-water) entry. The store is therefore
  **O(partitions × ~100) forever** — truly metadata-sized at any data
  volume — and the snapshot record doubles as the per-partition
  high-water record the next incremental run resumes from.
- **checkpoints**: ``checkpoint_group`` reads a group's committed
  offsets on the source, translates them through the sync store, and
  commits them under the same group on the target (MM2's
  ``sync.group.offsets.enabled`` behavior) — a failed-over consumer
  resumes exactly where the source group left off.

**Translation precision envelope** (documented, like MM2's
nearest-sync-below contract): between two retained syncs A and B the
region is provably 1:1 when ``B.src − A.src == B.dst − A.dst`` (no
record in between was filtered), and translation is EXACT there —
which is everywhere, in the common no-aborted-records case.  Inside a
retained gap anchor's skipped range, translation is exact too (the
next surviving record's target offset).  Only when thinning has
dropped the anchors inside a non-1:1 region does translation degrade
to the conservative ``A.dst + 1`` (nearest-sync-below, never skipping
a record — at-least-once preserved, bounded re-delivery), exactly
real MM2's posture beyond its sync horizon.

Scale shape: replication is ONE pass over the source topic with ONE
shuffle (repartition to target partitions + in-partition sort by source
offset — the order-preservation MM2 gets from its single-threaded
per-partition copy loop).  Sync-point selection is a SECOND, metadata-
weight pass over only ``(partition, offset)`` (the value/key/header
bytes are pruned before its shuffle), and what reaches the driver is
the already-thinned candidate set — **O(partitions × ~100) rows**, not
O(records/interval).  Translation loads only the bounded store.

Crash safety: the data write and the snapshot write are two
non-atomic steps.  A crash between them leaves target records the
store doesn't account for; the next run detects the orphan tail,
verifies it byte-for-byte against the source records that should
follow the last seal (a distributed join, only per-partition counts
collected), ADOPTS it (synthesizing the missing seal) and resumes —
only a tail that does NOT match the source raises the foreign-writer
ownership error.
"""

from __future__ import annotations

import bisect
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rdkafka_streams_spark.streaming.topiclog import (
    FORMAT_NAME,
    TopicLog,
    UnkeyedTopicError,
    read_topic,
    register,
)

#: Kafka OffsetSyncStore keeps 64 exponentially-spaced syncs/partition.
MAX_GRID = 64
#: Most-recent gap anchors retained per partition (aborted runs are rare).
MAX_GAP_ANCHORS = 32


def remote_topic(alias: str, topic: str) -> str:
    """DefaultReplicationPolicy: ``t`` on cluster ``alias`` → ``alias.t``."""
    return f"{alias}.{topic}"


def syncs_topic(alias: str) -> str:
    return f"mm2-offset-syncs.{alias}.internal"


def topic_source(topic: str) -> str | None:
    """DefaultReplicationPolicy.topicSource: the cluster alias a remote
    topic came from (the prefix before the first separator), or None for
    a topic local to its cluster."""
    return topic.split(".", 1)[0] if "." in topic else None


def upstream_topic(topic: str) -> str:
    """DefaultReplicationPolicy.upstreamTopic: strip ONE level of remote
    prefix (``a.b.t`` → ``b.t`` — provenance unwinds hop by hop)."""
    return topic.split(".", 1)[1] if "." in topic else topic


def _thin(entries: list[dict], head: int) -> list[dict]:
    """Re-thin a partition's sync entries to the bounded retention policy:
    the seal (highest dst), one entry per exponential distance behind the
    head (largest dst ≤ head−1−2^i for i = 0..), and the most recent
    ``MAX_GAP_ANCHORS`` gap anchors.  ≤ MAX_GRID + MAX_GAP_ANCHORS + 1
    entries — the bound that makes the store metadata-sized forever."""
    if not entries:
        return []
    dd: dict[int, dict] = {}
    for e in sorted(entries, key=lambda e: e["s"]):
        old = dd.get(e["s"])
        if old is None or (old.get("gs") is None and e.get("gs") is not None):
            dd[e["s"]] = e
    ents = sorted(dd.values(), key=lambda e: e["s"])
    ds = [e["d"] for e in ents]  # dst increases with src within a partition
    # seal (high-water) + the earliest anchor (translation below the grid's
    # reach would otherwise degrade to `begins` even in 1:1 history)
    keep = {max(ents, key=lambda e: e["d"])["s"], ents[0]["s"]}
    i = 0
    while (1 << i) <= head and i < 64:
        j = bisect.bisect_right(ds, head - 1 - (1 << i)) - 1
        if j >= 0:
            keep.add(ents[j]["s"])
        i += 1
    for e in [e for e in ents if e.get("gs") is not None][-MAX_GAP_ANCHORS:]:
        keep.add(e["s"])
    return [e for e in ents if e["s"] in keep]


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
    principal: str = "User:ANONYMOUS",
    target_alias: str | None = None,
) -> dict:
    """Replicate ``topic`` from the source log to ``<alias>.topic`` on the
    target log, byte-faithfully (key/value/partition/CreateTime/headers),
    and maintain the bounded offset-sync store translation needs.

    INCREMENTAL: each run replicates only source records past the last
    run's high-water (seal) sync — read straight from the per-partition
    snapshot record, O(partitions) metadata.  Run it repeatedly and you
    have MM2's continuous copy as a sequence of batch deltas.  The
    target must be owned by this mirror alone (MM2's rule — it is the
    sole producer of remote topics): a remote partition holding records
    beyond the seal is first VERIFIED byte-for-byte against the source
    records that should follow it — a crash between last run's data
    write and its snapshot write leaves exactly such a tail, which is
    adopted (the missing seal is synthesized) — and only a
    non-matching tail fails the ownership check.
    ``isolation="read_committed"`` additionally requires no OPEN
    transaction touching the topic at run time (the LSO gate: an open
    txn's records occupy source offsets this run would skip past and
    never revisit once it commits).  ``sync_interval`` is accepted for
    API compatibility but superseded by the exponential grid: sync
    density no longer scales with record count, so the store stays
    O(partitions × ~100) at any volume.  Returns
    ``{"topic", "syncs_topic", "partitions", "start_offsets"}``.
    ``principal`` is the identity the mirror runs as on BOTH clusters
    (MM2's own client principal) — required once either root carries an
    ACL store.  ``target_alias`` (the TARGET cluster's own alias) enables
    MM2's cycle detection: in an active/active A⇄B pair, topics on the
    source that CAME from the target (``topicSource(topic) ==
    target_alias``) are refused, or A→B→A would bounce every record
    forever as ``a.b.a...t``; the internal offset-syncs topics are
    refused unconditionally (MM2 never replicates its own plumbing)."""
    if sync_interval < 1:
        raise ValueError("sync_interval must be >= 1")
    if topic.startswith("mm2-offset-syncs.") and topic.endswith(".internal"):
        raise ValueError(
            f"{topic!r} is a MirrorMaker internal topic — it is never "
            "replicated (each cluster keeps its own sync store)"
        )
    if target_alias is not None and topic_source(topic) == target_alias:
        raise ValueError(
            f"replication cycle: {topic!r} originated on cluster "
            f"{target_alias!r} (DefaultReplicationPolicy.topicSource) — "
            "mirroring it back would bounce records A→B→A forever"
        )
    src = TopicLog(src_root, principal)
    dst = TopicLog(dst_root, principal)
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
    # PIN the source end offsets now: the data pass and the sync pass are
    # two Spark actions, and an unpinned second read of a LIVE source
    # would cover records the data pass never replicated — storing a seal
    # past the real target end and wedging the next run's resume check.
    src_ends = src.end_offsets(topic)
    ending = json.dumps({topic: {str(p): o for p, o in src_ends.items()}})
    stopic = syncs_topic(alias)
    store = (
        _load_syncs(spark, dst_root, alias, topic, principal=principal)
        if stopic in dst.topics() else {}
    )
    start_src: dict[int, int] = {}
    dst_base: dict[int, int] = {}
    orphans: dict[int, tuple[int, int, int]] = {}  # p -> (src_from, dst_from, k)
    for p in range(n_parts):
        ents = store.get(p, [])
        last_src, last_dst = (ents[-1]["s"], ents[-1]["d"]) if ents else (-1, -1)
        de = dst_ends.get(p, 0)
        if de == last_dst + 1:
            start_src[p] = last_src + 1 if ents else -2
            dst_base[p] = last_dst + 1
        elif de > last_dst + 1:
            # records beyond the seal: either last run crashed between its
            # data write and its snapshot write (adoptable) or a foreign
            # writer broke ownership (fatal) — verification decides
            orphans[p] = (last_src + 1 if ents else -2, last_dst + 1,
                          de - (last_dst + 1))
        else:
            raise ValueError(
                f"target {dtopic!r} p{p} ends at {de} below the sync store's "
                f"seal {last_dst + 1} — the remote topic was truncated or "
                "rebuilt out from under the mirror"
            )
    changed: set[int] = set()
    if orphans:
        adopted = _verify_orphans(
            spark, src_root, dst_root, topic, dtopic, orphans,
            isolation=isolation, include_headers=include_headers,
            principal=principal,
        )
        for p, src_last in adopted.items():
            _, dst_from, k = orphans[p]
            start_src[p] = src_last + 1
            dst_base[p] = dst_from + k
            # synthesize the seal the crashed run never wrote; gap anchors
            # inside the orphan region are lost, so the 1:1 delta check
            # at translation time decides whether the region stays exact
            store.setdefault(p, []).append(
                {"s": src_last, "d": dst_from + k - 1, "gs": None}
            )
            changed.add(p)

    raw = read_topic(
        spark, src_root, topic,
        include_headers=include_headers, isolation=isolation,
        startingOffsets=json.dumps(
            {topic: {str(p): o for p, o in start_src.items()}}
        ),
        endingOffsets=ending,
        principal=principal,
    )
    # Data pass: repartition + in-partition sort IS the order-preservation
    # replication needs (each target partition written in source-offset
    # order, MM2's per-partition copy loop) — no window functions touch
    # the record bytes.
    sink_cols = ["key", "value", "partition", "timestamp"]
    if include_headers:
        sink_cols.append("headers")
    register(spark)
    (
        raw.repartition(n_parts, "partition")
        .sortWithinPartitions("partition", "offset")
        .select(*sink_cols)
        .write.format(FORMAT_NAME).mode("append")
        .option("path", dst_root).option("topic", dtopic)
        .option("tombstones", "true")  # preserve compacted-topic deletes
        .option("principal", principal)
        .save()
    )
    # Sync pass: metadata-weight — only (partition, offset) ride this
    # shuffle; the exponential grid is computed columnar off the final
    # head (dist = head-1-dst a power of two), gap anchors are capped at
    # the most recent MAX_GAP_ANCHORS per partition, and ONLY the
    # already-thinned candidates (O(partitions × ~100) rows) are
    # collected.
    base_map = F.create_map(
        *[x for p, b in sorted(dst_base.items()) for x in (F.lit(p), F.lit(b))]
    )
    start_map = F.create_map(
        *[x for p, s in sorted(start_src.items()) for x in (F.lit(p), F.lit(s))]
    )
    w = Window.partitionBy("partition").orderBy("offset")
    wall = Window.partitionBy("partition")
    prev_off = F.lag("offset").over(w)
    start_col = start_map[F.col("partition")]
    gap_prev = prev_off.isNotNull() & (F.col("offset") - prev_off > 1)
    gap_first = (
        prev_off.isNull() & (start_col >= 0) & (F.col("offset") > start_col)
    )
    is_gap = (gap_prev | gap_first).cast("int")
    off = (
        raw.select("partition", "offset")
        .withColumn(
            "__dst",
            base_map[F.col("partition")] + F.row_number().over(w) - F.lit(1),
        )
        .withColumn("__head", F.max("__dst").over(wall) + F.lit(1))
        .withColumn(
            "__gs",
            F.when(gap_prev, prev_off + 1).when(gap_first, start_col),
        )
        # gaps strictly AFTER the current row = whole-partition total −
        # running count up to (and incl.) current. Both are O(n) frames;
        # a rowsBetween(1, unboundedFollowing) frame here would make
        # Spark re-scan to the partition end for EVERY row — O(n²),
        # measured 30× slower at 8× volume in the transport cert.
        .withColumn("__gaps_run", F.sum(is_gap).over(w))
        .withColumn(
            "__gaps_after", F.sum(is_gap).over(wall) - F.col("__gaps_run")
        )
    )
    dist = F.col("__head") - 1 - F.col("__dst")
    on_grid = (dist == 0) | ((dist > 0) & (dist.bitwiseAND(dist - 1) == 0))
    keep_gap = F.col("__gs").isNotNull() & (
        F.col("__gaps_after") < MAX_GAP_ANCHORS
    )
    # the run's first record anchors the history floor (1/partition/run;
    # _thin keeps only the earliest one long-term)
    is_first = F.col("__dst") == base_map[F.col("partition")]
    cand_rows = (
        off.where(on_grid | keep_gap | is_first)
        .select("partition", "offset", "__dst", "__gs")
        .collect()
    )
    if cand_rows or changed:
        heads: dict[int, int] = {}
        for r in cand_rows:
            p = r["partition"]
            store.setdefault(p, []).append(
                {"s": r["offset"], "d": r["__dst"],
                 "gs": r["__gs"] if r["__gs"] is not None else None}
            )
            heads[p] = max(heads.get(p, 0), r["__dst"] + 1)
            changed.add(p)
        if stopic not in dst.topics():
            dst.create_topic(stopic, partitions=1)
            dst.alter_configs(stopic, {"cleanup.policy": "compact"})
        vals, ks = [], []
        for p in sorted(changed):
            head = heads.get(p, (store[p][-1]["d"] + 1) if store.get(p) else 0)
            store[p] = _thin(store.get(p, []), head)
            vals.append(json.dumps({
                "topic": topic, "p": p,
                "e": [[e["s"], e["d"], e.get("gs")] for e in store[p]],
            }))
            ks.append(f"{topic}\x00{p}")
        dst.append(stopic, vals, keys=ks, partition=0)
        # the store is keyed one-record-per-partition: compacting after
        # every run keeps the TOPIC itself O(partitions), not O(runs).
        # A pre-rewrite sync topic may still hold LEGACY keyless records
        # compact() refuses — skip compaction there (the snapshot reads
        # stay correct; growth degrades to O(runs) until the legacy topic
        # is retired) instead of failing every post-upgrade run.
        try:
            dst.compact(stopic)
        except UnkeyedTopicError:
            pass  # only the legacy-keyless exemption is tolerable
    return {
        "topic": dtopic,
        "syncs_topic": stopic,
        "partitions": n_parts,
        "start_offsets": start_src,  # -2 = from earliest (bootstrap run)
    }


def _verify_orphans(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    topic: str,
    dtopic: str,
    orphans: dict[int, tuple[int, int, int]],
    *,
    isolation: str,
    include_headers: bool,
    principal: str = "User:ANONYMOUS",
) -> dict[int, int]:
    """Crash recovery: target partitions hold ``k`` records beyond the
    sync store's seal.  Join the orphan tail against the next ``k``
    surviving source records per partition and compare fingerprints
    (key, value, CreateTime, headers) — all distributed, only
    per-partition counts collected.  Byte-identical ⇒ the last run
    crashed after its data write: return {partition: source offset of
    the k-th survivor} so the caller can synthesize the seal and
    resume.  Any mismatch ⇒ foreign writer, the ownership error.
    Requires the same ``isolation``/``include_headers`` the crashed run
    used (differing options make the tails incomparable and fail
    verification — rerun with the original options)."""
    src_ends = TopicLog(src_root, principal).end_offsets(topic)
    dst_ends = TopicLog(dst_root, principal).end_offsets(dtopic)
    src_start = {
        p: (orphans[p][0] if p in orphans else src_ends.get(p, 0))
        for p in src_ends
    }
    dst_start = {
        p: (orphans[p][1] if p in orphans else dst_ends.get(p, 0))
        for p in dst_ends
    }
    k_map = F.create_map(
        *[x for p, (_, _, k) in sorted(orphans.items())
          for x in (F.lit(p), F.lit(k))]
    )

    def _tail(root: str, t: str, starts: dict[int, int],
              ends: dict[int, int]) -> DataFrame:
        df = read_topic(
            spark, root, t, include_headers=include_headers,
            isolation=isolation if root == src_root else "read_uncommitted",
            startingOffsets=json.dumps(
                {t: {str(p): o for p, o in starts.items()}}
            ),
            # pinned: a live source appending mid-verify must not shift rn
            endingOffsets=json.dumps(
                {t: {str(p): o for p, o in ends.items()}}
            ),
            principal=principal,
        )
        w = Window.partitionBy("partition").orderBy("offset")
        hdr = (
            F.to_json(F.col("headers")) if include_headers else F.lit("")
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k_map[F.col("partition")])
            .select(
                "partition", "__rn", "offset",
                F.sha2(F.concat_ws(
                    "\x01",
                    F.coalesce(F.base64("key"), F.lit("<null>")),
                    F.coalesce(F.base64("value"), F.lit("<null>")),
                    F.col("timestamp").cast("string"),
                    F.coalesce(hdr, F.lit("<null>")),
                ), 256).alias("fp"),
            )
        )

    s = _tail(src_root, topic, src_start, src_ends)
    d = _tail(dst_root, dtopic, dst_start, dst_ends)
    agg = (
        s.alias("s")
        .join(d.alias("d"), ["partition", "__rn"], "full_outer")
        .groupBy("partition")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("s.fp") == F.col("d.fp")).cast("int")).alias("ok"),
            F.max(
                F.when(
                    F.col("__rn") == k_map[F.col("partition")],
                    F.col("s.offset"),
                )
            ).alias("src_last"),
        )
        .collect()
    )
    got = {r["partition"]: r for r in agg}
    out: dict[int, int] = {}
    for p, (_, dst_from, k) in orphans.items():
        r = got.get(p)
        if (
            r is None or r["n"] != k or (r["ok"] or 0) != k
            or r["src_last"] is None
        ):
            raise ValueError(
                f"target {dtopic!r} p{p} holds {k} record(s) past the sync "
                f"store's seal (from dst offset {dst_from}) that do NOT "
                "match the source — a foreign writer broke the mirror's "
                "ownership"
            )
        out[p] = r["src_last"]
    return out


def _load_syncs(
    spark: SparkSession, dst_root: str, alias: str, topic: str,
    *, principal: str = "User:ANONYMOUS",
) -> dict[int, list[dict]]:
    """Sync store for one topic: {partition: [{"s","d","gs"}, ...] sorted
    by source offset}.  Reads the per-partition SNAPSHOT records (latest
    per key) — bounded at O(partitions × ~100) entries by the thinning
    policy, regardless of how many records were ever mirrored."""
    rows = (
        read_topic(spark, dst_root, syncs_topic(alias), principal=principal)
        .select(
            "offset",
            F.col("key").cast("string").alias("k"),
            F.col("value").cast("string").alias("v"),
        )
        .where(F.col("k").startswith(topic + "\x00"))
        .collect()
    )
    latest: dict[str, tuple[int, str]] = {}
    for r in rows:
        if r["k"] not in latest or r["offset"] > latest[r["k"]][0]:
            latest[r["k"]] = (r["offset"], r["v"])
    out: dict[int, list[dict]] = {}
    for _, (_, v) in latest.items():
        try:
            snap = json.loads(v)
        except (TypeError, json.JSONDecodeError):
            continue
        if snap.get("topic") != topic:
            continue
        out[int(snap["p"])] = [
            {"s": e[0], "d": e[1], "gs": e[2]} for e in snap.get("e", [])
        ]
    return {p: sorted(v, key=lambda e: e["s"]) for p, v in out.items()}


def _translate_one(
    entries: list[dict], c: int, begins: int, ends: int
) -> int:
    """Downstream translation of one committed source offset through a
    partition's sync entries.  Exact when the bounding region is provably
    1:1 (delta check) or ``c`` lies inside a retained gap anchor's
    skipped range; conservative nearest-sync-below + 1 otherwise —
    never past a surviving record (at-least-once preserved)."""
    ss = [e["s"] for e in entries]
    i = bisect.bisect_right(ss, c)
    if i == 0:
        return begins
    a, b = entries[i - 1], entries[i] if i < len(entries) else None
    if b is not None and b.get("gs") is not None and c >= b["gs"]:
        cand = b["d"]  # inside the gap: next survivor is b itself — exact
    elif c == a["s"]:
        cand = a["d"]
    elif b is None:
        cand = a["d"] + (c - a["s"])  # beyond the seal: clamp to end below
    else:
        span_src = (b["gs"] if b.get("gs") is not None else b["s"]) - a["s"]
        if span_src == b["d"] - a["d"]:
            cand = a["d"] + (c - a["s"])  # region is 1:1 — exact
        else:
            cand = a["d"] + 1  # anchors thinned away — conservative
    return max(begins, min(cand, ends))


def translate_offsets(
    spark: SparkSession,
    dst_root: str,
    topic: str,
    src_offsets: dict[int, int],
    *,
    alias: str = "primary",
    principal: str = "User:ANONYMOUS",
) -> dict[int, int]:
    """RemoteClusterUtils.translateOffsets: source-cluster committed
    offsets → target-cluster offsets for ``<alias>.topic``.

    Precision envelope (see module docstring): exact wherever the
    bounding retained syncs delimit a 1:1 region or a retained gap
    anchor covers the offset; conservative nearest-sync-below + 1
    beyond that horizon; clamped into the target's valid range.  A
    commit below the first replicated record (source head was
    retention-trimmed before mirroring) resumes at the target's
    beginning — Kafka's auto.offset.reset=earliest posture."""
    syncs = _load_syncs(spark, dst_root, alias, topic, principal=principal)
    dst = TopicLog(dst_root, principal)
    dtopic = remote_topic(alias, topic)
    ends = dst.end_offsets(dtopic)
    begins = dst.beginning_offsets(dtopic)
    return {
        p: _translate_one(
            syncs.get(p, []), c, begins.get(p, 0),
            ends.get(p, begins.get(p, 0)),
        )
        for p, c in src_offsets.items()
    }


def _translate_up_one(
    entries: list[dict], d: int, begins: int, ends: int
) -> int:
    """Upstream (failback) translation of one target offset.  Same
    exactness rules read the other way; conservative
    nearest-sync-below + 1 where anchors were thinned."""
    ds = [e["d"] for e in entries]
    i = bisect.bisect_right(ds, d)
    if i == 0:
        return begins
    a, b = entries[i - 1], entries[i] if i < len(entries) else None
    if d == a["d"]:
        cand = a["s"]
    elif b is None:
        cand = a["s"] + (d - a["d"])
    else:
        span_src = (b["gs"] if b.get("gs") is not None else b["s"]) - a["s"]
        if span_src == b["d"] - a["d"]:
            cand = a["s"] + (d - a["d"])
        else:
            cand = a["s"] + 1
    return max(begins, min(cand, ends))


def translate_offsets_upstream(
    spark: SparkSession,
    dst_root: str,
    src_root: str,
    topic: str,
    dst_offsets: dict[int, int],
    *,
    alias: str = "primary",
    principal: str = "User:ANONYMOUS",
) -> dict[int, int]:
    """The FAILBACK direction: target-cluster offsets on ``<alias>.topic``
    → source-cluster offsets on ``topic`` (MM2's upstream translation,
    the half RemoteClusterUtils does when traffic returns to the primary
    after a DR exercise).  Same bounded sync store read the other way,
    same precision envelope, clamped into the source's live offset range
    (the primary may have retention-trimmed or appended while traffic
    was away)."""
    syncs = _load_syncs(spark, dst_root, alias, topic, principal=principal)
    src = TopicLog(src_root, principal)
    ends = src.end_offsets(topic)
    begins = src.beginning_offsets(topic)
    return {
        p: _translate_up_one(
            syncs.get(p, []), d, begins.get(p, 0),
            ends.get(p, begins.get(p, 0)),
        )
        for p, d in dst_offsets.items()
    }


def checkpoint_group_failback(
    spark: SparkSession,
    dst_root: str,
    src_root: str,
    group: str,
    topic: str,
    *,
    alias: str = "primary",
    principal: str = "User:ANONYMOUS",
) -> dict[int, int]:
    """Failback checkpointing: the group consumed further on the TARGET
    during the outage; returning home, translate its ``<alias>.topic``
    commits upstream and commit them on the source under the same group
    (new generation — coming home is a rebalance too).  The consumer
    resumes on the primary exactly where it left the secondary."""
    dst_committed = TopicLog(dst_root, principal).committed(
        group, remote_topic(alias, topic)
    )
    if not dst_committed:
        raise ValueError(
            f"group {group!r} has no commits for {remote_topic(alias, topic)!r}"
        )
    translated = translate_offsets_upstream(
        spark, dst_root, src_root, topic, dst_committed, alias=alias,
        principal=principal,
    )
    src = TopicLog(src_root, principal)
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
    principal: str = "User:ANONYMOUS",
) -> dict[int, int]:
    """MirrorCheckpointConnector with ``sync.group.offsets.enabled``: read
    the group's committed offsets on the source, translate through the
    sync store, and commit them under the SAME group on the target (new
    generation — a failover is a rebalance).  Returns what was committed;
    the failed-over consumer just resumes from its group like nothing
    happened, minus zero records."""
    src_committed = TopicLog(src_root, principal).committed(group, topic)
    if not src_committed:
        raise ValueError(f"group {group!r} has no commits for {topic!r}")
    translated = translate_offsets(
        spark, dst_root, topic, src_committed, alias=alias,
        principal=principal,
    )
    dst = TopicLog(dst_root, principal)
    gen = dst.join_group(group)
    dst.commit_offsets(
        group, remote_topic(alias, topic), translated, generation=gen
    )
    return translated
