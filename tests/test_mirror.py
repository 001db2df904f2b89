"""MirrorMaker-2 surface (streaming/mirror.py): byte-faithful topic
replication, offset-sync translation, consumer-group checkpointing."""

from __future__ import annotations

import json

import pytest

from rdkafka_streams_spark.streaming.mirror import (
    checkpoint_group,
    mirror_topic,
    remote_topic,
    syncs_topic,
    translate_offsets,
)
from rdkafka_streams_spark.streaming.topiclog import TopicLog, read_topic


def _vals(n, tag=""):
    return [json.dumps({"i": i, "tag": tag}) for i in range(n)]


def test_mirror_is_byte_faithful(spark, tmp_path):
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=2)
    src.append(
        "ev", _vals(5), keys=[f"k{i}" for i in range(5)], partition=0,
        timestamps=[1000 + i for i in range(5)],
        headers=[[("h", b"x"), ("h", None)]] * 5,
    )
    src.append("ev", _vals(3, "p1"), partition=1, timestamps=[2000, 2001, 2002])
    out = mirror_topic(spark, src_root, dst_root, "ev", alias="a")
    assert out["topic"] == "a.ev" == remote_topic("a", "ev")
    rows = {
        (r["partition"], r["offset"]): r
        for r in read_topic(spark, dst_root, "a.ev", include_headers=True)
        .collect()
    }
    srows = {
        (r["partition"], r["offset"]): r
        for r in read_topic(spark, src_root, "ev", include_headers=True)
        .collect()
    }
    assert rows.keys() == srows.keys()  # fresh target: offsets line up 1:1
    for k, s in srows.items():
        d = rows[k]
        assert bytes(d["value"]) == bytes(s["value"])
        assert (d["key"] is None) == (s["key"] is None)
        if s["key"] is not None:
            assert bytes(d["key"]) == bytes(s["key"])
        assert d["timestamp"] == s["timestamp"]  # CreateTime preserved
        assert d["headers"] == s["headers"]
    # re-run with no new source data: an idempotent no-op
    out2 = mirror_topic(spark, src_root, dst_root, "ev", alias="a")
    assert out2["start_offsets"] == {0: 5, 1: 3}
    assert TopicLog(dst_root).end_offsets("a.ev") == {0: 5, 1: 3}


def test_incremental_mirror_replicates_only_the_delta(spark, tmp_path):
    """MM2's continuous copy as repeated batch deltas: run 2 resumes from
    run 1's high-water sync, target offsets continue seamlessly, and
    translation stays exact across the run boundary."""
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=1)
    src.append("ev", _vals(70, "run1"), partition=0)
    mirror_topic(spark, src_root, dst_root, "ev", sync_interval=16)
    src.append("ev", _vals(30, "run2"), partition=0)
    out = mirror_topic(spark, src_root, dst_root, "ev", sync_interval=16)
    assert out["start_offsets"] == {0: 70}  # resumed past run 1
    dst = TopicLog(dst_root)
    assert dst.end_offsets("primary.ev") == {0: 100}
    # every record present exactly once, bytes intact, offsets aligned
    rows = sorted(
        (r["offset"], bytes(r["value"]).decode())
        for r in read_topic(spark, dst_root, "primary.ev").collect()
    )
    assert len(rows) == 100
    assert json.loads(rows[69][1])["tag"] == "run1"
    assert json.loads(rows[70][1])["tag"] == "run2"
    # translation exact on both sides of the run boundary
    t = lambda c: translate_offsets(spark, dst_root, "ev", {0: c})[0]
    assert t(69) == 69 and t(70) == 70 and t(95) == 95
    # a foreign writer on the remote topic fails the consistency check
    dst.append("primary.ev", ["intruder"], partition=0)
    src.append("ev", _vals(1, "run3"), partition=0)
    with pytest.raises(ValueError, match="foreign writer"):
        mirror_topic(spark, src_root, dst_root, "ev", sync_interval=16)


def test_read_committed_mirror_lso_gate(spark, tmp_path):
    """An OPEN transaction on the source blocks a read_committed mirror:
    its offsets would be skipped now and never revisited after commit."""
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=1)
    src.append("ev", _vals(5), partition=0)
    src.begin_txn("inflight")
    src.append("ev", _vals(2, "x"), partition=0, txn="inflight")
    with pytest.raises(ValueError, match="LSO gate"):
        mirror_topic(
            spark, src_root, dst_root, "ev", isolation="read_committed"
        )
    src.commit_txn("inflight")
    mirror_topic(spark, src_root, dst_root, "ev", isolation="read_committed")
    assert TopicLog(dst_root).end_offsets("primary.ev") == {0: 7}


def test_translation_after_retention_trim(spark, tmp_path):
    """Source head trimmed before mirroring: target starts at 0 while
    source offsets start at the trim point — the canonical reason
    failover needs translation at all."""
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=1)
    src.append("ev", _vals(200), partition=0)
    src.delete_records("ev", {0: 57})  # logStartOffset -> 57
    mirror_topic(spark, src_root, dst_root, "ev", sync_interval=10)
    t = lambda c: translate_offsets(spark, dst_root, "ev", {0: c})[0]
    assert t(57) == 0      # first surviving record
    assert t(100) == 43    # linear between syncs
    assert t(103) == 46    # off-sync offsets translate exactly too
    assert t(30) == 0      # committed below the trim -> earliest
    assert t(200) == 143   # caught-up group stays caught-up
    assert t(500) == 143   # clamped to target end
    # sync store is sparse: ~143/10 syncs, not 143
    n_syncs = read_topic(spark, dst_root, syncs_topic("primary")).count()
    assert n_syncs <= 16


def test_translation_across_aborted_txn_gap(spark, tmp_path):
    """read_committed replication drops an aborted run mid-partition; a
    gap-triggered sync keeps translation exact on both sides and
    conservative inside the hole."""
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=1)
    src.append("ev", _vals(40), partition=0)            # offsets 0..39
    src.begin_txn("bad")
    src.append("ev", _vals(10, "x"), partition=0, txn="bad")  # 40..49
    src.abort_txn("bad")                                # marker at 50
    src.append("ev", _vals(20, "tail"), partition=0)    # 51..70
    mirror_topic(
        spark, src_root, dst_root, "ev",
        isolation="read_committed", sync_interval=16,
    )
    # target = 40 head + 20 tail = 60 records
    assert TopicLog(dst_root).end_offsets("primary.ev")[0] == 60
    t = lambda c: translate_offsets(spark, dst_root, "ev", {0: c})[0]
    assert t(0) == 0
    assert t(39) == 39     # just before the gap
    assert t(51) == 40     # first record after marker
    assert t(71) == 60     # caught up past the tail
    assert t(60) == 49     # inside the tail: exact (gap sync re-anchors)
    # committed INSIDE the aborted run: conservative, never overshooting
    # past the first record after the gap
    assert t(45) == 40
    assert t(50) == 40


def test_checkpoint_group_failover(spark, tmp_path):
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=2)
    src.append("ev", _vals(100), partition=0)
    src.append("ev", _vals(80), partition=1)
    src.delete_records("ev", {0: 20})  # make p0 non-trivial to translate
    gen = src.join_group("app")
    src.commit_offsets("app", "ev", {0: 60, 1: 30}, generation=gen)
    mirror_topic(spark, src_root, dst_root, "ev", sync_interval=8)
    translated = checkpoint_group(spark, src_root, dst_root, "app", "ev")
    assert translated == {0: 40, 1: 30}
    dst = TopicLog(dst_root)
    assert dst.committed("app", "primary.ev") == {0: 40, 1: 30}
    assert dst.group_generation("app") == 1  # failover = a rebalance
    with pytest.raises(ValueError, match="no commits"):
        checkpoint_group(spark, src_root, dst_root, "ghost", "ev")


def test_failback_upstream_translation_roundtrip(spark, tmp_path):
    """DR round-trip: fail over (downstream translate), consume further
    on the secondary, fail BACK (upstream translate) — the group resumes
    on the primary exactly where it left the secondary, and
    source→target→source translation is the identity on live offsets."""
    from rdkafka_streams_spark.streaming.mirror import (
        checkpoint_group_failback,
        translate_offsets_upstream,
    )

    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=1)
    src.append("ev", _vals(120), partition=0)
    src.delete_records("ev", {0: 25})  # non-trivial mapping: dst = src-25
    mirror_topic(spark, src_root, dst_root, "ev", sync_interval=16)
    # failover at src offset 80 -> dst 55
    gen = src.join_group("app")
    src.commit_offsets("app", "ev", {0: 80}, generation=gen)
    checkpoint_group(spark, src_root, dst_root, "app", "ev")
    dst = TopicLog(dst_root)
    assert dst.committed("app", "primary.ev") == {0: 55}
    # the group consumes further on the secondary during the outage
    dgen = dst.group_generation("app")
    dst.commit_offsets("app", "primary.ev", {0: 90}, generation=dgen)
    # failback: dst 90 -> src 115
    back = checkpoint_group_failback(spark, dst_root, src_root, "app", "ev")
    assert back == {0: 115}
    assert src.committed("app", "ev") == {0: 115}
    # round-trip identity on live offsets
    for c in (25, 40, 80, 119):
        d = translate_offsets(spark, dst_root, "ev", {0: c})[0]
        assert translate_offsets_upstream(
            spark, dst_root, src_root, "ev", {0: d}
        )[0] == c
    # a target offset below everything clamps to the source's live head
    assert translate_offsets_upstream(
        spark, dst_root, src_root, "ev", {0: 0}
    )[0] == 25


def test_sync_store_stays_bounded_as_records_grow(spark, tmp_path):
    """The round-9 bound: the offset-sync store is O(partitions × ~100)
    REGARDLESS of record volume — grow the source 32× across incremental
    runs and neither the per-partition entry count nor the syncs topic's
    record count moves with data size (real MM2's OffsetSyncStore keeps
    ≤64 exponentially-spaced syncs per partition; ours adds ≤32 gap
    anchors + first + seal)."""
    from rdkafka_streams_spark.streaming.mirror import (
        MAX_GAP_ANCHORS,
        MAX_GRID,
        _load_syncs,
    )

    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=2)
    bound = MAX_GRID + MAX_GAP_ANCHORS + 2
    sizes = []
    n = 0
    for batch in (250, 1750, 2000, 4000, 8000):  # cumulative 1x..32x of 500
        for p in (0, 1):
            src.append("ev", _vals(batch // 2, f"b{batch}"), partition=p)
        mirror_topic(spark, src_root, dst_root, "ev")
        store = _load_syncs(spark, dst_root, "primary", "ev")
        n += batch
        sizes.append((n, {p: len(v) for p, v in store.items()}))
        assert all(len(v) <= bound for v in store.values()), sizes
    # the syncs TOPIC itself is compacted to one snapshot per partition
    n_store_records = read_topic(
        spark, dst_root, syncs_topic("primary")
    ).count()
    assert n_store_records == 2
    # translation still exact across the whole (gap-free → 1:1) history
    t = lambda c: translate_offsets(spark, dst_root, "ev", {0: c})[0]
    for c in (0, 1, 1000, 4999, 8000):
        assert t(c) == c
    assert TopicLog(dst_root).end_offsets("primary.ev") == {0: 8000, 1: 8000}


def test_crash_between_data_and_syncs_is_adopted(spark, tmp_path):
    """ADVICE r8: a crash between the data write and the snapshot write
    used to brick the mirror permanently (every later run saw 'foreign
    writer').  Now the orphan tail is verified byte-for-byte against the
    source and ADOPTED: the next run synthesizes the seal and resumes;
    only a tail that does NOT match the source still raises."""
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    src = TopicLog(src_root)
    src.create_topic("ev", partitions=1)
    src.append(
        "ev", _vals(40), keys=[f"k{i}" for i in range(40)], partition=0,
        timestamps=[1000 + i for i in range(40)],
    )
    mirror_topic(spark, src_root, dst_root, "ev")
    # simulate the crashed second run: source grows by 10, and the DATA
    # landed on the target (byte-identical replica) but the snapshot never
    # did — replay exactly what the data pass would have written
    src.append(
        "ev", _vals(10, "late"), keys=[f"k{40 + i}" for i in range(10)],
        partition=0, timestamps=[2000 + i for i in range(10)],
    )
    dst = TopicLog(dst_root)
    dst.append(
        "primary.ev", _vals(10, "late"),
        keys=[f"k{40 + i}" for i in range(10)], partition=0,
        timestamps=[2000 + i for i in range(10)],
    )
    # next run adopts the orphan tail and continues with fresh source data
    src.append("ev", _vals(5, "post"), partition=0,
               timestamps=[3000 + i for i in range(5)])
    out = mirror_topic(spark, src_root, dst_root, "ev")
    assert out["start_offsets"] == {0: 50}  # resumed PAST the adopted tail
    assert dst.end_offsets("primary.ev") == {0: 55}
    rows = sorted(
        (r["offset"], bytes(r["value"]).decode())
        for r in read_topic(spark, dst_root, "primary.ev").collect()
    )
    assert len(rows) == 55  # no duplicate of the adopted records
    assert json.loads(rows[49][1])["tag"] == "late"
    assert json.loads(rows[50][1])["tag"] == "post"
    # translation exact across the adopted boundary (1:1 history)
    t = lambda c: translate_offsets(spark, dst_root, "ev", {0: c})[0]
    assert t(45) == 45 and t(50) == 50 and t(55) == 55
    # a tail that does NOT match the source is still a foreign writer
    dst.append("primary.ev", ["intruder"], partition=0)
    src.append("ev", _vals(1, "x"), partition=0)
    with pytest.raises(ValueError, match="foreign writer"):
        mirror_topic(spark, src_root, dst_root, "ev")


def test_replication_policy_cycle_detection(spark, tmp_path):
    """DefaultReplicationPolicy provenance + MM2 cycle prevention: in an
    active/active A<->B pair, topics that CAME from the target are
    refused (A->B->A would bounce forever), internal sync topics never
    replicate, and upstream_topic unwinds provenance hop by hop."""
    from rdkafka_streams_spark.streaming.mirror import (
        topic_source,
        upstream_topic,
    )

    assert topic_source("ev") is None
    assert topic_source("a.ev") == "a"
    assert topic_source("a.b.ev") == "a"
    assert upstream_topic("a.b.ev") == "b.ev"
    assert upstream_topic("ev") == "ev"

    a_root, b_root = str(tmp_path / "a"), str(tmp_path / "b")
    a, b = TopicLog(a_root), TopicLog(b_root)
    a.create_topic("ev", partitions=1)
    a.append("ev", _vals(5), partition=0)
    # A -> B (B's view of A is alias "a"; B's own alias is "b")
    mirror_topic(spark, a_root, b_root, "ev", alias="a", target_alias="b")
    assert TopicLog(b_root).end_offsets("a.ev") == {0: 5}
    # B -> A for B-local topics is fine...
    b.create_topic("metrics", partitions=1)
    b.append("metrics", _vals(3), partition=0)
    mirror_topic(spark, b_root, a_root, "metrics", alias="b",
                 target_alias="a")
    assert TopicLog(a_root).end_offsets("b.metrics") == {0: 3}
    # ...but mirroring A's own records back home is a refused cycle
    with pytest.raises(ValueError, match="cycle"):
        mirror_topic(spark, b_root, a_root, "a.ev", alias="b",
                     target_alias="a")
    # and the internal sync store never replicates
    with pytest.raises(ValueError, match="internal"):
        mirror_topic(spark, b_root, a_root, "mm2-offset-syncs.a.internal",
                     alias="b", target_alias="a")
