"""Share groups (streaming/sharegroups.py) — the KIP-932 'Queues for
Kafka' analog: per-record acquisition locks, individual acks,
release/expiry redelivery with delivery counts, poison-record archiving,
SPSO collapse (bounded state), and ACL/read_committed integration."""

from __future__ import annotations

import json

import pytest

from rdkafka_streams_spark.streaming.sharegroups import (
    InvalidRecordStateError,
    ShareGroup,
)
from rdkafka_streams_spark.streaming.topiclog import TopicLog


def _mk(tmp_path, n=10, parts=1, **kw):
    root = str(tmp_path / "bus")
    log = TopicLog(root)
    log.create_topic("q", partitions=parts)
    for p in range(parts):
        log.append("q", [f"r{p}-{i}" for i in range(n)], partition=p)
    return root, log, ShareGroup(root, "workers", **kw)


def test_fetch_ack_advances_spso_and_state_stays_bounded(tmp_path):
    root, log, sg = _mk(tmp_path, n=10)
    got = sg.fetch("q", "c1", max_records=4, now_ms=1_000)
    assert [r["offset"] for r in got] == [0, 1, 2, 3]
    assert all(r["delivery_count"] == 1 for r in got)
    assert bytes(got[0]["value"]) == b"r0-0"
    d = sg.describe("q")[0]
    assert (d["spso"], d["in_flight"], d["speo"]) == (0, 4, 10)
    sg.ack("q", "c1", {0: [0, 1, 2, 3]}, now_ms=1_500)
    d = sg.describe("q")[0]
    assert (d["spso"], d["in_flight"]) == (4, 0)
    # the acked prefix collapsed: nothing is tracked per-record anymore
    assert sg.state_size("q") == 0
    # drain the rest; state stays O(in-flight) throughout
    while True:
        got = sg.fetch("q", "c1", max_records=3, now_ms=2_000)
        if not got:
            break
        assert sg.state_size("q") <= 3
        sg.ack("q", "c1", {0: [r["offset"] for r in got]}, now_ms=2_001)
    d = sg.describe("q")[0]
    assert d["spso"] == d["speo"] == 10 and d["lag"] == 0
    assert sg.state_size("q") == 0


def test_two_members_share_one_partition(tmp_path):
    """The point of share groups: BOTH members draw from partition 0 —
    no ownership, records dispensed exactly once while locks hold."""
    root, log, sg = _mk(tmp_path, n=6)
    a = sg.fetch("q", "alice", max_records=2, now_ms=1_000)
    b = sg.fetch("q", "bob", max_records=2, now_ms=1_001)
    assert [r["offset"] for r in a] == [0, 1]
    assert [r["offset"] for r in b] == [2, 3]  # never re-dispensed
    sg.ack("q", "bob", {0: [2, 3]}, now_ms=1_002)
    sg.ack("q", "alice", {0: [0, 1]}, now_ms=1_003)
    assert sg.describe("q")[0]["spso"] == 4


def test_release_and_lock_expiry_redeliver_with_count(tmp_path):
    root, log, sg = _mk(tmp_path, n=4, lock_duration_ms=1_000)
    got = sg.fetch("q", "c1", max_records=2, now_ms=10_000)
    # release offset 0: immediately available again, count preserved
    sg.release("q", "c1", {0: [0]}, now_ms=10_100)
    got2 = sg.fetch("q", "c2", max_records=1, now_ms=10_200)
    assert [(r["offset"], r["delivery_count"]) for r in got2] == [(0, 2)]
    sg.ack("q", "c2", {0: [0]}, now_ms=10_300)
    # offset 1's lock expires un-acked -> redelivered with count 2
    got3 = sg.fetch("q", "c3", max_records=1, now_ms=12_000)
    assert [(r["offset"], r["delivery_count"]) for r in got3] == [(1, 2)]
    # the zombie's late ack is refused: the lock is gone
    with pytest.raises(InvalidRecordStateError):
        sg.ack("q", "c1", {0: [1]}, now_ms=12_100)
    # and an ack of something never fetched is refused too
    with pytest.raises(InvalidRecordStateError):
        sg.ack("q", "c9", {0: [3]}, now_ms=12_100)


def test_poison_record_archives_at_attempt_limit(tmp_path):
    root, log, sg = _mk(tmp_path, n=3, delivery_attempt_limit=3,
                        lock_duration_ms=100)
    # record 0 fails processing forever: release it 3 times
    for i in range(3):
        got = sg.fetch("q", f"c{i}", max_records=1, now_ms=1_000 + i)
        assert got[0]["offset"] == 0 and got[0]["delivery_count"] == i + 1
        sg.release("q", f"c{i}", {0: [0]}, now_ms=1_000 + i)
    # 4th fetch: record 0 is over the limit -> ARCHIVED, queue moves on
    got = sg.fetch("q", "c9", max_records=1, now_ms=2_000)
    assert got[0]["offset"] == 1
    d = sg.describe("q")[0]
    assert d["archived"] == 0  # archived prefix already collapsed to SPSO
    assert d["spso"] == 1  # offset 0 is finalized forever
    sg.ack("q", "c9", {0: [1]}, now_ms=2_001)
    # explicit reject is the other archive path
    got = sg.fetch("q", "c9", max_records=1, now_ms=2_100)
    sg.reject("q", "c9", {0: [got[0]["offset"]]}, now_ms=2_101)
    assert sg.describe("q")[0]["spso"] == 3


def test_out_of_order_acks_keep_gap_only_state(tmp_path):
    root, log, sg = _mk(tmp_path, n=6)
    got = sg.fetch("q", "c1", max_records=6, now_ms=1_000)
    # ack everything EXCEPT offset 0: spso pinned, acked set = the gap
    sg.ack("q", "c1", {0: [r["offset"] for r in got[1:]]}, now_ms=1_001)
    d = sg.describe("q")[0]
    assert d["spso"] == 0 and d["in_flight"] == 1
    assert sg.state_size("q") == 6  # 1 acquired + 5 acked-above-gap
    sg.ack("q", "c1", {0: [0]}, now_ms=1_002)
    assert sg.describe("q")[0]["spso"] == 6
    assert sg.state_size("q") == 0  # the whole gap collapsed at once


def test_max_record_locks_caps_in_flight(tmp_path):
    root, log, sg = _mk(tmp_path, n=10, max_record_locks=3)
    got = sg.fetch("q", "c1", max_records=100, now_ms=1_000)
    assert len(got) == 3  # capped, not the full backlog
    assert sg.describe("q")[0]["in_flight"] == 3
    # no more locks until something resolves
    assert sg.fetch("q", "c2", max_records=100, now_ms=1_001) == []
    sg.ack("q", "c1", {0: [0]}, now_ms=1_002)
    assert len(sg.fetch("q", "c2", max_records=100, now_ms=1_003)) == 1


def test_share_group_read_committed_and_acls(tmp_path):
    from rdkafka_streams_spark.streaming.acl import (
        AclBinding,
        AclStore,
        AuthorizationError,
    )

    root = str(tmp_path / "bus")
    log = TopicLog(root)
    log.create_topic("q", partitions=1)
    log.append("q", ["a", "b"], partition=0)
    log.begin_txn("t1")
    log.append("q", ["x"], partition=0, txn="t1")
    sg = ShareGroup(root, "workers", isolation="read_committed")
    with pytest.raises(ValueError, match="LSO gate"):
        sg.fetch("q", "c1", now_ms=1_000)
    log.abort_txn("t1")
    got = sg.fetch("q", "c1", max_records=10, now_ms=1_000)
    # the aborted record never surfaces; the pointer skips its offsets
    assert [bytes(r["value"]) for r in got] == [b"a", b"b"]
    sg.ack("q", "c1", {0: [0, 1]}, now_ms=1_001)
    d = sg.describe("q")[0]
    assert d["next_fetch"] == d["speo"]
    # ACLs gate the share surface like the classic consumer's
    s = AclStore(root)
    s.enable()
    s.add(AclBinding(resource_type="topic", resource_name="q",
                     pattern_type="literal", principal="User:etl",
                     operation="READ", permission="allow"))
    s.add(AclBinding(resource_type="group", resource_name="workers",
                     pattern_type="literal", principal="User:etl",
                     operation="READ", permission="allow"))
    with pytest.raises(AuthorizationError):
        ShareGroup(root, "workers").fetch("q", "c1", now_ms=2_000)
    # the authorized principal's share surface works end to end
    etl = ShareGroup(root, "workers", principal="User:etl")
    assert etl.fetch("q", "c1", max_records=1, now_ms=2_000) == []


def test_multi_partition_fetch_spreads(tmp_path):
    root, log, sg = _mk(tmp_path, n=4, parts=3)
    got = sg.fetch("q", "c1", max_records=100, now_ms=1_000)
    assert len(got) == 12
    assert {r["partition"] for r in got} == {0, 1, 2}
    sg.ack("q", "c1", {p: [r["offset"] for r in got if r["partition"] == p]
                       for p in (0, 1, 2)}, now_ms=1_001)
    assert all(v["lag"] == 0 for v in sg.describe("q").values())


def test_share_reset_offsets(tmp_path):
    """kafka-share-groups.sh --reset-offsets: rewind replays records with
    FRESH delivery counts, forward-skip archives nothing and just moves
    the window, and a reset under live locks is refused."""
    root, log, sg = _mk(tmp_path, n=6)
    got = sg.fetch("q", "c1", max_records=6, now_ms=1_000)
    with pytest.raises(ValueError, match="still acquired"):
        sg.reset("q", "earliest")
    sg.ack("q", "c1", {0: [r["offset"] for r in got]}, now_ms=1_001)
    assert sg.describe("q")[0]["spso"] == 6
    # rewind to 2: records 2..5 become deliverable again, counts reset
    assert sg.reset("q", {0: 2}) == {0: 2}
    got2 = sg.fetch("q", "c2", max_records=10, now_ms=2_000)
    assert [r["offset"] for r in got2] == [2, 3, 4, 5]
    assert all(r["delivery_count"] == 1 for r in got2)  # a fresh attempt
    sg.ack("q", "c2", {0: [2, 3, 4, 5]}, now_ms=2_001)
    # skip to latest: nothing left to deliver
    log.append("q", ["late"], partition=0)
    assert sg.reset("q", "latest") == {0: 7}
    assert sg.fetch("q", "c3", max_records=10, now_ms=3_000) == []


def test_spso_collapses_past_txn_markers_state_stays_bounded(tmp_path):
    """Review r9: control markers (and aborted records under
    read_committed) occupy offsets _read_range never yields; SPSO must
    collapse past them or coordinator state grows O(consumed) on any
    transactional topic. Drain a topic full of txn markers and assert
    zero residual state."""
    root = str(tmp_path / "bus")
    log = TopicLog(root)
    log.create_topic("q", partitions=1)
    for i in range(5):
        log.begin_txn(f"t{i}")
        log.append("q", [f"v{i}"], partition=0, txn=f"t{i}")
        (log.commit_txn if i % 2 == 0 else log.abort_txn)(f"t{i}")
    # offsets: 10 total (5 records + 5 markers); committed data = 3
    sg = ShareGroup(root, "workers", isolation="read_committed")
    got = sg.fetch("q", "c1", max_records=100, now_ms=1_000)
    assert [bytes(r["value"]) for r in got] == [b"v0", b"v2", b"v4"]
    sg.ack("q", "c1", {0: [r["offset"] for r in got]}, now_ms=1_001)
    d = sg.describe("q")[0]
    assert d["spso"] == d["speo"] == 10  # past every marker and abort
    assert d["lag"] == 0
    assert sg.state_size("q") == 0  # nothing pinned, nothing leaked


def test_share_state_survives_offset_retention_and_delete_group(tmp_path):
    """Review r9: share state must NOT live where the consumer-offset
    machinery (expire_group_offsets' __meta stamping + reaping,
    delete_group's listing) would corrupt or delete it."""
    root, log, sg = _mk(tmp_path, n=4)
    got = sg.fetch("q", "c1", max_records=2, now_ms=1_000)
    sg.ack("q", "c1", {0: [0, 1]}, now_ms=1_001)
    # a classic group exists beside the share group
    gen = log.join_group("classic")
    log.commit_offsets("classic", "q", {0: 1}, generation=gen)
    # offsets retention sweeps: share state untouched, still parseable
    log.expire_group_offsets(retention_ms=10**12)
    assert sg.describe("q")[0]["spso"] == 2
    assert sg.state_size("q") == 0
    # the share group never appears in the classic-group machinery
    assert "workers" not in log.groups() or not log.committed(
        "workers", "q"
    )


def test_duplicate_offsets_in_one_finalize_raise_cleanly(tmp_path):
    root, log, sg = _mk(tmp_path, n=3)
    got = sg.fetch("q", "c1", max_records=2, now_ms=1_000)
    # a duplicate in one call must not KeyError out of the apply loop
    sg.ack("q", "c1", {0: [0, 0, 1]}, now_ms=1_001)
    assert sg.describe("q")[0]["spso"] == 2
    with pytest.raises(InvalidRecordStateError):
        sg.ack("q", "c1", {0: [0]}, now_ms=1_002)  # already finalized


# ------------------------------------------------------- coordinator fencing
def test_stale_coordinator_is_fenced_on_every_mutation(tmp_path):
    """r10: the single-writer rule is enforced, not assumed. A second
    coordinator instance claiming the (group, topic) epoch fences the
    first: its ack/release/reject/fetch/reset all raise FENCED instead of
    last-writer-wins overwriting per-record state (which would resurrect
    locks, lose acks, or un-archive poison records)."""
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
    )

    root, log, a = _mk(tmp_path, n=6)
    got_a = a.fetch("q", "alice", max_records=2, now_ms=1_000)
    assert [r["offset"] for r in got_a] == [0, 1]
    # a second coordinator for the SAME group claims a newer epoch at its
    # first mutating op (e.g. a parallel drainer misconfiguration)
    b = ShareGroup(root, "workers")
    got_b = b.fetch("q", "bob", max_records=2, now_ms=1_001)
    assert [r["offset"] for r in got_b] == [2, 3]
    # every mutation path on the stale coordinator is rejected
    with pytest.raises(FencedShareCoordinatorError):
        a.ack("q", "alice", {0: [0, 1]}, now_ms=1_002)
    with pytest.raises(FencedShareCoordinatorError):
        a.release("q", "alice", {0: [0]}, now_ms=1_002)
    with pytest.raises(FencedShareCoordinatorError):
        a.reject("q", "alice", {0: [0]}, now_ms=1_002)
    with pytest.raises(FencedShareCoordinatorError):
        a.fetch("q", "alice", max_records=1, now_ms=1_003)
    with pytest.raises(FencedShareCoordinatorError):
        a.reset("q", "earliest")
    # b's state was never clobbered: alice's locks expire and b drains all
    b.ack("q", "bob", {0: [2, 3]}, now_ms=1_004)
    rest = b.fetch("q", "bob", max_records=10, now_ms=40_000)
    assert sorted(r["offset"] for r in rest) == [0, 1, 4, 5]
    assert {r["offset"]: r["delivery_count"] for r in rest}[0] == 2
    b.ack("q", "bob", {0: [r["offset"] for r in rest]}, now_ms=40_001)
    d = b.describe("q")[0]
    assert d["spso"] == d["speo"] == 6 and b.state_size("q") == 0


def test_fence_race_inside_save_window_is_loud(tmp_path, monkeypatch):
    """The one lock-free residue (ADVICE r10): a coordinator fenced
    BETWEEN _save's pre-check and os.replace lands one stale write.
    Simulated by disarming the pre-check only; the post-replace re-check
    must surface FENCED (with the overwrite warning) instead of letting
    the stale write pass silently, and the new coordinator's next save
    supersedes the stale bytes."""
    from rdkafka_streams_spark.streaming import sharegroups as sgm
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
    )

    root, log, a = _mk(tmp_path, n=4)
    a.fetch("q", "alice", max_records=1, now_ms=1_000)
    b = ShareGroup(root, "workers")
    b.fetch("q", "bob", max_records=1, now_ms=1_001)  # fences a

    checks = {"n": 0}
    real = sgm.ShareGroup._check_fenced

    def skip_first(self, topic):
        checks["n"] += 1
        if checks["n"] == 1:
            return  # the pre-check ran just before b's claim landed
        return real(self, topic)

    monkeypatch.setattr(sgm.ShareGroup, "_check_fenced", skip_first)
    with pytest.raises(FencedShareCoordinatorError, match="LAST WRITE raced"):
        a._save("q", a._load("q"))
    monkeypatch.setattr(sgm.ShareGroup, "_check_fenced", real)
    # b is not fenced by a's stale write and its next save supersedes it
    b.ack("q", "bob", {0: [1]}, now_ms=1_002)
    assert b.describe("q")[0]["spso"] >= 0


def test_reset_cli_fences_running_drainer(tmp_path):
    """The reset-share-offsets CLI path (a second ShareGroup instance)
    fences a live drainer rather than silently interleaving with it."""
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
    )

    root, log, drainer = _mk(tmp_path, n=4)
    got = drainer.fetch("q", "c1", max_records=2, now_ms=1_000)
    drainer.ack("q", "c1", {0: [r["offset"] for r in got]}, now_ms=1_001)
    admin = ShareGroup(root, "workers")
    assert admin.reset("q", "earliest") == {0: 0}
    with pytest.raises(FencedShareCoordinatorError):
        drainer.fetch("q", "c1", max_records=1, now_ms=1_002)
    # the admin (or a NEW drainer) replays from the reset SPSO
    replay = admin.fetch("q", "c1", max_records=10, now_ms=1_003)
    assert [r["offset"] for r in replay] == [0, 1, 2, 3]
    assert all(r["delivery_count"] == 1 for r in replay)


def test_describe_and_state_size_never_fence(tmp_path):
    """Read-only admin must not steal the coordinator epoch from a live
    drainer (kafka-share-groups.sh --describe is safe to run anytime)."""
    root, log, drainer = _mk(tmp_path, n=4)
    drainer.fetch("q", "c1", max_records=2, now_ms=1_000)
    observer = ShareGroup(root, "workers")
    assert observer.describe("q")[0]["in_flight"] == 2
    assert observer.state_size("q") == 2
    # the drainer continues unfenced
    drainer.ack("q", "c1", {0: [0, 1]}, now_ms=1_001)
    assert drainer.describe("q")[0]["spso"] == 2


def test_group_and_topic_path_traversal_rejected(tmp_path):
    """Advisor r9 (medium): group/topic become path components — the
    repo-wide _check_name rule applies (no separators, no dot prefix)."""
    root, log, sg = _mk(tmp_path, n=1)
    with pytest.raises(ValueError):
        ShareGroup(root, "../../evil")
    with pytest.raises(ValueError):
        ShareGroup(root, ".hidden")
    with pytest.raises(ValueError):
        sg.describe("../evil")
    with pytest.raises(ValueError):
        sg.fetch("..\\evil", "c1", now_ms=1_000)


def test_corrupt_state_fails_loudly_not_silent_reset(tmp_path):
    """Advisor r9 (low): a corrupt state file must raise, not silently
    reset SPSO to the log beginning and re-deliver acknowledged records."""
    import os

    root, log, sg = _mk(tmp_path, n=4)
    got = sg.fetch("q", "c1", max_records=2, now_ms=1_000)
    sg.ack("q", "c1", {0: [r["offset"] for r in got]}, now_ms=1_001)
    path = sg._state_path("q")
    with open(path, "w", encoding="utf-8") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        sg.describe("q")
    with pytest.raises(ValueError, match="corrupt"):
        sg.fetch("q", "c1", max_records=1, now_ms=1_002)
    # missing state is still the legitimate empty case
    os.unlink(path)
    assert sg.describe("q")[0]["spso"] == 0


def test_concurrent_coordinator_claims_get_distinct_epochs(tmp_path):
    """r10 review: the O_EXCL epoch MARKER is itself the publication —
    no mutable record exists to regress, so concurrent claims must get
    DISTINCT epochs and exactly one claimant (the max) stays unfenced,
    under any interleaving."""
    import threading

    root, log, _ = _mk(tmp_path, n=2)
    groups, errs = [], []

    def claim():
        try:
            g = ShareGroup(root, "workers")
            g._ensure_coordinator("q")
            groups.append(g)
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=claim) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    epochs = sorted(g._epochs["q"] for g in groups)
    assert len(set(epochs)) == 8  # no two claimants share an epoch
    winner = max(groups, key=lambda g: g._epochs["q"])
    # exactly the max-epoch claimant may write; all others are fenced
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
    )
    got = winner.fetch("q", "m", max_records=1, now_ms=1_000)
    assert len(got) == 1
    for g in groups:
        if g is winner:
            continue
        with pytest.raises(FencedShareCoordinatorError):
            g.fetch("q", "m", max_records=1, now_ms=1_001)


def test_claim_path_never_deletes_markers(tmp_path):
    """r12 review: the in-claim dead-marker GC made claimed epochs
    re-claimable (deleted marker -> O_EXCL succeeds again -> two
    coordinators at one epoch). The claim path must perform NO deletion:
    every claimed epoch's marker survives every subsequent claim."""
    import os

    root, log, sg = _mk(tmp_path, n=2)
    groups = [sg] + [ShareGroup(root, "workers") for _ in range(4)]
    for g in groups:
        g._ensure_coordinator("q")
    gdir = os.path.dirname(sg._state_path("q"))
    markers = sorted(
        n for n in os.listdir(gdir) if n.startswith(".q.epoch-")
    )
    assert markers == [f".q.epoch-{i}" for i in range(5)]
    assert sorted(g._epochs["q"] for g in groups) == [0, 1, 2, 3, 4]


def test_gc_reclaim_interleaving_is_detected_deterministically(tmp_path):
    """Force the exact r12-verdict interleaving: A claims epoch 2; C
    claims 3 and (admin) GC unlinks marker 2; B — whose view of the
    marker dir predates A's claim — O_EXCLs the deleted `.q.epoch-2`
    and SUCCEEDS. The floor re-check must detect the dead claim and
    retry B strictly above the floor, never handing out a duplicate."""
    import os

    root, log, _ = _mk(tmp_path, n=2)
    g0 = ShareGroup(root, "workers")
    g0._ensure_coordinator("q")  # epoch 0
    g1 = ShareGroup(root, "workers")
    g1._ensure_coordinator("q")  # epoch 1

    a = ShareGroup(root, "workers")
    a._ensure_coordinator("q")  # A claims epoch 2
    assert a._epochs["q"] == 2
    c = ShareGroup(root, "workers")
    c._ensure_coordinator("q")  # C claims epoch 3
    assert c._epochs["q"] == 3
    reaped = c.gc_epoch_markers("q")  # admin GC: floor=2, unlinks 0..2
    assert reaped == 3
    gdir = os.path.dirname(c._state_path("q"))
    assert not os.path.exists(os.path.join(gdir, ".q.epoch-2"))

    # B's claim runs with a STALE view (read before A's claim, before
    # any GC): first reads of markers/floor return the old world, so B
    # attempts O_EXCL on the deleted `.q.epoch-2` — and it SUCCEEDS.
    b = ShareGroup(root, "workers")
    real_epochs = ShareGroup._published_epochs
    real_floor = ShareGroup._read_floor
    calls = {"e": 0, "f": 0}

    def stale_epochs(self, topic):
        calls["e"] += 1
        if calls["e"] == 1:
            return [0, 1]  # pre-A view
        return real_epochs(self, topic)

    def stale_floor(self, topic):
        calls["f"] += 1
        if calls["f"] == 1:
            return -1  # pre-GC view
        return real_floor(self, topic)

    ShareGroup._published_epochs = stale_epochs
    ShareGroup._read_floor = stale_floor
    try:
        b._ensure_coordinator("q")
    finally:
        ShareGroup._published_epochs = real_epochs
        ShareGroup._read_floor = real_floor
    # the dead claim at 2 was detected via the floor re-check and
    # retried above: B lands at 4, NOT at A's epoch 2
    assert b._epochs["q"] == 4
    # B (the true max) writes; A and C are fenced
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
    )
    assert len(b.fetch("q", "m", max_records=1, now_ms=1_000)) == 1
    for stale in (a, c):
        with pytest.raises(FencedShareCoordinatorError):
            stale.fetch("q", "m", max_records=1, now_ms=1_001)


def test_gc_epoch_markers_floor_survives_and_fences(tmp_path):
    """After admin GC, (a) only the max marker remains, (b) new claims
    start strictly above the floor even if every marker were deleted,
    (c) fencing still holds for pre-GC coordinators."""
    import os

    root, log, sg = _mk(tmp_path, n=2)
    holders = [ShareGroup(root, "workers") for _ in range(4)]
    for h in holders:
        h._ensure_coordinator("q")  # epochs 0..3
    assert sg.gc_epoch_markers("q") == 3
    assert sg.gc_epoch_markers("q") == 0  # idempotent: only the max left
    gdir = os.path.dirname(sg._state_path("q"))
    left = [n for n in os.listdir(gdir) if n.startswith(".q.epoch-")]
    assert left == [".q.epoch-3"]
    # adversarial: even deleting the surviving max marker cannot rewind
    # the protocol below the floor
    os.unlink(os.path.join(gdir, ".q.epoch-3"))
    fresh = ShareGroup(root, "workers")
    fresh._ensure_coordinator("q")
    assert fresh._epochs["q"] == 3  # floor=2 -> next claim is 3
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
    )
    assert len(fresh.fetch("q", "m", max_records=1, now_ms=1_000)) == 1
    with pytest.raises(FencedShareCoordinatorError):
        holders[0].fetch("q", "m", max_records=1, now_ms=1_001)


def test_concurrent_claims_stress_distinct_epochs(tmp_path):
    """50-iteration stress: concurrent claimants (with interleaved admin
    GC runs) never share an epoch — the r12 failure reproduced ~40% of
    runs under the old in-claim GC."""
    import threading

    for it in range(50):
        root = str(tmp_path / f"bus{it}")
        log = TopicLog(root)
        log.create_topic("q", partitions=1)
        log.append("q", ["r0", "r1"], partition=0)
        groups, errs = [], []

        def claim(root=root):
            try:
                g = ShareGroup(root, "workers")
                g._ensure_coordinator("q")
                groups.append(g)
            except Exception as e:  # pragma: no cover - diagnostic
                errs.append(e)

        def gc(root=root):
            try:
                ShareGroup(root, "workers").gc_epoch_markers("q")
            except Exception as e:  # pragma: no cover - diagnostic
                errs.append(e)

        threads = [threading.Thread(target=claim) for _ in range(8)]
        threads.insert(3, threading.Thread(target=gc))
        threads.insert(7, threading.Thread(target=gc))
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[0]
        epochs = [g._epochs["q"] for g in groups]
        assert len(set(epochs)) == 8, f"iter {it}: duplicate in {epochs}"


def test_gc_soak_crash_mid_gc_never_reclaims(tmp_path):
    """Soak for MARKERS.md §1's crash sentence: repeated claim→GC cycles,
    some with a crash INJECTED between the floor write and the unlinks,
    (a) never hand out a previously claimed epoch, (b) keep the floor
    file monotone across every cycle, (c) leave extra markers after a
    crashed GC — never a re-claimable epoch — and (d) keep marker
    accumulation bounded by claims-since-last-successful-GC, not by
    cycles (the 'GC-then-1000-claims' accumulation posture)."""
    import os as _os

    import rdkafka_streams_spark.streaming.sharegroups as sgmod

    root, log, sg = _mk(tmp_path, n=2)
    gdir = _os.path.dirname(sg._state_path("q"))
    seen_epochs: set[int] = set()
    prev_floor = -1
    real_unlink = _os.unlink
    for cycle in range(12):
        claimants = [ShareGroup(root, "workers") for _ in range(5)]
        for h in claimants:
            h._ensure_coordinator("q")
        epochs = {h._epochs["q"] for h in claimants}
        assert len(epochs) == 5
        assert not (epochs & seen_epochs), \
            f"cycle {cycle}: re-claimed epochs {epochs & seen_epochs}"
        seen_epochs |= epochs
        markers_before = {
            n for n in _os.listdir(gdir) if n.startswith(".q.epoch-")
        }
        if cycle % 3 == 1:
            # crash mid-GC: floor is written, then the first unlink dies
            def boom(path, *a, **kw):
                raise RuntimeError("injected crash mid-GC")

            sgmod.os.unlink = boom
            try:
                with pytest.raises(RuntimeError, match="injected crash"):
                    sg.gc_epoch_markers("q")
            finally:
                sgmod.os.unlink = real_unlink
            # crash leaves EXTRA markers (none reaped) ...
            left = {n for n in _os.listdir(gdir)
                    if n.startswith(".q.epoch-")}
            assert left == markers_before
        else:
            sg.gc_epoch_markers("q")
            left = {n for n in _os.listdir(gdir)
                    if n.startswith(".q.epoch-")}
            # successful GC: exactly the max marker survives — bounded
            assert left == {f".q.epoch-{max(seen_epochs)}"}
        # ... and in BOTH outcomes the floor is monotone and covers
        # everything at-or-below max-1, so nothing is re-claimable
        floor = sg._read_floor("q")
        assert floor >= prev_floor, f"floor regressed {prev_floor}->{floor}"
        assert floor == max(seen_epochs) - 1
        prev_floor = floor
    # final sanity: a fresh claim lands strictly above everything ever seen
    fresh = ShareGroup(root, "workers")
    fresh._ensure_coordinator("q")
    assert fresh._epochs["q"] == max(seen_epochs) + 1


def test_concurrent_gc_floor_monotonic(tmp_path):
    """Two admin GC runs racing (flock-serialized since review r13) can
    never regress the floor: fire GC pairs concurrently across claim
    waves and assert every observed floor value is non-decreasing."""
    import os as _os
    import threading

    root, log, sg = _mk(tmp_path, n=2)
    observed: list[int] = []
    for wave in range(10):
        for _ in range(3):
            ShareGroup(root, "workers")._ensure_coordinator("q")
        errs: list[Exception] = []

        def gc():
            try:
                ShareGroup(root, "workers").gc_epoch_markers("q")
            except Exception as e:  # pragma: no cover - diagnostic
                errs.append(e)

        threads = [threading.Thread(target=gc) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[0]
        observed.append(sg._read_floor("q"))
    assert observed == sorted(observed), f"floor regressed: {observed}"
    assert observed[-1] == 10 * 3 - 2  # covers every epoch below the max
