"""Partition assignment strategies (streaming/assignors.py) + the
rebalance_group admin — librdkafka's partition.assignment.strategy
surface (reference exposes the raw config dict, src/Consumer.coffee)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdkafka_streams_spark.streaming.assignors import (
    assign,
    cooperative_rebalance,
    range_assign,
    roundrobin_assign,
    sticky_assign,
)
from rdkafka_streams_spark.streaming.topiclog import TopicLog


def test_range_contiguous_with_extras_first():
    out = range_assign(["b", "a", "c"], {"t": range(8)})
    # sorted members; 8/3 = 2 each, first 2 take one extra
    assert out == {
        "a": [("t", 0), ("t", 1), ("t", 2)],
        "b": [("t", 3), ("t", 4), ("t", 5)],
        "c": [("t", 6), ("t", 7)],
    }
    # co-partitioned topics land the same ranges on the same members
    two = range_assign(["a", "b"], {"x": range(4), "y": range(4)})
    assert [p for t, p in two["a"] if t == "x"] == [
        p for t, p in two["a"] if t == "y"
    ]


def test_roundrobin_deals_over_the_ring():
    out = roundrobin_assign(["a", "b"], {"t": range(3), "u": range(2)})
    # sorted tps: (t,0)(t,1)(t,2)(u,0)(u,1) dealt a,b,a,b,a
    assert out == {
        "a": [("t", 0), ("t", 2), ("u", 1)],
        "b": [("t", 1), ("u", 0)],
    }


def test_sticky_keeps_prior_owners_and_balances():
    parts = {"t": range(6)}
    first = sticky_assign(["a", "b", "c"], parts)
    # c leaves: its partitions redistribute, a's and b's stay put
    second = sticky_assign(["a", "b"], parts, prior=first)
    for m in ("a", "b"):
        assert set(first[m]) <= set(second[m])
    assert abs(len(second["a"]) - len(second["b"])) <= 1
    # d joins: only the minimum number of partitions move
    third = sticky_assign(["a", "b", "d"], parts, prior=second)
    sizes = sorted(len(v) for v in third.values())
    assert sizes == [2, 2, 2]
    moved = sum(
        len(set(second[m]) - set(third[m])) for m in ("a", "b")
    )
    assert moved == 2  # exactly the two partitions d needs


def test_cooperative_revokes_only_owner_changes():
    parts = {"t": range(4)}
    prior = sticky_assign(["a", "b"], parts)
    target, revoked = cooperative_rebalance(["a", "b", "c"], parts, prior)
    # every revoked partition changed owners; non-moving ones are absent
    owned = {tp: m for m, tps in prior.items() for tp in tps}
    for tp in revoked:
        new_owner = next(m for m, tps in target.items() if tp in tps)
        assert owned[tp] != new_owner
    kept = [
        tp for m, tps in target.items() for tp in tps
        if tp in owned and owned[tp] == m
    ]
    assert set(kept).isdisjoint(revoked)
    assert len(revoked) >= 1  # c must take something


@settings(max_examples=60, deadline=None)
@given(
    n_parts=st.integers(1, 40),
    n_members=st.integers(1, 9),
    strategy=st.sampled_from(["range", "roundrobin", "sticky"]),
)
def test_every_strategy_is_a_balanced_partition_of_partitions(
    n_parts, n_members, strategy
):
    members = [f"m{i}" for i in range(n_members)]
    out = assign(strategy, members, {"t": range(n_parts)})
    tps = [tp for v in out.values() for tp in v]
    assert sorted(tps) == [("t", p) for p in range(n_parts)]  # exact cover
    sizes = [len(v) for v in out.values()]
    assert max(sizes) - min(sizes) <= 1  # balanced


@settings(max_examples=40, deadline=None)
@given(
    n_parts=st.integers(1, 30),
    survivors=st.integers(1, 5),
    joiners=st.integers(0, 4),
)
def test_sticky_movement_is_minimal(n_parts, survivors, joiners):
    """After membership churn the number of moved partitions equals the
    imbalance the churn created — never more."""
    old_members = [f"s{i}" for i in range(survivors)] + ["leaver"]
    prior = sticky_assign(old_members, {"t": range(n_parts)})
    new_members = [f"s{i}" for i in range(survivors)] + [
        f"j{i}" for i in range(joiners)
    ]
    out = sticky_assign(new_members, {"t": range(n_parts)}, prior=prior)
    lost = sum(
        len(set(prior[m]) - set(out[m])) for m in prior if m in out
    )
    # survivors only lose what balance demands: their excess over the
    # best final sizes balance allows (only n_parts % n members may hold
    # the ceiling, assigned to the largest prior holders first)
    n = len(new_members)
    floor_sz, extra = divmod(n_parts, n)
    prior_sizes = sorted(
        (len(prior[m]) for m in prior if m in out), reverse=True
    )
    allowed = sum(
        max(0, sz - (floor_sz + (1 if i < extra else 0)))
        for i, sz in enumerate(prior_sizes)
    )
    assert lost <= allowed


def test_assign_dispatch_and_validation():
    with pytest.raises(ValueError, match="unknown partition.assignment"):
        assign("magnetic", ["a"], {"t": [0]})
    with pytest.raises(ValueError, match="no members"):
        range_assign([], {"t": [0]})
    with pytest.raises(ValueError, match="duplicate member"):
        roundrobin_assign(["a", "a"], {"t": [0]})


def test_rebalance_group_admin_durable_state(tmp_path):
    log = TopicLog(str(tmp_path))
    log.create_topic("ev", partitions=6)
    r1 = log.rebalance_group("g", "ev", ["c1", "c2", "c3"])
    assert r1["generation"] == 1 and r1["strategy"] == "range"
    assert sorted(
        p for tps in r1["assignment"].values() for _, p in tps
    ) == list(range(6))
    # generation fences: a commit carrying gen 1 bounces after the next
    # rebalance, exactly like join_group
    r2 = log.rebalance_group(
        "g", "ev", ["c1", "c2"], strategy="cooperative-sticky"
    )
    assert r2["generation"] == 2
    # sticky across the stored state: c1/c2 keep their gen-1 partitions
    for m in ("c1", "c2"):
        assert set(map(tuple, r1["assignment"][m])) <= set(
            map(tuple, r2["assignment"][m])
        )
    # c3's orphans moved to new owners -> they are the revoked set
    assert sorted(map(tuple, r2["revoked"])) == sorted(
        map(tuple, r1["assignment"]["c3"])
    )
    d = log.describe_group("g")
    assert d["generation"] == 2
    assert d["members"] == ["c1", "c2"]
    assert d["assignment"] == r2["assignment"]
    # join_group (e.g. an admin reset's fence) bumps but keeps assignment
    log.join_group("g")
    assert log.describe_group("g")["assignment"] == r2["assignment"]
    with pytest.raises(ValueError, match="unknown topic"):
        log.rebalance_group("g", "nope", ["c1"])
