"""Consumer-group partition assignment strategies.

The reference rides librdkafka, whose consumer groups are driven by
``partition.assignment.strategy`` (range / roundrobin / sticky /
cooperative-sticky — rdkafka CONFIGURATION.md; the reference exposes the
raw config dict, `/root/reference/src/Consumer.coffee:9-20`). The broker
side of that protocol is a leader-elected assignor: a pure function from
(members, topic partitions, prior assignment) to a member→partitions map.
This module implements those pure functions with Kafka's documented
semantics, and `TopicLog.rebalance_group` wires them to the durable
group state (generation bump = the rebalance barrier, stored assignment
= the sync-group response).

Scale note: assignment is metadata work — O(members + partitions) on the
driver, never touching record data. Kafka runs the same computation on
one group member (the leader); partition counts are bounded (thousands),
so there is nothing to distribute.

- ``range_assign``: Kafka's RangeAssignor (default) — per topic, sorted
  partitions split into contiguous ranges over sorted members; the first
  ``n_partitions % n_members`` members take one extra. Co-partitioned
  topics land the same ranges on the same members (the reason it is the
  default: joins over co-partitioned topics stay member-local).
- ``roundrobin_assign``: RoundRobinAssignor — all (topic, partition)
  pairs in sorted order dealt one-by-one over the sorted member ring;
  balances better than range when topic partition counts are uneven.
- ``sticky_assign``: StickyAssignor's two documented guarantees —
  (1) balance: member loads differ by at most one; (2) maximal
  stickiness: a partition stays with its prior owner unless balance
  forces a move.
- ``cooperative_rebalance``: the COOPERATIVE protocol wrapper — the same
  sticky target plus the revocation set (partitions changing owners),
  which real clients revoke in a first rebalance round while keeping
  every non-moving partition processing (KIP-429's incremental
  cooperative rebalancing).
"""

from __future__ import annotations

from typing import Mapping, Sequence

TP = tuple[str, int]

STRATEGIES = ("range", "roundrobin", "sticky", "cooperative-sticky")


def _check(members: Sequence[str], parts: Mapping[str, Sequence[int]]) -> list[str]:
    if not members:
        raise ValueError("no members to assign to")
    if len(set(members)) != len(members):
        raise ValueError("duplicate member ids")
    return sorted(members)


def range_assign(
    members: Sequence[str], parts: Mapping[str, Sequence[int]]
) -> dict[str, list[TP]]:
    """RangeAssignor: contiguous per-topic ranges over sorted members."""
    ms = _check(members, parts)
    out: dict[str, list[TP]] = {m: [] for m in ms}
    for topic in sorted(parts):
        ps = sorted(parts[topic])
        base, extra = divmod(len(ps), len(ms))
        at = 0
        for i, m in enumerate(ms):
            take = base + (1 if i < extra else 0)
            out[m].extend((topic, p) for p in ps[at : at + take])
            at += take
    return out


def roundrobin_assign(
    members: Sequence[str], parts: Mapping[str, Sequence[int]]
) -> dict[str, list[TP]]:
    """RoundRobinAssignor: sorted (topic, partition) dealt over the ring."""
    ms = _check(members, parts)
    out: dict[str, list[TP]] = {m: [] for m in ms}
    tps = sorted((t, p) for t in parts for p in parts[t])
    for i, tp in enumerate(tps):
        out[ms[i % len(ms)]].append(tp)
    return out


def sticky_assign(
    members: Sequence[str],
    parts: Mapping[str, Sequence[int]],
    prior: Mapping[str, Sequence[TP]] | None = None,
) -> dict[str, list[TP]]:
    """StickyAssignor: balanced (loads differ ≤1) and maximally sticky
    (prior owners keep partitions unless balance forces a move).

    Deterministic: ties break on sorted member id / sorted partition, so
    the same inputs always produce the same assignment — the property the
    durable group state relies on for replayed rebalances.
    """
    ms = _check(members, parts)
    live = set(ms)
    tps = sorted((t, p) for t in parts for p in parts[t])
    tp_set = set(tps)
    out: dict[str, list[TP]] = {m: [] for m in ms}
    claimed: set[TP] = set()
    # 1. stickiness: surviving members keep their still-existing partitions
    for m in sorted(prior or {}):
        if m not in live:
            continue
        for tp in prior[m]:
            tp = (tp[0], int(tp[1]))
            if tp in tp_set and tp not in claimed:
                out[m].append(tp)
                claimed.add(tp)
    # 2. place unassigned partitions on the least-loaded member
    for tp in tps:
        if tp in claimed:
            continue
        tgt = min(ms, key=lambda m: (len(out[m]), m))
        out[tgt].append(tp)
    # 3. rebalance kept load: move from most- to least-loaded until ≤1.
    #    Only prior-kept partitions can be over-concentrated (step 2
    #    filled evenly), so moves here are the forced un-stickiness.
    while True:
        hi = max(ms, key=lambda m: (len(out[m]), m))
        lo = min(ms, key=lambda m: (len(out[m]), m))
        if len(out[hi]) - len(out[lo]) <= 1:
            break
        moved = sorted(out[hi])[-1]
        out[hi].remove(moved)
        out[lo].append(moved)
    return {m: sorted(v) for m, v in out.items()}


def cooperative_rebalance(
    members: Sequence[str],
    parts: Mapping[str, Sequence[int]],
    prior: Mapping[str, Sequence[TP]] | None = None,
) -> tuple[dict[str, list[TP]], list[TP]]:
    """Cooperative-sticky (KIP-429): the sticky target assignment plus
    the set of partitions that change owners — the first-round
    revocations; everything else keeps processing uninterrupted."""
    target = sticky_assign(members, parts, prior)
    owned = {
        (tp[0], int(tp[1])): m
        for m, tps in (prior or {}).items()
        for tp in tps
    }
    revoked = sorted(
        tp
        for m, tps in target.items()
        for tp in tps
        if tp in owned and owned[tp] != m
    )
    return target, revoked


def assign(
    strategy: str,
    members: Sequence[str],
    parts: Mapping[str, Sequence[int]],
    prior: Mapping[str, Sequence[TP]] | None = None,
) -> dict[str, list[TP]]:
    """Dispatch on ``partition.assignment.strategy``."""
    if strategy == "range":
        return range_assign(members, parts)
    if strategy == "roundrobin":
        return roundrobin_assign(members, parts)
    if strategy in ("sticky", "cooperative-sticky"):
        return sticky_assign(members, parts, prior)
    raise ValueError(
        f"unknown partition.assignment.strategy {strategy!r} "
        f"(expected one of {STRATEGIES})"
    )
