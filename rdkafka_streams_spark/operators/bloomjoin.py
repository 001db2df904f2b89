"""Bloom-filter semi-join reduction — prune a fact table against a compact
bit-vector of the build side's keys BEFORE the join shuffle.

At 100 TB the dominant join cost is shuffling fact rows that will never
match (the build side is filtered: "urgent orders", "flagged users", …).
A broadcast semi-join fixes that only while the distinct build keys fit in
a broadcast; a Bloom filter compresses them into m bits regardless of key
count — false positives only, never false negatives, so the subsequent
real join keeps the result EXACT while the shuffle moves ~fpp of the
non-matching rows instead of all of them.

Spark's engine does this internally (runtime row-group/bloom filtering),
but not as a user-directed operator; this is the declarative form:

1. build: k hash positions per key (``xxhash64`` with per-hash salt,
   ``pmod`` into m bits) → group bit masks into m/64 words
   (``bit_or(1 << pos%64)``) — the whole filter is an (word → bits)
   DataFrame of m/64 rows, broadcastable at any build-side row count;
2. probe: pack the words into ONE ``map<word, bits>`` row (≤ m/64
   entries — 16 KiB per Mbit of filter), broadcast it once, and test all
   k positions with map lookups — the build aggregation is referenced
   exactly once (never recomputed per hash), the probe adds zero joins,
   and the fact table never shuffles to be probed;
3. the caller then runs the real join on the survivors.

Everything is JVM expressions (xxhash64 / pmod / shiftleft / bit_or);
deterministic, so plans replay identically on retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_build(build: DataFrame, key: str, n_bits: int = 1 << 20, k: int = 2) -> DataFrame:
    """Aggregate the build side's keys into a (word, bits) bit-vector
    DataFrame of ``n_bits / 64`` rows (only set words are materialized)."""
    positions = F.array(
        *[F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )
    return (
        build.select(F.explode(positions).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("bigint").alias("__word"),
            F.expr("shiftleft(cast(1 as bigint), cast(__pos % 64 as int))").alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )


def bloom_prune(
    fact: DataFrame, key: str, bloom: DataFrame, n_bits: int = 1 << 20, k: int = 2
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the bloom (no false
    negatives). The bloom words are packed into a single ``map<word,bits>``
    row and broadcast once (the repo's 1-row stat-join pattern), so the
    build-side aggregation runs exactly once however many hashes probe it;
    all k bit tests are map lookups on the fact side — zero fact shuffles,
    zero per-hash joins. Survivors feed the caller's exact join."""
    packed = bloom.agg(
        F.map_from_arrays(
            F.collect_list("__word"), F.collect_list("__bits")
        ).alias("__bloom")
    )
    hit = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        bits = F.element_at(
            F.col("__bloom"), (pos / 64).cast("bigint")
        )
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast("
            f"pmod(xxhash64({key}, {i}), {n_bits}) % 64 as int))"
        )
        hit = hit & bits.isNotNull() & (bits.bitwiseAND(mask) != 0)
    return fact.crossJoin(F.broadcast(packed)).where(hit).drop("__bloom")
