"""Skew-handling joins (SURVEY.md §4 "100 TB posture").

First line of defense is AQE's skew-join splitting (on by default in
core.session). ``salted_join`` is the explicit fallback for the case AQE
can't fix: a *single* hot key on the build side of a shuffle join (AQE splits
oversized partitions, but a hash join still routes one key to one task unless
the key space itself is widened).

Mechanics: the probe (large) side gets a deterministic salt in [0, n);
the build side is replicated n times (one copy per salt value); the join key
becomes (key, salt) → the hot key fans out over n tasks. Cost: build side
×n — use only when the build side is small relative to the skew win.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the key space widened by a salt to defeat single-key skew.

    Result equals ``large.join(small, on, how)`` for inner/left joins (the
    salt is internal). The large side's salt is derived from xxhash64 of all
    its columns — deterministic, uniformly spread, no RNG.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would emit one row per salt for unmatched build rows;
        # semi/anti have no payload to salt — plain join is already cheap.
        raise ValueError(f"salted_join preserves semantics only for inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_large = large.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    replicated_small = small.withColumn(_SALT, salts)
    out = salted_large.join(replicated_small, [*keys, _SALT], how)
    return out.drop(_SALT)


def key_skew_profile(
    df: DataFrame,
    on: str | Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """The diagnostic that decides whether ``salted_join`` is needed: top-k
    hottest join keys with their row share and skew factor (count ÷ mean
    count per key). skew_factor ≈ 1 means uniform; a key at 50× the mean is
    the single-task straggler AQE's partition splitting can't fix.

    One aggregation shuffle on the key plus a 1-row broadcast of the totals
    — safe to run on the full fact table at any scale. Output:
    (*keys, n, share, skew_factor), hottest first.
    """
    keys = [on] if isinstance(on, str) else list(on)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(F.col("n") * F.col("__nkeys") / F.col("__total"), 3).alias("skew_factor"),
        )
        .orderBy(F.col("n").desc(), *keys)
        .limit(top_k)
    )


def hybrid_skew_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: DataFrame,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """The production skew recipe: SPLIT the fact by key temperature —
    rows on ``hot_keys`` (a tiny frame, e.g. the q158/key_skew_profile
    output filtered by skew_factor) take the salted path (each hot key
    widened over n_salts tasks), everything else takes the plain shuffled
    join — then union. Salting everything would replicate the ENTIRE
    build side n_salts times; salting nothing leaves the hot keys as
    single-task stragglers; the hybrid pays replication only for the keys
    that need it. Result ≡ ``large.join(small, on, how)`` for inner/left
    (both branches preserve per-row semantics; the split is a partition
    of the input). ``hot_keys`` must have exactly the join column."""
    hot = F.broadcast(hot_keys.select(on))
    large_hot = large.join(hot, on, "left_semi")
    large_cold = large.join(hot, on, "left_anti")
    small_hot = small.join(hot, on, "left_semi")
    hot_joined = salted_join(large_hot, small_hot, on, n_salts=n_salts, how=how)
    cold_joined = large_cold.join(small, on, how)
    return hot_joined.unionByName(cold_joined)
