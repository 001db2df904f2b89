"""Banded time-proximity join.

"left event, then a right event within Δ on the same key" is a range
join; planned naively it becomes a per-key cross join (or a nested-loop
over the whole table). The scalable form *bands* time into Δ-width
buckets: a right row lives in exactly one bucket, a left row is
replicated to its bucket and the next, and the join becomes a plain
equi-join on (key, bucket) followed by the exact predicate — each pair is
examined exactly once (the right row's bucket matches exactly one of the
two replicas), so no dedup pass is needed. Shuffle is keyed on
(key, bucket): adding the band to the key also splits hot keys across
time, which de-skews the classic one-hot-user problem for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_proximity_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: int = 600,
) -> DataFrame:
    """Pairs (left row, right row) with the same ``key`` and
    ``0 ≤ right_ts − left_ts ≤ max_gap_seconds``. Left columns keep their
    names; right columns get an ``r_`` prefix; adds ``gap_us``."""
    gap_us = max_gap_seconds * 1_000_000

    # integral `div`, not float division: a float quotient that rounds up
    # across an integer boundary would mis-band a row and silently drop
    # its pairs.
    lb = (
        left.withColumn("__l_us", F.unix_micros(F.col(left_ts)))
        .withColumn("__b0", F.expr(f"__l_us div {gap_us}"))
        .withColumn("__band", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
    )
    rb = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.unix_micros(F.col(right_ts)).alias("__r_us"),
    ).withColumn("__r_band", F.expr(f"__r_us div {gap_us}"))
    joined = lb.join(
        rb,
        (F.col(key) == F.col(f"r_{key}")) & (F.col("__band") == F.col("__r_band")),
    )
    return (
        joined.where(
            (F.col("__r_us") >= F.col("__l_us"))
            & (F.col("__r_us") - F.col("__l_us") <= gap_us)
        )
        .withColumn("gap_us", F.col("__r_us") - F.col("__l_us"))
        .drop("__band", "__r_band", "__l_us", "__r_us")
    )
