"""Ordered funnel analysis: how far does each user get through a required
event sequence (step k counts only if it happens *after* step k-1)?

The naive formulation is k self-joins (one per step) — k shuffles of the
fact table and a skew magnet on hot users. The scalable form is ONE
groupBy(user): collect each step's timestamps into per-step arrays
(map-side combined), then resolve the chained "earliest occurrence after
the previous step" with higher-order functions on the grouped row —
`array_min(filter(step_k_ts, t -> t > t_{k-1}))` — entirely JVM-side,
zero Python, one shuffle total. State per user is its own event
timestamps, the same bound a streaming sessionizer holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Returns (step, step_name, n_users): users whose events contain the
    step sequence in timestamp order (strictly increasing across steps).
    Ties inside one step don't matter (any occurrence works); cross-step
    ties are resolved strictly (same-instant events don't chain).
    Every requested step appears in the output — a step no user reached
    reports n_users = 0 rather than vanishing (ADVICE r3)."""
    ev = events.where(F.col(type_col).isin(steps))
    aggs = [
        F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = ev.groupBy(user_col).agg(*aggs)

    # chain: t0 = min(step0 ts); tk = min(step_k ts strictly after t_{k-1})
    reached = per_user.withColumn("__t0", F.array_min("__ts_0"))
    for i in range(1, len(steps)):
        prev = F.col(f"__t{i - 1}")
        reached = reached.withColumn(
            f"__t{i}",
            F.when(
                prev.isNotNull(),
                F.array_min(F.filter(f"__ts_{i}", lambda t: t > prev)),
            ),
        )
    depth = sum(F.col(f"__t{i}").isNotNull().cast("int") for i in range(len(steps)))
    per_user = reached.select(depth.alias("__depth"))

    # a user at depth d counts toward steps 1..d → cumulative sum over the
    # (tiny) depth histogram, broadcast-free and exact.
    hist = per_user.groupBy("__depth").agg(F.count("*").cast("bigint").alias("__n"))
    steps_df = hist.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], ["step", "step_name"]
    )
    return (
        steps_df.join(hist, hist["__depth"] >= steps_df["step"], "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_users"))
    )
