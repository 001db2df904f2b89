"""Top-K operators (SURVEY.md §2.4 E18/E19).

``top_k`` relies on Catalyst's TakeOrderedAndProject (per-partition bounded
heap, O(k) memory per task, no global sort). ``top_k_per_group`` is the
row_number window formulation; at extreme group counts the window sort is one
shuffle on the group key — the same cost as the aggregation that usually
follows it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k; pass a total order (include a unique tiebreak column)
    for deterministic results."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number over a total order."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def top_k_per_group_salted(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    n_salts: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase top-k per group for *hot* groups (low-cardinality or skewed
    group keys, where the plain window serializes each group onto one task).

    Phase 1 ranks within (group, salt) — n_salts-way parallel per group —
    keeping each shard's top-k; phase 2 re-ranks the surviving ≤ n_salts·k
    rows per group. Identical result to ``top_k_per_group`` under a total
    order; the final sort touches O(groups · n_salts · k) rows instead of
    the whole table."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    w1 = Window.partitionBy(*group, F.col("__salt")).orderBy(*order)
    partial = (
        df.withColumn("__salt", salt)
        .withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= k)
        .drop("__salt", "__r")
    )
    return top_k_per_group(partial, group, order, k, rank_col)
