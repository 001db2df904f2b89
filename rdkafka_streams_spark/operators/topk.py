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
