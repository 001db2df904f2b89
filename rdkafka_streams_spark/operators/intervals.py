"""Interval coalescing (gaps-and-islands over true intervals).

Distinct from sessionization (``queries/analytics.py q82``): sessionize
groups *point* events by inter-event gap; this operator merges rows that
carry a real ``[start, end]`` interval whenever they overlap (or sit within
``slack`` of each other), the classic "merge overlapping intervals" /
calendar-coalesce op (validity windows, maintenance windows, coverage
spans).

Algorithm (engine-independent, one window shuffle on the partition key):
sort intervals by (start, end); a row opens a new island iff its start is
greater than the running maximum of all previous ends (+slack). A running
sum over the island-break flags numbers the islands; a final group-by emits
one row per merged interval. Island *boundaries* are independent of the
sort tiebreak (the running max only grows), so the merged output is
deterministic even when starts tie.

Scale: identical cost class to any per-key window — one hash exchange on
the key, per-key sort. No self-join, no explode; 100 TB-safe as long as a
single key's intervals fit a task (same caveat as every windowed op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str | list[str],
    start: str,
    end: str,
    slack: Column | int = 0,
) -> DataFrame:
    """Coalesce overlapping/adjacent ``[start, end]`` intervals per key.

    ``slack`` widens the merge condition: intervals whose gap is ≤ slack
    (in the column's native ordering — days for dates, seconds for
    ``unix_timestamp``-cast columns) still merge. Returns one row per
    merged island: key cols, ``island_id`` (1-based in start order),
    ``island_start``, ``island_end``, ``n_merged``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(start, end)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    slack_col = F.lit(slack) if isinstance(slack, int) else slack
    brk = (
        prev_max_end.isNull()
        | (F.col(start) > _shift(prev_max_end, slack_col))
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_islands = df.select(
        *keys, start, end, F.sum(brk).over(run).cast("bigint").alias("island_id")
    )
    return with_islands.groupBy(*keys, "island_id").agg(
        F.min(start).alias("island_start"),
        F.max(end).alias("island_end"),
        F.count("*").cast("bigint").alias("n_merged"),
    )


def _shift(col: Column, slack: Column) -> Column:
    """start > prev_end + slack, tolerant of date columns (date + int days)."""
    return col + slack
