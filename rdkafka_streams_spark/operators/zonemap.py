"""Zonemap (min/max data-skipping index) build + pruning estimate.

Parquet row groups already carry min/max stats, but a table-level zonemap —
one (min, max, count) row per file/chunk per indexed column — lets the
*planner* prune files without opening footers, which at 100 TB (millions
of files) is the difference between a sub-second and a multi-minute
planning phase. Complements operators/zorder.py: Z-order clustering makes
zonemaps *selective* (each chunk covers a small value range on every
indexed dimension); this module builds the map and evaluates what a
predicate would skip.

Build is one partial-aggregated shuffle of (chunk → 3 numbers) per column;
the zonemap's size is #chunks, independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_zonemap(df: DataFrame, chunk_col: str, value_cols: list[str]) -> DataFrame:
    """One row per chunk: n_rows plus ``<col>_lo`` / ``<col>_hi`` bounds
    for each indexed column. min/max/count are algebraic, so the shuffle
    moves only per-partition partials."""
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in value_cols:
        aggs.append(F.min(c).alias(f"{c}_lo"))
        aggs.append(F.max(c).alias(f"{c}_hi"))
    return df.groupBy(chunk_col).agg(*aggs)


def prune_with_zonemap(zonemap: DataFrame, value_col: str, lo, hi) -> DataFrame:
    """Mark each chunk as a scan candidate (its [lo, hi] overlaps the
    predicate range) or prunable. Runs on the zonemap only — never touches
    the data — mirroring how a table-format planner consumes file stats."""
    cand = (F.col(f"{value_col}_hi") >= F.lit(lo)) & (F.col(f"{value_col}_lo") <= F.lit(hi))
    return zonemap.withColumn("candidate", cand.cast("int"))
