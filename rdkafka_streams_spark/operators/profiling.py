"""Data-profiling operator: per-column health stats in ONE table pass.

The pipeline pre-flight every large ingestion runs (the Deequ/
great-expectations shape): null counts, distinct cardinality, min/max per
column — enough to catch a silently-broken upstream (all-null column,
cardinality collapse, out-of-range keys) before compute is spent on it.

One aggregation over the table produces a struct per column (Catalyst
plans the multi-distinct via expand); the result explodes to one row per
column. No per-column rescan: profiling p columns costs one pass
regardless of p.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols``: (col_name, n_rows, n_nonnull, n_distinct,
    min_str, max_str) — min/max computed on the native type, then cast to
    string for a uniform schema (keep to int/string/date columns if the
    output feeds a cross-engine comparison; float formatting differs)."""
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.count(F.col(c)).alias("n_nonnull"),
            F.countDistinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_str"),
            F.max(F.col(c)).cast("string").alias("max_str"),
        ).alias(c)
        for c in cols
    ]
    one = df.agg(F.count("*").alias("__n"), *per_col)
    return one.select(
        F.col("__n").alias("n_rows"), F.explode(F.array(*[F.col(c) for c in cols])).alias("p")
    ).select(
        F.col("p.col_name").alias("col_name"),
        "n_rows",
        F.col("p.n_nonnull").alias("n_nonnull"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_str").alias("min_str"),
        F.col("p.max_str").alias("max_str"),
    )
