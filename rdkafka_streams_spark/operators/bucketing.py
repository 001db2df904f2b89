"""Bucketed (co-located) joins — the zero-shuffle join at 100 TB.

Writing both fact tables bucketed by their join key means every future join
on that key is Exchange-free: matching buckets are read by the same task.
At 100 TB this converts the recurring orders⋈lineitem shuffle (the single
largest network cost in the star schema) into a local merge — pay the
bucketed write once, join for free forever.

``spark.sql.sources.bucketing.enabled`` is on by default; bucket counts
should be sized so a bucket ≈ one task's memory (at 100 TB / 1000 executors,
think 4–16k buckets for the fact tables, matched across tables that join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) managed table."""
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bc)
    if sort_cols is not None:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
