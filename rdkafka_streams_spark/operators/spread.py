"""Scale-adaptive parallelism guard for per-row-heavy pipeline stages.

Every fixture/driver parquet table is a SINGLE row group, and Spark's
scan splits cannot cross a row-group boundary — so no matter what
``spark.sql.files.minPartitionNum`` asks for, the scan yields ONE
non-empty task and everything computed scan-side (window-anchor
explosion, shingling, centroid-assignment folds — the higher-order
functions Catalyst cannot codegen) serializes onto one core. At
production scale the same table is thousands of splits and the problem
does not exist.

``spread`` adapts instead of pinning either regime (optimization guide
§2: derive partitioning from the input, not from a constant): when the
frame has materially fewer partitions than the cluster's parallelism it
inserts one round-robin repartition so downstream per-row work runs
wide; otherwise it is the identity (NO exchange added at scale).

Round-robin repartition is deterministic under task retries (Spark
sorts partitions before redistributing, SPARK-23207), and callers only
apply it upstream of key-partitioned shuffles, global aggregates or
windows — placement cannot change any result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the cluster's parallelism iff it arrives
    with fewer than half that many partitions (a small-file scan);
    identity otherwise. See module docstring for why this is a no-op at
    production scale."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= par:
        return df.repartition(par)
    return df
