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


def spread(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Repartition ``df`` to the cluster's parallelism iff it arrives
    with fewer than half that many partitions (a small-file scan);
    identity otherwise. See module docstring for why this is a no-op at
    production scale.

    ``min_bytes`` gates the repartition on the optimizer's size
    estimate: the exchange + extra stage it inserts costs a fixed
    ~0.5-1 s of driver/scheduling overhead, so for frames whose
    single-task work is CHEAPER than that the guard must stay out of
    the way. Interleaved A/B (r15) measured the split: spreading the
    document-scale interpreted-HOF paths (one md5 per token window)
    won 2.1x, while spreading a 2k-row embedding frame ahead of the
    centroid folds LOST 1.2-1.3x. Callers pass min_bytes sized to
    their per-row cost class: 0 for interpreted-HOF-per-derived-row
    paths (always worth it once the input is narrow), a few MB for
    moderate per-row folds (fires in the multi-10k-row regime where
    the single-task pass would take multiple seconds)."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 > par:
        return df
    if min_bytes:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            est = None
        if est is not None and est < min_bytes:
            return df
    return df.repartition(par)


# moderate-fold threshold: ~8 MB of input is the measured break-even
# for the k-centroid assignment folds (see spread docstring)
FOLD_MIN_BYTES = 8 * 1024 * 1024
