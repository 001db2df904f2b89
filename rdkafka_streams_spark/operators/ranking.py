"""Distributed exact global ranking (total-order row numbers at scale).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses to a
single task — the textbook Spark scale trap. This operator computes the
identical exact rank with bounded parallelism:

1. range-partition on the sort key (``repartitionByRange`` — Spark samples
   split points, data stays distributed);
2. local ``row_number`` within each range partition (window keyed on
   ``spark_partition_id()`` — every partition ranks in parallel);
3. add each partition's exclusive prefix count (a per-partition count
   aggregate — ≤ #partitions rows — broadcast back).

The offsets and the ranked rows both consume the range exchange; Catalyst
cannot always dedup the two (column pruning gives them different
projections), so by default the scan + range shuffle may evaluate twice —
deterministic either way, because the RangePartitioner samples with a
fixed seed. For a 100 TB input pass ``materialize=True`` to localCheckpoint
the partitioned frame once instead of paying the second scan. Ranks are
exact as long as the sort key is total (pass a unique tiebreak column);
split-point sampling only moves partition boundaries, never the order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Exact 1-based global row number by ``order_cols`` (must be a total
    order — include a unique key as the last column). Adds ``rank_col``."""
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    with_pid = parts.withColumn("__pid", F.spark_partition_id())
    if materialize:
        with_pid = with_pid.localCheckpoint(eager=True)

    counts = with_pid.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off")
    )

    local_w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = with_pid.withColumn("__lrn", F.row_number().over(local_w))
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lrn")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )
