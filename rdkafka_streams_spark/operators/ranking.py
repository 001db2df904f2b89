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
    ranked = (
        with_pid.withColumn("__lrn", F.row_number().over(local_w))
        .withColumn(rank_col, (off_col + F.col("__lrn")).cast("bigint"))
        .drop("__pid", "__lrn")
    )
    # total row count is a free by-product of the counts job (acc is the
    # sum of every partition's count) — expose it so callers that need
    # the cardinality (e.g. ntile bucketing) don't pay a second full scan
    ranked._global_rank_total = acc  # type: ignore[attr-defined]
    return ranked


def global_rank_with_total(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
    materialize: bool | None = None,
) -> tuple[DataFrame, int]:
    """``global_rank`` plus the input's total row count — the count comes
    from the SAME eager per-partition counts job the rank already runs
    (the pid→offset fold ends at the total), so callers needing the
    cardinality (ntile-style bucketing, batch sizing) avoid a second
    full-corpus pass."""
    ranked = global_rank(df, order_cols, rank_col, num_partitions, materialize)
    return ranked, int(getattr(ranked, "_global_rank_total", 0))


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


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    rank_col: str = "rn",
) -> DataFrame:
    """Exact 1-based IN-GROUP rank at scale: ``row_number() OVER
    (PARTITION BY group ORDER BY ...)`` puts one task per group — with a
    handful of corpus-sized groups (sources, languages) that's the same
    single-task trap global_rank exists for. Instead: ONE global_rank
    over (group, *order) (groups sort ascending, so each group's rows
    are a contiguous rank range) minus the group's exclusive prefix
    count (a ≤|groups|-row cumulative sum riding back as a broadcast).
    Identical ranks, bounded parallelism; inherits global_rank's eager
    counts-job contract."""
    ranked = global_rank(df, [group_col] + order_cols, rank_col="__g")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    w = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        group_col,
        F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__off"),
    )
    return (
        ranked.join(F.broadcast(offs), group_col)
        .withColumn(rank_col, (F.col("__g") - F.col("__off")).cast("bigint"))
        .drop("__g", "__off")
    )


def mixture_interleave(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    tau: float = 0.5,
    prefix: int = 500,
) -> DataFrame:
    """Deterministic MIXTURE SCHEDULE by weighted fair queuing: give
    source s the temperature weight m_s = floor(n_s^tau·1e6 + 0.5) (the
    q100 quota rule) and deal documents in order of VIRTUAL FINISH TIME
    vt = r_s / m_s — in-source shuffle rank over weight, the WFQ/start-
    time-fair-queuing discipline — so every PREFIX of the schedule
    honors the mixture proportions to within the WFQ lag bound — ±O(1)
    docs per source, pinned at ±2 by the unit test (the property a
    trainer needs: stopping at any step saw the intended mixture, no
    "source A first, source B never"). Ties (vt, group, r) — total
    order, engine-exact: vt is ONE IEEE double division of exact
    integers, identical bit for bit in Spark and SQL.

    Scale: in-source ranks via grouped_rank (no per-source task);
    weights are a ≤|sources|-row broadcast; the prefix materializes via
    TakeOrderedAndProject (per-partition top-P + merge), never a global
    sort. Returns the first ``prefix`` schedule rows (pos, id, group)."""
    d = docs.select(
        F.col(id_col), F.col(group_col),
        F.md5(F.col(id_col).cast("string")).alias("__o"),
    )
    r = grouped_rank(d, group_col, ["__o", id_col], rank_col="__r")
    m = (
        docs.groupBy(group_col)
        .agg(F.count("*").alias("__n"))
        .select(
            group_col,
            F.floor(F.pow(F.col("__n"), F.lit(tau)) * 1000000 + 0.5)
            .cast("bigint").alias("__m"),
        )
    )
    v = r.join(F.broadcast(m), group_col).select(
        id_col, group_col, "__r",
        (F.col("__r").cast("double") / F.col("__m")).alias("__vt"),
    )
    head = v.orderBy("__vt", group_col, "__r").limit(prefix)
    w = Window.orderBy("__vt", group_col, "__r")
    return head.select(
        F.row_number().over(w).cast("bigint").alias("pos"),
        id_col, group_col,
    )


def length_bucketed_batches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
    batch_size: int = 32,
) -> DataFrame:
    """LENGTH-BUCKETED BATCHING — the dataloader efficiency stage that
    cuts padding waste (batching by length quantile keeps each batch's
    max-len close to its members): ntile-style buckets over the
    (n_tokens, id) total order, fixed-size batches within each bucket,
    per-batch padding waste = n·max_len − Σlen. The WHOLE plan is one
    global_rank + closed-form integer arithmetic + one aggregation —
    ntile's bucket rule (first n % b buckets take ⌈n/b⌉) is replicated
    exactly from (rank, total), so there is NO second window and no
    per-bucket task.

    Returns (bucket, batch, n_docs, max_len, padding_waste)."""
    d = docs.where(F.col(text_col) != "").select(
        F.col(id_col),
        F.size(F.split(text_col, " ")).cast("bigint").alias("n_tok"),
    )
    ranked, total = global_rank_with_total(d, ["n_tok", id_col], rank_col="__r")
    size, extra = divmod(total, n_buckets)
    r0 = F.col("__r") - 1
    bucket = F.when(
        r0 < extra * (size + 1), F.floor(r0 / (size + 1)) + 1
    ).otherwise(
        extra + F.floor((r0 - extra * (size + 1)) / F.lit(max(size, 1))) + 1
    ).cast("bigint")
    bstart = F.when(
        F.col("bucket") <= extra, (F.col("bucket") - 1) * (size + 1)
    ).otherwise(extra * (size + 1) + (F.col("bucket") - 1 - extra) * size)
    withb = ranked.withColumn("bucket", bucket).withColumn(
        "batch",
        (F.floor((F.col("__r") - 1 - bstart) / batch_size) + 1).cast("bigint"),
    )
    return withb.groupBy("bucket", "batch").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.max("n_tok").cast("bigint").alias("max_len"),
        (F.count("*") * F.max("n_tok") - F.sum("n_tok"))
        .cast("bigint").alias("padding_waste"),
    )
