"""Change-data-capture helpers: SCD2 interval build and snapshot-merge.

The reference is a transport layer (its CDC story is "the user pipes a
change stream through a Transform", /root/reference/README.md:41-64);
these operators make that user-space pattern first-class for the batch
side: turn an append-only change/event log into the slowly-changing-
dimension (type 2) table a warehouse query expects, or merge a fresh
changeset into an existing dimension without a table format.

Scale posture: everything is one window shuffle keyed on the entity key
(high-cardinality, well-spread); no collects, no Python on the row path.
With a table format (Delta/Iceberg — not installable here, see ADVICE),
``scd2_merge`` becomes a MERGE INTO; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
    compact: bool = True,
) -> DataFrame:
    """Append-only change log → SCD2 effective-dated intervals.

    Per entity ``key`` (ordered by ``ts`` then ``tiebreak`` for a total
    order): optionally drop consecutive no-op changes (``compact`` — real
    CDC feeds are full-row images, most carrying no attribute change),
    then close each surviving version at the next version's start:
    ``valid_from = ts``, ``valid_to = lead(ts)`` (NULL = current row),
    ``is_current = valid_to IS NULL``.

    One window shuffle on the entity key; the compaction and the interval
    close share it (same partitioning, Catalyst reuses the exchange).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    attr_struct = F.struct(*[F.col(a) for a in attrs])
    out = changes
    if compact:
        out = (
            out.withColumn("__prev", F.lag(attr_struct).over(w))
            .where(F.col("__prev").isNull() | (F.col("__prev") != attr_struct))
            .drop("__prev")
        )
        w = Window.partitionBy(key).orderBy(*order)
    return out.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Merge a changeset into an existing SCD2 dimension (columns
    ``key, *attrs, valid_from, valid_to, is_current``): closed history rows
    pass through untouched; each key's current row is unioned with its new
    changes and re-dated by ``scd2_build`` (a no-op change re-collapses via
    compaction, so merging an already-seen row image is idempotent).

    Only current rows and the changeset enter the window — the closed
    history never reshuffles, which is what makes nightly merges feasible
    when history dwarfs the delta."""
    history = dim.where(~F.col("is_current"))
    current = dim.where(F.col("is_current")).select(
        key, *attrs, F.col("valid_from").alias(ts)
    )
    delta = changes.select(key, *attrs, ts)
    if tiebreak:
        # the dimension's current rows win ties against same-ts re-deliveries
        current = current.withColumn(tiebreak, F.lit(-1).cast("long"))
        delta = changes.select(key, *attrs, ts, tiebreak)
    rebuilt = scd2_build(
        current.unionByName(delta), key, ts, attrs, tiebreak=tiebreak, compact=True
    )
    return history.unionByName(rebuilt.select(*history.columns))


# ------------------------------------------------- streaming (micro-batch)
def latest_scd2_version(dim_root: str) -> str | None:
    """Newest ``v{batch_id}`` snapshot dir under ``dim_root``, or None."""
    import os
    import re

    if not os.path.isdir(dim_root):
        return None
    versions = [d for d in os.listdir(dim_root) if re.fullmatch(r"v\d+", d)]
    if not versions:
        return None
    return os.path.join(dim_root, max(versions, key=lambda d: int(d[1:])))


def read_scd2(spark, dim_root: str, schema: str) -> DataFrame:
    """Load the current SCD2 dimension snapshot (empty frame if none yet)."""
    path = latest_scd2_version(dim_root)
    if path is None:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path)


def scd2_foreach_batch(
    dim_root: str,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
):
    """foreachBatch sink maintaining an SCD2 dimension from a change stream.

    Each micro-batch merges into the latest snapshot and writes a new
    ``v{batch_id}`` dir — snapshot-isolation the poor man's way (readers
    always see a complete version; the reference point for the Delta/
    Iceberg writer this container can't host, see ADVICE). Batch ids are
    monotonically increasing and replay-stable, so a batch re-delivered
    after a crash overwrites its own versioned dir instead of forking
    history — the same idempotent-sink contract as the engine's
    write-ahead commit. Empty batches write nothing.

    The first batch bootstraps the dimension with ``scd2_build``; later
    batches run ``scd2_merge`` (closed history never reshuffles)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        import os

        if not batch.take(1):
            return
        prior = latest_scd2_version(dim_root)
        if prior is None:
            merged = scd2_build(batch, key, ts, attrs, tiebreak=tiebreak)
        else:
            dim = batch.sparkSession.read.parquet(prior)
            merged = scd2_merge(dim, batch, key, ts, attrs, tiebreak=tiebreak)
        out = os.path.join(dim_root, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)

    return apply
