"""Custom sinks via foreachBatch (SURVEY.md §2.5 T8).

The reference's delivery model is at-least-once: `cb()` fires on enqueue,
before broker ack (src/Producer.coffee:87), and replays after a crash
re-deliver. Spark's micro-batch engine has the same baseline — a batch that
fails after a partial sink write is re-run with the SAME deterministic
batch_id. `foreach_batch_overwrite` turns that into effectively-exactly-once
for file sinks: each micro-batch overwrites its own `batch_id=<n>`
subdirectory, so a replay replaces rather than duplicates.

This is the standard idempotent-sink recipe; transactional sinks (JDBC with
a batch-id ledger, Delta/Iceberg commits) generalize it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_batch_overwrite(batch: DataFrame, batch_id: int, path: str, fmt: str = "parquet") -> None:
    """Idempotent per-batch writer: same (data, batch_id) lands in the same
    directory with overwrite — replays are no-ops, not duplicates."""
    (
        batch.write.format(fmt)
        .mode("overwrite")
        .save(f"{path}/batch_id={batch_id}")
    )


def foreach_batch_overwrite(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_available_now: bool = True,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Start a foreachBatch query writing each micro-batch idempotently under
    ``path/batch_id=<n>``. ``transform`` (optional) runs inside the batch —
    the place for per-batch dedup or enrichment that needs batch scope."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        write_batch_overwrite(batch, batch_id, path, fmt)

    writer = df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
