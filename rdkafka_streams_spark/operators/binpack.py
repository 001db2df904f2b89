"""Small-file compaction planning: assign files to ~target-sized rewrite bins.

The 100 TB reality: streaming sinks and over-parallel writers fragment a
table into millions of small files, and scan cost becomes file-count-bound
(one footer read + one task per file). A compaction job needs a *plan* —
which files merge into which output file — before it moves a byte. This
operator produces that plan from the file-listing metadata table, which is
tiny relative to the data (1 row per file), so planning cost is independent
of table size.

Assignment is byte-range binning per directory: files are laid out in a
deterministic order (file id), each file starts at its running byte offset,
and a file belongs to the bin its start offset falls into
(``offset div target``). Properties: bins are contiguous in file order
(adjacent files merge — preserves clustering/sort order within a
partition dir), every bin except a directory's last spans ≥ target bytes
minus one file, and the bin count is ≤ ceil(dir_bytes / target). The
cumulative sum is windowed *per directory*, matching how compaction runs
(per partition dir), so no global single-partition sort exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction_bins(
    files: DataFrame,
    dir_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Returns one row per file with its assigned ``bin`` (0-based within
    the directory) plus the file's ``start_offset`` — the inverse mapping
    (bin → file list) is a groupBy away."""
    w = Window.partitionBy(dir_col).orderBy(file_col)
    offset = F.coalesce(
        F.sum(bytes_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return files.select(
        dir_col,
        file_col,
        F.col(bytes_col).cast("bigint").alias(bytes_col),
        offset.alias("start_offset"),
    ).withColumn("bin", F.expr(f"start_offset div {int(target_bytes)}").cast("bigint"))


def summarize_bins(plan: DataFrame, dir_col: str) -> DataFrame:
    """Collapse a file-level plan to (dir, bin) rewrite units: file count
    and total bytes per output file the compactor will write."""
    return plan.groupBy(dir_col, "bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(plan.columns[2]).cast("bigint").alias("total_bytes"),
    )
