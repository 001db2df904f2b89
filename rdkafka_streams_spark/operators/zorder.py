"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

Sorting a table by one column gives parquet row-group min/max pruning on
that column only; sorting by the interleaved bits of several columns gives
useful pruning on ALL of them at once — the technique behind Delta/Iceberg
OPTIMIZE ZORDER, implemented here as a plain column expression so it works
on raw parquet: ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)
.write...`` and every dimension's filters skip row groups.

Pure integer bit arithmetic (shift/and/or), exact on every engine and
whole-stage-codegen'd; the per-column rank normalization is the caller's
choice (bucket ids, day numbers, hash prefixes — anything uniform-ish).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(*cols: str | Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one long.

    Bit i of column j lands at position ``i * n_cols + j`` — neighbors in
    the key are neighbors in every dimension simultaneously. Columns must
    already be non-negative ints in [0, 2^bits); clamp/rank upstream.
    With n_cols·bits > 63 the key overflows a long — keep n_cols·bits ≤ 60.
    """
    n = len(cols)
    if n * bits > 60:
        raise ValueError("n_cols * bits must be <= 60 to fit a long")
    key = None
    for j, c in enumerate(cols):
        c = F.col(c) if isinstance(c, str) else c
        c = c.cast("long")
        for i in range(bits):
            bit = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
            key = bit if key is None else key.bitwiseOR(bit)
    return key


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_col: str = "__zkey",
    n_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` range-partitioned and sorted by the Morton key of
    ``cols`` — write the result to parquet and row-group min/max pruning
    works for filters on any of the clustered columns. The range
    partitioning is one shuffle; the sort is within partitions (no global
    sort barrier beyond the range sampling)."""
    keyed = df.withColumn(key_col, morton_key(*cols, bits=bits))
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, key_col).sortWithinPartitions(key_col)


def hilbert_key(
    xcol: str | Column, ycol: str | Column, bits: int = 8
) -> Column:
    """2-D Hilbert-curve index of ``(x, y)`` — X8's better half: Morton
    keys take diagonal jumps between quadrants (bit-interleave is cheap
    but locality-lossy), while the Hilbert curve visits every cell of
    each quadrant before leaving it, so equal-size chunks of the sorted
    order cover tighter (x, y) rectangles and zonemap pruning skips
    more (the q341 duel measures the win on the same fixture).

    The classic per-level rotate/reflect walk (Hamilton's xy2d), MSB
    first: at scale s, quadrant (rx, ry) contributes s²·(3rx ⊕ ry) and
    the frame rotates for the next level —

        if ry == 0: (if rx == 1: x, y = s-1-x, s-1-y); swap(x, y)

    — expressed as ONE ``aggregate`` fold over the literal level array
    with a (x, y, d) struct accumulator: pure integer bit arithmetic
    inside whole-stage codegen, exact on every engine (the oracle
    unrolls the same levels as CTE stages). Inputs must be non-negative
    ints in [0, 2^bits); 2·bits ≤ 60 keeps the key a long."""
    if 2 * bits > 60:
        raise ValueError("2 * bits must be <= 60 to fit a long")
    x = (F.col(xcol) if isinstance(xcol, str) else xcol).cast("long")
    y = (F.col(ycol) if isinstance(ycol, str) else ycol).cast("long")
    init = F.struct(
        x.alias("x"), y.alias("y"), F.lit(0).cast("long").alias("d")
    )
    levels = F.array(*[
        F.lit(2 ** k).cast("long") for k in range(bits - 1, -1, -1)
    ])

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        d = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        nx = (
            F.when(flip, s - 1 - acc["y"])
            .when(ry == 0, acc["y"])
            .otherwise(acc["x"])
        )
        ny = (
            F.when(flip, s - 1 - acc["x"])
            .when(ry == 0, acc["x"])
            .otherwise(acc["y"])
        )
        return F.struct(nx.alias("x"), ny.alias("y"), d.alias("d"))

    return F.aggregate(levels, init, step)["d"]
