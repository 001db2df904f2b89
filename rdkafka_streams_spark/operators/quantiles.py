"""Exact distributed quantiles (the non-sketch complement of
``percentile_approx``/GK in q64).

``percentile_cont`` semantics: the q-quantile of n sorted values sits at
position (n-1)·q (0-based); interpolate linearly between the two bracketing
values. This module computes it exactly and engine-independently:

- per-group ``row_number`` over the value (one parallel window shuffle —
  ties need no tiebreak: equal values interpolate identically whatever
  their relative order);
- group counts broadcast back;
- each row contributes weight (1-frac) at position lo+1 and frac at lo+2 —
  a filter + tiny weighted sum instead of any full-group collect.

With quantiles at multiples of 1/4 (or any small power of two over a small
denominator) and values snapped to integer micro-units, every product is
exact in IEEE doubles, so Spark and any SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact percentile_cont per group. ``value_col`` is snapped to
    ``scale`` integer units first. Output: group, n, one ``p<q>`` column
    per requested quantile (rounded to 6), plus ``iqr`` when both 0.25
    and 0.75 are present."""
    v = F.floor(F.col(value_col) * scale + 0.5).cast("bigint")
    base = df.select(F.col(group_col).alias("g"), v.alias("v"))
    counts = base.groupBy("g").agg(F.count("*").alias("n"))
    w = Window.partitionBy("g").orderBy("v")
    ranked = base.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(counts), "g"
    )

    # map-side prune: only the ≤2 bracketing rows per quantile survive to
    # the final (tiny) per-group weighted sum.
    keep = F.lit(False)
    for q in qs:
        lo_k = F.floor((F.col("n") - 1) * F.lit(q))
        keep = keep | (F.col("rn") == lo_k + 1) | (F.col("rn") == lo_k + 2)
    ranked = ranked.where(keep)

    aggs = [F.max("n").cast("bigint").alias("n")]
    names = []
    for q in qs:
        pos = (F.col("n") - 1) * F.lit(q)
        lo = F.floor(pos)
        frac = pos - lo
        weight = (
            F.when(F.col("rn") == lo + 1, 1.0 - frac)
            .when((frac > 0) & (F.col("rn") == lo + 2), frac)
            .otherwise(0.0)
        )
        name = f"p{int(q * 100)}"
        names.append(name)
        aggs.append(
            F.round(F.sum(F.col("v") * weight) / scale, 6).alias(name)
        )
    out = ranked.groupBy("g").agg(*aggs).withColumnRenamed("g", group_col)
    if "p25" in names and "p75" in names:
        out = out.withColumn("iqr", F.round(F.col("p75") - F.col("p25"), 6))
    return out
