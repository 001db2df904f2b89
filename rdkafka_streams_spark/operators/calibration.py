"""Isotonic calibration (pool-adjacent-violators) — order-constrained
regression over score bins, the standard post-hoc calibration for a
trained filter's raw margins (Zadrozny & Elkan 2002; sklearn
IsotonicRegression). Part of the training-data extensions (SURVEY.md
§2.8); the reference (viriciti/rdkafka-streams) has no model surface.

Shape: the CORPUS-sized work is one windowed binning pass + one
per-bin aggregation; the isotonic fit itself runs over the ``n_bins``
aggregate rows via the MINIMAX characterization

    iso(i) = max_{j<=i} min_{k>=i} mean(y_j..y_k)   (weighted)

— a closed FORM, not an iterative pool loop, so it is expressible as
joins over the tiny bin frame in both engines (n_bins³ work on ≤
n_bins² rows; n_bins is a calibration constant, never data-sized).
PAV's pooled solution and the minimax form are the same function; the
engine defines the fit on MICRO-SNAPPED interval means (floor(1e6·
Σlabel/Σn + 0.5) per (j,k) interval, exact integer compare after) so
Spark and SQL agree bit for bit — and because the optimum is attained
at pooled-block boundaries, snapping at the interval level equals
snapping PAV's block means (unit-pinned against a pure-Python PAV).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ISO_BINS = 16


def isotonic_calibrate(
    scored: DataFrame,
    score_col: str = "margin",
    label_col: str = "actual",
    id_col: str = "doc_id",
    n_bins: int = ISO_BINS,
) -> DataFrame:
    """Bin by score rank (ntile over the (score, id) total order — ties
    deterministic), then fit the weighted isotonic curve over the bins.

    Returns (bin, n_docs, rate_micro, iso_micro): the raw per-bin
    positive rate and the monotone calibrated rate, both in integer
    micro-units. iso_micro is non-decreasing in bin by construction —
    the property a downstream thresholding stage relies on."""
    wb = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    bins = scored.select(
        F.ntile(n_bins).over(wb).alias("bin"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    agg = bins.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = agg.select(
        "bin", "n", "s",
        F.sum("n").over(wc).alias("cn"),
        F.sum("s").over(wc).alias("cs"),
    )
    a, b = cum.alias("a"), cum.alias("b")
    jk = (
        a.join(b, F.col("a.bin") <= F.col("b.bin"))
        .select(
            F.col("a.bin").alias("j"),
            F.col("b.bin").alias("k"),
            F.floor(
                (F.col("b.cs") - (F.col("a.cs") - F.col("a.s")))
                * 1000000
                / (F.col("b.cn") - (F.col("a.cn") - F.col("a.n")))
                + 0.5
            ).cast("bigint").alias("m"),
        )
    )
    ilist = agg.select(F.col("bin").alias("i"))
    iso = (
        jk.join(ilist, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("m").alias("inner_min"))
        .groupBy("i")
        .agg(F.max("inner_min").alias("iso_micro"))
    )
    return (
        agg.join(iso, agg["bin"] == iso["i"])
        .select(
            "bin",
            F.col("n").alias("n_docs"),
            F.floor(F.col("s") * 1000000 / F.col("n") + 0.5)
            .cast("bigint").alias("rate_micro"),
            F.col("iso_micro").cast("bigint").alias("iso_micro"),
        )
    )
