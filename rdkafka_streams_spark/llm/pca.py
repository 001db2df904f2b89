"""Integer-exact PCA by power iteration — the embedding-table analog of
the reference's derived-stream aggregations (viriciti/rdkafka-streams
exposes only row-level transforms; this module is part of the
training-data extensions, SURVEY.md §2.8).

Why this shape at 100 TB: the ONLY corpus-sized work is ONE pass that
partially aggregates the integer co-moment sufficient statistics
(Gram matrix G = ΣqqT, column sums S, count N) map-side — the classic
treeAggregate shape, done here as an Arrow-batched ``mapInPandas`` with
numpy int64 matmuls per batch and a 4161-value exact reduce. The
power iteration itself runs on the DRIVER over the dim×dim co-moment —
a dim²-bounded artifact (like k-means centroids or PQ codebooks riding
as literals), never data-bounded — in arbitrary-precision Python ints.

Determinism (the oracle contract): vectors quantize with the global
fixed scale (``quantize_global``); G/S/N are exact integer sums (order-
independent); the co-moment M = N·G − S·ST is built in Python ints
(DuckDB mirrors in HUGEINT); each iteration renormalizes WITHOUT
division-by-norm (float hazard) — instead the vector is shifted down by
a power of ten chosen from the DIGIT COUNT of max|u| (exact in both
engines: length of the decimal string), with sign-split truncating
division (-(|u| div p) for negatives) so Python and SQL agree bit for
bit. The final eigenvector's sign is canonicalized (largest-|component|
dim positive, ties to the smaller dim) — eigenvectors are defined up to
sign, the gate needs ONE.

Overflow bounds (all documented, none silent): per-batch and global G
entries are Σ q_i·q_j ≤ N·scale² — int64-exact to N ≈ 9e12 vectors;
M entries are N·G − S² ≤ N²·scale², exact in Python/HUGEINT always
(the int64-sensitive part never leaves the driver).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdkafka_streams_spark.llm.similarity import quantize_global

PCA_ITERS = 8
PCA_FP = 1_000_000  # fixed-point scale of the iterated vector


def _comoment(emb: DataFrame, dim: int, scale: int,
              vec_col: str) -> tuple[list[list[int]], list[int], int]:
    """One distributed pass → (G, S, N) on the driver: integer Gram/sum
    partials per Arrow batch (numpy int64 matmul — vectorized, exact
    within the documented N bound), element-wise exact reduce via
    posexplode + SUM (distributed — the collect below is 4161 rows of
    REDUCED statistics, bounded by dim², not by data or partitions).

    These are ADDITIVE sufficient statistics: (G, S, N) of a union of
    corpora is the element-wise sum of the parts' — the algebraic fact
    the incremental path (``pca_top_component_incremental``) rests on,
    with the co-moment M = N·G − S·ST built only at fit time."""
    q = emb.select(quantize_global(vec_col, scale).alias("__v"))
    # int64 headroom for the Gram accumulation: every G entry is
    # |Σ q_i·q_j| ≤ N·max|q|² summed map-side in numpy int64 AND again in
    # Spark's long SUM — neither raises on wrap (non-ANSI), so the bound
    # is enforced explicitly: partition-locally before each matmul, and
    # globally on the driver after the reduce (max|q| rides along with
    # the partials, reduced by MAX). 2^62 leaves a 2× safety margin.
    headroom = 1 << 62

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        g = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        maxq = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["__v"].tolist(), dtype=np.int64)
            maxq = max(maxq, int(np.abs(m).max()))
            # exact Python-int check BEFORE the int64 matmul can wrap
            if (n + len(pdf)) * maxq * maxq >= headroom:
                raise ValueError(
                    "integer-exact PCA overflow guard: partition Gram "
                    f"bound n·max|q|² = {(n + len(pdf))} · {maxq}² exceeds "
                    "int64 headroom (2^62) — embeddings are not "
                    "unit-normalized at this scale; lower `scale` or "
                    "normalize vectors first"
                )
            g += m.T @ m
            s += m.sum(axis=0)
            n += len(pdf)
        if n:
            flat = list(g.reshape(-1)) + list(s) + [n, maxq]
            yield pd.DataFrame({"vals": [flat]})

    parts = q.mapInPandas(part, schema="vals array<long>")
    red = (
        parts.select(F.posexplode("vals").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("v"), F.max("v").alias("mx"))
        .collect()
    )
    acc = [0] * (dim * dim + dim + 2)
    for r in red:
        # the last slot is the per-partition max|q| — reduce by MAX, not SUM
        acc[r["i"]] = int(r["mx"] if r["i"] == dim * dim + dim + 1 else r["v"])
    gm = [acc[i * dim:(i + 1) * dim] for i in range(dim)]
    sv = acc[dim * dim:dim * dim + dim]
    n = acc[dim * dim + dim]
    maxq = acc[-1]
    if n == 0:
        raise ValueError("no vectors (empty corpus?)")
    # global bound: the Spark long SUM of partition partials is exact iff
    # the TOTAL |Σ q_i·q_j| ≤ N·max|q|² fits — checked in Python ints
    if n * maxq * maxq >= headroom:
        raise ValueError(
            "integer-exact PCA overflow guard: global Gram bound "
            f"N·max|q|² = {n} · {maxq}² exceeds int64 headroom (2^62) — "
            "embeddings are not unit-normalized at this scale; lower "
            "`scale` or normalize vectors first"
        )
    return gm, sv, n


def _build_m(gm: list[list[int]], sv: list[int], n: int) -> list[list[int]]:
    """Co-moment M = N·G − S·ST in exact Python ints."""
    dim = len(sv)
    return [
        [n * gm[i][j] - sv[i] * sv[j] for j in range(dim)]
        for i in range(dim)
    ]


def _renorm(u: list[int]) -> list[int]:
    """Shift u down by 10^(digits(max|u|) − 7) with sign-split truncating
    division — max|result| lands in [1e6, 1e7) whenever max|u| ≥ 1e7;
    exact and engine-agnostic (digit count = decimal string length)."""
    a = max(abs(x) for x in u)
    d = len(str(a))
    if d <= 7:
        return list(u)
    p = 10 ** (d - 7)
    return [-((-x) // p) if x < 0 else x // p for x in u]


def power_iteration(m: list[list[int]], iters: int = PCA_ITERS) -> list[int]:
    """Driver-side exact power iteration over the integer co-moment:
    v0 = 1e6·e_k at the max-variance diagonal (ties → smaller dim);
    iterate u = M·v, renormalize by digit-shift; canonicalize sign so
    the largest-|component| dim (ties → smaller) is positive."""
    dim = len(m)
    k = max(range(dim), key=lambda i: (m[i][i], -i))
    v = [PCA_FP if i == k else 0 for i in range(dim)]
    for _ in range(iters):
        u = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        v = _renorm(u)
    j = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[j] < 0:
        v = [-x for x in v]
    return v


def pca_top_component(
    emb: DataFrame,
    scale: int = 1000,
    iters: int = PCA_ITERS,
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[int]]:
    """Top principal direction of the embedding table: returns
    (loadings DataFrame (dim, loading), the loading list) — the list is
    what downstream projection passes embed as literals."""
    row = emb.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError("no vectors (empty corpus or NULL embedding?)")
    dim = len(row[0])
    gm, sv, n = _comoment(emb, dim, scale, vec_col)
    v = power_iteration(_build_m(gm, sv, n), iters)
    out = emb.sparkSession.createDataFrame(
        [(i, int(v[i])) for i in range(dim)], "dim int, loading bigint"
    )
    return out, v


def pca_top_component_incremental(
    parts: list[DataFrame],
    scale: int = 1000,
    iters: int = PCA_ITERS,
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[int]]:
    """INCREMENTAL fit: each part (the standing corpus's SAVED statistics
    day one, each day's increment after) contributes its own (G, S, N)
    pass, and the fit runs on the element-wise SUM — exact additivity of
    the sufficient statistics, so the merged fit is BIT-IDENTICAL to
    retraining on the union (the gate proves it against the full-corpus
    oracle). The persisted artifact is dim²+dim+1 integers — the q326
    save/load posture applies as-is; the standing corpus is never
    rescanned when an increment lands."""
    if not parts:
        raise ValueError("no parts")
    row = parts[0].select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError("no vectors (empty corpus or NULL embedding?)")
    dim = len(row[0])
    gm = [[0] * dim for _ in range(dim)]
    sv = [0] * dim
    n = 0
    for idx, p in enumerate(parts):
        r = p.select(vec_col).first()
        if r is None:
            continue  # empty increment — contributes nothing
        # validate the part's contract BEFORE _comoment, so a NULL or
        # dimension-mismatched embedding fails with the part index, not
        # an opaque numpy shape / Spark executor error
        if r[0] is None:
            raise ValueError(
                f"part {idx}: first embedding is NULL — incremental PCA "
                "requires non-null vectors (filter NULLs upstream)"
            )
        if len(r[0]) != dim:
            raise ValueError(
                f"part {idx}: embedding dim {len(r[0])} != part 0's dim "
                f"{dim} — all increments must share the fit's dimension"
            )
        g1, s1, n1 = _comoment(p, dim, scale, vec_col)
        for i in range(dim):
            sv[i] += s1[i]
            for j in range(dim):
                gm[i][j] += g1[i][j]
        n += n1
    v = power_iteration(_build_m(gm, sv, n), iters)
    out = parts[0].sparkSession.createDataFrame(
        [(i, int(v[i])) for i in range(dim)], "dim int, loading bigint"
    )
    return out, v


def project_stats(
    emb: DataFrame,
    v: list[int],
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Exact integer projections qvT·v per vector (v as an unrolled
    literal expression — whole-stage codegen, no UDF) aggregated per
    group: (group, n_vecs, min_proj, max_proj, sum_proj). One scan, one
    small-key aggregation; sum_proj is int64-exact to ~1e7 vectors per
    group at scale=1000. BEYOND that bound the CALLER must switch the
    sum to decimal (``sum(__p cast decimal(38,0))``) — this function
    keeps the long sum, which wraps silently in non-ANSI Spark while a
    HUGEINT oracle stays exact, so past the bound the engines diverge.
    The per-vector projections (min/max) are exact regardless."""
    proj = F.expr(
        " + ".join(f"__v[{i}] * {int(v[i])}L" for i in range(len(v)))
    ).cast("long")
    return (
        emb.select(F.col(group_col), quantize_global(vec_col, scale).alias("__v"))
        .select(group_col, proj.alias("__p"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.min("__p").cast("bigint").alias("min_proj"),
            F.max("__p").cast("bigint").alias("max_proj"),
            F.sum("__p").cast("bigint").alias("sum_proj"),
        )
    )
