"""Connected components — dedup-cluster assignment (SURVEY.md §2.6 L1/L2).

Near-dup detection (MinHash/Jaccard/SimHash) emits *pairs*; a pipeline needs
*clusters* ("keep one doc per component"). Components come from iterative
min-label propagation over the (symmetrized) edge set:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Every iteration is one shuffle join + one groupBy on
the node key — fully distributed; the driver only checks the scalar
"did any label change" count per round. Rounds needed = graph diameter;
near-dup graphs are dense clumps (tiny diameter), so a handful of rounds.
At extreme scale the alternating small-star/large-star variant (Kiveris et
al., "Connected Components in MapReduce") halves rounds to O(log n) — same
join shapes, noted here as the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    double_from: int = 2,
    dedupe_edges: bool = True,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges`` (undirected);
    component = the minimum node id in the node's connected component.

    Raises after ``max_iters`` non-converged rounds (a correctness guard —
    the result is only meaningful at fixpoint). ``dedupe_edges=False`` skips
    the edge-distinct shuffle: min-label propagation is idempotent under
    duplicate edges (they only inflate the per-round join input), so callers
    whose pair source is unique by construction — LSH/Jaccard emit each
    (id1 < id2) pair once — save a full shuffle + materialization of the
    edge table.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.where(F.col("a") != F.col("b"))
    if dedupe_edges:
        sym = sym.distinct()
    sym = sym.persist()
    # localCheckpoint (not persist) each round: caching keeps the DATA hot
    # but the logical plan still nests one join deeper per iteration, and by
    # ~iteration 5 optimizer+codegen over the accumulated plan dominates —
    # measured 2 s → 47 s → driver OOM on a 215k-edge graph. Checkpointing
    # truncates the lineage so every round plans against a flat scan.
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for i in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the pre-step label so convergence is a filter over the
        # checkpointed result, not an extra shuffle join per round (at
        # label-table sizes the loop is per-round-overhead-bound)
        stepped = labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left").select(
            "node",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        if i >= double_from:
            # Pointer doubling: label ← label(label). Labels only decrease
            # toward the component min, so the parent's label is ≤ ours —
            # the extra self-join halves the remaining distance per round,
            # i.e. O(log diameter) rounds on chains (which plain propagation
            # would never finish inside max_iters). Each round's fixed cost
            # (plan + checkpoint + shuffle) dominates at label-table sizes,
            # so doubling kicks in after round ``double_from``: early enough
            # that total rounds — not per-round joins — set the wall clock.
            parent = stepped.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            stepped = stepped.join(
                parent, stepped["label"] == parent["p_node"], "left"
            ).select(
                "node",
                "old",
                F.least(F.col("label"), F.coalesce("p_label", "label")).alias("label"),
            )
        new_labels = stepped.localCheckpoint()
        changed = new_labels.where(F.col("label") != F.col("old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            sym.unpersist()
            return labels.select(F.col("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Alternating small-star/large-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    extreme-scale path noted in ``connected_components``.

    Each round rewires edges toward per-node minima:
    - large-star: every neighbor v > u connects to m(u) = min(Γ(u) ∪ {u})
    - small-star: every neighbor v ≤ u (and u itself) connects to m(u)

    Per-node minima come from a groupBy MIN — never a collect_list — so a
    hub node of any degree costs one shuffled aggregate, and the edge set
    provably shrinks toward a star forest in O(log n) rounds. Compared to
    min-label propagation (O(diameter) rounds, edge set static) this bounds
    BOTH round count and per-round edge growth, which is what matters when
    the edge table is petabyte-scale. Fixpoint = edge set unchanged
    (count + order-insensitive hash), then every edge is (node, root).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    def _sym(ed: DataFrame) -> DataFrame:
        return ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _mins(sym: DataFrame) -> DataFrame:
        return (
            sym.groupBy("u")
            .agg(F.min("v").alias("mnv"))
            .select(F.col("u").alias("mu"), F.least("u", "mnv").alias("m"))
        )

    def _star(ed: DataFrame, large: bool) -> DataFrame:
        sym = _sym(ed)
        joined = sym.join(_mins(sym), sym["u"] == F.col("mu"))
        cond = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        out = joined.where(cond).select(F.col("v").alias("a"), F.col("m").alias("b"))
        if not large:
            out = out.union(sym.select("u", "v").join(
                _mins(sym), F.col("u") == F.col("mu")
            ).select(F.col("u").alias("a"), F.col("m").alias("b")).distinct())
        return (
            out.where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
        )

    def _fingerprint(ed: DataFrame) -> tuple[int, int]:
        # bit_xor: order-insensitive, overflow-free (ANSI mode rejects a
        # plain SUM of 64-bit hashes)
        row = ed.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    fp = _fingerprint(e)
    for _ in range(max_iters):
        e = _star(_star(e, large=True), large=False).localCheckpoint()
        nfp = _fingerprint(e)
        if nfp == fp:
            # fixpoint = star forest with canonical (root < node) edges:
            # every non-root appears exactly once as v; roots label themselves
            stars = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
            nodes = (
                e.select(F.col("u").alias("node"))
                .union(e.select(F.col("v").alias("node")))
                .distinct()
            )
            roots = nodes.join(stars.select("node"), "node", "left_anti")
            return stars.union(roots.select("node", F.col("node").alias("component")))
        fp = nfp
    raise RuntimeError(f"connected_components_star did not converge in {max_iters} rounds")


def count_triangles(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global triangle count + clustering coefficient over an undirected
    edge set (rows normalized ``a < b``, distinct).

    The naive 3-way self-join enumerates every triangle 6× and — worse —
    builds wedges at hub nodes (a degree-d node contributes d² wedge
    candidates). The scalable form orients each edge from its
    lower-(degree, id) endpoint to the higher one: every node's
    *out*-degree is then O(√m) regardless of hubs, each triangle has
    exactly one node with two out-edges (counted once), and the wedge
    self-join is bounded by Σ outdeg² ≤ m^1.5 — the standard
    degree-ordered wedge-check bound.

    Returns one row: n_nodes, n_edges, n_triangles, n_wedges,
    global_clustering_ppm = 3·triangles·10⁶ div wedges (exact integers).
    """
    # e/deg/oriented each feed several output branches; without
    # materialization Catalyst re-derives the (possibly expensive) edge
    # lineage once per branch — 74 exchanges on the co-purchase graph vs 9
    # with reuse. The result is a single row, so the caches are released
    # in `finally` after the eager compute below — nothing pins executor
    # storage past the call (ADVICE r3).
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col(a) != F.col(b))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    # orient low-(deg, id) → high-(deg, id); total order, so no edge is lost
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).persist()
    w1 = oriented.select("src", F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    w2 = oriented.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    # wedge (x, y) ordered by the same (deg, id) order the orientation uses,
    # so the closing edge — if present — is oriented exactly x→y.
    wedges = w1.join(w2, "src").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    # wedge rows are unique per (src, x, y), so after the semi-join each
    # surviving row is one closed wedge = one triangle.
    tri = wedges.join(closing, ["x", "y"], "left_semi").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    stats = (
        deg.agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("bigint").alias("n_wedges"),
        )
        .crossJoin(e.agg(F.count("*").cast("bigint").alias("n_edges")))
    )
    out = stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.expr("3 * n_triangles * 1000000 div n_wedges").cast("bigint").alias(
            "global_clustering_ppm"
        ),
    )
    # single-row result: materialize eagerly so the shared frames can be
    # released before returning (mirrors connected_components cleanup)
    try:
        rows = out.collect()
    finally:
        e.unpersist(blocking=False)
        oriented.unpersist(blocking=False)
    return edges.sparkSession.createDataFrame(rows, schema=out.schema)


def copurchase_edges(
    lineitem: DataFrame,
    min_weight: int = 2,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Symmetric (a, b) edge list of the co-purchase graph: items appearing
    in the same order, kept when the pair recurs in ≥ ``min_weight``
    orders (the noise screen that keeps the graph sparse — see the q204
    degree profile: the unweighted graph's MIN degree is 42). One
    self-join keyed on the order (bounded by lines-per-order²), one pair
    agg; callers checkpoint per their iteration discipline."""
    li = lineitem.select(order_col, item_col)
    w0 = (
        li.alias("x")
        .join(
            li.alias("y"),
            F.expr(
                f"x.{order_col} = y.{order_col} AND x.{item_col} < y.{item_col}"
            ),
        )
        .groupBy(F.col(f"x.{item_col}").alias("p1"), F.col(f"y.{item_col}").alias("p2"))
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= min_weight)
        .select("p1", "p2")
    )
    return w0.select(F.col("p1").alias("a"), F.col("p2").alias("b")).unionAll(
        w0.select(F.col("p2").alias("a"), F.col("p1").alias("b"))
    )
