"""Data-preparation & record-linkage operators: stratified splits, exact
fuzzy matching, corpus-divergence, supervised binning.

These round out the training-data surface (SURVEY.md §2.6): a corpus is
split before training (q152 — EXACT per-stratum proportions, not the
approximate hash split of q113), linked against itself or a registry for
entity resolution (q153 — exact edit-distance-1 join, subquadratic via
deletion neighborhoods), drift-checked between sources (q155 — KL both
directions in order-free micro-nats), and its numeric features binned with
supervised encodings (q157 — decile WOE/IV without a single-task global
sort, via operators/ranking.global_rank).

Determinism: every statistical score is snapped to integer micro-units
BEFORE any aggregation (the module-wide micro-nat pattern, cf. llm/text.py)
so sums are order-free and the DuckDB oracles hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------- stratified split (E33/L)
@query(
    "q152_stratified_split",
    oracle="""
WITH d AS (
  SELECT lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM documents),
s AS (SELECT lang, source,
             CASE WHEN rn * 10 <= n * 8 THEN 'train'
                  WHEN rn * 10 <= n * 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM d)
SELECT lang, source, split, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY lang, source, split
""",
    tags=("E33", "L-prep"),
)
def q152_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split with EXACT per-stratum
    proportions: rank docs inside each (lang, source) stratum by
    md5(doc_id) — a seedless, engine-portable shuffle — and cut at
    ⌊0.8n⌋/⌊0.9n⌋ in pure integer arithmetic (rn·10 ≤ n·8). The q113
    hash split is subset-invariant but only approximately proportional;
    this is the complement for when quota exactness matters (small eval
    strata). Strata cardinality grows with corpus diversity, so the
    per-stratum window parallelizes; for a pathologically low-cardinality
    stratum key, swap the window for operators/ranking.global_rank keyed
    per stratum (q157 shows the shape)."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lang", "source")
    ranked = d.select(
        "lang",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    split = (
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
    )
    return (
        ranked.select("lang", "source", split.alias("split"))
        .groupBy("lang", "source", "split")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


# -------------------------------------------- fuzzy linkage dist≤1 (L2/E23)
@query(
    "q153_fuzzy_linkage",
    oracle="""
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
    tags=("L2", "E23"),
)
def q153_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance-≤1 record linkage over customer names within a
    nation (operators/editdist.py): deletion-neighborhood candidates
    (|s|+1 variants per row, map-side) equi-join on (nation, variant),
    then one Levenshtein verify — subquadratic and EXACT, vs the oracle's
    O(n²)-per-block self-join that only the toy scale tolerates. The
    edit-distance complement of MinHash-LSH (probabilistic, q51) and
    PPJoin (set-similarity, q136)."""
    from rdkafka_streams_spark.operators.editdist import fuzzy_join_dist1

    c = _t(spark, sf_dir, "customer")
    return fuzzy_join_dist1(c, key="c_custkey", text="c_name", block="c_nationkey").select(
        F.col("c_custkey_a").alias("custkey_a"),
        F.col("c_custkey_b").alias("custkey_b"),
        "dist",
    )


# ------------------------------------------------ corpus divergence (L4/E11)
@query(
    "q155_corpus_divergence",
    oracle="""
WITH tok AS (
  SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS grp, unnest(string_split(text, ' ')) AS w
  FROM documents),
c AS (SELECT w, CAST(SUM(grp) AS BIGINT) AS a, CAST(SUM(1 - grp) AS BIGINT) AS b
      FROM tok WHERE w <> '' GROUP BY w),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS v FROM c),
terms AS (
  SELECT CAST(floor(((c.a + 1.0) / (t.na + t.v))
              * ln(((c.a + 1.0) * (t.nb + t.v)) / ((c.b + 1.0) * (t.na + t.v)))
              * 1000000000 + 0.5) AS BIGINT) AS kl_ab_nano,
         CAST(floor(((c.b + 1.0) / (t.nb + t.v))
              * ln(((c.b + 1.0) * (t.na + t.v)) / ((c.a + 1.0) * (t.nb + t.v)))
              * 1000000000 + 0.5) AS BIGINT) AS kl_ba_nano
  FROM c CROSS JOIN t)
SELECT t.na AS n_tokens_a, t.nb AS n_tokens_b, t.v AS vocab,
       CAST(SUM(terms.kl_ab_nano) AS BIGINT) AS kl_ab_nano,
       CAST(SUM(terms.kl_ba_nano) AS BIGINT) AS kl_ba_nano
FROM terms CROSS JOIN t
GROUP BY t.na, t.nb, t.v
""",
    tags=("L4", "E11"),
)
def q155_corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence (both directions) between the token distribution of
    source src0 and the rest of the corpus — the drift/contamination
    screen run before mixing a new source into training data. Laplace
    +1 smoothing over the joint vocabulary; each token's contribution
    p·ln(p/q) is snapped to integer NANO-nats before summing so the
    result is order-free (the micro-nat pattern of q96/q106, one more
    digit because per-token terms are ~1e-4). ONE token-count shuffle;
    totals are a 1-row broadcast; terms are map-side."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("grp"),
        F.explode(F.split("text", " ")).alias("w"),
    ).where(F.col("w") != "")
    c = tok.groupBy("w").agg(
        F.sum("grp").cast("bigint").alias("a"),
        F.sum(1 - F.col("grp")).cast("bigint").alias("b"),
    )
    t = c.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
        F.count("*").cast("bigint").alias("v"),
    )
    terms = c.crossJoin(F.broadcast(t)).select(
        "na", "nb", "v",
        F.floor(
            ((F.col("a") + 1.0) / (F.col("na") + F.col("v")))
            * F.log(
                ((F.col("a") + 1.0) * (F.col("nb") + F.col("v")))
                / ((F.col("b") + 1.0) * (F.col("na") + F.col("v")))
            )
            * 1000000000
            + 0.5
        ).cast("bigint").alias("kl_ab_nano"),
        F.floor(
            ((F.col("b") + 1.0) / (F.col("nb") + F.col("v")))
            * F.log(
                ((F.col("b") + 1.0) * (F.col("na") + F.col("v")))
                / ((F.col("a") + 1.0) * (F.col("nb") + F.col("v")))
            )
            * 1000000000
            + 0.5
        ).cast("bigint").alias("kl_ba_nano"),
    )
    return terms.groupBy("na", "nb", "v").agg(
        F.sum("kl_ab_nano").cast("bigint").alias("kl_ab_nano"),
        F.sum("kl_ba_nano").cast("bigint").alias("kl_ba_nano"),
    ).select(
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        F.col("v").alias("vocab"),
        "kl_ab_nano",
        "kl_ba_nano",
    )


# --------------------------------------------------- WOE binning (E11/E19)
@query(
    "q157_woe_binning",
    oracle="""
WITH r AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders),
b AS (SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS bin, y FROM r),
g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
      FROM b GROUP BY bin),
t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp, CAST(SUM(n_neg) AS BIGINT) AS tn FROM g)
SELECT g.bin, g.n, g.n_pos, g.n_neg,
       CAST(floor(ln(((g.n_pos + 1.0) * (t.tn + 10.0))
                   / ((g.n_neg + 1.0) * (t.tp + 10.0))) * 1000000 + 0.5) AS BIGINT)
         AS woe_micro
FROM g CROSS JOIN t
""",
    tags=("E11", "E19", "L-prep"),
)
def q157_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised decile binning with weight-of-evidence encoding (the
    credit-scoring / feature-engineering classic): global EXACT decile
    assignment over (o_totalprice, o_orderkey) via
    operators/ranking.global_rank — range-partition + parallel local
    ranks + broadcast offsets, never the single-task `OVER ()` window the
    oracle can afford only at toy scale — then per-bin Laplace-smoothed
    WOE = ln(pos_share/neg_share) snapped to micro-nats. Bin =
    ((rn−1)·10) div n in pure integers, so bin edges are reproducible."""
    from rdkafka_streams_spark.operators.ranking import global_rank

    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        "o_totalprice",
        "o_orderkey",
    )
    ranked = global_rank(o, ["o_totalprice", "o_orderkey"], rank_col="rn")
    n = ranked.agg(F.count("*").cast("bigint").alias("n"))
    g = (
        ranked.crossJoin(F.broadcast(n))
        .select(F.expr("((rn - 1) * 10) div n").cast("bigint").alias("bin"), "y")
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
        )
    )
    t = g.agg(
        F.sum("n_pos").cast("bigint").alias("tp"),
        F.sum("n_neg").cast("bigint").alias("tn"),
    )
    return g.crossJoin(F.broadcast(t)).select(
        "bin",
        "n",
        "n_pos",
        "n_neg",
        F.floor(
            F.log(
                ((F.col("n_pos") + 1.0) * (F.col("tn") + 10.0))
                / ((F.col("n_neg") + 1.0) * (F.col("tp") + 10.0))
            )
            * 1000000
            + 0.5
        ).cast("bigint").alias("woe_micro"),
    )


# ----------------------------------------------- integer k-means (L3/E11)
@query(
    "q160_kmeans_clusters",
    oracle="""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                  AS BIGINT)) AS e
  FROM embeddings),
c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
       FROM v ORDER BY vec_id LIMIT 8),
d1 AS (SELECT vec_id, cid, e, SUM((ve - ce) * (ve - ce)) AS d
       FROM (SELECT v.vec_id, c0.cid, v.e,
                    unnest(v.e) AS ve, unnest(c0.ce) AS ce
             FROM v CROSS JOIN c0) u
       GROUP BY vec_id, cid, e),
a1 AS (SELECT vec_id, e, cid FROM (
         SELECT vec_id, e, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM d1) WHERE rn = 1),
m1 AS (SELECT cid, dim, CAST(SUM(val) // COUNT(*) AS BIGINT) AS c
       FROM (SELECT cid, unnest(e) AS val, unnest(range(1, 65)) AS dim FROM a1)
       GROUP BY cid, dim),
c1 AS (SELECT cid, list(c ORDER BY dim) AS ce FROM m1 GROUP BY cid),
d2 AS (SELECT vec_id, cid, SUM((ve - ce) * (ve - ce)) AS d
       FROM (SELECT v.vec_id, c1.cid,
                    unnest(v.e) AS ve, unnest(c1.ce) AS ce
             FROM v CROSS JOIN c1) u
       GROUP BY vec_id, cid),
a2 AS (SELECT vec_id, cid, d FROM (
         SELECT vec_id, cid, d,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM d2) WHERE rn = 1)
SELECT CAST(cid AS BIGINT) AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(d) AS BIGINT) AS inertia
FROM a2 GROUP BY cid
""",
    tags=("L3", "E11"),
)
def q160_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k = 8) over the embedding table in
    EXACT integer arithmetic: coordinates snap to micro-units once, so
    squared distances, argmin assignment (ties → lower cluster id) and
    the truncated-mean centroid update are bit-identical at any
    parallelism — float k-means drifts with reduction order, this
    doesn't. Deterministic seeding (the 8 lowest vec_ids). Per
    iteration: ONE map-side broadcast cross of the k×64 centroids (dist
    via JVM zip_with/aggregate, no Python), one argmin agg, one
    (cluster, dim) mean shuffle. The clustering pass behind corpus
    curation / diversity sampling."""
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + 0.5).cast("bigint"),
        ).alias("e"),
    )
    w8 = Window.orderBy("vec_id")
    cents = (
        v.orderBy("vec_id")
        .limit(8)
        .select((F.row_number().over(w8) - 1).cast("bigint").alias("cid"), F.col("e").alias("ce"))
    )

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        j = points.crossJoin(F.broadcast(centroids))
        d = F.aggregate(
            F.zip_with("e", "ce", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return (
            j.select("vec_id", "e", "cid", d.alias("d"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d", "cid", "e")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.e").alias("e"),
                    F.col("m.d").alias("d"))
        )

    a1 = assign(v, cents)
    m1 = (
        a1.select("cid", F.posexplode("e").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(F.expr("sum(val) div count(*)").cast("bigint").alias("c"))
    )
    c1 = m1.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("ce")
    )
    a2 = assign(v, c1)
    return a2.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("d").cast("bigint").alias("inertia"),
    ).select(F.col("cid").cast("bigint").alias("cluster"), "n_vecs", "inertia")
