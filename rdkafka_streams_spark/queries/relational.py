"""Batch relational operators (SURVEY.md §2.4 E1–E22, E31–E33).

Each query is a thin declarative DataFrame program — Catalyst supplies
predicate pushdown, column pruning, join selection, and AQE; the engine adds
only explicit broadcast hints for dimension tables (REF has no optimizer at
all, SURVEY.md §4, so everything here is the Spark-first re-expression).

Reference anchors: the REF-user transform surface (filter/projection,
README.md:41-64 of /root/reference) generalizes to E1/E2; everything else is
EXT per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table, register_views
from rdkafka_streams_spark.functions.money import (
    SQL_DISC_PRICE,
    SQL_CHARGE,
    charge_expr,
    disc_price_expr,
    money,
    rate,
)
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- E10/E2/E17
@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)            AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE)                       AS sum_disc_price,
       CAST(SUM({SQL_CHARGE}) AS DOUBLE)                           AS sum_charge,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)  AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)       AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("E10", "E2", "E17", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 shape — scan → filter → hash agg → sort.

    Scale notes: filter is pushed to the parquet scan; the groupBy key space
    is tiny (6 groups) so partial (map-side) aggregation collapses the 100 TB
    fact table before the single cheap shuffle. Money math in DECIMAL (exact);
    averages derived as sum/count in double.
    """
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    n = F.count("*")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price_expr()).cast("double").alias("sum_disc_price"),
            F.sum(charge_expr()).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("bigint")).cast("double") / n).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(rate("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------------------------------ E1
@query(
    "q02_select_project",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST({SQL_DISC_PRICE} AS DOUBLE) AS net_price,
       l_returnflag || '/' || l_linestatus AS flag_status,
       l_quantity AS qty
FROM lineitem
WHERE l_linenumber = 1
""",
    tags=("E1",),
)
def q02_select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection, computed column, rename (REF-user R2: record re-tagging,
    reference README.md:53)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            disc_price_expr().cast("double").alias("net_price"),
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
            F.col("l_quantity").alias("qty"),
        )
    )


# ------------------------------------------------------------------------ E2
@query(
    "q03_filter_predicates",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('O','F')
  AND o_totalprice BETWEEN 50000 AND 150000
  AND o_orderpriority LIKE '%-%'
  AND NOT (o_orderpriority = '5-LOW' OR o_orderpriority = '4-NOT SPECIFIED')
  AND o_custkey IS NOT NULL
""",
    tags=("E2",),
)
def q03_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with IN / BETWEEN / LIKE / IS NOT NULL / boolean composition
    (REF-user R1: predicate on decoded fields, reference README.md:44-46)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").like("%-%")
        & ~((F.col("o_orderpriority") == "5-LOW") | (F.col("o_orderpriority") == "4-NOT SPECIFIED"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# ------------------------------------------------------------------------ E3
@query(
    "q04_join_inner",
    oracle=f"""
SELECT o.o_orderkey, o.o_orderstatus,
       COUNT(*) AS n_lines,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderkey, o.o_orderstatus
""",
    tags=("E3", "E10"),
)
def q04_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact-to-fact on the natural key.

    Scale notes: orders/lineitem share l_orderkey ↔ o_orderkey; at 100 TB this
    is a shuffle(sort-merge) join on the key both tables would be bucketed on.
    The group-by reuses the join key's partitioning, so AQE plans exactly one
    shuffle per side and no extra exchange for the agg.
    """
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("*").alias("n_lines"), F.sum(disc_price_expr()).cast("double").alias("revenue"))
    )


# ------------------------------------------------------------------------ E4
@query(
    "q05_join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
    tags=("E4", "E10"),
)
def q05_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(money("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "q06_join_full_outer",
    oracle="""
SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
       COALESCE(cn.n_cust, 0) AS n_cust,
       COALESCE(sn.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) cn
FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) sn
ON cn.nk = sn.nk
""",
    tags=("E4",),
)
def q06_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (customer vs supplier presence per nation)."""
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = cn.join(sn, "nk", "full")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ------------------------------------------------------------------------ E5
@query(
    "q07_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
    tags=("E5",),
)
def q07_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers with at least one open order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q08_join_anti",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
    tags=("E5",),
)
def q08_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no pending ('P') orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ------------------------------------------------------------------------ E6
@query(
    "q09_cross_join",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
    tags=("E6",),
)
def q09_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (BroadcastNestedLoopJoin)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# ------------------------------------------------------------------------ E8
@query(
    "q10_interval_join",
    oracle="""
SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_pairs
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey
 AND c.c_acctbal BETWEEN s.s_acctbal - 500 AND s.s_acctbal + 500
GROUP BY s.s_nationkey
""",
    tags=("E8", "E6"),
)
def q10_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/theta join: equi key (nation) + BETWEEN band on balance.

    Scale notes: the equi-key keeps this a hash/sort-merge join with the band
    as a post-join filter — never a cartesian. Pure-theta joins without an
    equi key should be banded (bucketize the range) before joining.
    """
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    cond = (s.s_nationkey == c.c_nationkey) & c.c_acctbal.between(
        s.s_acctbal - 500, s.s_acctbal + 500
    )
    return (
        s.join(c, cond)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ------------------------------------------------------------------------ E7
@query(
    "q11_broadcast_join",
    oracle=f"""
SELECT p.p_brand, COUNT(*) AS n_items,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
    tags=("E7", "E3"),
)
def q11_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the part dim against the lineitem fact.

    Scale notes: part metadata is small relative to the fact table; the
    broadcast eliminates the fact-side shuffle entirely — the scan's partial
    aggregation output (|brands| rows per task) is all that moves.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), F.sum(disc_price_expr()).cast("double").alias("revenue"))
    )


@query(
    "q12_revenue_by_nation",
    oracle=f"""
SELECT n.n_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("E3", "E7", "E10", "flagship"),
)
def q12_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact ⋈ fact ⋈ dim ⋈ dim ⋈ dim.

    Scale notes: lineitem⋈orders is the one genuine shuffle join (both huge,
    co-keyed); customer/nation/region are broadcast so the star arms add zero
    shuffles. The date filter is pushed into the orders scan before the join.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price_expr()).cast("double").alias("revenue"))
    )


# ----------------------------------------------------------------------- E10
@query(
    "q13_agg_basic",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("E10",),
)
def q13_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate: count / count distinct / sum / min / max / avg."""
    o = _t(spark, sf_dir, "orders")
    n = F.count("*")
    total = F.sum(money("o_totalprice")).cast("double")
    return o.groupBy("o_orderpriority").agg(
        n.alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        total.alias("total"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (total / n).alias("avg_price"),
    )


# ----------------------------------------------------------------------- E11
@query(
    "q14_agg_stats",
    oracle="""
WITH mu AS (
  SELECT l_returnflag AS f, AVG(CAST(l_quantity AS DOUBLE)) AS m
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       ROUND(STDDEV_SAMP(l.l_quantity), 6) AS sd_qty,
       ROUND(VAR_SAMP(l.l_quantity), 6) AS var_qty,
       ROUND(CORR(l.l_quantity, l.l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l.l_quantity, l.l_extendedprice), 4) AS covar_qty_price,
       ROUND(QUANTILE_CONT(l.l_quantity, 0.5), 6) AS median_qty,
       ROUND(QUANTILE_CONT(l.l_extendedprice, 0.90), 4) AS p90_price,
       ROUND(AVG(POW(l.l_quantity - mu.m, 3)) / POW(AVG(POW(l.l_quantity - mu.m, 2)), 1.5), 6) AS skew_qty,
       ROUND(AVG(POW(l.l_quantity - mu.m, 4)) / POW(AVG(POW(l.l_quantity - mu.m, 2)), 2) - 3, 6) AS kurt_qty
FROM lineitem l JOIN mu ON l.l_returnflag = mu.f
GROUP BY l.l_returnflag
""",
    tags=("E11",),
)
def q14_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/var/corr/covar/exact percentile/median/
    skewness/kurtosis. Oracle replicates Spark's population-moment formulas
    for skew/kurtosis via an explicit mean CTE; everything rounded to kill
    last-ulp divergence between engines."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.90)), 4).alias("p90_price"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


# ----------------------------------------------------------------------- E12
@query(
    "q15_collect_list_set",
    oracle="""
SELECT lang,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT source)), ',') AS sources_csv,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
""",
    tags=("E12",),
)
def q15_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set folded to a deterministic CSV (sorted before join so the
    unordered set compares stably across engines)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources_csv"),
        F.count("*").alias("n_docs"),
    )


# ----------------------------------------------------------------------- E13
@query(
    "q16_approx_count_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS est_within_5pct
FROM orders GROUP BY o_orderstatus
""",
    tags=("E13", "sketch"),
)
def q16_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct WITH an in-query accuracy audit
    (promoted rows-only → oracle in r5; the q222/q64 audited-sketch
    discipline). The estimate itself is engine-private, but it is
    DETERMINISTIC — HLL registers are per-bucket maxima, a function of
    the key set, not of arrival or merge order — so the |est − exact|
    ≤ 5 % verdict is stable and the oracle can assert it (rsd=0.01
    requested; 5× slack). The exact count rides the same query.

    Scale notes: this is THE distinct-count at 100 TB — fixed-size
    sketch, partial-mergeable, no shuffle of raw keys; the exact branch
    here exists to audit it, at the price the sketch avoids."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.01)
                - F.countDistinct("o_custkey")
            )
            * 20
            <= F.countDistinct("o_custkey")
        ).alias("est_within_5pct"),
    )


# ----------------------------------------------------------------------- E14
@query(
    "q17_rollup",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    tags=("E14",),
)
def q17_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() flags disambiguating the ALL rows."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "g_flag",
            "g_status",
            "sum_qty",
            "n",
        )
    )


@query(
    "q18_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    tags=("E14",),
)
def q18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions with GROUPING() flags."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n"),
            F.sum(money("o_totalprice")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
            "total",
        )
    )


# ----------------------------------------------------------------------- E15
@query(
    "q19_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spent
FROM orders
GROUP BY o_custkey
HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 2000000
""",
    tags=("E15", "E10"),
)
def q19_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) on an exact decimal sum."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).alias("_spent_dec"),
        )
        .where(F.col("_spent_dec") > 2000000)
        .select("o_custkey", "n_orders", F.col("_spent_dec").cast("double").alias("spent"))
    )


# ----------------------------------------------------------------------- E16
@query(
    "q20_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("E16",),
)
def q20_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a composite key (partial-aggregation dedup at scale)."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------------------------ E17/E18
@query(
    "q21_top_k",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
    tags=("E17", "E18"),
)
def q21_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K: orderBy + limit → TakeOrderedAndProject (per-partition heap,
    no global sort — O(k) memory per task at any scale). Unique tiebreak key
    makes the result set deterministic."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ----------------------------------------------------------------------- E22
@query(
    "q25_set_ops",
    oracle="""
SELECT k, 'both' AS tag FROM (
  SELECT DISTINCT o_custkey AS k FROM orders
  INTERSECT
  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0)
UNION ALL
SELECT k, 'orders_only' AS tag FROM (
  SELECT DISTINCT o_custkey AS k FROM orders
  EXCEPT
  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0)
UNION ALL
SELECT k, 'negbal_only' AS tag FROM (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
  EXCEPT
  SELECT DISTINCT o_custkey AS k FROM orders)
""",
    tags=("E22",),
)
def q25_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT over key sets, tagged."""
    a = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    b = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("k")
    )
    return (
        a.intersect(b).withColumn("tag", F.lit("both"))
        .unionByName(a.subtract(b).withColumn("tag", F.lit("orders_only")))
        .unionByName(b.subtract(a).withColumn("tag", F.lit("negbal_only")))
    )


# ----------------------------------------------------------------------- E31
_SUBQ_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o.o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
"""


@query("q35_subqueries", oracle=_SUBQ_SQL, tags=("E31",))
def q35_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN + correlated-EXISTS subqueries; one ANSI string serves both
    engines (Catalyst decorrelates the EXISTS into a semi join)."""
    register_views(spark, sf_dir, ("orders", "customer", "lineitem"))
    return spark.sql(_SUBQ_SQL)


# ----------------------------------------------------------------------- E32
@query(
    "q36_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_F,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_O
FROM lineitem GROUP BY l_returnflag
""",
    tags=("E32",),
)
def q36_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list so the plan needs no
    extra distinct-values pass — required practice at scale)."""
    l = _t(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("bigint")))
    )
    return p.select(
        "l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O")
    )


# ----------------------------------------------------------------------- E33
@query(
    "q37_sample_hash",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE (l_orderkey * 2654435761) % 97 < 10
GROUP BY l_returnflag
""",
    tags=("E33",),
)
def q37_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% arithmetic-hash sample (engine-independent, unlike
    Bernoulli df.sample whose RNG stream is engine-specific; df.sample is the
    production API, exposed via operators.sampling)."""
    l = _t(spark, sf_dir, "lineitem")
    keep = (F.col("l_orderkey") * F.lit(2654435761).cast("bigint")) % 97 < 10
    return (
        l.where(keep)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )
