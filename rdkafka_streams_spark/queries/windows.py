"""Window functions + as-of join (SURVEY.md §2.4 E19–E21, E9).

Determinism: row_number/ntile get a total order (unique tiebreak keys);
rank/dense_rank/percent_rank may keep ties (they're order-deterministic by
definition). Frame sums use DECIMAL so running totals are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.operators.asof import asof_join
from rdkafka_streams_spark.operators.topk import top_k_per_group
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------- E19
@query(
    "q22_window_rank",
    oracle="""
SELECT * FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn,
         RANK()       OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rk,
         DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drk,
         NTILE(4)     OVER (PARTITION BY l_suppkey
                            ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS quartile,
         ROUND(PERCENT_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC), 6) AS pr
  FROM lineitem
) WHERE rn <= 50
""",
    tags=("E19",),
)
def q22_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile/percent_rank; ranking fns use the
    tie-bearing order (deterministic by definition), positional fns use the
    total order.

    Partitioned by ``l_suppkey`` — a key whose cardinality GROWS with the
    data — so partition width stays bounded (~600 rows/supplier at any
    SF) and the sort parallelism scales with the cluster. The previous
    demo keyed on the 3-value ``l_returnflag``, which degenerates to 3
    giant single-task sorts at scale (VERDICT r3); exact ranking
    functions genuinely need their full partition, so the fix is a
    scale-honest key, with `operators/topk.top_k_per_group_salted` as
    the pre-prune alternative when a low-cardinality key is mandatory."""
    l = _t(spark, sf_dir, "lineitem")
    w_total = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    w_qty = Window.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    return (
        l.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.row_number().over(w_total).alias("rn"),
            F.rank().over(w_qty).alias("rk"),
            F.dense_rank().over(w_qty).alias("drk"),
            F.ntile(4).over(w_total).alias("quartile"),
            F.round(F.percent_rank().over(w_qty), 6).alias("pr"),
        )
        .where(F.col("rn") <= 50)
    )


# ----------------------------------------------------------------------- E20
@query(
    "q23_window_analytic",
    oracle="""
SELECT event_id, user_id, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       FIRST_VALUE(value) OVER w AS first_value,
       LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("E20",),
)
def q23_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user over event time."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w_all).alias("last_value"),
    )


# ----------------------------------------------------------------------- E21
@query(
    "q24_window_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w3 AS DOUBLE) / COUNT(*) OVER w3 AS ma3
FROM events
WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("E21",),
)
def q24_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frames: running total (unbounded→current) and 3-row moving
    average — exact DECIMAL accumulation, emitted as double."""
    e = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = wo.rowsBetween(-2, Window.currentRow)
    dec = F.col("value").cast("decimal(12,2)")
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec).over(w_run).cast("double").alias("running_total"),
        (F.sum(dec).over(w3).cast("double") / F.count("*").over(w3)).alias("ma3"),
    )


# ------------------------------------------------------------------------ E9
@query(
    "q38_asof_join",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     e AS (SELECT * FROM events WHERE event_type = 'error'),
     j AS (
  SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
         e.value AS value_asof, epoch_us(e.ts) AS ts_asof_us,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY e.ts DESC) AS rn
  FROM p LEFT JOIN e ON p.user_id = e.user_id AND e.ts < p.ts)
SELECT event_id, user_id, ts_us, value_asof, ts_asof_us FROM j WHERE rn = 1
""",
    tags=("E9",),
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the latest strictly-prior error of the
    same user. Spark side runs the union+carry-forward composition
    (operators/asof.py — one shuffle, no range blowup); the oracle states the
    same semantics as a range join + row_number pick."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    errors = ev.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(
        purchases, errors, on="user_id", left_ts="ts", right_ts="ts",
        payload=["value"], strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value_asof"),
        F.unix_micros("ts_asof").alias("ts_asof_us"),
    )


# ------------------------------------------------------------- E19 (pattern)
@query(
    "q39_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""",
    tags=("E19", "E18"),
)
def q39_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment (operators/topk.py)."""
    c = _t(spark, sf_dir, "customer")
    return top_k_per_group(
        c.select("c_mktsegment", "c_custkey", "c_acctbal"),
        group=["c_mktsegment"],
        order=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3,
    )
