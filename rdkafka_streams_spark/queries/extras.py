"""Coverage extras: UDF surface (E34), approximate percentiles (E11),
additional analytic window functions (E19/E20), min_by/max_by (E10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.functions.udfs import vector_norm
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------- E34
@query(
    "q63_pandas_udf_norm",
    oracle="""
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(range(1, 65),
             i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))), 6) AS norm
FROM embeddings
""",
    tags=("E34",),
)
def q63_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (functions/udfs.py) — the vectorized
    user-transform surface. Rounded to 6: numpy pairwise summation vs a
    sequential fold differ only in the last ulp."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(vector_norm("embedding"), 6).alias("norm"))


# ----------------------------------------------------------------- E11 (approx)
@query(
    "q64_percentile_approx",
    oracle="""
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS rank_ok_p50, TRUE AS rank_ok_p90, TRUE AS rank_ok_p99
FROM lineitem GROUP BY l_returnflag
""",
    tags=("E11", "sketch"),
)
def q64_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch) — THE percentile at 100 TB (bounded
    memory, mergeable) — WITH an in-query rank-error audit (promoted
    rows-only → oracle in r5, the q222 audited-sketch discipline): the
    sketch values themselves are engine-private, but the GK guarantee is
    a RANK bound — the returned value's exact rank must sit within
    ~n/accuracy of the target rank — and exact ranks are computable in
    the same query (count of values ≤ the estimate, per group). The
    emitted verdicts use 10× the advertised accuracy=10000 bound (ties
    widen the rank interval; the slack keeps the audit deterministic),
    and the oracle asserts them: an engine cannot emit TRUE without an
    estimate inside the bound. Exact-value percentiles remain
    oracle-checked in q14/q127."""
    l = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    g = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("arr"),
        F.count("*").alias("n"),
    )
    a = g.select(
        "l_returnflag",
        "n",
        F.element_at("arr", 1).alias("a50"),
        F.element_at("arr", 2).alias("a90"),
        F.element_at("arr", 3).alias("a99"),
    )
    j = l.join(F.broadcast(a), "l_returnflag")

    def rank_of(est: str):
        return F.sum((F.col("l_extendedprice") <= F.col(est)).cast("long"))

    r = j.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        rank_of("a50").alias("r50"),
        rank_of("a90").alias("r90"),
        rank_of("a99").alias("r99"),
    )
    margin = F.col("n") / 1000.0 + 1

    def ok(rank_col: str, p: float):
        return (F.abs(F.col(rank_col) - F.lit(p) * F.col("n")) <= margin).alias(
            f"rank_ok_p{int(p * 100)}"
        )

    return r.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        ok("r50", 0.5),
        ok("r90", 0.9),
        ok("r99", 0.99),
    )


# ------------------------------------------------------------------ E19/E20
@query(
    "q65_window_analytic2",
    oracle="""
SELECT event_id, user_id,
       ROUND(CUME_DIST() OVER (PARTITION BY user_id ORDER BY value), 6) AS cd,
       NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_value
FROM events
""",
    tags=("E19", "E20"),
)
def q65_window_analytic2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value (full frame)."""
    e = _t(spark, sf_dir, "events")
    w_val = Window.partitionBy("user_id").orderBy("value")
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.cume_dist().over(w_val), 6).alias("cd"),
        F.nth_value("value", 2).over(w_full).alias("second_value"),
    )


# ----------------------------------------------------------------------- E10
@query(
    "q66_min_max_by",
    oracle="""
SELECT user_id,
       max_by(event_id, ts) AS latest_event,
       min_by(event_id, ts) AS earliest_event,
       max_by(event_type, ts) AS latest_type
FROM events GROUP BY user_id
""",
    tags=("E10",),
)
def q66_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by argmin-aggregates (latest/earliest record per key —
    the streaming 'last value per key' pattern in batch form)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_id", "ts").alias("latest_event"),
        F.min_by("event_id", "ts").alias("earliest_event"),
        F.max_by("event_type", "ts").alias("latest_type"),
    )


# ----------------------------------------------------------------- E34 (UDAF)
@query(
    "q77_pandas_udaf",
    oracle="""
SELECT label,
       ROUND(AVG(sqrt(list_sum(list_transform(range(1, 65),
             i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))), 6) AS mean_norm
FROM embeddings GROUP BY label
""",
    tags=("E34",),
)
def q77_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): mean L2 norm per
    label, Arrow-batched per group. Rounded to 6 — numpy pairwise vs
    sequential summation differ only in the last ulp."""
    from rdkafka_streams_spark.functions.udfs import mean_norm_grouped

    e = _t(spark, sf_dir, "embeddings")
    # NB: Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates
    # in one agg() — the UDAF stands alone here.
    return e.groupBy("label").agg(
        F.round(mean_norm_grouped("embedding"), 6).alias("mean_norm"),
    )


# ----------------------------------------------------------------- E34 (UDTF)
@query(
    "q78_udtf_tokens",
    oracle="""
SELECT doc_id, pos, toks[pos] AS tok FROM (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
  unnest(generate_series(1, least(len(toks), 5))) AS t(pos)
""",
    tags=("E34",),
)
def q78_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: first-5 tokens with positions
    via a lateral join. Row-at-a-time Python — kept as the E34 API demo
    only; the production equivalent is posexplode(slice(split(...)))
    (JVM-side), per the built-ins-first policy."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class TopTokens:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")[:5], start=1):
                yield i, t

    spark.udtf.register("top_tokens", TopTokens)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok FROM __docs_udtf, LATERAL top_tokens(text) t"
    )
