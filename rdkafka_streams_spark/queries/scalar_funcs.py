"""Scalar function families (SURVEY.md §2.4 E23–E30, §2.3 R3/R4).

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python crosses the row path. Oracles mind the known
DuckDB dialect differences (ln vs log, regexp_replace 'g' flag, BIGINT
returns from year()/instr(), double→int cast rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------- E23
@query(
    "q26_string_funcs",
    oracle="""
SELECT p_partkey,
       concat_ws(' ', p_brand, p_name) AS brand_name,
       substring(p_name, 1, 5) AS name5,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       trim('  ' || p_name || ' ') AS name_trim,
       CAST(length(p_name) AS INT) AS name_len,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
       CAST(instr(p_name, 'r') AS INT) AS r_pos,
       regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS name_word2,
       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
       (p_name LIKE '%r%') AS has_r
FROM part
""",
    tags=("E23",),
)
def q26_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substring/upper/lower/trim/length/lpad/instr/regexp_*/like."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws(" ", "p_brand", "p_name").alias("brand_name"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_pad"),
        F.instr("p_name", "r").alias("r_pos"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("name_word2"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_name").like("%r%").alias("has_r"),
    )


# ----------------------------------------------------------------------- E24
@query(
    "q27_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(weekofyear(o_orderdate) AS INT) AS wk,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d') AS od_str
FROM orders
WHERE o_orderkey % 10 = 0
""",
    tags=("E24",),
)
def q27_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/week/date_trunc/date_add/datediff/
    unix_timestamp/date_format (UTC session timezone pins epoch math)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("wk"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_str"),
    )


# ----------------------------------------------------------------------- E25
@query(
    "q28_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS disc_amount,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       abs(l_extendedprice - 50000) AS dist_50k,
       pow(l_quantity, 2) AS qty_sq,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(exp(l_discount), 6) AS disc_exp,
       CAST(sign(l_extendedprice - 50000) AS INT) AS above_50k,
       greatest(CAST(l_quantity AS BIGINT), CAST(l_linenumber * 10 AS BIGINT)) AS g,
       least(CAST(l_quantity AS BIGINT), CAST(l_linenumber * 10 AS BIGINT)) AS l
FROM lineitem
WHERE l_linenumber = 2
""",
    tags=("E25",),
)
def q28_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/pow/sqrt/ln/exp/sign/greatest/least.

    sqrt is IEEE-exact; ln/exp are libm-dependent → rounded to 6."""
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 2)
    qty_l = F.col("l_quantity").cast("bigint")
    ln10 = (F.col("l_linenumber") * 10).cast("bigint")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast("decimal(4,2)"))
        .cast("double")
        .alias("disc_amount"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_50k"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_extendedprice") - 50000).cast("int").alias("above_50k"),
        F.greatest(qty_l, ln10).alias("g"),
        F.least(qty_l, ln10).alias("l"),
    )


# ----------------------------------------------------------------------- E26
@query(
    "q29_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN 'open'
            WHEN o_orderstatus = 'F' THEN 'finished'
            ELSE 'pending' END AS status_label,
       coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW') AS prio_or_low,
       coalesce(nullif(o_orderstatus, 'P'), 'was_pending') AS status_np,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_bucket
FROM orders
""",
    tags=("E26",),
)
def q29_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, nvl."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("pending")
        .alias("status_label"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("LOW")).alias("prio_or_low"),
        F.nvl(F.nullif("o_orderstatus", F.lit("P")), F.lit("was_pending")).alias("status_np"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_bucket"),
    )


# ----------------------------------------------------------------------- E27
@query(
    "q30_array_funcs",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
       list_sort(string_split(text, ' '))[1] AS first_token,
       list_sort(string_split(text, ' '), 'DESC')[1] AS last_token,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS INT) AS n_long,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars,
       array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ',') AS first3
FROM documents
""",
    tags=("E27",),
)
def q30_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/array_distinct/sort_array/element_at/array_contains + higher-order
    filter/transform/aggregate/slice (all JVM-side codegen — the idiomatic
    replacement for per-record user transforms, reference README.md:41-56)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(F.sort_array(toks), 1).alias("first_token"),
        F.element_at(F.sort_array(toks, False), 1).alias("last_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )
        .cast("bigint")
        .alias("total_chars"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3"),
    )


@query(
    "q31_explode_tokens",
    oracle="""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
HAVING COUNT(*) >= 50
""",
    tags=("E27",),
)
def q31_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → re-aggregate: corpus token frequencies (generate+shrink —
    the explode output never materializes beyond the partial agg)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 50)
    )


# ----------------------------------------------------------------------- E28
@query(
    "q32_map_funcs",
    oracle="""
SELECT doc_id,
       array_to_string(map_keys(map(['lang','source'], [lang, source])), ',') AS keys_csv,
       array_to_string(map_values(map(['lang','source'], [lang, source])), ',') AS vals_csv,
       map_extract(map(['lang','source'], [lang, source]), 'lang')[1] AS lang_val,
       CAST(cardinality(map(['lang','source'], [lang, source])) AS INT) AS n_entries
FROM documents
""",
    tags=("E28",),
)
def q32_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map/map_keys/map_values/element access/cardinality."""
    d = _t(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")), F.array(F.col("lang"), F.col("source"))
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.array_join(F.map_values(m), ",").alias("vals_csv"),
        m.getItem("lang").alias("lang_val"),
        F.size(m).alias("n_entries"),
    )


# ------------------------------------------------------------------ E29 (R3)
@query(
    "q33_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_bucket,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
FROM events
""",
    tags=("E29", "R3"),
)
def q33_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction two ways: get_json_object path access and
    from_json with a declared schema (the engine's decode policy for Kafka
    values, reference src/Consumer.coffee:84-96)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.floor(k / 10).cast("int").alias("k_bucket"),
        F.from_json("props", "k INT").getField("k").alias("k_struct"),
    )


# ----------------------------------------------------------------------- E30
@query(
    "q34_casts",
    oracle="""
SELECT c_custkey,
       CAST(c_custkey AS VARCHAR) AS key_str,
       CAST(substring(c_name, 10, 9) AS BIGINT) AS name_num,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_dec_str,
       CAST(c_nationkey AS DOUBLE) AS nk_dbl,
       CAST(trunc(c_acctbal) AS INT) AS bal_int,
       CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(14,4)) AS VARCHAR) AS bal_wide
FROM customer
""",
    tags=("E30",),
)
def q34_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix: int↔string, string→bigint, double→decimal→string,
    decimal rescale, double→int (Spark truncates; oracle uses trunc() to
    match, since DuckDB's bare cast rounds)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.substring("c_name", 10, 9).cast("bigint").alias("name_num"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("bal_dec_str"),
        F.col("c_nationkey").cast("double").alias("nk_dbl"),
        F.col("c_acctbal").cast("int").alias("bal_int"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("decimal(14,4)").cast("string").alias("bal_wide"),
    )


# ------------------------------------------------------------------ E29/R3
@query(
    "q103_variant_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1
""",
    tags=("E29", "R3"),
)
def q103_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4's native VariantType: parse_json
    once into the binary variant encoding, then typed variant_get paths —
    the modern engine-native answer to the reference's schemaless
    JSON.parse records (src/Consumer.coffee:91): no declared StructType,
    no per-query re-parse of the string, shreddable at the storage layer.
    Complements q33's from_json/get_json_object (string-at-a-time) path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select((k / 10).cast("int").alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.sum("k").cast("long").alias("sum_k"))
    )
