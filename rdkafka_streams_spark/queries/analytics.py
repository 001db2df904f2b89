"""Coverage round 2: GROUPING SETS (E14 complete), unpivot/melt, time-series
gap-fill with LOCF, and an oracle-checked equivalence proof for the salted
skew join (operators/skew.py).

Gap-fill is the classic warehouse "densify the calendar" operator: generate
the full per-key day range, left-join the sparse facts, carry the last
observation forward. At 100 TB the generated calendar is tiny relative to the
fact table (keys × days), the join key (user, day) is well distributed, and
the LOCF window is a per-key sort — all shuffle-friendly shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.functions.money import money
from rdkafka_streams_spark.operators.skew import salted_join
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------- E14
@query(
    "q67_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
""",
    tags=("E14",),
)
def q67_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube in q17/q18) with GROUPING()
    null-vs-subtotal markers. One pass over the fact table computes all four
    groupings (Spark expands sets map-side before a single shuffle)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], ["o_orderstatus", "o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        F.sum(money("o_totalprice")).cast("double").alias("total_price"),
        F.count("*").alias("n_orders"),
    )


# ------------------------------------------------------------------ E1 (melt)
@query(
    "q68_unpivot",
    oracle="""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS base_price,
         CAST(COUNT(*) AS DOUBLE) AS n_items
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, value FROM (
  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM agg
  UNION ALL SELECT l_returnflag, 'base_price', base_price FROM agg
  UNION ALL SELECT l_returnflag, 'n_items', n_items FROM agg)
""",
    tags=("E1",),
)
def q68_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide metrics → long (metric, value) rows) — the inverse
    of q36_pivot. Runs on a pre-aggregated frame so the melt itself is
    narrow; Spark's native `unpivot` is a zero-shuffle projection."""
    l = _t(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("double").alias("qty"),
        F.sum(money("l_extendedprice")).cast("double").alias("base_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["qty", "base_price", "n_items"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ------------------------------------------------------- E24/E27 + windows
@query(
    "q69_gapfill_locf",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM(value), 6) AS day_value
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
calendar AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans)
SELECT c.user_id, c.day,
       CAST(d.day_value IS NULL AS BIGINT) AS filled,
       LAST_VALUE(d.day_value IGNORE NULLS) OVER (
         PARTITION BY c.user_id ORDER BY c.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value_locf
FROM calendar c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
""",
    tags=("E24", "E27", "E20"),
)
def q69_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: densify each user's day range (sequence +
    explode), left-join the sparse daily aggregate, carry the last
    observation forward (last(ignorenulls) window). The densified calendar
    is keys × days — tiny next to the fact table — and every step shuffles
    on the same (user, day)-ish keys."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("day_value"))
    )
    spans = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    locf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_value").isNull().cast("bigint").alias("filled"),
            F.last("day_value", ignorenulls=True).over(locf).alias("day_value_locf"),
        )
    )


# ------------------------------------------------------------ skew (E3 proof)
@query(
    "q70_salted_join_equiv",
    oracle="""
SELECT s.s_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
""",
    tags=("E3", "skew"),
)
def q70_salted_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join (operators/skew.py) against a plain-join oracle —
    proves the salt is semantically invisible. The build side is replicated
    n_salts× so one hot l_suppkey fans out over n_salts tasks instead of
    serializing on one."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(l.withColumnRenamed("l_suppkey", "s_suppkey"), s, on="s_suppkey", n_salts=8)
    return joined.groupBy("s_name").agg(
        F.sum(money("l_extendedprice")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ------------------------------------------------- event analytics (T-family)
@query(
    "q73_funnel",
    oracle="""
WITH stage1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
stage2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN stage1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1 GROUP BY e.user_id),
stage3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN stage2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t2 GROUP BY e.user_id)
SELECT 'view' AS stage, COUNT(*) AS users FROM stage1
UNION ALL SELECT 'view>click', COUNT(*) FROM stage2
UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM stage3
""",
    tags=("T-analytics", "E10", "E3"),
)
def q73_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each stage keeps
    users whose stage event strictly follows their previous stage's first
    event. Three per-user min-aggregations + joins on user_id — every shuffle
    keys on the (high-cardinality) user, and each stage's frame shrinks, so
    the funnel is cheaper than any single full-table pass at 100 TB."""
    e = _t(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str, prev_t: str, out_t: str) -> DataFrame:
        nxt = e.where(F.col("event_type") == etype).select("user_id", "ts")
        return (
            nxt.join(prev, "user_id")
            .where(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    s1 = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    s2 = first_after(s1, "click", "t1", "t2")
    s3 = first_after(s2, "purchase", "t2", "t3")
    return (
        s1.agg(F.lit("view").alias("stage"), F.count("*").alias("users"))
        .unionAll(s2.agg(F.lit("view>click").alias("stage"), F.count("*").alias("users")))
        .unionAll(s3.agg(F.lit("view>click>purchase").alias("stage"), F.count("*").alias("users")))
    )


@query(
    "q74_retention_cohorts",
    oracle="""
WITH firstday AS (
  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         datediff('day', f.cohort, CAST(date_trunc('day', e.ts) AS DATE)) AS day_k
  FROM events e JOIN firstday f ON e.user_id = f.user_id)
SELECT cohort, day_k, COUNT(*) AS active_users
FROM activity WHERE day_k <= 7 GROUP BY cohort, day_k
""",
    tags=("T-analytics", "E10", "E24"),
)
def q74_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity counted
    per day-offset k ≤ 7. The cohort join broadcasts nothing exotic — it's a
    user-keyed equi-join; the distinct bounds each (user, day) to one row
    before the small (cohort, k) rollup."""
    e = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    firstday = e.groupBy("user_id").agg(F.min(day).alias("cohort"))
    activity = (
        e.join(firstday, "user_id")
        .select("user_id", "cohort", F.datediff(day, F.col("cohort")).alias("day_k"))
        .distinct()
    )
    return (
        activity.where(F.col("day_k") <= 7)
        .groupBy("cohort", "day_k")
        .agg(F.count("*").alias("active_users"))
    )


@query(
    "q75_timeseries_similarity",
    oracle="""
WITH daily AS (
  SELECT user_id, datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS d,
         ROUND(SUM(value), 6) AS v
  FROM events GROUP BY 1, 2),
norms AS (SELECT user_id, sqrt(SUM(v * v)) AS nrm FROM daily GROUP BY user_id),
dots AS (
  SELECT a.user_id AS u1, b.user_id AS u2, SUM(a.v * b.v) AS dot
  FROM daily a JOIN daily b ON a.d = b.d AND a.user_id <> b.user_id
  WHERE a.user_id < 30
  GROUP BY 1, 2)
SELECT u1, u2, cos FROM (
  SELECT d.u1, d.u2, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos,
         ROW_NUMBER() OVER (PARTITION BY d.u1 ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.u2) AS rn
  FROM dots d
  JOIN norms na ON d.u1 = na.user_id
  JOIN norms nb ON d.u2 = nb.user_id)
WHERE rn <= 3
""",
    tags=("T-analytics", "L3", "E20"),
)
def q75_timeseries_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (cf. EDBT'19 distributed ts-similarity,
    PAPERS.md): each user's daily-sum series as a sparse vector, cosine
    between users via a day-aligned self-join (absent days contribute 0 so
    the sparse dot product is exact), top-3 neighbors per query user.

    The query side is a bounded cohort (users < 30), NOT all-pairs: an
    unrestricted u×u day-join is quadratic in users-per-day (measured 30 s
    at sf0.1 before this bound — the degenerate shape the q54/q55 query-set
    pattern exists to avoid). For all-pairs at scale, block by a coarse
    series signature (LSH over normalized shapes) exactly like the document
    near-dup pipeline."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id",
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("d"),
        )
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    norms = daily.groupBy("user_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    a = daily.where(F.col("user_id") < 30).alias("a")
    b = daily.alias("b")
    dots = (
        a.join(b, (F.col("a.d") == F.col("b.d")) & (F.col("a.user_id") != F.col("b.user_id")))
        .groupBy(F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2"))
        .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("dot"))
    )
    na = norms.select(F.col("user_id").alias("u1"), F.col("nrm").alias("n1"))
    nb = norms.select(F.col("user_id").alias("u2"), F.col("nrm").alias("n2"))
    cos = F.col("dot") / (F.col("n1") * F.col("n2"))
    w = Window.partitionBy("u1").orderBy(cos.desc(), "u2")
    return (
        dots.join(na, "u1")
        .join(nb, "u2")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("u1", "u2", F.round(cos, 6).alias("cos"))
    )


@query(
    "q79_histogram",
    oracle="""
SELECT bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM (
  SELECT LEAST(GREATEST(CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT), 0), 11) AS bucket,
         l_extendedprice
  FROM lineitem)
GROUP BY bucket
""",
    tags=("E25", "E10"),
)
def q79_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram binning (12 × 5000-wide buckets, clamped) —
    engine-neutral floor arithmetic instead of width_bucket, so the bin
    edges are bit-identical everywhere. One map-side pass + a 12-key agg:
    the shape that histograms a 100 TB column for free."""
    l = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.greatest(F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint"), F.lit(0)),
        F.lit(11),
    )
    return l.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum(money("l_extendedprice")).cast("double").alias("total"),
    )


@query(
    "q80_rolling_time_window",
    oracle="""
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY epoch(ts)
         RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW), 6) AS rolling_3d,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch(ts)
         RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW) AS n_3d
FROM events
""",
    tags=("E21", "E24"),
)
def q80_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range rolling window (true RANGE frame over epoch seconds, not a
    row frame — q24 covers ROWS): per-user 3-day rolling sum/count. The
    range frame's state is bounded by the time span, not the row count —
    the frame that survives bursty keys at 100 TB."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-259200, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("rolling_3d"),
        F.count("*").over(w).alias("n_3d"),
    )


@query(
    "q82_sessionize",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
FROM flagged
""",
    tags=("T3", "E20"),
)
def q82_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (gaps-and-islands, 30-min gap): lag to
    flag session starts, running sum to number them — every event gets its
    (user, session_idx) identity. Complements q42, which aggregates whole
    sessions; this keeps row grain for downstream joins. One (user)-keyed
    window sort, same cost class as any per-user window at 100 TB."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    new_session = (
        prev.isNull() | ((F.unix_timestamp("ts") - prev) > 1800)
    ).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(new_session).over(run).cast("bigint").alias("session_idx"),
    )


@query(
    "q85_zscore_standardize",
    oracle="""
SELECT e.event_id, e.event_type,
       ROUND((e.value - s.m) / s.sd, 6) AS z
FROM events e
JOIN (SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type) s
ON e.event_type = s.event_type
""",
    tags=("E11", "E3"),
)
def q85_zscore_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization (feature engineering): group stats
    once (tiny aggregate, broadcast back), then a map-side normalize — the
    two-pass shape that standardizes a 100 TB feature column with one
    shuffle of group-count rows. Rounded to 6 (mean/stddev are
    order-of-summation doubles)."""
    e = _t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("m")) / F.col("sd"), 6).alias("z"),
        )
    )


@query(
    "q91_timeseries_allpairs",
    oracle="""
WITH daily AS (
  SELECT user_id, datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS d,
         ROUND(SUM(value), 6) AS v
  FROM events GROUP BY 1, 2),
peak AS (
  SELECT user_id, d AS blk FROM (
    SELECT user_id, d, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY v DESC, d) AS rn FROM daily)
  WHERE rn = 1),
norms AS (SELECT user_id, sqrt(SUM(v * v)) AS nrm FROM daily GROUP BY user_id),
da AS (SELECT daily.*, blk FROM daily JOIN peak USING (user_id)),
dots AS (
  SELECT a.user_id AS u1, b.user_id AS u2, SUM(a.v * b.v) AS dot
  FROM da a JOIN da b ON a.blk = b.blk AND a.d = b.d AND a.user_id < b.user_id
  GROUP BY 1, 2)
SELECT u1, u2, cos FROM (
  SELECT d.u1, d.u2, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos
  FROM dots d JOIN norms na ON d.u1 = na.user_id JOIN norms nb ON d.u2 = nb.user_id)
WHERE cos >= 0.5
""",
    tags=("T-analytics", "L3", "L2"),
)
def q91_timeseries_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-PAIRS time-series similarity, signature-blocked (the q75
    docstring's promised scale path): users are blocked by their peak-day
    signature (argmax of the daily series, ties to the earliest day), the
    day-aligned dot product runs only between same-block users, and pairs
    with cosine ≥ 0.5 are emitted. The join key is (block, day) — the
    quadratic term drops from users-per-day (q75's unbounded shape, 30 s at
    sf0.1) to same-peak-users-per-day, exactly how the document near-dup
    pipeline bounds its self-join with LSH buckets."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    # `daily` feeds four branches (peak, both self-join sides, norms); each
    # re-aggregates from the scan here. At 100 TB persist it (or write it
    # out) — measured locally the recompute is cheaper than materialization
    # (1.6 s vs 5.0 s at sf0.1), so the plan stays unpersisted at test scale.
    wpk = Window.partitionBy("user_id").orderBy(F.col("v").desc(), "d")
    peak = (
        daily.withColumn("rn", F.row_number().over(wpk))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("d").alias("blk"))
    )
    norms = daily.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    da = daily.join(peak, "user_id")
    a, b = da.alias("a"), da.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2"))
        .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("dot"))
    )
    na = norms.select(F.col("user_id").alias("u1"), F.col("nrm").alias("n1"))
    nb = norms.select(F.col("user_id").alias("u2"), F.col("nrm").alias("n2"))
    return (
        dots.join(na, "u1")
        .join(nb, "u2")
        .select("u1", "u2", F.round(F.col("dot") / (F.col("n1") * F.col("n2")), 6).alias("cos"))
        .where(F.col("cos") >= 0.5)
    )


# --------------------------------------------------------------- CDC / SCD2
@query(
    "q97_scd2_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM chg
""",
    tags=("X-cdc", "E20", "T-analytics"),
)
def q97_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 build over the event log (operators/cdc.py scd2_build): per
    user, consecutive same-event_type records compact away (CDC no-op
    drop), each surviving version gets valid_from/valid_to effective
    dating, open interval = current. The append-log → warehouse-dimension
    transform; one window shuffle on the entity key."""
    from rdkafka_streams_spark.operators.cdc import scd2_build

    ev = load_table(spark, sf_dir, "events")
    return scd2_build(ev, key="user_id", ts="ts", attrs=["event_type"], tiebreak="event_id")


# ---------------------------------------------------------- robust trimming
@query(
    "q98_quantile_trim",
    oracle="""
WITH r AS (
  SELECT lang, n_chars, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents),
kept AS (
  SELECT lang, n_chars, n FROM r
  WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(n_chars) AS BIGINT) AS min_kept, CAST(MAX(n_chars) AS BIGINT) AS max_kept
FROM kept GROUP BY lang
""",
    tags=("L4", "E19"),
)
def q98_quantile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based 5%/95% length-outlier trim per language — the robust
    corpus filter that drops truncated fragments and boilerplate walls
    without estimating quantiles: exact integer rank bounds
    (rn in (n*5//100, n - n*5//100]), so the cut is deterministic on every
    engine. One window shuffle per language partition."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = d.select(
        "lang",
        "n_chars",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    lo = F.floor(F.col("n") * 5 / 100)
    kept = r.where((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
    return kept.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.count("*").alias("n_kept"),
        F.min("n_chars").alias("min_kept"),
        F.max("n_chars").alias("max_kept"),
    )


# ----------------------------------------------------- streaming CDC (X7/S1)
@query(
    "q99_cdc_roundtrip",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM chg
""",
    tags=("X-cdc", "S1", "S2", "R3", "R4"),
)
def q99_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC pipeline over the transport, inside the correctness gate:
    the event log is JSON-produced to a fresh topiclog topic (timestamps
    as explicit unix micros — the envelope must not round event time),
    batch-consumed, decoded, and rebuilt into the q97 SCD2 dimension.
    Proves the change-stream → warehouse-dimension path end-to-end:
    transport envelope, decode, compaction, effective dating — one oracle."""
    import tempfile

    from rdkafka_streams_spark.operators.cdc import scd2_build
    from rdkafka_streams_spark.streaming import KProducer, TopicLog, read_topic

    root = tempfile.mkdtemp(prefix="q99_bus")
    TopicLog(root).create_topic("changes", partitions=4)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    KProducer(host=root, topic="changes", key="user_id", transport="topiclog").write_batch(ev)
    raw = read_topic(spark, root, "changes")
    decoded = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            "event_id long, user_id long, event_type string, ts_us long",
        ).alias("v")
    ).select(
        F.col("v.event_id").alias("event_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_type").alias("event_type"),
        F.timestamp_micros(F.col("v.ts_us")).alias("ts"),
    )
    return scd2_build(decoded, key="user_id", ts="ts", attrs=["event_type"], tiebreak="event_id")


# ------------------------------------------------------------ layout (X8)
@query(
    "q109_zorder_key",
    oracle="""
WITH d AS (
  SELECT event_id,
         user_id % 256 AS xb,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 256 AS yb
  FROM events),
bits AS (SELECT event_id, xb, yb, i FROM d, unnest(range(0, 8)) AS u(i))
SELECT event_id, CAST(MAX(xb) AS BIGINT) AS xb, CAST(MAX(yb) AS BIGINT) AS yb,
       CAST(SUM(((xb >> i) & 1) << (i * 2)) +
            SUM(((yb >> i) & 1) << (i * 2 + 1)) AS BIGINT) AS zkey
FROM bits GROUP BY event_id
""",
    tags=("X8", "E25"),
)
def q109_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over two event dimensions
    (operators/zorder.py morton_key): bit-interleave user bucket and
    payload bucket so one sort order clusters BOTH — written z-ordered,
    parquet row-group min/max pruning then works for filters on either
    column (the OPTIMIZE ZORDER technique on raw parquet). Pure integer
    bit arithmetic, exact on every engine."""
    from rdkafka_streams_spark.operators.zorder import morton_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("xb"),
        (F.get_json_object("props", "$.k").cast("long") % 256).alias("yb"),
    )
    return ev.select("event_id", "xb", "yb", morton_key("xb", "yb", bits=8).alias("zkey"))


# ---------------------------------------------------------- profiling (X9)
@query(
    "q110_table_profile",
    oracle="""
WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
SELECT 'o_orderkey' AS col_name, n.n_rows,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'o_custkey', n.n_rows, CAST(COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'o_orderpriority', n.n_rows, CAST(COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'o_orderstatus', n.n_rows, CAST(COUNT(o_orderstatus) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders, n GROUP BY n.n_rows
""",
    tags=("X9", "E10"),
)
def q110_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style table profile (operators/profiling.py profile_table):
    null/distinct/min/max for four orders columns in ONE table pass (the
    multi-distinct plans via expand — no per-column rescan). The
    ingestion pre-flight that catches all-null columns and cardinality
    collapse before compute is spent."""
    from rdkafka_streams_spark.operators.profiling import profile_table

    return profile_table(
        load_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus"],
    )


# ------------------------------------------------- anomaly detection (E21)
@query(
    "q111_rolling_zscore",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, value,
         AVG(value) OVER pw AS mu,
         STDDEV_SAMP(value) OVER pw AS sigma,
         COUNT(*) OVER pw AS n_prev
  FROM events
  WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, ROUND((value - mu) / sigma, 6) AS z
FROM w WHERE n_prev >= 5 AND sigma > 0
""",
    tags=("E21", "E11", "T-analytics"),
)
def q111_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against its
    user's trailing 10-event window (strictly prior rows — no
    self-inclusion leak), emitted once ≥5 priors exist. The standard
    online metrics-monitoring pattern; one window shuffle on the user
    key, frame evaluation is sequential so even the float sums agree
    across engines under round-6."""
    ev = load_table(spark, sf_dir, "events")
    pw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(pw).alias("mu"),
        F.stddev_samp("value").over(pw).alias("sigma"),
        F.count("*").over(pw).alias("n_prev"),
    )
    return w.where((F.col("n_prev") >= 5) & (F.col("sigma") > 0)).select(
        "event_id", "user_id", F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias("z")
    )


# ------------------------------------------------------- interval merge (X4)
@query(
    "q114_interval_merge",
    oracle="""
WITH base AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship,
         CAST(l_shipdate AS DATE) + (CAST(l_quantity AS INTEGER) % 30) AS receipt
  FROM lineitem),
m AS (
  SELECT l_suppkey, ship, receipt,
         MAX(receipt) OVER (PARTITION BY l_suppkey ORDER BY ship, receipt
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM base),
f AS (
  SELECT l_suppkey, ship, receipt,
         CASE WHEN pmax IS NULL OR ship > pmax THEN 1 ELSE 0 END AS brk
  FROM m),
i AS (
  SELECT l_suppkey, ship, receipt,
         SUM(brk) OVER (PARTITION BY l_suppkey ORDER BY ship, receipt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM f)
SELECT l_suppkey, CAST(island_id AS BIGINT) AS island_id,
       MIN(ship) AS island_start, MAX(receipt) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM i GROUP BY l_suppkey, island_id
""",
    tags=("X4", "E21"),
)
def q114_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval coalesce (operators/intervals.py
    merge_intervals): each lineitem carries a [ship, receipt] delivery
    interval (receipt derived as ship + quantity%30 days — the synthetic
    lineitem has no receiptdate column); per supplier, intervals that
    overlap merge into covered spans — the calendar-coalesce op behind
    validity windows and coverage reporting, distinct from q82's
    point-event sessionize. One window shuffle on the supplier key; island
    boundaries are independent of the sort tiebreak because the running
    max(end) only grows."""
    from rdkafka_streams_spark.operators.intervals import merge_intervals

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("ship"),
        F.date_add(F.to_date("l_shipdate"), F.col("l_quantity").cast("int") % 30).alias("receipt"),
    )
    return merge_intervals(li, "l_suppkey", "ship", "receipt")


# -------------------------------------------------- attribution (E9/E20)
@query(
    "q115_attribution",
    oracle="""
WITH touch AS (
  SELECT event_id, user_id, ts, event_type, value,
         last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
           OVER w AS src_type,
         last_value(CASE WHEN event_type IN ('click','view') THEN ts END IGNORE NULLS)
           OVER w AS src_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
attr AS (
  SELECT CASE WHEN src_ts IS NOT NULL AND epoch(ts) - epoch(src_ts) <= 604800
              THEN src_type ELSE 'direct' END AS channel,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
  FROM touch WHERE event_type = 'purchase')
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(CAST(SUM(v_micro) AS BIGINT) / 1000000.0, 6) AS revenue
FROM attr GROUP BY channel
""",
    tags=("E9", "E20", "T-analytics"),
)
def q115_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent prior click/view within a 7-day lookback, else 'direct'.
    The as-of-join shape expressed as one ignore-nulls window over the
    user timeline — no self-join, one shuffle on the user key. Revenue
    snaps to integer micro-units pre-sum so the rollup is
    summation-order-free (exact across engines and partitionings)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touch = ev.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w).alias("src_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("src_ts"),
    )
    attr = touch.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("src_ts").isNotNull()
            & ((F.unix_timestamp("ts") - F.unix_timestamp("src_ts")) <= 604800),
            F.col("src_type"),
        )
        .otherwise("direct")
        .alias("channel"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v_micro"),
    )
    return attr.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.round(F.sum("v_micro") / 1000000.0, 6).alias("revenue"),
    )


# ------------------------------------------------- M4 downsample (E10/E21)
@query(
    "q116_m4_downsample",
    oracle="""
WITH b AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, ts, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro,
         ROW_NUMBER() OVER (PARTITION BY CAST(floor(epoch(ts) / 3600) AS BIGINT)
                            ORDER BY ts, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY CAST(floor(epoch(ts) / 3600) AS BIGINT)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v_micro) AS BIGINT) AS v_min,
       CAST(MAX(v_micro) AS BIGINT) AS v_max,
       CAST(MAX(CASE WHEN rn_first = 1 THEN v_micro END) AS BIGINT) AS v_first,
       CAST(MAX(CASE WHEN rn_last = 1 THEN v_micro END) AS BIGINT) AS v_last
FROM b GROUP BY bucket
""",
    tags=("E10", "E21", "T-analytics"),
)
def q116_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per pixel
    bucket (hourly), keep min/max/first/last — the lossless-for-rendering
    reduction that turns a 100 TB metric stream into a plottable series.
    One shuffle on the bucket key (window + agg share it); values snap to
    integer micro-units so every engine agrees bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / F.lit(3600)).cast("bigint")
    v_micro = F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")
    base = ev.select(
        bucket.alias("bucket"),
        "ts",
        "event_id",
        v_micro.alias("v_micro"),
    )
    wf = Window.partitionBy("bucket").orderBy("ts", "event_id")
    wl = Window.partitionBy("bucket").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = base.select(
        "bucket",
        "v_micro",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return ranked.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("v_micro").alias("v_min"),
        F.max("v_micro").alias("v_max"),
        F.max(F.when(F.col("rn_first") == 1, F.col("v_micro"))).alias("v_first"),
        F.max(F.when(F.col("rn_last") == 1, F.col("v_micro"))).alias("v_last"),
    )


# -------------------------------------------- sequence pattern (E27/L4)
@query(
    "q117_sequence_pattern",
    oracle="""
WITH path AS (
  SELECT user_id,
         string_agg(event_type, ' ' ORDER BY ts, event_id) AS p,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
SELECT user_id, n_events
FROM path
WHERE regexp_matches(p, 'signup.* click.* purchase')
""",
    tags=("E27", "L4", "T-analytics"),
)
def q117_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern match (the MATCH_RECOGNIZE shape): each
    user's timeline collapses to an ordered type path, then a regex finds
    signup → (eventually) click → (eventually) purchase. Generalizes q73's
    fixed funnel to arbitrary patterns; one groupBy shuffle, path strings
    stay distributed (no driver collect). The (ts, event_id) sort key is
    total, so both engines build the identical path string."""
    ev = _t(spark, sf_dir, "events")
    path = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            " ",
        ).alias("p"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    return path.where(F.col("p").rlike("signup.* click.* purchase")).select(
        "user_id", "n_events"
    )


# ------------------------------------------ equi-depth histogram (E19/E11)
@query(
    "q118_equidepth_histogram",
    oracle="""
WITH r AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders)
SELECT CAST(floor((rn - 1) * 10.0 / n) AS BIGINT) + 1 AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS lo,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM r GROUP BY decile
""",
    tags=("E19", "E11", "X-scale"),
)
def q118_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth decile histogram via distributed global ranking
    (operators/ranking.py global_rank): range-partition on the sort key,
    rank locally in parallel, add prefix offsets — the scalable form of
    the single-task `row_number() OVER (ORDER BY ...)` trap. Decile
    assignment is pure integer arithmetic on the exact rank, so both
    engines agree row-for-row; per-decile bounds/totals in DECIMAL."""
    from rdkafka_streams_spark.operators.ranking import global_rank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_rank(o, ["o_totalprice", "o_orderkey"])
    n = o.agg(F.count("*").alias("__n"))
    dec = ranked.crossJoin(F.broadcast(n)).select(
        (F.floor((F.col("rn") - 1) * 10.0 / F.col("__n")) + 1)
        .cast("bigint")
        .alias("decile"),
        "o_totalprice",
    )
    return dec.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min(money("o_totalprice")).cast("double").alias("lo"),
        F.max(money("o_totalprice")).cast("double").alias("hi"),
        F.sum(money("o_totalprice")).cast("double").alias("total"),
    )


# --------------------------------------------- per-group OLS trend (E11)
@query(
    "q121_trend_regression",
    oracle="""
WITH p AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM p GROUP BY user_id)
SELECT user_id, n AS n_events,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000.0, 6) AS slope_per_day,
       ROUND(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS DOUBLE)
             / CAST(n * (n * sxx - sx * sx) AS DOUBLE) / 1000000.0, 6) AS intercept
FROM m WHERE n >= 5 AND n * sxx - sx * sx > 0
""",
    tags=("E11", "T-analytics"),
)
def q121_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend (slope/intercept of value over day index) from
    integer moments: x in days since the epoch origin, y snapped to
    micro-units, all five sufficient statistics exact BIGINT sums — the
    closed-form regression is then a ratio of exact integers, identical
    in any engine (the float-free form of regr_slope/regr_intercept).
    One partial-agg shuffle of 5 numbers per user; moments stay within
    int64 for day-scale x and micro-unit y up to ~10^5 rows/key (use a
    narrower y unit beyond that)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("bigint").alias("x"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("y"),
    )
    m = p.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.where((F.col("n") >= 5) & (den > 0)).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.round(num.cast("double") / den.cast("double") / 1000000.0, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy") * den - num * F.col("sx")).cast("double")
            / (F.col("n") * den).cast("double")
            / 1000000.0,
            6,
        ).alias("intercept"),
    )


# ------------------------------------------ time-hierarchy rollup (E14)
@query(
    "q123_time_rollup",
    oracle="""
SELECT CAST(CAST(date_trunc('month', ts) AS DATE) AS VARCHAR) AS month,
       CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
       CAST(GROUPING(date_trunc('month', ts)) AS BIGINT) AS g_month,
       CAST(GROUPING(date_trunc('day', ts)) AS BIGINT) AS g_day,
       CAST(GROUPING(date_trunc('hour', ts)) AS BIGINT) AS g_hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS v_micro
FROM events
GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts), date_trunc('hour', ts))
""",
    tags=("E14", "E24", "T-analytics"),
)
def q123_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the hypertable continuous-aggregate
    shape): month ⊃ day ⊃ hour totals in ONE pass via ROLLUP — Spark
    expands the grouping sets map-side before a single shuffle, so the
    three granularities cost one aggregate, not three scans. Values sum
    in integer micro-units (order-free); GROUPING flags disambiguate
    subtotal rows from genuine NULLs."""
    ev = _t(spark, sf_dir, "events")
    month = F.date_trunc("month", "ts").cast("date").cast("string")
    day = F.date_trunc("day", "ts").cast("date").cast("string")
    hour = F.date_trunc("hour", "ts").cast("string")
    v = F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")
    base = ev.select(
        month.alias("month"), day.alias("day"), hour.alias("hour"), v.alias("v")
    )
    return base.rollup("month", "day", "hour").agg(
        F.grouping("month").cast("bigint").alias("g_month"),
        F.grouping("day").cast("bigint").alias("g_day"),
        F.grouping("hour").cast("bigint").alias("g_hour"),
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").alias("v_micro"),
    )


# ------------------------------------------- rolling distinct users (E24)
@query(
    "q125_rolling_wau",
    oracle="""
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ud)
SELECT CAST(d.day AS VARCHAR) AS wday,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
""",
    tags=("E24", "E10", "T-analytics"),
)
def q125_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (WAU): distinct count over a sliding
    window cannot use a frame (distinct doesn't decompose), so each
    (user, day) activity pair EXPLODES to the ≤7 window-end days it
    serves, then one distinct count per day — O(7·|user-days|) after the
    daily dedup, shuffle-keyed on the day. The engine-idiomatic rewrite
    of the range self-join the oracle runs; both count the same pairs."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    expanded = ud.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("wday"),
        "user_id",
    )
    bounded = expanded.join(days.withColumnRenamed("day", "wday"), "wday", "left_semi")
    return bounded.groupBy("wday").agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    ).select(F.col("wday").cast("string").alias("wday"), "wau")


# ------------------------------------------- exact quantiles (E11/E19)
@query(
    "q127_exact_quantiles",
    oracle="""
WITH b AS (SELECT event_type AS g, CAST(floor(value*1000000+0.5) AS BIGINT) AS v FROM events),
c AS (SELECT g, COUNT(*) AS n FROM b GROUP BY g),
r AS (SELECT b.g, b.v, ROW_NUMBER() OVER (PARTITION BY b.g ORDER BY b.v) AS rn, c.n
      FROM b JOIN c USING (g)),
agg AS (
  SELECT g, CAST(MAX(n) AS BIGINT) AS n,
         ROUND(SUM(v * CASE WHEN rn = floor((n-1)*0.25)+1 THEN 1.0-((n-1)*0.25-floor((n-1)*0.25)) WHEN (n-1)*0.25-floor((n-1)*0.25) > 0 AND rn = floor((n-1)*0.25)+2 THEN (n-1)*0.25-floor((n-1)*0.25) ELSE 0.0 END) / 1000000.0, 6) AS p25,
         ROUND(SUM(v * CASE WHEN rn = floor((n-1)*0.5)+1 THEN 1.0-((n-1)*0.5-floor((n-1)*0.5)) WHEN (n-1)*0.5-floor((n-1)*0.5) > 0 AND rn = floor((n-1)*0.5)+2 THEN (n-1)*0.5-floor((n-1)*0.5) ELSE 0.0 END) / 1000000.0, 6) AS p50,
         ROUND(SUM(v * CASE WHEN rn = floor((n-1)*0.75)+1 THEN 1.0-((n-1)*0.75-floor((n-1)*0.75)) WHEN (n-1)*0.75-floor((n-1)*0.75) > 0 AND rn = floor((n-1)*0.75)+2 THEN (n-1)*0.75-floor((n-1)*0.75) ELSE 0.0 END) / 1000000.0, 6) AS p75
  FROM r GROUP BY g)
SELECT g AS event_type, n, p25, p50, p75, ROUND(p75 - p25, 6) AS iqr FROM agg
""",
    tags=("E11", "E19"),
)
def q127_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile_cont per group without a sketch (operators/
    quantiles.py exact_group_quantiles) — the ground-truth complement of
    q64's GK percentile_approx: one parallel rank window + a weighted sum
    over only the ≤2 bracketing rows per quantile (map-side pruned).
    Quarter quantiles on micro-unit integers make every interpolation
    product IEEE-exact, so engines agree bit-for-bit."""
    from rdkafka_streams_spark.operators.quantiles import exact_group_quantiles

    return exact_group_quantiles(
        _t(spark, sf_dir, "events"), "event_type", "value", (0.25, 0.5, 0.75)
    )


# ------------------------------------------ table reconciliation (X-scale)
@query(
    "q128_table_diff",
    oracle="""
WITH prep AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders),
hashed AS (
  SELECT o_orderkey % 256 AS bucket,
         (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 1, 1)) - 1) * 268435456
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 2, 1)) - 1) * 16777216
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 3, 1)) - 1) * 1048576
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 4, 1)) - 1) * 65536
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 5, 1)) - 1) * 4096
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 6, 1)) - 1) * 256
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 7, 1)) - 1) * 16
       + (instr('0123456789abcdef', substring(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, CAST(cents AS VARCHAR))), 8, 1)) - 1) * 1 AS h,
         o_orderkey
  FROM prep),
l AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_left,
             CAST(SUM(h) AS BIGINT) AS digest_left
      FROM hashed GROUP BY bucket),
r AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_right,
             CAST(SUM(h) AS BIGINT) AS digest_right
      FROM hashed WHERE o_orderkey % 97 <> 0 GROUP BY bucket)
SELECT l.bucket, l.n_left, COALESCE(r.n_right, 0) AS n_right,
       l.digest_left, COALESCE(r.digest_right, 0) AS digest_right
FROM l FULL OUTER JOIN r ON l.bucket = r.bucket
WHERE l.n_left <> COALESCE(r.n_right, 0) OR l.digest_left <> COALESCE(r.digest_right, 0)
""",
    tags=("X-scale", "E10"),
)
def q128_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style table reconciliation (operators/reconcile.py): both
    sides reduce to 256 (count, hash-sum) bucket digests — order-free,
    partially aggregated, so comparing two 100 TB tables shuffles ≤256
    rows per side — then a full-outer digest join localizes drift. Here
    the right side simulates replica loss (every 97th order missing);
    the output is exactly the buckets a re-sync would ship."""
    from rdkafka_streams_spark.operators.reconcile import bucket_digest, digest_diff

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cols = ["o_orderkey", "o_orderstatus", "cents"]
    left = bucket_digest(o, "o_orderkey", cols)
    right = bucket_digest(o.where(F.col("o_orderkey") % 97 != 0), "o_orderkey", cols)
    return digest_diff(left, right)


# -------------------------------------------- banded time join (E8/T6)
@query(
    "q129_time_proximity_join",
    oracle="""
SELECT e.event_id AS err_id, p.event_id AS pur_id,
       CAST(epoch_us(p.ts) - epoch_us(e.ts) AS BIGINT) AS gap_us
FROM events e JOIN events p ON e.user_id = p.user_id
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
  AND epoch_us(p.ts) >= epoch_us(e.ts)
  AND epoch_us(p.ts) - epoch_us(e.ts) <= 600000000
""",
    tags=("E8", "T6", "T-analytics"),
)
def q129_time_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error→purchase pairs within 10 minutes per user via the banded
    time join (operators/timejoin.py): Δ-width time bands turn the range
    join into an equi-join on (user, band) — each qualifying pair
    examined exactly once, no nested loop, and the band in the shuffle
    key de-skews hot users. The oracle runs the plain theta join; both
    produce the identical pair set."""
    from rdkafka_streams_spark.operators.timejoin import time_proximity_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = time_proximity_join(errors, purchases, "user_id", max_gap_seconds=600)
    return out.select(
        F.col("event_id").alias("err_id"),
        F.col("r_event_id").alias("pur_id"),
        "gap_us",
    )


# ------------------------------------------------- Gini concentration (E11)
@query(
    "q131_gini_concentration",
    oracle="""
WITH rev AS (
  SELECT n.n_name, c.c_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey),
r AS (SELECT n_name, cents,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cents, c_custkey) AS rk
      FROM rev),
m AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS s0,
             CAST(SUM(rk * cents) AS BIGINT) AS s1
      FROM r GROUP BY n_name)
SELECT n_name, n_customers,
       CAST((2 * s1 - (n_customers + 1) * s0) * 1000000 // (n_customers * s0) AS BIGINT)
         AS gini_ppm
FROM m WHERE n_customers >= 2 AND s0 > 0
""",
    tags=("E11", "E19", "T-analytics"),
)
def q131_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer revenue — the inequality /
    concentration measure behind "top 1% of keys hold X% of bytes" skew
    dashboards. Closed form over the ascending rank sum:
    G = (2·Σ rk·x − (n+1)·Σx) / (n·Σx), all terms exact BIGINT (revenue in
    cents, ranks total-ordered by (cents, custkey)), emitted in ppm via
    integer floor-div — bit-identical on any engine. One fact shuffle
    (orders→customer agg), dims broadcast, one rank window per nation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "c_custkey")
        .agg(F.sum((money("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("n_name").orderBy("cents", "c_custkey")
    r = rev.withColumn("rk", F.row_number().over(w))
    m = r.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("s0"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("s1"),
    )
    gini = F.expr("(2 * s1 - (n_customers + 1) * s0) * 1000000 div (n_customers * s0)")
    return m.where((F.col("n_customers") >= 2) & (F.col("s0") > 0)).select(
        "n_name", "n_customers", gini.cast("bigint").alias("gini_ppm")
    )


# --------------------------------------------------- winsorized mean (E11)
@query(
    "q132_winsorized_stats",
    oracle="""
WITH b AS (SELECT event_type, event_id,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
r AS (SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM b),
bounds AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                  CAST(MAX(CASE WHEN rn = (n * 5 + 99) // 100 THEN v END) AS BIGINT) AS lo,
                  CAST(MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) AS BIGINT) AS hi
           FROM r GROUP BY event_type)
SELECT r.event_type, b.n,
       ROUND(b.lo / 1000000.0, 6) AS lo,
       ROUND(b.hi / 1000000.0, 6) AS hi,
       ROUND(CAST(SUM(CASE WHEN r.v < b.lo THEN b.lo
                           WHEN r.v > b.hi THEN b.hi ELSE r.v END) AS BIGINT)
             // b.n / 1000000.0, 6) AS wins_mean
FROM r JOIN bounds b USING (event_type)
GROUP BY r.event_type, b.n, b.lo, b.hi
""",
    tags=("E11", "E19", "T-analytics"),
)
def q132_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type (clamp to the exact p05/p95 order
    statistics, then average) — the robust-mean complement of q98's trim
    (which drops the tails; clamping keeps row count). Bounds come from
    one rank window (ranks total-ordered by (v, event_id); the k-th value
    is tie-independent), the clamped mean from integer micro-unit sums
    with floor-div before the float display round, so engines agree
    bit-for-bit. The bounds frame is one tiny row per group — broadcast
    back, no second fact shuffle."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    wr = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r = b.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(wn)
    )
    bounds = r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == F.expr("(n * 5 + 99) div 100"), F.col("v")))
        .cast("bigint")
        .alias("lo"),
        F.max(F.when(F.col("rn") == F.expr("(n * 95 + 99) div 100"), F.col("v")))
        .cast("bigint")
        .alias("hi"),
    )
    clamped = F.when(F.col("v") < F.col("lo"), F.col("lo")).when(
        F.col("v") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("v"))
    return (
        r.select("event_type", "v")
        .join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(F.sum(clamped).cast("bigint").alias("s"))
        .select(
            "event_type",
            "n",
            F.round(F.col("lo") / 1000000.0, 6).alias("lo"),
            F.round(F.col("hi") / 1000000.0, 6).alias("hi"),
            F.round(F.expr("s div n") / 1000000.0, 6).alias("wins_mean"),
        )
    )


# ------------------------------------------------------ MAD outliers (E11)
@query(
    "q141_mad_outliers",
    oracle="""
WITH b AS (SELECT event_type, event_id,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
r1 AS (SELECT event_type, v,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n
       FROM b),
med AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT) AS med
        FROM r1 GROUP BY event_type),
d AS (SELECT r1.event_type, m.n, m.med, abs(r1.v - m.med) AS dev, r1.v, r1.rn
      FROM r1 JOIN med m USING (event_type)),
r2 AS (SELECT event_type, n, med, dev, v,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, rn) AS drn
       FROM d),
mad AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(med) AS BIGINT) AS med,
               CAST(MAX(CASE WHEN drn = (n + 1) // 2 THEN dev END) AS BIGINT) AS mad
        FROM r2 GROUP BY event_type)
SELECT d.event_type, m.n,
       ROUND(m.med / 1000000.0, 6) AS median,
       ROUND(m.mad / 1000000.0, 6) AS mad,
       CAST(SUM(CASE WHEN abs(d.v - m.med) > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN mad m USING (event_type)
GROUP BY d.event_type, m.n, m.med, m.mad
""",
    tags=("E11", "E19", "T-analytics"),
)
def q141_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per event type — the
    robust alternative to z-scores (q111) whose cut doesn't move when the
    outliers themselves inflate the spread. Exact lower medians by rank
    (integer micro-units, tie-broken deterministically), flag = |v−med| >
    3·MAD in pure integer arithmetic. Two rank windows on the same
    partition key — the second window and both small-frame joins reuse the
    event_type hash partitioning, so the fact table shuffles once."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    wr = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r1 = b.withColumn("rn", F.row_number().over(wr)).withColumn("n", F.count("*").over(wn))
    med = r1.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v")))
        .cast("bigint")
        .alias("med"),
    )
    d = r1.drop("n").join(F.broadcast(med), "event_type").select(
        "event_type",
        "n",
        "med",
        (F.abs(F.col("v") - F.col("med"))).alias("dev"),
        "v",
        "rn",
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "rn")
    r2 = d.withColumn("drn", F.row_number().over(wd))
    mad = r2.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("med").cast("bigint").alias("med"),
        F.max(F.when(F.col("drn") == F.expr("(n + 1) div 2"), F.col("dev")))
        .cast("bigint")
        .alias("mad"),
    )
    return (
        d.select("event_type", "v")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med", "mad")
        .agg(
            F.sum(
                (F.abs(F.col("v") - F.col("med")) > 3 * F.col("mad")).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("med") / 1000000.0, 6).alias("median"),
            F.round(F.col("mad") / 1000000.0, 6).alias("mad"),
            "n_outliers",
        )
    )


# --------------------------------------------------- basket affinity (E10)
@query(
    "q138_basket_affinity",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nt AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
singles AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY l_partkey),
pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey)
SELECT p.part_a, p.part_b, p.n_ab,
       CAST(CAST(p.n_ab AS HUGEINT) * t.n_orders * 1000000
            // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN singles sa ON p.part_a = sa.l_partkey
JOIN singles sb ON p.part_b = sb.l_partkey
CROSS JOIN nt t
WHERE p.n_ab >= 2
""",
    tags=("E10", "E27", "T-analytics"),
)
def q138_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: which parts ship together
    more than independence predicts. The pair generation is map-side —
    per-order sorted item arrays expand to C(k,2) ordered pairs via
    nested higher-order transforms (bounded by basket size, vs the
    oracle's self-join which shuffles the fact table twice and explodes
    on large baskets); one shuffle counts pairs. Lift is exact integer
    ppm: n_ab·N·10⁶ div (n_a·n_b). Support floor n_ab ≥ 2 keeps the
    output the interesting tail."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda a, i: F.transform(
                        F.slice(
                            "parts", i + 2, F.greatest(F.size("parts") - i - 1, F.lit(0))
                        ),
                        lambda b: F.struct(a.alias("part_a"), b.alias("part_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    pair_counts = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    singles = li.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("n"))
    n_orders = li.agg(F.count_distinct("l_orderkey").cast("bigint").alias("n_orders"))
    # singles is one row per DISTINCT part — unbounded in |parts|, so a
    # forced broadcast would OOM the driver at catalog scale; shuffle
    # equi-joins on the pair keys instead (AQE still demotes them to
    # broadcast when the actual size is small). Only the 1-row n_orders
    # broadcasts unconditionally. (ADVICE r3)
    out = (
        pair_counts.join(
            singles.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na")),
            "part_a",
        )
        .join(
            singles.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    # n_ab·N·10⁶ in BIGINT wraps past int64 once n_ab·N > 9.2e12 — widen
    # to decimal(38,0) before multiplying, matching the q143/q147 pattern
    return out.select(
        "part_a",
        "part_b",
        "n_ab",
        F.expr(
            "cast(n_ab as decimal(38,0)) * cast(n_orders as decimal(38,0))"
            " * 1000000 div (cast(na as decimal(38,0)) * cast(nb as decimal(38,0)))"
        ).cast("bigint").alias("lift_ppm"),
    )


# -------------------------------------------------------------- EWMA (E21)
@query(
    "q142_ewma_decay",
    oracle="""
WITH b AS (SELECT user_id, event_id, ts,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
l AS (SELECT user_id, event_id,
             COALESCE(lag(v, 0) OVER w, 0) * 512 + COALESCE(lag(v, 1) OVER w, 0) * 256
           + COALESCE(lag(v, 2) OVER w, 0) * 128 + COALESCE(lag(v, 3) OVER w, 0) * 64
           + COALESCE(lag(v, 4) OVER w, 0) * 32  + COALESCE(lag(v, 5) OVER w, 0) * 16
           + COALESCE(lag(v, 6) OVER w, 0) * 8   + COALESCE(lag(v, 7) OVER w, 0) * 4
           + COALESCE(lag(v, 8) OVER w, 0) * 2   + COALESCE(lag(v, 9) OVER w, 0) AS num,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS cnt
      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id,
       ROUND(CAST(num // (1024 - (1 << (10 - cnt))) AS BIGINT) / 1000000.0, 6) AS ewma
FROM l
""",
    tags=("E21", "E20", "T-analytics"),
)
def q142_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed moving average (α = 1/2, depth 10) per user —
    the smoothing operator behind rate limiters and anomaly baselines.
    EWMA's recurrence is sequential, which distributes badly; bounding the
    tail at 10 terms (weight < 0.1% beyond) turns it into a fixed lag
    combination inside ONE per-user window sort — weights are powers of
    two and the normalizer is 2¹⁰ − 2^(10−cnt), so the whole thing is
    exact integer arithmetic at any parallelism."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        F.coalesce(F.lag("v", k).over(w), F.lit(0)) * (1 << (9 - k)) for k in range(10)
    )
    cnt = F.count("*").over(w.rowsBetween(-9, 0))
    return b.select(
        "user_id",
        "event_id",
        (num.alias("num")),
        cnt.alias("cnt"),
    ).select(
        "user_id",
        "event_id",
        F.round(F.expr("num div (1024 - shiftleft(1, 10 - cnt))") / 1000000.0, 6).alias("ewma"),
    )


# ------------------------------------------------------- A/B t-test (E11)
@query(
    "q143_ab_ttest",
    oracle="""
WITH b AS (SELECT event_type, user_id % 2 AS arm,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
m AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1, CAST(SUM(v * v) AS BIGINT) AS s2
      FROM b GROUP BY event_type, arm),
p AS (SELECT a.event_type,
             a.n AS n_a, b.n AS n_b, a.s1 AS s1a, b.s1 AS s1b, a.s2 AS s2a, b.s2 AS s2b
      FROM m a JOIN m b ON a.event_type = b.event_type AND a.arm = 0 AND b.arm = 1)
SELECT event_type, n_a, n_b,
       ROUND(s1a * 1.0 / n_a / 1000000.0, 6) AS mean_a,
       ROUND(s1b * 1.0 / n_b / 1000000.0, 6) AS mean_b,
       ROUND((s1a * 1.0 / n_a - s1b * 1.0 / n_b)
             / sqrt(CAST(CAST(n_a AS HUGEINT) * s2a - CAST(s1a AS HUGEINT) * s1a AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
                  + CAST(CAST(n_b AS HUGEINT) * s2b - CAST(s1b AS HUGEINT) * s1b AS DOUBLE)
                      / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1))), 6)
         AS t_stat
FROM p WHERE n_a >= 2 AND n_b >= 2
""",
    tags=("E11", "T-analytics"),
)
def q143_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t-statistic per metric between two experiment arms (users
    hash-split by id): each arm reduces to three exact integer moments
    (n, Σv, Σv²) — one partial-agg shuffle of 3 numbers per (metric, arm)
    regardless of corpus size — and the t ratio is evaluated once per
    group from identical int64 inputs, so the rounded doubles agree on
    any engine. The experiment-analysis shape every event pipeline ships."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    m = b.groupBy("event_type", "arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"),
    )
    a = m.where(F.col("arm") == 0).select(
        "event_type", F.col("n").alias("n_a"), F.col("s1").alias("s1a"), F.col("s2").alias("s2a")
    )
    c = m.where(F.col("arm") == 1).select(
        "event_type", F.col("n").alias("n_b"), F.col("s1").alias("s1b"), F.col("s2").alias("s2b")
    )
    p = a.join(c, "event_type").where((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
    mean_a = F.col("s1a") * 1.0 / F.col("n_a")
    mean_b = F.col("s1b") * 1.0 / F.col("n_b")
    # moment products exceed int64 (n·Σv² ~ 10¹⁹ at sf0.1) → exact
    # decimal(38,0) arithmetic, converted to double only at the ratio
    # (the oracle mirrors with HUGEINT; both round-nearest to the same double)
    dec = "decimal(38,0)"
    var_term = (
        (
            F.col("n_a").cast(dec) * F.col("s2a").cast(dec)
            - F.col("s1a").cast(dec) * F.col("s1a").cast(dec)
        ).cast("double")
        / (F.col("n_a").cast("double") * F.col("n_a") * (F.col("n_a") - 1))
        + (
            F.col("n_b").cast(dec) * F.col("s2b").cast(dec)
            - F.col("s1b").cast(dec) * F.col("s1b").cast(dec)
        ).cast("double")
        / (F.col("n_b").cast("double") * F.col("n_b") * (F.col("n_b") - 1))
    )
    return p.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a / 1000000.0, 6).alias("mean_a"),
        F.round(mean_b / 1000000.0, 6).alias("mean_b"),
        F.round((mean_a - mean_b) / F.sqrt(var_term), 6).alias("t_stat"),
    )


# ----------------------------------------------------- triangle count (X)
@query(
    "q144_triangle_count",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n_ab
          FROM items a
          JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey),
e AS (SELECT a, b FROM pairs WHERE n_ab >= 2),
deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM
        (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) GROUP BY n),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
              CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
SELECT st.n_nodes, ne.n_edges, tri.n_triangles, st.n_wedges,
       CAST(3 * tri.n_triangles * 1000000 // st.n_wedges AS BIGINT) AS global_clustering_ppm
FROM st CROSS JOIN ne CROSS JOIN tri
""",
    tags=("X-graph", "E10"),
)
def q144_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-purchase
    graph (operators/graph.py count_triangles): edges orient from the
    lower-(degree, id) endpoint, capping every out-degree at O(√m) so
    the wedge join is bounded Σoutdeg² ≤ m^1.5 even with hub nodes —
    versus the oracle's naive 3-way self-join, which each triangle once
    only because the toy graph fits. Co-purchase edges = part pairs
    sharing ≥2 orders (q138's support floor)."""
    from rdkafka_streams_spark.operators.graph import count_triangles

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("a", "b")
    )
    return count_triangles(edges, "a", "b")


# ---------------------------------------------------- CUSUM change (E21)
@query(
    "q145_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, date_trunc('day', ts)),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t
        FROM daily GROUP BY event_type),
pre AS (SELECT d.event_type, d.d, tt.n,
               CAST(tt.n * SUM(d.x) OVER (PARTITION BY d.event_type ORDER BY d.d)
                    - ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.d) * tt.t
                 AS BIGINT) AS s
        FROM daily d JOIN tot tt USING (event_type)),
mx AS (SELECT event_type, CAST(MAX(abs(s)) AS BIGINT) AS score FROM pre GROUP BY event_type)
SELECT pre.event_type, CAST(MAX(pre.n) AS BIGINT) AS n_days,
       CAST(MIN(pre.d) AS VARCHAR) AS change_day, CAST(MAX(mx.score) AS BIGINT) AS score
FROM pre JOIN mx ON pre.event_type = mx.event_type AND abs(pre.s) = mx.score
GROUP BY pre.event_type
""",
    tags=("E21", "T-analytics"),
)
def q145_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per metric: the day k maximizing |Σ_{i≤k}(x_i −
    mean)| over the daily series — mean-shift detection for pipeline
    monitoring. Scaling by n (S_k = n·prefix_k − k·total) clears the
    division, so scores are exact BIGINT and the argmax (earliest day on
    ties) is engine-exact. Events reduce to one row per (metric, day)
    BEFORE any window — the prefix sort runs on the tiny daily frame."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")).cast("bigint").alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").cast("bigint").alias("t")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    pre = (
        daily.join(tot, "event_type")
        .withColumn(
            "s",
            (
                F.col("n") * F.sum("x").over(w)
                - F.row_number().over(w) * F.col("t")
            ).cast("bigint"),
        )
    )
    mx = pre.groupBy("event_type").agg(F.max(F.abs("s")).cast("bigint").alias("score"))
    return (
        pre.join(mx, "event_type")
        .where(F.abs("s") == F.col("score"))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.min("d").cast("string").alias("change_day"),
            F.max("score").cast("bigint").alias("score"),
        )
    )


# ------------------------------------------- SCD2 point-in-time join (X-cdc)
@query(
    "q146_scd2_pointintime",
    oracle="""
WITH chg0 AS (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rv
  FROM events WHERE event_type IN ('signup', 'error')),
chg1 AS (SELECT user_id, ts, event_id, event_type FROM chg0 WHERE rv = 1),
chg2 AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM chg1),
dim AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM chg2 WHERE prev_type IS NULL OR prev_type <> event_type),
facts AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, CAST(epoch_us(f.ts) AS BIGINT) AS ts_us, d.state
FROM facts f JOIN dim d
  ON f.user_id = d.user_id AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR d.valid_to > f.ts)
""",
    tags=("X-cdc", "E9", "T-analytics"),
)
def q146_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact→dimension lookup against an SCD2 dimension —
    the other half of q97's build: each purchase joins the user-state
    version (last signup/error) valid at its event time. Planned as the
    as-of join (operators/asof.py union+carry-forward: ONE shuffle, no
    per-key range scan) rather than the oracle's interval theta-join;
    same-instant duplicate changes collapse (latest event_id wins) so
    intervals have positive width and both formulations agree exactly.
    Facts whose user has no prior state drop (inner semantics)."""
    from rdkafka_streams_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    w_same_ts = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    changes = (
        ev.where(F.col("event_type").isin("signup", "error"))
        .withColumn("rv", F.row_number().over(w_same_ts))
        .where(F.col("rv") == 1)
        .select("user_id", "ts", F.col("event_type").alias("state"))
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        facts, changes, on="user_id", left_ts="ts", right_ts="ts",
        payload=["state"], strict=False,
    )
    return out.where(F.col("state_asof").isNotNull()).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("state_asof").alias("state"),
    )


# ------------------------------------------------- chi-square test (E11)
@query(
    "q147_chi_square",
    oracle="""
WITH o AS (SELECT event_type, user_id % 7 AS seg, CAST(COUNT(*) AS BIGINT) AS o
           FROM events GROUP BY event_type, user_id % 7),
r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY event_type),
c AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY seg),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
cells AS (
  SELECT CAST((CAST(n.n * o.o - r.r * c.c AS HUGEINT)
             * (n.n * o.o - r.r * c.c) * 1000000)
             // (CAST(n.n AS HUGEINT) * r.r * c.c) AS BIGINT) AS cell_micro
  FROM o JOIN r USING (event_type) JOIN c USING (seg) CROSS JOIN n),
df AS (SELECT (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT seg) - 1) AS df FROM o)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM n) AS n,
       CAST(df.df AS BIGINT) AS df,
       ROUND(CAST(SUM(cell_micro) AS BIGINT) / 1000000.0, 6) AS chi2
FROM cells CROSS JOIN df GROUP BY df.df
""",
    tags=("E11", "T-analytics"),
)
def q147_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test (event_type × user segment):
    the contingency table reduces map-side to one row per cell, margins
    are cell-table aggregates (never a second fact scan), and each cell's
    contribution (n·o − r·c)²·10⁶ div (n·r·c) is computed in exact
    decimal(38,0) / HUGEINT arithmetic (operands widened BEFORE any
    multiply — valid to the same 38-digit bound as the oracle's HUGEINT)
    and snapped to integer micro BEFORE the sum — the float chi² would
    depend on summation order. The fact table is scanned exactly once:
    the domain-bounded cell table is materialized locally, so no
    persist() pins executor storage across the session."""
    ev = _t(spark, sf_dir, "events")
    # The cell table feeds margins, total, df, AND the contribution join.
    # It is domain-bounded (|event_type| × 7 cells), not data-bounded, so
    # materialize it ONCE into a local relation: the fact table reduces in
    # a single pass, and — unlike persist() — nothing pins executor
    # storage for the session lifetime (ADVICE r3).
    o_lazy = ev.groupBy("event_type", (F.col("user_id") % 7).alias("seg")).agg(
        F.count("*").cast("bigint").alias("o")
    )
    o = spark.createDataFrame(o_lazy.collect(), schema=o_lazy.schema)
    r = o.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("r"))
    c = o.groupBy("seg").agg(F.sum("o").cast("bigint").alias("c"))
    n = o.agg(F.sum("o").cast("bigint").alias("n"))
    # cast every operand to decimal(38,0) BEFORE multiplying — n·o and r·c
    # in BIGINT silently wrap past int64 at large event counts (ADVICE r3;
    # same hazard q143/q149 already guard against)
    dec = "decimal(38,0)"
    d = F.col("n").cast(dec) * F.col("o").cast(dec) - F.col("r").cast(dec) * F.col(
        "c"
    ).cast(dec)
    denom = F.col("n").cast(dec) * F.col("r").cast(dec) * F.col("c").cast(dec)
    cells = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "seg")
        .crossJoin(F.broadcast(n))
        .select(
            (d * d * F.lit(1000000).cast("decimal(7,0)")).cast(dec).alias("num"),
            denom.alias("den"),
        )
        .select(F.expr("num div den").cast("bigint").alias("cell_micro"))
    )
    dims = o.agg(
        (
            (F.count_distinct("event_type") - 1) * (F.count_distinct("seg") - 1)
        ).cast("bigint").alias("df")
    )
    return (
        cells.agg(F.sum("cell_micro").cast("bigint").alias("s"))
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dims))
        .select("n", "df", F.round(F.col("s") / 1000000.0, 6).alias("chi2"))
    )


# ------------------------------------------------- Benford screen (E25)
@query(
    "q148_benford_digits",
    oracle="""
WITH cents AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
               FROM orders WHERE o_totalprice > 0),
d AS (SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM cents),
h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_d FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM h)
SELECT h.digit, h.n_d,
       CAST(h.n_d * 1000000 // t.n AS BIGINT) AS share_ppm,
       CAST(floor(log10(1.0 + 1.0 / h.digit) * 1000000 + 0.5) AS BIGINT) AS benford_ppm,
       CAST(h.n_d * 1000000 // t.n
            - CAST(floor(log10(1.0 + 1.0 / h.digit) * 1000000 + 0.5) AS BIGINT) AS BIGINT)
         AS dev_ppm
FROM h CROSS JOIN t
""",
    tags=("E25", "E11", "T-analytics"),
)
def q148_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals — the forensic
    data-quality test for fabricated or truncated numeric columns. The
    leading digit comes from the canonical BIGINT→string rendering (no
    float log10 on data values, whose power-of-ten boundaries are
    libm-dependent); the Benford reference log10(1+1/d) is evaluated on
    nine literal constants only. One partial-agg shuffle of ≤9 rows."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    cents = o.select((money("o_totalprice") * 100).cast("bigint").alias("v"))
    h = cents.select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("bigint").alias("digit")
    ).groupBy("digit").agg(F.count("*").cast("bigint").alias("n_d"))
    t = h.agg(F.sum("n_d").cast("bigint").alias("n"))
    benford = F.floor(
        F.log10(1.0 + 1.0 / F.col("digit")) * 1000000 + 0.5
    ).cast("bigint")
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_d",
            F.expr("n_d * 1000000 div n").cast("bigint").alias("share_ppm"),
            benford.alias("benford_ppm"),
            (F.expr("n_d * 1000000 div n") - benford).cast("bigint").alias("dev_ppm"),
        )
    )


# ------------------------------------------------- weighted median (E11)
@query(
    "q151_weighted_median",
    oracle="""
WITH b AS (
  SELECT l_returnflag AS flag,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem),
c AS (SELECT flag, v, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY v, l_orderkey, l_linenumber) AS cumw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM b)
SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_weight,
       CAST(MIN(v) AS BIGINT) AS wmedian_cents
FROM c WHERE 2 * cumw >= tw GROUP BY flag
""",
    tags=("E11", "E19", "T-analytics"),
)
def q151_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-aware median (quantity-weighted price per return flag) —
    the aggregation q127's unweighted quantiles can't express: the
    median unit shipped, not the median line. One rank-ordered
    cumulative-weight window (total order via the line's unique key), the
    crossing row found by integer comparison 2·cumw ≥ W — no floats
    anywhere, so engines agree exactly. Both windows share one per-flag
    exchange."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        (money("l_extendedprice") * 100).cast("bigint").alias("v"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wo = Window.partitionBy("flag").orderBy("v", "l_orderkey", "l_linenumber")
    wt = Window.partitionBy("flag")
    c = b.withColumn("cumw", F.sum("w").over(wo)).withColumn(
        "tw", F.sum("w").over(wt)
    )
    return (
        c.where(2 * F.col("cumw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.max("tw").cast("bigint").alias("total_weight"),
            F.min("v").cast("bigint").alias("wmedian_cents"),
        )
    )


# ------------------------------------------- concurrent-load sweep (E21)
@query(
    "q154_concurrent_load",
    oracle="""
WITH deltas AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 300 SECOND AS t, -1 AS delta FROM events),
run AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM deltas)
SELECT event_type, CAST(MAX(c) AS BIGINT) AS peak_concurrent
FROM run GROUP BY event_type
""",
    tags=("E21", "T-analytics"),
)
def q154_concurrent_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type (each event occupies
    [ts, ts+300 s)): the classic sweep line — +1/−1 deltas, running sum,
    global max. A literal translation is ONE ordered window per type
    (the oracle's shape): a single sort task per type at any scale. The
    scalable form is two-phase: a per-(type, day) local sweep in
    parallel, then each day's peak lifted by the exclusive prefix sum of
    whole-day delta totals (a per-type window over #days rows) —
    identical result, sort parallelism grows with the time range. Ends
    sort before starts at the same instant (ORDER BY t, delta), so
    touching intervals don't overlap."""
    ev = _t(spark, sf_dir, "events")
    deltas = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("ts") + F.expr("INTERVAL 300 SECOND")).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("x"),
    ).select("event_type", F.col("x.t").alias("t"), F.col("x.delta").alias("delta"))
    day = F.to_date("t")
    wloc = (
        Window.partitionBy("event_type", day)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = deltas.select(
        "event_type",
        day.alias("d"),
        F.sum("delta").over(wloc).alias("lr"),
        "delta",
    )
    per_day = loc.groupBy("event_type", "d").agg(
        F.max("lr").alias("local_peak"), F.sum("delta").alias("day_sum")
    )
    woff = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    peaks = per_day.select(
        "event_type",
        (
            F.col("local_peak") + F.coalesce(F.sum("day_sum").over(woff), F.lit(0))
        ).alias("peak"),
    )
    return peaks.groupBy("event_type").agg(
        F.max("peak").cast("bigint").alias("peak_concurrent")
    )


# ---------------------------------------------- integer PageRank (X-graph)
@query(
    "q156_pagerank",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2),
e AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
r0 AS (SELECT node, CAST(1000000000000 // n.n AS BIGINT) AS r FROM deg CROSS JOIN n),
b AS (SELECT CAST((15 * (1000000000000 // n.n)) // 100 AS BIGINT) AS b FROM n),
r1 AS (SELECT e.dst AS node, CAST(b.b + (85 * SUM(r0.r // d.deg)) // 100 AS BIGINT) AS r
       FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON e.src = d.node CROSS JOIN b
       GROUP BY e.dst, b.b),
r2 AS (SELECT e.dst AS node, CAST(b.b + (85 * SUM(r1.r // d.deg)) // 100 AS BIGINT) AS r
       FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON e.src = d.node CROSS JOIN b
       GROUP BY e.dst, b.b),
r3 AS (SELECT e.dst AS node, CAST(b.b + (85 * SUM(r2.r // d.deg)) // 100 AS BIGINT) AS r
       FROM e JOIN r2 ON e.src = r2.node JOIN deg d ON e.src = d.node CROSS JOIN b
       GROUP BY e.dst, b.b)
SELECT node, r AS rank_e12 FROM r3 ORDER BY r DESC, node LIMIT 20
""",
    tags=("X-graph", "E10"),
)
def q156_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three damped PageRank iterations (d = 0.85) over the undirected
    co-purchase graph, entirely in integer 1e-12 units: contribution =
    r div deg, next = base + (85·Σcontrib) div 100 — bit-identical at
    any parallelism (float PageRank sums are order-dependent). Edges +
    degrees persist across the three joins and are released after the
    top-20 is materialized (the count_triangles pattern); per iteration
    the only corpus-sized shuffles are the contribution join and the
    dst aggregate. Undirected edges mean no dangling mass. Top-20 by
    (rank, node) keeps the output bounded."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    pairs = (
        a.join(b, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("a", "b")
    )
    e = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("deg")).persist()
    try:
        n = deg.count()  # bounded scalar (node count), drives the literals
        r0_val = 10**12 // n
        base = (15 * r0_val) // 100
        r = deg.select(F.col("src").alias("node"), F.lit(r0_val).cast("bigint").alias("r"))
        for _ in range(3):
            contrib = (
                e.join(r, e["src"] == r["node"])
                .join(deg, "src")
                .select("dst", F.expr("r div deg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            r = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.expr("(85 * s) div 100")).cast("bigint").alias("r"),
            )
        top = r.orderBy(F.col("r").desc(), F.col("node").asc()).limit(20).select(
            "node", F.col("r").alias("rank_e12")
        )
        rows = top.collect()
        out = spark.createDataFrame(rows, schema=top.schema)
    finally:
        e.unpersist(blocking=False)
        deg.unpersist(blocking=False)
    return out


# ------------------------------------------- time-weighted average (E21)
@query(
    "q163_twap",
    oracle="""
WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
l AS (SELECT user_id, v,
             LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur
      FROM b)
SELECT user_id,
       CAST(SUM(CAST(v AS HUGEINT) * dur) // SUM(dur) AS BIGINT) AS twap_micro,
       CAST(SUM(dur) AS BIGINT) AS span_us
FROM l WHERE dur IS NOT NULL
GROUP BY user_id HAVING SUM(dur) > 0
""",
    tags=("E21", "E24", "T-analytics"),
)
def q163_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP/telemetry-integral
    operator): each observation holds until the next one, so the mean is
    Σ v·Δt ÷ ΣΔt — ONE per-user lead window, exact integer micro-units ×
    microsecond durations (a float Riemann sum would drift with order).
    Same-instant duplicates contribute zero width; single-event users
    have no span and drop (HAVING Σdur > 0)."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    l = b.select(
        "user_id", "v", (F.lead("t").over(w) - F.col("t")).alias("dur")
    ).where(F.col("dur").isNotNull())
    return (
        l.groupBy("user_id")
        .agg(
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("dur")).alias("num"),
            F.sum("dur").alias("den"),
        )
        .where(F.col("den") > 0)
        .select(
            "user_id",
            F.expr("num div den").cast("bigint").alias("twap_micro"),
            F.col("den").cast("bigint").alias("span_us"),
        )
    )


# --------------------------------------- linear-interp resample (E21/X4)
@query(
    "q164_resample_interp",
    oracle="""
WITH dedup AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1),
bounds AS (SELECT user_id, MIN(t) AS t0, MAX(t) AS t1 FROM dedup GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(t0, t1, 21600000000)) AS g
         FROM bounds),
u AS (
  SELECT user_id, t, v, 0 AS is_grid FROM dedup
  UNION ALL
  SELECT user_id, g AS t, NULL AS v, 1 AS is_grid FROM grid),
w AS (
  SELECT user_id, t, is_grid,
         LAST_VALUE(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t, is_grid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t, is_grid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         FIRST_VALUE(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t, is_grid
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t, is_grid
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM u)
SELECT user_id, CAST(t AS BIGINT) AS grid_ts_us,
       CAST(CASE WHEN nv IS NULL OR nt = pt THEN pv
                 ELSE pv + (CAST(nv - pv AS HUGEINT) * (t - pt)) // (nt - pt) END AS BIGINT)
         AS v_interp_micro
FROM w WHERE is_grid = 1
""",
    tags=("E21", "X4", "T-analytics"),
)
def q164_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular series onto a regular 6-hour grid
    with LINEAR interpolation — the alignment step before any
    cross-series model; the interpolating complement of q69's LOCF
    gap-fill. No join: grid points union into the event stream and ONE
    pair of ignore-nulls windows per direction recovers the bracketing
    observations (the as-of union trick, operators/asof.py), then
    v = v₀ + (v₁−v₀)·(g−t₀) div (t₁−t₀) in exact integers. Same-instant
    duplicates are pre-deduped (min event_id) so brackets are total."""
    ev = _t(spark, sf_dir, "events")
    wd = Window.partitionBy("user_id", "ts").orderBy("event_id")
    dedup = (
        ev.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
        )
    )
    bounds = dedup.groupBy("user_id").agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.lit(21600000000))).alias("t"),
    )
    u = dedup.select("user_id", "t", "v", F.lit(0).alias("is_grid")).unionAll(
        grid.select("user_id", "t", F.lit(None).cast("bigint").alias("v"), F.lit(1))
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    et = F.when(F.col("v").isNotNull(), F.col("t"))
    w = u.select(
        "user_id",
        "t",
        "is_grid",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(et, ignorenulls=True).over(wb).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(et, ignorenulls=True).over(wf).alias("nt"),
    )
    return w.where(F.col("is_grid") == 1).select(
        "user_id",
        F.col("t").cast("bigint").alias("grid_ts_us"),
        F.when(
            F.col("nv").isNull() | (F.col("nt") == F.col("pt")), F.col("pv")
        )
        .otherwise(
            F.col("pv")
            + F.expr("(cast(nv - pv as decimal(38,0)) * (t - pt)) div (nt - pt)")
        )
        .cast("bigint")
        .alias("v_interp_micro"),
    )


# ------------------------------------- seasonal baseline anomaly (E21/E24)
@query(
    "q165_seasonal_anomaly",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         dayofweek(CAST(date_trunc('day', ts) AS DATE)) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3),
ranked AS (
  SELECT event_type, d, dow, n,
         ROW_NUMBER() OVER (PARTITION BY event_type, dow ORDER BY n, d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, dow) AS cnt
  FROM daily),
med AS (SELECT event_type, dow, n AS med_n
        FROM ranked WHERE rn = (cnt + 1) // 2)
SELECT dd.event_type, dd.d, dd.n, m.med_n,
       CAST((dd.n - m.med_n) * 1000000 // GREATEST(m.med_n, 1) AS BIGINT)
         AS dev_ppm
FROM daily dd JOIN med m
  ON dd.event_type = m.event_type AND dd.dow = m.dow
""",
    tags=("E21", "E24", "T-analytics"),
)
def q165_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal baseline screen: each (event_type, day)'s
    volume is compared against the LOWER MEDIAN of same-weekday volumes
    — the robust seasonal baseline that a mean would let one outage day
    poison. Exact throughout: daily counts are one fact shuffle; the
    median is a rank pick over ≤⌈days/7⌉ rows per (type, dow) cell;
    deviation is integer ppm. Lower median (position (n+1) div 2 by
    (n, d)) keeps every step integer-deterministic."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("d"),
    ).agg(F.count("*").cast("bigint").alias("n")).withColumn(
        "dow", F.dayofweek("d")
    )
    wr = Window.partitionBy("event_type", "dow").orderBy("n", "d")
    wc = Window.partitionBy("event_type", "dow")
    ranked = daily.select(
        "event_type", "dow", "n",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )
    med = ranked.where(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        "event_type", "dow", F.col("n").alias("med_n")
    )
    return daily.join(F.broadcast(med), ["event_type", "dow"]).select(
        "event_type",
        "d",
        "n",
        "med_n",
        F.expr("(n - med_n) * 1000000 div greatest(med_n, 1)").cast("bigint").alias(
            "dev_ppm"
        ),
    )


# --------------------------------------- time-to-convert quantiles (E11)
@query(
    "q166_time_to_convert",
    oracle="""
WITH s AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, MIN(epoch_us(e.ts) - epoch_us(s.t0)) AS dur_us
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t0
      GROUP BY e.user_id),
r AS (SELECT dur_us, ROW_NUMBER() OVER (ORDER BY dur_us, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM p)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END) AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN dur_us END) AS BIGINT) AS p90_us
FROM r
""",
    tags=("E11", "E10", "T-analytics"),
)
def q166_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-latency distribution: earliest signup
    per user (one agg), earliest strictly-later purchase (one join +
    agg), then EXACT lower-median and p90 picked by integer rank
    positions ((n+1) div 2, (9n+9) div 10) — rank-pick order includes
    user_id so ties are total. The converted-user frame grows linearly
    with users, so the exact rank goes through operators/ranking.py
    global_rank (range partition + parallel local ranks + broadcast
    offsets) and the global count arrives as a broadcast 1-row join —
    no partition-less window anywhere in the plan."""
    from rdkafka_streams_spark.operators.ranking import global_rank

    ev = _t(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts") - F.unix_micros("t0")).alias("dur_us")
        )
    )
    ranked = global_rank(p, ["dur_us", "user_id"], rank_col="rn")
    n_df = p.agg(F.count("*").alias("n"))
    r = ranked.crossJoin(F.broadcast(n_df)).select("dur_us", "rn", "n")
    return r.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("dur_us")))
        .cast("bigint").alias("p50_us"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("dur_us")))
        .cast("bigint").alias("p90_us"),
    )


# ------------------------------------------------ session summary (T3/E20)
@query(
    "q167_session_summary",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged)
SELECT user_id, session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
       MIN(struct_pack(t := ts, i := event_id, e := event_type)).e AS entry_type,
       MAX(struct_pack(t := ts, i := event_id, e := event_type)).e AS exit_type,
       CAST(COUNT(*) = 1 AS BIGINT) AS is_bounce
FROM sess GROUP BY user_id, session_idx
""",
    tags=("T3", "E20", "T-analytics"),
)
def q167_session_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-session rollup on top of q82's gaps-and-islands assignment:
    per (user, session) the event count, wall duration, ENTRY and EXIT
    event types (min/max over (ts, event_id, type) structs — argmin/max
    without a second window pass) and the bounce flag. Session numbering
    and the rollup share one (user)-keyed sort, so the whole summary is
    a single fact shuffle."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    new_session = (
        prev.isNull() | ((F.unix_timestamp("ts") - prev) > 1800)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(new_session).over(run).cast("bigint").alias("session_idx"),
    )
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("bigint").alias("duration_us"),
        F.min(key).getField("event_type").alias("entry_type"),
        F.max(key).getField("event_type").alias("exit_type"),
        (F.count("*") == 1).cast("bigint").alias("is_bounce"),
    )


# ---------------------------------------- two-sample KS test (E11/E21)
@query(
    "q170_ks_test",
    oracle="""
WITH b AS (SELECT user_id % 2 AS arm,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
per_v AS (SELECT v,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM b GROUP BY v),
t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM per_v),
cum AS (SELECT v,
               SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
               SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb
        FROM per_v)
SELECT t.na, t.nb,
       CAST(MAX(abs(CAST(cum.fa AS HUGEINT) * t.nb - CAST(cum.fb AS HUGEINT) * t.na))
            * 1000000 // (CAST(t.na AS HUGEINT) * t.nb) AS BIGINT) AS ks_ppm
FROM cum CROSS JOIN t GROUP BY t.na, t.nb
""",
    tags=("E11", "E21", "T-analytics"),
)
def q170_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the hash-split A/B
    arms of q143: KS = max |F_a − F_b| over the pooled support, computed
    as exact integers (|Fa·nb − Fb·na| over na·nb, in ppm). The oracle's
    single `OVER (ORDER BY v)` cumulative is one sort task at any scale;
    here the prefix sums are two-phase — per-bucket local cumsums
    (v div 2²⁰ buckets sort in parallel) lifted by broadcast bucket
    offsets, the q154/global_rank pattern — identical result, sort
    parallelism grows with the value range."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    per_v = b.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("cb"),
    ).withColumn("bkt", F.expr("v div 1048576"))
    t = per_v.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = per_v.select(
        "bkt", "v",
        F.sum("ca").over(wloc).alias("la"),
        F.sum("cb").over(wloc).alias("lb"),
    )
    btot = per_v.groupBy("bkt").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bkt",
        F.coalesce(F.sum("ta").over(woff), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(woff), F.lit(0)).alias("ob"),
    )
    cum = loc.join(F.broadcast(offs), "bkt").select(
        (F.col("la") + F.col("oa")).alias("fa"),
        (F.col("lb") + F.col("ob")).alias("fb"),
    )
    dev = cum.crossJoin(F.broadcast(t)).select(
        F.abs(
            F.col("fa").cast("decimal(38,0)") * F.col("nb")
            - F.col("fb").cast("decimal(38,0)") * F.col("na")
        ).alias("d"),
        "na",
        "nb",
    )
    return dev.groupBy("na", "nb").agg(
        F.expr(
            "cast(max(d) * 1000000 div (cast(na as decimal(38,0)) * nb) as bigint)"
        ).alias("ks_ppm")
    ).select("na", "nb", "ks_ppm")


# ------------------------------------ Theil-Sen robust trend (E11/E27)
@query(
    "q171_theilsen_trend",
    oracle="""
WITH dedup AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1),
recent AS (
  SELECT user_id, t, v FROM (
    SELECT user_id, t, v,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t DESC) AS rd
    FROM dedup) WHERE rd <= 32),
slopes AS (
  SELECT a.user_id,
         CAST((b.v - a.v) * 1000000 // (b.t - a.t) AS BIGINT) AS s
  FROM recent a JOIN recent b
    ON a.user_id = b.user_id AND a.t < b.t),
ranked AS (
  SELECT user_id, s,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM slopes)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN s END) AS BIGINT)
         AS theil_slope_micro_per_s
FROM ranked GROUP BY user_id
""",
    tags=("E11", "E27", "T-analytics"),
)
def q171_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user — the median of all pairwise
    slopes over the last 32 observations, immune to the outliers that
    wreck the q121 OLS fit. Bounding the window at 32 points caps the
    pairwise set at C(32,2) = 496 slopes per user, generated MAP-SIDE by
    nested higher-order transforms over one collected struct array (no
    self-join, no second shuffle — the oracle's per-user self-join is
    the naive plan). Slopes are exact integers (Δv_micro·10⁶ div Δt_us,
    i.e. micro-units/second): the double division + bigint cast
    truncates onto the same integer as the oracle's `//` because
    |q − n| ≥ 1/Δt always exceeds the double ULP at q (operands ≤
    2e15). Median = lower-median element pick of the sorted array."""
    ev = _t(spark, sf_dir, "events")
    wd = Window.partitionBy("user_id", "ts").orderBy("event_id")
    dedup = (
        ev.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("t").desc())
    recent = (
        dedup.withColumn("rd", F.row_number().over(wr))
        .where(F.col("rd") <= 32)
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("t", "v"))).alias("pts"))
    )
    pair_slopes = F.flatten(
        F.transform(
            "pts",
            lambda a, i: F.transform(
                F.slice("pts", i + 2, F.greatest(F.size("pts") - i - 1, F.lit(0))),
                lambda b: (
                    ((b["v"] - a["v"]) * 1000000) / (b["t"] - a["t"])
                ).cast("bigint"),
            ),
        )
    )
    out = recent.select("user_id", F.array_sort(pair_slopes).alias("s"))
    return out.where(F.size("s") > 0).select(
        "user_id",
        F.size("s").cast("bigint").alias("n_pairs"),
        F.element_at("s", ((F.size("s") + 1) / 2).cast("int"))
        .cast("bigint").alias("theil_slope_micro_per_s"),
    )


# --------------------------------------- transition matrix (E19/E20)
@query(
    "q172_transition_matrix",
    oracle="""
WITH r AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
c AS (SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM r WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type),
t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY prev_type)
SELECT c.prev_type, c.next_type, c.n,
       CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_ppm
FROM c JOIN t ON c.prev_type = t.prev_type
""",
    tags=("E19", "E20", "T-analytics"),
)
def q172_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (the Sankey/Markov view of user
    behavior): one per-user lag window yields consecutive-event bigrams,
    one count shuffle builds the matrix, row totals broadcast back for
    exact ppm shares. The |types|² output is tiny at any corpus size —
    all the mass is in the single fact-table window sort."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    c = r.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 1000000 div tot").cast("bigint").alias("share_ppm"),
    )


# ------------------------------------- daily percentile bands (E11/E19)
@query(
    "q173_daily_bands",
    oracle="""
WITH b AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v,
                  event_id
           FROM events),
r AS (SELECT d, v,
             ROW_NUMBER() OVER (PARTITION BY d ORDER BY v, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY d) AS n
      FROM b)
SELECT d, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = (n + 9) // 10 THEN v END) AS BIGINT) AS p10_micro,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT) AS p50_micro,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS BIGINT) AS p90_micro
FROM r GROUP BY d
""",
    tags=("E11", "E19", "T-analytics"),
)
def q173_daily_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p10/p50/p90 bands of the value distribution — the
    percentile-ribbon chart behind every monitoring dashboard, computed
    EXACTLY: one rank window per day partition (day cardinality grows
    with the time range, so sort parallelism scales), percentiles picked
    at integer rank positions, values in snapped micro-units. The
    ground-truth complement of sketch-based bands (q64 GK)."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
        "event_id",
    )
    wr = Window.partitionBy("d").orderBy("v", "event_id")
    wn = Window.partitionBy("d")
    r = b.select(
        "d", "v",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return r.groupBy("d").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == F.expr("(n + 9) div 10"), F.col("v")))
        .cast("bigint").alias("p10_micro"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v")))
        .cast("bigint").alias("p50_micro"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("v")))
        .cast("bigint").alias("p90_micro"),
    )


# ---------------------------------- quantile (rank) transform (E19/E11)
@query(
    "q174_quantile_transform",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS n
  FROM events)
SELECT event_id, event_type, d,
       CAST(CASE WHEN n > 1 THEN (rn - 1) * 1000000 // (n - 1)
                 ELSE 0 END AS BIGINT) AS u_ppm
FROM r
""",
    tags=("E19", "E11", "T-analytics"),
)
def q174_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile transform (map values onto a uniform [0, 1e6]
    ppm grid) per (event_type, day) — the distribution-free
    normalization for heavy-tailed features. Partitioning includes the
    DAY so the window key's cardinality grows with the data (the q22
    lesson); one rank window, exact integer grid positions, ties broken
    by event_id so the output is total."""
    ev = _t(spark, sf_dir, "events")
    d = F.to_date(F.date_trunc("day", "ts"))
    wr = Window.partitionBy("event_type", d).orderBy("value", "event_id")
    wn = Window.partitionBy("event_type", d)
    return ev.select(
        "event_id",
        "event_type",
        d.alias("d"),
        F.when(
            F.count("*").over(wn) > 1,
            (F.row_number().over(wr) - 1)
            * 1000000
            / (F.count("*").over(wn) - 1),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("u_ppm"),
    )


# ------------------------------- per-class embedding dispersion (L3/E11)
@query(
    "q175_embedding_dispersion",
    oracle="""
WITH e AS (
  SELECT vec_id, label,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))) AS v,
         unnest(range(1, 65)) AS dim
  FROM embeddings),
s AS (SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
      FROM e GROUP BY label, dim),
c AS (SELECT label, dim, n, s1, s2, CAST(s1 // n AS BIGINT) AS cd FROM s),
w AS (SELECT label, MAX(n) AS n,
             CAST(SUM(s2 - 2 * CAST(cd AS HUGEINT) * s1
                      + CAST(n AS HUGEINT) * cd * cd) AS HUGEINT) AS wss,
             CAST(SUM(CAST(cd AS HUGEINT) * cd) AS HUGEINT) AS cnorm2
      FROM c GROUP BY label)
SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n_vecs,
       CAST(wss // (n * 64) AS BIGINT) AS mean_within_ss,
       CAST(cnorm2 AS BIGINT) AS centroid_norm2
FROM w
""",
    tags=("L3", "E11"),
)
def q175_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding dispersion: the truncated-integer centroid of
    each label's vectors, its squared norm, and the mean within-class
    squared scatter Σ‖e−c‖² / (n·d) — the compactness audit run before
    trusting labels for curation or stratified ANN. Exact throughout:
    Σ(v−c)² expands to s2 − 2c·s1 + n·c² over per-(label, dim) integer
    moments, so ONE posexplode shuffle of (label, dim) cells carries the
    whole computation — never a second pass joining vectors against
    centroids. HUGEINT/decimal(38,0) guards the squared sums."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1000000 + 0.5).cast("bigint"),
            )
        ).alias("dim", "v"),
    )
    s = e.groupBy("label", "dim").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s1"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("s2"),
    )
    c = s.select(
        "label", "n", "s1", "s2", F.expr("s1 div n").cast("bigint").alias("cd")
    )
    dec = "decimal(38,0)"
    w = c.groupBy("label").agg(
        F.max("n").alias("n"),
        F.sum(
            F.col("s2")
            - 2 * F.col("cd").cast(dec) * F.col("s1")
            + F.col("n").cast(dec) * F.col("cd").cast(dec) * F.col("cd")
        ).alias("wss"),
        F.sum(F.col("cd").cast(dec) * F.col("cd")).alias("cnorm2"),
    )
    return w.select(
        F.col("label").cast("bigint").alias("label"),
        F.col("n").cast("bigint").alias("n_vecs"),
        F.expr("wss div (cast(n as decimal(38,0)) * 64)").cast("bigint").alias(
            "mean_within_ss"
        ),
        F.col("cnorm2").cast("bigint").alias("centroid_norm2"),
    )


# ----------------------------------------- TF-IDF keyterms (L4/E19)
@query(
    "q176_doc_keyterms",
    oracle="""
WITH tok AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY tok),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
w AS (SELECT t.doc_id, t.tok,
             CAST(t.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / d.df) * 1000 + 0.5)
                              AS BIGINT) AS BIGINT) AS w
      FROM tok t JOIN df d ON t.tok = d.tok CROSS JOIN n
      WHERE d.df < n.n)
SELECT doc_id, tok, w FROM (
  SELECT doc_id, tok, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w DESC, tok) AS rn
  FROM w WHERE w > 0) WHERE rn <= 5
""",
    tags=("L4", "E19"),
)
def q176_doc_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keyterms per document — the keyword-extraction pass
    behind indexing, routing and topic audits. Term frequency × IDF in
    milli-nats (corpus-wide tokens where df = N carry zero weight and
    drop), top-5 by a per-doc window. One token-count shuffle + the df
    broadcast; integer weights make the ranking reproducible."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dfreq = tok.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    n = tok.agg(F.count_distinct("doc_id").cast("bigint").alias("n"))
    w = (
        tok.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .where(F.col("df") < F.col("n"))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("n").cast("double") / F.col("df")) * 1000 + 0.5
                ).cast("bigint")
            ).cast("bigint").alias("w"),
        )
        .where(F.col("w") > 0)
    )
    wr = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("tok").asc())
    return w.withColumn("rn", F.row_number().over(wr)).where(F.col("rn") <= 5).select(
        "doc_id", "tok", "w"
    )


# ------------------------------------------- burst detection (E21/E24)
@query(
    "q177_burst_detection",
    oracle="""
WITH m AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, hour, cnt,
             CAST(COALESCE(SUM(cnt) OVER tr, 0) AS BIGINT) AS trailing_sum,
             CAST(COUNT(*) OVER tr AS BIGINT) AS n_prev
      FROM m WINDOW tr AS (PARTITION BY event_type ORDER BY hour
                           RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT event_type, CAST(hour AS BIGINT) AS hour, cnt, trailing_sum, n_prev
FROM w WHERE n_prev >= 6 AND cnt * n_prev * 2 >= 3 * trailing_sum
""",
    tags=("E21", "E24", "T-analytics"),
)
def q177_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst screen: hours whose event count is ≥1.5× the trailing
    day's per-hour average (integer cross-multiplied — no float rates),
    with a ≥6-hour history floor to suppress cold starts. The fact
    table reduces to per-(type, hour) counts FIRST, so the trailing
    range-window runs over metadata-scale rows; the 1.5× threshold is
    the exact inequality cnt·n_prev·2 ≥ 3·trailing_sum."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type",
        F.expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .cast("bigint").alias("hour"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    tr = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-24, -1)
    )
    w = m.select(
        "event_type",
        "hour",
        "cnt",
        F.coalesce(F.sum("cnt").over(tr), F.lit(0)).cast("bigint").alias("trailing_sum"),
        F.count("*").over(tr).cast("bigint").alias("n_prev"),
    )
    return w.where(
        (F.col("n_prev") >= 6)
        & (F.col("cnt") * F.col("n_prev") * 2 >= 3 * F.col("trailing_sum"))
    )


# --------------------------------------- inter-event gap stats (E21/E11)
@query(
    "q178_gap_stats",
    oracle="""
WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
g AS (SELECT user_id,
             (LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)
               // 1000 AS d_ms
      FROM b),
s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d_ms) AS BIGINT) AS s1,
             CAST(SUM(CAST(d_ms AS HUGEINT) * d_ms) AS HUGEINT) AS s2
      FROM g WHERE d_ms IS NOT NULL GROUP BY user_id HAVING COUNT(*) >= 2)
SELECT user_id, n AS n_gaps,
       CAST(s1 // n AS BIGINT) AS mean_gap_ms,
       CAST((n * s2 - CAST(s1 AS HUGEINT) * s1) // (CAST(n AS HUGEINT) * (n - 1))
            AS BIGINT) AS var_gap_ms2
FROM s
""",
    tags=("E21", "E11", "T-analytics"),
)
def q178_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per user (mean + sample variance of
    millisecond gaps): the cadence fingerprint that separates humans,
    cron jobs and replay attacks. ONE per-user lead window; variance
    from exact integer moments (n·Σd² − (Σd)²) div (n·(n−1)) in
    decimal(38,0)/HUGEINT — no float accumulation anywhere."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select("user_id", "event_id", F.unix_micros("ts").alias("t"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    g = b.select(
        "user_id",
        F.expr("(lead(t) over (partition by user_id order by t, event_id) - t) div 1000")
        .alias("d_ms"),
    ).where(F.col("d_ms").isNotNull())
    dec = "decimal(38,0)"
    s = g.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("d_ms").cast("bigint").alias("s1"),
        F.sum(F.col("d_ms").cast(dec) * F.col("d_ms")).alias("s2"),
    ).where(F.col("n") >= 2)
    return s.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.expr("s1 div n").cast("bigint").alias("mean_gap_ms"),
        F.expr(
            "(cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1)"
            " div (cast(n as decimal(38,0)) * (n - 1))"
        ).cast("bigint").alias("var_gap_ms2"),
    )


# ------------------------------------- compacted-state topic (S1/S2/X7)
@query(
    "q179_compacted_state",
    oracle="""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM events)
SELECT user_id, event_type, ts_us FROM r WHERE rn = 1
""",
    tags=("S1", "S2", "X7", "T-streaming"),
)
def q179_compacted_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka compacted-topic state recovery through the transport: every
    event is produced KEYED by user in event-time order, the topic is
    compacted (TopicLog.compact — latest record per key survives with
    its original offset, Kafka cleaner semantics), and the consumer
    rebuilds current per-user state from the compacted log alone. The
    produce is DISTRIBUTED and partition-ordered: the seed frame is
    pre-partitioned on the topic partition id (crc32(key) mod P — the
    sink's own keyed route), sorted by event time within each task, and
    written through KProducer.write_batch with an explicit partition
    column, so every topic partition is staged by exactly one executor
    task in event-time order and no row ever crosses the driver. The
    oracle derives the same state relationally. Proves the state-topic
    pattern — changelog in, table out — end-to-end on durable storage."""
    import tempfile

    from rdkafka_streams_spark.streaming import KProducer, TopicLog, read_topic

    root = tempfile.mkdtemp(prefix="q179_bus")
    n_parts = 4
    log = TopicLog(root)
    log.create_topic("state", partitions=n_parts)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    tp = (F.crc32(F.col("user_id").cast("string").cast("binary")) % n_parts).cast("int")
    seed = (
        ev.withColumn("__tp", tp)
        .repartition(n_parts, "__tp")
        .sortWithinPartitions("ts_us", "event_id")
        .select("user_id", "event_type", "ts_us", "__tp")
    )
    KProducer(
        host=root, topic="state", key="user_id", partition_col="__tp",
        transport="topiclog",
    ).write_batch(seed)
    log.compact("state")
    raw = read_topic(spark, root, "state")
    return raw.select(
        F.from_json(
            F.col("value").cast("string"),
            "user_id long, event_type string, ts_us long",
        ).alias("v")
    ).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_type").alias("event_type"),
        F.col("v.ts_us").alias("ts_us"),
    )


# --------------------------------------------- duplex event bus (S3)
@query(
    "q180_duplex_transform",
    oracle="""
WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
SELECT 'origin' AS source, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM c
UNION ALL
SELECT 'processed' AS source, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(2 * cents) AS BIGINT) AS sum_cents
FROM c
""",
    tags=("S3", "S1", "S2", "R7", "T-streaming"),
)
def q180_duplex_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's getDuplex loop-back scenario INSIDE the correctness
    gate (test/test_getDuplex.coffee:57-76 semantics): every event is
    produced to the bus tagged source='origin', ONE streaming hop reads
    the same topic, re-tags to 'processed' doubling the payload, and
    writes back; the guard (source='origin') is what makes the feedback
    loop converge. The bus then holds originals + processed copies, and
    the per-source (count, sum) rollup must equal the relational oracle
    — proving read-transform-write-same-topic end-to-end on durable
    storage, not just in a unit test."""
    import tempfile

    from rdkafka_streams_spark.streaming import KProducer, TopicLog, get_duplex, read_topic

    root = tempfile.mkdtemp(prefix="q180_bus")
    ck = tempfile.mkdtemp(prefix="q180_ck")
    log = TopicLog(root)
    log.create_topic("bus", partitions=4)
    # distributed seed: executor-side staged produce, no driver collect
    seed = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.lit("origin").alias("source"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    KProducer(host=root, topic="bus", transport="topiclog").write_batch(seed)
    dup = get_duplex(
        host=root, topic="bus",
        schema="event_id long, source string, cents long",
        from_offset="earliest", checkpoint=ck, transport="topiclog",
    )

    def retag(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("value.event_id").alias("event_id"),
            F.lit("processed").alias("source"),
            (F.col("value.cents") * 2).alias("cents"),
        )

    q = dup.pipe(spark, retag, F.col("value.source") == "origin", available_now=True)
    q.awaitTermination(300)
    bus = read_topic(spark, root, "bus").select(
        F.from_json(
            F.col("value").cast("string"), "event_id long, source string, cents long"
        ).alias("v")
    )
    return bus.groupBy(F.col("v.source").alias("source")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v.cents").cast("bigint").alias("sum_cents"),
    )


# ------------------------------------- stateful running count (R5/T7)
@query(
    "q181_stateful_count",
    oracle="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
""",
    tags=("R5", "T7", "T-streaming"),
)
def q181_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's running per-key counter (arbitrary stateful logic,
    applyInPandasWithState) INSIDE the correctness gate: events stream
    from a topiclog topic through the stateful operator in update mode;
    the memory sink accumulates every per-batch emission and the LAST
    update per key (counts are monotone, so max == final state) must
    equal the relational COUNT — per-key closure state proven against
    an oracle, not just a unit assertion."""
    import tempfile

    from rdkafka_streams_spark.streaming import KConsumer, KProducer, TopicLog, shutdown
    from rdkafka_streams_spark.streaming.stateful import running_count_stateful

    root = tempfile.mkdtemp(prefix="q181_bus")
    ck = tempfile.mkdtemp(prefix="q181_ck")
    log = TopicLog(root)
    log.create_topic("ev", partitions=4)
    # distributed seed: executor-side staged produce, no driver collect
    seed = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    KProducer(host=root, topic="ev", transport="topiclog").write_batch(seed)
    c = KConsumer(
        host=root, topic="ev", from_offset="earliest",
        schema="event_id long, user_id long", transport="topiclog",
    )
    decoded = c.stream(spark).select(
        F.col("value.user_id").cast("string").alias("user_id")
    )
    counted = running_count_stateful(decoded, keys=["user_id"])
    name = "q181_updates"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    q.processAllAvailable()
    shutdown(q, 60)
    # the stateful operator keys as string; restore the bigint key for the
    # oracle comparison
    return (
        spark.table(name)
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(F.max("n").cast("bigint").alias("n_events"))
    )


# ------------------------------------------- max drawdown (E21/E11)
@query(
    "q182_max_drawdown",
    oracle="""
WITH b AS (SELECT user_id, epoch_us(ts) AS t, event_id,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
c1 AS (SELECT user_id, t, event_id,
              SUM(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS cum
       FROM b),
c AS (SELECT user_id, cum,
             MAX(cum) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS UNBOUNDED PRECEDING) AS peak
      FROM c1)
SELECT user_id,
       CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_micro,
       CAST(MAX(peak) AS BIGINT) AS peak_micro
FROM c GROUP BY user_id
""",
    tags=("E21", "E11", "T-analytics"),
)
def q182_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the cumulative value series — the
    peak-to-trough risk measure, computed exactly: ONE per-user window
    sort carries the running sum, its running max (a window over a
    window, same sort), and the max gap — no second shuffle, no float
    accumulation. The drawdown of a monotone series is 0 by
    construction, not epsilon."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = b.select(
        "user_id", "t", "event_id", F.sum("v").over(w).alias("cum")
    ).select("user_id", "cum", F.max("cum").over(w).alias("peak"))
    return c.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("cum")).cast("bigint").alias("max_drawdown_micro"),
        F.max("peak").cast("bigint").alias("peak_micro"),
    )


# -------------------------------- clamped running balance (E34/T7)
@query(
    "q183_clamped_balance",
    oracle="""
WITH RECURSIVE b AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) - 500000 AS v
  FROM events),
n AS (SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n FROM b GROUP BY user_id),
rec(user_id, rn, bal) AS (
  SELECT user_id, rn, LEAST(100000000, GREATEST(0, v)) FROM b WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.rn, LEAST(100000000, GREATEST(0, rec.bal + b.v))
  FROM rec JOIN b ON b.user_id = rec.user_id AND b.rn = rec.rn + 1)
SELECT r.user_id, n.n AS n_events, CAST(r.bal AS BIGINT) AS final_balance_micro
FROM rec r JOIN n ON r.user_id = n.user_id AND r.rn = n.n
""",
    tags=("E34", "T7", "R7"),
)
def q183_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped (saturating) running balance per user — credits/debits
    accumulate but the balance saturates at [0, 100] units. The clamp
    makes the recurrence NON-LINEAR: unlike a running sum it has no
    window-function closed form (the whole prefix matters), which is
    exactly when the engine's escape hatch is an Arrow-batched
    `applyInPandas` per key — the grouped-map path the multimodal and
    stateful operators also ride. Values stay integer micro inside the
    pandas loop, so the result is exact and the DuckDB oracle is a
    recursive CTE stepping the same recurrence. Per-user state is one
    scalar; the shuffle is the single groupBy(user)."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        (F.floor(F.col("value") * 1000000 + 0.5).cast("bigint") - 500000).alias("v"),
    )

    def clamp_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id"])
        bal = 0
        for v in pdf["v"]:
            bal = min(100000000, max(0, bal + int(v)))
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "final_balance_micro": [bal],
            }
        )

    return b.groupBy("user_id").applyInPandas(
        clamp_group, "user_id long, n_events long, final_balance_micro long"
    )


# ---------------------------------------- rolling Hampel filter (E21)
@query(
    "q184_hampel_filter",
    oracle="""
WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           FROM events),
w AS (SELECT user_id, event_id, v,
             list(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nb
      FROM b),
m AS (SELECT user_id, event_id, v,
             list_sort(nb)[(len(nb) + 1) // 2] AS med, nb
      FROM w),
d AS (SELECT user_id, event_id, v, med,
             list_sort(list_transform(nb, x -> abs(x - med)))[(len(nb) + 1) // 2]
               AS mad
      FROM m)
SELECT user_id, event_id, v AS v_micro, CAST(med AS BIGINT) AS med_micro,
       CAST(mad AS BIGINT) AS mad_micro,
       CAST(abs(v - med) > 3 * mad AS BIGINT) AS is_outlier
FROM d
""",
    tags=("E21", "E11", "T-analytics"),
)
def q184_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Hampel outlier screen per user: each point is compared
    against the LOWER MEDIAN and MAD of its ±3-row neighborhood —
    the robust rolling filter that a rolling mean/stddev cannot be
    (one spike poisons a mean window; it barely moves a median). The
    neighborhood is collected by one frame window and both medians are
    element picks from sorted arrays (JVM higher-order functions) —
    exact integers end-to-end, ONE per-user sort. The rolling
    complement of q141's global MAD screen."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("v"),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(-3, 3)
    )
    w = b.select(
        "user_id", "event_id", "v", F.collect_list("v").over(wf).alias("nb")
    )
    med = F.element_at(F.array_sort("nb"), ((F.size("nb") + 1) / 2).cast("int"))
    m = w.select("user_id", "event_id", "v", "nb", med.alias("med"))
    mad = F.element_at(
        F.array_sort(F.transform("nb", lambda x: F.abs(x - F.col("med")))),
        ((F.size("nb") + 1) / 2).cast("int"),
    )
    return m.select(
        "user_id",
        "event_id",
        F.col("v").alias("v_micro"),
        F.col("med").cast("bigint").alias("med_micro"),
        mad.cast("bigint").alias("mad_micro"),
        (F.abs(F.col("v") - F.col("med")) > 3 * mad).cast("bigint").alias("is_outlier"),
    )


# ------------------------------------------- activity streaks (E19/E24)
@query(
    "q185_activity_streaks",
    oracle="""
WITH days AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
              FROM events),
g AS (SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days),
s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) AS streak_start
      FROM g GROUP BY user_id, island)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM s GROUP BY user_id
""",
    tags=("E19", "E24", "T-analytics"),
)
def q185_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands identity (date minus its per-user rank is constant
    exactly along a consecutive run). Distinct active days first (the
    corpus reduces to ≤ users×days rows), then one rank window and two
    small aggregates; everything after the distinct is metadata-scale."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    wr = Window.partitionBy("user_id").orderBy("d")
    g = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(wr)).alias("island"),
    )
    s = g.groupBy("user_id", "island").agg(F.count("*").cast("bigint").alias("len"))
    return s.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


# ------------------------------------------- related items (E10/E19)
@query(
    "q186_related_items",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT a AS part, b AS rel, n_ab FROM pairs
        UNION ALL SELECT b, a, n_ab FROM pairs),
singles AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1),
nt AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
scored AS (
  SELECT s.part, s.rel, s.n_ab,
         CAST(CAST(s.n_ab AS HUGEINT) * t.n_orders * 1000000
              // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT) AS lift_ppm
  FROM sym s
  JOIN singles sa ON s.part = sa.l_partkey
  JOIN singles sb ON s.rel = sb.l_partkey
  CROSS JOIN nt t)
SELECT part, rel, n_ab, lift_ppm FROM (
  SELECT part, rel, n_ab, lift_ppm,
         ROW_NUMBER() OVER (PARTITION BY part
                            ORDER BY lift_ppm DESC, n_ab DESC, rel) AS rn
  FROM scored) WHERE rn <= 3
""",
    tags=("E10", "E19", "T-analytics"),
)
def q186_related_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"People also bought": top-3 co-purchased parts per part ranked by
    exact integer lift — the SERVING view of q138's market-basket
    statistics (q138 audits pairs globally; this materializes the
    per-item recommendation list a lookup service ships). Pair
    generation is the same map-side basket expansion; the per-part
    window key's cardinality grows with the catalog, so the top-3 rank
    parallelizes; ties break (lift, support, id) so the list is total."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "parts",
                        lambda a, i: F.transform(
                            F.slice(
                                "parts", i + 2,
                                F.greatest(F.size("parts") - i - 1, F.lit(0)),
                            ),
                            lambda b: F.struct(a.alias("a"), b.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    sym = pairs.select(F.col("a").alias("part"), F.col("b").alias("rel"), "n_ab").unionAll(
        pairs.select(F.col("b").alias("part"), F.col("a").alias("rel"), "n_ab")
    )
    singles = li.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("n"))
    nt = li.agg(F.count_distinct("l_orderkey").cast("bigint").alias("n_orders"))
    scored = (
        sym.join(singles.select(F.col("l_partkey").alias("part"), F.col("n").alias("na")), "part")
        .join(singles.select(F.col("l_partkey").alias("rel"), F.col("n").alias("nb")), "rel")
        .crossJoin(F.broadcast(nt))
        .select(
            "part", "rel", "n_ab",
            F.expr(
                "cast(cast(n_ab as decimal(38,0)) * n_orders * 1000000"
                " div (cast(na as decimal(38,0)) * nb) as bigint)"
            ).alias("lift_ppm"),
        )
    )
    wr = Window.partitionBy("part").orderBy(
        F.col("lift_ppm").desc(), F.col("n_ab").desc(), F.col("rel").asc()
    )
    return scored.withColumn("rn", F.row_number().over(wr)).where(F.col("rn") <= 3).select(
        "part", "rel", "n_ab", "lift_ppm"
    )


# ------------------------------------- stream-stream join (T6)
@query(
    "q187_stream_stream_join",
    oracle="""
WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
           FROM events WHERE event_type = 'purchase'),
e AS (SELECT user_id, event_id AS e_id, epoch_us(ts) AS e_us
      FROM events WHERE event_type = 'error')
SELECT p.user_id, p.p_id, e.e_id,
       CAST(p.p_us - e.e_us AS BIGINT) AS delta_us
FROM p JOIN e ON p.user_id = e.user_id
 AND e.e_us BETWEEN p.p_us - 3600000000 AND p.p_us
""",
    tags=("T6", "S1", "S5", "T-streaming"),
)
def q187_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream windowed equi-join THROUGH the transport (T6 promoted
    to the oracle tier): purchases and errors are produced to two topiclog
    topics (distributed write_batch — no driver collect), two independent
    streaming consumers read them back, and the engine's stateful
    stream-stream join matches each purchase to same-user errors in the
    preceding hour, watermarked on BOTH sides so join state is evicted as
    event time advances (the unbounded-state guard that matters at 100 TB).
    The emitted pairs must equal the relational band join the oracle
    computes — the reference's two-consumer composition
    (test/test_getDuplex.coffee:57-76 topology) with real join semantics."""
    import tempfile

    from rdkafka_streams_spark.streaming import KConsumer, KProducer, TopicLog

    root = tempfile.mkdtemp(prefix="q187_bus")
    ck = tempfile.mkdtemp(prefix="q187_ck")
    log = TopicLog(root)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    for et, topic in (("purchase", "purchases"), ("error", "errors")):
        log.create_topic(topic, partitions=4)
        KProducer(host=root, topic=topic, transport="topiclog").write_batch(
            ev.where(F.col("event_type") == et).select("user_id", "event_id", "ts_us")
        )

    def side(topic: str, prefix: str) -> DataFrame:
        c = KConsumer(
            host=root, topic=topic, from_offset="earliest",
            schema="user_id long, event_id long, ts_us long", transport="topiclog",
        )
        return (
            c.stream(spark)
            .select(
                F.col("value.user_id").alias(f"{prefix}_user"),
                F.col("value.event_id").alias(f"{prefix}_id"),
                F.timestamp_micros(F.col("value.ts_us")).alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    joined = side("purchases", "p").join(
        side("errors", "e"),
        F.expr("p_user = e_user AND e_ts BETWEEN p_ts - interval 1 hour AND p_ts"),
        "inner",
    )
    name = "q187_pairs"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.col("p_user").alias("user_id"),
        "p_id",
        "e_id",
        (F.unix_micros("p_ts") - F.unix_micros("e_ts")).cast("bigint").alias("delta_us"),
    )


# ------------------------------------- stream-static join (T6)
@query(
    "q188_stream_static_join",
    oracle="""
WITH d AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS user_total
           FROM events GROUP BY user_id)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(d.user_total) AS BIGINT) AS sum_user_total
FROM events e JOIN d ON e.user_id = d.user_id
GROUP BY e.event_type
""",
    tags=("T6", "S1", "T-streaming"),
)
def q188_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment THROUGH the transport (T6's second half in
    the oracle tier): the full event stream is produced to a topiclog
    topic (distributed write_batch), streamed back, and every micro-batch
    is enriched against a STATIC per-user dimension under a broadcast
    hint — the stateless lookup-table join (map-side, re-planned per
    micro-batch, no shuffle of the stream) that backs every streaming
    enrichment pipeline. The per-type rollup of the enriched stream must
    equal the relational oracle."""
    import tempfile

    from rdkafka_streams_spark.streaming import KConsumer, KProducer, TopicLog

    root = tempfile.mkdtemp(prefix="q188_bus")
    ck = tempfile.mkdtemp(prefix="q188_ck")
    log = TopicLog(root)
    log.create_topic("ev", partitions=4)
    ev = load_table(spark, sf_dir, "events")
    KProducer(host=root, topic="ev", transport="topiclog").write_batch(
        ev.select("event_id", "user_id", "event_type")
    )
    static_dim = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("user_total")
    )
    c = KConsumer(
        host=root, topic="ev", from_offset="earliest",
        schema="event_id long, user_id long, event_type string",
        transport="topiclog",
    )
    enriched = (
        c.stream(spark)
        .select("value.event_id", "value.user_id", "value.event_type")
        .join(F.broadcast(static_dim), "user_id")
    )
    name = "q188_enriched"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("user_total").cast("bigint").alias("sum_user_total"),
    )


# ------------------------------- idempotent-sink replay (T8/F6)
@query(
    "q189_idempotent_replay",
    oracle="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY user_id
""",
    tags=("T8", "F6", "S1", "T-streaming"),
)
def q189_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery semantics (T8) in the oracle tier: the event stream is
    consumed from the transport TWICE — a full run, then a full replay
    from a fresh checkpoint — through the idempotent per-batch-overwrite
    sink (streaming/sinks.py: each micro-batch owns its batch_id=<n>
    directory, replays replace instead of duplicate). Offset planning is
    deterministic (earliest + fixed per-trigger cap), so the replay
    regenerates the same (batch_id, data) pairs and the sink must equal
    ONE copy of the input — the at-least-once → effectively-exactly-once
    upgrade the reference's delivery callback cannot express
    (src/Producer.coffee:87 fires on enqueue). The per-user rollup of
    the sink must equal the relational oracle."""
    import tempfile

    from rdkafka_streams_spark.streaming import KConsumer, KProducer, TopicLog
    from rdkafka_streams_spark.streaming.sinks import foreach_batch_overwrite

    root = tempfile.mkdtemp(prefix="q189_bus")
    sink = tempfile.mkdtemp(prefix="q189_sink")
    log = TopicLog(root)
    log.create_topic("ev", partitions=4)
    seed = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    KProducer(host=root, topic="ev", transport="topiclog").write_batch(seed)

    def run() -> None:
        from rdkafka_streams_spark.streaming import shutdown

        c = KConsumer(
            host=root, topic="ev", from_offset="earliest",
            schema="event_id long, user_id long, cents long",
            transport="topiclog", batch_size=1024,
        )
        dec = c.stream(spark).select(
            "value.event_id", "value.user_id", "value.cents"
        )
        # processingTime + processAllAvailable (not availableNow): the
        # per-trigger cap must keep planning batches until caught up, so
        # both runs produce the identical [k*1024, (k+1)*1024) splits
        q = foreach_batch_overwrite(
            dec, sink, tempfile.mkdtemp(prefix="q189_ck"),
            trigger_available_now=False,
        )
        q.processAllAvailable()
        shutdown(q, 60)

    run()
    run()  # full replay: same batch ids, overwrite → zero duplicates
    out = spark.read.parquet(sink)
    return out.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# ------------------------------------- cohort retention (E24/E10)
@query(
    "q190_cohort_retention",
    oracle="""
WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cohort_week,
             (epoch_us(date_trunc('week', e.ts)) - epoch_us(f.cohort_week))
               // 604800000000 AS week_offset
      FROM events e JOIN f ON e.user_id = f.user_id)
SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM a GROUP BY cohort_week, week_offset
""",
    tags=("E24", "E10", "T-analytics"),
)
def q190_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, activity counted per whole weeks elapsed — the product
    analytics staple. Week arithmetic is integer-exact (both engines
    truncate to Monday and the offset is a µs difference div one week).
    Scale shape: first-event agg (user-keyed), join back, then the
    DISTINCT (user, cohort, offset) reduction BEFORE the cell count —
    the exact two-phase form of COUNT(DISTINCT) that spreads the
    distinct across the cluster instead of widening one agg's state."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    a = (
        ev.join(f, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "(unix_micros(date_trunc('week', ts)) - unix_micros(cohort_week))"
                " div 604800000000"
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return a.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("bigint").alias("active_users")
    )


# ------------------------------------- RFM segmentation (E11/X3)
@query(
    "q192_rfm_segments",
    oracle="""
WITH m AS (SELECT user_id,
                  MAX(epoch_us(ts)) AS last_us,
                  CAST(COUNT(*) AS BIGINT) AS freq,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                    AS monetary
           FROM events GROUP BY user_id),
q AS (SELECT user_id,
             NTILE(5) OVER (ORDER BY last_us DESC, user_id) AS r_q,
             NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_q,
             NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_q,
             monetary
      FROM m)
SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary) AS BIGINT) AS sum_monetary
FROM q GROUP BY r_q, f_q, m_q
""",
    tags=("E11", "X3", "T-analytics"),
)
def q192_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation — the
    classic CRM cut. Each dimension is an EXACT NTILE(5), computed at
    scale by replicating NTILE's bucket arithmetic on top of
    operators/ranking.global_rank (range partition + parallel local
    ranks): the first n%5 buckets take ceil(n/5) rows, the rest take
    floor(n/5) — bit-identical to the oracle's partition-less NTILE
    without ever sorting the user universe in one task. The three
    dimensions rank as INDEPENDENT branches re-joined on user_id (flat
    plan depth — nesting them would re-evaluate the upstream agg 2^3
    times through global_rank's documented double-consumption). Ties
    break on user_id so every rank (and thus every bucket) is total."""
    from rdkafka_streams_spark.operators.ranking import global_rank

    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count("*").cast("bigint").alias("freq"),
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint").alias("monetary"),
    )
    n_df = m.agg(F.count("*").alias("__n"))

    def ntile5(metric: str, out: str, keep: list[str]) -> DataFrame:
        # NTILE(5) from an exact global rank: desc metric, user tiebreak
        ranked = global_rank(
            m.select("user_id", *keep, metric).withColumn("__neg", -F.col(metric)),
            ["__neg", "user_id"],
            rank_col="__rn",
        )
        return (
            ranked.crossJoin(F.broadcast(n_df))
            .withColumn(
                out,
                F.expr(
                    "cast(case when __rn <= (__n % 5) * ((__n div 5) + 1)"
                    " then (__rn - 1) div ((__n div 5) + 1)"
                    " else (__n % 5) + (__rn - (__n % 5) * ((__n div 5) + 1) - 1)"
                    "      div greatest(__n div 5, 1) end + 1 as bigint)"
                ),
            )
            .select("user_id", *keep, out)
        )

    q = (
        ntile5("last_us", "r_q", [])
        .join(ntile5("freq", "f_q", []), "user_id")
        .join(ntile5("monetary", "m_q", ["monetary"]), "user_id")
    )
    return q.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("monetary").cast("bigint").alias("sum_monetary"),
    )


# -------------------------------- pattern multi-topic subscribe (S5)
@query(
    "q193_multi_topic_pattern",
    oracle="""
SELECT 'ev_' || CAST(user_id % 3 AS VARCHAR) AS topic, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
""",
    tags=("S5", "S4", "S1", "T-streaming"),
)
def q193_multi_topic_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex multi-topic subscription (S5) in the oracle tier: events are
    sharded across THREE topics by user (distributed write_batch per
    shard), one consumer subscribes by PATTERN ``ev_.*`` from earliest
    (S4), and the per-(topic, type) rollup — the topic name read from
    the ENVELOPE, not the payload — must equal the oracle's derivation
    of the same sharding. Mirrors the reference's array-subscribe
    (src/Consumer.coffee:45 `asArray topic`) generalized to the pattern
    form the Kafka source offers."""
    import tempfile

    from rdkafka_streams_spark.streaming import KConsumer, KProducer, TopicLog, shutdown

    root = tempfile.mkdtemp(prefix="q193_bus")
    ck = tempfile.mkdtemp(prefix="q193_ck")
    log = TopicLog(root)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    for i in range(3):
        log.create_topic(f"ev_{i}", partitions=2)
        KProducer(host=root, topic=f"ev_{i}", transport="topiclog").write_batch(
            ev.where(F.col("user_id") % 3 == i).select("event_type", "cents")
        )
    c = KConsumer(
        host=root, topic="ev_.*", pattern=True, from_offset="earliest",
        schema="event_type string, cents long", transport="topiclog",
    )
    dec = c.stream(spark).select(
        "topic", "value.event_type", "value.cents"
    )
    name = "q193_sharded"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    q = (
        dec.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).groupBy("topic", "event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# ------------------------------------- session entry paths (T3/E12)
@query(
    "q194_session_paths",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged),
p AS (SELECT user_id, session_idx,
             list(event_type ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_idx)
SELECT array_to_string(path[1:3], '>') AS path3,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path3 HAVING COUNT(*) >= 5
""",
    tags=("T3", "E12", "T-analytics"),
)
def q194_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the first three event types of every session
    (q167's gaps-and-islands assignment) concatenated into an entry path,
    counted corpus-wide — the "how do users start" funnel-discovery view.
    Ordered collection is exact: collect_list of (ts, event_id, type)
    structs array_sorted then truncated, so the per-session path needs no
    second window pass; sessionize + collect share ONE user-keyed sort
    and the path count is a second small shuffle."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    new_session = (
        prev.isNull() | ((F.unix_timestamp("ts") - prev) > 1800)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(new_session).over(run).alias("session_idx"),
    )
    paths = sess.groupBy("user_id", "session_idx").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    1,
                    3,
                ),
                lambda s: s.getField("event_type"),
            ),
        ).alias("path3")
    )
    return (
        paths.groupBy("path3")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .where(F.col("n_sessions") >= 5)
    )


# --------------------------------- point-in-time SCD2 lookup (X7/E9)
@query(
    "q196_pit_lookup",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type),
versions AS (
  SELECT user_id, event_type, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM chg),
nz AS (SELECT * FROM versions WHERE valid_to IS NULL OR valid_to > valid_from),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
j AS (SELECT p.event_id, v.event_type AS prior_state, v.valid_from,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.valid_from DESC NULLS LAST) AS rn
      FROM p LEFT JOIN nz v
        ON p.user_id = v.user_id AND v.valid_from < p.ts)
SELECT event_id, prior_state,
       CAST(epoch_us(valid_from) AS BIGINT) AS state_since_us
FROM j WHERE rn = 1
""",
    tags=("X7", "E9", "T-analytics"),
)
def q196_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the warehouse op SCD2 exists FOR:
    every purchase is joined to the user-state version that was valid
    strictly before it (what state was the user in when they bought).
    Composition of two shipped operators: cdc.scd2_build produces the
    interval dimension (zero-length versions dropped — a version
    superseded in the same instant was never observable), then
    operators/asof.asof_join attaches the latest prior version in ONE
    union + user-keyed window sort — never the interval range join whose
    candidate count is O(|fact|·|versions-per-user|). The oracle derives
    the same lookup relationally with a rank over the interval table."""
    from rdkafka_streams_spark.operators.asof import asof_join
    from rdkafka_streams_spark.operators.cdc import scd2_build

    ev = load_table(spark, sf_dir, "events")
    versions = scd2_build(
        ev, key="user_id", ts="ts", attrs=["event_type"], tiebreak="event_id"
    ).where(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        purchases,
        versions.select("user_id", "event_type", "valid_from"),
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        payload=["event_type"],
        strict=True,
    )
    return j.select(
        "event_id",
        F.col("event_type_asof").alias("prior_state"),
        F.unix_micros("valid_from_asof").cast("bigint").alias("state_since_us"),
    )


# --------------------------------- co-purchase degree histogram (E10)
@query(
    "q197_degree_histogram",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS degree FROM (
          SELECT a AS part FROM pairs UNION ALL SELECT b FROM pairs)
        s(part) GROUP BY part)
SELECT CAST(floor(log2(degree)) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(degree) AS BIGINT) AS min_degree,
       CAST(MAX(degree) AS BIGINT) AS max_degree
FROM deg GROUP BY bin
""",
    tags=("E10", "X12", "T-analytics"),
)
def q197_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-binned degree distribution of the co-purchase graph — the
    power-law sanity check run before any graph algorithm (it predicts
    whether skew salting / hub capping will be needed). Pair generation
    is q186's map-side basket expansion (never an items self-join);
    degree = distinct-partner count via one symmetric union + aggregate.
    floor(log2) on exact integers is boundary-safe: powers of two are
    exact in double, non-powers never land on an integer."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "parts",
                        lambda a, i: F.transform(
                            F.slice(
                                "parts", i + 2,
                                F.greatest(F.size("parts") - i - 1, F.lit(0)),
                            ),
                            lambda b: F.struct(a.alias("a"), b.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("part"))
        .unionAll(pairs.select(F.col("b").alias("part")))
        .groupBy("part")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return deg.groupBy(
        F.floor(F.log2("degree")).cast("bigint").alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.min("degree").cast("bigint").alias("min_degree"),
        F.max("degree").cast("bigint").alias("max_degree"),
    )


# ------------------------------------- JSONL source round-trip (S7)
@query(
    "q198_jsonl_roundtrip",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
""",
    tags=("S7", "R3", "R4", "T-analytics"),
)
def q198_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-delimited-JSON source/sink round-trip (S7 beyond parquet):
    events are written to a JSONL dataset and read back with an EXPLICIT
    schema — no inference pass, so the read plans a single scan exactly
    like the production path for JSON feeds (the reference's record
    format is JSON lines over the wire; this is the at-rest equivalent).
    The rollup of the round-tripped data must match the oracle on the
    original table — proving the encode/decode loses nothing."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="q198_jsonl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    ev.write.mode("overwrite").json(tmp)
    back = spark.read.schema("event_id long, event_type string, cents long").json(tmp)
    return back.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# ----------------------------- supplier reliability Wilson LB (E11/E3)
@query(
    "q199_supplier_reliability",
    oracle="""
WITH f AS (SELECT l_suppkey,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS BIGINT) AS r
           FROM lineitem GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, f.n AS n_lines, f.r AS n_returns,
       ROUND((r * 1.0 / n + 3.8416 / (2 * n)
              - 1.96 * sqrt((r * 1.0 / n * (1 - r * 1.0 / n)
                             + 3.8416 / (4 * n)) / n))
             / (1 + 3.8416 / n), 6) AS wilson_lb
FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
WHERE f.n >= 20
""",
    tags=("E11", "E3", "T-analytics"),
)
def q199_supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier return-rate ranking by the Wilson score LOWER bound — the
    estimator that stops a 2-observation supplier from outranking a
    2000-observation one (what naive rate sorting gets wrong). Counts
    reduce exactly per supplier (one partial-agg shuffle of two integers
    each); the bound is evaluated once per supplier from identical int64
    inputs with a textually identical formula in both engines (z = 1.96,
    z² inlined), so the rounded doubles agree bit-for-bit — the
    q143/q148 float-parity discipline. Supplier dim joins broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    f = li.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint").alias("r"),
    ).where(F.col("n") >= 20)
    return (
        f.join(F.broadcast(s.select("s_suppkey", "s_name")),
               f.l_suppkey == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n").alias("n_lines"),
            F.col("r").alias("n_returns"),
            # double literals (3.8416D): Spark parses bare decimal literals
            # as DECIMAL and its scaled division would diverge from the
            # oracle's double math in the 5th decimal
            F.expr(
                "round((cast(r as double) / n + 3.8416D / (2 * n)"
                " - 1.96D * sqrt((cast(r as double) / n * (1D - cast(r as double) / n)"
                " + 3.8416D / (4 * n)) / n))"
                " / (1D + 3.8416D / n), 6)"
            ).alias("wilson_lb"),
        )
    )


# ------------------------------------------------------------ layout (X8)
_HILBERT_BITS = 8


def _hilbert_oracle_ctes(x_expr: str, y_expr: str,
                         src: str = "events") -> str:
    """Unrolled Hilbert xy2d walk (operators/zorder.py hilbert_key) as
    CTE stages hl0..hl{bits}: per level at scale s, quadrant (rx, ry)
    adds s²·xor(3rx, ry) and the frame rotates (ry=0 ∧ rx=1 → reflect
    both then swap; ry=0 → swap; ry=1 → unchanged) — generated from the
    SAME level list as the Spark fold so the two cannot drift."""
    parts = [f"""hl0 AS (
  SELECT event_id, {x_expr} AS xb, {y_expr} AS yb,
         {x_expr} AS x, {y_expr} AS y, CAST(0 AS BIGINT) AS d
  FROM {src})"""]
    for j, k in enumerate(range(_HILBERT_BITS - 1, -1, -1), start=1):
        s = 2 ** k
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(f"""hl{j} AS (
  SELECT event_id, xb, yb,
    CASE WHEN {ry} = 0 THEN
      CASE WHEN {rx} = 1 THEN {s} - 1 - y ELSE y END
    ELSE x END AS x,
    CASE WHEN {ry} = 0 THEN
      CASE WHEN {rx} = 1 THEN {s} - 1 - x ELSE x END
    ELSE y END AS y,
    d + {s * s} * xor(3 * {rx}, {ry}) AS d
  FROM hl{j - 1})""")
    return ",\n".join(parts)


@query(
    "q340_hilbert_key",
    oracle="WITH " + _hilbert_oracle_ctes(
        "user_id % 256",
        "CAST(json_extract_string(props, '$.k') AS BIGINT) % 256",
    ) + f"""
SELECT event_id, CAST(xb AS BIGINT) AS xb, CAST(yb AS BIGINT) AS yb,
       CAST(d AS BIGINT) AS hkey
FROM hl{_HILBERT_BITS}
""",
    tags=("X8", "E25"),
)
def q340_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert clustering key over q109's two event dimensions
    (operators/zorder.py hilbert_key) — X8's better half: Morton keys
    jump diagonally between quadrants, so equal-size chunks of the
    sorted order cover loose (x, y) rectangles; the Hilbert curve
    finishes each quadrant before leaving it, and the q341 duel
    measures ~2x tighter chunk bounding boxes and fewer candidate
    chunks on the same fixture and chunk size. The walk is the classic
    per-level rotate/reflect xy2d, ONE aggregate fold over the literal
    level array (pure integer bit arithmetic in whole-stage codegen —
    no UDF, no join, no shuffle); the oracle unrolls the same 8 levels
    as CTE stages, so every per-row key is value-hash-checked.
    Bijectivity at 4 bits and equality with an independent Python xy2d
    are unit-pinned."""
    from rdkafka_streams_spark.operators.zorder import hilbert_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("xb"),
        (F.get_json_object("props", "$.k").cast("long") % 256).alias("yb"),
    )
    return ev.select(
        "event_id", F.col("xb").cast("bigint").alias("xb"),
        F.col("yb").cast("bigint").alias("yb"),
        hilbert_key("xb", "yb", bits=_HILBERT_BITS).alias("hkey"),
    )
