"""Behavioral / product-analytics operators over the event stream: ordered
funnels, first-path mining, retention cohorts.

These are the queries an events table exists for, and each has a classic
scale trap this module avoids: funnels planned as k self-joins (k fact
shuffles, hot-user skew), path mining via per-user sorts of the whole
history (collect only the bounded prefix), cohort retention as a fact⋈fact
join (join on the already-aggregated per-user frame, co-partitioned with
the activity agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------- funnel (E10/E27)
@query(
    "q130_funnel_steps",
    oracle="""
WITH pu AS (
  SELECT user_id,
         list(epoch_us(ts)) FILTER (WHERE event_type = 'signup')   AS l0,
         list(epoch_us(ts)) FILTER (WHERE event_type = 'view')     AS l1,
         list(epoch_us(ts)) FILTER (WHERE event_type = 'click')    AS l2,
         list(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS l3
  FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
  GROUP BY user_id),
s0 AS (SELECT user_id, l1, l2, l3, list_min(l0) AS t0 FROM pu),
s1 AS (SELECT user_id, l2, l3, t0,
              CASE WHEN t0 IS NOT NULL
                   THEN list_min(list_filter(l1, x -> x > t0)) END AS t1 FROM s0),
s2 AS (SELECT user_id, l3, t0, t1,
              CASE WHEN t1 IS NOT NULL
                   THEN list_min(list_filter(l2, x -> x > t1)) END AS t2 FROM s1),
s3 AS (SELECT user_id, t0, t1, t2,
              CASE WHEN t2 IS NOT NULL
                   THEN list_min(list_filter(l3, x -> x > t2)) END AS t3 FROM s2),
d AS (SELECT CAST(t0 IS NOT NULL AS INT) + CAST(t1 IS NOT NULL AS INT)
           + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT) AS depth
      FROM s3),
h AS (SELECT depth, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY depth),
s AS (SELECT * FROM (VALUES (1, 'signup'), (2, 'view'), (3, 'click'), (4, 'purchase'))
      AS v(step, step_name))
SELECT s.step, s.step_name, CAST(COALESCE(SUM(h.n), 0) AS BIGINT) AS n_users
FROM s LEFT JOIN h ON h.depth >= s.step
GROUP BY s.step, s.step_name
""",
    tags=("E10", "E27", "T-analytics"),
)
def q130_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup→view→click→purchase
    (operators/funnel.py): ONE groupBy(user) collects per-step timestamp
    arrays, then higher-order `array_min(filter(ts, t > t_prev))` resolves
    the chained earliest-occurrence-after-previous-step — versus the naive
    k-way self-join (k fact shuffles + hot-user skew). Step k counts users
    whose k-prefix occurs in strict time order."""
    from rdkafka_streams_spark.operators.funnel import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(
        ev, "user_id", "event_type", "ts", ["signup", "view", "click", "purchase"]
    )


# ------------------------------------------------------- first paths (E19)
@query(
    "q139_first_path_trigrams",
    oracle="""
WITH r AS (SELECT user_id, event_type, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id HAVING COUNT(*) = 3)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
""",
    tags=("E19", "E27", "T-analytics"),
)
def q139_first_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each user's first three actions ("first path"
    mining): rank window keeps only the 3-event prefix BEFORE grouping, so
    per-user state is bounded regardless of history length; the path
    groupBy reuses the user partitioning (no extra exchange). Tiebreak on
    event_id makes the prefix total-ordered and engine-independent."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pre = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )
    paths = (
        pre.groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("rn", "event_type"))).alias("a"),
            F.count("*").alias("k"),
        )
        .where(F.col("k") == 3)
        .select(
            F.concat_ws(">", F.transform("a", lambda x: x["event_type"])).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count("*").cast("bigint").alias("n_users"))


# -------------------------------------------------------- cohorts (E10/E24)
@query(
    "q140_retention_cohorts",
    oracle="""
WITH f AS (SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events)
SELECT CAST(f.cohort AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', f.cohort, a.wk) // 7 AS BIGINT) AS week_index,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY f.cohort, date_diff('day', f.cohort, a.wk) // 7
""",
    tags=("E10", "E24", "T-analytics"),
)
def q140_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = user's first active ISO week,
    counted again in each later active week. Both inputs reduce on user_id
    FIRST (first-week agg; distinct user-weeks) so the join moves per-user
    rows, not raw events, and shares one hash partitioning on user_id —
    Catalyst plans it without a third exchange. The week_index subtraction
    is integer day arithmetic (no tz, engine-independent)."""
    ev = _t(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts").cast("date")
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    active = ev.select("user_id", wk.alias("wk")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.col("cohort").cast("string").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("bigint").alias("week_index"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
