"""Table-maintenance operators for the 100 TB layout: compaction planning,
incremental rollup maintenance, zonemap data skipping.

These run against *metadata-scale* or *pre-aggregated* inputs by
construction — the defining property of maintenance work at 100 TB is that
it must not re-read the table. The fixtures stand in for the metadata
tables (part = a file listing; orders shards = two ingest batches)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.functions.money import money
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------- compaction plan (X)
@query(
    "q133_compaction_plan",
    oracle="""
WITH files AS (
  SELECT p_brand AS dir, p_partkey AS file_id,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS bytes
  FROM part),
o AS (
  SELECT dir, file_id, bytes,
         COALESCE(SUM(bytes) OVER (PARTITION BY dir ORDER BY file_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start_offset
  FROM files)
SELECT dir, CAST(start_offset // 1000000 AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes
FROM o GROUP BY dir, start_offset // 1000000
""",
    tags=("X-scale", "E21"),
)
def q133_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan (operators/binpack.py): per directory,
    files map to ~target-byte rewrite bins by their running byte offset
    (offset div target) — contiguous in file order (preserves clustering),
    bin count ≤ ceil(dir_bytes/target). Planning runs on the file-listing
    metadata only (1 row per file; here part stands in: dir=brand,
    bytes=price cents, target 1 MB), windowed per directory so no global
    single-partition sort exists."""
    from rdkafka_streams_spark.operators.binpack import plan_compaction_bins, summarize_bins

    files = _t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("dir"),
        F.col("p_partkey").alias("file_id"),
        (money("p_retailprice") * 100).cast("bigint").alias("bytes"),
    )
    plan = plan_compaction_bins(files, "dir", "file_id", "bytes", 1_000_000)
    return summarize_bins(plan, "dir")


# ------------------------------------------------- rollup maintenance (E10)
@query(
    "q134_rollup_merge",
    oracle="""
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
       CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS max_cents
FROM orders GROUP BY date_trunc('month', o_orderdate)
""",
    tags=("E10", "X-scale"),
)
def q134_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the monthly summary is kept as
    algebraic state (count/sum/min/max), each ingest batch reduces to its
    own partial state, and refresh = merging partials — count→sum,
    sum→sum, min→min, max→max — touching only summary rows, never
    re-scanning history. Here two hash-split shards of orders simulate
    two batches; the oracle aggregates the full table directly, proving
    merge(partials) ≡ recompute. (AVG decomposes via (sum, count); exact
    quantiles/distincts do not — that's q64's sketch territory.)"""
    o = _t(spark, sf_dir, "orders").select(
        F.trunc("o_orderdate", "month").cast("string").alias("month"),
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderkey"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").alias("cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    batch_a = partial(o.where(F.col("o_orderkey") % 2 == 0))
    batch_b = partial(o.where(F.col("o_orderkey") % 2 == 1))
    return (
        batch_a.unionByName(batch_b)
        .groupBy("month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
            F.min("min_cents").cast("bigint").alias("min_cents"),
            F.max("max_cents").cast("bigint").alias("max_cents"),
        )
    )


# ----------------------------------------------------- zonemap skip (X)
@query(
    "q135_zonemap_pruning",
    oracle="""
WITH p AS (SELECT o_orderkey // 4096 AS chunk,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM orders),
z AS (SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(cents) AS BIGINT) AS cents_lo,
             CAST(MAX(cents) AS BIGINT) AS cents_hi
      FROM p GROUP BY chunk)
SELECT chunk, n_rows, cents_lo, cents_hi,
       CASE WHEN cents_hi >= 25000000 AND cents_lo <= 30000000 THEN 1 ELSE 0 END AS candidate
FROM z
""",
    tags=("X-scale", "E10"),
)
def q135_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonemap build + pruning estimate (operators/zonemap.py): one
    partially-aggregated shuffle reduces each 4096-key chunk (a file
    stand-in) to (count, min, max); a planner then marks scan candidates
    for `totalprice ∈ [250k, 300k]` against stats only. With Z-order
    clustering (q109) upstream, `candidate=1` chunks shrink from ~all to
    ~range/keyspace — the zonemap is what turns clustering into skipped
    IO. Output is the zonemap itself (#chunks rows, data-size-free)."""
    from rdkafka_streams_spark.operators.zonemap import build_zonemap, prune_with_zonemap

    o = _t(spark, sf_dir, "orders").select(
        F.expr("o_orderkey div 4096").cast("bigint").alias("chunk"),
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    z = build_zonemap(o, "chunk", ["cents"])
    return prune_with_zonemap(z, "cents", 25_000_000, 30_000_000)


# ------------------------------------------- consistent hashing (X-scale)
@query(
    "q150_consistent_rebalance",
    oracle="""
WITH vn AS (
  SELECT s.range AS shard, v.range AS vnode,
         ('0x' || substring(md5(CAST(s.range AS VARCHAR) || ':' || CAST(v.range AS VARCHAR)),
                            1, 8))::BIGINT AS token
  FROM range(0, 9) s, range(0, 16) v),
k AS (SELECT o_orderkey AS key,
             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM orders),
a8 AS (
  SELECT key, shard FROM (
    SELECT k.key, vn.shard,
           ROW_NUMBER() OVER (PARTITION BY k.key ORDER BY
             CASE WHEN vn.token >= k.h THEN vn.token ELSE vn.token + 4294967296 END,
             vn.shard, vn.vnode) AS rn
    FROM k JOIN vn ON vn.shard < 8) WHERE rn = 1),
a9 AS (
  SELECT key, shard FROM (
    SELECT k.key, vn.shard,
           ROW_NUMBER() OVER (PARTITION BY k.key ORDER BY
             CASE WHEN vn.token >= k.h THEN vn.token ELSE vn.token + 4294967296 END,
             vn.shard, vn.vnode) AS rn
    FROM k JOIN vn ON vn.shard < 9) WHERE rn = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN a8.shard <> a9.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       CAST(SUM(CASE WHEN a8.shard <> a9.shard THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS moved_ppm
FROM a8 JOIN a9 USING (key)
""",
    tags=("X-scale", "E10"),
)
def q150_consistent_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring rebalancing plan: assign every key to a shard
    on a 16-vnode-per-shard md5 ring at 8 shards and again at 9, and
    measure the moved fraction — the property that makes consistent
    hashing THE resharding strategy (≈1/(n+1) of keys move, vs ~100% for
    mod-n). The ring (144 vnodes) broadcasts; assignment is a per-key
    min-over-ring (successor vnode, wrapping) — map-side, no shuffle of
    the key table beyond the final count. Token/key hashes are the
    hex-prefix-of-md5 uint32 both engines reproduce bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    keys = o.select(
        F.col("o_orderkey").alias("key"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    spark_ = o.sparkSession
    vn = (
        spark_.range(0, 9).select(F.col("id").alias("shard"))
        .crossJoin(spark_.range(0, 16).select(F.col("id").alias("vnode")))
        .select(
            "shard",
            "vnode",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("shard"), F.col("vnode"))), 1, 8
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("token"),
        )
    )

    def assign(n_shards: int, out: str):
        ring = vn.where(F.col("shard") < n_shards)
        adj = F.when(F.col("token") >= F.col("h"), F.col("token")).otherwise(
            F.col("token") + 4294967296
        )
        return (
            keys.join(F.broadcast(ring))
            .select("key", adj.alias("adj"), "shard", "vnode")
            .groupBy("key")
            .agg(F.min(F.struct("adj", "shard", "vnode")).alias("m"))
            .select("key", F.col("m.shard").alias(out))
        )

    a8 = assign(8, "s8")
    a9 = assign(9, "s9")
    moved = F.sum((F.col("s8") != F.col("s9")).cast("int")).cast("bigint")
    return (
        a8.join(a9, "key")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            moved.alias("n_moved"),
        )
        .select(
            "n_keys",
            "n_moved",
            F.expr("n_moved * 1000000 div n_keys").cast("bigint").alias("moved_ppm"),
        )
    )


# ----------------------------------------------------- skew audit (X2/E10)
@query(
    "q158_skew_audit",
    oracle="""
WITH k AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY l_orderkey),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM k),
h AS (SELECT CAST(COUNT(*) AS BIGINT) AS hot_keys
      FROM k CROSS JOIN s WHERE k.cnt * s.n_keys > 10 * s.total_rows)
SELECT s.n_keys, s.total_rows, s.max_cnt,
       CAST(s.total_rows * 1000000 // s.n_keys AS BIGINT) AS mean_cnt_micro,
       CAST(s.max_cnt * s.n_keys * 1000000 // s.total_rows AS BIGINT) AS skew_ppm,
       h.hot_keys
FROM s CROSS JOIN h
""",
    tags=("X2", "E10"),
)
def q158_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit for lineitem.l_orderkey — the measurement that
    decides between a plain shuffle join, AQE skew splitting, and the
    explicit salted join (operators/skew.py, q70). One key-count shuffle
    (map-side combined), one 1-row reduction; skew_ppm = max/mean in
    ppm and hot_keys counts keys >10× the mean — exact integers, no
    quantile sketches, so the audit itself is shuffle-cheap at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").cast("bigint").alias("cnt"))
    s = k.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    h = (
        k.crossJoin(F.broadcast(s))
        .where(F.col("cnt") * F.col("n_keys") > 10 * F.col("total_rows"))
        .agg(F.count("*").cast("bigint").alias("hot_keys"))
    )
    return s.crossJoin(h).select(
        "n_keys",
        "total_rows",
        "max_cnt",
        F.expr("total_rows * 1000000 div n_keys").cast("bigint").alias("mean_cnt_micro"),
        F.expr("max_cnt * n_keys * 1000000 div total_rows").cast("bigint").alias("skew_ppm"),
        "hot_keys",
    )


# ------------------------------------------- bloom-pruned join (X14/E3)
@query(
    "q159_bloom_pruned_join",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2)
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
""",
    tags=("X14", "E3"),
)
def q159_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of urgent-order line items, with the fact side pruned by a
    Bloom bit-vector of the filtered orders BEFORE the join shuffle
    (operators/bloomjoin.py): the filter is an m/64-row (word, bits)
    frame — broadcastable at ANY build-side key count, unlike an exact
    key broadcast — probed map-side with xxhash64/pmod/bit tests. False
    positives are killed by the real join, so the result is exactly the
    oracle's plain join; what changes at 100 TB is the shuffle, which
    carries ~fpp of the non-matching fact rows instead of all of them."""
    from rdkafka_streams_spark.operators.bloomjoin import bloom_build, bloom_prune

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom = bloom_build(urgent, "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", bloom)
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    return (
        pruned.join(urgent, pruned["l_orderkey"] == urgent["o_orderkey"])
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(
                F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast("double"), 2
            ).alias("revenue"),
        )
    )


# ------------------------------------------------- layout duel (X8/X-scale)
_DUEL_CHUNK = 256           # rows per chunk (an equal-size file stand-in)
_DUEL_BOX = (64, 95)        # the box query: xb AND yb in [64, 95]


def _duel_morton_sql(x: str, y: str, bits: int = 8) -> str:
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


def _duel_oracle() -> str:
    from rdkafka_streams_spark.queries.analytics import (
        _HILBERT_BITS,
        _hilbert_oracle_ctes,
    )

    lo, hi = _DUEL_BOX
    return f"""
WITH pts AS MATERIALIZED (
  SELECT event_id,
    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT AS xb,
    ('0x' || substring(md5(CAST(CAST(json_extract_string(props, '$.k')
         AS BIGINT) AS VARCHAR)), 1, 2))::BIGINT AS yb
  FROM events),
{_hilbert_oracle_ctes('xb', 'yb', src='pts')},
keyed AS (
  SELECT 'morton' AS layout, event_id, xb, yb,
         {_duel_morton_sql('xb', 'yb')} AS key FROM pts
  UNION ALL
  SELECT 'hilbert' AS layout, event_id, xb, yb, d AS key
  FROM hl{_HILBERT_BITS}),
ranked AS (
  SELECT layout, xb, yb,
    ROW_NUMBER() OVER (PARTITION BY layout ORDER BY key, event_id) AS rn
  FROM keyed),
ch AS (
  SELECT layout, (rn - 1) // {_DUEL_CHUNK} AS chunk,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(xb) AS xlo, MAX(xb) AS xhi, MIN(yb) AS ylo, MAX(yb) AS yhi
  FROM ranked GROUP BY layout, chunk),
marked AS (
  SELECT *, CASE WHEN xhi >= {lo} AND xlo <= {hi}
                  AND yhi >= {lo} AND ylo <= {hi}
            THEN 1 ELSE 0 END AS cand
  FROM ch)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(cand) AS BIGINT) AS n_candidates,
       CAST(COALESCE(SUM(CASE WHEN cand = 1 THEN n END), 0) AS BIGINT)
         AS rows_scanned,
       CAST(SUM((xhi - xlo + 1) * (yhi - ylo + 1)) AS BIGINT)
         AS total_span
FROM marked GROUP BY layout
"""


@query("q341_layout_pruning_duel", oracle=_duel_oracle(),
       tags=("X8", "X-scale"))
def q341_layout_pruning_duel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MORTON vs HILBERT PRUNING DUEL (operators/zorder.py morton_key /
    hilbert_key + the q135 zonemap estimate, on the SAME fixture, same
    equal-size chunks, same box query): events get two uniform md5
    dimensions, each layout sorts by its key (exact global order via
    global_rank — no single-task window), equal 256-row chunks stand in
    for files, a zonemap reduces each chunk to (count, min/max per dim),
    and the planner marks candidates for the box xb,yb ∈ [64, 95]. One
    summary row per layout — chunk count (equal by construction),
    candidate chunks, rows behind them, and the summed bounding-box
    area (the chunk-span locality measure): Hilbert's no-diagonal-jump
    property shows up as ~2x tighter spans and strictly fewer candidate
    chunks, value-hash-checked rather than asserted from folklore.
    Scale: two ranked passes over the fact table (each the two-job
    prefix pattern) + one partial-agg zonemap shuffle per layout; the
    zonemap itself is #chunks rows — metadata."""
    from rdkafka_streams_spark.operators.ranking import global_rank
    from rdkafka_streams_spark.operators.zorder import hilbert_key, morton_key

    lo, hi = _DUEL_BOX
    pts = _t(spark, sf_dir, "events").select(
        "event_id",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 2),
               16, 10).cast("long").alias("xb"),
        F.conv(F.substring(F.md5(F.get_json_object("props", "$.k")
                                 .cast("long").cast("string")), 1, 2),
               16, 10).cast("long").alias("yb"),
    )
    out = None
    for layout, key in (
        ("morton", morton_key("xb", "yb", bits=8)),
        ("hilbert", hilbert_key("xb", "yb", bits=8)),
    ):
        ranked = global_rank(
            pts.withColumn("key", key), ["key", "event_id"], rank_col="rn"
        ).withColumn("chunk", F.expr(f"(rn - 1) div {_DUEL_CHUNK}"))
        ch = ranked.groupBy("chunk").agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("xb").alias("xlo"), F.max("xb").alias("xhi"),
            F.min("yb").alias("ylo"), F.max("yb").alias("yhi"),
        )
        cand = (
            (F.col("xhi") >= lo) & (F.col("xlo") <= hi)
            & (F.col("yhi") >= lo) & (F.col("ylo") <= hi)
        ).cast("int")
        summary = ch.withColumn("cand", cand).agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum("cand").cast("bigint").alias("n_candidates"),
            F.coalesce(
                F.sum(F.when(F.col("cand") == 1, F.col("n"))), F.lit(0)
            ).cast("bigint").alias("rows_scanned"),
            F.sum(
                (F.col("xhi") - F.col("xlo") + 1)
                * (F.col("yhi") - F.col("ylo") + 1)
            ).cast("bigint").alias("total_span"),
        )
        out = summary if out is None else out.unionByName(summary)
    return out
