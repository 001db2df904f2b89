"""Plan-shape assertions: the scale properties that survive a 100× scale-up,
verified at the physical-plan level (wall-clock at sf0.001 proves nothing;
shuffle counts and pushdown do)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.core.plan import (
    count_exchanges,
    count_key_exchanges,
    has_broadcast_join,
    has_operator,
    pushed_filters,
)
from rdkafka_streams_spark.operators.asof import asof_join
from rdkafka_streams_spark.queries import REGISTRY


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    df = REGISTRY["q01_pricing_summary"].fn(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf, f"shipdate filter not pushed: {pf}"


def test_q01_single_agg_shuffle(spark, sf_dir):
    # partial agg → 1 exchange → final agg; the sort for orderBy adds 1 more.
    df = REGISTRY["q01_pricing_summary"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_q11_broadcasts_dimension(spark, sf_dir):
    df = REGISTRY["q11_broadcast_join"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    # fact side never shuffles for the join; only the groupBy exchanges.
    assert count_exchanges(df) <= 1


def test_q12_star_join_single_shuffle_join(spark, sf_dir):
    df = REGISTRY["q12_revenue_by_nation"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    # lineitem⋈orders (2 exchanges) + final agg (1); dims must add none.
    assert count_exchanges(df) <= 3


def test_q21_topk_uses_bounded_heap(spark, sf_dir):
    df = REGISTRY["q21_top_k"].fn(spark, sf_dir)
    assert has_operator(df, "TakeOrderedAndProject")


def test_asof_join_single_shuffle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts", payload=["value"])
    # union + one window = exactly one shuffle on the key
    assert count_exchanges(out) == 1


def test_whole_stage_codegen_on_scalar_queries(spark, sf_dir):
    # "*(n)" prefixes mark WholeStageCodegen stages in simple explain mode.
    # (Higher-order-function queries like q30 run interpreted-but-JVM-side —
    # lambdas are not codegen-fused by design.)
    from rdkafka_streams_spark.core.plan import plan_string

    for name in ("q26_string_funcs", "q28_math_funcs", "q29_conditional"):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert "*(" in plan_string(df, "simple"), f"{name} fell out of codegen"


def test_new_ops_shuffle_budgets(spark, sf_dir):
    """Pin the shuffle budget of the round-2 operators — a plan regression
    (lost broadcast, extra exchange) fails here long before it shows up as
    a wall-clock problem at scale."""
    budgets = {
        "q68_unpivot": 1,            # agg only; the melt is a projection
        "q69_gapfill_locf": 2,       # daily agg + LOCF window (calendar broadcasts)
        "q79_histogram": 1,          # partial agg → 12-key exchange
        "q80_rolling_time_window": 1,  # one (user) window sort
        "q74_retention_cohorts": 3,  # firstday agg + distinct + rollup
        "q88_chunking": 0,           # generate-and-explode only — no shuffle
        "q89_sequence_packing": 1,   # one running-sum window on the group key
        "q87_repetition_filter": 0,  # pure column expressions — no shuffle
        "q86_decontamination": 3,    # train postings + eval join + pair count
        # daily agg ×4 branches (no cross-branch reuse in Catalyst), peak
        # window, self-join sides, pair agg — persisting `daily` trades
        # these for one materialization at 100 TB (see q91 docstring)
        "q91_timeseries_allpairs": 11,
        "q94_quantized_topk": 1,     # queries broadcast; one top-k window sort
        # one explode scan; raw/tgt bucket counts + per-doc sum are the only
        # corpus-sized shuffles (≤4096-row partial aggs); totals are two
        # 1-row aggregates of the bucket counts; lr broadcast; target
        # membership is a pre-explode column, never a join
        "q95_dsir_weights": 7,
        "q96_bigram_lm": 5,          # bigram/context counts + NLL join + per-doc mean
        "q97_scd2_intervals": 1,     # compaction + interval windows share one key exchange
        "q98_quantile_trim": 1,      # rank + count windows share one per-lang exchange
        "q100_temperature_mixture": 4,  # group counts + quota bcast + per-group rank window
        "q101_span_coverage": 3,     # window-hash dfreq + coverage join + per-doc agg
        "q102_corpus_filter": 4,     # repetition map-only; spans (3) + final rollup
        # vocab count + global_rank id assignment (driver-side zipWithIndex
        # offsets, operators/ranking.py) + per-doc stats (vocab bcast)
        "q104_tokenize_encode": 4,
        "q105_skipgram_pairs": 1,    # map-only pair arrays; one pair-count agg
        "q106_pmi_collocations": 7,  # pair counts + two marginals + total (all small) + report join
        "q107_embedding_dim_stats": 1,  # posexplode + one 64-group agg
        "q108_pq_adc_topk": 1,       # encode map-only; queries bcast; one top-k window
        "q130_funnel_steps": 3,      # per-user collect + tiny depth hist + step join
        "q131_gini_concentration": 2,  # fact⋈customer agg + per-nation rank window
        "q132_winsorized_stats": 2,  # rank window + bounds-broadcast clamp agg
        "q133_compaction_plan": 1,   # one per-dir window over file metadata
        "q134_rollup_merge": 2,      # two shard partials merge on the month key
        "q135_zonemap_pruning": 1,   # one partial-agg chunk reduction
        "q137_char_entropy": 2,      # char counts + per-doc reduction, both on doc_id
        # pair explode map-side + pair agg + two singles equi-joins +
        # 1-row total broadcast; singles deliberately NOT force-broadcast
        # (unbounded in |parts| — AQE demotes when actually small)
        "q138_basket_affinity": 8,
        "q139_first_path_trigrams": 2,  # prefix window + path count (user key reused)
        "q140_retention_cohorts": 3, # first-week agg + distinct + cohort rollup
        "q141_mad_outliers": 4,      # two rank windows + two broadcast-join aggs
        "q142_ewma_decay": 1,        # ONE per-user window carries all 10 lags
        "q143_ab_ttest": 2,          # moment partial-agg + arm pivot join
        "q145_cusum_changepoint": 6, # daily agg branches + prefix window + argmax join
        "q146_scd2_pointintime": 2,  # change dedup window + one as-of union shuffle
        # fact table reduces eagerly into the local cell relation; these
        # are the tiny margin/df/contribution exchanges downstream of it
        "q147_chi_square": 7,
        "q148_benford_digits": 3,    # digit partial-agg + total broadcast
        "q149_embedding_whiten": 2,  # per-dim stats + per-vector reduction
        "q150_consistent_rebalance": 3,  # ring broadcast; per-key min + diff join
        "q151_weighted_median": 1,   # ONE per-flag cumulative-weight window
        "q152_stratified_split": 1,  # stratum window + agg share one (lang,source) exchange
        "q153_fuzzy_linkage": 3,     # variant explode map-side; candidate join + 2 distincts
        "q154_concurrent_load": 3,   # (type,day) local sweep + day agg + tiny per-type window
        "q155_corpus_divergence": 4, # token count + totals (1-row bcast) + final reduce
        # global_rank range exchange (zipWithIndex offsets are driver-side
        # literals) + bin agg + totals + WOE join
        "q157_woe_binning": 11,
        "q158_skew_audit": 6,        # key count + 1-row stats reused by hot-key screen
        "q159_bloom_pruned_join": 3, # bloom words bcast; fact stays unshuffled pre-join
        # per iteration: centroids broadcast (map-side dist) + argmin agg +
        # (cluster,dim) mean; 2 iterations + seed limit
        "q160_kmeans_clusters": 5,
        "q161_sentence_stats": 0,    # pure higher-order expressions, map-only
        "q162_source_overlap": 7,    # fp distinct + self-join + sizes bcast back
        "q163_twap": 1,              # ONE per-user lead window; agg co-partitioned
        "q164_resample_interp": 4,   # dedup window + bounds agg + union sweep window
        "q165_seasonal_anomaly": 3,  # daily agg + (type,dow) rank + median bcast join
        # signup agg + purchase join + global_rank range exchange +
        # broadcast count join
        "q166_time_to_convert": 8,
        "q167_session_summary": 1,   # sessionize + rollup share ONE (user) sort
        # pair gen + CC fixpoint residue + cluster argmax + audit joins
        "q168_dedup_pipeline": 8,
        # df-capped token join + ssq/doc + dot agg + two ssq joins + top-5
        "q169_sparse_cosine_join": 18,
        "q170_ks_test": 8,           # value agg + bucketed cumsum + offsets bcast
        "q171_theilsen_trend": 2,    # dedup + recent windows share the user key; pairs map-side
        "q172_transition_matrix": 5, # ONE user window + bigram count + row totals bcast
        "q173_daily_bands": 1,       # one per-day rank window; agg co-partitioned
        "q174_quantile_transform": 1,  # ONE (type,day) rank window
        "q175_embedding_dispersion": 2,  # (label,dim) moments + label rollup
        "q176_doc_keyterms": 6,      # tf counts + df join + per-doc top-5 window
        "q177_burst_detection": 2,   # hourly reduce + metadata-scale range window
        "q178_gap_stats": 1,         # lead window + agg share the user key
        "q182_max_drawdown": 1,      # cum + peak + final agg share ONE user sort
        "q183_clamped_balance": 1,   # single groupBy(user) Arrow grouped-map
        "q184_hampel_filter": 1,     # ONE ±3-row frame window per user
        "q185_activity_streaks": 2,  # day distinct + island rank share user key
        # basket expand + pair agg + sym union + two singles joins +
        # per-part top-3 window (same no-forced-broadcast posture as q138)
        "q186_related_items": 11,
        # first-event agg + join back + distinct + cell count
        "q190_cohort_retention": 3,
        # (tok,doc) agg + df window share the token key
        "q191_inverted_index": 2,
        # 3 INDEPENDENT ntile branches (one global_rank range exchange
        # each, zipWithIndex offsets) + 2 user-key joins + segment rollup
        "q192_rfm_segments": 16,
        # sessionize + ordered path collect share the user sort + path count
        "q194_session_paths": 2,
        # map-side 136-pair explode + (i,j) agg + 16-row marginal (bcast)
        "q195_embedding_covariance": 3,
        # scd2 window + asof union-carry share the user key
        "q196_pit_lookup": 2,
        # basket expand + pair distinct + degree agg + bin agg
        "q197_degree_histogram": 6,
        # jsonl write is side work; read rollup is ONE shuffle
        "q198_jsonl_roundtrip": 1,
        # per-supplier count agg + broadcast dim join
        "q199_supplier_reliability": 2,
        # pair stage/components materialize behind localCheckpoint; the
        # residual plan is one per-label rollup with the drop set broadcast
        "q200_semdedup": 1,
        # sketch build agg + 2 metadata-scale pack aggs (≤4096 rows) +
        # exact count of the candidate rows; the fact probe is a broadcast
        # map lookup, never a shuffle
        "q201_heavy_hitters": 4,
        # pruned scan + ONE type agg
        "q202_partitioned_scan": 1,
        # 1-row max-norm agg (broadcast) + one top-k window per query
        "q203_mips_topk": 2,
        # peel rounds materialize behind localCheckpoint; residual =
        # final core-degree agg
        "q204_kcore": 1,
        # map-side 16-way projection + stack; ONE 16-group agg
        "q205_jl_projection": 1,
        # dim broadcasts into the pruned fact scan; ONE type agg
        "q208_dpp_join": 1,
        # train bigram/context/vocab counts + left scoring joins + per-doc
        # agg + global_rank range exchange + bucket rollup
        "q211_perplexity_buckets": 11,
        # (type,bucket) bitmap agg + per-type sum of bucket counts
        "q212_bitmap_distinct": 2,
        # bucketed layout: the join adds NO exchange; only the rollup
        "q213_bucketed_join": 1,
        # customer dim broadcasts; lineitem⋈orders + agg share the
        # order-key exchange; TakeOrdered caps the top-10
        "q214_sql_api_tpch_q3": 1,
        # counter agg + per-source median rank window + tiny join
        "q215_dataset_card": 3,
        # decorrelated lateral = per-order ranked window; orders broadcast
        "q218_lateral_topn": 1,
        # csv write is side work; read rollup is ONE shuffle
        "q219_csv_roundtrip": 1,
        # mergeSchema read + ONE channel rollup
        "q220_schema_evolution": 1,
        # frontier rounds materialize behind localCheckpoint; final frame
        # is already reduced
        "q221_bfs_hops": 0,
        # daily sketch agg + monthly union + exact-distinct branch + join
        "q222_hll_merge_audit": 4,
        # one map-side md5 fold + per-type agg
        "q224_table_checksum": 1,
        # queries broadcast; one top-2 window per anchor
        "q229_hard_negatives": 1,
        # compaction is side work; the checksum is one map fold + agg
        "q230_compaction_rewrite": 1,
        # orc write is side work; read rollup is ONE shuffle
        "q231_orc_roundtrip": 1,
        # null-safe hash join (one side broadcast at this SF) + agg
        "q232_null_safe_join": 1,
        # one cogroup exchange per input side
        "q235_cogroup_reconcile": 2,
        # xml write is side work; nation broadcasts; ONE rollup shuffle
        "q236_xml_roundtrip": 1,
        # forward as-of: union + ONE reversed (key, ts) window sort
        "q243_asof_forward": 1,
        # phase-1 (group, salt) window + phase-2 re-rank of survivors
        "q244_topk_salted": 2,
        # map-only serialize+extract; distinct-count agg pair
        "q242_log_parse": 2,
        # edge labels materialize behind localCheckpoint; intra agg +
        # degree agg (intra broadcasts into the join)
        "q245_brand_modularity": 2,
        # one order-key exchange shared by all three delta joins + rollup
        "q246_join_view_delta": 1,
        # user-key candidate join + per-purchase windows + channel rollup
        "q247_linear_attribution": 3,
        # per-user daily agg + ONE grouped-map pass
        "q248_holt_linear": 2,
        # orc/csv checksum aggs (one per format); writes are side work
        "q250_format_parity": 2,
        # two latest-per-key windows share the user key; diff join local
        "q251_change_feed": 2,
        # one per-user arrival window + status rollup
        "q252_late_quarantine": 2,
        # ONE user-key exchange carries both pivot measures
        "q254_pivot_multi_agg": 2,
        # (hour,type) agg + 1-row total broadcast back
        "q256_hour_type_heatmap": 3,
        # six rules, each a broadcast anti-join/filter + tiny count agg
        "q257_data_contract": 6,
        # ALL four PIT features share ONE (user, time) window sort
        "q258_pit_features": 1,
        # avro encode/decode are map-side pandas UDFs; the only exchange
        # is the event_type rollup over the consumed topic
        "q270_avro_roundtrip": 1,
        # nested-record/array variant, same single-rollup shape
        "q271_avro_nested": 1,
        # lag state is metadata-sized (one row per partition): the returned
        # frame is a driver-local table, zero exchanges by design
        "q272_consumer_lag": 0,
        # seek resolved driver-side; the consumed memory table needs one
        # rollup exchange
        "q273_seek_by_timestamp": 1,
        # header extraction is a map-side higher-order function; one rollup
        "q274_headers_routing": 1,
        # both time bounds resolve to offset ranges driver-side; the scan
        # reads only the window, one rollup exchange
        "q275_batch_time_window": 1,
        # decimal codec is map-side (bytes+decimal logical type); one
        # 3-group rollup exchange over the consumed topic
        "q276_avro_decimal_money": 1,
        # confluent framing + per-id schema resolution are map-side; one
        # event_type rollup exchange
        "q277_schema_evolution": 1,
        # reset/fencing are metadata file ops; the delta re-read is a
        # pruned scan + one per-partition rollup exchange
        "q278_group_reset_reread": 1,
        # txn filtering is an executor-side columnar mask; one rollup
        # exchange per isolation level, event_type join broadcast
        "q279_txn_isolation": 2,
        # atomic publish is sink-side (state file + markers); the consume
        # side is one event_type rollup exchange
        "q280_atomic_sink_eos": 1,
        # config + reap are metadata ops; one per-partition rollup over
        # the retained window
        "q281_retention_policy": 1,
        # two-subject decode is map-side; one nationkey rollup exchange
        "q282_avro_key_compacted": 1,
        # both transport hops are eager sink-side; the verify read is one
        # event_type rollup exchange
        "q283_eos_pipeline": 1,
        # two signature groupBys (base+delta), base bucket groupBy,
        # delta-probe join, two estimator joins off the persisted sigs
        "q284_incremental_dedup": 6,
        # rebalance/assignment are driver metadata; three member scans
        # are partition-pruned slices of one log pass, one member rollup
        "q285_rebalance_assign": 1,
        # mirror + checkpoint run eagerly (one pass + one order-keeping
        # shuffle, syncs/translation metadata); the returned failover
        # re-read is a pruned scan + one per-partition rollup
        "q286_mirror_failover": 1,
        # the merge loop runs eagerly (1 corpus shuffle for the word
        # table, then Zipf-small per-step pair groupBys); the returned
        # merge table is driver metadata (merges.txt), plan-free
        "q287_bpe_merges": 0,
        # training loop eager; the returned vocab = word groupBy +
        # subword groupBy + TakeOrdered top-k (no global sort exchange)
        "q288_bpe_vocab": 3,
        # produce/dedupe/fencing are client+metadata side; the verify
        # read is one pass + one event_type rollup exchange
        "q289_idempotent_produce": 1,
        # joins/heartbeats/commits are metadata file ops; the resumed
        # read is a partition-pruned scan + one rollup exchange
        "q290_static_member_resume": 1,
        # distributed sink produce is a write job; the verify read is one
        # decompressing pass + one event_type rollup exchange
        "q291_compressed_transport": 1,
        # tiering is a metadata move; the stitched two-tier read is one
        # pass + one event_type rollup exchange
        "q292_tiered_read": 1,
        # ACL checks are plan-time metadata (O(bindings) driver-side);
        # the authorized read is one pass + one event_type rollup
        "q293_acl_enforcement": 1,
        # reference closures resolve at plan time; decode is the cached
        # per-writer-id pandas UDF — one pass + one event_type rollup
        "q294_schema_references": 1,
        # byte-BPE: one corpus-sized shuffle builds the pre-token table;
        # the merge loop's exchanges live in the eager training loop, not
        # the returned merges frame (same posture as q287)
        "q295_byte_bpe_merges": 3,
        # vocab = pre-token groupBy + subword groupBy + TakeOrdered top-k
        # (training loop eager; no global sort exchange)
        "q296_byte_bpe_vocab": 3,
        # the drain loop is client-side metadata; the verify read is one
        # pass + one event_type rollup exchange
        "q297_share_group_queue": 1,
        # type/token split: type distinct + doc-tokens/type join + per-doc
        # groupBy + source join + source rollup (training loop eager)
        "q298_byte_bpe_encode": 6,
        # ExactSubstr spans: anchor-hash groupBy + position join-back +
        # per-doc interval-coalesce window (groupBy reuses the window's
        # doc partitioning) — linear, never all-pairs
        "q299_exact_substring_spans": 3,
        # excision adds the covered-position distinct + keep-side
        # anti-join + per-doc rebuild over the span machinery
        "q300_exact_substring_excise": 4,
        # batched trainer: loop exchanges are eager (2 jobs per up-to-16-
        # merge round); the returned merge table is driver metadata
        "q301_byte_bpe_batched": 0,
        # incremental spans: base anchor distinct + delta probe join +
        # per-delta-doc coalesce window (+1 headroom for the
        # broadcast→shuffle probe-join flip past the threshold)
        "q302_exact_substring_incremental": 4,
        # target_vocab_size batched training: loop eager, merge table is
        # driver metadata
        "q303_byte_bpe_vocab_target": 0,
        # k-means: assignment is a map-side literal-centroid argmin
        # (zero shuffle); the returned frame is the member-count agg
        # joined (broadcast) to driver-built centroid rows
        "q304_kmeans_integer": 2,
        # search: map-side assignment + probe-cell candidate join +
        # per-query top-k window (training eager; centroids broadcast)
        "q305_ivf_exact_search": 3,
        # decode roundtrip: type-map distinct + stream join + per-doc
        # rebuild (training eager; +1 headroom for a join-strategy flip)
        "q306_byte_bpe_roundtrip": 3,
        # PQ training: per-subspace member-count agg (4 blocks, map-side
        # argmin assignment; training iterations eager)
        "q307_pq_train_integer": 4,
        # PQ ADC search: encode is map-side (argmin over literal
        # codebooks), queries broadcast with precomputed tables — the
        # only shuffle is the per-query top-k window (training eager)
        "q308_pq_exact_search": 1,
        # stdlib image decode: generate + decode are chained mapInPandas
        # over the scan — zero shuffles, decode parallelism == scan
        "q309_multimodal_decode_stdlib": 0,
        # corpus capstone: stage computation is eager (persisted lattice,
        # funnel collected per stage); the returned frame is 8 rows of
        # driver metadata
        "q310_corpus_pipeline": 0,
        # resize/audio/video: generate + decode are chained mapInPandas
        # over the scan — zero shuffles
        "q311_image_resize_nn": 0,
        "q313_audio_decode_wav": 0,
        "q314_video_frame_sample": 0,
        # IVFPQ: corpus side is map-side (cell + codes over the trainer's
        # assignment); probes window + probe/table join are query-sized;
        # one top-k window (training eager)
        "q312_ivfpq_search": 2,
        # by-residual IVFPQ: same shape — the residual step is a
        # broadcast join against the k-row centroid table (no shuffle)
        "q315_ivfpq_residual_search": 2,
        # refine: q315's ADC stage (2) + the exact re-rank — candidates
        # and queries broadcast against the corpus scan (no shuffle),
        # one added per-query top-k window over nq × refine_r rows
        "q316_ivfpq_refine_search": 3,
        # multimodal capstone: stage computation is eager (persisted
        # fingerprint frame, funnel collected per stage); the returned
        # frame is 5 rows of driver metadata
        "q317_multimodal_curation": 0,
        # saved-LM scoring: cbg agg + cctx agg + the two count joins on
        # bigram keys + the per-doc mean (vocab broadcasts)
        "q318_bigram_lm_incremental": 5,
        # id emission: type-distinct + per-doc reassembly groupBy
        # (training eager; the id map rides as a literal)
        "q319_byte_bpe_encode_ids": 2,
        # SQ8: train is an eager 2·dim-column agg; search is a broadcast
        # pair join + one per-query top-k window
        "q320_sq8_search": 1,
        # packing: global_cumsum's range partition + per-pid window
        # (offsets eager/literal) + the per-chunk agg
        "q321_context_packing": 3,
        # IVF+SQ: corpus side map-side (cell argmin + SQ codes over
        # literal state), probes broadcast; one top-k window
        "q322_ivfsq_search": 2,
        # waterfill: ONE corpus-sized token-count agg; the loop runs on
        # collected metadata rows; the returned frame joins two
        # metadata-scale sides
        "q323_token_budget_waterfill": 3,
        # count-min: the sketch builds eagerly (type-table agg + 1 KB
        # table + top-slice probe, collected); the returned frame is
        # top_n rows of driver metadata
        "q324_countmin_heavy_hitters": 0,
        # drift: two independent sketch branches (type agg + cell
        # reduction each, no cross-branch reuse in Catalyst) + the tiny
        # full-outer cell join + 4-row agg; in production the two
        # tables are READ (saved metadata), so compare-time cost is
        # the join alone
        "q325_sketch_drift": 11,
    }
    for name, budget in budgets.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        # keyed exchanges only: the budgets pin corpus-keyed shuffle
        # growth; the adaptive spread guard (operators/spread.py) adds
        # round-robin widening exchanges on NARROW (small-file) inputs
        # that are identity at production scale and are excluded here
        got = count_key_exchanges(df)
        assert got <= budget, f"{name}: {got} keyed exchanges > budget {budget}"


def test_q22_window_keys_scale_with_data(spark, sf_dir):
    """The ranking demo must partition its windows by a key whose
    cardinality grows with the data (l_suppkey), never the 3-value
    l_returnflag — a constant-cardinality window key means a constant
    number of sort tasks no matter how large the cluster (VERDICT r3)."""
    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q22_window_rank"].fn(spark, sf_dir)
    ps = plan_string(df, "formatted")
    win_lines = [l for l in ps.splitlines() if "windowspecdefinition" in l]
    assert win_lines, "no Window node in q22 plan"
    assert all("l_suppkey" in l for l in win_lines), win_lines
    assert not any("l_returnflag" in l for l in win_lines), win_lines


def test_gapfill_calendar_broadcasts(spark, sf_dir):
    # the densified calendar must broadcast against the daily aggregate —
    # a shuffle join here would move the fact-sized side twice
    df = REGISTRY["q69_gapfill_locf"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_ivf_partitioned_by_cell_prunes(spark, sf_dir, tmp_path):
    """The IVF scale contract (llm/similarity.py build_ivf_index docstring):
    written partitioned by cell, an nprobe search becomes directory-level
    partition pruning — the scan must carry a PartitionFilters entry on
    __cell, so probing 2 of N cells reads 2/N of the corpus."""
    from pyspark.sql import functions as F

    from rdkafka_streams_spark.core.plan import partition_filters
    from rdkafka_streams_spark.llm.similarity import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _cent = build_ivf_index(emb, n_cells=4)
    path = str(tmp_path / "ivf_cells")
    assigned.write.partitionBy("__cell").parquet(path)

    probe = spark.read.parquet(path).where(F.col("__cell").isin(0, 1))
    pf = " ".join(partition_filters(probe))
    assert "__cell" in pf, f"no partition pruning on cell: {pf}"


def test_ivf_search_norms_factored_below_candidate_join(spark, sf_dir):
    """ivf_search computes per-vector norms BELOW the candidate join (once
    per corpus row / per query), never per (candidate, query) pair: the
    scored projection above the join must contain exactly one interpreted
    fold (the dot) and zero norm folds. Per-pair norm recompute tripled the
    interpreted-lambda work of the pair-dense stage."""
    from rdkafka_streams_spark.llm.similarity import build_ivf_index, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    assigned, cent = build_ivf_index(emb, n_cells=4)
    df = ivf_search(assigned, cent, queries, k=3, nprobe=2)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = opt.splitlines()
    join_idx = next(i for i, l in enumerate(lines) if "Join" in l)
    above = "\n".join(lines[:join_idx])
    assert above.count("aggregate(") == 1, f"extra folds above candidate join:\n{above}"
    assert "transform(" not in above, f"norm fold above candidate join:\n{above}"


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A projection must prune the parquet ReadSchema — scanning all 11
    lineitem columns for a 7-column query reads ~40% more bytes than needed
    at any scale."""
    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q02_select_project"].fn(spark, sf_dir)
    read = [
        l.strip() for l in plan_string(df, "formatted").splitlines() if "ReadSchema" in l
    ][0]
    assert "l_shipdate" not in read and "l_suppkey" not in read, read
    assert "l_extendedprice" in read


def test_quantized_topk_broadcasts_queries(spark, sf_dir):
    """The quantized ANN path must keep the query side broadcast (no shuffle
    of the corpus against the query set) — same contract as cosine_topk."""
    from rdkafka_streams_spark.core.plan import has_broadcast_join

    df = REGISTRY["q94_quantized_topk"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 1


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Catalyst injects a bloom-filter semi-join under the fact side of a
    selective shuffle join (spark.sql.optimizer.runtime.bloomFilter, on by
    default) — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling only rows that can match. Size
    thresholds are relaxed here because the fixture is tiny; production
    defaults trigger on real sizes."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "no runtime bloom filter injected"
        assert "might_contain" in plan, "fact side not filtered by the bloom"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_global_rank_stays_distributed(spark, sf_dir):
    """q118's exact ranking must NOT collapse to a single-partition global
    window: the plan range-partitions (parallel local ranks + offsets) and
    reuses the range exchange for the per-partition counts."""
    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q118_equidepth_histogram"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    assert "rangepartitioning" in plan.lower(), "expected a range exchange"
    # No global (empty-partition-spec) window over the fact table: every
    # Window in the plan must carry a partition spec (__pid for the local
    # ranks; the only orderBy-only window is the per-PARTITION offsets
    # prefix sum, ≤ #partitions rows, which mentions __pid in its sort).
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__pid" in m.group(1), f"global window leaked: {m.group(0)}"
    # offsets come back as a broadcast, never a shuffle join
    assert "BroadcastExchange" in plan


def test_q166_rank_stays_distributed(spark, sf_dir):
    """q166's conversion-latency ranking must NOT collapse to a
    single-partition global window (round-4 verdict item): the rank goes
    through global_rank (range exchange + __pid-keyed local ranks) and the
    global count arrives as a broadcast 1-row join."""
    import re

    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q166_time_to_convert"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    assert "rangepartitioning" in plan.lower(), "expected a range exchange"
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__pid" in m.group(1), f"global window leaked: {m.group(0)}"


def test_vocabulary_rank_stays_distributed(spark, sf_dir):
    """build_vocabulary's token-id assignment (q93/q104) must range-partition
    through global_rank, never a partition-less row_number sort."""
    import re

    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q93_vocabulary"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    assert "rangepartitioning" in plan.lower(), "expected a range exchange"
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__pid" in m.group(1), f"global window leaked: {m.group(0)}"


def test_knn_graph_blocked_join_no_cartesian(spark, sf_dir):
    """q120's pair generation must key on the block column — an equi-join,
    never a cartesian/nested-loop over the full corpus — and norms must sit
    below the join (computed per vector, not per pair)."""
    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q120_knn_graph"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # per-pair norm recompute would show aggregate( lambdas in a Project
    # ABOVE the join; the only aggregate folds allowed post-join are the
    # single dot product per pair (regression guard for the q55-class bug).
    joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    )
    assert joins >= 2  # block join + mutual self-join


def test_q202_partition_pruning_at_scan(spark, sf_dir):
    """q202's 7-day predicate must reach the scan as PartitionFilters on the
    date partition column — directory-level pruning, the 100 TB time-series
    contract (reads 7 partitions of the table, not all of them)."""
    from rdkafka_streams_spark.core.plan import partition_filters

    df = REGISTRY["q202_partitioned_scan"].fn(spark, sf_dir)
    pf = " ".join(partition_filters(df))
    assert "event_date" in pf, f"no partition pruning on event_date: {pf}"


def test_q201_sketch_probe_is_broadcast_map_lookup(spark, sf_dir):
    """The CMS probe must be a broadcast of the packed one-row sketch over
    the fact rows — a shuffle join on the bucket key would move the whole
    fact table for a 4096-row counter lookup."""
    from rdkafka_streams_spark.core.plan import has_broadcast_join, plan_string

    df = REGISTRY["q201_heavy_hitters"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in plan_string(df, "simple")


def test_q208_dynamic_partition_pruning(spark, sf_dir):
    """q208's fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — runtime subquery pruning driven by the filtered
    calendar dim, not a static predicate."""
    from rdkafka_streams_spark.core.plan import plan_string

    df = REGISTRY["q208_dpp_join"].fn(spark, sf_dir)
    plan = plan_string(df, "formatted")
    assert "dynamicpruning" in plan.lower(), "no DPP subquery in the fact scan"


def test_q213_bucketed_join_no_exchange_even_without_broadcast(spark, sf_dir):
    """The bucketed-join contract must not depend on AQE demoting the join
    to broadcast (it does at tiny SF): with broadcast disabled, the
    lineitem⋈orders join over the 8-bucket tables must STILL plan with no
    Exchange on either input — only the final rollup shuffles."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = REGISTRY["q213_bucketed_join"].fn(spark, sf_dir)
        assert count_exchanges(df) <= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_statistics_flip_plans_pinned_at_asymptote(spark, sf_dir):
    """q192 (16→19 exchanges at 8×) and q138 (8→10 at 32×) are the two
    adjudicated expected-adaptive plan-sweep variants (SCALE_CERT /
    SCALE.md): their extra exchanges are statistics-driven
    broadcast→shuffle JOIN FLIPS, not plan growth. Machine-check the
    adjudication: with stats-driven broadcasts disabled
    (autoBroadcastJoinThreshold=-1 — the 100 TB asymptote, where no
    fact-derived relation fits any threshold) the same flips must
    appear as shuffle joins (SortMergeJoin, zero stats-broadcasts) and
    the exchange count must land EXACTLY on the recorded asymptote —
    a future regression past 'expected-adaptive' fails loudly here
    instead of hiding behind the adjudication."""
    from rdkafka_streams_spark.core.plan import plan_string

    asymptote = {"q192_rfm_segments": 19, "q138_basket_affinity": 10}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, recorded in asymptote.items():
            df = REGISTRY[name].fn(spark, sf_dir)
            got = count_exchanges(df)
            assert got == recorded, (
                f"{name}: {got} exchanges at the no-broadcast asymptote, "
                f"SCALE_CERT recorded {recorded}"
            )
            ps = plan_string(df, "simple")
            assert "SortMergeJoin" in ps and "BroadcastHashJoin" not in ps, (
                f"{name}: expected pure shuffle joins at the asymptote"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivf_cell_partitioned_corpus_prunes_at_scan(spark, sf_dir, tmp_path):
    """The IVF scale posture's standing claim — 'the candidate join hits
    the inverted lists on the cell key (partition pruning when the corpus
    is written partitioned by cell)' — made real: write the assigned
    corpus partitionBy(cid), probe a FIXED cell set (the serve-time shape:
    a query batch's probed cells are known before the corpus scan), and
    the corpus scan must carry the cid PartitionFilters — reading
    nprobe/n_cells of the directories, not the corpus. A plan whose scan
    lacks the filter reads 100 TB to answer a 2-cell probe."""
    from rdkafka_streams_spark.core.plan import partition_filters
    from rdkafka_streams_spark.llm.similarity import kmeans_integer

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 300
    )
    assigned, cents = kmeans_integer(emb, k=4, n_iters=2)
    path = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cid").parquet(path)
    corpus = spark.read.parquet(path)
    # serve shape: the probed cells are literals by scan time
    cand = corpus.where(F.col("cid").isin([1, 3]))
    pf = " ".join(partition_filters(cand))
    assert "cid" in pf, f"no partition pruning on cid: {pf}"


def test_nsw_partitioned_serve_prunes_per_hop(spark, sf_dir, tmp_path):
    """q342's standing claim — 'each hop reads only the frontier's
    adjacency' — made real: build the bucketed NSW corpus, shape a hop
    scan the way beam_search_partitioned does (bucket IN + src IN, both
    literals by scan time), and the scan must carry the bucket
    PartitionFilters — reading b/n_buckets of the index directories,
    not the graph. Also pins serve ≡ in-memory equality on a small
    corpus (the artifact round-trip contract at unit scale)."""
    from rdkafka_streams_spark.core.plan import partition_filters
    from rdkafka_streams_spark.llm.similarity import (
        beam_search_integer,
        beam_search_partitioned,
        build_nsw_corpus,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 300
    )
    path = str(tmp_path / "nsw_adj")
    hub = build_nsw_corpus(
        emb, path, r=4, n_assign=2, n_cells=4, n_iters=2, n_buckets=4
    )
    adj = spark.read.parquet(path)
    hop = adj.where(F.col("bucket").isin([0, 2])).where(
        F.col("src").isin([0, 2, 6])
    )
    pf = " ".join(partition_filters(hop))
    assert "bucket" in pf, f"no partition pruning on bucket: {pf}"

    queries = emb.where(F.col("vec_id") % 60 == 0)
    served = sorted(tuple(r) for r in beam_search_partitioned(
        spark, path, hub, None, queries,
        k=3, beam=8, hops=3, n_buckets=4,
    ).collect())
    mem = sorted(tuple(r) for r in beam_search_integer(
        emb, queries, k=3, beam=8, hops=3, r=4,
        n_assign=2, n_cells=4, n_iters=2,
    ).collect())
    assert served == mem and len(served) > 0


def test_q345_weight_join_broadcasts_and_counts_bound_exchanges(spark, sf_dir):
    """The NB scorer's per-feature weight lookup must be a broadcast
    join (the weight table is 4096 rows BY CONSTRUCTION), and the whole
    train+score plan keeps a data-independent exchange count."""
    df = REGISTRY["q345_nb_quality_classifier"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 6


def test_q347_pca_stats_pass_zero_exchanges(spark, sf_dir):
    """The PCA loadings frame is a driver literal built from ONE
    partially-aggregated stats pass — the returned plan must carry no
    exchange at all (the corpus work happened in the stats collect)."""
    df = REGISTRY["q347_pca_power_iteration"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_q352_code_scan_single_topk_exchange(spark, sf_dir):
    """Binary-code serving: codes build map-side (literal hyperplanes),
    queries broadcast — the ONLY exchange is the per-query top-k
    window."""
    df = REGISTRY["q352_hamming_topk"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) == 1


def test_q354_prefix_is_take_ordered_not_global_sort(spark, sf_dir):
    """The WFQ schedule prefix must materialize via TakeOrderedAndProject
    (per-partition top-P + merge), never a full global Sort+Exchange of
    the corpus."""
    df = REGISTRY["q354_mixture_interleave"].fn(spark, sf_dir)
    assert has_operator(df, "TakeOrderedAndProject")


def test_nsw_insert_layout_prunes_and_merge_equals_rebuild(
    spark, sf_dir, tmp_path
):
    """q359's standing claims made real at unit scale: (a) the insert
    layout's nodes AND edges reads carry cell PartitionFilters when the
    touched set is literal (the exact shape nsw_insert_integer issues —
    the standing corpus is never read outside the delta's cells), and
    (b) the merged edge set is IDENTICAL to a full rebuild on the union
    with the same standing-trained centroids (merge ≡ retrain for the
    graph index)."""
    from rdkafka_streams_spark.core.plan import partition_filters
    from rdkafka_streams_spark.llm.similarity import (
        build_nsw_insert_layout,
        kmeans_integer,
        nsw_graph_integer,
        nsw_insert_integer,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 400
    )
    base = emb.where(F.col("vec_id") % 7 != 0)
    delta = emb.where(F.col("vec_id") % 7 == 0)
    cents = kmeans_integer(base, k=4, n_iters=2)[1]
    path = str(tmp_path / "nsw_insert")
    build_nsw_insert_layout(base, path, cents, r=4, n_assign=2)

    # (a) the pruned-read shape: touched cells are literals by scan time
    nodes = spark.read.parquet(f"{path}/nodes").where(
        F.col("cell").isin([1, 3])
    )
    pf = " ".join(partition_filters(nodes))
    assert "cell" in pf, f"no partition pruning on nodes cell: {pf}"
    edges = spark.read.parquet(f"{path}/edges").where(
        F.col("cell").isin([1, 3])
    )
    pf = " ".join(partition_filters(edges))
    assert "cell" in pf, f"no partition pruning on edges cell: {pf}"

    # (b) merge ≡ retrain, exactly
    merged = sorted(tuple(r) for r in nsw_insert_integer(
        spark, path, cents, delta, r=4, n_assign=2,
    ).collect())
    rebuilt = sorted(tuple(r) for r in nsw_graph_integer(
        emb, r=4, n_assign=2, coarse=cents,
    ).collect())
    assert merged == rebuilt and len(merged) > 0


def test_binary_corpus_code_scan_prunes_columns_and_rerank_prunes_rows(
    spark, sf_dir, tmp_path
):
    """q361's two I/O claims made real: (a) the binary pre-filter's scan
    must carry a ReadSchema WITHOUT the vector column (Parquet column
    pruning — the tier reads 4 code bytes/row, not the float corpus),
    and (b) the re-rank's scan must carry bucket PartitionFilters (it
    touches only the shortlist's directories). Also pins on-disk serve
    ≡ in-memory hamming_topk + exact_rerank_integer equality."""
    from rdkafka_streams_spark.core.plan import (
        partition_filters,
        scan_read_schemas,
    )
    from rdkafka_streams_spark.llm.similarity import (
        build_binary_corpus,
        exact_rerank_integer,
        hamming_refine_partitioned,
        hamming_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 300
    )
    path = str(tmp_path / "bin_corpus")
    build_binary_corpus(emb, path, n_planes=16, dim=64, n_buckets=4)

    # (a) code-scan shape: only (vec_id, code) reach the reader
    codes = spark.read.parquet(path).select("vec_id", "code")
    rs = " ".join(scan_read_schemas(codes))
    assert "code" in rs and "qv" not in rs, f"vector column not pruned: {rs}"

    # (b) re-rank shape: shortlist buckets are literals by scan time
    rer = (
        spark.read.parquet(path)
        .where(F.col("bucket").isin([0, 2]))
        .where(F.col("vec_id").isin([0, 2, 50]))
        .select("vec_id", "qv")
    )
    pf = " ".join(partition_filters(rer))
    assert "bucket" in pf, f"no partition pruning on bucket: {pf}"

    queries = emb.where(F.col("vec_id") % 60 == 0)
    served = sorted(tuple(r) for r in hamming_refine_partitioned(
        spark, path, queries, k=3, shortlist=8, n_planes=16, dim=64,
        n_buckets=4,
    ).collect())
    short = hamming_topk(emb, queries, k=8, n_planes=16, dim=64)
    mem = sorted(tuple(r) for r in exact_rerank_integer(
        emb, queries, short, k=3,
    ).collect())
    assert served == mem and len(served) > 0


def test_ivf_filtered_search_pushes_predicate_and_prunes_cells(
    spark, sf_dir, tmp_path
):
    """q365's storage claim made real: with the attribute stored in the
    cid-partitioned layout, the filtered candidate scan must carry BOTH
    the probed-cell PartitionFilters AND the label PushedFilters — one
    read, directory-pruned and row-group-skipped. Also pins pre-filter
    semantics: every returned neighbor satisfies the predicate, and a
    query whose unfiltered top-k would under-return after post-filtering
    still gets k matching rows when they exist."""
    from rdkafka_streams_spark.core.plan import (
        partition_filters,
        pushed_filters,
    )
    from rdkafka_streams_spark.llm.similarity import (
        build_ivf_corpus,
        ivf_search_partitioned,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 400
    )
    path = str(tmp_path / "ivf_filtered")
    cents = build_ivf_corpus(
        emb, path, n_cells=4, n_iters=2, keep_cols=["label"],
    )
    scan = (
        spark.read.parquet(path)
        .where(F.col("cid").isin([1, 3]))
        .where(F.expr("label % 3 = 0"))
    )
    pf = " ".join(partition_filters(scan))
    assert "cid" in pf, f"no partition pruning on cid: {pf}"
    pu = " ".join(pushed_filters(scan))
    assert "label" in pu, f"label predicate not pushed to the scan: {pu}"

    queries = emb.where(F.col("vec_id") % 60 == 0)
    out = ivf_search_partitioned(
        spark, path, cents, queries, k=3, nprobe=2,
        predicate="label % 3 = 0",
    )
    labels = {
        r["label"]
        for r in out.join(emb.select("vec_id", "label"), "vec_id").collect()
    }
    assert labels and all(lb % 3 == 0 for lb in labels)
