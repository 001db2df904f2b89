"""Text analysis for training-data pipelines (SURVEY.md §2.6 L4).

Language-ID, quality scoring, token counting, fingerprinting — all pure
column expressions (whole-stage codegen; zero Python on the row path).
The language detector is profile-based (Cavnar–Trenkle shape): build top-N
token profiles per language from the corpus, score each doc by profile
overlap, pick the argmax. On real prose the profile would be char n-grams;
the fixture corpus is token soup, so token profiles are the honest analog.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# scale-adaptive parallelism guard: one-row-group scans serialize the
# per-row tokenize/n-gram/hash work onto one core; no-op at production
# scale (see operators/spread.py)
from rdkafka_streams_spark.operators.spread import spread as _spread

STOPWORDS = ("the", "a")
BPE_ISH_RE = "[a-z]+|[0-9]+"
FINGERPRINT_NGRAM = 8
PROFILE_TOP_N = 10


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + regex ("BPE-ish") token counts and density."""
    toks = F.split(text_col, " ")
    n_ws = F.size(toks)
    n_chars = F.length(text_col)
    return docs.select(
        id_col,
        n_ws.alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)).alias("n_re_tokens"),
        F.length(F.regexp_replace(F.col(text_col), " ", "")).alias("n_chars_nospace"),
        F.round(n_ws * 100.0 / n_chars, 6).alias("tokens_per_100_chars"),
    )


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality heuristics plus a
    composite score — the classic cheap pre-filter before expensive dedup."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    stop_cond = " OR ".join(f"x = '{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), x -> {stop_cond})"))
    sum_len = F.aggregate(F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
    stop_ratio = n_stop / n
    return docs.select(
        id_col,
        "lang",
        n.alias("n_tokens"),
        F.round(sum_len / n, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.least(F.lit(1.0), n / F.lit(50.0)) * (F.lit(1.0) - stop_ratio), 6).alias(
            "quality_score"
        ),
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repetition (the Gopher/MassiveText-style duplicate
    n-gram filter): token ``n``-gram count, distinct count, and a
    ``is_repetitive`` flag when >10% of n-grams are duplicates. Integer
    arithmetic only (``dup*10 >= total``), so the flag is bit-exact across
    engines — no float-rounding boundary. Pure column expressions."""
    t = f"split({text_col}, ' ')"
    ng = (
        f"CASE WHEN size({t}) >= {n} THEN transform(sequence(1, size({t}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({t}, i, {n}))) ELSE cast(array() as array<string>) END"
    )
    return docs.select(
        id_col,
        F.expr(f"cast(size({ng}) as bigint)").alias("n_ngrams"),
        F.expr(f"cast(size(array_distinct({ng})) as bigint)").alias("n_distinct"),
        F.expr(
            f"size({ng}) > 0 AND "
            f"(size({ng}) - size(array_distinct({ng}))) * 10 >= size({ng})"
        ).alias("is_repetitive"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split docs into overlapping token windows — the context-window
    chunking step of every training/RAG ingestion pipeline. Chunk ``i``
    covers tokens ``[i·stride, i·stride + chunk_tokens)`` with
    ``stride = chunk_tokens − overlap``; the final partial window is kept.

    One generate-and-explode per doc (no shuffle at all — chunking is
    embarrassingly parallel); downstream repartitioning is the caller's
    choice. Output: (id, chunk_id, chunk, chunk_tokens)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    t = f"split({text_col}, ' ')"
    piece = (
        f"transform(sequence(0, (size({t}) - 1) div {stride}), "
        f"i -> struct(i as chunk_id, "
        f"concat_ws(' ', slice({t}, i * {stride} + 1, {chunk_tokens})) as chunk, "
        f"size(slice({t}, i * {stride} + 1, {chunk_tokens})) as nt))"
    )
    return docs.select(id_col, F.explode(F.expr(piece)).alias("c")).select(
        id_col,
        F.col("c.chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk").alias("chunk"),
        F.col("c.nt").cast("long").alias("chunk_tokens"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: concatenate docs (in deterministic ``id``
    order within a group) into fixed-token-budget training sequences —
    ``seq_id = floor(cum_tokens_before / seq_len)``. The streaming-friendly
    packing every pretraining data loader performs; a running-sum window per
    group, so one shuffle on the group key. Integer-exact across engines."""
    n = F.size(F.split(text_col, " ")).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum(n).over(w), F.lit(0))
    return docs.select(
        id_col,
        group_col,
        n.alias("n_tokens"),
        F.floor(prev_cum / seq_len).cast("long").alias("seq_id"),
    )


def build_vocabulary(
    docs: DataFrame,
    min_count: int = 5,
    max_vocab: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Frequency vocabulary: (tok, freq, token_id) with contiguous ids by
    (freq desc, token asc) — the deterministic precursor to tokenizer
    training (BPE seeding, embedding-table sizing, OOV policy).

    Scale shape: the token count is one shuffled aggregate; id assignment
    is an exact distributed rank (operators/ranking.py ``global_rank``:
    range partition on (-freq, tok) + parallel local ranks + broadcast
    offsets) — unconditionally parallel, no single-sort task even when the
    post-``min_count`` vocabulary is large."""
    from ..operators.ranking import global_rank

    toks = docs.select(F.explode(F.split(text_col, " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    kept = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_count)
        .withColumn("__negfreq", -F.col("freq"))
    )
    return (
        global_rank(kept, ["__negfreq", "tok"], rank_col="__rn")
        .withColumn("token_id", (F.col("__rn") - 1).cast("long"))
        .where(F.col("token_id") < max_vocab)
        .select("tok", F.col("freq").cast("long").alias("freq"), "token_id")
    )


def _distinct_tokens(docs: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    # no spread (r15 A/B): the explode is whole-stage codegen; the
    # exchange cost 1.5x on q57 against a fast single-task pass
    return docs.select(
        id_col, *extra, F.explode(F.array_distinct(F.split(text_col, " "))).alias("tok")
    )


def language_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_n: int = PROFILE_TOP_N,
    sample_fraction: float = 1.0,
    seed: int = 42,
    _tok: DataFrame | None = None,
) -> DataFrame:
    """Top-N tokens per language by document frequency (ties → token asc).

    ``sample_fraction`` < 1.0 builds the profiles from a seeded Bernoulli
    sample of the corpus: at 100 TB the top-N-by-document-frequency profile
    converges long before a full pass, so sampling turns the profile build
    from a corpus scan into a bounded one. ``_tok`` (internal) lets a caller
    that already exploded tokens share that frame instead of re-exploding.
    """
    if _tok is None:
        if sample_fraction < 1.0:
            docs = docs.sample(fraction=sample_fraction, seed=seed)
        _tok = _distinct_tokens(docs, "doc_id", text_col, lang_col)
    tc = _tok.groupBy(lang_col, "tok").agg(F.count("*").alias("c"))
    w = Window.partitionBy(lang_col).orderBy(F.col("c").desc(), F.col("tok"))
    return (
        tc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select(F.col(lang_col).alias("plang"), "tok")
    )


def detect_language(
    docs: DataFrame,
    profiles: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    profile_sample_fraction: float = 1.0,
    seed: int = 42,
    eager_profiles: bool = True,
) -> DataFrame:
    """Per-doc detected language = argmax profile overlap (ties → lang asc);
    'unknown' when a doc shares no token with any profile. Profiles are tiny
    (languages × top_n rows) and broadcast.

    Cache posture (the former weak mark): with ``eager_profiles`` (default)
    internally-built profiles are materialized EAGERLY to the driver — they
    are languages × top_n rows, a few KB — and re-created as a local frame,
    so the returned lazy result holds NO session-pinned cache: the profile
    build is one finished scan, scoring is a second clean scan. This is the
    100 TB posture (two passes beat pinning a corpus-sized token explode).
    ``eager_profiles=False`` restores the shared-persist plan (one explode,
    read twice through a cache the CALLER must release).
    ``profile_sample_fraction`` < 1.0 additionally builds the profiles from
    a seeded corpus sample, turning pass one into a bounded scan."""
    if profiles is None:
        if profile_sample_fraction < 1.0:
            profiles = language_profiles(
                docs, lang_col, text_col,
                sample_fraction=profile_sample_fraction, seed=seed,
            )
            tok = _distinct_tokens(docs, id_col, text_col)
        elif eager_profiles:
            lazy = language_profiles(docs, lang_col, text_col)
            profiles = docs.sparkSession.createDataFrame(
                lazy.collect(), schema=lazy.schema
            )
            tok = _distinct_tokens(docs, id_col, text_col)
        else:
            # shared by the profile build AND the scoring join; the lazy
            # result reads through this cache, so the CALLER owns the
            # release (session-scoped by design)
            tok_l = _distinct_tokens(docs, id_col, text_col, lang_col).persist()
            profiles = language_profiles(docs, lang_col, text_col, _tok=tok_l)
            tok = tok_l.select(id_col, "tok")
    else:
        tok = _distinct_tokens(docs, id_col, text_col)
    score = (
        tok.join(F.broadcast(profiles), "tok")
        .groupBy(id_col, "plang")
        .agg(F.count("*").alias("s"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("s").desc(), F.col("plang"))
    pick = score.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return docs.join(pick.select(id_col, "plang"), id_col, "left").select(
        docs["*"], F.coalesce("plang", F.lit("unknown")).alias("detected")
    )


def fingerprint(
    docs: DataFrame,
    ngram: int = FINGERPRINT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min md5 over all character
    n-gram windows — a stable content id robust to token reordering at the
    edges. One expression, no explode (the sequence lives inside the row)."""
    expr = (
        f"array_min(transform(sequence(1, greatest(length({text_col}) - {ngram - 1}, 1)), "
        f"i -> md5(substring({text_col}, i, {ngram}))))"
    )
    # spread: one interpreted md5 per character window per row — a
    # one-row-group scan would serialize it onto one core
    return _spread(docs.select(id_col, text_col)).select(
        id_col, F.expr(expr).alias("fp")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per doc by TF-IDF (keyword extraction for corpus triage).

    tf = in-doc occurrences; idf = ln((N+1)/(df+1)) (smoothed), rounded to 6
    so the irrational ln is engine-stable; score = tf · idf. Ranking tiebreak
    on the term itself makes the top-k total-ordered. Shuffles key on the
    term (df) and the doc id (tf, rank) — both high-cardinality; the corpus
    size N is a 1-row broadcast."""
    toks = docs.select(id_col, F.explode(F.split(text_col, " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "tok",
            "tf",
            (
                F.col("tf")
                * F.round(F.ln((F.col("n_docs") + 1) / (F.col("df") + 1)), 6)
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "tok", "tf", F.round("score", 6).alias("score"), "rn")
    )


#: PII patterns for corpus scrubbing — ordered; applied sequentially.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d{1,2}[ -]?\(?\d{3}\)?[ -]?\d{3}[ -]?\d{4}", "<PHONE>"),
    (r"https?://[^ ]+", "<URL>"),
)


def redact_pii(text_col: str | F.Column) -> F.Column:
    """Regex-chain PII scrub (emails, phone numbers, URLs) — pure
    regexp_replace, whole-stage codegen, no Python. The pattern list is the
    policy surface; order matters (URLs may contain @)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# ------------------------------------------------- data-selection / LM score
DSIR_BUCKETS = 4096  # hashed-feature space: 3 md5 hex nibbles


def _md5_bucket(col: str, n_nibbles: int = 3) -> F.Column:
    """Engine-independent feature hash: the first ``n_nibbles`` hex nibbles
    of md5 interpreted as an integer (0..16^n-1). Same instr-on-hex trick as
    the SimHash bit votes (llm/dedup.py) — reproducible verbatim in SQL."""
    parts = [
        f"(instr('0123456789abcdef', substring(md5({col}), {i + 1}, 1)) - 1) * {16 ** (n_nibbles - 1 - i)}"
        for i in range(n_nibbles)
    ]
    return F.expr(" + ".join(parts))


def _doc_features(docs: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    """Unigram + bigram features per doc, with multiplicity: (id, feat).

    One scan, one explode: unigrams (non-empty) and bigrams concatenate
    into a single feature array per doc before exploding — a two-branch
    union would scan and tokenize the corpus twice. Bigrams via zip_with
    over two slices of the token array — no explode of an index sequence,
    no Python; a doc with < 2 tokens contributes no bigrams (slice length
    ``greatest(size-1, 0)`` keeps the lambda total)."""
    toks = F.split(F.col(text_col), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.concat(x, F.lit("_"), y),
    )
    allfeats = F.concat(F.filter(toks, lambda x: x != F.lit("")), bigrams)
    return docs.select(id_col, *extra, F.explode(allfeats).alias("feat"))


def dsir_weights(
    docs: DataFrame,
    target_filter: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): hashed
    unigram+bigram features, per-bucket log-likelihood ratio between the
    target slice and the raw corpus (Laplace-smoothed), per-doc weight =
    sum of its features' log-ratios. Docs scoring high look like the
    target distribution — the standard cheap filter for "give me more data
    shaped like this seed set".

    Determinism: each bucket's log-ratio is snapped to integer micro-nats
    (floor(lr·1e6 + 0.5)), so the per-doc sum is exact integer arithmetic —
    summation order cannot move the output. Scale shape: the bucket table
    is ≤ n_buckets rows (broadcast); the only per-token shuffles are the
    bucket-count aggregations and the final per-doc sum.

    Output: (id, n_feats, weight) — weight in nats, rounded to 6.
    """
    # Target membership rides along as a column (evaluated pre-explode), so
    # no membership join ever happens — a doc-id join would shuffle the
    # corpus when the target slice is a large fraction of it.
    feats = _doc_features(
        docs.withColumn("__tgt", target_filter), id_col, text_col, "__tgt"
    )
    # The feature explode is map-only and recomputed per count branch —
    # cheaper than materializing the token-level frame (measured at sf0.1:
    # persisting it doubled wall time). The count aggregations partial-agg
    # map-side down to ≤n_buckets rows before shuffling; totals derive from
    # those tiny aggregates, never a corpus rescan.
    fb = feats.withColumn("bkt", _md5_bucket("feat"))
    raw = fb.groupBy("bkt").agg(F.count("*").alias("c_raw"))
    tgt = fb.where("__tgt").groupBy("bkt").agg(F.count("*").alias("c_tgt"))
    totals = raw.agg(F.coalesce(F.sum("c_raw"), F.lit(0)).alias("t_raw"))
    t_tgt = tgt.agg(F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("t_tgt"))
    lr = (
        raw.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(t_tgt))
        .select(
            "bkt",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("c_tgt"), F.lit(0)) + 1)
                        / (F.col("t_tgt") + F.lit(float(n_buckets)))
                    )
                    - F.log((F.col("c_raw") + 1) / (F.col("t_raw") + F.lit(float(n_buckets))))
                )
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        fb.join(F.broadcast(lr), "bkt")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("lr_micro") / 1000000.0, 6).alias("weight"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus bigram-LM cross-entropy per doc — the KenLM-style perplexity
    quality signal every production corpus filter runs (CCNet et al.),
    self-trained here: P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) with add-one
    smoothing over the corpus vocabulary V; per-doc score = mean negative
    log-likelihood over its bigrams. Repetitive/templated text scores low,
    token soup scores high; both tails get filtered in practice.

    Determinism: per-bigram NLL snapped to integer micro-nats, per-doc mean
    computed as floor(sum/n + 0.5) on the exact integer sum — engine- and
    order-independent. Scale shape: two count aggregations keyed on the
    bigram/context (high-cardinality, well-spread), a keyed join of doc
    bigrams to the NLL table, one per-doc sum; nothing is collected and
    the only broadcast is the 1-row vocab size.

    Output: (id, n_bigrams, xent) — mean NLL in nats, rounded to 6.
    """
    toks = F.split(F.col(text_col), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    db = docs.select(id_col, F.explode(bigrams).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    cbg = db.groupBy("w1", "w2").agg(F.count("*").alias("c_bg"))
    cctx = db.groupBy("w1").agg(F.count("*").alias("c_ctx"))
    vocab = (
        docs.select(F.explode(toks).alias("tok"))
        .where(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("v"))
    )
    nll = (
        cbg.join(cctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.floor(
                -F.log((F.col("c_bg") + 1) / (F.col("c_ctx") + F.col("v"))) * 1000000 + 0.5
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        db.join(nll, ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("nll_micro").alias("s"))
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.floor(F.col("s") / F.col("n_bigrams") + 0.5) / 1000000.0, 6
            ).alias("xent"),
        )
    )


def _bigram_explode(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per in-doc bigram; the shared derivation of
    every bigram-LM entry point (training and scoring must see the same
    tokenization or the smoothing denominators silently skew)."""
    toks = F.split(F.col(text_col), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return docs.select(id_col, F.explode(bigrams).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_lm_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """TRAIN-ONCE bigram-LM artifact — the saved-index contract
    (``minhash_index`` / ``exact_substring_anchor_index``) applied to the
    CCNet perplexity stage: returns (cbg, cctx, vocab) — bigram counts,
    context counts, and the 1-row vocabulary size — each a plain
    DataFrame the caller writes to parquet. A daily-ingest pipeline
    trains the LM on the standing corpus once and scores every increment
    against the SAVED counts (``bigram_lm_score_with_index``); the base
    corpus is never rescanned. Counts are exact bigints, so the saved
    artifact reproduces in-session scoring bit for bit."""
    db = _bigram_explode(docs, id_col, text_col)
    cbg = db.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c_bg")
    )
    cctx = db.groupBy("w1").agg(F.count("*").cast("bigint").alias("c_ctx"))
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    return cbg, cctx, vocab


def bigram_lm_score_with_index(
    docs: DataFrame,
    cbg: DataFrame,
    cctx: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a SAVED bigram LM (``bigram_lm_index``)
    with add-one smoothing: P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V). Bigrams
    the LM never saw coalesce to c_bg=0 / c_ctx=0 (probability 1/V) —
    exactly how a base-trained LM prices novel increment text, and the
    reason the joins are LEFT (``bigram_lm_scores``' self-trained inner
    join would silently drop them). Same integer micro-nat snapping and
    floor(sum/n + 0.5) mean as the self-trained scorer, so on the
    training corpus itself the two are bit-identical (unit-pinned).
    Output: (id, n_bigrams, score_micro) — mean NLL in integer
    micro-nats (the q310 stage-6 unit).

    Scale: counts join on high-cardinality keys; vocab broadcasts; docs
    with zero bigrams drop (no score, like a tokenizer emitting
    nothing)."""
    db = _bigram_explode(docs, id_col, text_col)
    return (
        db.join(cbg, ["w1", "w2"], "left")
        .join(cctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.floor(
                -F.log(
                    (F.coalesce("c_bg", F.lit(0)) + 1)
                    / (F.coalesce("c_ctx", F.lit(0)) + F.col("v"))
                ) * 1000000 + 0.5
            ).cast("bigint").alias("nll_micro"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.floor(F.sum("nll_micro") / F.count("*") + 0.5)
            .cast("bigint").alias("score_micro"),
        )
    )


def nb_quality_classifier(
    docs: DataFrame,
    target_filter: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """TRAINED quality classifier — the multinomial Naive Bayes analog of
    the fastText filter CCNet/GPT-3-style pipelines run ("does this doc
    look like the reference corpus?"): train on a deterministic 80%
    hash-split (the q113 two-nibble md5 rule, bkt < 204), with the
    reference class given by ``target_filter``; score the HELD-OUT 20%
    with the NB log-odds margin

        margin(d) = log((n_pos+1)/(n_neg+1))
                  + Σ_feat [log θ_pos(b) − log θ_neg(b)],
        θ_c(b) = (c_c(b)+1) / (N_c + B)       (Laplace, B = n_buckets)

    over hashed unigram+bigram features (``_doc_features`` +
    ``_md5_bucket`` — the exact DSIR feature space, so the two selection
    signals are comparable bucket for bucket). Unlike DSIR's one-class
    ratio-to-corpus, this is the two-class supervised form: a class
    prior, per-class likelihoods, and a signed decision margin.

    Determinism: every per-bucket weight and the prior snap to integer
    micro-nats (floor(·1e6 + 0.5)); the per-doc margin is an exact
    integer sum — order-independent, reproducible verbatim in SQL.

    Scale shape: one feature explode; two bucket-count aggregations that
    partial-agg map-side to ≤ B rows; the weight table is EXACTLY B rows
    (dense via ``sequence`` — an eval bucket unseen in training still
    gets its Laplace weight; an observed-buckets-only table would
    silently drop those features); scoring is a broadcast join + one
    per-doc sum. Nothing corpus-sized is collected.

    Output: (id, n_feats, margin [nats, round 6], pred, actual) for
    held-out docs with ≥1 feature; pred = (margin > 0) as int."""
    split_bkt = _md5_bucket(f"CAST({id_col} AS STRING)", 2)
    lbl = docs.withColumn("__tr", split_bkt < 204).withColumn(
        "__pos", target_filter
    )
    w, prior = nb_train(
        lbl.where("__tr"), F.col("__pos"), id_col, text_col, n_buckets
    )
    scored = nb_score(lbl.where(~F.col("__tr")), w, prior, id_col, text_col)
    actual = lbl.select(id_col, F.col("__pos").cast("int").alias("actual"))
    return scored.join(actual, id_col).select(
        id_col, "n_feats", "margin", "pred", "actual"
    )


def nb_train(
    train: DataFrame,
    target_filter: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """TRAIN half of the NB filter — the saved-artifact surface: returns
    (weights, prior) as plain DataFrames the caller persists (the
    artifact is n_buckets + 1 rows — the q326 save/load posture).
    Weights are the DENSE per-bucket Laplace log-likelihood ratios in
    integer micro-nats; prior is the 1-row class log-odds. Scoring any
    later increment against the saved tables (``nb_score``) is
    bit-identical to in-session scoring."""
    lbl = train.withColumn("__pos", target_filter)
    feats = _doc_features(lbl, id_col, text_col, "__pos")
    fb = feats.withColumn("bkt", _md5_bucket("feat"))
    cnt = fb.groupBy("bkt").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("c_neg"),
    )
    tot = cnt.agg(
        F.coalesce(F.sum("c_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("c_neg"), F.lit(0)).alias("n_neg"),
    )
    spark = train.sparkSession
    dense = spark.range(n_buckets).select(F.col("id").cast("int").alias("bkt"))
    b = float(n_buckets)
    w = (
        dense.join(cnt, "bkt", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bkt",
            F.floor(
                (
                    F.log((F.coalesce("c_pos", F.lit(0)) + 1) / (F.col("n_pos") + F.lit(b)))
                    - F.log((F.coalesce("c_neg", F.lit(0)) + 1) / (F.col("n_neg") + F.lit(b)))
                )
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("w_micro"),
        )
    )
    prior = lbl.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("d_neg"),
    ).select(
        F.floor(
            (F.log(F.col("d_pos") + 1) - F.log(F.col("d_neg") + 1)) * 1000000 + 0.5
        )
        .cast("long")
        .alias("prior_micro")
    )
    return w, prior


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SCORE half: per-doc signed margin against SAVED (weights, prior)
    tables — a broadcast join + one per-doc integer sum, the shape that
    scores a stream increment without touching the training corpus.
    Output (id, n_feats, margin, pred); docs with zero features drop
    (no evidence, no score — same as the self-trained path)."""
    fb = _doc_features(docs, id_col, text_col).withColumn(
        "bkt", _md5_bucket("feat")
    )
    return (
        fb.join(F.broadcast(weights), "bkt")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_feats"), F.sum("w_micro").alias("s"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_feats",
            F.round((F.col("s") + F.col("prior_micro")) / 1000000.0, 6).alias("margin"),
            (F.col("s") + F.col("prior_micro") > 0).cast("int").alias("pred"),
        )
    )


def source_lm_ablation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """PER-SOURCE LM ABLATION — the data-mixture signal (the measurement
    DoReMi/DoGE-style mixture tuning consumes): for every source s,
    held-out cross-entropy under the bigram LM trained on ALL training
    data vs trained on ALL-MINUS-s (leave-one-source-out), sharing one
    count pass. Δ(s) = xent_loo(s) − xent_full > 0 means removing s HURT
    the held-out fit — s is pulling its weight; Δ ≈ 0 (or < 0) flags a
    source the mixture can down-weight. The held-out set is the q113
    'test' hash split (two-nibble md5 bkt ≥ 229, ~10%); training is the
    rest.

    The LOO counts are DERIVED, never retrained: c_loo(s) = c_total −
    c_s from a single (w1,w2,source)-keyed aggregation — 1 ablation
    pass for ALL sources instead of |S| training runs. The vocabulary V
    stays the FULL training vocab for every ablation (fixed smoothing
    support — the standard ablation-study control; a per-ablation V
    would conflate mixture effect with smoothing shift).

    Determinism: per-(bigram, ablation) NLL snaps to integer micro-nats;
    per-source sums are exact integers weighted by held-out bigram
    multiplicity (term < 2^25 micro-nats, so int64 sums stay exact to
    ~2^38 held-out bigrams — held-out sets are sampled small by
    construction, never 10% of 100 TB). Scale shape: count tables are distinct-bigram-bounded
    (×|S| for the per-source one, |S| bounded — a mixture has dozens of
    sources); held-out bigrams pre-aggregate to distinct keys before the
    join; the |S|-way expansion happens AFTER that reduction; joins are
    keyed shuffles, nothing collected.

    Output: (source, n_src_train_bigrams, n_heldout_bigrams, xent_full,
    xent_loo, delta) — xent = mean NLL in nats (round 6), delta = loo −
    full in nats (round 6, from the exact integer sums)."""
    split_bkt = _md5_bucket(f"CAST({id_col} AS STRING)", 2)
    tagged = docs.withColumn("__ho", split_bkt >= 229)
    train = tagged.where(~F.col("__ho"))
    db = _bigram_explode(
        train.select(F.col(source_col).alias("__src"), id_col, text_col),
        "__src", text_col,
    ).withColumnRenamed("__src", "src")
    cbg_s = db.groupBy("src", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("cbg_s")
    )
    cbg_t = cbg_s.groupBy("w1", "w2").agg(F.sum("cbg_s").alias("cbg_t"))
    cctx_s = cbg_s.groupBy("src", "w1").agg(F.sum("cbg_s").alias("cctx_s"))
    cctx_t = cctx_s.groupBy("w1").agg(F.sum("cctx_s").alias("cctx_t"))
    vocab = (
        train.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    sources = cbg_s.select("src").distinct()
    n_src = cbg_s.groupBy("src").agg(
        F.sum("cbg_s").cast("bigint").alias("n_src_train_bigrams")
    )
    hb = (
        _bigram_explode(tagged.where("__ho"), id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("hcnt"))
        .join(cbg_t, ["w1", "w2"], "left")
        .join(cctx_t, "w1", "left")
        .select(
            "w1", "w2", "hcnt",
            F.coalesce("cbg_t", F.lit(0)).alias("cbg_t"),
            F.coalesce("cctx_t", F.lit(0)).alias("cctx_t"),
        )
    )
    full_term = F.floor(
        -F.log((F.col("cbg_t") + 1) / (F.col("cctx_t") + F.col("v"))) * 1000000 + 0.5
    ).cast("long")
    loo_term = F.floor(
        -F.log(
            (F.col("cbg_t") - F.coalesce("cbg_s", F.lit(0)) + 1)
            / (F.col("cctx_t") - F.coalesce("cctx_s", F.lit(0)) + F.col("v"))
        ) * 1000000 + 0.5
    ).cast("long")
    per_src = (
        hb.crossJoin(F.broadcast(sources))
        .join(cbg_s, ["src", "w1", "w2"], "left")
        .join(cctx_s, ["src", "w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("src")
        .agg(
            F.sum("hcnt").cast("bigint").alias("n_heldout_bigrams"),
            F.sum(F.col("hcnt") * full_term).alias("s_full"),
            F.sum(F.col("hcnt") * loo_term).alias("s_loo"),
        )
    )
    return per_src.join(n_src, "src").select(
        F.col("src").alias("source"),
        "n_src_train_bigrams",
        "n_heldout_bigrams",
        F.round(
            F.floor(F.col("s_full") / F.col("n_heldout_bigrams") + 0.5) / 1000000.0, 6
        ).alias("xent_full"),
        F.round(
            F.floor(F.col("s_loo") / F.col("n_heldout_bigrams") + 0.5) / 1000000.0, 6
        ).alias("xent_loo"),
        F.round(
            F.floor(
                (F.col("s_loo") - F.col("s_full")) / F.col("n_heldout_bigrams") + 0.5
            ) / 1000000.0, 6
        ).alias("delta"),
    )


def corpus_filter_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    max_dup_ppm: int = 500000,
) -> DataFrame:
    """The composed keep/drop corpus filter every pretraining pipeline runs
    (the FineWeb/RefinedWeb-style chain), built from this repo's own
    signals: token-length band, stopword-ratio cap (integer compare:
    2·n_stop ≤ n_tokens), intra-doc duplicate-bigram flag
    (repetition_stats), and cross-doc duplicated-span coverage below
    ``max_dup_ppm`` (duplicate_span_coverage). Every signal is integer
    arithmetic — the whole decision is bit-exact across engines.

    Returns per-(lang, source) retention stats: n_docs, n_kept, kept_ppm.
    Scale shape: two doc-keyed joins fold the repetition and span frames
    onto the base signals (all partial-agg'd or map-only before joining);
    the final rollup is one small keyed agg.
    """
    from rdkafka_streams_spark.llm.dedup import duplicate_span_coverage

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    stop_cond = " OR ".join(f"x = '{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), x -> {stop_cond})"))
    base = docs.select(
        id_col, "lang", "source", n.alias("n_tokens"), n_stop.alias("n_stop")
    )
    rep = repetition_stats(docs, n=2, id_col=id_col, text_col=text_col).select(
        id_col, "is_repetitive"
    )
    spans = duplicate_span_coverage(docs, n=8, id_col=id_col, text_col=text_col).select(
        id_col, "dup_ppm"
    )
    joined = base.join(rep, id_col).join(spans, id_col, "left")
    keep = (
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("n_stop") * 2 <= F.col("n_tokens"))
        & ~F.col("is_repetitive")
        & (F.coalesce(F.col("dup_ppm"), F.lit(0)) < max_dup_ppm)
    )
    return (
        joined.withColumn("keep", keep)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .withColumn("kept_ppm", F.expr("n_kept * 1000000 div n_docs"))
    )


def encode_with_vocabulary(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """Apply a trained vocabulary (build_vocabulary output) to the corpus:
    every token becomes its ``token_id`` or ``oov_id`` — the
    tokenizer-application step between vocabulary training and sequence
    packing. The vocabulary broadcasts (it is capped by construction), so
    encoding is a map-side join: no corpus shuffle at any scale beyond the
    per-doc stat aggregation.

    Output per doc: n_tokens, n_oov, sum_ids (exact integers — sum of
    assigned ids with OOV as ``oov_id``, a cheap order-free checksum of
    the encoding)."""
    toks = docs.select(
        id_col, F.explode(F.split(text_col, " ")).alias("tok")
    ).where(F.col("tok") != "")
    enc = toks.join(
        F.broadcast(vocab.select("tok", "token_id")), "tok", "left"
    )
    return enc.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long")).alias("n_oov"),
        F.sum(F.coalesce(F.col("token_id"), F.lit(oov_id))).alias("sum_ids"),
    )


def skipgram_pairs(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Ordered (center, context) co-occurrence counts within ±``window``
    token positions — the word2vec/GloVe training-pair generation step.
    Both directions are emitted per distance (center→right and
    center→left), built as per-doc struct arrays via zip_with over offset
    slices (map-only; the only shuffle is the final pair count, keyed on
    the high-cardinality pair itself). ``min_count`` prunes the long tail
    exactly — the same cutoff vocabulary training applies.

    Output: (center, context, n) with n ≥ min_count."""
    toks = F.split(F.col(text_col), " ")
    arrays = []
    for d in range(1, window + 1):
        n = F.greatest(F.size(toks) - d, F.lit(0))
        left = F.slice(toks, 1, n)
        right = F.slice(toks, d + 1, n)
        arrays.append(
            F.zip_with(left, right, lambda a, b: F.struct(a.alias("center"), b.alias("context")))
        )
        arrays.append(
            F.zip_with(right, left, lambda a, b: F.struct(a.alias("center"), b.alias("context")))
        )
    pairs = docs.select(F.explode(F.concat(*arrays)).alias("p")).select(
        F.col("p.center").alias("center"), F.col("p.context").alias("context")
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
    )


def pmi_scores(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Pointwise mutual information over skip-gram co-occurrences:
    pmi(c,x) = ln(n(c,x)·T / (n(c·)·n(·x))) — the word-association
    statistic under every count-based embedding (PPMI-SVD lineage) and a
    collocation detector for corpus triage. Marginals and the grand total
    come from the FULL pair distribution; ``min_count`` only prunes which
    pairs are reported.

    Determinism: the count ratio is exact integer→double; the single ln
    snaps to integer micro-nats. Scale shape: pair counts shuffle once;
    the marginals are ≤|vocab| rows (broadcast); no corpus rescan.
    """
    pairs = skipgram_pairs(docs, window=window, min_count=1, text_col=text_col)
    cc = pairs.groupBy("center").agg(F.sum("n").alias("n_c"))
    xx = pairs.groupBy("context").agg(F.sum("n").alias("n_x"))
    tot = pairs.agg(F.sum("n").alias("t_all"))
    return (
        pairs.where(F.col("n") >= min_count)
        .join(F.broadcast(cc), "center")
        .join(F.broadcast(xx), "context")
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            "n",
            F.round(
                F.floor(
                    F.log((F.col("n") * F.col("t_all")) / (F.col("n_c") * F.col("n_x")))
                    * 1000000
                    + 0.5
                )
                / 1000000.0,
                6,
            ).alias("pmi"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed term set — the
    retrieval scorer behind reference-corpus matching and search-style
    corpus triage. idf = ln((N - df + 0.5)/(df + 0.5) + 1) snapped to
    integer micro-nats (engine-stable); the tf saturation and length
    normalization use exact integer inputs (tf, dl) and the corpus-level
    N/avgdl, so both engines evaluate identical doubles.

    Scale shape: one token explode filtered to the query terms (the
    filter prunes before any shuffle), per-(doc, term) tf counts, a
    ≤|terms|-row df table broadcast back, one per-doc sum. Output:
    (id, score rounded to 6) for docs matching ≥1 term."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(id_col, F.size(toks).alias("dl"), F.explode(toks).alias("tok"))
    hits = base.where(F.col("tok").isin(*terms))
    tf = hits.groupBy(id_col, "tok", "dl").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("total_len"),
    )
    idf = F.floor(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0) * 1000000
        + 0.5
    ) / 1000000.0
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b * F.col("dl") / (F.col("total_len") / F.col("n_docs"))
                    )
                )
            ).alias("term_score"),
        )
    )
    return scored.groupBy(id_col).agg(F.round(F.sum("term_score"), 6).alias("score"))


def normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical text normalization (the pre-dedup/pre-tokenize scrub):
    lowercase, map every non-[a-z0-9 space] char to a space, collapse runs
    of spaces, trim. Emits per-doc audit columns instead of the (large)
    normalized text itself: an md5 content hash (joins the exact-dedup
    path on normalized content), normalized length, token count, and a
    changed flag. Pure codegen'd column expressions — zero Python, zero
    shuffle; the regexes avoid ``\\s``/unicode classes so Java and RE2
    engines agree byte-for-byte."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    return df.select(
        id_col,
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("bigint").alias("norm_len"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("bigint")
        .alias("n_tokens"),
        (norm != F.col(text_col)).cast("bigint").alias("changed"),
    )


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-level Shannon entropy — the cheap gibberish
    / mojibake / binary-spill detector (natural text sits ~2.8–3.2 nats;
    base64 blobs and repeated-char junk fall far outside).

    H = ln(n) − (Σ c·ln c)/n over character counts c. Each c·ln c term is
    snapped to integer micro-nats *before* the sum (floats sum in
    shuffle-dependent order; integers don't — same trick as the bigram LM
    q96), and the division is integer floor-div, so the result is
    bit-identical on any engine. Two shuffles, both keyed on doc_id."""
    ch = docs.select(id_col, F.explode(F.split(text_col, "")).alias("ch"))
    counts = ch.groupBy(id_col, "ch").agg(F.count("*").cast("bigint").alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("c") * F.log(F.col("c").cast("double")) * 1_000_000 + 0.5)
        )
        .cast("bigint")
        .alias("s"),
    )
    h_micro = (
        F.floor(F.log(F.col("n").cast("double")) * 1_000_000 + 0.5).cast("bigint")
        - F.expr("s div n")
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n").alias("n_chars_counted"),
        F.round(h_micro / 1_000_000.0, 6).alias("entropy_nats"),
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    sep: str = "·",
    eow: str = "¤",
    batched: bool = False,
    max_batch: int = 16,
) -> DataFrame:
    """Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
    tokenizer-TRAINING step upstream of build_vocabulary/encode (q93/q104
    stop at whitespace tokens; real LLM pipelines learn subwords first).

    Classic BPE: represent each word type as a symbol sequence (initially
    characters + an end-of-word marker), repeatedly count adjacent symbol
    pairs weighted by word frequency, merge the most frequent pair
    corpus-wide, repeat. The returned frame is the learned merge table —
    ``(step, left, right, merged, pair_count)`` — which IS the tokenizer
    artifact (apply merges in order to encode).

    Distribution shape (the same split real BPE trainers use): deriving
    the word-frequency table is the only corpus-sized pass (one shuffle);
    the merge loop then runs over the DISTINCT-WORD table — Zipf-bounded,
    orders of magnitude smaller than the corpus, persisted across
    iterations and re-persisted per merge (predecessor unpersisted, so
    nothing session-pins corpus-scale state). Each iteration's chosen
    pair is one driver-side row — merge rules are metadata, exactly like
    a real trainer's merges.txt.

    Determinism: ties break (count DESC, left ASC, right ASC) on binary
    string order, identical in Spark and the SQL oracle. Symbol sequences
    are ``sep``-WRAPPED — every symbol carries the separator on BOTH
    sides ("·h··e··l··l··o··¤·") — so merging pair (x, y) is the plain
    string replace of "·x··y·" with "·xy·": left-to-right non-overlapping
    in both engines, no boundary sharing between adjacent occurrences
    ("·a··a··a··a·" → "·aa··aa·", the exact BPE result), and — the reason
    for wrapping rather than mere termination — no cross-symbol false
    match: with trailing separators only, applying (o, ¤) to a word
    holding the earlier-merged symbol "lo" ("lo·¤·") would match its
    suffix and forge "lo¤"; the leading separator makes "·o··¤·" require
    a whole "o" symbol.
    """
    words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    cur = words.select(
        "freq",
        F.concat(
            F.regexp_replace("w", "(.)", f"{sep}$1{sep}"),
            F.lit(sep + eow + sep),
        ).alias("seq"),
    )
    if batched:
        return _bpe_merge_loop_batched(
            docs.sparkSession, cur, n_merges, sep, max_batch=max_batch
        )
    return _bpe_merge_loop(docs.sparkSession, cur, n_merges, sep)


def _pair_counts(cur: DataFrame, sep: str) -> DataFrame:
    """Adjacent-symbol pair counts (freq-weighted) of a sep-wrapped
    (freq, seq) symbol table — the per-round aggregation both merge
    loops share."""
    return (
        # strip the outer separators (len(sep) chars each side),
        # split on the doubled inter-symbol separator: exact
        # symbol recovery for any separator width. Column API,
        # not selectExpr: a SQL string literal would UNESCAPE the
        # regex-escaped separator (backslashes eaten by the
        # parser) and regex-metachar seps would split wrongly.
        cur.select(
            "freq",
            F.split(
                F.substring(F.col("seq"), F.lit(1 + len(sep)),
                            F.length("seq") - F.lit(2 * len(sep))),
                re.escape(sep + sep),
            ).alias("syms"),
        )
        # a fully-merged word (one symbol) has no pairs — and
        # sequence(0, -1) would run DESCENDING in Spark, indexing
        # out of bounds, so filter before building the index list
        .where("size(syms) >= 2")
        .selectExpr(
            "freq",
            "explode(transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] AS l, syms[i + 1] AS r))) AS pr",
        )
        .groupBy("pr.l", "pr.r")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def _merge_replace(col, l: str, r: str, sep: str):
    """One learned merge as a sep-wrapped plain replace (see
    learn_bpe_merges for why wrapping makes this exact)."""
    return F.replace(
        col, F.lit(f"{sep}{l}{sep}{sep}{r}{sep}"), F.lit(f"{sep}{l}{r}{sep}")
    )


def _checkpoint_step(df: DataFrame, prev_ids: set, sc) -> tuple:
    """Materialize one merge-loop step with TRUNCATED lineage and free the
    superseded step's blocks.

    Why not persist+count: persist caches DATA but the LOGICAL PLAN still
    nests one projection deeper per step, and Catalyst re-analyzes the
    whole tree on every step's jobs — measured on sf0.1 documents, the
    driver burned 30 s–2 min BETWEEN 20 ms jobs by merge ~30, and a 16 g
    driver OOM'd on analysis alone (found by the round-10 merges/minute
    measurement, the exact blow-up class a 50k-merge vocabulary hits).
    ``localCheckpoint(eager=True)`` cuts the plan to a leaf each step, so
    analysis cost is O(1) per step forever. The checkpoint RDD ids are
    tracked by set-diff and the PREDECESSOR's are unpersisted explicitly
    — checkpoint blocks otherwise linger until driver GC, and the
    trainers promise zero retained storage after return (cache-hygiene
    unit). Local checkpoints are executor-resident (lost-executor =
    failed job); a production run on a flaky cluster would point
    ``checkpoint()`` at a reliable dir instead — same plan shape.

    Set-diff assumes the loop is the only writer persisting RDDs in this
    thread between the two snapshots — true for these single-threaded
    trainers (a concurrently-persisting thread could have its RDD
    adopted and freed here; don't lift this helper into parallel code).
    """
    pre = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    try:
        out = df.localCheckpoint(eager=True)
    except Exception:
        # eager materialization failed mid-flight: the checkpoint RDD is
        # already registered — free the partial blocks before re-raising
        # (the caller's finally only knows about PRIOR steps' ids)
        for rid in set(
            sc._jsc.getPersistentRDDs().keySet().toArray()
        ) - pre:
            sc._jsc.sc().unpersistRDD(rid, False)
        raise
    new_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - pre
    for rid in prev_ids:
        sc._jsc.sc().unpersistRDD(rid, False)
    return out, new_ids


def _bpe_merge_loop(spark, cur: DataFrame, n_merges: int, sep: str) -> DataFrame:
    """The shared Sennrich merge loop over a sep-wrapped (freq, seq)
    symbol table — used by both the char-level (learn_bpe_merges) and
    byte-level (learn_byte_bpe) trainers. Per-step lineage truncation
    (``_checkpoint_step`` — plan depth stays O(1) across steps, the
    r10 fix for Catalyst re-analysis growing with the step count); the
    table the loop iterates is the Zipf-bounded distinct-token table,
    never the corpus."""
    sc = spark.sparkContext
    ids: set = set()
    rules = []
    try:
        cur, ids = _checkpoint_step(cur, ids, sc)
        for step in range(1, n_merges + 1):
            top = _pair_counts(cur, sep).orderBy(
                F.desc("cnt"), F.asc("l"), F.asc("r")
            ).head(1)
            if not top:
                break  # nothing left to merge (degenerate corpus)
            l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
            rules.append((step, l, r, l + r, cnt))
            cur, ids = _checkpoint_step(
                cur.withColumn("seq", _merge_replace(F.col("seq"), l, r, sep)),
                ids, sc,
            )
    finally:
        for rid in ids:
            sc._jsc.sc().unpersistRDD(rid, False)
    return spark.createDataFrame(
        rules,
        "step int, left string, right string, merged string, pair_count bigint",
    )


def _bpe_merge_loop_batched(
    spark, cur: DataFrame, n_merges: int, sep: str, max_batch: int = 16
) -> DataFrame:
    """Batched Sennrich merges with INCREMENTALLY MAINTAINED pair counts,
    exactly equal to the sequential loop — the vocab-scale trainer: a
    production 50k-merge vocabulary under the sequential loop means
    ~100k sequential Spark jobs; this loop learns up to ``max_batch``
    merges per round (2 jobs) AND re-aggregates only the merge-touched
    words, so round cost scales with the pairs the batch actually
    changed, not with corpus-distinct size.

    Exactness argument (why the batch prefix replays the sequential
    choices): candidates are the pair table sorted by the sequential
    tie-break (count DESC, left ASC, right ASC). A sorted PREFIX
    p1..pk is selected such that (a) members are pairwise
    NON-INTERACTING (no shared symbol), so merging earlier members
    never changes a later member's count, and other old pairs only
    ever DECREASE — the prefix members stay the best old pairs in
    order; and (b) each member's count strictly exceeds ``A``, the
    maximum count of any old pair that shares a symbol with an
    already-selected member (self excluded) — every pair NEWLY created
    by an earlier member's merge has count ≤ some such overlapping old
    pair (each occurrence of x·(lr) was an occurrence of x·l), so no
    new pair can reach the strict bound, tie-breaks included.

    The argument ASSUMES the batch is free of STRING ALIASING: a newly
    minted symbol string (the concatenation l+r of an earlier member)
    must not textually equal a later member's l or r — aliased
    occurrences would pool into the later member's count and the
    strict bound would not see them. Two guards enforce the
    assumption rather than argue it away: a SELF-pair member (a,a)
    births the self-chain pair (aa,aa) whose only bounding old pair is
    (a,a) itself — removed by the self-exclusion — so a self-pair
    TERMINATES the batch ('aaaaaa cd' is the counterexample a
    round-10 review ran: sequential merges (aa,aa) before (c,d)); and
    a candidate whose l or r equals ANY earlier selected member's
    concatenated merged string also terminates the batch (belt and
    braces — structural analysis suggests this is unreachable under
    global leftmost replace on wrapped symbols, but the guard makes
    the exactness conditional on nothing). The selection stops at the
    first candidate violating any rule (skipping would desynchronize
    the sequential order); the first candidate is always selected, so
    the worst case degenerates to the sequential loop, never below it.
    Batched merges are applied as one chained replace in selection
    order — identical strings to applying them one round at a time.

    Incremental maintenance (why the delta is exact): applying the
    batch changes ONLY rows whose ORIGINAL seq contains some member's
    wrapped pattern "·l··r·" — the alias guard means no later replace
    in the chain can match text an earlier replace created (any new
    adjacency involves the new symbol l+r, which equals no later
    member's l or r), so the contains-filter catches every changed
    row; unchanged rows contribute identical pairs to both sides and
    cancel. The delta is ONE ``_pair_counts`` aggregation over the
    affected rows unioned twice (old seq at -freq, new seq at +freq),
    merged into the maintained table by a full outer join; old-symbol
    pairs only ever decrease and new-symbol pairs are genuinely new,
    so a count reaching zero never resurrects and the ``cnt != 0``
    filter is safe. The maintained table and the symbol table are both
    re-checkpointed per round (``_checkpoint_step`` — O(1) plan depth,
    zero retained blocks after return)."""
    sc = spark.sparkContext
    ids: set = set()
    pids: set = set()
    rules: list[tuple] = []
    try:
        cur, ids = _checkpoint_step(cur, ids, sc)
        pairs, pids = _checkpoint_step(_pair_counts(cur, sep), pids, sc)
        while len(rules) < n_merges:
            pool = max(4 * max_batch, 32)
            cand = pairs.orderBy(
                F.desc("cnt"), F.asc("l"), F.asc("r")
            ).limit(pool).collect()
            if not cand:
                break
            syms = set()
            for row in cand:
                syms.add(row["l"])
                syms.add(row["r"])
            syms_lit = list(syms)
            # per candidate symbol: the top-2 pairs containing it (by
            # the same tie-break) — top-2 so the bound can exclude the
            # candidate itself and still hold the max OTHER pair
            w = Window.partitionBy("s").orderBy(
                F.desc("cnt"), F.asc("l"), F.asc("r")
            )
            sym_rows = (
                pairs.where(
                    F.col("l").isin(syms_lit)
                    | F.col("r").isin(syms_lit)
                )
                .select(
                    "cnt", "l", "r",
                    F.explode(
                        F.array_distinct(F.array("l", "r"))
                    ).alias("s"),
                )
                .where(F.col("s").isin(syms_lit))
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= 2)
                .collect()
            )
            top2: dict[str, list] = {}
            for row in sorted(sym_rows, key=lambda x: x["rn"]):
                top2.setdefault(row["s"], []).append(
                    (row["cnt"], row["l"], row["r"])
                )
            selected: list[tuple] = []
            used: set[str] = set()
            minted: set[str] = set()
            a_bound = 0
            budget = min(max_batch, n_merges - len(rules))
            for row in cand:
                l, r, cnt = row["l"], row["r"], row["cnt"]
                if len(selected) >= budget:
                    break
                if selected and (l in used or r in used):
                    break  # interacting: its post-merge count is unknown
                if selected and (l in minted or r in minted):
                    # STRING ALIASING: this candidate's symbol string
                    # equals an earlier member's freshly-minted merged
                    # string — newborn occurrences would pool into its
                    # count unseen by the bound (see docstring)
                    break
                if selected and cnt <= a_bound:
                    break  # a pair born of an earlier merge could outrank
                selected.append((l, r, cnt))
                used.update((l, r))
                minted.add(l + r)
                if l == r:
                    # a SELF-pair merge (a,a)→aa births the self-chain
                    # pair (aa,aa), whose only bounding old pair is
                    # (a,a) ITSELF — excluded below, so nothing bounds
                    # it. 'aaaaaa cd': sequential merges (aa,aa) next,
                    # a naive batch would wrongly take (c,d) first.
                    # Terminate the batch — correct and rarely costly
                    # (self-pairs are rare outside degenerate runs).
                    break
                for s in {l, r}:
                    for (c2, l2, r2) in top2.get(s, []):
                        if (l2, r2) != (l, r):
                            a_bound = max(a_bound, c2)
                            break  # ordered: first non-self is the max
            col = F.col("seq")
            touched = F.lit(False)
            for (l, r, cnt) in selected:
                rules.append((len(rules) + 1, l, r, l + r, cnt))
                col = _merge_replace(col, l, r, sep)
                touched = touched | F.col("seq").contains(
                    f"{sep}{l}{sep}{sep}{r}{sep}"
                )
            # delta = pair counts of the merge-touched rows only: old
            # seq at NEGATIVE freq, post-batch seq at positive — one
            # aggregation whose input shrinks as merges rarify.
            # Persisted: both unionAll branches read it, so without the
            # cache the touched-row filter over the checkpointed symbol
            # table runs twice per round (advisor r11).
            affected = cur.where(touched).persist()
            try:
                delta = _pair_counts(
                    affected.select((-F.col("freq")).alias("freq"), "seq")
                    .unionAll(
                        affected.select("freq", col.alias("seq"))
                    ),
                    sep,
                )
                pairs, pids = _checkpoint_step(
                    pairs.join(delta.withColumnRenamed("cnt", "d"),
                               ["l", "r"], "full")
                    .select(
                        "l", "r",
                        (F.coalesce("cnt", F.lit(0))
                         + F.coalesce("d", F.lit(0))).alias("cnt"),
                    )
                    .where(F.col("cnt") != 0),
                    pids, sc,
                )
            finally:
                affected.unpersist()
            cur, ids = _checkpoint_step(
                cur.withColumn("seq", col), ids, sc
            )
    finally:
        for rid in ids | pids:
            sc._jsc.sc().unpersistRDD(rid, False)
    return spark.createDataFrame(
        rules,
        "step int, left string, right string, merged string, pair_count bigint",
    )


#: GPT-2-style pre-tokenizer, LOOKAHEAD-FREE so the identical pattern runs
#: under Java regex (Spark) and RE2 (DuckDB — RE2 has no lookahead, so the
#: original's trailing ``\s+(?!\S)`` branch is simplified away): English
#: contractions, optionally-space-prefixed letter runs, digit runs,
#: punctuation runs, and whitespace runs. Every character of the input
#: lands in exactly one pre-token (spaces ride the following word, the
#: production byte-BPE shape).
GPT2_PRETOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)



def _hex_wrapped(col, sep: str):
    """UTF-8 bytes of ``col`` spelled as sep-wrapped hex byte symbols —
    THE byte-BPE sequence spelling. One definition shared by training,
    vocab, encode, and decode (the _apply_merge_rules discipline: a
    change to the wrapping scheme cannot silently diverge between the
    producers and consumers of a merge table)."""
    return F.regexp_replace(
        F.hex(F.encode(col, "utf-8")), "(..)", f"{sep}$1{sep}"
    )


def _pretoken_col(text_col: str, pretoken_pattern: str):
    """The GPT-2-style pre-token array of a text column — shared by
    every byte-BPE entry point for the same reason as _hex_wrapped."""
    return F.regexp_extract_all(
        F.col(text_col), F.lit(pretoken_pattern), F.lit(0)
    )


def learn_byte_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    sep: str = "·",
    pretoken_pattern: str = GPT2_PRETOKEN_PATTERN,
    target_vocab_size: int | None = None,
    batched: bool = False,
    max_batch: int = 16,
) -> DataFrame:
    """BYTE-level BPE training (GPT-2/tiktoken shape — Radford et al.
    2019): pre-tokenize with a GPT-2-style regex (contractions, leading
    spaces riding the next word), then run Sennrich merges over the
    UTF-8 BYTE sequence of each pre-token instead of characters. The
    byte alphabet means no OOV symbol can ever exist (any text is bytes)
    and no end-of-word marker is needed (pre-token boundaries carry the
    word structure) — exactly the production tokenizer's base alphabet.

    Symbols are HEX BYTE PAIRS ("48", "65", …; merged symbols
    concatenate, "4865"): hex is the one byte spelling that is printable,
    separator-safe, and IDENTICAL in Spark (``hex(encode(tok,'utf-8'))``)
    and DuckDB (``hex(encode(tok))``) — standing in for GPT-2's
    bytes_to_unicode table, which exists for the same reason (printable
    stand-ins for raw bytes). The sep-wrapped merge trick, tie-break
    (count DESC, left ASC, right ASC on the hex spelling), and
    per-step persist discipline carry over from learn_bpe_merges; the
    merge loop runs over the distinct PRE-TOKEN frequency table (one
    corpus-sized shuffle total, Zipf-bounded thereafter).

    Vocab-scale knobs: ``target_vocab_size`` derives the merge count the
    production way — vocab = 256 base byte symbols + one new symbol per
    merge, so ``n_merges = target_vocab_size - 256`` (GPT-2's 50,257 is
    exactly 256 + 50,000 merges + 1 special). ``batched=True`` switches
    to ``_bpe_merge_loop_batched`` — up to ``max_batch`` merges learned
    per 2-job round with a PROVEN-identical merge table (see its
    docstring for the exactness argument; unit- and property-tested
    against the sequential loop on trap corpora).

    Returns ``(step, left, right, merged, pair_count)`` with hex-byte
    symbols — the merges.txt artifact of a byte-level tokenizer."""
    if target_vocab_size is not None:
        if target_vocab_size <= 256:
            raise ValueError(
                "target_vocab_size must exceed the 256-byte base alphabet"
            )
        n_merges = target_vocab_size - 256
    toks = (
        docs.select(F.explode(_pretoken_col(text_col, pretoken_pattern)).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    cur = toks.select("freq", _hex_wrapped(F.col("t"), sep).alias("seq"))
    if batched:
        return _bpe_merge_loop_batched(
            docs.sparkSession, cur, n_merges, sep, max_batch=max_batch
        )
    return _bpe_merge_loop(docs.sparkSession, cur, n_merges, sep)


def byte_bpe_vocab(
    docs: DataFrame,
    n_merges: int = 8,
    top_k: int = 30,
    text_col: str = "text",
    sep: str = "·",
    pretoken_pattern: str = GPT2_PRETOKEN_PATTERN,
) -> DataFrame:
    """Apply learn_byte_bpe's merges to the corpus and count the resulting
    byte-level subword symbols — ``(subword, n_occurrences)`` top ``top_k``
    by (count DESC, subword), the byte-level twin of bpe_subword_vocab.
    Subwords are hex byte strings ("4865" = b"He"); counts are
    freq-weighted over the distinct pre-token table, so the corpus is
    scanned once regardless of merge count."""
    rules = learn_byte_bpe(
        docs, n_merges=n_merges, text_col=text_col, sep=sep,
        pretoken_pattern=pretoken_pattern,
    ).orderBy("step").collect()
    toks = (
        docs.select(F.explode(_pretoken_col(text_col, pretoken_pattern)).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    seq = _apply_merge_rules(_hex_wrapped(F.col("t"), sep), rules, sep)
    return (
        toks.select("freq", seq.alias("seq"))
        .select(
            "freq",
            F.explode(_split_symbols(F.col("seq"), sep)).alias("subword"),
        )
        .groupBy("subword")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("subword"))
        .limit(top_k)
    )


def _apply_merge_rules(seq, rules, sep: str):
    """Chain learned merge rules as sep-wrapped plain replaces — the same
    trick _bpe_merge_loop trains with (Column API, one escaping layer).
    Shared by every consumer of a merge table (vocab, encode) so a change
    to the wrapping scheme cannot silently diverge between them."""
    for r in rules:
        seq = F.replace(
            seq,
            F.lit(f"{sep}{r['left']}{sep}{sep}{r['right']}{sep}"),
            F.lit(f"{sep}{r['merged']}{sep}"),
        )
    return seq


def _split_symbols(seq, sep: str):
    """Recover the symbol array from a sep-wrapped sequence column: strip
    the outer separators, split on the doubled inter-symbol separator."""
    return F.split(
        F.substring(seq, F.lit(1 + len(sep)),
                    F.length(seq) - F.lit(2 * len(sep))),
        re.escape(sep + sep),
    )


def byte_bpe_encode_counts(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    sep: str = "·",
    pretoken_pattern: str = GPT2_PRETOKEN_PATTERN,
    rules: list | None = None,
) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale: encode every document with
    the byte-BPE merges learned from the corpus itself and return the
    per-document token count — ``(*id_cols, n_tokens)`` — the number a
    training pipeline actually bills by (sequence packing, token budgets,
    tokens-per-doc quality cuts all key on it).

    Shape: the merge chain is applied ONCE per distinct pre-token (the
    Zipf-bounded type table), producing a ``type → symbol count`` map;
    documents then join their exploded pre-tokens against it and sum —
    the corpus-sized work is one explode + one join + one groupBy, and
    NO per-document string surgery happens at all (the classic
    type/token split every real tokenizer pipeline uses). Documents with
    zero pre-tokens (empty text) drop out, like a tokenizer emitting
    nothing.

    ``rules`` switches train-and-encode to LOAD-and-encode — the
    production posture (train once, ship merges.txt, every encode job
    loads it): pass ``load_bpe_artifact(path)[0]`` and no training pass
    runs at all."""
    if rules is None:
        rules = learn_byte_bpe(
            docs, n_merges=n_merges, text_col=text_col, sep=sep,
            pretoken_pattern=pretoken_pattern,
        ).orderBy("step").collect()
    seq = _apply_merge_rules(_hex_wrapped(F.col("t"), sep), rules, sep)
    types = (
        docs.select(F.explode(_pretoken_col(text_col, pretoken_pattern)).alias("t"))
        .where(F.col("t") != "")
        .distinct()
        .withColumn("seq", seq)
        .select(
            "t",
            F.size(_split_symbols(F.col("seq"), sep))
            .cast("bigint").alias("n_sym"),
        )
    )
    doc_toks = (
        docs.select(
            *id_cols,
            F.explode(_pretoken_col(text_col, pretoken_pattern)).alias("t"),
        )
        .where(F.col("t") != "")
    )
    return (
        doc_toks.join(types, "t")
        .groupBy(*id_cols)
        .agg(F.sum("n_sym").cast("bigint").alias("n_tokens"))
    )


def byte_bpe_encode_ids(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "·",
    pretoken_pattern: str = GPT2_PRETOKEN_PATTERN,
    rules: list | None = None,
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """Tokenizer ID EMISSION — the artifact's actual product: every
    document becomes its token-ID sequence under the trained byte-BPE
    (base hex-byte symbols at ids 0–255, minted symbols at 256+step−1 —
    ``save_bpe_artifact``'s vocab.json rule), summarized per doc as
    (n_tokens, first_id, last_id, ids_checksum) where ids_checksum =
    Σ position·id over the 1-based GLOBAL token position — the weighting
    makes the gate order-sensitive end to end (a transposed pre-token, a
    mis-ordered merge, or an id off by one all shift the checksum).

    Shape: the merge chain and the symbol→id mapping run once per
    DISTINCT pre-token (the id map rides as a ~264-entry literal map —
    driver metadata, no join); documents posexplode their pre-tokens,
    join the type→ids table, and the per-doc id stream reassembles
    inside ``array_sort`` + ``flatten`` (q300's rebuild idiom — no
    per-doc window). ``rules``/``vocab`` accept a loaded artifact
    (``load_bpe_artifact``) for the train-once/encode-everywhere
    posture; omitted, they derive in-session."""
    if rules is None:
        rules = learn_byte_bpe(
            docs, n_merges=n_merges, text_col=text_col, sep=sep,
            pretoken_pattern=pretoken_pattern,
        ).orderBy("step").collect()
    rules = sorted(rules, key=lambda r: r["step"])
    if vocab is None:
        vocab = {format(i, "02X"): i for i in range(256)}
        for i, r in enumerate(rules):
            vocab[r["left"] + r["right"]] = 256 + i
    seq = _apply_merge_rules(_hex_wrapped(F.col("t"), sep), rules, sep)
    vmap = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in kv]
    )
    types = (
        docs.select(
            F.explode(_pretoken_col(text_col, pretoken_pattern)).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
        .withColumn("__syms", _split_symbols(seq, sep))
        .select(
            "t",
            F.transform(
                "__syms", lambda s: F.element_at(vmap, s).cast("long")
            ).alias("ids"),
        )
    )
    stream = (
        docs.select(
            id_col,
            F.posexplode(
                _pretoken_col(text_col, pretoken_pattern)
            ).alias("pos", "t"),
        )
        .where(F.col("t") != "")
    )
    doc_ids = (
        stream.join(types, "t")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                    lambda x: x["ids"],
                )
            ).alias("ids")
        )
    )
    n = F.size("ids")
    checksum = F.aggregate(
        F.zip_with(
            F.col("ids"),
            F.sequence(F.lit(1), n),
            lambda a, b: a * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return doc_ids.select(
        id_col,
        n.cast("bigint").alias("n_tokens"),
        F.element_at("ids", 1).alias("first_id"),
        F.element_at("ids", -1).alias("last_id"),
        checksum.alias("ids_checksum"),
    )


def save_bpe_artifact(rules, path: str) -> None:
    """Persist a trained byte-BPE merge table as the two plain-text
    files every production tokenizer ships (the GPT-2/huggingface
    artifact contract): ``merges.txt`` — a ``#version`` header then one
    ``left right`` symbol pair per line in merge order — and
    ``vocab.json`` — symbol → id, the 256 base hex-byte symbols at ids
    0–255 then one minted symbol per merge at 256+step−1. Train once,
    ship the artifact, and every encode job loads it instead of
    re-deriving merges from (possibly changed) data — the same
    saved-index contract as ``minhash_index``. ``rules`` is the trainer
    DataFrame ``(step, left, right, merged, pair_count)`` or its
    collected rows; the table is driver metadata (n_merges rows), so
    plain ``open()`` is the right tool, not a Spark write."""
    import json
    import os

    if isinstance(rules, DataFrame):
        rules = rules.orderBy("step").collect()
    rules = sorted(rules, key=lambda r: r["step"])
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for r in rules:
            f.write(f"{r['left']} {r['right']}\n")
    vocab = {format(i, "02X"): i for i in range(256)}
    for i, r in enumerate(rules):
        vocab[r["left"] + r["right"]] = 256 + i
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0)


def load_bpe_artifact(path: str) -> tuple[list[dict], dict[str, int]]:
    """Load ``save_bpe_artifact``'s files back: returns (rules, vocab)
    where rules is ``[{step, left, right, merged}]`` in merge order —
    directly consumable by ``byte_bpe_encode_counts(rules=...)`` /
    ``_apply_merge_rules`` — and vocab is the symbol → id dict. The
    merged spelling is re-derived as left+right (BPE's definition), and
    each rule's id is cross-checked against vocab.json so a hand-edited
    or truncated artifact fails loudly at load, not as silently wrong
    token counts downstream."""
    import json
    import os

    with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    rules = []
    with open(os.path.join(path, "merges.txt"), encoding="utf-8") as f:
        for ln in f:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            l, r = ln.split(" ")
            step = len(rules) + 1
            merged = l + r
            got = vocab.get(merged)
            if got != 255 + step:
                raise ValueError(
                    f"artifact mismatch: merge #{step} mints {merged!r} "
                    f"(expect id {255 + step}) but vocab.json says {got}"
                )
            rules.append(
                {"step": step, "left": l, "right": r, "merged": merged}
            )
    return rules, vocab


def bpe_subword_vocab(
    docs: DataFrame,
    n_merges: int = 8,
    top_k: int = 30,
    text_col: str = "text",
    sep: str = "·",
    eow: str = "¤",
) -> DataFrame:
    """The artifact downstream of learn_bpe_merges: apply the learned
    merge rules to the corpus and count the resulting subword symbols —
    ``(subword, n_occurrences)``, top ``top_k`` by (count DESC, subword).

    The merge table is collected (it IS driver metadata, merges.txt) and
    applied as a chain of plain replaces over the word-frequency table —
    all JVM-side string ops; symbol counts are freq-weighted so the
    corpus is scanned once (the word-table groupBy) no matter how many
    merges apply. Deterministic top-k: ties break on binary subword
    order, same as the oracle's ORDER BY."""
    rules = learn_bpe_merges(
        docs, n_merges=n_merges, text_col=text_col, sep=sep, eow=eow
    ).orderBy("step").collect()
    words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    seq = _apply_merge_rules(
        F.concat(
            F.regexp_replace("w", "(.)", f"{sep}$1{sep}"),
            F.lit(sep + eow + sep),
        ),
        rules, sep,
    )
    return (
        words.select("freq", seq.alias("seq"))
        .select(
            "freq",
            F.explode(_split_symbols(F.col("seq"), sep)).alias("subword"),
        )
        .groupBy("subword")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("subword"))
        .limit(top_k)
    )


def byte_bpe_decode_roundtrip(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "·",
    pretoken_pattern: str = GPT2_PRETOKEN_PATTERN,
) -> DataFrame:
    """Tokenizer DECODE at corpus scale: encode every document with the
    corpus-learned byte merges, then reconstruct the text from the
    symbol stream — ``(id, text)`` where text is REBUILT, never copied.

    Decode must assemble BYTES before decoding UTF-8: byte-level merges
    freely split multi-byte characters, so an individual symbol is not
    necessarily valid UTF-8 — ``unhex`` of the concatenated symbol hex
    per pre-token, decoded once, is (each pre-token's symbols segment
    its byte string, so their concatenation is exactly its bytes). The
    GPT-2 pre-tokenizer partitions the document (every character in
    exactly one pre-token), so pre-tokens re-concatenate in position
    order with no glue. What the identity check proves: the
    pre-tokenizer loses nothing, hex/unhex round-trips every byte, and
    re-assembly preserves order — the encode path is LOSSLESS (merge
    SEMANTICS are pinned separately by the q295/q301 merge-table
    oracles). Shape: the merge chain and decode run once per DISTINCT
    pre-token (Zipf-bounded); the corpus-sized work is one posexplode +
    one join + one per-doc rebuild (same array_sort idiom as
    ExactSubstr excision — no per-doc window)."""
    rules = learn_byte_bpe(
        docs, n_merges=n_merges, text_col=text_col, sep=sep,
        pretoken_pattern=pretoken_pattern,
    ).orderBy("step").collect()
    seq = _apply_merge_rules(_hex_wrapped(F.col("t"), sep), rules, sep)
    type_map = (
        docs.select(F.explode(_pretoken_col(text_col, pretoken_pattern)).alias("t"))
        .where(F.col("t") != "")
        .distinct()
        .withColumn("seq", seq)
        .select(
            "t",
            F.decode(
                F.unhex(F.concat_ws("", _split_symbols(F.col("seq"), sep))),
                "utf-8",
            ).alias("dec"),
        )
    )
    stream = docs.select(
        F.col(id_col),
        F.posexplode(_pretoken_col(text_col, pretoken_pattern)).alias("pos", "t"),
    ).where(F.col("t") != "")
    return (
        stream.join(type_map, "t")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "dec"))),
                    lambda x: x["dec"],
                ),
            ).alias(text_col)
        )
    )


def _token_freq(docs: DataFrame, text_col: str) -> DataFrame:
    """(tok, cnt) over the whitespace token stream — the type table every
    sketch in this module builds from."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def countmin_table(
    docs: DataFrame,
    depth: int = 4,
    width_nibbles: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """The raw COUNT-MIN table as a frame — (r, cell, tot), one row per
    non-empty cell. This is the MERGEABLE artifact: tables of two
    corpus shards (or two days) combine by cell-wise ADD into exactly
    the whole's table (unit-pinned), which is why a 1 KB sketch per
    partition rolls up to corpus scale with one tiny agg — no re-scan.
    Same hashing as ``countmin_token_counts`` (shared cell columns)."""
    freq = _token_freq(docs, text_col)
    stream = None
    for r in range(depth):
        part = freq.select(
            F.lit(r).alias("r"),
            _md5_bucket(f"concat('{r}:', tok)", width_nibbles)
            .cast("bigint").alias("cell"),
            "cnt",
        )
        stream = part if stream is None else stream.unionAll(part)
    return stream.groupBy("r", "cell").agg(
        F.sum("cnt").cast("bigint").alias("tot")
    )


def countmin_token_counts(
    docs: DataFrame,
    depth: int = 4,
    width_nibbles: int = 2,
    top_n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """COUNT-MIN SKETCH over the corpus token stream (Cormode &
    Muthukrishnan 2005) — the heavy-hitter sketch every streaming corpus
    profiler runs when exact per-token counts don't fit: a depth ×
    width integer table (width = 16^``width_nibbles``), cell (r, tok) =
    the leading md5 nibbles of ``"{r}:{tok}"`` (the engine's
    reproducible-hash idiom — ``_md5_bucket``/SimHash), every token adds
    its multiplicity to one cell per row, and a point estimate is the
    MIN over rows — never an underestimate (every cell ≥ the true
    count), which the unit pins. Emits the ``top_n`` true-heaviest
    tokens as (tok, true_cnt, cm_est) so the sketch error is *visible*
    against truth — all exact integers, one SQL hash gate.

    Scale posture: counts aggregate per DISTINCT token first (Zipf-
    bounded type table), the 4×-types cell stream reduces to the
    depth·width table (metadata — 1 KB at the defaults, the whole point:
    the sketch is mergeable across partitions/days by cell-wise add);
    estimates join the top slice against it."""
    freq = _token_freq(docs, text_col)
    cells = freq.select(
        "tok", "cnt",
        *[
            _md5_bucket(f"concat('{r}:', tok)", width_nibbles)
            .cast("bigint").alias(f"c{r}")
            for r in range(depth)
        ],
    ).persist()
    try:
        stream = None
        for r in range(depth):
            part = cells.select(
                F.lit(r).alias("r"), F.col(f"c{r}").alias("cell"), "cnt"
            )
            stream = part if stream is None else stream.unionAll(part)
        cm = stream.groupBy("r", "cell").agg(
            F.sum("cnt").cast("bigint").alias("tot")
        )
        top = cells.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_n)
        probe = None
        for r in range(depth):
            part = top.select(
                "tok", "cnt", F.lit(r).alias("r"),
                F.col(f"c{r}").alias("cell"),
            )
            probe = part if probe is None else probe.unionAll(part)
        rows = (
            probe.join(cm, ["r", "cell"])
            .groupBy("tok")
            .agg(
                F.first("cnt").alias("true_cnt"),
                F.min("tot").cast("bigint").alias("cm_est"),
            )
            .collect()
        )
    finally:
        cells.unpersist()
    # top_n rows of driver metadata — materialized before the cache is
    # released, so the trainer keeps the zero-retained-blocks promise
    return docs.sparkSession.createDataFrame(
        [(r["tok"], int(r["true_cnt"]), int(r["cm_est"])) for r in rows],
        "tok string, true_cnt bigint, cm_est bigint",
    )


# ----------------------------------------------------------------- L4
# HDR-style log-linear quantile sketch — the mergeable QUANTILE half of
# the corpus-monitoring family (the CM sketch above is the heavy-hitter
# half). The layout is HdrHistogram's public log-linear bucketing
# (Tene's HdrHistogram; DDSketch's log buckets are the same idea with a
# float base): exact unit buckets below 2**sub_bits, then per power-of-
# two magnitude 2**(sub_bits-1) linear sub-buckets, giving relative
# error <= 2**(1-sub_bits) (6.25% at the default 5) with a table of a
# few hundred cells at ANY corpus size. Everything is integer and
# DETERMINISTIC — no KLL compaction coin-flips — so the sketch CONTENT
# is value-hash-checkable, and tables merge by cell-wise ADD into
# exactly the whole's table (the q325 mergeability contract, unit-
# pinned), which is what lets a per-shard 1 KB sketch roll up to 100 TB
# with one tiny agg.


def hdr_bucket_expr(value_expr: str, sub_bits: int = 5) -> str:
    """The bucket index as a Spark SQL expression over ``value_expr``
    (a non-negative bigint): v < 2**s maps to itself (exact smalls);
    otherwise, with m = bit-length (LENGTH(BIN(v)) — integer-exact in
    both engines) and e = m − s, idx = 2**s + (e−1)·2**(s−1) +
    (v − 2**(m−1)) div 2**e. Monotonic in v (cells are contiguous
    value ranges), so rank queries on the table are rank queries on the
    data. The DuckDB twin swaps DIV for ``//`` — POW(2, k) is an exact
    double for any k here, so the two dialects agree bit-for-bit
    (pinned by the q327 gate)."""
    s = sub_bits
    v = f"({value_expr})"
    return (
        f"CASE WHEN {v} < {2 ** s} THEN {v} "
        f"ELSE {2 ** s} + (LENGTH(BIN({v})) - {s + 1}) * {2 ** (s - 1)} "
        f"+ ({v} - CAST(POW(2, LENGTH(BIN({v})) - 1) AS BIGINT)) "
        f"DIV CAST(POW(2, LENGTH(BIN({v})) - {s}) AS BIGINT) END"
    )


def hdr_lb_expr(idx_expr: str, sub_bits: int = 5) -> str:
    """Decode a bucket index back to its range's inclusive LOWER bound
    (Spark SQL dialect): idx < 2**s is itself; else with t = idx − 2**s,
    e = t div 2**(s−1) + 1, lb = 2**(s+e−1) + (t mod 2**(s−1))·2**e."""
    s = sub_bits
    t = f"(({idx_expr}) - {2 ** s})"
    return (
        f"CASE WHEN ({idx_expr}) < {2 ** s} THEN ({idx_expr}) "
        f"ELSE CAST(POW(2, {t} DIV {2 ** (s - 1)} + {s}) AS BIGINT) "
        f"+ ({t} % {2 ** (s - 1)}) "
        f"* CAST(POW(2, {t} DIV {2 ** (s - 1)} + 1) AS BIGINT) END"
    )


def hdr_width_expr(idx_expr: str, sub_bits: int = 5) -> str:
    """Decode a bucket index to its range WIDTH (2**e; 1 for the exact
    small buckets) — ub = lb + width − 1."""
    s = sub_bits
    t = f"(({idx_expr}) - {2 ** s})"
    return (
        f"CASE WHEN ({idx_expr}) < {2 ** s} THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(POW(2, {t} DIV {2 ** (s - 1)} + 1) AS BIGINT) END"
    )


def hdr_histogram_table(
    df: DataFrame, value_col: str, sub_bits: int = 5
) -> DataFrame:
    """The raw HDR table as a frame — (idx, cnt), one row per non-empty
    bucket: ONE map-side bucket expression + one tiny agg is the only
    corpus-sized work (the countmin_table posture). The table is the
    MERGEABLE artifact: shard tables cell-wise-ADD into exactly the
    whole's table, so per-partition/per-day sketches roll up without
    re-scanning."""
    return (
        df.select(
            F.expr(hdr_bucket_expr(value_col, sub_bits))
            .cast("bigint").alias("idx")
        )
        .groupBy("idx")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def hdr_quantiles(
    table: DataFrame,
    qs_permille: list[int],
    sub_bits: int = 5,
) -> DataFrame:
    """Quantile estimates from an HDR table: for each q (permille), the
    rank-ceil(q·N/1000) element's bucket — found where the cumulative
    count over ascending idx first reaches the rank (bucketing is
    monotonic, so the bucket CONTAINS the exact order statistic:
    est_lo <= exact <= est_hi, the sketch's whole guarantee, pinned by
    the q327 gate). All work runs on the metadata-sized table (a few
    hundred cells), never the corpus. Returns (q_permille, est_lo,
    est_hi)."""
    spark = table.sparkSession
    cum = table.select(
        "idx", "cnt",
        F.sum("cnt").over(
            Window.orderBy("idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    ).withColumn("n_total", F.sum("cnt").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ))
    qf = spark.createDataFrame(
        [(int(q),) for q in qs_permille], "q_permille bigint"
    )
    hit = (
        qf.crossJoin(cum)
        .where(
            F.col("cum")
            >= F.expr("(q_permille * n_total + 999) DIV 1000")
        )
        .groupBy("q_permille")
        .agg(F.min("idx").alias("idx"))
    )
    return hit.select(
        "q_permille",
        F.expr(hdr_lb_expr("idx", sub_bits)).cast("bigint")
        .alias("est_lo"),
        (
            F.expr(hdr_lb_expr("idx", sub_bits))
            + F.expr(hdr_width_expr("idx", sub_bits)) - 1
        ).cast("bigint").alias("est_hi"),
    )


def hdr_histogram_table_grouped(
    df: DataFrame, group_col: str, value_col: str, sub_bits: int = 5
) -> DataFrame:
    """Per-group HDR tables in ONE pass — (group, idx, cnt): the same
    map-side bucket expression, grouped by (group, idx). Group count ×
    a few hundred cells stays metadata-sized for any realistic group
    key (sources, languages, embedding dimensions)."""
    return (
        df.select(
            F.col(group_col),
            F.expr(hdr_bucket_expr(value_col, sub_bits))
            .cast("bigint").alias("idx"),
        )
        .groupBy(group_col, "idx")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def hdr_quantiles_grouped(
    table: DataFrame,
    group_col: str,
    qs_permille: list[int],
    sub_bits: int = 5,
) -> DataFrame:
    """Per-group quantile estimates from a grouped HDR table: the
    ``hdr_quantiles`` rank rule applied within each group (cumulative
    count over ascending idx PER GROUP — a keyed window, so the
    metadata-sized table never serializes through one task). Returns
    (group, q_permille, est_lo, est_hi)."""
    spark = table.sparkSession
    gw = Window.partitionBy(group_col).orderBy("idx")
    cum = table.select(
        group_col, "idx", "cnt",
        F.sum("cnt").over(
            gw.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(group_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    qf = spark.createDataFrame(
        [(int(q),) for q in qs_permille], "q_permille bigint"
    )
    hit = (
        qf.crossJoin(cum)
        .where(
            F.col("cum")
            >= F.expr("(q_permille * n_total + 999) DIV 1000")
        )
        .groupBy(group_col, "q_permille")
        .agg(F.min("idx").alias("idx"))
    )
    return hit.select(
        group_col, "q_permille",
        F.expr(hdr_lb_expr("idx", sub_bits)).cast("bigint")
        .alias("est_lo"),
        (
            F.expr(hdr_lb_expr("idx", sub_bits))
            + F.expr(hdr_width_expr("idx", sub_bits)) - 1
        ).cast("bigint").alias("est_hi"),
    )


def trigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    l3: float = 0.6,
    l2: float = 0.3,
    l1: float = 0.1,
) -> DataFrame:
    """Interpolated (Jelinek-Mercer) TRIGRAM LM cross-entropy per doc —
    the order-3 upgrade of ``bigram_lm_scores``' add-one bigram model,
    the smoothing family real n-gram scorers (KenLM-class) interpolate:

        p(w3|w1w2) = λ3·c(w1w2w3)/c(w1w2·) + λ2·c(w2w3)/c(w2·) + λ1·c(w3)/N

    with each ratio defined 0 when its context count is 0 (a fresh
    context backs off to the lower orders; λ1·c(w3)/N > 0 whenever the
    token exists, so self-trained scoring never hits log 0). Count
    tables: trigram and trigram-context from one trigram explode,
    bigram and bigram-context from one bigram explode, unigram + total
    from one token explode — all exact bigint.

    Determinism: each ratio is ONE IEEE double division of exact
    integers and the interpolation is three multiply-adds with shared
    literal λs — bit-identical across engines; the per-trigram NLL
    snaps to integer micro-nats and the per-doc mean is
    floor(sum/n + 0.5) on the exact integer sum.

    Scale shape: three count aggregations keyed on high-cardinality
    n-grams, keyed joins back to the doc trigrams, one per-doc sum —
    the q96 plan one order higher; nothing collected, the only
    broadcast is the 1-row token total."""
    toks = F.split(F.col(text_col), " ")
    n2 = F.greatest(F.size(toks) - 2, F.lit(0))
    trigrams = F.zip_with(
        F.slice(toks, 1, n2),
        F.zip_with(
            F.slice(toks, 2, n2),
            F.slice(toks, 3, n2),
            lambda y, z: F.struct(y.alias("w2"), z.alias("w3")),
        ),
        lambda x, yz: F.struct(
            x.alias("w1"), yz["w2"].alias("w2"), yz["w3"].alias("w3")
        ),
    )
    dt = docs.select(id_col, F.explode(trigrams).alias("tg")).select(
        id_col, "tg.w1", "tg.w2", "tg.w3"
    )
    c3 = dt.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    cx3 = dt.groupBy("w1", "w2").agg(F.count("*").alias("cx3"))
    db = _bigram_explode(docs, id_col, text_col)
    c2 = (
        db.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .withColumnRenamed("w1", "b1")
        .withColumnRenamed("w2", "b2")
    )
    cx2 = db.groupBy("w1").agg(F.count("*").alias("cx2")).withColumnRenamed(
        "w1", "x2"
    )
    tok = docs.select(F.explode(toks).alias("t")).where(F.col("t") != "")
    c1 = tok.groupBy("t").agg(F.count("*").alias("c1"))
    tot = tok.agg(F.count("*").cast("bigint").alias("n_tok"))
    r3 = F.when(
        F.coalesce("cx3", F.lit(0)) > 0,
        F.coalesce("c3", F.lit(0)).cast("double") / F.col("cx3"),
    ).otherwise(F.lit(0.0))
    r2 = F.when(
        F.coalesce("cx2", F.lit(0)) > 0,
        F.coalesce("c2", F.lit(0)).cast("double") / F.col("cx2"),
    ).otherwise(F.lit(0.0))
    r1 = F.coalesce("c1", F.lit(0)).cast("double") / F.col("n_tok")
    p = F.lit(l3) * r3 + F.lit(l2) * r2 + F.lit(l1) * r1
    return (
        dt.join(c3, ["w1", "w2", "w3"], "left")
        .join(cx3, ["w1", "w2"], "left")
        .join(c2, (F.col("w2") == F.col("b1")) & (F.col("w3") == F.col("b2")), "left")
        .join(cx2, F.col("w2") == F.col("x2"), "left")
        .join(c1, F.col("w3") == F.col("t"), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.floor(-F.log(p) * 1000000 + 0.5).cast("long").alias("nll_micro"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.round(
                F.floor(F.sum("nll_micro") / F.count("*") + 0.5) / 1000000.0, 6
            ).alias("xent"),
        )
    )
