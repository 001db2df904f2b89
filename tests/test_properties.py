"""Property-based tests (hypothesis): custom operators vs independent pure-
Python references on randomized small inputs. The reference repo has no
property tests (SURVEY.md §5); these cover the operators whose edge cases a
fixed fixture can miss (as-of tie/empty-side behavior, salt invisibility,
component merging).

max_examples is kept small — every example runs real Spark jobs — but each
example is adversarially shaped (tiny key spaces force collisions, ties,
empty sides).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts, payload) rows; 2-key space and 0-9 ts force collisions and ties
left_rows = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 9)), min_size=0, max_size=8
)
right_rows = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 9), st.integers(0, 99)),
    min_size=0,
    max_size=8,
)


@PROP
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    from rdkafka_streams_spark.operators.asof import asof_join

    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    if not lrows:
        return
    left = spark.createDataFrame(lrows, "k int, ts int, lid int")
    right = (
        spark.createDataFrame(rrows, "k int, ts int, payload int")
        if rrows
        else spark.createDataFrame([], "k int, ts int, payload int")
    )
    if not rrows:
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", payload=["payload"]
        ).collect()
        assert {(r["lid"], r["payload_asof"]) for r in out} == {
            (lid, None) for _, _, lid in lrows
        }
        return
    got = {
        (r["lid"], r["payload_asof"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", payload=["payload"]
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(rrows, columns=["k", "ts", "payload"])
        # merge_asof ties broken by order: take the LAST right row at equal
        # (k, ts) to match last(ignorenulls) carry-forward
        .sort_values(["ts", "payload"], kind="stable")
    )
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", allow_exact_matches=False, direction="backward"
    )
    # carry-forward picks the right row latest in the window order at equal
    # ts; merge_asof picks the last row in input order — both resolved by the
    # payload sort above only when payloads are unique per (k, ts). Drop
    # ambiguous examples instead of encoding one engine's tiebreak.
    dup = rp.duplicated(subset=["k", "ts"], keep=False)
    if bool(dup.any()):
        return
    expect = {
        (int(r.lid), None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == expect


@PROP
@given(
    lrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 99)), max_size=12),
    rrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 99)), max_size=6),
)
def test_salted_join_equals_plain_join(spark, lrows, rrows):
    from rdkafka_streams_spark.operators.skew import salted_join

    left = spark.createDataFrame(lrows or [(99, 0)], "k int, lv int")
    right = spark.createDataFrame(rrows or [(98, 0)], "k int, rv int")
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(left, right, "k", n_salts=4, how=how).collect())
        )
        expect = sorted(map(tuple, left.join(right, "k", how).collect()))
        assert got == expect, f"{how} diverged"


@PROP
@given(edges=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15))
def test_connected_components_matches_union_find(spark, edges):
    from rdkafka_streams_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {(r["node"], r["component"]) for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {(n, find(n)) for n in parent}
    assert got == expect


@PROP
@given(text=st.text(alphabet="ab c", min_size=0, max_size=12), n=st.integers(2, 4))
def test_char_shingles_match_python(spark, text, n):
    from rdkafka_streams_spark.llm.dedup import char_shingles

    df = spark.createDataFrame([(text,)], "text string")
    (got,) = df.select(char_shingles("text", n).alias("sh")).collect()
    if len(text) < n:
        # short-text rule: one truncated shingle (''-text ⇒ [''] — all empty
        # docs share the same singleton shingle set)
        expect = [text]
    else:
        seen = set()
        expect = []
        for i in range(len(text) - n + 1):
            s = text[i : i + n]
            if s not in seen:
                seen.add(s)
                expect.append(s)
    assert got["sh"] == expect


# docs: token counts 0-12 from a 3-token alphabet (forces dup ngrams + short docs)
doc_rows = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@PROP
@given(docs=doc_rows, chunk=st.integers(2, 6), overlap=st.integers(0, 4))
def test_chunking_reconstructs_documents(spark, docs, chunk, overlap):
    """Losslessness: stripping each chunk's leading `overlap` tokens (except
    chunk 0) and concatenating reconstructs the original document exactly —
    no token lost or duplicated at any window boundary."""
    from rdkafka_streams_spark.llm.text import chunk_documents

    if overlap >= chunk:
        return
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    for doc_id, text in rows:
        chunks = [c for _, c in sorted(by_doc[doc_id])]
        rebuilt: list[str] = []
        for i, c in enumerate(chunks):
            toks = c.split(" ") if c else [""]
            rebuilt.extend(toks if i == 0 else toks[overlap:])
        assert " ".join(rebuilt) == text, (doc_id, chunks)


@PROP
@given(docs=doc_rows, seq_len=st.integers(2, 20))
def test_packing_matches_greedy_reference(spark, docs, seq_len):
    """seq_id equals a pure-Python greedy running-sum packer over the same
    id order; sequence ids are dense and non-decreasing."""
    from rdkafka_streams_spark.llm.text import pack_sequences

    rows = [(i, "g", " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["seq_id"]
           for r in pack_sequences(df, seq_len=seq_len, group_col="lang").collect()}
    cum = 0
    for i, toks in enumerate(docs):
        n = len(" ".join(toks).split(" "))  # split semantics: empty text → 1 token
        assert got[i] == cum // seq_len, (i, cum, got)
        cum += n


@PROP
@given(edges=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15))
def test_connected_components_star_matches_label_propagation(spark, edges):
    """The alternating small-star/large-star variant computes exactly the
    same (node, component=min-id) labeling as min-label propagation on
    randomized multigraphs with self-loops, parallel edges, and hubs."""
    from rdkafka_streams_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    if all(a == b for a, b in edges):
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    via_prop = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    via_star = {(r["node"], r["component"]) for r in connected_components_star(df).collect()}
    assert via_star == via_prop


@PROP
@given(docs=doc_rows, min_shared=st.integers(1, 3), max_df=st.integers(1, 5))
def test_decontaminate_matches_python_reference(spark, docs, min_shared, max_df):
    """decontaminate == a pure-Python shingle-overlap computation with the
    same df cap, on randomized corpora (docs alternate train/eval by id)."""
    from rdkafka_streams_spark.llm.dedup import decontaminate

    n = 2  # token bigram shingles keep tiny docs productive
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train_df = df.where(F.col("doc_id") % 2 == 0)
    eval_df = df.where(F.col("doc_id") % 2 == 1)
    got = {(r["eval_id"], r["train_id"]): r["n_shared"]
           for r in decontaminate(train_df, eval_df, n=n, min_shared=min_shared,
                                  max_df=max_df).collect()}

    def shingles(toks):
        joined = " ".join(toks).split(" ")  # mirror split semantics
        return {" ".join(joined[i:i + n]) for i in range(len(joined) - n + 1)} \
            if len(joined) >= n else set()

    train = {i: shingles(t) for i, t in enumerate(docs) if i % 2 == 0}
    evald = {i: shingles(t) for i, t in enumerate(docs) if i % 2 == 1}
    df_count: dict[str, int] = {}
    for sh in train.values():
        for s in sh:
            df_count[s] = df_count.get(s, 0) + 1
    keep = {s for s, c in df_count.items() if c <= max_df}
    expect = {}
    for ei, es in evald.items():
        for ti, ts in train.items():
            c = len(es & ts & keep)
            if c >= min_shared:
                expect[(ei, ti)] = c
    assert got == expect


# change logs: (key, ts, value) in tiny spaces to force same-key runs,
# same-ts ties (broken by the synthetic eid), and single-row keys
change_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.integers(0, 2)),
    min_size=1,
    max_size=10,
)


@PROP
@given(rows=change_rows, split=st.integers(0, 10))
def test_scd2_matches_python_and_merge_equals_rebuild(spark, rows, split):
    """scd2_build vs an independent pure-Python SCD2 (sort per key, drop
    consecutive no-ops, chain valid_to), AND scd2_merge(earlier part,
    later part) vs the one-shot rebuild. The split is on time order —
    scd2_merge's contract is in-order CDC delivery per key (a change
    older than closed history would silently rewrite it); inside a part,
    keys, ties and no-op runs stay adversarial."""
    from rdkafka_streams_spark.operators.cdc import scd2_build, scd2_merge

    recs = [(k, t, eid, str(v)) for eid, (k, t, v) in enumerate(rows)]
    schema = "k long, ts long, eid long, v string"

    def py_scd2(items):
        bykey: dict[int, list] = {}
        for k, t, eid, v in items:
            bykey.setdefault(k, []).append((t, eid, v))
        out = []
        for k, seq in bykey.items():
            seq.sort()
            versions = []
            for t, eid, v in seq:
                if not versions or versions[-1][2] != v:
                    versions.append((t, eid, v))
            for i, (t, eid, v) in enumerate(versions):
                nxt = versions[i + 1][0] if i + 1 < len(versions) else None
                out.append((k, v, t, nxt, nxt is None))
        return set(out)

    want = py_scd2(recs)
    df = spark.createDataFrame(recs, schema)
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_build(df, "k", "ts", ["v"], tiebreak="eid").collect()
    }
    assert got == want

    ordered = sorted(recs, key=lambda r: (r[1], r[2]))
    part1, part2 = ordered[:split], ordered[split:]
    if part1 and part2:
        dim = scd2_build(spark.createDataFrame(part1, schema), "k", "ts", ["v"], tiebreak="eid")
        merged = scd2_merge(dim, spark.createDataFrame(part2, schema), "k", "ts", ["v"], tiebreak="eid")
        got_m = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in merged.collect()
        }
        assert got_m == want


# (group, id) memberships; tiny group space forces skewed + singleton groups
mix_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=20, unique=True
)


@PROP
@given(rows=mix_rows, total=st.integers(1, 15))
def test_temperature_sample_quota_invariants(spark, rows, total):
    """temperature_sample on adversarial mixtures: per-group output is
    exactly min(quota, group size); quotas are integer floor shares so the
    grand total never exceeds the request; the selection is deterministic
    (same input → same rows, it's hash-ranked, not RNG)."""
    import math

    from rdkafka_streams_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame(rows, "grp int, id long")
    out = temperature_sample(df, group_col="grp", id_col="id", total=total, tau=0.5).collect()

    sizes: dict[int, int] = {}
    for g, _ in rows:
        sizes[g] = sizes.get(g, 0) + 1
    m = {g: math.floor(math.sqrt(n) * 1e6 + 0.5) for g, n in sizes.items()}
    tm = sum(m.values())
    want_quota = {g: (total * m[g]) // tm for g in sizes}

    got_per_group: dict[int, int] = {}
    for r in out:
        got_per_group[r["grp"]] = got_per_group.get(r["grp"], 0) + 1
        assert r["k_target"] == want_quota[r["grp"]]
    for g, n in sizes.items():
        assert got_per_group.get(g, 0) == min(want_quota[g], n)
    assert len(out) <= total

    again = temperature_sample(df, group_col="grp", id_col="id", total=total, tau=0.5).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


@PROP
@given(
    words=st.lists(st.text(alphabet="ab", min_size=0, max_size=5), min_size=1, max_size=12)
)
def test_fuzzy_join_dist1_matches_python_levenshtein(spark, words):
    """Deletion-neighborhood join == brute-force dist≤1 pairs on random
    short strings (covers equal strings, substitutions, insert/delete
    across lengths, and the empty string)."""
    from rdkafka_streams_spark.operators.editdist import fuzzy_join_dist1

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_join_dist1(df, key="id", text="s").collect()
    }
    want = {
        (i, j)
        for i, (_, wa) in enumerate(rows)
        for j in range(i + 1, len(rows))
        if lev(wa, rows[j][1]) <= 1
    }
    assert got == want


@PROP
@given(
    build=st.sets(st.integers(0, 500), min_size=0, max_size=40),
    probe=st.sets(st.integers(0, 500), min_size=1, max_size=60),
)
def test_bloom_prune_never_drops_true_keys(spark, build, probe):
    from rdkafka_streams_spark.operators.bloomjoin import bloom_build, bloom_prune

    bdf = spark.createDataFrame([(k,) for k in build] or [(None,)], "k int").where(
        "k is not null"
    )
    pdf = spark.createDataFrame([(k,) for k in probe], "k int")
    bloom = bloom_build(bdf, "k", n_bits=1 << 12, k=2)
    surviving = {r["k"] for r in bloom_prune(pdf, "k", bloom, n_bits=1 << 12, k=2).collect()}
    assert (build & probe) <= surviving


@PROP
@given(
    seg_sizes=st.lists(st.integers(1, 4), min_size=1, max_size=5),
    cutoff_frac=st.integers(0, 12),
    do_compact=st.booleans(),
)
def test_delete_records_matches_reference_model(seg_sizes, cutoff_frac, do_compact):
    """delete_records ≡ the one-line model "drop offsets < cutoff" on any
    segment layout — including gapped compacted segments and cutoffs at,
    inside, past, and beyond every boundary — and the end offset is
    invariant."""
    import tempfile

    from rdkafka_streams_spark.streaming.topiclog import TopicLog, _read_range

    root = tempfile.mkdtemp(prefix="dr_prop_")
    log = TopicLog(root)
    log.create_topic("t", partitions=1)
    off = 0
    for size in seg_sizes:
        # key reuse (key = offset % 3) makes compaction produce real gaps
        log.append(
            "t",
            [f"v{off + i}" for i in range(size)],
            keys=[f"k{(off + i) % 3}" for i in range(size)],
            partition=0,
        )
        off += size
    end = off
    if do_compact:
        log.compact("t")
    surviving = {
        o: v.decode()
        for _k, v, _t, _p, o, _ts, _tt in _read_range(root, "t", 0, 0, end)
    }
    cutoff = min(cutoff_frac, end + 1)
    log.delete_records("t", {0: cutoff})
    eff = min(cutoff, end)
    expect = {o: v for o, v in surviving.items() if o >= eff}
    got = {
        o: v.decode()
        for _k, v, _t, _p, o, _ts, _tt in _read_range(root, "t", 0, 0, end)
    }
    assert got == expect
    assert log.end_offsets("t") == {0: end}


@PROP
@given(lrows=left_rows, rrows=right_rows)
def test_asof_forward_matches_pandas_merge_asof(spark, lrows, rrows):
    """direction='forward' ≡ pandas merge_asof(direction='forward',
    allow_exact_matches=False) on every randomized (key, ts) layout —
    ties and no-later-match cases included."""
    from rdkafka_streams_spark.operators.asof import asof_join

    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    if not lrows or not rrows:
        return
    left = spark.createDataFrame(lrows, "k int, ts int, lid int")
    right = spark.createDataFrame(rrows, "k int, ts int, payload int")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "payload"]).sort_values(
        ["ts", "payload"], kind="stable"
    )
    if bool(rp.duplicated(subset=["k", "ts"], keep=False).any()):
        return  # ambiguous tiebreak — engine-specific, skip (as backward does)
    got = {
        (r["lid"], r["payload_asof"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            payload=["payload"], direction="forward",
        ).collect()
    }
    lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", allow_exact_matches=False, direction="forward"
    )
    expect = {
        (int(r.lid), None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == expect


@PROP
@given(
    rows=st.lists(st.integers(0, 20), min_size=1, max_size=40),
    nparts=st.integers(1, 6),
)
def test_global_rank_equals_partitionless_row_number(spark, rows, nparts):
    """global_rank (range partition + local ranks + driver-side
    zipWithIndex offsets) ≡ a plain partition-less row_number over the
    same total order — on randomized data with heavy duplicates and
    every partition-count shape (including more partitions than rows)."""
    from pyspark.sql import Window

    from rdkafka_streams_spark.operators.ranking import global_rank

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(rows)], "v int, uid int"
    )
    got = {
        (r["uid"], r["rn"])
        for r in global_rank(df, ["v", "uid"], num_partitions=nparts).collect()
    }
    w = Window.orderBy("v", "uid")
    expect = {
        (r["uid"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w).cast("bigint")).collect()
    }
    assert got == expect


@settings(max_examples=200, deadline=None)
@given(
    n_src=st.integers(min_value=1, max_value=200),
    aborted=st.sets(st.integers(min_value=0, max_value=199)),
    commits=st.lists(st.integers(min_value=0, max_value=260),
                     min_size=1, max_size=12),
)
def test_mirror_translation_envelope_property(n_src, aborted, commits):
    """Pure-python property for the bounded sync store's translation
    contract (streaming/mirror.py): for ANY pattern of filtered/aborted
    source records and ANY commit offset,

    - translation NEVER overshoots the true resume position (at-least-
      once is unconditional: a failed-over consumer may re-read, never
      skip a surviving record), and
    - with no filtering at all, translation is EXACT at every offset.

    The entry set is built exactly the way mirror_topic's distributed
    sync pass selects candidates (exponential grid off the head, gap
    anchors with the gap's first skipped offset, first + seal) and then
    thinned with the production _thin."""
    from rdkafka_streams_spark.streaming.mirror import (
        _thin,
        _translate_one,
    )

    survivors = [s for s in range(n_src) if s not in aborted]
    if not survivors:
        return  # nothing replicated; no store exists
    head = len(survivors)  # dst offsets are 0..head-1
    # candidate selection, mirroring the distributed pass
    entries = []
    prev = None
    for d, s in enumerate(survivors):
        dist = head - 1 - d
        on_grid = dist == 0 or (dist > 0 and (dist & (dist - 1)) == 0)
        gs = None
        if prev is not None and s - prev > 1:
            gs = prev + 1
        is_first = prev is None
        if on_grid or gs is not None or is_first:
            entries.append({"s": s, "d": d, "gs": gs})
        prev = s
    store = _thin(entries, head)
    assert len(store) <= 64 + 32 + 2  # the boundedness contract
    for c in commits:
        got = _translate_one(store, c, 0, head)
        # true resume position: dst of the first survivor at/after c
        actual = sum(1 for s in survivors if s < c)
        assert 0 <= got <= min(actual, head), (
            f"overshoot: c={c} got={got} actual={actual}"
        )
        if not aborted:
            assert got == min(max(c, 0), head), f"inexact 1:1: c={c} got={got}"


@settings(max_examples=60, deadline=None)
@given(
    n_records=st.integers(min_value=1, max_value=40),
    script=st.lists(
        st.tuples(
            st.sampled_from(["fetch", "ack", "release", "reject", "tick"]),
            st.integers(min_value=0, max_value=2),   # member index
            st.integers(min_value=1, max_value=7),   # batch size / count
        ),
        min_size=5, max_size=60,
    ),
)
def test_share_group_state_machine_property(tmp_path_factory, n_records,
                                            script):
    """Random interleavings of fetch/ack/release/reject/lock-expiry across
    3 members must preserve the share-group invariants:

    - a record is never held by two members at once (each offset has at
      most one live lock);
    - per-record state only moves along Available→Acquired→{Acknowledged,
      Available, Archived} (no resurrection past finalization);
    - tracked state stays within in-flight + out-of-order gap;
    - an always-ack drain terminates with SPSO == SPEO and zero state.
    """
    from rdkafka_streams_spark.streaming.sharegroups import ShareGroup
    from rdkafka_streams_spark.streaming.topiclog import TopicLog

    root = str(tmp_path_factory.mktemp("sgprop"))
    log = TopicLog(root)
    log.create_topic("q", partitions=1)
    log.append("q", [f"r{i}" for i in range(n_records)], partition=0)
    sg = ShareGroup(root, "g", delivery_attempt_limit=3,
                    lock_duration_ms=50, max_record_locks=10)
    members = ("a", "b", "c")
    held: dict[int, str] = {}      # offset -> member (live locks we issued)
    finalized: set[int] = set()    # acked/rejected offsets (terminal)
    now = 1_000_000
    for op, mi, k in script:
        m = members[mi]
        if op == "tick":
            now += 60  # expire every live lock
            held.clear()
        elif op == "fetch":
            got = sg.fetch("q", m, max_records=k, now_ms=now)
            for r in got:
                o = r["offset"]
                assert o not in held, "double acquisition"
                assert o not in finalized, "finalized record re-dispensed"
                held[o] = m
        else:
            mine = [o for o, who in held.items() if who == m][:k]
            if not mine:
                continue
            getattr(sg, op)("q", m, {0: mine}, now_ms=now)
            for o in mine:
                del held[o]
                if op in ("ack", "reject"):
                    finalized.add(o)
        assert sg.state_size("q") <= 10 + len(finalized) + n_records - \
            sg.describe("q")[0]["spso"]
    # drain to completion with an always-ack member
    now += 60
    while True:
        got = sg.fetch("q", "z", max_records=10, now_ms=now)
        if not got:
            break
        sg.ack("q", "z", {0: [r["offset"] for r in got]}, now_ms=now)
        now += 1
    d = sg.describe("q")[0]
    assert d["spso"] == d["speo"] == n_records
    assert d["lag"] == 0 and sg.state_size("q") == 0


@settings(max_examples=40, deadline=None)
@given(
    n_records=st.integers(min_value=1, max_value=24),
    pre=st.lists(
        st.tuples(st.sampled_from(["fetch", "ack", "release"]),
                  st.integers(min_value=1, max_value=5)),
        min_size=0, max_size=10,
    ),
    post=st.lists(
        st.sampled_from(["fetch", "ack", "release", "reject", "reset"]),
        min_size=1, max_size=8,
    ),
)
def test_share_group_fencing_interleaving_property(tmp_path_factory,
                                                   n_records, pre, post):
    """r10 fencing property: after a second coordinator claims the
    (group, topic) epoch, EVERY mutating op on the stale coordinator
    raises FENCED (no silent last-writer-wins), the new coordinator's
    view is never clobbered, and an always-ack drain still terminates
    with SPSO == SPEO and zero state."""
    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
        ShareGroup,
    )
    from rdkafka_streams_spark.streaming.topiclog import TopicLog

    root = str(tmp_path_factory.mktemp("sgfence"))
    log = TopicLog(root)
    log.create_topic("q", partitions=1)
    log.append("q", [f"r{i}" for i in range(n_records)], partition=0)
    a = ShareGroup(root, "g", delivery_attempt_limit=4, lock_duration_ms=50)
    now = 1_000_000
    # A claims its coordinator epoch here (first mutating op) — without
    # this, a pre=[] A never claimed and its later fetch would correctly
    # CLAIM (becoming the coordinator), not be fenced
    held_a: list[int] = [
        r["offset"] for r in a.fetch("q", "a", max_records=1, now_ms=now)
    ]
    for op, k in pre:
        now += 1
        if op == "fetch":
            held_a += [r["offset"]
                       for r in a.fetch("q", "a", max_records=k, now_ms=now)]
        elif held_a:
            batch, held_a = held_a[:k], held_a[k:]
            getattr(a, op)("q", "a", {0: batch}, now_ms=now)
    # B claims at ITS first mutating op — A is fenced from then on
    b = ShareGroup(root, "g", delivery_attempt_limit=4, lock_duration_ms=50)
    b.fetch("q", "b", max_records=1, now_ms=now + 1)
    snapshot = b.describe("q")
    for op in post:
        now += 1
        with pytest.raises(FencedShareCoordinatorError):
            if op == "fetch":
                a.fetch("q", "a", max_records=2, now_ms=now)
            elif op == "reset":
                a.reset("q", "earliest")
            else:
                getattr(a, op)("q", "a", {0: held_a or [0]}, now_ms=now)
    # nothing A attempted moved the state B sees
    assert b.describe("q") == snapshot
    # B drains to completion past expired locks
    now += 60
    while True:
        got = b.fetch("q", "b", max_records=8, now_ms=now)
        if not got:
            break
        b.ack("q", "b", {0: [r["offset"] for r in got]}, now_ms=now)
        now += 60
    d = b.describe("q")[0]
    assert d["spso"] == d["speo"] == n_records
    assert d["lag"] == 0 and b.state_size("q") == 0


@settings(max_examples=40, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("claim"), st.integers(0, 6)),
            st.tuples(st.just("gc"), st.just(0)),
        ),
        min_size=2, max_size=14,
    ),
)
def test_share_group_claim_gc_interleaving_property(tmp_path_factory, ops):
    """r13 marker-family audit: randomized claim/GC interleavings where
    each claimant's FIRST reads (marker listing + floor) may be an
    arbitrarily stale snapshot of the directory — the exact adversarial
    shape behind the r12 dead-marker race (a stale claimant O_EXCL-ing a
    marker an admin GC unlinked). Invariants, through the REAL claim
    code: (a) no two claimants ever accept the same epoch, (b) every
    accepted epoch is strictly above the floor at acceptance, (c) only
    the max-epoch claimant is unfenced at the end."""
    import os

    from rdkafka_streams_spark.streaming.sharegroups import (
        FencedShareCoordinatorError,
        ShareGroup,
    )
    from rdkafka_streams_spark.streaming.topiclog import TopicLog

    root = str(tmp_path_factory.mktemp("sgclaimgc"))
    log = TopicLog(root)
    log.create_topic("q", partitions=1)
    log.append("q", ["r0", "r1"], partition=0)

    real_epochs = ShareGroup._published_epochs
    real_floor = ShareGroup._read_floor
    # history of (markers, floor) snapshots; index 0 = empty world
    history: list[tuple[list[int], int]] = [([], -1)]
    admin = ShareGroup(root, "g")
    claimants: list[ShareGroup] = []
    try:
        for op, stale in ops:
            if op == "gc":
                admin.gc_epoch_markers("q")
            else:
                snap_markers, snap_floor = history[max(0,
                                                       len(history) - 1
                                                       - stale)]
                g = ShareGroup(root, "g")
                calls = {"e": 0, "f": 0}

                def stale_e(self, topic, _m=snap_markers):
                    calls["e"] += 1
                    if calls["e"] == 1:
                        return list(_m)
                    return real_epochs(self, topic)

                def stale_f(self, topic, _f=snap_floor):
                    calls["f"] += 1
                    if calls["f"] == 1:
                        return _f
                    return real_floor(self, topic)

                ShareGroup._published_epochs = stale_e
                ShareGroup._read_floor = stale_f
                try:
                    g._ensure_coordinator("q")
                finally:
                    ShareGroup._published_epochs = real_epochs
                    ShareGroup._read_floor = real_floor
                # (b): accepted epoch strictly above the floor NOW
                assert g._epochs["q"] > real_floor(g, "q")
                claimants.append(g)
            history.append((real_epochs(admin, "q"),
                            real_floor(admin, "q")))
        if not claimants:
            return
        epochs = [g._epochs["q"] for g in claimants]
        # (a): distinct epochs under every interleaving
        assert len(set(epochs)) == len(epochs), epochs
        # (c): exactly the max-epoch claimant is unfenced
        winner = max(claimants, key=lambda g: g._epochs["q"])
        assert len(winner.fetch("q", "m", max_records=1,
                                now_ms=1_000)) == 1
        for g in claimants:
            if g is winner:
                continue
            with pytest.raises(FencedShareCoordinatorError):
                g.fetch("q", "m", max_records=1, now_ms=1_001)
        # the max marker always survives (GC never deletes it), so the
        # fence can never regress even if the floor write were lost
        gdir = os.path.dirname(winner._state_path("q"))
        assert os.path.exists(
            os.path.join(gdir, f".q.epoch-{winner._epochs['q']}"))
    finally:
        ShareGroup._published_epochs = real_epochs
        ShareGroup._read_floor = real_floor


@settings(max_examples=25, deadline=None)
@given(
    ops=st.lists(
        st.sampled_from(["join", "evict", "remove"]),
        min_size=1, max_size=12,
    ),
)
def test_member_token_never_reissued_property(tmp_path_factory, ops):
    """r13 marker-family audit (consumer-group instance tokens): under
    any join/evict/remove/rejoin sequence, the member token issued to an
    instance id strictly increases over the WHOLE history — eviction
    retains the token as a floor (``instance_floor``), so a zombie's old
    token can never equal a reborn member's token (heartbeat fences by
    equality, so reuse would dual-unfence)."""
    from rdkafka_streams_spark.streaming.topiclog import TopicLog

    root = str(tmp_path_factory.mktemp("memtok"))
    log = TopicLog(root)
    log.create_topic("t", partitions=2)
    issued: list[int] = []
    now = 1_000_000
    joined = False
    for op in ops:
        now += 10_000
        if op == "join":
            out = log.static_join("g", ["t"], "inst-1")
            issued.append(out["member_token"])
            joined = True
        elif op == "evict" and joined:
            # expire with a timeout smaller than the silence gap
            log.expire_members("g", session_timeout_ms=1, now_ms=now)
            joined = False
        elif op == "remove" and joined:
            log.remove_member("g", "inst-1")
            joined = False
    assert issued == sorted(set(issued)), issued


@settings(max_examples=25, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("register"), st.integers(0, 5)),
            st.tuples(st.just("soft_delete_latest"), st.just(0)),
            st.tuples(st.just("permanent_delete"), st.just(0)),
        ),
        min_size=1, max_size=12,
    ),
)
def test_schema_registry_version_id_claims_property(tmp_path_factory, ops):
    """r13 marker-family audit (MARKERS.md families 4/5): under any
    register / soft-delete / permanent-delete interleaving on one
    subject — (a) live version numbers never collide, (b) numbering
    never rewinds while a tombstone blocks the slot (a soft-deleted
    version's number is never handed out again), (c) a GLOBAL id, once
    observed for a canonical schema, resolves to that same schema
    forever (ids are never reused for different content — the
    never-deleted family), and (d) permanent delete of the latest
    version intentionally unblocks its slot (the Confluent hard-delete
    rule), which is a RE-CLAIM of an identity slot, not of a fencing
    token — the global id stays distinct."""
    from rdkafka_streams_spark.streaming.schema_registry import (
        SchemaRegistry,
    )

    root = str(tmp_path_factory.mktemp("sreg"))
    reg = SchemaRegistry(root)
    sub = "t-value"

    def schema_text(i: int) -> str:
        # Avro: adding a field with a default is BACKWARD-compatible,
        # so variant i carries fields f0..fi (all defaulted)
        fields = ", ".join(
            f'{{"name": "f{j}", "type": "int", "default": 0}}'
            for j in range(i + 1)
        )
        return (
            '{"type": "record", "name": "R", "fields": [%s]}' % fields
        )

    id_to_canon: dict[int, str] = {}
    ever_blocked: set[int] = set()  # version numbers seen as tombstones
    for op, arg in ops:
        live = reg.versions(sub)
        if op == "register":
            sid = reg.register(sub, schema_text(arg),
                               compatibility="NONE")
            canon = schema_text(arg)
            if sid in id_to_canon:
                # (c) id stability: same id => same canonical schema
                assert id_to_canon[sid] == canon
            id_to_canon[sid] = canon
        elif op == "soft_delete_latest" and live:
            reg.delete_version(sub, live[-1])
            ever_blocked.add(live[-1])
        elif op == "permanent_delete":
            dv = reg.deleted_versions(sub)
            if dv:
                reg.delete_version(sub, dv[-1], permanent=True)
                ever_blocked.discard(dv[-1])
        # (a) live versions unique; (b) tombstoned slots never re-issued
        live = reg.versions(sub)
        assert len(live) == len(set(live))
        assert not (set(live) & set(reg.deleted_versions(sub)))
        assert not (set(live) & ever_blocked)
    # (c) closing sweep: every observed id still resolves identically
    for sid, canon in id_to_canon.items():
        from rdkafka_streams_spark.streaming.schema_registry import (
            _canonical,
        )
        assert _canonical(reg.get_by_id(sid)) == _canonical(canon)
