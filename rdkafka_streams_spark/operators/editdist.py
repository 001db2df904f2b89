"""Exact edit-distance-1 similarity join via deletion neighborhoods
(FastSS / SymSpell family — public algorithm, re-expressed as DataFrame ops).

The naive fuzzy self-join is O(n²) Levenshtein evaluations per block. The
deletion-neighborhood identity makes it subquadratic AND exact for
distance ≤ 1: two strings s, t with levenshtein(s, t) ≤ 1 MUST share a
member of {s} ∪ {one-character deletions of s} — equality shares the
identity variant, one substitution shares the deletion at the edited
position, and an insert/delete pair shares the shorter string itself. So:

1. per row, emit the string plus its |s| deletion variants (map-side,
   higher-order ``transform`` over ``sequence`` — no Python);
2. equi-join on (block key, variant) — candidates only, shuffle carries
   ~|s|+1 rows per input row instead of a quadratic pair set;
3. verify candidates with one JVM ``levenshtein`` call (kills the false
   positives, e.g. two different deletions mapping to one variant).

Candidate completeness bound: every true pair is generated (the identity
above), so the verify step makes the result EXACT — this is the
edit-distance complement of llm/dedup.py's MinHash-LSH (probabilistic) and
queries/llm.py's PPJoin (set-similarity) candidate generators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """``array(s, delete(s,1), …, delete(s,len))`` — every string produced
    by removing at most one character, built JVM-side."""
    # guard the empty string: sequence(1, 0) yields the DESCENDING [1, 0],
    # whose index-0 entry would build a spurious variant via negative-length
    # substr — keeping only 1 <= i <= len makes the variant set exactly {s}
    # for the empty string and changes nothing otherwise
    one_gone = F.transform(
        F.filter(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: (i >= 1) & (i <= F.length(col)),
        ),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.concat(F.array(col), one_gone)


def fuzzy_join_dist1(
    df: DataFrame,
    key: str,
    text: str,
    block: str | None = None,
) -> DataFrame:
    """All pairs (a, b) with ``levenshtein(text_a, text_b) <= 1`` and
    ``key_a < key_b`` (optionally also equal on ``block``). Returns
    ``(<key>_a, <key>_b, dist)``. Exact: deletion-neighborhood candidates
    are a superset of the true pairs; Levenshtein verification prunes."""
    cols = [F.col(key).alias("__k"), F.col(text).alias("__t")]
    if block is not None:
        cols.append(F.col(block).alias("__b"))
    base = df.select(*cols)
    cand = base.select(
        *(["__k", "__t"] + (["__b"] if block else [])),
        F.explode(deletion_variants(F.col("__t"))).alias("__v"),
    ).distinct()  # a string can repeat a variant (e.g. "aa" → "a" twice)

    on = ["__v"] + (["__b"] if block else [])
    a = cand.select(
        F.col("__k").alias("__ka"), F.col("__t").alias("__ta"),
        *(F.col(c) for c in on),
    )
    b = cand.select(
        F.col("__k").alias("__kb"), F.col("__t").alias("__tb"),
        *(F.col(c) for c in on),
    )
    pairs = (
        a.join(b, on)
        .where(F.col("__ka") < F.col("__kb"))
        .select("__ka", "__kb", "__ta", "__tb")
        .distinct()  # two strings can share several variants
    )
    return pairs.select(
        F.col("__ka").alias(f"{key}_a"),
        F.col("__kb").alias(f"{key}_b"),
        F.levenshtein("__ta", "__tb").cast("bigint").alias("dist"),
    ).where(F.col("dist") <= 1)
