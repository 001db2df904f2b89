"""Sampling operators (SURVEY.md §2.4 E33).

``DataFrame.sample`` is the production API (per-partition Bernoulli, no
shuffle) but its RNG stream is engine-private, so cross-engine tests use
``hash_sample``: a deterministic arithmetic filter reproducible in any SQL
dialect. Both are O(rows) with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761  # Knuth multiplicative-hash constant


def hash_sample(df: DataFrame, key: str | Column, percent: int, modulus: int = 97) -> DataFrame:
    """Keep ~percent% of rows, chosen deterministically by key."""
    c = F.col(key) if isinstance(key, str) else key
    keep = (c.cast("bigint") * F.lit(_KNUTH).cast("bigint")) % modulus < (percent * modulus // 100)
    return df.where(keep)


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Engine-native Bernoulli sampling (fast path, not cross-engine stable)."""
    return df.sample(fraction=fraction, seed=seed)
