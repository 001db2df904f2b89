"""Merkle-style table reconciliation (cross-cluster/table drift detection).

Comparing two 100 TB tables row-by-row is a full shuffle of both; comparing
their *bucket digests* is a shuffle of ≤ n_buckets rows. Each row hashes to
a 32-bit integer (md5 leading nibbles — engine-independent); buckets key on
a stable function of the row key; a bucket's digest is (count, sum-of-
hashes) — order-free and mergeable, so partial aggregation keeps the
shuffle tiny. Equal digests ⇒ buckets (almost certainly) equal; unequal
digests localize the diff to a bucket, which can then be re-shipped or
diffed row-wise — the anti-entropy pattern from Dynamo-style replication,
done as two aggregates and a 256-row join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdkafka_streams_spark.operators.sampling import hash_bucket


def bucket_digest(
    df: DataFrame,
    key_col: str,
    hash_cols: list[str],
    n_buckets: int = 256,
) -> DataFrame:
    """Per-bucket (n_rows, hash-sum) digest. ``hash_cols`` is the full list
    of columns that define row identity/content (order matters — both
    sides must pass the same list)."""
    row_repr = F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols])
    h = hash_bucket(row_repr, n_nibbles=8)
    bucket = (F.col(key_col).cast("bigint") % n_buckets).alias("bucket")
    return (
        df.select(bucket, h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("h").cast("bigint").alias("digest"),
        )
    )


def digest_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """Buckets whose digests disagree (missing on either side counts as
    n_rows=0/digest=0). Output: bucket, n_left, n_right, digest_left,
    digest_right — the re-sync worklist."""
    l = left.select(
        "bucket",
        F.col("n_rows").alias("n_left"),
        F.col("digest").alias("digest_left"),
    )
    r = right.select(
        "bucket",
        F.col("n_rows").alias("n_right"),
        F.col("digest").alias("digest_right"),
    )
    j = l.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_left", F.lit(0)).alias("n_left"),
        F.coalesce("n_right", F.lit(0)).alias("n_right"),
        F.coalesce("digest_left", F.lit(0)).alias("digest_left"),
        F.coalesce("digest_right", F.lit(0)).alias("digest_right"),
    )
    return j.where(
        (F.col("n_left") != F.col("n_right"))
        | (F.col("digest_left") != F.col("digest_right"))
    )
