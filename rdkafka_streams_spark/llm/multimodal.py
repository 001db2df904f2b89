"""Multimodal columns (SURVEY.md §2.6 L5).

Media rides through the engine as opaque ``binary`` columns with typed
metadata structs — the only schema design that scales: Spark never interprets
the bytes until an explicit decode stage, so scans/filters/joins on metadata
prune without touching blobs.

The decode stage is an Arrow-batched ``mapInPandas`` — media libs (PIL,
torchaudio, av) are not in this container, so the actual pixel/sample decode
is STUBBED: ``decode_fn="fake"`` produces deterministic features from the
bytes (real plumbing: schema, batch shape, partitioning all exercised);
``decode_fn="pil"`` raises NotImplementedError unless PIL is importable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, content binary"
)
DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, fake_width int, fake_height int, feat array<double>"
)
FEAT_DIM = 4


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: wrap text bytes as a media blob + metadata columns
    (in production this is the parquet schema of the ingest table)."""
    content = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
        content.alias("content"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: digest-derived dims and a
    FEAT_DIM-vector. Pure function of the bytes → reproducible anywhere."""
    d = hashlib.sha256(content).digest()
    width = 64 + d[0] % 64
    height = 64 + d[1] % 64
    feat = [round(b / 255.0, 6) for b in d[2 : 2 + FEAT_DIM]]
    return width, height, feat


def decode_media(
    media: DataFrame,
    decode_fn: str = "fake",
    batch_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched decode: binary column → (dims, feature vector).

    Scale notes: mapInPandas keeps the blob column off the JVM heap (Arrow
    buffers), decodes a batch per invocation, and preserves partitioning —
    decode parallelism == scan parallelism. Put a ``repartition`` upstream
    only if blob sizes are skewed.
    """
    if decode_fn == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image decode needs PIL, which this container does not ship; "
                "use decode_fn='fake' for the plumbing path"
            ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for content in pdf["content"]:
                w, h, f = _fake_decode(bytes(content))
                widths.append(w)
                heights.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["byte_len"],
                    "fake_width": widths,
                    "fake_height": heights,
                    "feat": feats,
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_ts double, frame binary"


def sample_frames(
    media: DataFrame,
    fps: float = 1.0,
    duration_s: float = 8.0,
) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled timestamp.

    The sample grid (``frame_idx``, ``frame_ts``) is computed JVM-side with
    ``explode(sequence(...))`` — the blob is carried, not decoded, so Spark
    only duplicates a column reference per row, and downstream decode
    (``decode_media``) sees per-frame rows. Real frame extraction (av/ffmpeg)
    is stubbed for the same reason as image decode: the container has no
    media libs. Frame bytes here = the blob (the decode stub is a pure
    function of bytes, so per-frame features stay deterministic).
    """
    n = max(1, int(fps * duration_s))
    idx = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("frame_idx")
    return media.select("doc_id", idx, F.col("content")).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") / F.lit(fps)).alias("frame_ts"),
        F.col("content").alias("frame"),
    )
