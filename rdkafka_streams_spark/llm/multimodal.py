"""Multimodal columns (SURVEY.md §2.6 L5).

Media rides through the engine as opaque ``binary`` columns with typed
metadata structs — the only schema design that scales: Spark never interprets
the bytes until an explicit decode stage, so scans/filters/joins on metadata
prune without touching blobs.

The decode stage is an Arrow-batched ``mapInPandas``. BMP, PPM (P6), and
PNG decode FOR REAL with the stdlib alone (``decode_media_stdlib`` — PNG's
IDAT is zlib; container parse, filter reversal, row flip, unpadding all
implemented here and value-checked in SQL, q309). Only the entropy-coded
formats (JPEG, WebP, GIF, TIFF) genuinely need an imaging library:
``decode_fn="pil"`` raises NotImplementedError unless PIL is importable,
and ``decode_fn="fake"`` remains the digest-derived stub for exercising
the plumbing on arbitrary bytes (q61).
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
                "JPEG/WebP/GIF/TIFF decode needs PIL, which this container "
                "does not ship; BMP/PPM/PNG decode for real via "
                "decode_media_stdlib, and decode_fn='fake' exercises the "
                "plumbing on arbitrary bytes"
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


# ---------------------------------------------------------------- real codecs
# BMP, PPM (P6), and PNG are decodable with the stdlib alone (PNG's IDAT is
# zlib); only the DCT/wavelet formats (JPEG, WebP, ...) genuinely need PIL.
# Pixels are RGB interleaved, row-major, 8 bits per channel throughout.

_BPP = 3  # channels


def _encode_ppm(w: int, h: int, px: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + px


def _decode_ppm(b: bytes) -> tuple[int, int, bytes]:
    # P6 header: magic, width, height, maxval — whitespace-separated with
    # optional '#' comments, then ONE whitespace byte before the raster
    if b[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported ppm maxval {maxval}")
    n = w * h * _BPP
    raster = b[i : i + n]
    if len(raster) != n:
        raise ValueError("truncated ppm raster")
    return w, h, raster


def _encode_bmp(w: int, h: int, px: bytes) -> bytes:
    import struct

    pad = (-(w * _BPP)) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        base = y * w * _BPP
        for x in range(w):
            r, g, bl = px[base + x * 3 : base + x * 3 + 3]
            row += bytes((bl, g, r))  # BGR
        rows.append(bytes(row) + b"\x00" * pad)
    data = b"".join(rows)
    off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return head + info + data


def _decode_bmp(b: bytes) -> tuple[int, int, bytes]:
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a bmp")
    off = struct.unpack_from("<I", b, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported bmp (bpp={bpp} compression={comp})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    pad = (-(w * _BPP)) % 4
    stride = w * _BPP + pad
    out = bytearray(w * h * _BPP)
    for ry in range(h):
        y = (h - 1 - ry) if flip else ry
        base = off + ry * stride
        for x in range(w):
            bl, g, r = b[base + x * 3 : base + x * 3 + 3]
            o = (y * w + x) * 3
            out[o : o + 3] = bytes((r, g, bl))
    return w, h, bytes(out)


def _paeth(a: int, bb: int, c: int) -> int:
    p = a + bb - c
    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return bb if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _encode_png(w: int, h: int, px: bytes) -> bytes:
    """8-bit RGB PNG; row y uses filter type y % 5 so a decoder must
    actually reverse Sub/Up/Average/Paeth, not just strip zeros."""
    import struct
    import zlib

    stride = w * _BPP
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = px[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - _BPP] if i >= _BPP else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - _BPP] if i >= _BPP else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (row[i] - _paeth(
                    row[i - _BPP] if i >= _BPP else 0,
                    prev[i],
                    prev[i - _BPP] if i >= _BPP else 0,
                )) & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def _decode_png(b: bytes) -> tuple[int, int, bytes]:
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a png")
    i = 8
    w = h = None
    idat = bytearray()
    while i < len(b):
        (ln,) = struct.unpack_from(">I", b, i)
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported png (depth={depth} color={ctype} "
                    f"interlace={inter})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * _BPP
    out = bytearray(w * h * _BPP)
    prev = bytes(stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for i2 in range(_BPP, stride):
                row[i2] = (row[i2] + row[i2 - _BPP]) & 0xFF
        elif ft == 2:  # Up
            for i2 in range(stride):
                row[i2] = (row[i2] + prev[i2]) & 0xFF
        elif ft == 3:  # Average
            for i2 in range(stride):
                left = row[i2 - _BPP] if i2 >= _BPP else 0
                row[i2] = (row[i2] + (left + prev[i2]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i2 in range(stride):
                left = row[i2 - _BPP] if i2 >= _BPP else 0
                ul = prev[i2 - _BPP] if i2 >= _BPP else 0
                row[i2] = (row[i2] + _paeth(left, prev[i2], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad png filter {ft}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return w, h, bytes(out)


_STDLIB_CODECS = {
    "image/bmp": (_encode_bmp, _decode_bmp),
    "image/x-portable-pixmap": (_encode_ppm, _decode_ppm),
    "image/png": (_encode_png, _decode_png),
}


def decode_image(content: bytes) -> tuple[int, int, bytes]:
    """Sniff-and-decode for the stdlib-decodable formats. Raises
    NotImplementedError for the genuinely PIL-only ones (JPEG, WebP,
    GIF, TIFF — entropy-coded formats the stdlib cannot inflate)."""
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(content)
    raise NotImplementedError(
        "only BMP/PPM/PNG decode without PIL; JPEG/WebP/GIF/TIFF need a "
        "real imaging library, which this container does not ship"
    )


def _fixture_pixels(doc_id: int) -> tuple[int, int, bytes]:
    """The deterministic fixture image for ``doc_id``: dims and every
    channel value are closed-form in (doc_id, x, y, c), so a SQL oracle
    recomputes any pixel aggregate exactly —
    v(x, y, c) = (doc_id·7 + x·3 + y·5 + c·11) % 256."""
    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    px = bytes(
        (doc_id * 7 + x * 3 + y * 5 + c * 11) % 256
        for y in range(h) for x in range(w) for c in range(_BPP)
    )
    return w, h, px


FIXTURE_FORMATS = ("image/bmp", "image/x-portable-pixmap", "image/png")


def generate_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fixture images as real encoded files: doc_id % 3
    picks the container (BMP / PPM / PNG), pixels come from
    ``_fixture_pixels``. mapInPandas (Arrow) — encoders are pure
    Python, blobs never touch the JVM heap."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "byte_len": [],
                    "content": []}
            for did in pdf[id_col]:
                did = int(did)
                mt = FIXTURE_FORMATS[did % 3]
                w, h, px = _fixture_pixels(did)
                blob = _STDLIB_CODECS[mt][0](w, h, px)
                rows["doc_id"].append(did)
                rows["media_type"].append(mt)
                rows["byte_len"].append(len(blob))
                rows["content"].append(blob)
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODED_REAL_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, channels int, "
    "px_sum bigint, px_min int, px_max int, px_tl int, px_br int, px_probe int"
)


def decode_media_stdlib(media: DataFrame) -> DataFrame:
    """REAL image decode (no stub): sniff BMP/PPM/PNG, parse the
    container, inflate + unfilter (PNG), flip + unpad (BMP), and emit
    exact pixel aggregates. ``px_tl``/``px_br``/``px_probe`` are single
    positional channel values ((0,0,0), (w-1,h-1,2), (3,2,1)) — sums are
    permutation-blind, corners pin row order (a decoder that forgets
    BMP's bottom-up flip fails px_tl, not px_sum). Same Arrow/mapInPandas
    posture as the stub path: decode parallelism == scan parallelism,
    blobs stay off the JVM heap."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "width", "height", "channels",
                "px_sum", "px_min", "px_max", "px_tl", "px_br", "px_probe",
            )}
            for did, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                w, h, px = decode_image(bytes(content))
                out["doc_id"].append(int(did))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(_BPP)
                out["px_sum"].append(sum(px))
                out["px_min"].append(min(px))
                out["px_max"].append(max(px))
                out["px_tl"].append(px[0])
                out["px_br"].append(px[-1])
                out["px_probe"].append(px[(2 * w + 3) * _BPP + 1])
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=DECODED_REAL_SCHEMA)
