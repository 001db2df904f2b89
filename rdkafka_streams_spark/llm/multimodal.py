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
from pyspark.sql import DataFrame, Window
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
                # probe (3,2,1), CLAMPED into bounds — this is a general
                # operator, and a valid 2×2 image must not index past
                # its raster (review r11); the fixtures (w≥8, h≥8) are
                # unaffected
                out["px_probe"].append(
                    px[(min(2, h - 1) * w + min(3, w - 1)) * _BPP + 1]
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=DECODED_REAL_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, src_w int, src_h int, "
    "out_w int, out_h int, px_sum bigint, px_tl int, px_br int, px_probe int"
)


def resize_images_stdlib(
    media: DataFrame, out_w: int = 10, out_h: int = 6
) -> DataFrame:
    """Decode + NEAREST-NEIGHBOR resize in one Arrow batch: output pixel
    (x, y, c) samples source pixel ((x·w)//out_w, (y·h)//out_h, c) —
    integer floor mapping, so the resized raster is closed-form in the
    fixture formula and every aggregate is SQL-recomputable. The
    resize reads single pixels from the decoded buffer (O(out_w·out_h)
    per image, independent of source size — the thumbnailing shape);
    positional probes pin the mapping direction (a transposed or
    ceil-mapped resize fails px_br/px_probe, not px_sum)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "src_w", "src_h", "out_w", "out_h",
                "px_sum", "px_tl", "px_br", "px_probe",
            )}
            for did, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                w, h, px = decode_image(bytes(content))

                def at(x: int, y: int, c: int) -> int:
                    return px[((y * h // out_h) * w + (x * w // out_w))
                              * _BPP + c]

                total = 0
                for y in range(out_h):
                    for x in range(out_w):
                        for c in range(_BPP):
                            total += at(x, y, c)
                out["doc_id"].append(int(did))
                out["media_type"].append(mt)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["px_sum"].append(total)
                out["px_tl"].append(at(0, 0, 0))
                out["px_br"].append(at(out_w - 1, out_h - 1, 2))
                # probe (3,2,1) clamped into the DECLARED output grid —
                # small out_w/out_h must neither index past the source
                # raster nor report a pixel outside the grid (review r11)
                out["px_probe"].append(
                    at(min(3, out_w - 1), min(2, out_h - 1), 1)
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# ------------------------------------------------------------------ audio
def _encode_wav(rate: int, samples: list[int]) -> bytes:
    """16-bit PCM mono RIFF/WAVE — stdlib struct only."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(b: bytes) -> tuple[int, int, int, list[int]]:
    """(channels, rate, bits, samples) from a PCM RIFF/WAVE file —
    chunk-walks the container (skipping unknown chunks like LIST/fact),
    supports 16-bit PCM; anything compressed raises."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    channels = rate = bits = None
    saw_data = False
    samples: list[int] = []
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        (ln,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8 : i + 8 + ln]
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported wav (format={fmt_code} bits={bits}); "
                    "only 16-bit PCM decodes without an audio library"
                )
        elif tag == b"data":
            saw_data = True
            samples = [
                struct.unpack_from("<h", body, j)[0]
                for j in range(0, len(body) - len(body) % 2, 2)
            ]
    if channels is None:
        raise ValueError("wav missing fmt chunk")
    if not saw_data:
        raise ValueError("wav missing data chunk")
    return channels, rate, bits, samples


def generate_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fixture audio as real WAV files: n = 64 + doc_id %
    129 samples of s(i) = ((doc_id·37 + i·13) % 4001) − 2000 at 8 kHz —
    closed-form, so a SQL oracle recomputes every sample aggregate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "byte_len": [],
                    "content": []}
            for did in pdf[id_col]:
                did = int(did)
                n = 64 + did % 129
                samples = [((did * 37 + i * 13) % 4001) - 2000
                           for i in range(n)]
                blob = _encode_wav(8000, samples)
                rows["doc_id"].append(did)
                rows["media_type"].append("audio/wav")
                rows["byte_len"].append(len(blob))
                rows["content"].append(blob)
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODED_AUDIO_SCHEMA = (
    "doc_id bigint, channels int, sample_rate int, bits int, "
    "n_samples bigint, s_sum bigint, s_min int, s_max int, "
    "s_first int, s_last int"
)


def decode_audio_stdlib(media: DataFrame) -> DataFrame:
    """REAL WAV decode (RIFF chunk walk + 16-bit PCM unpack) in an Arrow
    batch, emitting exact sample aggregates + positional probes
    (first/last sample pin byte order and chunk alignment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "channels", "sample_rate", "bits", "n_samples",
                "s_sum", "s_min", "s_max", "s_first", "s_last",
            )}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                ch, rate, bits, s = _decode_wav(bytes(content))
                out["doc_id"].append(int(did))
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["bits"].append(bits)
                out["n_samples"].append(len(s))
                out["s_sum"].append(sum(s))
                out["s_min"].append(min(s))
                out["s_max"].append(max(s))
                out["s_first"].append(s[0])
                out["s_last"].append(s[-1])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_AUDIO_SCHEMA)


# ------------------------------------------------------------------ video
def _encode_y4m(w: int, h: int, frames: list[tuple[bytes, bytes, bytes]]) -> bytes:
    """YUV4MPEG2 (C420) — the uncompressed video interchange format;
    header + per-frame FRAME markers + raw Y/U/V planes."""
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    return head + b"".join(
        b"FRAME\n" + y + u + v for y, u, v in frames
    )


def _decode_y4m(b: bytes) -> tuple[int, int, list[tuple[bytes, bytes, bytes]]]:
    """(w, h, [(Y, U, V)]) from a C420 YUV4MPEG2 stream."""
    nl = b.index(b"\n")
    head = b[:nl].decode()
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a y4m stream")
    w = h = None
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and tok != "C420":
            raise ValueError(f"unsupported y4m chroma {tok}")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames = []
    i = nl + 1
    while i < len(b):
        j = b.index(b"\n", i)
        if b[i:j].split()[0] != b"FRAME":
            raise ValueError("bad y4m frame marker")
        i = j + 1
        y = b[i : i + ysz]
        u = b[i + ysz : i + ysz + csz]
        v = b[i + ysz + csz : i + ysz + 2 * csz]
        # a short tail would otherwise flow silently into y_sum/u_val
        if len(y) != ysz or len(u) != csz or len(v) != csz:
            raise ValueError("truncated y4m frame")
        frames.append((y, u, v))
        i += ysz + 2 * csz
    return w, h, frames


def generate_videos(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fixture video as real Y4M streams: w = 8 + 2·(id%5),
    h = 6 + 2·(id%4) (even dims, C420), nf = 3 + id%4 frames with
    Y(x,y,k) = (id·11 + x·2 + y·3 + k·7) % 256 and per-frame-constant
    chroma U = (id·5 + k·3) % 256, V = (id·3 + k·5) % 256 — closed-form
    for the SQL oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "byte_len": [],
                    "content": []}
            for did in pdf[id_col]:
                did = int(did)
                w, h = 8 + 2 * (did % 5), 6 + 2 * (did % 4)
                nf = 3 + did % 4
                frames = []
                for k in range(nf):
                    y = bytes((did * 11 + x * 2 + yy * 3 + k * 7) % 256
                              for yy in range(h) for x in range(w))
                    u = bytes([(did * 5 + k * 3) % 256]) * ((w // 2) * (h // 2))
                    v = bytes([(did * 3 + k * 5) % 256]) * ((w // 2) * (h // 2))
                    frames.append((y, u, v))
                blob = _encode_y4m(w, h, frames)
                rows["doc_id"].append(did)
                rows["media_type"].append("video/x-yuv4mpeg")
                rows["byte_len"].append(len(blob))
                rows["content"].append(blob)
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODED_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, n_frames int, "
    "y_sum bigint, u_val int, v_val int, y_tl int, y_br int"
)


def sample_frames_stdlib(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL video frame sampling: parse the Y4M container, keep every
    ``every``-th frame (the decimation a multimodal ingest runs before
    per-frame featurization), emit exact per-frame luma aggregates +
    corner probes. One output row per SAMPLED frame — the blob is
    decoded once per batch and never duplicated per frame (contrast
    ``sample_frames``, the carry-the-blob planner for opaque codecs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "width", "height", "n_frames",
                "y_sum", "u_val", "v_val", "y_tl", "y_br",
            )}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, frames = _decode_y4m(bytes(content))
                for k, (y, u, v) in enumerate(frames):
                    if k % every:
                        continue
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(k)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(len(frames))
                    out["y_sum"].append(sum(y))
                    out["u_val"].append(u[0])
                    out["v_val"].append(v[0])
                    out["y_tl"].append(y[0])
                    out["y_br"].append(y[-1])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_FRAME_SCHEMA)


# --------------------------------------------------- image-text pairs (LAION)
PAIR_SCHEMA = (
    "doc_id bigint, media_type string, source string, caption string, "
    "byte_len int, content binary"
)


def generate_image_caption_pairs(
    docs: DataFrame, id_col: str = "doc_id", dup_mod: int = 20
) -> DataFrame:
    """Deterministic image-text-pair fixtures (the LAION ingest shape):
    each document becomes one pair — its text as the caption, its source
    carried for the mixture stage, and a REAL encoded image whose raster
    keys on ``doc_id % dup_mod`` (``_fixture_pixels(key)``) while the
    CONTAINER keys on ``doc_id % 3``. Because gcd(dup_mod, 3) = 1, the
    same raster recurs under all three containers — a BMP, a PPM, and a
    PNG of identical pixels exist in every fixture corpus, which is
    precisely what content-level (not byte-level) dedup must catch.
    One Arrow pass; blobs never touch the JVM heap."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "source": [],
                    "caption": [], "byte_len": [], "content": []}
            for did, src, txt in zip(
                pdf[id_col], pdf["source"], pdf["text"]
            ):
                did = int(did)
                mt = FIXTURE_FORMATS[did % 3]
                w, h, px = _fixture_pixels(did % dup_mod)
                blob = _STDLIB_CODECS[mt][0](w, h, px)
                rows["doc_id"].append(did)
                rows["media_type"].append(mt)
                rows["source"].append(src)
                rows["caption"].append(txt)
                rows["byte_len"].append(len(blob))
                rows["content"].append(blob)
            yield pd.DataFrame(rows)

    return docs.select(id_col, "source", "text").mapInPandas(
        gen, schema=PAIR_SCHEMA
    )


FINGERPRINT_SCHEMA = (
    "doc_id bigint, media_type string, source string, caption string, "
    "width int, height int, px_sum bigint, px_wsum bigint"
)


def decode_fingerprint_stdlib(pairs: DataFrame) -> DataFrame:
    """REAL decode + CONTENT fingerprint for pixel-level dedup: parse
    the container (BMP flip/unpad, PPM, PNG inflate+unfilter), then
    fingerprint the DECODED raster — (width, height, px_sum, px_wsum)
    where px_wsum = Σ (i+1)·px[i] over the linear raster index
    i = (y·w + x)·3 + c. The position weighting makes the fingerprint
    permutation-sensitive (px_sum alone is blind to shuffled rasters),
    and every component is closed-form in the fixture formula, so a SQL
    oracle recomputes it — unlike an md5 of the raw bytes, which would
    also wrongly split identical pixels across containers. Same
    mapInPandas posture as decode_media_stdlib: zero shuffle, decode
    parallelism == scan parallelism."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "source", "caption",
                "width", "height", "px_sum", "px_wsum",
            )}
            for did, mt, src, cap, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["source"],
                pdf["caption"], pdf["content"],
            ):
                w, h, px = decode_image(bytes(content))
                out["doc_id"].append(int(did))
                out["media_type"].append(mt)
                out["source"].append(src)
                out["caption"].append(cap)
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(sum(px))
                out["px_wsum"].append(
                    sum((i + 1) * v for i, v in enumerate(px))
                )
            yield pd.DataFrame(out)

    return pairs.mapInPandas(run, schema=FINGERPRINT_SCHEMA)


def fingerprint_dedup_incremental(
    index: DataFrame, delta_fp: DataFrame
) -> DataFrame:
    """PIXEL dedup in the daily-ingest posture (the
    ``minhash_near_dups_incremental`` contract applied to L5+L1): the
    standing corpus's fingerprint frame is the SAVED INDEX — only the
    4-long content key (width, height, px_sum, px_wsum) per image, a
    metadata-scale artifact the base corpus is NEVER re-decoded for —
    and an increment's decoded fingerprints drop (a) every pair whose
    raster already exists in the index (cross-container: an incoming
    BMP of a standing PNG's pixels is caught, which byte hashing cannot
    do), then (b) within-delta duplicates (min doc_id per key, q317's
    m2 rule). Returns the surviving delta rows. Scale: LEFT ANTI join
    against the broadcast-able index + one window over the (tiny)
    delta; the corpus-sized decode happened once, on index-build day."""
    key = ["width", "height", "px_sum", "px_wsum"]
    fresh = delta_fp.join(
        index.select(*key).distinct(), key, "left_anti"
    )
    w = Window.partitionBy(*key).orderBy("doc_id")
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1").drop("__rn")
    )
