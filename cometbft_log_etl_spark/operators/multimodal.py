"""Multimodal columns: opaque binary media + typed metadata, processed
via Arrow-batched mapInPandas.

Media (image/audio/video) is modeled the way a 100 TB training-data
lake stores it: a `content BINARY` column plus a `media_type` tag and a
nested metadata struct, partitioned so one Arrow batch holds whole
objects. The decode/resize/frame-sample kernels run per-partition via
``mapInPandas`` — the only sane shape for large blobs (no row-at-a-time
Python, no JVM round-trip per object).

Two decode tiers share the mapInPandas shape:

- ``decode_media`` — deterministic md5-derived pseudo-metadata; keeps
  the plumbing (schema, batch iteration, column pruning, output shape)
  testable without any codec.
- ``decode_media_real`` — a REAL container-header decoder
  (``parse_media_header``): PNG / JPEG / GIF / BMP dimensions and WAV
  sample-rate/sample-count parsed from the actual bytes, pure Python,
  no external codec libraries. Full pixel/sample decode (PIL /
  soundfile / pyav) is still out of scope for this container; the
  header tier is the production integration point and is exercised on
  genuine container bytes (see ``encode_*`` round-trip helpers and
  q36_media_header_decode). Corrupt or unrecognized blobs degrade to
  ``format='unknown'`` with null fields — a 100 TB job must not die on
  one bad object.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media objects from the documents table: the
    UTF-8 text bytes stand in for encoded blobs; type cycles by doc_id."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id", mt.alias("media_type"), F.encode("text", "UTF-8").alias("content")
    )


def _pseudo_dim(content: bytes, salt: str, mod: int) -> int:
    h = hashlib.md5(content + salt.encode()).hexdigest()
    return int(h[:8], 16) % mod + 1


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The mapInPandas kernel: per-batch 'decode' producing typed
    metadata. Deterministic md5 arithmetic stands in for the real
    decoder (see decode_media_real)."""
    # NULL content degrades to NULL-valued content-derived fields (never
    # raises into the task): the same null propagation SQL gives —
    # octet_length(NULL) and md5(NULL || salt) are NULL — so the DuckDB
    # oracles agree cell-for-cell on corpora with null blobs.
    def dim(c, salt: str, mod: int):
        return None if c is None else _pseudo_dim(c, salt, mod)

    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["content"].map(lambda c: None if c is None else len(c)),
            "width": [
                dim(c, ":w", 1920) if t == "image" or t == "video" else 0
                for c, t in zip(pdf["content"], pdf["media_type"])
            ],
            "height": [
                dim(c, ":h", 1080) if t in ("image", "video") else 0
                for c, t in zip(pdf["content"], pdf["media_type"])
            ],
            "n_frames": [
                dim(c, ":f", 240) if t == "video" else (1 if t == "image" else 0)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ],
            "sample_rate": [
                16000 if t == "audio" else 0 for t in pdf["media_type"]
            ],
        }
        yield pd.DataFrame(out)


def decode_media(media: DataFrame) -> DataFrame:
    """content → typed feature row, one Arrow batch at a time."""
    return media.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("orientation", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)

# JPEG start-of-frame markers that carry dimensions (baseline through
# lossless, excluding DHT/DAC/RST which share the 0xC0 nibble).
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)

_FORMAT_MEDIA_TYPE = {"png": "image", "jpeg": "image", "gif": "image", "bmp": "image", "wav": "audio"}


def parse_media_header(b: bytes) -> dict:
    """Sniff + parse a media container header from real bytes.

    Returns ``{"format", "width", "height", "sample_rate", "n_samples",
    "orientation"}`` with ``None`` for fields the format doesn't carry
    (orientation comes from a JPEG EXIF APP1 IFD0 tag 0x0112, honoring
    TIFF byte order), and ``format='unknown'`` (all-null fields) for
    unrecognized or truncated input — never raises. Parses only headers
    (O(header) per blob, no pixel decode), which is the right cost
    model for a metadata pass over a 100 TB lake.
    """
    out = {"format": "unknown", "width": None, "height": None, "sample_rate": None,
           "n_samples": None, "orientation": None, "n_frames": None}
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            out["format"] = "png"
            out["width"] = int.from_bytes(b[16:20], "big")
            out["height"] = int.from_bytes(b[20:24], "big")
            out["n_frames"] = 1
        elif b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in _JPEG_SOF:
                    if i + 9 <= len(b):
                        out["format"] = "jpeg"
                        out["height"] = int.from_bytes(b[i + 5 : i + 7], "big")
                        out["width"] = int.from_bytes(b[i + 7 : i + 9], "big")
                        out["n_frames"] = 1
                    break
                if marker == 0xD9 or marker == 0xDA:  # EOI / start-of-scan
                    break
                if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # bare markers
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
                    out["orientation"] = _exif_orientation(b[i + 10 : i + 2 + seg_len])
                i += 2 + seg_len
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            out["format"] = "gif"
            out["width"] = int.from_bytes(b[6:8], "little")
            out["height"] = int.from_bytes(b[8:10], "little")
            out["n_frames"] = _gif_frame_count(b)
        elif b[:2] == b"BM" and len(b) >= 26:
            out["format"] = "bmp"
            out["width"] = int.from_bytes(b[18:22], "little", signed=True)
            out["height"] = abs(int.from_bytes(b[22:26], "little", signed=True))
            out["n_frames"] = 1
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i, channels, bits, data_size = 12, None, None, None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                csz = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and csz >= 16:
                    channels = int.from_bytes(b[i + 10 : i + 12], "little")
                    out["sample_rate"] = int.from_bytes(b[i + 12 : i + 16], "little")
                    bits = int.from_bytes(b[i + 22 : i + 24], "little")
                elif cid == b"data":
                    data_size = csz
                i += 8 + csz + (csz & 1)
            if out["sample_rate"]:
                out["format"] = "wav"
                # bits < 8 (e.g. 4-bit ADPCM) would make the divisor 0;
                # leave n_samples null rather than raise into the task.
                if data_size is not None and channels and bits and bits >= 8:
                    out["n_samples"] = data_size // (channels * (bits // 8))
    except (IndexError, ValueError, ZeroDivisionError, TypeError):
        out = {"format": "unknown", "width": None, "height": None, "sample_rate": None,
               "n_samples": None, "orientation": None, "n_frames": None}
    return out


def _gif_frame_count(b: bytes):
    """Number of image descriptors in a GIF (animation frame count) by
    walking the block structure — image blocks (0x2C, skipping local
    color table + LZW sub-blocks), extensions (0x21 + sub-blocks),
    trailer (0x3B). O(blob), not O(header) — frame counting inherently
    walks the file; returns the frames seen so far on truncation."""
    if len(b) < 11:
        return None  # header-only/truncated GIF: dims parsed, frames unknown
    packed = b[10]
    i = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    frames = 0

    def skip_subblocks(j: int) -> int:
        while j < len(b) and b[j] != 0:
            j += 1 + b[j]
        return j + 1

    while i < len(b):
        tag = b[i]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label byte + sub-blocks
            i = skip_subblocks(i + 2)
        elif tag == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > len(b):
                break
            lpacked = b[i + 9]
            i += 10 + (3 * (2 << (lpacked & 0x07)) if lpacked & 0x80 else 0)
            i = skip_subblocks(i + 1)  # LZW min-code byte + data sub-blocks
        else:
            break
    return frames if frames else None


def _exif_orientation(tiff: bytes):
    """Orientation (tag 0x0112) from an EXIF TIFF blob, or None."""
    if len(tiff) < 14:
        return None
    if tiff[:4] == b"II*\x00":
        endian = "little"
    elif tiff[:4] == b"MM\x00*":
        endian = "big"
    else:
        return None
    ifd = int.from_bytes(tiff[4:8], endian)
    if ifd + 2 > len(tiff):
        return None
    n_entries = int.from_bytes(tiff[ifd : ifd + 2], endian)
    for e in range(n_entries):
        off = ifd + 2 + e * 12
        if off + 12 > len(tiff):
            return None
        tag = int.from_bytes(tiff[off : off + 2], endian)
        if tag == 0x0112:
            # type SHORT: the value sits in the first 2 bytes of the
            # 4-byte value field, in TIFF byte order
            return int.from_bytes(tiff[off + 8 : off + 10], endian)
    return None


def _real_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        # a NULL blob sniffs as 'unknown' (all-null fields) and keeps a
        # NULL n_bytes — degrade, never raise into the task
        parsed = [
            parse_media_header(b"" if c is None else bytes(c)) for c in pdf["content"]
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                # animated GIFs (real frame count > 1) are the corpus's
                # video stand-in: they route to the frame-sample tier
                "media_type": [
                    "video"
                    if p["format"] == "gif" and (p["n_frames"] or 0) > 1
                    else _FORMAT_MEDIA_TYPE.get(p["format"], "unknown")
                    for p in parsed
                ],
                "format": [p["format"] for p in parsed],
                "n_bytes": pdf["content"].map(lambda c: None if c is None else len(c)),
                "width": [p["width"] for p in parsed],
                "height": [p["height"] for p in parsed],
                "sample_rate": [p["sample_rate"] for p in parsed],
                "n_samples": [p["n_samples"] for p in parsed],
                "orientation": [p["orientation"] for p in parsed],
                "n_frames": [p["n_frames"] for p in parsed],
            }
        )


def decode_media_real(media: DataFrame) -> DataFrame:
    """Real header decode: content bytes → sniffed format + dimensions.

    Same Arrow-batched mapInPandas shape as ``decode_media``; the
    media_type is derived from the sniffed format, not trusted from the
    input tag. Needs only (doc_id, content) — column pruning drops the
    rest before the Python worker.
    """
    return media.select("doc_id", "content").mapInPandas(
        _real_features, schema=REAL_FEATURE_SCHEMA
    )


# --- Round-trip encoders (minimal but structurally valid containers) ---
# These exist so the real parser can be exercised on genuine bytes
# without codec libraries: tests and q36_media_header_decode build
# containers, then decode them back through the production kernel.


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int) -> bytes:
    """Complete, spec-valid 8-bit grayscale PNG (CRC'd chunks, zlib IDAT)."""
    return encode_png_gray(bytes(width * height), width, height)


def encode_png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """8-bit grayscale non-interlaced PNG from raw row-major pixels
    (filter type 0 per scanline)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(b: bytes):
    """Pure-Python pixel decode of 8-bit grayscale non-interlaced PNGs:
    (width, height, row-major pixel bytes), or None for any other PNG
    flavor / non-PNG input. Implements the full scanline unfilter
    (None/Sub/Up/Average/Paeth) from the public PNG spec, so it decodes
    any conforming encoder's grayscale output, not just ours."""
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, width, height, idat = 8, None, None, b""
    try:
        while i + 8 <= len(b):
            (length,) = struct.unpack(">I", b[i : i + 4])
            tag = b[i + 4 : i + 8]
            payload = b[i + 8 : i + 8 + length]
            if tag == b"IHDR":
                width, height, depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", payload
                )
                if depth != 8 or color != 0 or interlace != 0:
                    return None
            elif tag == b"IDAT":
                idat += payload
            elif tag == b"IEND":
                break
            i += 12 + length
        if not width or not height or not idat:
            return None
        raw = zlib.decompress(idat)
        stride = width + 1
        if len(raw) < stride * height:
            return None
        out = bytearray(width * height)
        prev = bytes(width)
        for r in range(height):
            row = bytearray(raw[r * stride + 1 : (r + 1) * stride])
            ftype = raw[r * stride]
            if ftype == 1:  # Sub
                for x in range(1, width):
                    row[x] = (row[x] + row[x - 1]) & 0xFF
            elif ftype == 2:  # Up
                for x in range(width):
                    row[x] = (row[x] + prev[x]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(width):
                    left = row[x - 1] if x else 0
                    row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(width):
                    a = row[x - 1] if x else 0
                    c = prev[x - 1] if x else 0
                    p = a + prev[x] - c
                    pa, pb, pc = abs(p - a), abs(p - prev[x]), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (prev[x] if pb <= pc else c)
                    row[x] = (row[x] + pred) & 0xFF
            elif ftype != 0:
                return None
            out[r * width : (r + 1) * width] = row
            prev = row
        return width, height, bytes(out)
    except Exception:  # noqa: BLE001 — corrupt blob ⇒ undecodable, not a task death
        return None


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.LongType()),
        T.StructField("src_height", T.LongType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
        T.StructField("resized", T.BooleanType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Real image-resize tier: decode → aspect-preserving nearest-neighbor
    downsample → re-encode, as an Arrow-batched mapInPandas kernel over
    (doc_id, content) — column pruning drops every other column before
    the Python worker, and whole blobs stay inside one batch.

    The pixel path is the pure-Python grayscale-PNG codec above (the
    container ships no image libraries); any other format passes
    through unchanged with ``resized=False`` and null dimensions — the
    degrade-don't-die contract of decode_media_real. Swapping
    ``decode_png_gray``/``encode_png_gray`` for PIL calls is the only
    change a full-codec deployment needs; schema, batching, and plan
    shape stay identical.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                decoded = None if content is None else decode_png_gray(bytes(content))
                if decoded is None:
                    rows.append((doc_id, None, None, None, None, False, content))
                    continue
                w, h, px = decoded
                scale = max_side / max(w, h)
                if scale >= 1.0:
                    rows.append((doc_id, w, h, w, h, False, content))
                    continue
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(oh) * h // oh).clip(0, h - 1)
                xs = (np.arange(ow) * w // ow).clip(0, w - 1)
                out = img[np.ix_(ys, xs)]
                rows.append(
                    (doc_id, w, h, ow, oh, True, encode_png_gray(out.tobytes(), ow, oh))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "out_width", "out_height", "resized", "content",
                ],
            )

    return media.select("doc_id", "content").mapInPandas(kernel, schema=RESIZE_SCHEMA)


def encode_jpeg(width: int, height: int, orientation: int | None = None) -> bytes:
    """JPEG header skeleton: SOI + JFIF APP0 [+ EXIF APP1 orientation]
    + SOF0 carrying dims + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    app1 = b""
    if orientation is not None:
        # little-endian TIFF, one IFD0 entry: tag 0x0112 SHORT=orientation
        tiff = (
            b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
            + struct.pack("<I", 0)
        )
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + app1 + sof0 + b"\xff\xd9"


def encode_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HHBBB", width, height, 0, 0, 0) + b"\x3b"


def encode_gif_frames(width: int, height: int, n_frames: int) -> bytes:
    """Animated GIF skeleton: header + n image blocks (descriptor +
    minimal LZW data sub-block structure) + trailer — structurally
    valid block layout for frame-count parsing."""
    frame = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + b"\x02"            # LZW minimum code size
        + b"\x01\x00"        # one 1-byte data sub-block
        + b"\x00"            # sub-block terminator
    )
    return (
        b"GIF89a" + struct.pack("<HHBBB", width, height, 0, 0, 0)
        + frame * n_frames
        + b"\x3b"
    )


def encode_bmp(width: int, height: int) -> bytes:
    """BMP: file header + BITMAPINFOHEADER (24bpp, no pixel data needed
    for header parsing; row size recorded as if present)."""
    row = (width * 3 + 3) & ~3
    pixel_bytes = row * height
    header = b"BM" + struct.pack("<IHHI", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    return header + info


def encode_wav(sample_rate: int, n_samples: int) -> bytes:
    """PCM16 mono WAV with a zeroed data chunk of n_samples."""
    data = bytes(n_samples * 2)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_frames(features: DataFrame, stride: int = 24) -> DataFrame:
    """Frame-sampling plan for videos: one output row per sampled frame
    index — pure columnar explode, no Python."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(stride))
    return (
        features.filter(F.col("media_type") == "video")
        .select("doc_id", "n_frames", F.explode(idx).alias("frame_index"))
    )


def encode_wav_pcm(samples, sample_rate: int) -> bytes:
    """PCM16 mono WAV carrying real samples (iterable of int16)."""
    vals = [int(s) for s in samples]
    data = struct.pack(f"<{len(vals)}h", *vals)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm(b: bytes):
    """(sample_rate, int16 sample list) for PCM16 mono WAV, else None."""
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i = 12
        rate, bits, channels, data = None, None, None, None
        while i + 8 <= len(b):
            tag = b[i : i + 4]
            (length,) = struct.unpack("<I", b[i + 4 : i + 8])
            payload = b[i + 8 : i + 8 + length]
            if tag == b"fmt " and length >= 16:
                fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
                if fmt_tag != 1:
                    return None
            elif tag == b"data":
                data = payload
            i += 8 + length + (length & 1)
        if rate is None or data is None or bits != 16 or channels != 1:
            return None
        n = len(data) // 2
        return rate, list(struct.unpack(f"<{n}h", data[: 2 * n]))
    except Exception:  # noqa: BLE001 — corrupt blob ⇒ undecodable, not a task death
        return None


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_rate", T.LongType()),
        T.StructField("out_rate", T.LongType()),
        T.StructField("src_samples", T.LongType()),
        T.StructField("out_samples", T.LongType()),
        T.StructField("resampled", T.BooleanType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resample_audio(media: DataFrame, target_rate: int = 16000) -> DataFrame:
    """Audio downsample tier, symmetric with resize_images: Arrow-batched
    mapInPandas over (doc_id, content), pure-Python PCM16-mono codec,
    integer-stride decimation (rate must divide evenly — the
    deterministic stand-in for a polyphase resampler), pass-through
    with resampled=False for higher-rate-incompatible or non-PCM
    blobs. Swapping the two codec functions for soundfile/scipy is the
    only change a full-codec deployment needs."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                decoded = decode_wav_pcm(bytes(content))
                if decoded is None:
                    rows.append((doc_id, None, None, None, None, False, content))
                    continue
                rate, samples = decoded
                if rate <= target_rate or rate % target_rate != 0:
                    rows.append((doc_id, rate, rate, len(samples), len(samples), False, content))
                    continue
                stride = rate // target_rate
                out = np.asarray(samples, dtype=np.int16)[::stride]
                rows.append(
                    (
                        doc_id, rate, target_rate, len(samples), len(out), True,
                        encode_wav_pcm(out.tolist(), target_rate),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_rate", "out_rate",
                    "src_samples", "out_samples", "resampled", "content",
                ],
            )

    return media.select("doc_id", "content").mapInPandas(kernel, schema=RESAMPLE_SCHEMA)
