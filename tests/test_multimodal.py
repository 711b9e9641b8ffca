"""Multimodal plumbing tests: schema, batch kernel, frame sampling,
and the real container-header decoder on genuine bytes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.operators.multimodal import (
    decode_media,
    decode_media_real,
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_png,
    encode_wav,
    parse_media_header,
    sample_frames,
    synthesize_media,
)
from cometbft_log_etl_spark.tables import load


@pytest.fixture(scope="module")
def feats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return decode_media(synthesize_media(docs)).cache()


def test_feature_schema_and_types(feats):
    rows = feats.limit(500).collect()
    assert len(rows) > 0
    for r in rows:
        if r.media_type == "image":
            assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080 and r.n_frames == 1
        elif r.media_type == "audio":
            assert r.width == 0 and r.sample_rate == 16000
        else:
            assert r.media_type == "video" and r.n_frames >= 1
        assert r.n_bytes > 0


def test_media_type_partition(feats):
    counts = {r.media_type: r.n for r in feats.groupBy("media_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}


def test_sample_frames(feats):
    s = sample_frames(feats, stride=24)
    row = s.groupBy("doc_id").agg(F.count("*").alias("n"), F.max("n_frames").alias("f")).limit(20).collect()
    for r in row:
        assert r.n == (r.f - 1) // 24 + 1


@pytest.mark.parametrize(
    "blob,want",
    [
        (encode_png(640, 480), ("png", 640, 480, None, None)),
        (encode_jpeg(1920, 1080), ("jpeg", 1920, 1080, None, None)),
        (encode_gif(12, 34), ("gif", 12, 34, None, None)),
        (encode_bmp(256, 128), ("bmp", 256, 128, None, None)),
        (encode_wav(44100, 4410), ("wav", None, None, 44100, 4410)),
        (b"not a media file at all", ("unknown", None, None, None, None)),
        (b"", ("unknown", None, None, None, None)),
        (b"\xff\xd8\xff", ("unknown", None, None, None, None)),  # truncated JPEG
    ],
)
def test_parse_media_header(blob, want):
    got = parse_media_header(blob)
    assert (got["format"], got["width"], got["height"], got["sample_rate"], got["n_samples"]) == want


def test_parse_wav_adpcm_sub_byte_bits():
    """4-bit ADPCM (bits-per-sample < 8) must degrade to a null
    n_samples, not divide by zero inside the mapInPandas task."""
    import struct

    def wav_with_bits(bits: int) -> bytes:
        data = bytes(64)
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, bits)  # IMA ADPCM
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for bits in (0, 1, 4, 7):
        got = parse_media_header(wav_with_bits(bits))
        assert got["format"] == "wav" and got["sample_rate"] == 8000
        assert got["n_samples"] is None
    # 8-bit PCM still computes
    got = parse_media_header(wav_with_bits(8))
    assert got["n_samples"] == 64


def test_png_is_spec_valid_for_stdlib():
    """The PNG encoder produces chunks a strict reader accepts (CRCs,
    zlib IDAT) — guards against the round-trip passing only because
    encoder and parser share the same wrong assumption."""
    import struct
    import zlib

    b = encode_png(3, 2)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    i = 8
    tags = []
    while i < len(b):
        (ln,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        payload = b[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", b[i + 8 + ln : i + 12 + ln])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        if tag == b"IDAT":
            raw = zlib.decompress(payload)
            assert len(raw) == 2 * (1 + 3)  # height * (filter byte + width)
        tags.append(tag)
        i += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def test_decode_media_real_spark(spark):
    rows = [
        (1, bytearray(encode_png(64, 48))),
        (2, bytearray(encode_wav(16000, 320))),
        (3, bytearray(b"corrupt")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in decode_media_real(media).collect()}
    assert got[1].format == "png" and got[1].width == 64 and got[1].height == 48
    assert got[1].media_type == "image" and got[1].n_bytes == len(rows[0][1])
    assert got[2].format == "wav" and got[2].sample_rate == 16000 and got[2].n_samples == 320
    assert got[2].media_type == "audio"
    assert got[3].format == "unknown" and got[3].width is None and got[3].media_type == "unknown"


def test_parse_media_header_never_raises():
    """The decoder must degrade gracefully on arbitrary bytes — a 100 TB
    job cannot die on one corrupt blob. Fuzz with hypothesis, including
    prefixes that look like real magic numbers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    magics = [b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"BM", b"RIFF"]

    @settings(max_examples=300, deadline=None)
    @given(
        prefix=st.sampled_from(magics + [b""]),
        body=st.binary(max_size=64),
    )
    def run(prefix, body):
        out = parse_media_header(prefix + body)
        assert set(out) == {"format", "width", "height", "sample_rate", "n_samples", "orientation", "n_frames"}
        assert isinstance(out["format"], str)

    run()


def test_exif_orientation_round_trip():
    """EXIF orientation survives the encode→parse round trip in both
    TIFF byte orders; JPEGs without APP1 yield None."""
    import struct

    for o in (1, 3, 6, 8):
        got = parse_media_header(encode_jpeg(100, 50, orientation=o))
        assert (got["format"], got["width"], got["height"], got["orientation"]) == ("jpeg", 100, 50, o)
    assert parse_media_header(encode_jpeg(100, 50))["orientation"] is None
    # hand-build a BIG-endian EXIF (encoder emits little-endian only)
    tiff = (
        b"MM\x00*" + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 5, 0)
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 50, 100, 1) + b"\x01\x11\x00"
    got = parse_media_header(b"\xff\xd8" + app1 + sof0 + b"\xff\xd9")
    assert got["orientation"] == 5 and got["width"] == 100


# --- resize tier: pure-Python grayscale-PNG codec + Spark kernel ---


def _gradient(w, h):
    return bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))


def test_png_gray_codec_round_trip():
    from cometbft_log_etl_spark.operators.multimodal import (
        decode_png_gray,
        encode_png_gray,
    )

    px = _gradient(37, 23)
    w, h, out = decode_png_gray(encode_png_gray(px, 37, 23))
    assert (w, h) == (37, 23) and out == px


def test_png_unfilter_all_filter_types():
    """decode_png_gray must reverse every spec filter, not just the
    type-0 rows our encoder emits — forward-filter a known image with
    Sub/Up/Average/Paeth and check the decode recovers the pixels."""
    import struct as _s
    import zlib as _z

    from cometbft_log_etl_spark.operators.multimodal import (
        _png_chunk,
        decode_png_gray,
    )

    w, h = 9, 5
    px = _gradient(w, h)
    rows = [px[r * w : (r + 1) * w] for r in range(h)]
    filtered = bytearray()
    prev = bytes(w)
    for r, (ftype, row) in enumerate(zip([0, 1, 2, 3, 4], rows)):
        filtered.append(ftype)
        for x in range(w):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filtered.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_gray(blob) == (w, h, px)


def test_resize_images_spark(spark):
    from cometbft_log_etl_spark.operators.multimodal import (
        decode_png_gray,
        encode_jpeg,
        encode_png_gray,
        resize_images,
    )

    big = encode_png_gray(_gradient(100, 40), 100, 40)
    small = encode_png_gray(_gradient(10, 8), 10, 8)
    jpg = encode_jpeg(640, 480)
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, jpg)], "doc_id long, content binary"
    )
    out = {r.doc_id: r for r in resize_images(df, max_side=50).collect()}

    r1 = out[1]  # downsampled, aspect preserved
    assert r1.resized and (r1.src_width, r1.src_height) == (100, 40)
    assert (r1.out_width, r1.out_height) == (50, 20)
    w, h, px = decode_png_gray(bytes(r1.content))
    assert (w, h) == (50, 20)
    # nearest-neighbor contract: output pixel (y, x) samples source
    # (y*40//20, x*100//50)
    src = _gradient(100, 40)
    for y, x in [(0, 0), (7, 31), (19, 49)]:
        assert px[y * 50 + x] == src[(y * 40 // 20) * 100 + (x * 100 // 50)]

    r2 = out[2]  # already under max_side: untouched
    assert not r2.resized and (r2.out_width, r2.out_height) == (10, 8)
    assert bytes(r2.content) == small

    r3 = out[3]  # non-PNG: pass through, never die
    assert not r3.resized and r3.out_width is None
    assert bytes(r3.content) == jpg


def test_png_gray_codec_property():
    """Property: any image round-trips the grayscale-PNG codec exactly."""
    from hypothesis import given, settings, strategies as st

    from cometbft_log_etl_spark.operators.multimodal import (
        decode_png_gray,
        encode_png_gray,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        data=st.data(),
    )
    def check(w, h, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=w * h,
                    max_size=w * h,
                )
            )
        )
        assert decode_png_gray(encode_png_gray(px, w, h)) == (w, h, px)

    check()


def test_wav_pcm_codec_round_trip():
    from cometbft_log_etl_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    samples = [((i * 37) % 4096) - 2048 for i in range(480)]
    rate, out = decode_wav_pcm(encode_wav_pcm(samples, 48000))
    assert rate == 48000 and out == samples


def test_resample_audio_spark(spark):
    from cometbft_log_etl_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_gif,
        encode_wav_pcm,
        resample_audio,
    )

    hi = [((i * 13) % 1000) - 500 for i in range(480)]  # 480 samples @48k
    lo = [1, 2, 3, 4]  # already at 8k < 16k target
    df = spark.createDataFrame(
        [
            (1, encode_wav_pcm(hi, 48000)),
            (2, encode_wav_pcm(lo, 8000)),
            (3, encode_gif(4, 4)),
        ],
        "doc_id long, content binary",
    )
    out = {r.doc_id: r for r in resample_audio(df, target_rate=16000).collect()}

    r1 = out[1]
    assert r1.resampled and (r1.src_rate, r1.out_rate) == (48000, 16000)
    assert r1.out_samples == 160  # stride 3 over 480
    rate, back = decode_wav_pcm(bytes(r1.content))
    assert rate == 16000 and back == hi[::3]

    r2 = out[2]  # lower than target: untouched
    assert not r2.resampled and r2.src_rate == 8000
    assert bytes(r2.content) == encode_wav_pcm(lo, 8000)

    r3 = out[3]  # not audio: pass through
    assert not r3.resampled and r3.src_rate is None


def test_gif_frame_count_and_video_routing(spark):
    """Animated GIF: real frame count parsed from block structure, routed
    as 'video' to the frame-sample tier; single-frame GIF stays image."""
    from cometbft_log_etl_spark.operators.multimodal import (
        decode_media_real,
        encode_gif,
        encode_gif_frames,
        parse_media_header,
        sample_frames,
    )

    anim = encode_gif_frames(8, 6, 50)
    assert parse_media_header(anim)["n_frames"] == 50
    assert parse_media_header(encode_gif_frames(8, 6, 1))["n_frames"] == 1
    assert parse_media_header(encode_gif(8, 6))["n_frames"] is None

    df = spark.createDataFrame(
        [(1, anim), (2, encode_gif_frames(4, 4, 1))], "doc_id long, content binary"
    )
    feats = decode_media_real(df)
    rows = {r.doc_id: r for r in feats.collect()}
    assert rows[1].media_type == "video" and rows[1].n_frames == 50
    assert rows[2].media_type == "image" and rows[2].n_frames == 1

    sampled = sample_frames(feats, stride=24).collect()
    assert sorted(r.frame_index for r in sampled) == [0, 24, 48]


def test_wav_pcm_codec_property():
    """Property: arbitrary int16 sample streams round-trip the WAV codec."""
    from hypothesis import given, settings, strategies as st

    from cometbft_log_etl_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
        ),
    )
    def check(rate, samples):
        assert decode_wav_pcm(encode_wav_pcm(samples, rate)) == (rate, samples)

    check()
