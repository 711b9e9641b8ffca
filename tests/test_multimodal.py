"""Multimodal plumbing tests: schema, batch kernel, frame sampling,
and the clearly-marked real-decoder stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.operators.multimodal import (
    decode_media,
    decode_media_real,
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


def test_real_decoder_is_stubbed(feats):
    with pytest.raises(NotImplementedError):
        decode_media_real(feats)
