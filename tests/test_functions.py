"""Unit tests for the columnar scalar helpers and the protobuf codec
(round-trip property, mirroring the reference's test strategy —
/root/reference/lib/parse_test.go)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.functions.protowire import MSG_KINDS, decode_message, encode_message
from cometbft_log_etl_spark.functions.scalars import (
    extract_peer_id,
    format_source_peer,
    format_step,
    go_duration_ms,
    parse_round_info,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    "inp,want",
    [
        ("RoundStepPrecommitWait", "precommitWait"),
        ("RoundStepNewHeight", "newHeight"),
        ("RoundStepCommit", "commit"),
        ("NotAStep", None),
        ("RoundStep", None),
    ],
)
def test_format_step(spark, inp, want):
    assert _eval(spark, format_step(F.lit(inp))) == want


@pytest.mark.parametrize(
    "inp,want",
    [
        ("abcd1234@10.0.0.1:26656", "abcd1234"),
        ("no-at-sign", "no-at-sign"),
        ("x@y@z", "x"),
    ],
)
def test_extract_peer_id(spark, inp, want):
    assert _eval(spark, extract_peer_id(F.lit(inp))) == want


def test_format_source_peer(spark):
    got = _eval(spark, format_source_peer(F.lit("Peer{MConn{127.0.0.1:57186} 1d8ff37135f15832 in}")))
    assert got == "1d8ff37135f15832@127.0.0.1:57186"


@pytest.mark.parametrize(
    "inp,want",
    [
        ("100ms", 100),
        ("3s", 3000),
        ("2m", 120_000),
        ("1h2m3.5s", 3_723_500),
        ("-2s", -2000),
        ("150us", 0),  # sub-ms floors to 0 via Milliseconds()
        ("garbage", 0),
        ("", 0),
    ],
)
def test_go_duration_ms(spark, inp, want):
    assert _eval(spark, go_duration_ms(F.lit(inp))) == want


def test_parse_round_info(spark):
    h, r, s = parse_round_info(F.lit("12/3/RoundStepPropose"))
    row = spark.range(1).select(h.alias("h"), r.alias("r"), s.alias("s")).collect()[0]
    assert (row.h, row.r, row.s) == (12, 3, "propose")
    h2, _, _ = parse_round_info(F.lit("not-a-triple"))
    assert _eval(spark, h2) is None


# --- protobuf codec round-trips ----------------------------------------

_CASES = [
    ("new_round_step", dict(height=7, round=2, step="prevote", seconds_since_start_time=4, last_commit_round=1)),
    ("new_valid_block", dict(height=9, round=1, ps_total=4, ps_hash="ab" * 6, bits=4, elems=[13], is_commit=True)),
    (
        "proposal",
        dict(vote_type="proposal", height=3, round=0, pol_round=-1, bid_hash="0a" * 6, ps_total=2,
             ps_hash="0b" * 6, msg_ts="2025-06-01T12:00:00.123456789Z", signature="fe" * 8),
    ),
    ("proposal_pol", dict(height=5, pol_round=2, bits=3, elems=[5])),
    ("block_part", dict(height=8, round=0, part_index=3, part_bytes="aa" * 32)),
    (
        "vote",
        dict(vote_type="precommit", height=11, round=4, bid_hash="1c" * 6, ps_total=1, ps_hash="2d" * 6,
             msg_ts="2025-06-01T12:00:01.000000001Z", validator_address="3e" * 20, validator_index=2,
             signature="4f" * 8, extension=""),
    ),
    ("has_vote", dict(height=6, round=1, vote_type="prevote", vote_index=3)),
    ("vote_set_maj23", dict(height=2, round=0, vote_type="precommit", bid_hash="5a" * 6, ps_total=1, ps_hash="6b" * 6)),
    ("vote_set_bits", dict(height=2, round=0, vote_type="prevote", bid_hash="7c" * 6, ps_total=1, ps_hash="8d" * 6, bits=4, elems=[9])),
    ("has_proposal_block_part", dict(height=4, round=1, part_index=2)),
]


@pytest.mark.parametrize("kind,kw", _CASES, ids=[c[0] for c in _CASES])
def test_protowire_roundtrip(kind, kw):
    decoded = decode_message(encode_message(kind, **kw))
    assert decoded["kind"] == kind
    for k, v in kw.items():
        assert decoded.get(k) == v, f"{kind}.{k}: {decoded.get(k)!r} != {v!r}"


def test_protowire_negative_round():
    # proto int32 round = -1 survives the 64-bit two's-complement varint
    d = decode_message(encode_message("has_vote", height=1, round=-1, vote_type="prevote", vote_index=0))
    assert d["round"] == -1


def test_protowire_garbage_rejected():
    rng = random.Random(42)
    rejected = 0
    for _ in range(200):
        blob = bytes(rng.getrandbits(8) for _ in range(rng.randrange(1, 40)))
        try:
            d = decode_message(blob)
            assert d["kind"] in MSG_KINDS.values()
        except ValueError:
            rejected += 1
    assert rejected > 50  # most random blobs must be rejected, never crash
