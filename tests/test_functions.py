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


# --- protobuf codec properties (hypothesis) ----------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _hexs(max_bytes: int):
    """Even-length lowercase hex strings, 1..max_bytes bytes."""
    return st.integers(1, max_bytes).flatmap(
        lambda n: st.integers(0, 2 ** (8 * n) - 1).map(lambda v: f"{v:0{2 * n}x}")
    )


@settings(max_examples=150, deadline=None)
@given(
    height=st.integers(0, 2**62),
    round_=st.integers(-1, 2**31 - 1),
    vote_type=st.sampled_from(["prevote", "precommit"]),
    vote_index=st.integers(0, 2**31 - 1),
)
def test_protowire_has_vote_property(height, round_, vote_type, vote_index):
    # whole int64/int32 domains, not just the fixture values — varint
    # continuation-bit handling must hold at every byte-length boundary
    d = decode_message(
        encode_message("has_vote", height=height, round=round_, vote_type=vote_type, vote_index=vote_index)
    )
    assert (d["height"], d["round"], d["vote_type"], d["vote_index"]) == (
        height,
        round_,
        vote_type,
        vote_index,
    )


@settings(max_examples=100, deadline=None)
@given(
    height=st.integers(0, 2**62),
    round_=st.integers(0, 2**31 - 1),
    part_index=st.integers(0, 2**31 - 1),
    part_bytes=_hexs(64),
)
def test_protowire_block_part_property(height, round_, part_index, part_bytes):
    d = decode_message(
        encode_message("block_part", height=height, round=round_, part_index=part_index, part_bytes=part_bytes)
    )
    assert (d["height"], d["round"], d["part_index"], d["part_bytes"]) == (
        height,
        round_,
        part_index,
        part_bytes,
    )


@settings(max_examples=100, deadline=None)
@given(
    height=st.integers(1, 2**62),
    round_=st.integers(0, 2**31 - 1),
    vote_type=st.sampled_from(["prevote", "precommit"]),
    bid_hash=_hexs(32),
    ps_total=st.integers(1, 2**31 - 1),
    ps_hash=_hexs(32),
    validator_address=_hexs(20),
    validator_index=st.integers(0, 2**31 - 1),
    signature=_hexs(64),
    nanos=st.integers(0, 999_999_999),
)
def test_protowire_vote_property(
    height, round_, vote_type, bid_hash, ps_total, ps_hash,
    validator_address, validator_index, signature, nanos,
):
    msg_ts = f"2025-06-01T12:00:00.{nanos:09d}Z"
    kw = dict(
        vote_type=vote_type, height=height, round=round_, bid_hash=bid_hash,
        ps_total=ps_total, ps_hash=ps_hash, msg_ts=msg_ts,
        validator_address=validator_address, validator_index=validator_index,
        signature=signature, extension="",
    )
    d = decode_message(encode_message("vote", **kw))
    for k, v in kw.items():
        assert d.get(k) == v, f"vote.{k}: {d.get(k)!r} != {v!r}"
