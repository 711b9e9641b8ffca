"""C9/C14 text-parser tests, mirroring the reference's strategy
(lib/parse_test.go): golden vote input, round-trip properties over
random hex fields, table-driven negative cases — plus the Spark UDF
path over committed_block events."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cometbft_log_etl_spark.functions.blocktext import (
    parse_block_id,
    parse_block_string,
    parse_commit_sig,
    parse_consensus_version,
    parse_vote_string,
    render_block,
    render_vote,
)

# --- C14 vote strings ------------------------------------------------------


def test_vote_golden():
    # the reference's own golden input (lib/parse_test.go:13)
    s = (
        "[Vote Vote{0:14723CA68371 1/00/SIGNED_MSG_TYPE_PREVOTE(Prevote) "
        "59E565861577 F786A527D8FA 000000000000 @ 2025-06-08T01:24:20.126787Z}]"
    )
    v = parse_vote_string(s)
    assert v == {
        "type": "prevote",
        "height": 1,
        "round": 0,
        "block_id": {"hash": "59E565861577", "part_set_header": {"total": 0, "hash": "F786A527D8FA"}},
        "timestamp": datetime(2025, 6, 8, 1, 24, 20, 126787, tzinfo=timezone.utc),
        "validator_address": "14723CA68371",
        "validator_index": 0,
        "signature": "",
        "extension": "",
    }


def test_vote_nil():
    assert parse_vote_string("nil-Vote") is None


hex_str = st.integers(0, 2**48 - 1).map(lambda n: f"{n:012X}")


@settings(max_examples=50, deadline=None)
@given(
    idx=st.integers(0, 200),
    addr=hex_str,
    h=st.integers(1, 10**9),
    r=st.integers(0, 100),
    vt=st.sampled_from(["prevote", "precommit"]),
    bh=hex_str,
    psh=hex_str,
    pst=st.integers(0, 10_000),
    sig=st.one_of(st.just(""), hex_str),
    micros=st.integers(0, 999_999),
)
def test_vote_round_trip(idx, addr, h, r, vt, bh, psh, pst, sig, micros):
    v = {
        "type": vt,
        "height": h,
        "round": r,
        "block_id": {"hash": bh, "part_set_header": {"total": pst, "hash": psh}},
        "timestamp": datetime(2025, 6, 1, 12, 0, 0, micros, tzinfo=timezone.utc),
        "validator_address": addr,
        "validator_index": idx,
        "signature": sig,
        "extension": "",
    }
    assert parse_vote_string(render_vote(v)) == v


@pytest.mark.parametrize(
    "bad",
    [
        "Vote{}",
        "[Vote Vote{0:AA}]",
        "[Vote Vote{0:AA 1/0/PREVOTE BB CC 1}]",  # missing @
        "garbage",
    ],
)
def test_vote_invalid(bad):
    with pytest.raises(ValueError):
        parse_vote_string(bad)


# --- helpers (parse.go:519-647) -------------------------------------------


@pytest.mark.parametrize(
    "s,want",
    [
        ("{11 0}", {"block": 11, "app": 0}),
        ("{Block:11 App:2}", {"block": 11, "app": 2}),
    ],
)
def test_consensus_version(s, want):
    assert parse_consensus_version(s) == want


def test_consensus_version_invalid():
    with pytest.raises(ValueError):
        parse_consensus_version("v11.0")


@pytest.mark.parametrize(
    "s,h,total,ph",
    [
        ("AABB:5:CCDD", "AABB", 5, "CCDD"),
        ("AABB:{7:CCDD}", "AABB", 0, ""),  # 2-part split keeps default psh
        ("AABB:x", "AABB", 0, ""),
    ],
)
def test_block_id(s, h, total, ph):
    b = parse_block_id(s)
    assert b["hash"] == h
    assert b["part_set_header"]["total"] == total
    assert b["part_set_header"]["hash"] == ph


def test_commit_sig_absent():
    s = parse_commit_sig("CommitSig{nil-CommitSig}")
    assert s["block_id_flag"] == 1 and s["signature"] == ""


# --- C9 block strings ------------------------------------------------------


def _mk_block(h=123, txs=(), nsigs=2):
    ts = datetime(2025, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
    return {
        "header": {
            "version": {"block": 11, "app": 0},
            "chain_id": "test-chain-id",
            "height": h,
            "time": ts,
            "last_block_id": {"hash": "AA" * 16, "part_set_header": {"total": 100, "hash": "BB" * 16}},
            "last_commit_hash": "C1" * 16, "data_hash": "D2" * 16,
            "validators_hash": "E3" * 16, "next_validators_hash": "E4" * 16,
            "app_hash": "A5" * 16, "consensus_hash": "C6" * 16,
            "last_results_hash": "F7" * 16, "evidence_hash": "E8" * 16,
            "proposer_address": "AB" * 10,
        },
        "data": {"txs": list(txs)},
        "last_commit": {
            "height": h - 1,
            "round": 1,
            "block_id": {"hash": "CC" * 16, "part_set_header": {"total": 50, "hash": "DD" * 16}},
            "signatures": [
                {"block_id_flag": 2, "validator_address": "EE" * 10,
                 "timestamp": ts, "signature": "5A" * 16}
                for _ in range(nsigs)
            ],
        },
    }


def test_block_round_trip():
    b = _mk_block(txs=["DEADBEEF", "CAFE1234"])
    got = parse_block_string(render_block(b))
    assert got == b


def test_block_round_trip_empty_sections():
    b = _mk_block(txs=[], nsigs=0)
    assert parse_block_string(render_block(b)) == b


def test_block_nil():
    assert parse_block_string("nil-Block") is None


@pytest.mark.parametrize(
    "bad",
    ["", "NotABlock{", "Block{\nGarbage", "Block{\n  Header{\n"],
)
def test_block_invalid(bad):
    with pytest.raises(ValueError):
        parse_block_string(bad)


def test_block_udf_over_events(spark, tmp_path):
    from cometbft_log_etl_spark.functions.blocktext import block_struct
    from cometbft_log_etl_spark.pipeline import etl_events
    from pyspark.sql import functions as F

    from .fixtures import build_scenario, write_logs

    sc = build_scenario(heights=3)
    d = tmp_path / "logs"
    write_logs(sc, str(d))
    ev = etl_events(spark, str(d))
    blocks = (
        ev.filter(F.col("event_type") == "committed_block")
        .withColumn("block", block_struct("block_raw"))
        .select(
            "height",
            F.col("block.header.height").alias("hdr_height"),
            F.col("block.header.chain_id").alias("chain_id"),
            F.size("block.last_commit.signatures").alias("nsigs"),
            F.size("block.data.txs").alias("ntxs"),
        )
    )
    rows = blocks.collect()
    assert len(rows) == sc.expected["committed_block"]
    # parsed header height equals the event height; 4 commit sigs each
    assert all(r.height == r.hdr_height for r in rows)
    assert all(r.chain_id == "test-chain" for r in rows)
    assert all(r.nsigs == 4 for r in rows)
    assert {r.ntxs for r in rows} == {0, 1}
