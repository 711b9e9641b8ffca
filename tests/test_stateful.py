"""applyInPandasWithState matcher: must reproduce the batch plugin's
confirmed counts on the fixture, plus the map-semantics edges (re-
confirmation, receive-before-send) the FIFO join doesn't mirror."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.streaming.ingest import stream_events
from cometbft_log_etl_spark.streaming.stateful import stateful_vote_matcher

from .fixtures import build_scenario, write_logs


@pytest.fixture(scope="module")
def matched(spark, tmp_path_factory):
    sc = build_scenario(heights=3)
    d = tmp_path_factory.mktemp("stateful-logs")
    write_logs(sc, str(d))
    df = stateful_vote_matcher(stream_events(spark, str(d)))
    q = (
        df.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table("t_stateful"), sc


def test_confirmed_matches_batch_plugin(matched):
    out, sc = matched
    confirmed = out.filter(F.col("status") == "confirmed")
    assert confirmed.count() == sc.expected["receive_packet_vote"]
    lats = {r.latency_ms for r in confirmed.select("latency_ms").distinct().collect()}
    assert lats == {350, 80}


def test_no_spurious_unmatched_mid_stream(matched):
    out, _ = matched
    # the run ends before any event-time timeout fires: lost sends stay
    # in state, exactly like the reference's pendings before Finalize
    assert out.filter(F.col("status") == "unmatched").count() == 0


def test_reconfirmation_semantics(spark, tmp_path):
    """A duplicate receive after confirmation re-confirms against the
    latest send (processor.go:95-110) — the edge the batch FIFO join
    deliberately does not mirror."""
    import base64
    import json

    from cometbft_log_etl_spark.functions.protowire import encode_message

    from .fixtures import NODE_IDS, PEER_ADDR, VAL_ADDRS

    d = tmp_path / "dup-logs"
    d.mkdir()
    payload = encode_message(
        "vote", vote_type="prevote", height=7, round=0,
        bid_hash="ab" * 6, ps_total=1, ps_hash="cd" * 6,
        msg_ts="2025-06-01T12:00:00.000000000Z",
        validator_address="ee" * 20, validator_index=1, signature="ab" * 8,
    )
    send = {"_msg": "Send", "channel": 0x22, "conn": "MConn{x}",
            "msgBytes": payload.hex().upper(),
            "peer": f"{NODE_IDS[1]}@{PEER_ADDR[1]}"}
    recv = {"_msg": "Received bytes", "chID": 0x22,
            "msgBytes": base64.b64encode(payload).decode(),
            "peer": f"{NODE_IDS[0]}@{PEER_ADDR[0]}"}
    lines = [
        {"_msg": "P2P Node ID", "ID": NODE_IDS[0], "file": "/k", "ts": "2025-06-01T12:00:00.000000000Z"},
        {"_msg": "This node is a validator", "addr": VAL_ADDRS[0], "pubKey": "x",
         "ts": "2025-06-01T12:00:00.001000000Z"},
        {**send, "ts": "2025-06-01T12:00:01.000000000Z"},
    ]
    (d / "node0.log").write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    recv_lines = [
        {"_msg": "P2P Node ID", "ID": NODE_IDS[1], "file": "/k", "ts": "2025-06-01T12:00:00.000000000Z"},
        {"_msg": "This node is a validator", "addr": VAL_ADDRS[1], "pubKey": "x",
         "ts": "2025-06-01T12:00:00.001000000Z"},
        {**recv, "ts": "2025-06-01T12:00:01.080000000Z"},
        {**recv, "ts": "2025-06-01T12:00:01.200000000Z"},  # duplicate
    ]
    (d / "node1.log").write_text("\n".join(json.dumps(x) for x in recv_lines) + "\n")

    df = stateful_vote_matcher(stream_events(spark, str(d)))
    q = (
        df.writeStream.format("memory")
        .queryName("t_dup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_dup").filter(F.col("status") == "confirmed").collect()
    # one send, two receives → TWO confirmations (80 ms and 200 ms)
    assert sorted(r.latency_ms for r in rows) == [80, 200]
