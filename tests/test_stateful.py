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
    assert q.awaitTermination(180), "stream did not finish in time"
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
    assert q.awaitTermination(120), "stream did not finish in time"
    rows = spark.table("t_dup").filter(F.col("status") == "confirmed").collect()
    # one send, two receives → TWO confirmations (80 ms and 200 ms)
    assert sorted(r.latency_ms for r in rows) == [80, 200]


def test_literal_map_semantics_single_run(spark, tmp_path):
    """All three map-semantics edges in ONE streaming run, multi-batch:

    - receive-before-send → confirmed with negative latency
      (processor.go:79-88);
    - duplicate receive → re-confirmation against the latest send
      (processor.go:95-110);
    - send never received → event-time-timeout flush as 'unmatched'
      (the reference's Finalize pendings).

    Files are fed one per micro-batch (maxFilesPerTrigger=1, mtime
    order) so state and watermark carry across batches; the output row
    set must equal the literal-map expectation exactly — the streaming
    analog of the batch plugin's status records.
    """
    import base64
    import json
    import os

    from cometbft_log_etl_spark.functions.protowire import encode_message

    from .fixtures import NODE_IDS, PEER_ADDR, VAL_ADDRS

    T0 = "2025-06-01T12:00:"

    def payload(vidx):
        return encode_message(
            "vote", vote_type="prevote", height=7, round=0,
            bid_hash="ab" * 6, ps_total=1, ps_hash="cd" * 6,
            msg_ts="2025-06-01T12:00:00.000000000Z",
            validator_address="ee" * 20, validator_index=vidx, signature="ab" * 8,
        )

    def send(vidx, ts):
        return {"_msg": "Send", "channel": 0x22, "conn": "MConn{x}",
                "msgBytes": payload(vidx).hex().upper(),
                "peer": f"{NODE_IDS[1]}@{PEER_ADDR[1]}", "ts": ts}

    def recv(vidx, ts):
        return {"_msg": "Received bytes", "chID": 0x22,
                "msgBytes": base64.b64encode(payload(vidx)).decode(),
                "peer": f"{NODE_IDS[0]}@{PEER_ADDR[0]}", "ts": ts}

    def ident(node, ts):
        return [
            {"_msg": "P2P Node ID", "ID": NODE_IDS[node], "file": "/k", "ts": ts},
            {"_msg": "This node is a validator", "addr": VAL_ADDRS[node],
             "pubKey": "x", "ts": ts},
        ]

    d = tmp_path / "literal-logs"
    d.mkdir()
    # batch 1 (node0): K1 send, K3 send (never received)
    f1 = [*ident(0, f"{T0}00.000000000Z"),
          send(1, f"{T0}01.000000000Z"),
          send(3, f"{T0}01.000000000Z")]
    # batch 2 (node1): K2 receive BEFORE its send; K1 receive + duplicate
    f2 = [*ident(1, f"{T0}00.000000000Z"),
          recv(2, f"{T0}00.900000000Z"),
          recv(1, f"{T0}01.080000000Z"),
          recv(1, f"{T0}01.200000000Z")]
    # batch 3 (node0): K2's late send (out-of-order pair), plus a
    # watermark driver at +300 s (key K4 stays pending — never flushed,
    # the run ends first)
    f3 = [*ident(0, f"{T0}00.000000000Z"),
          send(2, f"{T0}01.000000000Z"),
          send(4, "2025-06-01T12:05:00.000000000Z")]
    # batch 4 (node0): advances processing one more batch so the
    # watermark from batch 3 (+300 s − 30 s ≫ K3's +121 s timeout)
    # fires K3's event-time flush; K5 itself stays pending
    f4 = [*ident(0, f"{T0}00.000000000Z"),
          send(5, "2025-06-01T12:05:10.000000000Z")]

    for i, lines in enumerate([f1, f2, f3, f4], start=1):
        p = d / f"b{i}.log"
        p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    df = stateful_vote_matcher(stream_events(spark, str(d), max_files_per_trigger=1))
    q = (
        df.writeStream.format("memory")
        .queryName("t_literal")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    rows = spark.table("t_literal").collect()

    got = sorted(
        (r.status, r.latency_ms, r.sent_time is not None, r.received_time is not None)
        for r in rows
    )
    assert got == sorted(
        [
            ("confirmed", 80, True, True),     # K1 first confirm
            ("confirmed", 200, True, True),    # K1 duplicate re-confirm
            ("confirmed", -100, True, True),   # K2 receive-before-send
            ("unmatched", None, True, False),  # K3 timeout flush
        ]
    )
