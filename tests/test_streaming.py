"""Structured-Streaming parity tests: the streaming path must produce
exactly the batch path's results on the same log directory (S7 →
ParseStream parity by construction), plus watermark semantics for the
stream-stream vote matcher."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.pipeline import etl_events
from cometbft_log_etl_spark.streaming.analytics import (
    streaming_vote_matches,
    windowed_event_counts,
)
from cometbft_log_etl_spark.streaming.ingest import stream_events, stream_normalized

from .fixtures import build_scenario, write_logs


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    sc = build_scenario(heights=4)
    d = tmp_path_factory.mktemp("stream-logs")
    write_logs(sc, str(d))
    return str(d), sc


def _run_to_memory(df, name: str, spark):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if not df.isStreaming or True else "complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    return spark.table(name)


def test_stream_normalized_matches_batch(spark, log_dir):
    d, sc = log_dir
    out = _run_to_memory(stream_normalized(spark, d), "t_norm", spark)
    got = {r.event_type: r.n for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == dict(sc.expected)


def test_stream_events_identity_stamped(spark, log_dir):
    d, _ = log_dir
    stream_df = stream_events(spark, d)
    assert stream_df.isStreaming
    out = _run_to_memory(stream_df, "t_events", spark)
    assert out.filter(F.col("node_id").isNull()).count() == 0
    # full parity with the batch pipeline, row for row
    batch = etl_events(spark, d)
    assert out.count() == batch.count()


def test_windowed_counts(spark, log_dir):
    d, sc = log_dir
    counts = windowed_event_counts(stream_normalized(spark, d), window="5 seconds")
    # complete mode: every window's current count each batch (append mode
    # would only emit windows the watermark has closed)
    q = (
        counts.writeStream.format("memory")
        .queryName("t_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    out = spark.table("t_windows")
    total = out.agg(F.sum("n")).collect()[0][0] or 0
    assert total == sum(sc.expected.values())


def test_streaming_vote_confirmations(spark, log_dir):
    d, sc = log_dir
    matches = streaming_vote_matches(stream_events(spark, d), how="inner")
    out = _run_to_memory(matches, "t_votes", spark)
    assert out.count() == sc.expected["receive_packet_vote"]
    lats = {r.latency_ms for r in out.select("latency_ms").distinct().collect()}
    assert lats == {350, 80}


def test_streaming_unmatched_after_watermark(spark, tmp_path_factory):
    """Watermark expiry = the reference's end-of-input pending flush: a
    far-future heartbeat vote pair advances the event-time watermark past
    every pending send, so the scenario's lost votes emit as unmatched.

    The heartbeat file must exist before the query starts: the
    stream-static identity join freezes its file listing at query start,
    and a receive with a NULL (identity-less) join key is null-filtered
    before it can ever advance the watermark.
    """
    import base64

    from cometbft_log_etl_spark.functions.protowire import encode_message

    from .fixtures import NODE_IDS, PEER_ADDR, VAL_ADDRS

    work = tmp_path_factory.mktemp("wm-logs")
    base = build_scenario(heights=2)
    write_logs(base, str(work))

    ts = "2025-06-01T13:30:00.000000000Z"
    payload = encode_message(
        "vote", vote_type="prevote", height=999, round=0,
        bid_hash="ab" * 6, ps_total=1, ps_hash="cd" * 6,
        msg_ts=ts, validator_address="ee" * 20,
        validator_index=0, signature="ab" * 8,
    )
    hb = [
        {"_msg": "P2P Node ID", "ID": NODE_IDS[3], "file": "/k", "ts": ts},
        {"_msg": "This node is a validator", "addr": VAL_ADDRS[3], "pubKey": "x", "ts": ts},
        # a matching self-link pair: confirms instead of adding unmatched
        {"_msg": "Send", "channel": 0x22, "conn": "MConn{x}",
         "msgBytes": payload.hex().upper(),
         "peer": f"{NODE_IDS[3]}@{PEER_ADDR[3]}", "ts": ts},
        {"_msg": "Received bytes", "chID": 0x22,
         "msgBytes": base64.b64encode(payload).decode(),
         "peer": f"{NODE_IDS[3]}@{PEER_ADDR[3]}", "ts": ts},
    ]
    with open(os.path.join(str(work), "heartbeat.log"), "w") as f:
        f.write("\n".join(json.dumps(x) for x in hb) + "\n")

    matched = streaming_vote_matches(stream_events(spark, str(work)), how="left_outer")
    q = matched.writeStream.format("memory").queryName("t_unmatched").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("t_unmatched")
    assert out.filter(F.col("status") == "confirmed").count() > 0
    un = out.filter(F.col("status") == "unmatched")
    # the scenario loses one precommit vote per height (2 heights)
    assert un.count() == 2
    assert un.filter(F.col("received_time").isNotNull()).count() == 0


def test_stream_dedup_lines(spark, tmp_path_factory):
    """Duplicated input lines collapse to one; downstream normalize parity."""
    from cometbft_log_etl_spark.operators.normalize import normalize
    from cometbft_log_etl_spark.sources.logs import parse_raw
    from cometbft_log_etl_spark.streaming.ingest import stream_dedup_lines

    d = tmp_path_factory.mktemp("dup-logs")
    sc = build_scenario(heights=3)
    write_logs(sc, str(d))
    # Double every line of every file — exact duplicates, same file.
    for fn in os.listdir(str(d)):
        p = os.path.join(str(d), fn)
        with open(p) as f:
            body = f.read()
        with open(p, "w") as f:
            f.write(body + body)

    deduped = stream_dedup_lines(spark, str(d))
    out = _run_to_memory(deduped, "t_dedup", spark)

    # Lines without a parseable ts carry no event time to watermark on —
    # stream_dedup_lines drops them (the batch tag-peek drops them later
    # anyway), so the parity universe is timestamped lines only.
    batch_lines = spark.read.text(f"{d}/*.log").filter(
        F.get_json_object("value", "$.ts").isNotNull()
    )
    n_distinct = batch_lines.distinct().count()
    assert out.count() == n_distinct
    # doubling plus the scenario's naturally repeated lines both collapse
    assert batch_lines.count() >= 2 * out.count()

    # Stream/batch dedup parity through the SAME downstream transforms.
    # (Not compared against sc.expected: the scenario deliberately
    # contains semantically-meaningful duplicate gossip lines — the P7f
    # duplicate-traffic fixtures — which content dedup collapses.)
    def _counts(df):
        norm = normalize(parse_raw(df.select("value", "file_path")))
        return {
            r.event_type: r.n
            for r in norm.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }

    from pyspark.sql import functions as SF

    batch_ded = (
        spark.read.text(f"{d}/*.log")
        .select("value", SF.input_file_name().alias("file_path"))
        .filter(SF.get_json_object("value", "$.ts").isNotNull())
        .dropDuplicates(["value"])
    )
    assert _counts(out) == _counts(batch_ded)


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart with the same checkpoint must be exactly-once: files
    processed before the stop are not re-emitted after restart, late
    files are picked up, and the final sink equals the batch pipeline
    over the full directory — the recovery contract a production
    ingest job depends on."""
    import os
    import shutil

    from cometbft_log_etl_spark.pipeline import etl_events
    from cometbft_log_etl_spark.streaming.ingest import stream_normalized
    from tests.fixtures import build_scenario, write_logs

    src = str(tmp_path / "all")
    write_logs(build_scenario(heights=5), src)
    files = sorted(os.listdir(src))
    assert len(files) >= 2

    live = str(tmp_path / "live")
    os.makedirs(live)
    for fn in files[:-1]:
        shutil.copy(os.path.join(src, fn), os.path.join(live, fn))

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            stream_normalized(spark, live)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # must FINISH: a timeout would leave this query alive while the
        # restart below opens the same checkpoint
        assert q.awaitTermination(180)

    run_once()  # first run: all but the last file
    shutil.copy(os.path.join(src, files[-1]), os.path.join(live, files[-1]))
    run_once()  # restart from checkpoint: only the new file processes

    got = spark.read.parquet(sink).drop("file_path")
    want = etl_events(spark, live, strict=False).drop(
        "file_path", "node_id", "validator_address"
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_streaming_rate_anomalies_match_batch(spark, sf_dir, tmp_path):
    """q101 parity: the hourly rollup as a watermarked windowed stream,
    the shared anomalies_from_hourly pass applied to the accumulated
    rollup — output must equal the batch query on the same events."""
    from cometbft_log_etl_spark.queries import queries
    from cometbft_log_etl_spark.queries.events_analytics import anomalies_from_hourly
    from cometbft_log_etl_spark.streaming.analytics import streaming_hourly_rates
    from cometbft_log_etl_spark.tables import load

    ev = load(spark, sf_dir, "events").select("event_type", "ts")
    src = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(src)  # micros timestamps for readStream

    stream = spark.readStream.schema(ev.schema).parquet(src)
    hourly = streaming_hourly_rates(stream, time_col="ts")
    q = (
        hourly.writeStream.format("memory")
        .queryName("t_hourly_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    # Re-materialize the rollup (types × hours rows — trivially small):
    # Spark's self-join attribute dedup chokes on a MemorySink view used
    # on both sides of the stats join (Conflicting attributes), a
    # memory-sink-only artifact the parquet rollup a production job
    # reads never hits.
    rollup_rows = spark.table("t_hourly_rates")
    rollup = spark.createDataFrame(rollup_rows.collect(), rollup_rows.schema)
    got = {tuple(r) for r in anomalies_from_hourly(rollup).collect()}
    want = {tuple(r) for r in queries()["q58_rate_anomalies"](spark, sf_dir).collect()}
    assert want, "batch q101 found no anomalies at the test sf — parity test is vacuous"
    assert got == want


def test_stream_rejects_compressed_twin_layout(spark, tmp_path):
    """Streaming reader refuses a directory where a stem exists as both
    x.log and x.log.gz — the same double-ingest guard as the batch
    path, checked at stream construction."""
    import gzip
    import os

    from cometbft_log_etl_spark.streaming.ingest import stream_log_lines

    d = str(tmp_path / "stream_twins")
    os.makedirs(d)
    line = b'{"level":"info","ts":"2024-01-01T00:00:00Z","_msg":"x"}\n'
    with open(os.path.join(d, "node0.log"), "wb") as fh:
        fh.write(line)
    with gzip.open(os.path.join(d, "node0.log.gz"), "wb") as fh:
        fh.write(line)
    with pytest.raises(ValueError, match="both plain and gzip"):
        stream_log_lines(spark, d)
