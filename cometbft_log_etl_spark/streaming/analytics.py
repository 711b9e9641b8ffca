"""Streaming restatements of the plugin analytics.

Two shapes the reference's batch plugins map onto (SURVEY.md §2.7
"streaming-only" note):

- windowed_event_counts: watermarked tumbling-window aggregation —
  late lines inside the watermark still count; older ones drop, which
  is the streaming version of the batch pipeline's tolerance for
  out-of-order log lines.
- streaming_vote_matches: the P1 vote matcher as a stream-stream
  equi-join with event-time bounds. The reference's pending-map entries
  that never match and get flushed at end-of-input (network-latency
  finalizeStats) are EXACTLY watermark-expired state here: with
  how="left_outer", a send whose receive hasn't arrived within
  `max_delay` of the watermark emits with NULL receive columns — the
  streaming unmatched-sends table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The batch VoteKey (height, round, validator_index, sender, receiver)
# plus vote_type: the reference's map semantics pair a receive with the
# LATEST prior send, which separates a validator's prevote from its
# precommit implicitly; a time-range join needs the type in the key or
# each receive would match both phases' sends.
VOTE_KEY = ["height", "round", "vote_type", "validator_index", "sender_peer_id", "recipient_peer_id"]


def windowed_event_counts(
    events: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    return (
        events.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def streaming_hourly_rates(
    events: DataFrame, time_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """The corpus-sized pass of the q101 rate-anomaly monitor as a
    watermarked tumbling-window aggregation: per-(event_type, hour)
    counts, late events inside the watermark still counted, state for
    closed hours expired.

    The z-score pass is NOT a streaming operator by design — the
    population stats range over every hour seen so far, which in a
    stream is the accumulated rollup, not a window. Production wires
    this as `foreachBatch`/a downstream job applying
    `queries.events_analytics.anomalies_from_hourly` to the rollup
    table (types × hours rows — trivially small next to the event
    stream this aggregation reduces); the batch query and the stream
    share that pass verbatim, so parity is by construction.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy("event_type", F.window(time_col, "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("h"), "n")
    )


def _vote_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    votes = events.filter(F.col("event_type").isin("send_vote", "receive_packet_vote"))
    sends = votes.filter(F.col("event_type") == "send_vote").select(
        F.col("msg_height").alias("height"),
        F.col("msg_round").alias("round"),
        "vote_type",
        "validator_index",
        F.col("node_id").alias("sender_peer_id"),
        F.col("recipient_peer_id"),
        F.col("timestamp").alias("sent_time"),
    )
    recvs = votes.filter(F.col("event_type") == "receive_packet_vote").select(
        F.col("msg_height").alias("height"),
        F.col("msg_round").alias("round"),
        "vote_type",
        "validator_index",
        F.col("source_peer_id").alias("sender_peer_id"),
        F.col("node_id").alias("recipient_peer_id"),
        F.col("timestamp").alias("received_time"),
    )
    return sends, recvs


def streaming_vote_matches(
    events: DataFrame,
    watermark: str = "30 seconds",
    max_delay: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """P1 as a watermarked stream-stream join.

    A receive matches a send with the same 5-col key arriving within
    [sent_time, sent_time + max_delay]. how="left_outer" additionally
    emits watermark-expired unmatched sends with NULL received_time
    (the reference's end-of-input pending flush).
    """
    sends, recvs = _vote_sides(events)
    s = sends.withWatermark("sent_time", watermark)
    r = recvs.withWatermark("received_time", watermark)
    cond = (
        (s["height"] == r["height"])
        & (s["round"] == r["round"])
        & (s["vote_type"] == r["vote_type"])
        & (s["validator_index"] == r["validator_index"])
        & (s["sender_peer_id"] == r["sender_peer_id"])
        & (s["recipient_peer_id"] == r["recipient_peer_id"])
        & (r["received_time"] >= s["sent_time"])
        & (r["received_time"] <= s["sent_time"] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = s.join(r, cond, how)
    return joined.select(
        s["height"].alias("height"),
        s["round"].alias("round"),
        s["vote_type"].alias("vote_type"),
        s["validator_index"].alias("validator_index"),
        s["sender_peer_id"].alias("sender_peer_id"),
        s["recipient_peer_id"].alias("recipient_peer_id"),
        "sent_time",
        "received_time",
        ((F.unix_micros("received_time") - F.unix_micros("sent_time")) / 1000)
        .cast("long")
        .alias("latency_ms"),
        F.when(F.col("received_time").isNull(), "unmatched").otherwise("confirmed").alias("status"),
    )
