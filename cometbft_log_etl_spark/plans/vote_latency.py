"""P1: vote-latency — confirmed send→receive vote pairs with latency.

Reference: ossplugins/vote-latency/processor.go:26-73. The Go map keyed
by VoteKey{Height, Round, ValIdx, Sender, Receiver} (keys.VoteKey.Hash,
processor.go:58-65) with receive-after-send confirmation becomes a
FIFO-ranked equi-join on the same five columns; batch symmetry makes the
reference's out-of-order tolerance free.

Key detail: the vote's OWN height/round (e.Vote.Height/Round — our
msg_height/msg_round), not any event-level field. Sender = sending
node's id, Receiver = recipient peer id (send side) / receiving node's
id (receive side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._matching import confirm_pairs
from .registry import register_plugin

KEY = ["height", "round", "validator_index", "sender_peer_id", "recipient_peer_id"]


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    votes = events.filter(F.col("event_type").isin("send_vote", "receive_packet_vote")).select(
        "event_type",
        "timestamp",
        F.col("msg_height").alias("height"),
        F.col("msg_round").alias("round"),
        "validator_index",
        "vote_type",
        F.col("validator_address_fp").alias("vote_validator_address"),
        F.when(F.col("event_type") == "send_vote", F.col("node_id"))
        .otherwise(F.col("source_peer_id"))
        .alias("sender_peer_id"),
        F.when(F.col("event_type") == "send_vote", F.col("recipient_peer_id"))
        .otherwise(F.col("node_id"))
        .alias("recipient_peer_id"),
    )
    return (
        votes.filter(F.col("event_type") == "send_vote"),
        votes.filter(F.col("event_type") == "receive_packet_vote"),
    )


@register_plugin("vote-latency")
def vote_latency(events: DataFrame) -> dict[str, DataFrame]:
    sends, recvs = _sides(events)
    confirmed = confirm_pairs(
        sends, recvs, KEY, extra_send_cols=[F.col("vote_type"), F.col("vote_validator_address")]
    )
    return {
        "vote_latencies": confirmed.select(
            "status",
            "height",
            "round",
            "validator_index",
            "vote_type",
            "vote_validator_address",
            F.col("sender_peer_id").alias("sender_peer_id"),
            F.col("recipient_peer_id").alias("recipient_peer_id"),
            "sent_time",
            "received_time",
            F.col("received_time").alias("confirmed_time"),
            "latency_ms",
        )
    }
