"""P2: block-parts — confirmed block-part gossip pairs with latency.

Reference: ossplugins/block-parts/processor.go:43-90. Key =
BlockPartKey{Height, Round, Index, Sender, Receiver} (keyFromEvent,
processor.go:75-82); the event-level height/round of the BlockPart
message (our msg_height/msg_round) plus the part index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._matching import confirm_pairs
from .registry import register_plugin

KEY = ["height", "round", "part_index", "sender_peer_id", "recipient_peer_id"]


@register_plugin("block-parts")
def block_parts(events: DataFrame) -> dict[str, DataFrame]:
    parts = events.filter(
        F.col("event_type").isin("send_block_part", "receive_packet_block_part")
    ).select(
        "event_type",
        "timestamp",
        F.col("msg_height").alias("height"),
        F.col("msg_round").alias("round"),
        "part_index",
        "part_bytes",
        F.when(F.col("event_type") == "send_block_part", F.col("node_id"))
        .otherwise(F.col("source_peer_id"))
        .alias("sender_peer_id"),
        F.when(F.col("event_type") == "send_block_part", F.col("recipient_peer_id"))
        .otherwise(F.col("node_id"))
        .alias("recipient_peer_id"),
    )
    sends = parts.filter(F.col("event_type") == "send_block_part")
    recvs = parts.filter(F.col("event_type") == "receive_packet_block_part")
    confirmed = confirm_pairs(sends, recvs, KEY, extra_send_cols=[F.col("part_bytes")])
    return {
        "block_part_latencies": confirmed.select(
            "status",
            "height",
            "round",
            "part_index",
            "part_bytes",
            "sender_peer_id",
            "recipient_peer_id",
            "sent_time",
            "received_time",
            F.col("received_time").alias("confirmed_time"),
            "latency_ms",
        )
    }
