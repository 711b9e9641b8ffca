"""P3: p2p-messages — the generalized 8-kind send/receive matcher.

Reference: ossplugins/p2p-messages/processor.go:39-368. Each message
kind has its own composite key (processor.go:343-366):

  vote           (height, round, vote_type, validator_index, sender, receiver)
  block_part     (height, round, part_hash, sender, receiver)
  proposal       (height, round, block_hash, sender, receiver)
  proposal_pol   (height, pol_round, sender, receiver)
  new_round_step (height, round, step, sender, receiver)
  has_vote       (height, round, vote_type, vote_index, sender, receiver)
  vote_set_maj23 (height, round, vote_type, block_hash, sender, receiver)
  vote_set_bits  (height, round, vote_type, block_hash, sender, receiver)

All kinds share one plan here: a union with a `msg_kind` discriminator
and a struct-valued `match_key`, FIFO-ranked per (kind, key) side and
inner-joined — one shuffle for all eight kinds instead of eight joins.

Semantics note: the reference keeps ONE live map entry per key
(last-writer-wins; duplicates after confirmation can re-confirm,
processor.go:77-92). With unique keys — the overwhelmingly common case —
that coincides with FIFO pairing, which is what batch expresses cleanly;
the divergence under duplicate sends is documented rather than mirrored.
The reference's part_hash is core.Part.Hash() (merkle leaf); any
collision-free digest of the part bytes serves key equality, so we use
sha2(part_bytes, 256).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._matching import confirm_pairs
from .registry import register_plugin

P2P_KINDS = (
    "vote",
    "block_part",
    "proposal",
    "proposal_pol",
    "new_round_step",
    "has_vote",
    "vote_set_maj23",
    "vote_set_bits",
)


def p2p_confirmed_df(events: DataFrame) -> DataFrame:
    """Confirmed EventP2p* rows for all eight matched kinds."""
    is_send = ~F.col("event_type").startswith("receive_packet_")
    sides = events.filter(F.col("msg_kind").isin(*P2P_KINDS)).select(
        "event_type",
        "timestamp",
        "msg_kind",
        "msg_height",
        "msg_round",
        "vote_type",
        "validator_index",
        "vote_index",
        "part_index",
        "msg_step",
        "bid_hash",
        "pol_round",
        F.col("validator_address").alias("node_validator_address"),
        F.when(is_send, F.col("node_id")).otherwise(F.col("source_peer_id")).alias("sender_peer_id"),
        F.when(is_send, F.col("recipient_peer_id")).otherwise(F.col("node_id")).alias("recipient_peer_id"),
        F.when(is_send, F.lit("send")).otherwise(F.lit("receive")).alias("side"),
        F.when(is_send, F.lit(None).cast("string")).otherwise(F.col("node_id")).alias("receiver_node_id"),
        # kind-specific composite key, null-safe as a canonical string
        F.concat_ws(
            ":",
            F.col("msg_kind"),
            F.col("msg_height"),
            F.when(F.col("msg_kind") == "proposal_pol", F.col("pol_round")).otherwise(F.col("msg_round")),
            F.when(F.col("msg_kind").isin("vote", "has_vote", "vote_set_maj23", "vote_set_bits"), F.col("vote_type")),
            F.when(F.col("msg_kind") == "vote", F.col("validator_index"))
            .when(F.col("msg_kind") == "has_vote", F.col("vote_index")),
            F.when(F.col("msg_kind") == "block_part", F.sha2(F.col("part_bytes").cast("binary"), 256))
            .when(F.col("msg_kind").isin("proposal", "vote_set_maj23", "vote_set_bits"), F.col("bid_hash")),
            F.when(F.col("msg_kind") == "new_round_step", F.col("msg_step")),
        ).alias("p2p_key"),
    )

    payload = [
        "msg_kind",
        "msg_height",
        "msg_round",
        "vote_type",
        "validator_index",
        "vote_index",
        "part_index",
        "msg_step",
        "bid_hash",
        "pol_round",
    ]
    key = ["p2p_key", "sender_peer_id", "recipient_peer_id"]
    sends = sides.filter(F.col("side") == "send")
    recvs = sides.filter(F.col("side") == "receive").withColumnsRenamed(
        {c: f"_r_{c}" for c in payload + ["node_validator_address", "receiver_node_id"]}
    )
    confirmed = confirm_pairs(
        sends,
        recvs.select(*key, "timestamp", "_r_receiver_node_id", "_r_node_validator_address"),
        key,
        extra_send_cols=[F.col(c) for c in payload],
        extra_recv_cols=[F.col("_r_receiver_node_id"), F.col("_r_node_validator_address")],
    )
    # The emitted EventP2p* carries the RECEIVE side's BaseEvent
    # (timestamp/node/validator) + P2pInfo (processor.go:100-105).
    return confirmed.select(
        F.concat(F.lit("p2p_"), F.col("msg_kind")).alias("event_type"),
        F.col("received_time").alias("timestamp"),
        F.col("_r_receiver_node_id").alias("node_id"),
        F.col("_r_node_validator_address").alias("validator_address"),
        *payload,
        "sender_peer_id",
        "recipient_peer_id",
        "status",
        "sent_time",
        "received_time",
        "latency_ms",
    )


@register_plugin("p2p-messages")
def p2p_messages(events: DataFrame) -> dict[str, DataFrame]:
    return {"p2p_messages": p2p_confirmed_df(events)}
