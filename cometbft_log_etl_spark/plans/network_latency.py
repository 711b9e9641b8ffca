"""P7: network-latency — raw-bytes FIFO matching + latency histograms.

Reference: ossplugins/network-latency/processor.go (856 LoC). Five
result tables:

- network_latency_measurements: per (normalized node pair, message_type)
  histogram (calculateStatistics :499-556);
- network_latency_nodepair_summary: per pair — an "overall" histogram
  across message types plus the per-type map (:559-643);
- network_latency_node_stats: per node — sends/receives, connected
  peers, unmatched counts (:399-447,648-681);
- network_latency_global_stats: one row of unmatched totals (:719-732);
- network_latency_duplicates_debug: per-key traffic where send_count>1
  or receive_count>1 (:800-818).

Matching (the FIFO multi-match join, SURVEY §2.6 P7a):
- tier 1: composite key (sender, receiver, sha256(raw_bytes))
  (getCompositeKey :697-707) — FIFO pairing = row_number per key on
  each side + equi-join on (key, seq). Out-of-order arrival needs no
  special case in batch; latency is signed (recv − send) just as the
  reference's out-of-order path produces (:163-166).
- tier 2: sends whose peer is unknown (TrySend → empty recipient id,
  convereter.go:523-530) are keyed by raw hash only; receives left
  unmatched by tier 1 retry against them (rawHashFallbackMatch
  :295-328).
- leftovers on either side are the unmatched counts (in batch: an
  anti-join by construction — rows absent from the matched set).

Self-receives (node == source peer) are dropped (:222-225); self-pairs
never record latency (:331-334). recordLatency's timestamp argument is
the RECEIVE time on every path, so first_seen/last_seen are receive-time
bounds.

Scale notes: the matching shuffles once per tier on the composite key
(dominated by sha2 values — uniformly distributed, no skew); histograms
shuffle once on (pair, message_type). The pair-level rollup REUSES the
matched rows rather than re-scanning events, and every per-node /
global aggregate is a partial-agg-friendly groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._matching import fifo_rank
from ._stats import go_latency_histogram
from .registry import register_plugin

# The 9 send / 9 receive kinds handled (Process :82-119); new_valid_block
# is NOT among them (the reference matches it only in p2p-messages).
MATCHED_KINDS = (
    "vote",
    "proposal",
    "block_part",
    "new_round_step",
    "has_vote",
    "vote_set_maj23",
    "vote_set_bits",
    "proposal_pol",
    "has_proposal_block_part",
)


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    base = events.filter(F.col("msg_kind").isin(*MATCHED_KINDS)).withColumn(
        "raw_hash", F.sha2(F.col("msg_bytes"), 256)
    )
    is_send = ~F.col("event_type").startswith("receive_packet_")
    sends = base.filter(is_send).select(
        F.col("node_id").alias("send_node"),
        F.col("validator_address").alias("send_validator"),
        F.coalesce(F.col("recipient_peer_id"), F.lit("")).alias("receiver_peer"),
        F.col("msg_kind").alias("message_type"),
        "raw_hash",
        F.col("timestamp").alias("sent_time"),
    )
    recvs = (
        base.filter(~is_send)
        .filter(
            F.col("source_peer_id").isNotNull()
            & (F.col("source_peer_id") != "")
            & (F.col("source_peer_id") != F.col("node_id"))  # self-receive drop :222-225
        )
        .select(
            F.col("node_id").alias("recv_node"),
            F.col("validator_address").alias("recv_validator"),
            F.col("source_peer_id").alias("sender_peer"),
            F.col("msg_kind").alias("message_type"),
            "raw_hash",
            F.col("timestamp").alias("received_time"),
        )
    )
    return sends, recvs


def _match(sends: DataFrame, recvs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-tier FIFO match. Returns (matched, unmatched_sends, unmatched_recvs)."""
    keyed_sends = sends.filter(F.col("receiver_peer") != "")
    raw_sends = sends.filter(F.col("receiver_peer") == "")

    k1 = ["send_node", "receiver_peer", "raw_hash"]
    s1 = fifo_rank(keyed_sends, ["send_node", "receiver_peer", "raw_hash"], "sent_time")
    r1 = fifo_rank(
        recvs.withColumnsRenamed({"sender_peer": "send_node", "recv_node": "receiver_peer"}),
        k1,
        "received_time",
    )
    m1 = s1.join(r1, [*k1, "match_seq"]).select(
        F.col("send_node"),
        "send_validator",
        F.col("receiver_peer").alias("recv_node"),
        "recv_validator",
        s1["message_type"].alias("message_type"),
        "raw_hash",
        "sent_time",
        "received_time",
        F.lit(1).alias("tier"),
    )

    un_s1 = s1.join(r1.select(*k1, "match_seq"), [*k1, "match_seq"], "left_anti")
    un_r1 = r1.join(s1.select(*k1, "match_seq"), [*k1, "match_seq"], "left_anti")

    # tier 2: raw-hash-only fallback (TrySend sends vs tier-1 leftovers)
    s2 = fifo_rank(raw_sends, ["raw_hash"], "sent_time").withColumnRenamed("match_seq", "seq2")
    r2 = fifo_rank(
        un_r1.drop("match_seq"), ["raw_hash"], "received_time"
    ).withColumnRenamed("match_seq", "seq2")
    m2 = s2.join(r2, ["raw_hash", "seq2"]).select(
        s2["send_node"].alias("send_node"),
        "send_validator",
        r2["receiver_peer"].alias("recv_node"),
        "recv_validator",
        s2["message_type"].alias("message_type"),
        "raw_hash",
        "sent_time",
        "received_time",
        F.lit(2).alias("tier"),
    )

    un_s2 = s2.join(r2.select("raw_hash", "seq2"), ["raw_hash", "seq2"], "left_anti")
    un_r2 = r2.join(s2.select("raw_hash", "seq2"), ["raw_hash", "seq2"], "left_anti")

    matched = m1.unionByName(m2).withColumn(
        "latency_ms",
        ((F.unix_micros("received_time") - F.unix_micros("sent_time")) / 1000).cast("long"),
    )
    # keyed sends get no second tier; receives fall through to tier 2,
    # so only tier-2 leftovers are truly unmatched receives.
    unmatched_sends = un_s1.select("send_node").unionByName(un_s2.select("send_node"))
    unmatched_recvs = un_r2.select(F.col("receiver_peer").alias("recv_node"))
    return matched, unmatched_sends, unmatched_recvs


def _with_pair(matched: DataFrame) -> DataFrame:
    """Normalized node pair (lexicographic, :385-390); nodeA = receiver,
    nodeB = sender (recordLatency call sites :173,291,325)."""
    a_first = F.col("recv_node") <= F.col("send_node")
    return (
        matched.filter(F.col("recv_node") != F.col("send_node"))
        .withColumn("node1_id", F.when(a_first, F.col("recv_node")).otherwise(F.col("send_node")))
        .withColumn("node2_id", F.when(a_first, F.col("send_node")).otherwise(F.col("recv_node")))
        .withColumn(
            "node1_validator",
            F.when(a_first, F.col("recv_validator")).otherwise(F.col("send_validator")),
        )
        .withColumn(
            "node2_validator",
            F.when(a_first, F.col("send_validator")).otherwise(F.col("recv_validator")),
        )
        .withColumn("node_pair_key", F.concat_ws(":", "node1_id", "node2_id"))
    )


@register_plugin("network-latency")
def network_latency(events: DataFrame) -> dict[str, DataFrame]:
    from ..session import persist_tracked

    sends, recvs = _sides(events)
    matched, un_sends, un_recvs = _match(sends, recvs)
    # The two-tier FIFO match (two window ranks + equi-join + anti-joins
    # per tier) feeds all five result tables; without persistence every
    # table's action replays it. The plugin-level analog of the O6 shared
    # scan — measured 2.6× on the full plugin at 645k events. Unmatched
    # sides are persisted too: they re-derive the ranked windows.
    # persist_tracked so harness releases go through the CacheManager
    # (a raw-RDD unpersist would leave a dead cache entry that makes
    # every LATER run of the same plugin recompute per consumer).
    matched = persist_tracked(matched)
    un_sends = persist_tracked(un_sends)
    un_recvs = persist_tracked(un_recvs)
    # NOTE: persisting `paired`/`measurements` as well was measured SLOWER
    # (the materialization barrier defeats column pruning into the cached
    # matched relation); only the match core is worth pinning.
    paired = _with_pair(matched).withColumn("timestamp", F.col("received_time"))

    meta = ["node_pair_key", "node1_id", "node2_id", "node1_validator", "node2_validator"]
    measurements = go_latency_histogram(
        paired,
        group_cols=["node_pair_key", "message_type"],
        extra_first_cols=["node1_id", "node2_id", "node1_validator", "node2_validator"],
    ).select(
        *meta, "message_type", "count", "min_latency_ms", "max_latency_ms",
        "mean_latency_ms", "median_latency_ms", "p95_latency_ms", "p99_latency_ms",
        "below_p50_count", "p50_to_p95_count", "p95_to_p99_count", "above_p99_count",
        "first_seen", "last_seen",
    )

    # Pair rollup: the same histogram over ALL the pair's latencies
    # (message_type="overall", createOverallStatsForPair :598-645) plus
    # the per-type histogram map.
    overall = go_latency_histogram(
        paired,
        group_cols=["node_pair_key"],
        extra_first_cols=["node1_id", "node2_id", "node1_validator", "node2_validator"],
    ).withColumn("message_type", F.lit("overall"))
    per_type_map = measurements.groupBy("node_pair_key").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("message_type"),
                    F.struct(
                        "count", "min_latency_ms", "max_latency_ms", "mean_latency_ms",
                        "median_latency_ms", "p95_latency_ms", "p99_latency_ms",
                        "below_p50_count", "p50_to_p95_count", "p95_to_p99_count",
                        "above_p99_count", "first_seen", "last_seen",
                    ),
                )
            )
        ).alias("message_types")
    )
    summary = overall.join(per_type_map, "node_pair_key").select(
        *meta, "message_types", "count", "min_latency_ms", "max_latency_ms",
        "mean_latency_ms", "median_latency_ms", "p95_latency_ms", "p99_latency_ms",
        "below_p50_count", "p50_to_p95_count", "p95_to_p99_count", "above_p99_count",
        "first_seen", "last_seen",
    )

    # Per-node stats (updateNodeStats :399-425): every raw-eligible send/
    # receive counts; connected peers collect the raw peer id — including
    # the empty TrySend peer, mirroring addPeerToNode's "" entry (:427-437).
    send_stats = sends.groupBy(F.col("send_node").alias("node_id")).agg(
        F.first("send_validator").alias("validator_address"),
        F.count(F.lit(1)).cast("int").alias("total_sends"),
        F.collect_set("receiver_peer").alias("_peers_s"),
    )
    recv_stats = recvs.groupBy(F.col("recv_node").alias("node_id")).agg(
        F.first("recv_validator").alias("validator_address"),
        F.count(F.lit(1)).cast("int").alias("total_receives"),
        F.collect_set("sender_peer").alias("_peers_r"),
    )
    un_send_stats = un_sends.groupBy(F.col("send_node").alias("node_id")).agg(
        F.count(F.lit(1)).cast("int").alias("unmatched_sends")
    )
    un_recv_stats = un_recvs.groupBy(F.col("recv_node").alias("node_id")).agg(
        F.count(F.lit(1)).cast("int").alias("unmatched_receives")
    )
    node_stats = (
        send_stats.withColumnRenamed("validator_address", "_va_s")
        .join(recv_stats.withColumnRenamed("validator_address", "_va_r"), "node_id", "full")
        .join(un_send_stats, "node_id", "left")
        .join(un_recv_stats, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("_va_s", "_va_r").alias("validator_address"),
            F.coalesce("total_sends", F.lit(0)).alias("total_sends"),
            F.coalesce("total_receives", F.lit(0)).alias("total_receives"),
            F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.coalesce("_peers_s", F.array().cast("array<string>")),
                        F.coalesce("_peers_r", F.array().cast("array<string>")),
                    )
                )
            ).alias("connected_peers"),
            F.coalesce("unmatched_sends", F.lit(0)).alias("unmatched_sends"),
            F.coalesce("unmatched_receives", F.lit(0)).alias("unmatched_receives"),
        )
        .withColumn("peer_count", F.size("connected_peers"))
    )

    # Global unmatched stats (createUnmatchedStats :719-732).
    totals = sends.agg(F.count(F.lit(1)).alias("_s")).crossJoin(
        recvs.agg(F.count(F.lit(1)).alias("_r"))
    )
    global_stats = (
        un_sends.agg(F.count(F.lit(1)).cast("int").alias("total_unmatched_sends"))
        .crossJoin(un_recvs.agg(F.count(F.lit(1)).cast("int").alias("total_unmatched_receives")))
        .crossJoin(totals)
        .withColumn("total_messages", (F.col("_s") + F.col("_r")).cast("int"))
        .drop("_s", "_r")
        .filter((F.col("total_unmatched_sends") > 0) | (F.col("total_unmatched_receives") > 0))
    )

    # Duplicate-traffic diagnostics (:800-818): per composite key (and
    # per raw hash for peer-less sends), counts with send>1 or recv>1.
    s_key = sends.select(
        F.col("send_node").alias("sender"),
        F.col("receiver_peer").alias("receiver"),
        "message_type",
        "raw_hash",
        F.col("sent_time").alias("ts"),
        F.lit(1).alias("is_send"),
    )
    r_key = recvs.select(
        F.col("sender_peer").alias("sender"),
        F.col("recv_node").alias("receiver"),
        "message_type",
        "raw_hash",
        F.col("received_time").alias("ts"),
        F.lit(0).alias("is_send"),
    )
    match_counts = paired.groupBy(
        F.col("send_node").alias("sender"),
        F.col("recv_node").alias("receiver"),
        "raw_hash",
    ).agg(F.count(F.lit(1)).cast("int").alias("match_count"))
    duplicates = (
        s_key.unionByName(r_key)
        .groupBy("sender", "receiver", "raw_hash")
        .agg(
            F.first("message_type").alias("message_type"),
            F.count_if(F.col("is_send") == 1).cast("int").alias("send_count"),
            F.count_if(F.col("is_send") == 0).cast("int").alias("receive_count"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .filter((F.col("send_count") > 1) | (F.col("receive_count") > 1))
        .join(match_counts, ["sender", "receiver", "raw_hash"], "left")
        .withColumn("match_count", F.coalesce("match_count", F.lit(0)))
    )

    return {
        "network_latency_measurements": measurements,
        "network_latency_nodepair_summary": summary,
        "network_latency_node_stats": node_stats,
        "network_latency_global_stats": global_stats,
        "network_latency_duplicates_debug": duplicates,
    }
