"""C1-C12: raw parsed lines → one wide normalized `events` DataFrame.

Reference: internal/converter/convereter.go:102-905. Each Go converter
becomes a columnar projection over the union-parsed rows; the
heterogeneous normalized stream is ONE wide DataFrame with nullable
type-specific columns (SURVEY.md §1.3) — filter/join friendly, and
parquet stores the nulls for free.

Drop semantics reproduced: unconvertible raw kinds emit nothing
(§2.3 drop-list), "Entering propose step" targets are skipped
(convereter.go:107-110), malformed payloads/triples/timestamps drop the
row (log-and-skip, app.go:87-91).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import extract_peer_id, go_duration_ms, parse_rfc3339, parse_round_info
from ..schemas.raws import target_step_expr
from .decode import (
    CONSENSUS_CHANNELS,
    channel_name_expr,
    decode_consensus_udf,
    valid_for_channel_expr,
)

# C4 — stringified Proposal regex (lib/parse.go:39-108).
_PROPOSAL_RE = (
    r"^Proposal\{(\d+)/(\d+) \(([0-9A-F]+):(\d+):([0-9A-F]+), (-?\d+)\) "
    r"([0-9A-F]+) @ (\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+Z)\}$"
)


def _base(df: DataFrame, event_type: str) -> DataFrame:
    return df.withColumn("event_type", F.lit(event_type)).withColumn(
        "timestamp", parse_rfc3339("j.ts")
    ).filter(F.col("timestamp").isNotNull())


def _new_round(raw: DataFrame) -> DataFrame:
    """C1 (convereter.go:135-154): parse `previous` h/r/step triple."""
    ph, pr, ps = parse_round_info("j.previous")
    return (
        _base(raw.filter(F.col("kind") == "entering_new_round"), "entering_new_round")
        .withColumn("prev_height", ph)
        .withColumn("prev_round", pr)
        .withColumn("prev_step", ps)
        .filter(
            F.col("prev_height").isNotNull()
            & F.col("prev_round").isNotNull()
            & F.col("prev_step").isNotNull()
        )
        .select(
            "file_path",
            "event_type",
            "timestamp",
            F.col("j.height").alias("height"),
            F.col("j.round").alias("round"),
            F.col("j.proposer").alias("proposer"),
            "prev_height",
            "prev_round",
            "prev_step",
        )
    )


def _entering_steps(raw: DataFrame) -> DataFrame:
    """C2/S6 (convereter.go:156-230, parsers.go:94-128): step entries.

    The propose target is skipped (handled via ProposeStep events); the
    first-match step vocabulary collapse (wait→base) is reproduced in
    target_step_expr.
    """
    ch, cr, cs = parse_round_info("j.current")
    df = (
        raw.filter(F.col("kind") == "entering_step")
        .withColumn("target_step", target_step_expr(F.col("tag")))
        .filter(F.col("target_step").isNotNull() & (F.col("target_step") != "propose"))
        .withColumn("curr_height", ch)
        .withColumn("curr_round", cr)
        .withColumn("curr_step", cs)
        .filter(
            F.col("curr_height").isNotNull()
            & F.col("curr_round").isNotNull()
            & F.col("curr_step").isNotNull()
        )
        .withColumn(
            "event_type",
            F.concat(F.lit("entering_"), F.col("target_step"), F.lit("_step")),
        )
        .withColumn("timestamp", parse_rfc3339("j.ts"))
        .filter(F.col("timestamp").isNotNull())
    )
    return df.select(
        "file_path",
        "event_type",
        "timestamp",
        F.col("curr_height").alias("height"),
        F.col("curr_round").alias("round"),
        "curr_step",
    )


def _propose_steps(raw: DataFrame) -> DataFrame:
    """C3 (convereter.go:232-264): our-turn / not-our-turn propose step."""
    df = raw.filter(F.col("kind").isin("propose_step_our_turn", "propose_step_not_our_turn"))
    return _base(df, "propose_step").select(
        "file_path",
        "event_type",
        "timestamp",
        F.col("j.height").alias("height"),
        F.col("j.round").alias("round"),
        F.col("j.proposer").alias("proposer"),
        (F.col("kind") == "propose_step_our_turn").alias("is_our_turn"),
    )


def _received_proposals(raw: DataFrame) -> DataFrame:
    """C4 (convereter.go:266-281 + lib/parse.go:39-108): regex-parse the
    stringified Proposal."""
    p = F.col("j.proposal")
    g = lambda i: F.regexp_extract(p, _PROPOSAL_RE, i)  # noqa: E731
    df = (
        _base(raw.filter(F.col("kind") == "received_proposal"), "received_proposal")
        .withColumn("height", g(1).cast("long"))
        .filter(F.col("height").isNotNull() & (g(1) != ""))
        .select(
            "file_path",
            "event_type",
            "timestamp",
            "height",
            g(2).cast("long").alias("round"),
            F.col("j.proposer").alias("proposer"),
            g(3).alias("bid_hash"),
            g(4).cast("long").alias("ps_total"),
            g(5).alias("ps_hash"),
            g(6).cast("long").alias("pol_round"),
            g(7).alias("signature"),
            parse_rfc3339(g(8)).alias("proposal_ts"),
        )
    )
    return df


def _complete_proposal_blocks(raw: DataFrame) -> DataFrame:
    """C5 (convereter.go:283-294)."""
    df = raw.filter(F.col("kind") == "received_complete_proposal_block")
    return _base(df, "received_complete_proposal_block").select(
        "file_path",
        "event_type",
        "timestamp",
        F.col("j.hash").alias("block_hash"),
        F.col("j.height").alias("height"),
    )


def _committed_blocks(raw: DataFrame) -> DataFrame:
    """C9 shell (convereter.go:875-890): carries the raw Block text; the
    recursive-descent Block parser lives in functions/blocktext.py and is
    applied on demand (it is the second imperative kernel)."""
    df = raw.filter(F.col("kind") == "committed_block")
    return _base(df, "committed_block").select(
        "file_path",
        "event_type",
        "timestamp",
        F.col("j.height").alias("height"),
        F.col("j.block").alias("block_raw"),
    )


def _scheduled_timeouts(raw: DataFrame) -> DataFrame:
    """Timeout events (converted verbatim; duration parsed to ms here so
    downstream plugins stay columnar — timeout-analysis/processor.go:209-214)."""
    df = raw.filter(F.col("kind") == "scheduled_timeout")
    return _base(df, "scheduled_timeout").select(
        "file_path",
        "event_type",
        "timestamp",
        F.col("j.height").alias("height"),
        F.col("j.round").alias("round"),
        F.col("j.step").alias("step"),
        F.col("j.dur").alias("dur"),
        go_duration_ms(F.col("j.dur")).alias("duration_ms"),
    )


def _p2p_events(raw: DataFrame) -> DataFrame:
    """C6/C7/C8 + D1/D2/D3 (convereter.go:296-873).

    Send/TrySend carry hex payloads, ReceivedBytes carries base64; all
    route through the consensus protobuf decode kernel, then the
    channel/message validation table. Only the four consensus channels
    can yield events (every other channel is rejected by
    isValidMessageForChannel, convereter.go:19-58).
    """
    p2p = raw.filter(F.col("kind").isin("send", "try_send", "received_bytes"))
    sides = p2p.select(
        "file_path",
        "kind",
        parse_rfc3339("j.ts").alias("timestamp"),
        F.when(F.col("kind") == "received_bytes", F.col("j.chID"))
        .otherwise(F.col("j.channel"))
        .alias("channel"),
        F.when(F.col("kind") == "received_bytes", F.unbase64(F.col("j.msgBytes")))
        .otherwise(F.unhex(F.col("j.msgBytes")))
        .alias("msg_bytes"),
        F.col("j.peer").alias("peer"),
        F.col("j.conn").alias("conn"),
    ).filter(F.col("timestamp").isNotNull() & F.col("channel").isin(*CONSENSUS_CHANNELS))

    decoded = sides.withColumn("d", decode_consensus_udf("msg_bytes")).filter(
        F.col("d.msg_kind").isNotNull()
    )
    decoded = decoded.filter(valid_for_channel_expr(F.col("d.msg_kind"), F.col("channel")))

    is_recv = F.col("kind") == "received_bytes"
    is_try = F.col("kind") == "try_send"
    return decoded.select(
        "file_path",
        F.concat(
            F.when(is_recv, "receive_packet_").otherwise("send_"), F.col("d.msg_kind")
        ).alias("event_type"),
        "timestamp",
        "channel",
        channel_name_expr("channel").alias("channel_name"),
        # RecipientInfo: Send uses peer (+id); TrySend has no peer id —
        # conn string stands in, id empty (convereter.go:523-530).
        F.when(is_recv, F.lit(None).cast("string"))
        .when(is_try, F.col("conn"))
        .otherwise(F.col("peer"))
        .alias("recipient_peer"),
        F.when(is_recv, F.lit(None).cast("string"))
        .when(is_try, F.lit(""))
        .otherwise(extract_peer_id("peer"))
        .alias("recipient_peer_id"),
        # SourceInfo (ReceivedBytes only, convereter.go:660-666)
        F.when(is_recv, F.col("peer")).alias("source_peer"),
        F.when(is_recv, extract_peer_id("peer")).alias("source_peer_id"),
        "msg_bytes",
        F.col("d.msg_kind").alias("msg_kind"),
        F.col("d.msg_height").alias("msg_height"),
        F.col("d.msg_round").alias("msg_round"),
        F.col("d.msg_step").alias("msg_step"),
        F.col("d.seconds_since_start_time").alias("seconds_since_start_time"),
        F.col("d.last_commit_round").alias("last_commit_round"),
        # TrySend forces IsCommit=false for NewValidBlock (convereter.go:554)
        F.when(is_try & (F.col("d.msg_kind") == "new_valid_block"), F.lit(False))
        .otherwise(F.col("d.is_commit"))
        .alias("is_commit"),
        F.col("d.bid_hash").alias("bid_hash"),
        F.col("d.ps_total").alias("ps_total"),
        F.col("d.ps_hash").alias("ps_hash"),
        F.col("d.pol_round").alias("pol_round"),
        F.col("d.part_index").alias("part_index"),
        F.col("d.part_bytes").alias("part_bytes"),
        F.col("d.vote_type").alias("vote_type"),
        F.col("d.validator_index").alias("validator_index"),
        F.col("d.validator_address_fp").alias("validator_address_fp"),
        F.col("d.msg_ts").alias("msg_ts"),
        F.col("d.signature").alias("signature"),
        F.col("d.extension").alias("extension"),
        F.col("d.vote_index").alias("vote_index"),
        F.col("d.bits").alias("bits"),
        F.col("d.elems").alias("elems"),
    )


_NONP2P_KINDS = (
    "entering_new_round",
    "entering_step",
    "propose_step_our_turn",
    "propose_step_not_our_turn",
    "received_proposal",
    "received_complete_proposal_block",
    "committed_block",
    "scheduled_timeout",
)


def _consensus_events(raw: DataFrame) -> DataFrame:
    """C1-C5, C9 shell, timeouts — all seven non-P2P families in ONE
    columnar pass.

    Semantically identical to unioning the seven per-family converters
    above (they remain the readable per-family reference and are
    asserted equivalent in tests/test_etl.py), but planned as a single
    projection+filter over raw: one scan instead of seven, one
    whole-stage-codegen pipeline instead of seven, no 7-way union
    multiplying partition counts. At 100 TB — where raw may not fit any
    cache — this is the difference between reading the parse output once
    and reading it seven times. CASE branches evaluate lazily per row,
    so e.g. only received_proposal rows pay the 8-group proposal regex.
    """
    k = F.col("kind")
    is_nr = k == "entering_new_round"
    is_es = k == "entering_step"
    is_ps = k.isin("propose_step_our_turn", "propose_step_not_our_turn")
    is_rp = k == "received_proposal"
    is_cp = k == "received_complete_proposal_block"
    is_cb = k == "committed_block"
    is_st = k == "scheduled_timeout"

    ph, pr, ps = parse_round_info("j.previous")
    ch, cr, cs = parse_round_info("j.current")
    target = target_step_expr(F.col("tag"))
    p = F.col("j.proposal")
    g = lambda i: F.regexp_extract(p, _PROPOSAL_RE, i)  # noqa: E731
    ts = parse_rfc3339("j.ts")

    event_type = (
        F.when(is_nr, F.lit("entering_new_round"))
        .when(is_es, F.concat(F.lit("entering_"), target, F.lit("_step")))
        .when(is_ps, F.lit("propose_step"))
        .when(is_rp, F.lit("received_proposal"))
        .when(is_cp, F.lit("received_complete_proposal_block"))
        .when(is_cb, F.lit("committed_block"))
        .when(is_st, F.lit("scheduled_timeout"))
    )
    # Per-family validity (drop-on-malformed, app.go:87-91): same
    # predicates as the per-family converters' filters.
    valid = ts.isNotNull() & (
        F.when(is_nr, ph.isNotNull() & pr.isNotNull() & ps.isNotNull())
        .when(
            is_es,
            target.isNotNull()
            & (target != "propose")
            & ch.isNotNull()
            & cr.isNotNull()
            & cs.isNotNull(),
        )
        .when(is_rp, (g(1) != "") & g(1).cast("long").isNotNull())
        .otherwise(F.lit(True))
    )
    return (
        raw.filter(k.isin(*_NONP2P_KINDS))
        .filter(valid)
        .select(
            "file_path",
            event_type.alias("event_type"),
            ts.alias("timestamp"),
            F.when(is_es, ch).when(is_rp, g(1).cast("long")).otherwise(F.col("j.height")).alias("height"),
            F.when(is_es, cr)
            .when(is_rp, g(2).cast("long"))
            .when(is_nr | is_ps | is_st, F.col("j.round"))
            .alias("round"),
            F.when(is_nr | is_ps | is_rp, F.col("j.proposer")).alias("proposer"),
            F.when(is_nr, ph).alias("prev_height"),
            F.when(is_nr, pr).alias("prev_round"),
            F.when(is_nr, ps).alias("prev_step"),
            F.when(is_es, cs).alias("curr_step"),
            F.when(is_ps, k == "propose_step_our_turn").alias("is_our_turn"),
            F.when(is_rp, g(3)).alias("bid_hash"),
            F.when(is_rp, g(4).cast("long")).alias("ps_total"),
            F.when(is_rp, g(5)).alias("ps_hash"),
            F.when(is_rp, g(6).cast("long")).alias("pol_round"),
            F.when(is_rp, g(7)).alias("signature"),
            F.when(is_rp, parse_rfc3339(g(8))).alias("proposal_ts"),
            F.when(is_cp, F.col("j.hash")).alias("block_hash"),
            F.when(is_cb, F.col("j.block")).alias("block_raw"),
            F.when(is_st, F.col("j.step")).alias("step"),
            F.when(is_st, F.col("j.dur")).alias("dur"),
            F.when(is_st, go_duration_ms(F.col("j.dur"))).alias("duration_ms"),
        )
    )


def normalize(raw: DataFrame) -> DataFrame:
    """All converters in the wide normalized events DataFrame: the
    single-pass consensus projection unioned with the P2P decode branch
    (which runs the Arrow protobuf kernel only over payload rows)."""
    return _consensus_events(raw).unionByName(_p2p_events(raw), allowMissingColumns=True)


def normalize_unioned(raw: DataFrame) -> DataFrame:
    """The per-family union formulation — kept as the readable reference
    implementation; tests assert it matches `normalize` row-for-row."""
    families = [
        _new_round(raw),
        _entering_steps(raw),
        _propose_steps(raw),
        _received_proposals(raw),
        _complete_proposal_blocks(raw),
        _committed_blocks(raw),
        _scheduled_timeouts(raw),
        _p2p_events(raw),
    ]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), families)
