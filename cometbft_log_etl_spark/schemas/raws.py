"""Raw log-line schemas (StructType mirrors of the reference's raw
structs, /root/reference/types/raws.go) and the `_msg` tag dispatch
table (/root/reference/types/msgs.go:3-44, dispatcher.go:16-55).

Spark-first design note: the reference dispatches each NDJSON line to
one of 23 typed ``json.Unmarshal`` calls. Here the whole heterogeneous
stream is parsed with ONE ``from_json`` against a union schema — JSON
field names are disjoint across message families (verified below), so a
single parse covers every convertible type, and Catalyst prunes the
unused struct fields per downstream query. Types the reference parses
but never converts (SURVEY.md §2.3 drop-list) contribute no fields: tag
recognition alone reproduces their parse-then-drop behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


def _l(name: str) -> T.StructField:
    return T.StructField(name, T.LongType(), True)


# Union of every field consumed by a converter (C1-C12) or by per-file
# identity capture (M1). Field names are verbatim JSON keys from
# types/raws.go; all are nullable (lines of other types leave them null).
UNION_SCHEMA = T.StructType(
    [
        _s("_msg"),
        _s("ts"),
        _s("module"),
        _s("level"),
        # Validator (raws.go:7-13) — M1 identity
        _s("addr"),
        _s("pubKey"),
        # P2pNodeID (raws.go:15-21) — M1 identity
        _s("ID"),
        _s("file"),
        # EnteringNewRound / EnteringNewStep (raws.go:23-42)
        _s("current"),
        _s("previous"),
        _s("proposer"),
        _l("height"),
        _l("round"),
        # ReceivedCompleteProposalBlock / LockingBlock (raws.go:233-239)
        _s("hash"),
        # Send / TrySend (raws.go:193-211)
        _l("channel"),
        _s("conn"),
        _s("msgBytes"),
        _s("peer"),
        # ReceivedBytes (raws.go:128-135)
        _l("chID"),
        # ReceivedProposal (raws.go:213-219)
        _s("proposal"),
        # ScheduledTimeout (raws.go:241-249)
        _s("dur"),
        _s("step"),
        # CommittedBlock (raws.go:270-276)
        _s("block"),
    ]
)

# Canonical tag → kind. Keys are LOWERCASED (the reference's dispatch is
# case-insensitive, dispatcher.go:57-66). kind drives the converter;
# "dropped" = parsed by the reference but emits no event (§2.3).
TAG_KINDS: dict[str, str] = {
    "this node is a validator": "validator",
    "p2p node id": "p2p_node_id",
    "entering new round": "entering_new_round",
    "entering propose step": "entering_step",  # converter drops propose target
    "entering prevote step": "entering_step",
    "entering prevote wait step": "entering_step",
    "entering precommit step": "entering_step",
    "entering precommit wait step": "entering_step",
    "entering commit step": "entering_step",
    "propose step; our turn to propose": "propose_step_our_turn",
    "propose step; not our turn to propose": "propose_step_not_our_turn",
    "received proposal": "received_proposal",
    "received complete proposal block": "received_complete_proposal_block",
    "send": "send",
    "trysend": "try_send",
    "received bytes": "received_bytes",
    "committed block": "committed_block",
    "scheduled timeout": "scheduled_timeout",
    # Parsed-but-dropped types (convereter.go:102-133 default branch):
    "signed proposal": "dropped",
    "adding vote": "dropped",
    "added vote to prevote": "dropped",
    "added vote to precommit": "dropped",
    "added vote to last precommits": "dropped",
    "sending vote message": "dropped",
    "receive": "dropped",
    "receive block part": "dropped",
    "read packetmsg": "dropped",
    "precommit step: +2/3 prevoted proposal block; locking": "dropped",
    "finalizing commit of block": "dropped",
    "updating valid block because of pol": "dropped",
}

KNOWN_TAGS = tuple(sorted(TAG_KINDS))

# The six step names parseEnteringNewStep recognizes, in match order
# (parsers.go:94-128): substring match, underscore/space tolerant.
TARGET_STEPS = ("propose", "prevote", "prevote_wait", "precommit", "precommit_wait", "commit")


def canonical_tag_expr(msg_col: str = "_msg") -> Column:
    """lower(_msg), the dispatch key (dispatcher.go:86)."""
    return F.lower(F.col(msg_col))


def target_step_expr(msg_col: Column) -> Column:
    """Derive targetStep from the (lowercased) message text.

    Mirrors parsers.go:94-128: the first of the six step names found as a
    substring (underscore- or space-separated) wins, tested in reference
    order. Reference quirk reproduced deliberately: "prevote" is tested
    before "prevote_wait", and "Entering prevote wait step" contains
    "prevote", so wait-step messages collapse into their base step
    ("prevote"/"precommit") — the *_wait event types are unreachable via
    this path in the reference too.
    """
    expr = F.lit(None).cast("string")
    # Build WHEN chain in reference order; first match wins.
    out = None
    for step in TARGET_STEPS:
        spaced = step.replace("_", " ")
        cond = msg_col.contains(step)
        if spaced != step:
            cond = cond | msg_col.contains(spaced)
        out = F.when(cond, step) if out is None else out.when(cond, step)
    return out.otherwise(expr)
