"""P4: consensus-steps — the consensus-only event filter.

Reference: ossplugins/consensus-steps/processor.go:21-65 keeps exactly
the 11 consensus event types and drops every P2P send/receive type. A
pure `isin` filter — Catalyst pushes it into the events scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import register_plugin

CONSENSUS_EVENT_TYPES = (
    "entering_new_round",
    "entering_prevote_step",
    "entering_prevote_wait_step",
    "entering_precommit_step",
    "entering_precommit_wait_step",
    "entering_commit_step",
    "committed_block",
    "propose_step",
    "received_proposal",
    "received_complete_proposal_block",
    "scheduled_timeout",
)


def consensus_steps_df(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type").isin(*CONSENSUS_EVENT_TYPES))


@register_plugin("consensus-steps")
def consensus_steps(events: DataFrame) -> dict[str, DataFrame]:
    return {"consensus_steps": consensus_steps_df(events)}
