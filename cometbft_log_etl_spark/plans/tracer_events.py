"""P9: tracer-events — consensus steps ∪ confirmed P2P, time-sorted.

Reference: ossplugins/tracer-events/plugin.go:39-73 composes the
consensus-steps filter and the p2p-messages matcher over the same
stream, unions both outputs and sorts by timestamp into one collection.
Here that is literally `unionByName(allowMissingColumns=True)` +
`orderBy` — and because both inputs derive from the same cached events
DataFrame, the shared scan is free (SURVEY.md §2.6 P9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .consensus_steps import consensus_steps_df
from .p2p_messages import p2p_confirmed_df
from .registry import register_plugin


@register_plugin("tracer-events")
def tracer_events(events: DataFrame) -> dict[str, DataFrame]:
    steps = consensus_steps_df(events).drop("msg_bytes", "part_bytes", "block_raw")
    p2p = p2p_confirmed_df(events)
    merged = steps.unionByName(p2p, allowMissingColumns=True).orderBy("timestamp")
    return {"tracer_events": merged}
