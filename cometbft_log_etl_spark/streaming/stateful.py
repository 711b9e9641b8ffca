"""Custom stateful streaming operator: the reference's exact
one-live-entry-per-key matcher as applyInPandasWithState.

The batch plugins (plans/p2p_messages.py) express the COMMON-case
semantics as a FIFO join; the reference's literal map semantics
(ossplugins/p2p-messages/processor.go:77-110) are last-writer-wins
state with re-confirmation:

  send    : entry==Received → emit confirmed (recv already arrived;
            negative-latency out-of-order case); else entry={Sent, ts}
  receive : entry exists with a send → emit confirmed vs the LATEST
            prior send (re-confirms on duplicates); entry without a
            send (receive-only) → stays Received
  expiry  : entries idle past the timeout flush as 'unmatched'
            (event-time timeout ≙ the batch end-of-input pending flush)

That transition table is genuinely sequential per key — exactly what
Structured Streaming's applyInPandasWithState exists for. State is one
tiny row per live key; rows within a batch are replayed in timestamp
order, so batch boundaries don't change the outcome for in-order data.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("match_key", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("sent_time", T.TimestampType()),
        T.StructField("received_time", T.TimestampType()),
        T.StructField("latency_ms", T.LongType()),
    ]
)

# (status, sent_micros, recv_micros); micros keep state arrow-simple
STATE_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("sent_us", T.LongType()),
        T.StructField("recv_us", T.LongType()),
    ]
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _ts(us):
    return pd.Timestamp(us * 1000) if us is not None else None


def _match_group(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    status, sent_us, recv_us = state.get if state.exists else (None, None, None)
    out: list[dict] = []

    if state.hasTimedOut:
        if status in ("sent", "received"):
            out.append(
                {
                    "match_key": key[0],
                    "status": "unmatched",
                    "sent_time": _ts(sent_us),
                    "received_time": _ts(recv_us),
                    "latency_ms": None,
                }
            )
        state.remove()
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])
        return

    max_us = 0
    # A key group can span multiple Arrow chunks; sorting each chunk
    # independently would replay events out of global timestamp order.
    # Per-key groups are tiny (one live entry per key), so concatenate
    # and sort once.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    batch = (
        pd.concat(chunks, ignore_index=True).sort_values("timestamp", kind="mergesort")
        if chunks
        else pd.DataFrame(columns=["timestamp", "side"])
    )
    for row in batch.itertuples(index=False):
        ev_us = _us(row.timestamp)
        max_us = max(max_us, ev_us)
        if row.side == "send":
            if status == "received":
                # out-of-order: receive was waiting (processor.go:79-88)
                out.append(
                    {
                        "match_key": key[0],
                        "status": "confirmed",
                        "sent_time": _ts(ev_us),
                        "received_time": _ts(recv_us),
                        "latency_ms": (recv_us - ev_us) // 1000,
                    }
                )
                status, sent_us = "confirmed", ev_us
            else:
                status, sent_us, recv_us = "sent", ev_us, None
        else:  # receive
            if status in ("sent", "confirmed") and sent_us is not None:
                # confirm vs latest prior send; duplicates re-confirm
                out.append(
                    {
                        "match_key": key[0],
                        "status": "confirmed",
                        "sent_time": _ts(sent_us),
                        "received_time": _ts(ev_us),
                        "latency_ms": (ev_us - sent_us) // 1000,
                    }
                )
                status, recv_us = "confirmed", ev_us
            else:
                status, recv_us = "received", ev_us

    state.update((status, sent_us, recv_us))
    # flush pendings idle for 2 minutes of event time
    if state.getCurrentWatermarkMs() >= 0:
        state.setTimeoutTimestamp(max(max_us // 1000, state.getCurrentWatermarkMs()) + 120_000)
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def stateful_vote_matcher(events: DataFrame, watermark: str = "30 seconds") -> DataFrame:
    """Vote send/receive matching with the reference's literal map
    semantics, keyed like keys.VoteKey (+ vote_type, see
    streaming/analytics.py on why the type joins the key)."""
    is_send = F.col("event_type") == "send_vote"
    votes = (
        events.filter(F.col("event_type").isin("send_vote", "receive_packet_vote"))
        .select(
            F.concat_ws(
                ":",
                F.col("msg_height"),
                F.col("msg_round"),
                F.col("vote_type"),
                F.col("validator_index"),
                F.when(is_send, F.col("node_id")).otherwise(F.col("source_peer_id")),
                F.when(is_send, F.col("recipient_peer_id")).otherwise(F.col("node_id")),
            ).alias("match_key"),
            F.when(is_send, "send").otherwise("receive").alias("side"),
            "timestamp",
        )
        .withWatermark("timestamp", watermark)
    )
    return votes.groupBy("match_key").applyInPandasWithState(
        _match_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
