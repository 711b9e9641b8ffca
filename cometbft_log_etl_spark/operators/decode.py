"""D1/D2: protobuf payload decode + channel/message validation.

The one genuinely imperative kernel in the pipeline (SURVEY.md §4): a
narrowly-scoped, Arrow-batched pandas UDF applied *after* all columnar
filtering, so parquet pushdown and tag pruning happen upstream. Mirrors
/root/reference/internal/parser/decoder.go:17-113 (decode) and
/root/reference/internal/converter/convereter.go:61-100 (validation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.protowire import decode_message

# Channel ids (reference types/channels.go:4-15).
STATE_CHANNEL = 0x20
DATA_CHANNEL = 0x21
VOTE_CHANNEL = 0x22
VOTE_SET_BITS_CHANNEL = 0x23

CHANNEL_NAMES = {
    0x00: "pex",
    0x40: "blocksync",
    0x23: "vote_set_bits",
    0x38: "evidence",
    0x30: "mempool",
    0x60: "snapshot",
    0x61: "chunk",
    0x21: "data",
    0x22: "vote",
    0x20: "state",
}

# isSupportedChannel (convereter.go:61-100): decoded kind → the only
# channel it may arrive on. Everything else (mempool/evidence/blocksync/
# pex/statesync/unknown) is rejected.
KIND_CHANNEL = {
    "vote": VOTE_CHANNEL,
    "proposal": DATA_CHANNEL,
    "block_part": DATA_CHANNEL,
    "new_round_step": STATE_CHANNEL,
    "new_valid_block": STATE_CHANNEL,
    "has_vote": STATE_CHANNEL,
    "vote_set_maj23": STATE_CHANNEL,
    "has_proposal_block_part": STATE_CHANNEL,
    "proposal_pol": STATE_CHANNEL,
    "vote_set_bits": VOTE_SET_BITS_CHANNEL,
}

CONSENSUS_CHANNELS = (STATE_CHANNEL, DATA_CHANNEL, VOTE_CHANNEL, VOTE_SET_BITS_CHANNEL)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("msg_kind", T.StringType()),
        T.StructField("msg_height", T.LongType()),
        T.StructField("msg_round", T.LongType()),
        T.StructField("msg_step", T.StringType()),
        T.StructField("seconds_since_start_time", T.LongType()),
        T.StructField("last_commit_round", T.LongType()),
        T.StructField("is_commit", T.BooleanType()),
        T.StructField("bid_hash", T.StringType()),
        T.StructField("ps_total", T.LongType()),
        T.StructField("ps_hash", T.StringType()),
        T.StructField("pol_round", T.LongType()),
        T.StructField("part_index", T.LongType()),
        T.StructField("part_bytes", T.StringType()),
        T.StructField("vote_type", T.StringType()),
        T.StructField("validator_index", T.LongType()),
        T.StructField("validator_address_fp", T.StringType()),
        T.StructField("msg_ts", T.StringType()),
        T.StructField("signature", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("vote_index", T.LongType()),
        T.StructField("bits", T.LongType()),
        T.StructField("elems", T.ArrayType(T.LongType())),
    ]
)

_FIELD_MAP = {
    "msg_kind": "kind",
    "msg_height": "height",
    "msg_round": "round",
    "msg_step": "step",
    "seconds_since_start_time": "seconds_since_start_time",
    "last_commit_round": "last_commit_round",
    "is_commit": "is_commit",
    "bid_hash": "bid_hash",
    "ps_total": "ps_total",
    "ps_hash": "ps_hash",
    "pol_round": "pol_round",
    "part_index": "part_index",
    "part_bytes": "part_bytes",
    "vote_type": "vote_type",
    "validator_index": "validator_index",
    "validator_address_fp": "validator_address",
    "msg_ts": "msg_ts",
    "signature": "signature",
    "extension": "extension",
    "vote_index": "vote_index",
    "bits": "bits",
    "elems": "elems",
}


@F.pandas_udf(DECODED_SCHEMA)
def decode_consensus_udf(msg_bytes: pd.Series) -> pd.DataFrame:
    """Arrow-batched decode of consensus Message payloads.

    Malformed payloads yield an all-NULL struct (msg_kind NULL) — the
    caller drops those rows, matching the reference's log-and-skip
    (app.go:87-91).
    """
    rows = []
    for raw in msg_bytes:
        rec = {k: None for k in _FIELD_MAP}
        if raw is not None and len(raw) > 0:
            try:
                d = decode_message(bytes(raw))
                for out_name, src in _FIELD_MAP.items():
                    rec[out_name] = d.get(src)
            except (ValueError, KeyError, OverflowError):
                pass
        rows.append(rec)
    return pd.DataFrame(rows, columns=list(_FIELD_MAP))


def channel_name_expr(channel) -> Column:
    """D3: channel id → human name (types/channels.go:17-47)."""
    c = F.col(channel) if isinstance(channel, str) else channel
    m = F.create_map(*[x for k, v in CHANNEL_NAMES.items() for x in (F.lit(k), F.lit(v))])
    return F.coalesce(m.getItem(c), F.lit("unknown"))


def valid_for_channel_expr(kind, channel) -> Column:
    """D2: keep only (decoded kind, channel) pairs the reference accepts."""
    k = F.col(kind) if isinstance(kind, str) else kind
    c = F.col(channel) if isinstance(channel, str) else channel
    m = F.create_map(*[x for kk, ch in KIND_CHANNEL.items() for x in (F.lit(kk), F.lit(ch))])
    return m.getItem(k) == c
