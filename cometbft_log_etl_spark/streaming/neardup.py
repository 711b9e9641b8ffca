"""Streaming MinHash-LSH near-duplicate detection — the q55 candidate
tier on a continuous document stream, with bounded keyed state.

A training-data lake ingests documents continuously; waiting for a
nightly batch q55 run means duplicates burn storage and training
tokens all day. This operator discovers candidate pairs ONLINE: each
arriving document is banded exactly like the batch tier, and a custom
applyInPandasWithState kernel keyed on (band, bucket) holds the
bucket's member list (capped at ``_BUCKET_CAP``, same guard as batch)
and emits a pair event the moment a new member lands in an occupied
bucket.

State is strictly bounded: ≤ cap doc_ids per (band, bucket) key, no
timestamps, no text. For id-ordered arrival the kept members — and
therefore the emitted pair set — equal the batch tier's lowest-id cap
exactly (asserted in tests/test_stream_neardup.py); out-of-order
arrival degrades gracefully to first-arrival-wins, the standard online
LSH trade.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.neardup import _BANDS, _BUCKET_CAP, _MH_A, _MH_B, _MH_P, _MINHASH_K, _h32_expr

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("band", T.IntegerType()),
    ]
)

# member doc_ids of this bucket, in arrival order, capped
STATE_SCHEMA = T.StructType([T.StructField("members", T.ArrayType(T.LongType()))])


def minhash_sig(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) with the SAME signature values as the batch
    ``_minhash_sigs``, computed entirely MAP-SIDE (higher-order folds,
    no explode/groupBy) so it runs on an unbounded stream without an
    aggregation stage. The batch tier keeps its explode+partial-agg
    formulation for whole-stage codegen (see its docstring); value
    equality between the two is asserted in tests.
    """
    # Shingles via zip_with over SHIFTED SLICES: the old form indexed
    # `element_at(toks, i + k)` inside the transform lambda, and a
    # non-lambda-variable expression in a higher-order-function body
    # re-evaluates PER ELEMENT — the text was re-split once per shingle,
    # O(tokens^2) per row (the round-11 q09 lesson). zip_with's inputs
    # are child expressions, evaluated once per row; concat_ws skips the
    # NULL padding on the short side, so the last two entries are short
    # shingles — sliced off before hashing.
    toks = F.split("text", " ")
    n = F.size(toks)
    s2 = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    s3 = F.slice(toks, 3, F.greatest(n - 2, F.lit(0)))
    shingles = F.slice(
        F.zip_with(
            F.zip_with(toks, s2, lambda a, b: F.concat_ws(" ", a, b)),
            s3,
            lambda ab, c: F.concat_ws(" ", ab, c),
        ),
        1,
        F.greatest(n - 2, F.lit(0)),
    )
    hs = F.transform(shingles, lambda sh: _h32_expr(sh))
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("_hs"), lambda h: (F.lit(_MH_A[k]) * h + F.lit(_MH_B[k])) % _MH_P)
            )
            for k in range(_MINHASH_K)
        ]
    )
    return (
        docs.filter(F.size(toks) >= 3)
        .select("doc_id", hs.alias("_hs"))
        .select("doc_id", sig.alias("sig"))
    )


def _bucket_group(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # no timeout configured; defensive
        state.remove()
        return
    (members,) = state.get if state.exists else ([],)
    members = list(members)
    seen = set(members)
    out: list[dict] = []
    band = int(key[0])
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True).sort_values("doc_id", kind="mergesort")
        for doc_id in batch["doc_id"]:
            d = int(doc_id)
            if d in seen:
                continue  # replays / duplicates of the same doc row
            if len(members) >= _BUCKET_CAP:
                continue  # degenerate-bucket guard, same cap as batch
            for m in members:
                a, b = (m, d) if m < d else (d, m)
                out.append({"doc_a": a, "doc_b": b, "band": band})
            members.append(d)
            seen.add(d)
    state.update((members,))
    if out:
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "band"])


def stream_lsh_band_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pair events from a document stream.

    Emits one row per (pair, band) the moment the pair first shares a
    bucket; aggregate ``n_shared_bands`` downstream (count by pair over
    the sink — the output is append-only, so any sink-side rollup
    works). Shuffles once per micro-batch on the 3-long bucket key.
    """
    sigs = minhash_sig(docs)
    banded = sigs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BANDS - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.element_at("sig", F.col("band") * 2 + 1).alias("s1"),
        F.element_at("sig", F.col("band") * 2 + 2).alias("s2"),
    )
    return banded.groupBy("band", "s1", "s2").applyInPandasWithState(
        _bucket_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
