"""M1/M2: per-file identity capture + metadata enrichment.

Reference: internal/app/app.go:77-86 captures the first "P2P Node ID"
and "This node is a validator" line per file (erroring if either is
missing, app.go:97-99), then stamps every event from that file with
(node_id, validator_address) (attachMetadata, app.go:103-108).

Spark-first: a per-file aggregation (earliest identity line via min over
a (ts, value) struct) followed by a broadcast join back onto the events
— the identity table is one row per input file, so the join never
shuffles the event side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import parse_rfc3339


class MissingIdentityError(ValueError):
    """A log file produced events but no node/validator identity line."""


def file_identities(raw: DataFrame, strict: bool = True) -> DataFrame:
    """M1: (file_path, node_id, validator_address) — earliest identity
    line of each kind per file."""

    def first_of(kind: str, field) -> F.Column:
        return F.min(
            F.when(F.col("kind") == kind, F.struct(parse_rfc3339("j.ts").alias("ts"), field.alias("v")))
        )["v"]

    # Anchor on every file that produced any recognized line, so a file
    # with zero identity lines still fails the strict check (app.go:97-99).
    ids = raw.groupBy("file_path").agg(
        first_of("p2p_node_id", F.col("j.ID")).alias("node_id"),
        first_of("validator", F.col("j.addr")).alias("validator_address"),
    )
    if strict:
        bad = ids.filter(F.col("node_id").isNull() | F.col("validator_address").isNull())
        bad_files = [r.file_path for r in bad.select("file_path").limit(10).collect()]
        if bad_files:
            raise MissingIdentityError(
                f"files missing node/validator identity lines: {bad_files}"
            )
    return ids


def attach_metadata(events: DataFrame, identities: DataFrame, strict: bool = True) -> DataFrame:
    """M2: stamp (node_id, validator_address) onto every event via a
    broadcast join on file lineage."""
    out = events.join(F.broadcast(identities), "file_path", "left")
    if strict:
        missing = out.filter(F.col("node_id").isNull()).select("file_path").limit(1).collect()
        if missing:
            raise MissingIdentityError(
                f"events from file without identity: {missing[0].file_path}"
            )
    return out
