"""S7: Structured-Streaming ingestion of CometBFT log directories.

Reference: internal/parser/dispatcher.go:101-121 (ParseStream — the
dormant streaming entry: NDJSON reader → dispatch → channel, no
metadata, no sort). Here the SAME transforms as the batch path run on a
streaming DataFrame: `parse_raw` and `normalize` are pure
projection/filter/union plans, so batch/stream parity is by
construction, not reimplementation.

`stream_events` goes beyond ParseStream to full main()-pipeline parity:
per-file identities come from a STATIC batch aggregation of the same
directory, broadcast into the stream (stream-static join) — the
M1/M2 enrichment without any streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.metadata import file_identities
from ..operators.normalize import normalize
from ..sources.logs import parse_raw, read_raw_events


def stream_log_lines(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source line stream. ``max_files_per_trigger`` bounds each
    micro-batch (files are taken oldest-modification-first) — production
    backpressure control, and what lets tests drive multi-batch
    watermark/timeout behavior deterministically from a static dir."""
    from ..sources.logs import LOG_GLOB, _reject_compressed_twins

    # Same double-ingest guard as the batch reader: a stem present as
    # both x.log and x.log.gz would stream every line twice. Checked
    # once at stream construction (one globStatus metadata call) — a
    # twin appearing mid-stream is a layout change the next restart
    # catches, the same contract as other stream-start validations.
    _reject_compressed_twins(spark, path.rstrip("/"))

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(LOG_GLOB.format(root=path.rstrip("/"))).select(
        F.col("value"), F.input_file_name().alias("file_path")
    )


def stream_dedup_lines(spark: SparkSession, path: str, watermark: str = "1 minute") -> DataFrame:
    """Streaming exact dedup of raw log lines by content hash.

    The training-data-pipeline shape (dedup before any parsing):
    `dropDuplicatesWithinWatermark` keys state on a 32-byte sha256 of
    the line and expires it once the event-time watermark passes —
    bounded state, unlike plain `dropDuplicates` whose key set grows
    forever. Duplicates arriving within the watermark window are
    suppressed; the first occurrence always survives.

    Lines whose JSON lacks a parseable `ts` are dropped here (they
    carry no event time to watermark on); the batch path drops them
    later at the tag peek anyway (dispatcher.go:74-77 semantics).
    """
    from ..functions.scalars import parse_rfc3339

    lines = stream_log_lines(spark, path)
    return (
        lines.withColumn("event_time", parse_rfc3339(F.get_json_object("value", "$.ts")))
        .filter(F.col("event_time").isNotNull())
        .withColumn("line_hash", F.sha2(F.col("value").cast("binary"), 256))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["line_hash"])
        .drop("line_hash")
    )


def stream_raw_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """ParseStream parity: streaming tag-dispatch, no enrichment."""
    return parse_raw(stream_log_lines(spark, path, max_files_per_trigger))


def stream_normalized(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming normalized events (no metadata — dispatcher.go:101-121
    emits bare parsed events)."""
    return normalize(stream_raw_events(spark, path, max_files_per_trigger))


def stream_events(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Full-pipeline parity on a stream: normalized + identity-stamped.

    The identity table is one row per file — a static batch aggregate
    over the same directory, broadcast to every micro-batch.

    Operational caveat: the static side's FILE LISTING is frozen when
    the query starts, so events from files created later stream through
    with NULL identity. Downstream joins that key on node_id will
    null-filter those rows (including before watermark nodes — they
    won't advance event time either). For long-running ingestion,
    restart the query on topology change or supply a refreshed identity
    table.
    """
    ids = file_identities(read_raw_events(spark, path), strict=strict)
    return stream_normalized(spark, path, max_files_per_trigger).join(
        F.broadcast(ids), "file_path", "left"
    )
