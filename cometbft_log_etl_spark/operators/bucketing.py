"""Bucketed table layout for co-located, shuffle-free joins.

At 100 TB the dominant recurring cost of the matching plugins is the
shuffle of both event sides onto the join key. Writing the normalized
events (or any fact table) BUCKETED by that key moves the shuffle to
write time, once: every later join/aggregation on the same key reads
co-located buckets and plans a SortMergeJoin with NO Exchange on
either side (verified by tests/test_bucketing.py against the physical
plan).

Bucket count is the write-time parallelism knob: pick ~ (table size /
256 MB) rounded to a power of two so per-bucket files stay in the
executor-memory sweet spot at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket specs Spark plans the join without an
    Exchange; broadcast is disabled for the call so the plan shows the
    co-located SortMergeJoin explicitly rather than being masked by a
    small-table broadcast during tests.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right.hint("merge"), keys, how)
