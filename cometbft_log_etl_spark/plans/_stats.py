"""Grouped latency-histogram aggregation (the P7b pattern).

Reproduces /root/reference/ossplugins/network-latency/processor.go:499-556
(calculateStatistics) exactly, per group:

- mean   = sum / n with Go int64 division (truncation toward zero);
- median = middle element, or truncated mean of the two middles;
- p95/p99 = element at 0-based index int(n * 0.95) / int(n * 0.99),
  clamped to n-1 (index arithmetic, NOT interpolation);
- bucket counts against the group's own thresholds with *strict* `<`
  comparisons (processor.go:541-553);
- min is a plain min; max mirrors the reference's `latency > max` update
  against a zero-initialized field, i.e. max(0, max(values))
  (processor.go:371-377).

Spark shape: one windowed scan (row_number + count per group, ordered by
the value) followed by one aggregation — the "two-pass quantile bucket"
becomes a single shuffle on the group keys; the rank window reuses that
partitioning, so no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _trunc_div(num: Column, den: Column) -> Column:
    # Go integer division truncates toward zero; Spark's `div` floors.
    return (num.cast("double") / den.cast("double")).cast("long")


def go_latency_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "latency_ms",
    ts_col: str = "timestamp",
    extra_first_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group histogram rows matching latency.LatencyHistogram."""
    part = W.partitionBy(*group_cols)
    v = F.col(value_col)
    n = F.col("_n")
    rn = F.col("_rn")

    ranked = df.withColumn("_rn", F.row_number().over(part.orderBy(value_col))).withColumn(
        "_n", F.count(F.lit(1)).over(part)
    )

    # 0-based index int(n * p) clamped to n-1 (processor.go:527-537),
    # computed in IEEE double like Go's float64(n) * p.
    def q_idx(p: float) -> Column:
        return F.least(F.floor(n.cast("double") * F.lit(p)).cast("long"), n - 1) + F.lit(1)

    mid = (n / 2).cast("long")  # n and rn are positive: floor == trunc

    # Thresholds as unbounded-frame window values over the already-ranked
    # partition: no extra shuffle (same partitioning), and unlike a
    # collect_list aggregation this spills rather than OOMs when one
    # group holds billions of measurements.
    frame = part.orderBy(value_col).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)

    def at_w(idx: Column) -> Column:
        return F.max(F.when(rn == idx, v)).over(frame)

    median_w = F.when(
        n % 2 == 0, _trunc_div(at_w(mid) + at_w(mid + 1), F.lit(2))
    ).otherwise(at_w(mid + 1))
    thresh = (
        ranked.withColumn("_p50", median_w)
        .withColumn("_p95", at_w(q_idx(0.95)))
        .withColumn("_p99", at_w(q_idx(0.99)))
    )

    firsts = [F.first(c).alias(c) for c in (extra_first_cols or [])]
    # Strict-< bucket comparisons per processor.go:541-553.
    return thresh.groupBy(*group_cols).agg(
        *firsts,
        F.count(F.lit(1)).alias("count"),
        F.min(v).alias("min_latency_ms"),
        F.greatest(F.max(v), F.lit(0)).alias("max_latency_ms"),
        _trunc_div(F.sum(v), F.count(F.lit(1))).alias("mean_latency_ms"),
        F.max("_p50").alias("median_latency_ms"),
        F.max("_p95").alias("p95_latency_ms"),
        F.max("_p99").alias("p99_latency_ms"),
        F.count_if(v < F.col("_p50")).alias("below_p50_count"),
        F.count_if((v >= F.col("_p50")) & (v < F.col("_p95"))).alias("p50_to_p95_count"),
        F.count_if((v >= F.col("_p95")) & (v < F.col("_p99"))).alias("p95_to_p99_count"),
        F.count_if(v >= F.col("_p99")).alias("above_p99_count"),
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
    )
