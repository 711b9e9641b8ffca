"""SparkSession construction and per-session tuning.

The driver may hand us an already-built session (``__spark_entry__.entry``),
so everything that affects result correctness must be settable at runtime:
session time zone (UTC — DuckDB oracle timestamps are naive UTC), shuffle
partitioning, and AQE. ``tune_session`` applies those; ``get_spark`` builds
a local session for tests/bench with the same settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable configs applied to any session we touch. These are both
# correctness (timeZone) and 100TB-posture (AQE, skew join) settings.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Spark 4.x reads tz-naive parquet timestamps as TIMESTAMP_NTZ by
    # default, which unix_micros/unix_millis reject. Our semantics (matching
    # the reference's UTC timestamps, lib/time.go:5-13) are "naive == UTC
    # instant", so read them as TIMESTAMP under the UTC session tz.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def tune_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable correctness/perf configs to an existing session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some deployments; builder path sets it anyway
    n = shuffle_partitions or default_parallelism()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:
        pass
    return spark


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of currently persisted RDDs (cached DataFrames, persisted
    intermediates, localCheckpoints). Snapshot before a bounded piece of
    work, then pass to release_new_persists after — the surgical
    alternative to catalog.clearCache() for harnesses (bench rounds,
    plan audits) that share a long-lived session and must not drop
    OTHER work's caches."""
    return {e for e in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}


def release_new_persists(spark: SparkSession, before: set[int]) -> int:
    """Unpersist every RDD persisted since the ``before`` snapshot
    (non-blocking); returns how many were released. Repeated harness
    runs otherwise accumulate pinned blocks (each plugin fan-out pins
    its shared intermediates, each localCheckpoint pins its RDD) —
    block-manager pressure that shows up as run-to-run timing noise."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for rid in list(jmap.keySet().toArray()):
        if rid not in before:
            jmap.get(rid).unpersist(False)
            released += 1
    return released


def get_spark(
    app_name: str = "cometbft-log-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this engine.

    local[N] = one JVM with N executor threads; the design still assumes a
    multi-executor cluster (no collect()-based operators, partition-aware
    joins), so the same plans run unchanged on a real cluster.
    """
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_session(spark, shuffle_partitions)
