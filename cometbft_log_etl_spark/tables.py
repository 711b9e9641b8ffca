"""Test-table loading (driver-generated parquet, see TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Columns written as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
# timestamp type, so these are read as long (spark.sql.legacy.parquet.
# nanosAsLong) and floor-divided to microseconds, matching DuckDB's
# TIMESTAMP_NS → TIMESTAMP coercion exactly.
_NANO_TS_COLS = {"events": ("ts",)}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ→TIMESTAMP cast below is only exact under a UTC session tz.
    # Pin it here rather than trusting every caller's tune_session
    # discipline — a non-UTC session would silently shift instants.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nano_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Spark 4.x may read tz-naive parquet timestamps as TIMESTAMP_NTZ when
    # spark.sql.parquet.inferTimestampNTZ.enabled can't be unset (immutable
    # conf on driver-handed sessions). Our semantics are naive == UTC
    # instant; the cast is exact under the UTC session tz that tune_session
    # pins.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for SQL-authored plans)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
