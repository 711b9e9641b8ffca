"""Skew mitigation primitives for hot keys at 100 TB.

AQE's skew-join split (enabled in session.py) handles most cases at
runtime; these explicit operators cover the two shapes AQE cannot:

- `salted_agg`: a hot GROUP BY key (one node pair carrying most of the
  traffic, one validator producing most votes) concentrates a whole
  aggregation on one task. Two-phase salted aggregation spreads the
  partial aggregate over `n_salts` tasks, then merges — only valid for
  reassociable aggregates (count/sum/min/max), which is enforced by
  taking partial and merge expression builders.
- `salted_join`: a skewed LEFT joined to a small-but-not-broadcastable
  RIGHT: salt the left deterministically, replicate the right across
  all salt values (explode, not crossJoin — one pass), join on
  (key, salt). Right-side replication costs right_rows × n_salts, so
  this is for the "dimension too big to broadcast, fact skewed" middle
  ground.

Salts are deterministic (xxhash64 of the row's key columns plus a
uniformizer), never rand(): retries and speculative tasks must agree.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, *uniformize_cols: str) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the given columns
    (pass high-cardinality payload columns so one hot KEY spreads)."""
    cols = [F.col(c) for c in uniformize_cols] or [F.spark_partition_id()]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partials: dict[str, Column],
    merges: Callable[[str], Column],
    n_salts: int = 16,
    uniformize_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over (keys, salt) then keys.

    partials: output_name -> aggregate over the raw rows
    merges:   output_name -> aggregate over the partial rows (e.g.
              count partials merge with sum)
    """
    salted = with_salt(df, n_salts, *(uniformize_cols or []))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[merges(name).alias(name) for name in partials]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    uniformize_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted left and a salt-replicated right."""
    l = with_salt(left, n_salts, *(uniformize_cols or []))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [*keys, "_salt"], how).drop("_salt")
