"""Bucketed co-located joins: the join over two tables bucketed on the
same key must plan WITHOUT a shuffle (no Exchange in the final plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.operators.bucketing import colocated_join, write_bucketed
from cometbft_log_etl_spark.tables import load


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, "b_orders", ["l_orderkey"], n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_colocated_join_has_no_exchange(spark, bucketed):
    lt, rt = bucketed
    joined = colocated_join(spark, lt, rt, ["l_orderkey"])
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_colocated_join_correct(spark, sf_dir, bucketed):
    lt, rt = bucketed
    joined = colocated_join(spark, lt, rt, ["l_orderkey"])
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expect


def test_bucketed_agg_avoids_shuffle(spark, bucketed):
    lt, _ = bucketed
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
