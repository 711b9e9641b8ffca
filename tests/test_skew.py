"""Skew-mitigation operators: salted results must equal plain results."""

from __future__ import annotations

from pyspark.sql import functions as F

from cometbft_log_etl_spark.operators.skew import salted_agg, salted_join
from cometbft_log_etl_spark.tables import load


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, r.qty)
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = salted_agg(
        li,
        ["l_returnflag"],
        partials={"n": F.count("*"), "qty": F.sum("l_quantity")},
        merges=lambda name: F.sum(name),
        n_salts=8,
        uniformize_cols=["l_orderkey"],
    )
    got = {(r.l_returnflag,): (r.n, r.qty) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(
        orders, cust, ["o_custkey"], n_salts=4, uniformize_cols=["o_orderkey"]
    ).groupBy("c_mktsegment").count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salt_is_deterministic(spark, sf_dir):
    from cometbft_log_etl_spark.operators.skew import with_salt

    li = load(spark, sf_dir, "lineitem").limit(1000)
    a = with_salt(li, 16, "l_orderkey").select("l_orderkey", "l_linenumber", "_salt")
    b = with_salt(li, 16, "l_orderkey").select("l_orderkey", "l_linenumber", "_salt")
    assert a.exceptAll(b).count() == 0
