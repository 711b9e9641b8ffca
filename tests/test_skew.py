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


def test_hot_key_pipeline_stress(spark):
    """A pathologically skewed stream — ONE user owning 50k of 51k
    events — must flow through the window-heavy operators (FIFO
    pairing, dual-gap sessionization) with exact results. Windows
    partition by user, so the hot key serializes within one task but
    must neither spill-fail nor change semantics; AQE's skew handling
    covers the join/agg stages around it."""
    from pyspark.sql import Window as W

    n_hot, n_cold = 50_000, 1_000
    hot = spark.range(n_hot).select(
        F.lit(777).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000).cast("long")
        ).alias("ts"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
    )
    cold = spark.range(n_cold).select(
        (F.col("id") % 100 + 1000).alias("user_id"),
        (F.col("id") + n_hot).alias("event_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000).cast("long")
        ).alias("ts"),
        F.lit("click").alias("event_type"),
    )
    ev = hot.unionByName(cold)

    # FIFO pairing: every hot click pairs with the next hot view
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sides = {
        kind: ev.filter(F.col("event_type") == kind)
        .withColumn("seq", F.row_number().over(w))
        .select("user_id", "seq", F.col("event_id").alias(f"{kind}_id"))
        for kind in ("click", "view")
    }
    paired = sides["click"].join(sides["view"], ["user_id", "seq"])
    assert paired.filter(F.col("user_id") == 777).count() == n_hot // 2

    # sessionization: hot user's 1s-spaced events form ONE session
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    sessions = (
        ev.withColumn(
            "new_s",
            F.when(F.lag("ts").over(w).isNull() | (gap > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("user_id", "sid")
        .count()
    )
    hot_sessions = sessions.filter(F.col("user_id") == 777).collect()
    assert len(hot_sessions) == 1 and hot_sessions[0]["count"] == n_hot
