"""Salted join / two-phase aggregation must be result-identical to
their plain forms — on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.operators.skew import salted_aggregate, salted_join

from .conftest import SF_SMOKE


def _skewed(spark):
    """orders with 90% of rows forced onto one hot key."""
    o = load_table(spark, SF_SMOKE, "orders")
    return o.withColumn(
        "k", F.when(F.col("o_orderkey") % 10 != 0, F.lit(7)).otherwise(F.col("o_custkey"))
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark).select("o_orderkey", "k", "o_totalprice")
    small = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
        .filter(F.col("k") < 200)
    )
    plain = big.join(small, "k").select("o_orderkey", "k", "c_mktsegment")
    salted = salted_join(big, small, "k", n_salt=8).select("o_orderkey", "k", "c_mktsegment")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = _skewed(spark).select("o_orderkey", "k")
    small = spark.createDataFrame([(7, "hot")], "k long, tag string")
    plain = big.join(small, "k", "left").select("o_orderkey", "tag")
    salted = salted_join(big, small, "k", n_salt=4, how="left").select("o_orderkey", "tag")
    assert sorted(map(tuple, salted.collect()), key=repr) == sorted(
        map(tuple, plain.collect()), key=repr
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"],): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    two_phase = {
        (r["k"],): (r["n"], r["s"])
        for r in salted_aggregate(
            df.withColumn("p100", F.round(F.col("o_totalprice") * 100).cast("long")),
            ["k"],
            n_salt=8,
            sum_cols={"p100": "s"},
        ).collect()
    }
    assert two_phase == plain
