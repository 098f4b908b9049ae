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


def _skewed_amplified(spark):
    """The skewed fact side, amplified x8 and spread over 16 mappers.
    The mapper spread matters: AQE splits a skewed reducer partition
    by MAPPER ranges, so a single-mapper shuffle (this repo's one-row-
    group fixtures scan as 1 task) can never be split — exactly the
    observation that motivated the explicit repartition. On a real
    cluster the fact side always has thousands of mappers."""
    o = load_table(spark, SF_SMOKE, "orders")
    return (
        o.repartition(16)
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(8))))
        .withColumn(
            "k",
            F.when(F.col("o_orderkey") % 10 != 0, F.lit(7)).otherwise(
                F.col("o_custkey")
            ),
        )
        .select("o_orderkey", "k", "o_totalprice", "rep")
    )


def test_aqe_skew_join_splits_hot_partition_and_matches_salted(spark):
    """VERDICT r4 #6 — the 100 TB skew story SURVEY §4 promises is
    "config + layout, not engine code": on a genuinely skewed join,
    AQE's skew-join rule must fire (split the hot reducer partition
    into mapper-range chunks at runtime) and produce exactly the
    salted join's answer. Thresholds are pinned down to fixture scale
    — on a real cluster the defaults fire for the same shape."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = _skewed_amplified(spark)
        small = (
            load_table(spark, SF_SMOKE, "customer")
            .select(F.col("c_custkey").alias("k"), "c_mktsegment")
            .filter(F.col("k") < 200)
        )
        j = big.join(small, "k").select("o_orderkey", "k", "c_mktsegment")
        rows_aqe = sorted(map(tuple, j.collect()))
        # the ADAPTIVE executed plan must carry the skew-split markers
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew join did not fire:\n{plan[:2000]}"
        assert "skewed" in plan  # the AQEShuffleRead skew reader
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # answer parity with the manual salting operator
    big = _skewed_amplified(spark)
    small = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
        .filter(F.col("k") < 200)
    )
    salted = salted_join(big, small, "k", n_salt=8).select(
        "o_orderkey", "k", "c_mktsegment"
    )
    assert rows_aqe == sorted(map(tuple, salted.collect()))
