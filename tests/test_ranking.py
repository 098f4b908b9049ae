"""operators/ranking.py must be bit-identical to the single-partition
window forms it replaces — on adversarial key distributions (ties,
negatives, constants, skew), not just the fixtures."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from web_attack_detection_spark.operators.ranking import (
    ntile_from_rank,
    ranged_row_number,
)


def _cases():
    rng = random.Random(42)
    yield "uniform", [(i, rng.uniform(-100, 100)) for i in range(500)]
    yield "heavy_ties", [(i, float(rng.randint(0, 5))) for i in range(500)]
    yield "constant", [(i, 3.14) for i in range(100)]
    yield "skewed", [(i, 0.0 if i % 10 else float(i)) for i in range(300)]
    yield "tiny", [(0, 1.0), (1, 0.5)]
    yield "single", [(7, -2.0)]


def test_ranged_row_number_matches_global_window(spark):
    for name, rows in _cases():
        df = spark.createDataFrame(rows, "id long, v double")
        order = [F.col("v").asc(), F.col("id").asc()]
        got = {
            r["id"]: r["rn"]
            for r in ranged_row_number(df, "v", order, n_buckets=7).collect()
        }
        want = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy(*order))
            ).collect()
        }
        assert got == want, f"case {name}"


def test_ranged_row_number_descending(spark):
    rows = [(i, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["rn"]
        for r in ranged_row_number(
            df, "v", order, descending=True, n_buckets=5
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_ntile_from_rank_matches_sql_ntile(spark):
    # every (n, k) shape incl. n < k, n % k == 0, and ragged splits
    for n, k in [(10, 4), (12, 4), (3, 10), (100, 7), (1, 1), (5, 5)]:
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
        got = {
            r["id"]: r["t"]
            for r in df.select(
                "id", ntile_from_rank(F.col("id"), F.lit(n), k).alias("t")
            ).collect()
        }
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id", F.ntile(k).over(Window.orderBy("id")).cast("long").alias("t")
            ).collect()
        }
        assert got == want, f"n={n} k={k}"


def test_ranged_row_number_total_col(spark):
    df = spark.createDataFrame([(i, float(i % 3)) for i in range(50)], "id long, v double")
    out = ranged_row_number(
        df, "v", [F.col("v").asc(), F.col("id").asc()], total_col="n"
    )
    rows = out.collect()
    assert all(r["n"] == 50 for r in rows)
    assert sorted(r["rn"] for r in rows) == list(range(1, 51))


def test_ranged_row_number_materialize_identical(spark):
    """The materialize=True (100 TB) path must produce the identical
    ranking — one lazy localCheckpoint, same answer."""
    df = spark.createDataFrame(
        [(i, float((i * 13) % 7)) for i in range(300)], "id long, v double"
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    a = {r["id"]: r["rn"] for r in ranged_row_number(df, "v", order).collect()}
    b = {
        r["id"]: r["rn"]
        for r in ranged_row_number(df, "v", order, materialize=True).collect()
    }
    assert a == b


def test_ranged_row_number_null_key_fails_fast(spark):
    """ADVICE r5: a null range key must RAISE, not silently vanish
    from the output (the null bucket used to miss the offsets join)."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, k double"
    )
    out = ranged_row_number(df, "k", [F.col("k").asc(), F.col("id").asc()])
    with pytest.raises(Exception, match="null/NaN"):
        out.collect()


def test_ranged_row_number_nan_key_fails_fast(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, float("nan")), (3, 30.0)], "id long, k double"
    )
    out = ranged_row_number(df, "k", [F.col("k").asc(), F.col("id").asc()])
    import pytest

    with pytest.raises(Exception, match="null/NaN"):
        out.collect()


def test_ranged_row_number_wide_integer_span_no_overflow(spark):
    """ADVICE r5: a BIGINT key whose span exceeds 2^63/n_buckets must
    still bucket correctly (double arithmetic, monotone) instead of
    overflowing under ANSI mode."""
    big = 2**62
    rows = [(i, v) for i, v in enumerate([-big, -1, 0, 7, big])]
    df = spark.createDataFrame(rows, "id long, k long")
    out = ranged_row_number(df, "k", [F.col("k").asc(), F.col("id").asc()]).collect()
    got = {r["k"]: r["rn"] for r in out}
    assert got == {-big: 1, -1: 2, 0: 3, 7: 4, big: 5}
