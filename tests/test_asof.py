"""As-of / range join semantics on hand-built edge cases: equality
ties, left rows with no prior right row, carried value columns, and
bin-boundary pairs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from web_attack_detection_spark.operators.asof import asof_join, range_join_binned


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(12)), (3, 2, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 100.0), (1, _ts(11), 200.0), (2, _ts(9), 300.0)],
        "user_id long, ts timestamp, price double",
    )
    out = asof_join(left, right, key="user_id", right_value_cols=["price"])
    got = {r["event_id"]: (r["asof_ts"], r["asof_price"]) for r in out.collect()}
    # event 1 @10:00 → right @9:00; event 2 @12:00 → right @11:00
    # event 3 @9:00 == right @9:00 → equality INCLUDED (>= semantics)
    assert got == {
        1: (_ts(9), 100.0),
        2: (_ts(11), 200.0),
        3: (_ts(9), 300.0),
    }


def test_asof_drops_left_rows_with_no_prior_right(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(8)), (2, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame([(1, _ts(9))], "user_id long, ts timestamp")
    out = asof_join(left, right, key="user_id")
    assert [r["event_id"] for r in out.collect()] == [2]


def test_range_join_binned_boundary_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10, 0, 0))], "lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts(10, 4, 59)),   # inside radius
            (11, _ts(10, 5, 0)),    # exactly on the radius → included
            (12, _ts(10, 5, 1)),    # outside
            (13, _ts(9, 55, 0)),    # exactly on the radius, other side
        ],
        "rid long, ts2 timestamp",
    )
    out = range_join_binned(
        left, right, "ts", "ts2", radius_seconds=300,
        left_cols=["lid"], right_cols=["rid"],
    )
    assert sorted(r["rid"] for r in out.collect()) == [10, 11, 13]


def test_range_join_no_duplicate_pairs(spark):
    """Each qualifying pair must appear exactly once despite the
    3-bucket explode on the left side."""
    rows = [(i, _ts(10, i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    right = df.select(F.col("id").alias("rid"), F.col("ts").alias("ts2"))
    out = range_join_binned(
        df, right, "ts", "ts2", radius_seconds=120,
        left_cols=["id"], right_cols=["rid"],
    )
    pairs = [(r["id"], r["rid"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # each id matches ids within 2 minutes: itself ±2 neighbors
    n_expected = sum(
        1 for a in range(30) for b in range(30) if abs(a - b) <= 2
    )
    assert len(pairs) == n_expected
