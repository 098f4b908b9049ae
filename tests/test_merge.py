"""Unit tests for operators/merge.py: MERGE upsert + SCD2 semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from web_attack_detection_spark.operators.merge import merge_upsert, scd2_apply


def _rows(df, *cols):
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


def test_merge_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k long, name string, v long"
    )
    out = merge_upsert(target, updates, ["k"])
    assert _rows(out, "k", "name", "v") == [
        (1, "a", 10),
        (2, "B", 99),  # whole-row update
        (3, "c", 30),
        (4, "d", 40),  # insert
    ]


def test_merge_upsert_partial_update_cols(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "IGNORED", 99), (5, "e", 50)], "k long, name string, v long"
    )
    out = merge_upsert(target, updates, ["k"], update_cols=["v"])
    assert _rows(out, "k", "name", "v") == [
        (1, "a", 10),
        (2, "b", 99),  # v updated, name kept from target
        (5, "e", 50),  # insert takes all columns from updates
    ]


def test_merge_upsert_null_key_matches_null_safely(spark):
    target = spark.createDataFrame([(None, 1), (7, 2)], "k long, v long")
    updates = spark.createDataFrame([(None, 100)], "k long, v long")
    out = merge_upsert(target, updates, ["k"])
    # NULL key must MATCH (eqNullSafe), not cartesian-insert a second NULL row
    assert _rows(out, "k", "v") == [(7, 2), (None, 100)]


def _d(s):
    return datetime.date.fromisoformat(s)


def test_scd2_closes_changed_and_appends(spark):
    dim = spark.createDataFrame(
        [(1, 10, _d("1990-01-01"), None), (2, 20, _d("1990-01-01"), None)],
        "k long, v long, valid_from date, valid_to date",
    )
    upd = spark.createDataFrame(
        [(1, 11, _d("1995-06-01"))], "k long, v long, effective_date date"
    )
    out = scd2_apply(dim, upd, "k", ["v"])
    assert _rows(out, "k", "v", "valid_from", "valid_to") == [
        (1, 10, _d("1990-01-01"), _d("1995-06-01")),  # closed
        (1, 11, _d("1995-06-01"), None),  # new open version
        (2, 20, _d("1990-01-01"), None),  # untouched key stays open
    ]


def test_scd2_unchanged_value_is_noop(spark):
    dim = spark.createDataFrame(
        [(1, 10, _d("1990-01-01"), None)], "k long, v long, valid_from date, valid_to date"
    )
    upd = spark.createDataFrame(
        [(1, 10, _d("1995-06-01"))], "k long, v long, effective_date date"
    )
    out = scd2_apply(dim, upd, "k", ["v"])
    assert _rows(out, "k", "v", "valid_from", "valid_to") == [
        (1, 10, _d("1990-01-01"), None)
    ]


def test_scd2_new_key_inserts_open_row_and_history_passes_through(spark):
    dim = spark.createDataFrame(
        [
            (1, 9, _d("1980-01-01"), _d("1990-01-01")),  # closed history
            (1, 10, _d("1990-01-01"), None),
        ],
        "k long, v long, valid_from date, valid_to date",
    )
    upd = spark.createDataFrame(
        [(3, 30, _d("1995-06-01"))], "k long, v long, effective_date date"
    )
    out = scd2_apply(dim, upd, "k", ["v"])
    assert _rows(out, "k", "v", "valid_from", "valid_to") == sorted(
        [
            (1, 9, _d("1980-01-01"), _d("1990-01-01")),  # history untouched
            (1, 10, _d("1990-01-01"), None),
            (3, 30, _d("1995-06-01"), None),  # brand-new key
        ],
        key=repr,
    )
