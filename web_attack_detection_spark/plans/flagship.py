"""Flagship query: the reference's end-to-end feature pipeline.

Re-expresses ``/root/reference/utils/data_preprocessing.py:7-65`` (the
core "query" of the whole reference — SURVEY.md §3 entry point 2) over
the fixture ``events`` table:

    events ─► dtype column classification (R3) ─► mean-impute (F3)
           ─► standard-scale (F5) ─► string-index categoricals + label
              (F1) ─► one-hot (F2) ─► assemble array features (F4)
           ─► select(features, label)

Differences from the reference, on purpose (SURVEY.md §7 "what's
hard", item e): fit on train only; the label is excluded from the
feature set (the reference leaks it); output is ``array<double>``
rather than ``VectorUDT`` so the result is oracle-checkable.

Scale shape: fits are 1 aggregation job + 1 groupBy-count per
categorical column; transform is a map-only stage with broadcast
joins. No wide shuffle of the fact table anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.functions.feature import fit_feature_pipeline
from web_attack_detection_spark.io.sources import load_table


def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the feature pipeline on `events` and return (features, label).

    ``event_type`` plays the reference's ``attack_cat`` role (FIXTURES.md
    role mapping); ``props`` (json string) is a categorical stand-in for
    proto/service/state-style columns; ``value`` and the id columns are
    the numeric features.
    """
    events = load_table(spark, sf_dir, "events").drop("props")
    # deterministic train split (reference trains on 3 of 4 partition
    # files, main.py:28-44; we split by key instead of by file)
    train = events.filter(F.col("event_id") % 4 != 1)
    model = fit_feature_pipeline(train.drop("ts"), label_col="event_type")
    out = model.transform(events.drop("ts"))
    return out.select("features", "label")
