"""Grouped-map / cogrouped-map Arrow surface (applyInPandas).

API coverage for the two remaining Arrow batch shapes the engine's
Python-boundary policy allows: per-group pandas transforms and
two-sided cogrouped merges. Hot paths stay JVM-side (SCALE.md); these
exist for the operations that genuinely need per-group imperative
logic (model-per-group fits, per-entity curve fitting).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table

from .conftest import SF_SMOKE


def test_grouped_applyinpandas_zscore(spark):
    """Per-group z-score via applyInPandas == the window formulation."""
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std()  # pandas: sample std, ddof=1
        out = pdf[["event_id", "event_type"]].copy()
        out["z"] = (pdf["value"] - mu) / sd
        return out

    got = {
        r["event_id"]: r["z"]
        for r in ev.groupBy("event_type")
        .applyInPandas(zscore, "event_id long, event_type string, z double")
        .collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    ref = {
        r["event_id"]: r["z"]
        for r in ev.select(
            "event_id",
            ((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)).alias("z"),
        ).collect()
    }
    assert got.keys() == ref.keys()
    assert all(abs(got[k] - ref[k]) < 1e-9 for k in got)


def test_cogrouped_applyinpandas_merge_asof(spark):
    """Cogrouped merge: per-user as-of join of two event streams in
    pandas — result must agree with the relational as-of formulation
    on matched counts."""
    ev = load_table(spark, SF_SMOKE, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"user_id": [], "n_matched": []}).astype(
                {"user_id": "int64", "n_matched": "int64"}
            )
        l = left.sort_values("ts")
        r = right.sort_values("ts")
        m = pd.merge_asof(l, r, on="ts", direction="backward", suffixes=("", "_r"))
        return pd.DataFrame(
            {"user_id": [int(l["user_id"].iloc[0])], "n_matched": [int(m["event_id_r"].notna().sum())]}
        )

    got = {
        r["user_id"]: r["n_matched"]
        for r in views.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(asof, "user_id long, n_matched long")
        .collect()
        if r["n_matched"] > 0
    }
    # relational reference: for each view, a click at or before it exists
    ref = {
        r["user_id"]: r["n"]
        for r in views.alias("v")
        .join(clicks.alias("c"), "user_id")
        .filter(F.col("c.ts") <= F.col("v.ts"))
        .select("user_id", F.col("v.event_id").alias("vid"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == ref
