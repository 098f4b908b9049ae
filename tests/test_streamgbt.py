"""stream_gbt_trained_scoring semantics beyond the oracle: trainer
determinism on the events base and conservation of the scored mass."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.streamq import (
    _GBTX_FEATS,
    stream_gbt_trained_scoring,
)
from web_attack_detection_spark.plans.treeq import _gbm_fit, _gbm_predict_col

from .conftest import SF_SMOKE


def _events_base(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    return ev.select(
        F.round(F.col("value") * 10000).cast("long").alias("y"),
        (F.col("user_id") % 100).cast("long").alias("fu"),
        (F.col("event_id") % 100).cast("long").alias("fe"),
        ((F.col("user_id") + F.col("event_id")) % 50).cast("long").alias("fj"),
    )


def test_gbt_fit_deterministic(spark):
    base = _events_base(spark).localCheckpoint()
    a = _gbm_fit(base, _GBTX_FEATS)
    b = _gbm_fit(base, _GBTX_FEATS)
    assert a == b
    f0, stumps = a
    assert len(stumps) == 4
    # every stump splits on one of the declared features
    assert {s[1] for s in stumps} <= set(_GBTX_FEATS)


def test_stream_matches_batch_mass(spark):
    """The windowed stream output must conserve the batch-side scored
    mass: Σn = |events| and Σ sum_pred_q = batch sum of floor(F(x))."""
    out = stream_gbt_trained_scoring(spark, SF_SMOKE).collect()
    base = _events_base(spark).localCheckpoint()
    f0, stumps = _gbm_fit(base, _GBTX_FEATS)
    pq = F.floor(_gbm_predict_col(f0, stumps)).cast("long")
    batch = base.select(pq.alias("pq")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("pq").alias("s")
    ).first()
    assert sum(r["n"] for r in out) == batch["n"]
    assert sum(r["sum_pred_q"] for r in out) == batch["s"]
    assert all(r["min_pred_q"] <= r["max_pred_q"] for r in out)


def test_newton_booster_semantics(spark):
    """Semantic checks the oracle can't make: round structure, feature
    domain, Newton-step boundedness, and that train accuracy beats the
    minority-class rate (the F=0 start predicts all-1, so any learning
    must at least match the better constant predictor's floor)."""
    from web_attack_detection_spark.plans.treeq import (
        _GBC_FEATS,
        _gbc_predict_col,
        ml_gbt_classify_exact,
    )

    rows = ml_gbt_classify_exact(spark, SF_SMOKE).collect()
    assert [r["round"] for r in rows] == [1, 2, 3]
    assert all(r["feature"] in _GBC_FEATS for r in rows)
    # w_l/w_r are Newton steps: bounded by |g|/lambda and finite
    assert all(abs(r["w_l"]) < 1e6 and abs(r["w_r"]) < 1e6 for r in rows)
    acc = rows[0]["train_acc"]
    assert 0.0 <= acc <= 1.0
    # majority-class baseline: the booster should never be worse than
    # predicting all-0/all-1 at F=0 (pred = F>=0 -> all 1 at round 0)
    li = load_table(spark, SF_SMOKE, "lineitem")
    pos_rate = li.agg(
        F.avg((F.col("l_returnflag") == "R").cast("int")).alias("p")
    ).first()["p"]
    assert acc >= min(pos_rate, 1 - pos_rate)


def test_gbm_oracle_builder_stability():
    """The treeq GBM builders feed BOTH ml_gbt_stumps_exact's oracle
    and stream_gbt_trained_scoring's (one textual source).  Pin the
    batch oracle's exact bytes so a builder edit that would silently
    shift the lineitem replay fails here first (the r10 refactor was
    verified byte-identical against this same hash)."""
    import hashlib

    from web_attack_detection_spark.plans.registry import QUERIES

    h = hashlib.sha256(QUERIES["ml_gbt_stumps_exact"].oracle.encode()).hexdigest()
    assert h == "e5f6518177636bba0cdbc81de665466c7fe7fb76905e2e65bd3bd1877a4f055e"
    # and the stream twin must actually flow through the shared builders
    from web_attack_detection_spark.plans.treeq import _gbm_f_sql
    stream_oracle = QUERIES["stream_gbt_trained_scoring"].oracle
    assert _gbm_f_sql(4, ("u", "e", "j")) in stream_oracle
