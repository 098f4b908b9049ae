"""One-off stage profile of ref_unsw_battery (round-6 verdict #6).

Times the battery's stages separately on the UNSW-shaped fixture:
ingest+prep fit, per-(prep) train materialization, and each
(model, prep) fit+evaluate — so the docstring's cost attribution is
measured, not guessed.

Usage: python tools/profile_battery.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    from web_attack_detection_spark.functions.feature import classify_columns
    from web_attack_detection_spark.io.unsw import load_unsw, unsw_fixture_dir
    from web_attack_detection_spark.ml.pipeline import accuracy, to_vector
    from web_attack_detection_spark.runner import (
        _fit_named,
        battery_preps,
        fit_mlp,
        predict,
    )
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="profile_battery")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"

    t0 = time.time()
    d = unsw_fixture_dir(spark, sf_dir)
    train, test = load_unsw(spark, d)
    train, test = train.drop("label"), test.drop("label")
    _, nums = classify_columns(train, "attack_cat", reference_compat=True)
    train.count()
    print(f"ingest (4 CSVs -> train/test frames): {time.time()-t0:.2f}s")

    t0 = time.time()
    train_c = train.cache()
    fp, preps = battery_preps(
        train_c, test, label_col="attack_cat", raw_cols=nums,
        pca_k=20, reference_compat=True,
    )
    print(f"prep fits (9-stage pipeline incl PCA20): {time.time()-t0:.2f}s")

    for prep_name, (tr, te) in preps.items():
        t0 = time.time()
        tr = tr.cache(); tr.count()
        te = te.cache(); te.count()
        print(f"materialize {prep_name}: {time.time()-t0:.2f}s")
        for m in ("mlp", "logreg", "nb", "rf"):
            t0 = time.time()
            if m == "mlp":
                model = fit_mlp(tr, "features", "label", hidden=(16, 8), max_iter=40)
                scored = predict(model, te, "features")
            else:
                model = _fit_named(m, to_vector(tr, "features", "fv"))
                scored = model.transform(to_vector(te, "features", "fv"))
            acc = accuracy(scored).first()["accuracy"]
            print(f"  {m}/{prep_name}: fit+eval {time.time()-t0:.2f}s acc={acc:.3f}")
        tr.unpersist(); te.unpersist()
    train_c.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
