"""10x in-flight scale probe for the reference-protocol training
queries (SCALE.md; round-6 verdict #4).

Same loader-patch method as the other probes: the REAL
ml_{cnn,rnn,lstm}_train_dist registry functions run unmodified, but
their embeddings loader unions the scan 10x with shifted vec_ids.

The claim under test (plans/deepq.py): query cost is CORPUS-VOLUME-
INDEPENDENT by construction —

  * the train side is hash-down-sampled to _MAX_TRAIN rows before any
    Python-loop work, so the serial minibatch protocol sees a fixed
    row count at any SF;
  * the EarlyStopping validation sample is hash-bounded to _MAX_VAL;
  * everything that DOES grow with the corpus (the labeling scan, the
    standardizer aggregate, the held-out distributed scoring through
    predict_batch_udf) is one parallel pass.

So 10x the corpus should cost far less than 10x the wall.

Usage: python tools/scale_probe_train_query.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["ml_cnn_train_dist", "ml_rnn_train_dist", "ml_lstm_train_dist"]


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans import deepq
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_train_query")
    spark.sparkContext.setLogLevel("ERROR")

    def loader_10x(spark_, sf_dir, name):
        df = load_table(spark_, sf_dir, name)
        if name != "embeddings":
            return df
        out = df
        for i in range(1, 10):
            out = out.unionByName(
                df.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000 * i))
            )
        return out

    # The 10x hash-sample is a DIFFERENT 384-row train subset, so the
    # early stop can fire at a different epoch — report wall AND
    # epochs_run, and compare seconds/epoch (the volume-scaling term)
    # rather than raw wall, which conflates trajectory luck with scale.
    results = {}
    for mult, loader in [("1x", load_table), ("10x", loader_10x)]:
        deepq.load_table = loader
        for name in QUERIES:
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            row = REG[name].fn(spark, SF_DIR).collect()[0]
            results[(name, mult)] = (time.time() - t0, int(row["epochs_run"]))
            print(
                f"{mult:>4} {name}: {results[(name, mult)][0]:.2f}s "
                f"({results[(name, mult)][1]} epochs)",
                flush=True,
            )
    deepq.load_table = load_table
    print("\n| plan | 1x | 10x | s/epoch scaling |")
    print("|---|---|---|---|")
    for name in QUERIES:
        (a, ea), (b, eb) = results[(name, "1x")], results[(name, "10x")]
        print(
            f"| {name} | {a:.2f} s / {ea} ep | {b:.2f} s / {eb} ep "
            f"| {(b / eb) / (a / ea):.1f}x |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
