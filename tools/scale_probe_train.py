"""Row-count scale probe for the in-engine training loop (SCALE.md).

The claim under test (ml/train.py): per-epoch cost is one scan of the
executor-cached train set plus a shuffle of ``partitions × params``
doubles — O(model), independent of row count.  So growing the train
set 10x/50x should grow per-epoch wall far slower than 10x/50x (the
numpy gradient work parallelizes across partitions; the reduce and
driver step do not grow at all).

The probe builds synthetic (seq, label) sets of 1k / 10k / 50k rows
(64-dim, the embeddings shape), caches each at 32 partitions, and
times ``distributed_loss_grad`` per epoch for the CNN (the widest
model, ~132k params) after one warm epoch.

Usage: python tools/scale_probe_train.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SIZES = [("1x", 1_000), ("10x", 10_000), ("50x", 50_000)]
L, C = 64, 4
REPS = 3


def main() -> int:
    from web_attack_detection_spark.ml import train
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_train")
    spark.sparkContext.setLogLevel("ERROR")

    params = train.init_params("cnn", L, C, seed=42)
    print(f"arch=cnn n_params={train.flatten_params(params).size}")
    results = []
    for tag, n in SIZES:
        # deterministic synthetic sequences: 64 hash-derived doubles
        df = (
            spark.range(n)
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(L - 1)),
                    lambda j: (
                        F.pmod(F.xxhash64(F.col("id") * L + j), F.lit(1000))
                        / 500.0
                        - 1.0
                    ),
                ).alias("seq"),
                F.pmod(F.col("id"), F.lit(C)).cast("int").alias("label"),
            )
            .repartition(32)
            .cache()
        )
        df.count()
        train.distributed_loss_grad(df, "cnn", params)  # warm
        walls = []
        for _ in range(REPS):
            t0 = time.time()
            _, _, n_seen = train.distributed_loss_grad(df, "cnn", params)
            walls.append(time.time() - t0)
        assert n_seen == n
        best = min(walls)
        results.append((tag, n, best))
        print(f"{tag}: rows={n} epoch_wall={best:.2f}s (all: "
              f"{['%.2f' % w for w in walls]})")
        df.unpersist()
    r1, r50 = results[0][2], results[-1][2]
    print(f"growth 1x->50x: rows 50.0x, wall {r50 / r1:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
