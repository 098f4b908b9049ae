"""10x in-flight scale probe for the corpus-pipeline shapes (SCALE.md).

Same method as the earlier probes: the REAL registry query functions
run unmodified, but their table loader is swapped for one that unions
the documents scan 10x with shifted doc_ids — 10x corpus volume through
the identical plans, on the same local[32] session. Sub-linear wall
clock growth = fixed-cost-dominated at test scale, the property that
transfers to a real cluster.

Usage: python tools/scale_probe_corpus.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["text_decontaminate", "text_bigram_lm", "pipe_training_corpus"]


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans import pipelineq, text3
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_corpus")

    def loader_10x(spark_, sf_dir, name):
        df = load_table(spark_, sf_dir, name)
        if name != "documents":
            return df
        out = df
        for i in range(1, 10):
            out = out.unionByName(
                df.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000 * i))
            )
        return out

    results = {}
    for mult, loader in [("1x", load_table), ("10x", loader_10x)]:
        # the plan modules hold direct references to load_table — patch
        # them, not io.sources
        text3.load_table = loader
        pipelineq.load_table = loader
        for name in QUERIES:
            # warm once so codegen/JIT doesn't pollute the timing
            REG[name].fn(spark, SF_DIR).count()
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, mult)] = time.time() - t0
            print(f"{mult:>4} {name}: {results[(name, mult)]:.2f}s", flush=True)
    text3.load_table = load_table
    pipelineq.load_table = load_table
    print("\n| plan | 1x | 10x | scaling |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[(name, "1x")], results[(name, "10x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
