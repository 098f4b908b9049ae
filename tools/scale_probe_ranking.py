"""10x in-flight scale probe for the distributed two-phase rank
(operators/ranking.py) — the round-5 replacement for every global
window sort (SCALE.md).

rel_ntile_buckets ranks 10x the customers (shifted keys, unchanged
balance distribution — the bucket histogram just scales), and
pipe_sorted_export ranks AND MATERIALIZES 10x the documents (offset
ids widen the LCG key space; the export writes 10x the shards). Both
run the unmodified registry functions with a patched loader. The
claim under test: wall tracks data volume (biggest sort = one range
bucket), never the single-task blowup a global window would show.

Usage: python tools/scale_probe_ranking.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import pipelineq, relational2
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_ranking")

    def loader10(spark_, sf_dir, name):
        df = load_table(spark_, sf_dir, name)
        key = {"customer": "c_custkey", "documents": "doc_id"}.get(name)
        if key is None:
            return df
        out = df
        for i in range(1, 10):
            out = out.unionByName(
                df.select(
                    (F.col(key) + F.lit(1_000_000 * i)).alias(key),
                    *[c for c in df.columns if c != key],
                ).select(df.columns)
            )
        return out

    cases = [("rel_ntile_buckets", relational2), ("pipe_sorted_export", pipelineq)]
    results = {}
    for mult in ["1x", "10x"]:
        for name, mod in cases:
            mod.load_table = load_table if mult == "1x" else loader10
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, mult)] = time.time() - t0
            print(f"{mult:>4} {name}: {results[(name, mult)]:.2f}s", flush=True)
    for _, mod in cases:
        mod.load_table = load_table
    print("\n| plan | 1x | 10x | scaling |")
    print("|---|---|---|---|")
    for name, _ in cases:
        a, b = results[(name, "1x")], results[(name, "10x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
