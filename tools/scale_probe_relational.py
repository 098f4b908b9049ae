"""10x in-flight scale probe for the round-2 relational shapes
(SCALE.md): PageRank's iterative join-agg, the CDC changelog window,
and the snapshot-diff full outer join, with their fact inputs unioned
10x through the unmodified registry functions.

Usage: python tools/scale_probe_relational.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["rel_pagerank_fixed", "rel_cdc_apply", "rel_snapshot_diff"]
# which tables get 10x'd per query (keys must stay join-consistent:
# lineitem rows replicate under the SAME keys -> weights grow 10x,
# orders replicate under shifted keys -> 10x the change-data keyspace)
_FACT = {"rel_pagerank_fixed": "lineitem", "rel_cdc_apply": "orders", "rel_snapshot_diff": "orders"}


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans import relational10
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_relational")

    def make_loader(fact: str):
        def loader(spark_, sf_dir, name):
            df = load_table(spark_, sf_dir, name)
            if name != fact:
                return df
            out = df
            for i in range(1, 10):
                if name == "orders":
                    out = out.unionByName(
                        df.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000 * i))
                    )
                else:
                    out = out.unionByName(df)
            return out

        return loader

    results = {}
    for mult in ["1x", "10x"]:
        for name in QUERIES:
            relational10.load_table = (
                load_table if mult == "1x" else make_loader(_FACT[name])
            )
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, mult)] = time.time() - t0
            print(f"{mult:>4} {name}: {results[(name, mult)]:.2f}s", flush=True)
    relational10.load_table = load_table
    print("\n| plan | 1x | 10x | scaling |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[(name, "1x")], results[(name, "10x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
