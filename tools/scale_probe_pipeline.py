"""10x in-flight scale probe for the round-4 pipeline additions
(VERDICT r4 #7): pipe_entity_resolution and pipe_shard_plan.

Same method as the dedup/retrieval probes: the REAL registry query
functions run unmodified with their loaders swapped for 10x versions.

- ``part`` (entity resolution): 9 extra copies with offset keys and a
  per-copy 4-char name suffix ("_iii"). Within a copy, pairwise
  Levenshtein distances are preserved (every name gets the same
  suffix); across copies the suffixes differ in 3+ positions — beyond
  the d=2 match radius — so the fuzzy-edge graph grows LINEARLY
  (10x the per-copy edges, no cross-copy edges), which is the regime
  a real catalog scales in.
- ``documents`` (shard planner): 9 offset-id copies — 10x the bytes,
  10x the buckets, 10x the shards.

Usage: python tools/scale_probe_pipeline.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["pipe_entity_resolution", "pipe_shard_plan"]


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import pipelineq as pipe_plans
    from web_attack_detection_spark.plans import text as text_plans
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_pipeline")

    def loader10(spark_, sf_dir, name):
        df = load_table(spark_, sf_dir, name)
        if name == "part":
            out = df
            for i in range(1, 10):
                out = out.unionByName(
                    df.select(
                        (F.col("p_partkey") + F.lit(1_000_000 * i)).alias(
                            "p_partkey"
                        ),
                        F.concat(F.col("p_name"), F.lit(f"_{i}{i}{i}")).alias(
                            "p_name"
                        ),
                        *[c for c in df.columns if c not in ("p_partkey", "p_name")],
                    ).select(df.columns)
                )
            return out
        if name == "documents":
            out = df
            for i in range(1, 10):
                out = out.unionByName(
                    df.select(
                        (F.col("doc_id") + F.lit(1_000_000 * i)).alias("doc_id"),
                        *[c for c in df.columns if c != "doc_id"],
                    ).select(df.columns)
                )
            return out
        return df

    results = {}
    for mult in ["1x", "10x"]:
        for name in QUERIES:
            ld = load_table if mult == "1x" else loader10
            pipe_plans.load_table = ld
            text_plans.load_table = ld
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, mult)] = time.time() - t0
            print(f"{mult:>4} {name}: {results[(name, mult)]:.2f}s", flush=True)
    pipe_plans.load_table = load_table
    text_plans.load_table = load_table
    print("\n| plan | 1x | 10x | scaling |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[(name, "1x")], results[(name, "10x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
