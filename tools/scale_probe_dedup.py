"""10x in-flight scale probe for the dedup family (SCALE.md).

Same method as the other probes: the REAL registry query functions run
unmodified with the documents loader swapped for one that unions the
corpus 10x. Naively unioning IDENTICAL text would explode the pair
graph quadratically in the copy factor (every copy near-dups every
other copy — a pathological-duplication regime, not a scale-up), so
each extra copy is token-salted: every token gets a per-copy suffix,
which keeps shingle overlap WITHIN a copy (the planted organic
near-dups still pair) and destroys it ACROSS copies. 10x corpus, ~10x
pair graph — the linear regime a real corpus scales in.

Usage: python tools/scale_probe_dedup.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh",
    # round-5: the persistent-index lifecycle — probe against the
    # stored index, and compaction + post-merge serving (index builds
    # are cached per corpus count, so the warm pass times the PROBE)
    "dedup_incremental_indexed",
    "dedup_index_merge",
]


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import dedup as dedup_plans
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_dedup")

    def loader10(spark_, sf_dir, name):
        df = load_table(spark_, sf_dir, name)
        if name != "documents":
            return df
        out = df
        for i in range(1, 10):
            salted = df.select(
                (F.col("doc_id") + F.lit(1_000_000 * i)).alias("doc_id"),
                *[c for c in df.columns if c not in ("doc_id", "text")],
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(f"_{i}")),
                    ),
                    " ",
                ).alias("text"),
            ).select(df.columns)
            out = out.unionByName(salted)
        return out

    results = {}
    for mult in ["1x", "10x"]:
        for name in QUERIES:
            dedup_plans.load_table = load_table if mult == "1x" else loader10
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, mult)] = time.time() - t0
            print(f"{mult:>4} {name}: {results[(name, mult)]:.2f}s", flush=True)
    dedup_plans.load_table = load_table
    print("\n| plan | 1x | 10x | scaling |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[(name, "1x")], results[(name, "10x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
