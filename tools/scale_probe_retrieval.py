"""10x in-flight scale probe for the sparse/hybrid retrieval family
(SCALE.md).

Same method as the dedup probe: the REAL registry query functions run
unmodified with the documents loader swapped for one that unions the
corpus 10x with token-salted copies — per-copy token suffixes keep
term overlap WITHIN a copy and destroy it ACROSS copies, so the
inverted index grows linearly (10x postings over a 10x vocabulary)
instead of superlinearly, which is the regime a real corpus scales
in. The embeddings side (hybrid fusion) is replicated with offset
vec_ids. The query set (doc_id % 250 == 0) also grows 10x, so the
probe stresses BOTH the corpus scan and the query fan-out.

Usage: python tools/scale_probe_retrieval.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["sim_tfidf_topk_text", "sim_bm25_topk", "sim_hybrid_rrf"]


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import text5 as text5_plans
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_retrieval")

    def loader10(spark_, sf_dir, name):
        df = load_table(spark_, sf_dir, name)
        if name == "documents":
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
        if name == "embeddings":
            out = df
            for i in range(1, 10):
                out = out.unionByName(
                    df.select(
                        (F.col("vec_id") + F.lit(1_000_000 * i)).alias("vec_id"),
                        *[c for c in df.columns if c != "vec_id"],
                    ).select(df.columns)
                )
            return out
        return df

    results = {}
    for mult in ["1x", "10x"]:
        for name in QUERIES:
            text5_plans.load_table = load_table if mult == "1x" else loader10
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, mult)] = time.time() - t0
            print(f"{mult:>4} {name}: {results[(name, mult)]:.2f}s", flush=True)
    text5_plans.load_table = load_table
    print("\n| plan | 1x | 10x | scaling |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[(name, "1x")], results[(name, "10x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
