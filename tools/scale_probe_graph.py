"""10x/100x edge-count scale probe for the graph family (SCALE.md,
VERDICT r3 #5).

The trade graph's node set is the 25 nations, so its edge list
saturates at C(25,2)=300 — scaling the FACT table would not grow the
graph. The probe therefore widens the graph itself: the REAL registry
query functions run unmodified while the loader remaps nation keys to
a K-node keyspace (customer: c_custkey % K, supplier: s_suppkey % K,
nation: range(K)). The fact-table join chain, edge aggregation,
orientation, and the 2-hop triangle join all run over the SAME sf0.1
input — only the graph grows:

    K=25  → the production 300-edge graph (baseline)
    K=80  → ~3.2k edges (~10x)
    K=250 → ~31k edges (~100x)

What sub-quadratic means here: wedges (the 2-hop join volume) grow
faster than edges on a densifying graph, but the degree-ordered
orientation bounds per-node fan-out by oriented out-degree — measured
wall growth should track edge growth (~Ex) and stay FAR below the E²
an unoriented enumeration would pay.

Usage: python tools/scale_probe_graph.py
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
    "graph_triangle_count",
    "graph_degree_distribution",
    "rel_pagerank_fixed",
    "graph_adamic_adar",
]
SCALES = [("1x", 25), ("10x", 80), ("100x", 250)]


def main() -> int:
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans import graphq, relational10
    from web_attack_detection_spark.plans.registry import QUERIES as REG
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_graph")

    def make_loader(k: int):
        def loader(spark_, sf_dir, name):
            df = load_table(spark_, sf_dir, name)
            if name == "nation":
                return spark_.range(k).select(
                    F.col("id").cast("int").alias("n_nationkey")
                )
            if name == "customer":
                return df.withColumn(
                    "c_nationkey", (F.col("c_custkey") % k).cast("int")
                )
            if name == "supplier":
                return df.withColumn(
                    "s_nationkey", (F.col("s_suppkey") % k).cast("int")
                )
            return df

        return loader

    results: dict[tuple, float] = {}
    edge_counts: dict[str, int] = {}
    for label, k in SCALES:
        loader = load_table if k == 25 else make_loader(k)
        graphq.load_table = loader
        relational10.load_table = loader
        edge_counts[label] = graphq._edges(spark, SF_DIR).count()
        for name in QUERIES:
            REG[name].fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            REG[name].fn(spark, SF_DIR).count()
            results[(name, label)] = time.time() - t0
            print(f"{label:>5} (K={k}) {name}: {results[(name, label)]:.2f}s", flush=True)
    graphq.load_table = load_table
    relational10.load_table = load_table

    # --- bipartite iterative family (k-core / BFS): scale the edge
    # DENSITY by loosening the bulk-quantity floor. Rounds are fixed,
    # so cost is rounds x O(E) shuffles — wall growth should track
    # edge growth linearly.
    from web_attack_detection_spark.plans import graphq2

    def make_bip(th):
        def bip(spark_, sf_dir):
            li = load_table(spark_, sf_dir, "lineitem")
            o = load_table(spark_, sf_dir, "orders")
            e = (
                li.filter(F.col("l_quantity") >= th)
                .join(o, li.l_orderkey == o.o_orderkey)
                .select(
                    o.o_custkey.cast("long").alias("ck"),
                    li.l_suppkey.cast("long").alias("sk"),
                )
                .distinct()
            )
            return e.select(
                F.col("ck").alias("a"),
                (F.col("sk") + graphq2._SUPP_OFFSET).alias("b"),
            ).unionAll(
                e.select(
                    (F.col("sk") + graphq2._SUPP_OFFSET).alias("a"),
                    F.col("ck").alias("b"),
                )
            )

        return bip

    BIP_QUERIES = ["graph_kcore_peel", "graph_bfs_levels"]
    BIP_SCALES = [("1x", 45), ("2.5x", 30), ("8x", 1)]
    bip_results: dict[tuple, float] = {}
    bip_edges: dict[str, int] = {}
    orig_bip = graphq2._bip_adj
    try:
        for label, th in BIP_SCALES:
            graphq2._bip_adj = orig_bip if th == 45 else make_bip(th)
            bip_edges[label] = graphq2._bip_adj(spark, SF_DIR).count() // 2
            for name in BIP_QUERIES:
                REG[name].fn(spark, SF_DIR).count()  # warm
                t0 = time.time()
                REG[name].fn(spark, SF_DIR).count()
                bip_results[(name, label)] = time.time() - t0
                print(
                    f"{label:>5} (qty>={th}) {name}: "
                    f"{bip_results[(name, label)]:.2f}s",
                    flush=True,
                )
    finally:
        graphq2._bip_adj = orig_bip

    print(f"\nedges: " + ", ".join(f"{l}={edge_counts[l]}" for l, _ in SCALES))
    print("\n| plan | 1x | 10x | 100x | wall growth at 100x edges |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        a = results[(name, "1x")]
        b = results[(name, "10x")]
        c = results[(name, "100x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {c:.2f} s | {c / a:.1f}x |")

    print(f"\nbipartite edges: " + ", ".join(
        f"{l}={bip_edges[l]}" for l, _ in BIP_SCALES))
    print("\n| plan | 1x | 2.5x | 8x | wall growth at 8x edges |")
    print("|---|---|---|---|---|")
    for name in BIP_QUERIES:
        a = bip_results[(name, "1x")]
        b = bip_results[(name, "2.5x")]
        c = bip_results[(name, "8x")]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {c:.2f} s | {c / a:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
