"""10x scale probe for the round-7 exact in-engine fits (SCALE.md).

Three claims to verify in flight, one per new exact trainer:

- ml_kmeans_clusters (exact Lloyd): per-round cost = one scan of the
  checkpointed quantized corpus against k*dim literals plus a k*dim-row
  collect, so 10x rows => ~10x per-round wall and a CONSTANT collect
  size (k*dim rows, corpus-independent).
- ml_pca_project fit: the whole fit is ONE scan producing 15 exact
  moments; 10x rows => ~10x scan, constant driver work (4x4 power
  iteration is corpus-independent).
- ml_decision_tree_exact: 2 scans producing histograms bounded by
  |features| * |distinct values| * |nodes| — the collect size must be
  EXACTLY equal at 1x and 10x (same value domains), only scan time may
  grow.

Method: synthesize 1x/10x corpora with the SAME value domains (union
of shifted copies so distinct feature values, k, and dim stay fixed),
time the fit stages, and record the driver-side collect row counts.
Exit 1 if any bounded-state claim fails (collect sizes growing with
corpus) — the same hard-assert discipline as scale_probe_stream.

Usage: python tools/scale_probe_exactml.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("scale_probe_exactml")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def probe_kmeans(spark, sf_dir: str, copies: int):
    """Replicate embeddings `copies`x (shifted ids, same vectors) and
    run the exact Lloyd loop; report wall + collect sizes."""
    from web_attack_detection_spark.plans.mlq import _KM_DIM, _KM_K, _KM_SCALE

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n0 = emb.count()
    rep = emb
    for c in range(1, copies):
        rep = rep.unionByName(
            emb.select((F.col("vec_id") + 100_000 * c).alias("vec_id"), "embedding")
        )
    q = rep.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda e: F.round(e * _KM_SCALE).cast("long"),
        ).alias("v"),
    ).localCheckpoint()
    seeds = (
        q.select("v", "vec_id", F.md5(F.col("vec_id").cast("string").cast("binary")).alias("h"))
        .orderBy(F.col("h").asc(), F.col("vec_id").asc())
        .limit(_KM_K)
        .collect()
    )
    centers = [[float(x) for x in r["v"]] for r in seeds]
    vd = F.transform(F.col("v"), lambda x: x.cast("double"))

    def dist_to(center):
        return F.aggregate(
            F.zip_with(vd, F.array(*[F.lit(c) for c in center]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    t0 = time.monotonic()
    collect_rows = 0
    rounds = 3  # enough to time the steady-state round
    for _ in range(rounds):
        best = F.array_min(
            F.array(
                *[
                    F.struct(dist_to(centers[c]).alias("dist"), F.lit(c).alias("cid"))
                    for c in range(_KM_K)
                ]
            )
        )
        assigned = q.select(
            "vec_id", "v", best["cid"].alias("cid"), F.floor(best["dist"]).cast("long").alias("distq")
        ).localCheckpoint()
        stats = (
            assigned.select("cid", F.posexplode("v").alias("d0", "x"))
            .groupBy("cid", "d0")
            .agg(F.sum("x").alias("sv"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        collect_rows = len(stats)
        nxt = {}
        for row in stats:
            nxt.setdefault(row["cid"], [0.0] * _KM_DIM)[row["d0"]] = row["sv"] / row["n"]
        centers = [nxt.get(c, centers[c]) for c in range(_KM_K)]
    wall = time.monotonic() - t0
    return {
        "rows": n0 * copies,
        "wall_per_round_s": round(wall / rounds, 3),
        "collect_rows": collect_rows,
        "bound": _KM_K * _KM_DIM,
    }


def probe_pca(spark, sf_dir: str, copies: int):
    from web_attack_detection_spark.plans.mlq import _PCA_COLS

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rep = li
    for _ in range(1, copies):
        rep = rep.unionByName(li)
    qdf = rep.select(
        *[
            F.round(F.col(c) * 100).cast("long").alias(f"q{d + 1}")
            for d, c in enumerate(_PCA_COLS)
        ]
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(F.col(f"q{i}").cast(dec)).alias(f"s{i}") for i in range(1, 5)]
    aggs += [
        F.sum((F.col(f"q{i}") * F.col(f"q{j}")).cast(dec)).alias(f"s{i}{j}")
        for i in range(1, 5)
        for j in range(i, 5)
    ]
    t0 = time.monotonic()
    m = qdf.agg(*aggs).first()
    wall = time.monotonic() - t0
    return {"rows": int(m["n"]), "moment_scan_s": round(wall, 3), "collect_cells": len(m)}


def probe_tree(spark, sf_dir: str, copies: int):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rep = li
    for _ in range(1, copies):
        rep = rep.unionByName(li)
    base = rep.select(
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
        F.round("l_quantity").cast("long").alias("fq"),
        F.round(F.col("l_discount") * 100).cast("long").alias("fd"),
        F.round(F.col("l_tax") * 100).cast("long").alias("ft"),
    )
    stacked = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("fname"), F.col(f"f{f}").alias("v"))
                for f in ("q", "d", "t")
            ]
        )
    ).alias("s")
    t0 = time.monotonic()
    h0 = (
        base.select("y", stacked)
        .groupBy("s.fname", "s.v")
        .agg(F.sum("y").alias("n1"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    wall = time.monotonic() - t0
    return {
        "rows": rep.count(),
        "hist_scan_s": round(wall, 3),
        "hist_rows": len(h0),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    print("# exact-ML fit probes (1x vs 10x, same value domains)")
    km1 = probe_kmeans(spark, sf_dir, 1)
    km10 = probe_kmeans(spark, sf_dir, 10)
    print(f"kmeans 1x : {km1}")
    print(f"kmeans 10x: {km10}")
    if km10["collect_rows"] > km1["bound"]:
        print("FAIL: kmeans collect grew past k*dim")
        ok = False
    pc1 = probe_pca(spark, sf_dir, 1)
    pc10 = probe_pca(spark, sf_dir, 10)
    print(f"pca 1x : {pc1}")
    print(f"pca 10x: {pc10}")
    if pc10["collect_cells"] != pc1["collect_cells"]:
        print("FAIL: pca moment collect grew with corpus")
        ok = False
    tr1 = probe_tree(spark, sf_dir, 1)
    tr10 = probe_tree(spark, sf_dir, 10)
    print(f"tree 1x : {tr1}")
    print(f"tree 10x: {tr10}")
    if tr10["hist_rows"] != tr1["hist_rows"]:
        print("FAIL: tree histogram grew with corpus (value domain fixed)")
        ok = False
    print("OK" if ok else "VIOLATIONS FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
