"""Unified 10x scale sidecar (VERDICT r7 #4): one artifact, one method.

Materializes a 10x-unioned copy of $SPARK_GRAFT_SF_DIR (default
sf0.1) on local disk, times the top cost families at 1x and 10x in
the SAME session, and writes ``BENCH_scale.json`` with per-query
per-unit-of-data ratios — replacing the scattered per-family SCALE.md
probe tables with one table the next verdict can diff.

Replication scheme (structure-preserving, output-linear):

- ``documents``: doc_id shifted by 10M per copy; every word gets a
  copy suffix (``regexp_replace('(\\S+)', '$1u<c>')``) so shingle sets
  are DISJOINT across copies — within-copy near-dup structure (the
  planted pairs) is preserved exactly, while cross-copy Jaccard is 0,
  keeping near-dup OUTPUT linear in copies (a naive union of
  identical texts would grow pair counts quadratically and measure
  output size, not scan/join cost).
- ``embeddings``: vec_id shifted by 1M per copy, vectors unchanged
  (ANN/k-means candidates grow linearly per bucket/cluster).
- ``events``: event_id shifted by 100M and user_id by 1M per copy —
  both shifts divisible by every modulus the queries key on (%4
  splits, %100 features, %16 sequence values), so per-copy semantics
  are identical and the user population grows 10x.

Copy 0 is byte-identical to the source, so the 1x relation is a
strict subset of the 10x one.

The per-unit ratio is ``t10 / (copies * t1)``: ~1.0 = perfectly
linear, <= ~1.3 = acceptable constant-factor growth (shuffle fan-in,
JIT), >> 1.3 = a super-linear plan (the r7 ml_minhash_lsh_join verify
bug would have shown here as df^2 growth). Sub-linear ratios are
expected for the deep trainers (their BPTT python loop is
hash-capped at _MAX_TRAIN rows by design — only the Spark dataflow
scales).

Usage: python tools/bench_scale.py [--copies N] [--out BENCH_scale.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ["PYTHONPATH"] = os.pathsep.join(
    [str(REPO)]
    + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)

from pyspark.sql import functions as F  # noqa: E402

# the top cost families (dedup, ANN, exact trainers, deep trainer,
# tokenizer trainers, ref battery, corpus pipeline) — every entry
# reads only documents/embeddings/events, the three replicated tables
QUERIES_10X = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "ml_minhash_lsh_join",
    "sim_ivf_topk",
    "sim_pq_adc_topk",
    "ml_kmeans_clusters",
    "ml_logreg_train_eval",
    "ml_als_exact",
    "ml_als_recommend",
    "ml_seqnet_served_confusion",
    "stream_seqnet_scoring",
    "text_bpe_train",
    "text_unigram_train",
    "text_unigram_encode",
    "text_wordpiece_encode",
    "ml_rnn_train_dist",
    "ref_unsw_battery_summary",
    "pipe_training_corpus",
]

# expected-sub-linear queries: the python-side train loop is
# hash-capped by design, so 10x data must NOT cost 10x
SUBLINEAR_BY_DESIGN = {"ml_rnn_train_dist"}


def materialize(spark, src: str, dst: str, copies: int) -> None:
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    parts = [docs]
    for c in range(1, copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1u{c}").alias("text"),
                *[f.name for f in docs.schema.fields if f.name not in ("doc_id", "text")],
            ).select(*docs.columns)
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    parts = [emb]
    for c in range(1, copies):
        parts.append(
            emb.select(
                (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                *[f.name for f in emb.schema.fields if f.name != "vec_id"],
            ).select(*emb.columns)
        )
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    ev = spark.read.parquet(f"{src}/events.parquet")
    parts = [ev]
    for c in range(1, copies):
        parts.append(
            ev.select(
                (F.col("event_id") + c * 100_000_000).alias("event_id"),
                (F.col("user_id") + c * 1_000_000).alias("user_id"),
                *[
                    f.name
                    for f in ev.schema.fields
                    if f.name not in ("event_id", "user_id")
                ],
            ).select(*ev.columns)
        )
    v = parts[0]
    for p in parts[1:]:
        v = v.unionByName(p)
    v.write.mode("overwrite").parquet(f"{dst}/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / "BENCH_scale.json"))
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--scale-dir", default="/tmp/spark_graft_scale10")
    args = ap.parse_args()

    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="bench_scale")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    materialize(spark, args.sf_dir, args.scale_dir, args.copies)
    build_s = round(time.perf_counter() - t0, 1)
    print(f"# 10x dir built in {build_s}s", file=sys.stderr)

    result: dict = {}
    for name in QUERIES_10X:
        fn = QUERIES[name].fn
        entry: dict = {}
        for tag, d in (("t1", args.sf_dir), (f"t{args.copies}", args.scale_dir)):
            load0 = round(os.getloadavg()[0], 2)
            t = time.perf_counter()
            n = fn(spark, d).count()
            entry[tag] = round(time.perf_counter() - t, 2)
            entry[f"{tag}_rows"] = n
            entry[f"{tag}_load"] = load0
            gc.collect()
        entry["ratio_per_unit"] = round(
            entry[f"t{args.copies}"] / (args.copies * entry["t1"]), 3
        )
        if name in SUBLINEAR_BY_DESIGN:
            entry["note"] = "python train loop hash-capped; only the dataflow scales"
        result[name] = entry
        print(f"# {name}: {entry}", file=sys.stderr)

    out = {
        "metric": "per_unit_scale_ratio",
        "sf": args.sf_dir,
        "copies": args.copies,
        "build_sec": build_s,
        "cpus": os.cpu_count(),
        "queries": result,
        "worst_ratio": max(v["ratio_per_unit"] for v in result.values()),
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v["ratio_per_unit"] for k, v in result.items()}))


if __name__ == "__main__":
    main()
