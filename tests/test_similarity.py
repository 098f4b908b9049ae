"""Similarity operator semantics: IVF recall vs brute force, cosine
self-similarity sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    cosine_pairs,
    cosine_pairs_blocked,
    ivf_topk,
)

from .conftest import SF_SMOKE


def test_cosine_self_is_one(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(20)
    out = emb.select(cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert all(abs(r["c"] - 1.0) < 1e-9 for r in out)


def test_brute_force_topk_deterministic_and_ranked(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        cos_vals = [r["cos"] for r in rows]
        assert cos_vals == sorted(cos_vals, reverse=True)
        assert all(r["neighbor_id"] != r["query_id"] for r in rows)


def test_ivf_recall_vs_bruteforce(spark):
    """IVF probing 4/16 cells must keep recall@5 ≥ 0.5 on random
    unit vectors (it scans ~25% of the corpus; exact recall depends on
    cell geometry, 0.5 is a conservative floor)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, k_centroids=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_blocked_pairs_bit_exact_vs_fold(spark):
    """The blocked numpy kernel must reproduce the JVM fold exactly —
    same pairs, bit-identical cosines (dimension-sequential float64
    accumulation is the same IEEE op sequence as the fold)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    fold = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_pairs(emb, threshold=0.45).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_pairs_blocked(emb, threshold=0.45).collect()
    }
    assert fold == blocked and len(fold) > 0


def test_ivf_partitioned_layout_prunes_cells(spark, tmp_path):
    """The IVF 'layout = index' claim, end to end: persist the assigned
    corpus partitioned BY cell, and a probe of 2 cells must (a) push
    the cell predicate into PartitionFilters — whole directories
    skipped, not rows filtered — and (b) return exactly the vectors
    assigned to those cells."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from web_attack_detection_spark.operators.similarity import ivf_assign

    emb = load_table(spark, SF_SMOKE, "embeddings")
    _, assigned = ivf_assign(emb, 16)
    path = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cell").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cell").isin(3, 7))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]

    expected = {r["vec_id"] for r in assigned.filter(F.col("cell").isin(3, 7)).collect()}
    got = {r["vec_id"] for r in probed.collect()}
    assert got == expected and got


def test_brp_lsh_full_planted_recall(spark):
    """ml_brp_lsh_join must find EXACTLY the planted near-duplicate
    pairs: precision is structurally exact (approxSimilarityJoin
    re-checks true distance), and recall over 0.005-apart pairs with
    bucketLength=1.0 x 4 tables must be total."""
    from web_attack_detection_spark.plans.mlq import ml_brp_lsh_join

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planted_ids = sorted(
        r["vec_id"] for r in emb.filter(F.col("vec_id") % 5 == 0).select("vec_id").collect()
    )
    out = ml_brp_lsh_join(spark, SF_SMOKE).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    want = {(i, i + 10000) for i in planted_ids}
    assert got == want
    assert all(r["dist"] < 0.05 for r in out)


def test_ivf_indexed_equals_in_query_build(spark):
    """The persisted-index path (sim_ivf_indexed) must return
    row-for-row the same top-k as the in-query build (sim_ivf_topk) —
    same centroid seeding, same probes, same ranking."""
    from web_attack_detection_spark.plans.similarity import sim_ivf_topk
    from web_attack_detection_spark.plans.similarity3 import sim_ivf_indexed
    from .conftest import SF_SMOKE

    a = sim_ivf_indexed(spark, SF_SMOKE).collect()
    b = sim_ivf_topk(spark, SF_SMOKE).collect()
    assert len(a) > 0
    assert a == b
