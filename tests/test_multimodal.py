"""Multimodal plumbing: determinism of the Arrow path, stub gating,
frame-sampling arithmetic."""

from __future__ import annotations

import pytest

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.operators.multimodal import (
    attach_fake_media,
    decode_image_stub,
    extract_media_features,
    sample_frames,
)

from .conftest import SF_SMOKE


def test_decode_stub_gating():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc", fake=False)
    a = decode_image_stub(b"abc", fake=True)
    assert a == decode_image_stub(b"abc", fake=True)
    assert len(a) == 16 and all(0 <= x < 256 for x in a)


def test_vectorized_decode_matches_scalar_stub(spark):
    """The numpy-vectorized batch decode must be bit-identical to the
    scalar reference stub, including short (<256B) and empty payloads."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = attach_fake_media(docs, "text", "doc_id")
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    got = {
        r["media_id"]: list(r["pseudo_pixels"])
        for r in extract_media_features(media).collect()
    }
    for mid, p in payloads.items():
        assert got[mid] == decode_image_stub(p, fake=True), mid


def test_extract_features_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = attach_fake_media(docs, "text", "doc_id")
    out1 = {r["media_id"]: tuple(r) for r in extract_media_features(media).collect()}
    out2 = {r["media_id"]: tuple(r) for r in extract_media_features(media).collect()}
    assert out1 == out2
    assert len(out1) == 50
    sample = next(iter(out1.values()))
    assert sample[1] > 0  # n_bytes
    assert 0.0 < sample[3] <= 8.0  # byte_entropy of text bytes


def test_sample_frames_every_second(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    media = attach_fake_media(docs, "text", "doc_id")
    frames = sample_frames(media, every=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    metas = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect()}
    for mid, idxs in by_id.items():
        n = metas[mid]
        assert sorted(idxs) == list(range(0, n, 2))


def test_resize_geometry_invariants(spark):
    """Resize must fit within the box, never upscale, preserve aspect
    ratio within integer truncation, and block-average the pixel
    vector 16 → 4."""
    from web_attack_detection_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
        resize_media,
    )
    from web_attack_detection_spark.io.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    feats = extract_media_features(attach_fake_media(docs, "text", "doc_id"))
    rows = resize_media(feats, 224, 224).collect()
    assert len(rows) == 50
    feats_by_id = {r["media_id"]: r for r in feats.collect()}
    for r in rows:
        assert 1 <= r["out_w"] <= 224 and 1 <= r["out_h"] <= 224
        assert r["out_w"] <= r["width"] and r["out_h"] <= r["height"]  # no upscale
        # aspect preserved within truncation: out ratios bracket the input ratio
        s = min(224 / r["width"], 224 / r["height"], 1.0)
        assert r["out_w"] == max(1, int(r["width"] * s))
        assert r["out_h"] == max(1, int(r["height"] * s))
        px = feats_by_id[r["media_id"]]["pseudo_pixels"]
        want = [sum(px[i * 4 : i * 4 + 4]) // 4 for i in range(4)]
        assert list(r["resized_pixels"]) == want


def test_phash_dedup_finds_planted_copies(spark):
    """mm_phash_dedup: every planted byte-identical copy must appear at
    Hamming 0; all reported pairs respect the radius; and the 64-pixel
    decode variant agrees with the scalar stub chain on its shared
    sample positions (every 16th byte: k=64 position 4j == k=16
    position j)."""
    from web_attack_detection_spark.operators.multimodal import (
        _decode_batch_vectorized,
        decode_image_stub,
    )
    from pyspark.sql import functions as F

    from web_attack_detection_spark.plans.multimodal import mm_phash_dedup

    rows = mm_phash_dedup(spark, SF_SMOKE).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") <= 400)
    planted = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 11 == 0).collect()]
    for i in planted:
        assert got.get((i, i + 500000)) == 0
    assert all(h <= 2 for h in got.values())

    payloads = [t["text"].encode() for t in docs.limit(20).collect()]
    dense = _decode_batch_vectorized(payloads, k=64)
    sparse = [decode_image_stub(p, fake=True) for p in payloads]
    for d, s_ in zip(dense, sparse):
        assert [d[4 * j] for j in range(16)] == s_


def test_phash_dedup_exact_hamming_audit(spark):
    """mm_phash_dedup's in-query audit: the banded pipeline must
    recover EVERY pair of the exact all-pairs Hamming<=2 relation
    (pigeonhole: 2 flipped bits cannot dirty all 4 bands), and the
    audit columns must say so on every row."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    rows = QUERIES["mm_phash_dedup"].fn(spark, SF_SMOKE).collect()
    assert rows, "planted copies must produce pairs"
    for r in rows:
        assert r["audit_recall_exact"] is True
        assert r["n_pairs_banded"] == r["n_pairs_exact"] == len(rows)
        assert r["hamming"] <= 2


def test_extract_features_stats_parity_audit(spark):
    """mm_extract_features' round-6 audit: Python byte stats equal the
    relational recomputation on every row (n_stat_mismatch == 0)."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    rows = QUERIES["mm_extract_features"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["audit_stats_parity"] for r in rows)
    assert all(0 <= r["mean_byte_u6"] <= 255_000_000 for r in rows)
