"""Multimodal-column queries: binary payload metadata (oracle-checked
— byte lengths and frame counts are SQL-visible) + Arrow-batched
feature extraction (rows-only — the pandas UDF path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.operators.multimodal import (
    attach_fake_media,
    extract_media_features,
    sample_frames,
)
from web_attack_detection_spark.plans.registry import register

_MM_META_ORACLE = """
SELECT source,
       COUNT(*) AS n_media,
       SUM(octet_length(encode(text))) AS total_bytes
FROM documents
GROUP BY source
"""


@register("mm_binary_meta", _MM_META_ORACLE, doc="binary payload byte accounting per source")
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column accounting: payload = UTF-8 bytes of the text
    (fixture stand-in for image bytes). octet_length is the SQL-visible
    face of the binary column."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    joined = media.join(
        docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload").cast("long")).alias("total_bytes"),
    )


@register("mm_extract_features", None, doc="Arrow mapInPandas media feature extraction (stub decode)")
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal hot path: binary column → mapInPandas batches →
    per-payload stats + stubbed decode. Rows-only driver check (the
    pandas path has no SQL twin); determinism is unit-tested."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    return extract_media_features(media, fake_decode=True).orderBy("media_id")


@register("mm_frame_sample", None, doc="frame sampling via sequence+explode")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling shape test: explode n_frames, keep every 2nd.
    Rows-only (frame counts derive from xxhash64, not SQL-portable)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    return (
        sample_frames(media, every=2)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.max("n_frames").alias("n_frames"))
        .orderBy("media_id")
    )


@register(
    "mm_resize_sample",
    None,
    doc="aspect-preserving resize plumbing over the decoded feature batch",
)
def mm_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (stubbed, Arrow-batched) → fit-within-224² geometry +
    block-averaged pixel downsample, all column expressions on top of
    the mapInPandas pass — the resize stage adds no Python and no
    shuffle. Rows-only (hash-derived dims have no SQL twin); the
    geometry invariants are unit-tested in test_multimodal.py."""
    from web_attack_detection_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
        resize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    feats = extract_media_features(media)
    return resize_media(feats)
