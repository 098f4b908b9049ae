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
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
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


# n_frames = (octet_length + id) % 8 + 1 (attach_fake_media); sampling
# every 2nd frame from 0..n-1 keeps floor((n+1)/2) frames.
_MM_FRAMES_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST((octet_length(encode(text)) + doc_id) % 8 + 1 AS INTEGER) AS n_frames
  FROM documents
)
SELECT media_id,
       CAST(floor((n_frames + 1) / 2.0) AS BIGINT) AS n_sampled,
       n_frames
FROM m
ORDER BY media_id
"""


@register("mm_frame_sample", _MM_FRAMES_ORACLE, doc="frame sampling via sequence+explode")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode n_frames, keep every 2nd. Fully
    oracle-checked since the fake metadata became portable arithmetic —
    the oracle recomputes the expected kept-frame count per media row."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    return (
        sample_frames(media, every=2)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.max("n_frames").alias("n_frames"))
        .orderBy("media_id")
    )


# geometry twin of resize_media: scale = min(224/w, 224/h, 1), floor,
# clamp at 1 — identical double math in both engines.
_MM_RESIZE_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST((octet_length(encode(text)) * 7 + doc_id) % 640 + 16 AS INTEGER) AS width,
         CAST((octet_length(encode(text)) * 13 + doc_id * 3) % 480 + 16 AS INTEGER) AS height
  FROM documents
),
s AS (
  SELECT *, least(224.0 / width, 224.0 / height, 1.0) AS scale FROM m
)
SELECT media_id, width, height,
       CAST(greatest(1, floor(width * scale)) AS INTEGER) AS out_w,
       CAST(greatest(1, floor(height * scale)) AS INTEGER) AS out_h
FROM s
"""


@register(
    "mm_resize_sample",
    _MM_RESIZE_ORACLE,
    doc="aspect-preserving resize plumbing over the decoded feature batch",
)
def mm_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (stubbed, Arrow-batched) → fit-within-224² geometry +
    block-averaged pixel downsample, all column expressions on top of
    the mapInPandas pass — the resize stage adds no Python and no
    shuffle. The registered output is the GEOMETRY (oracle-checked
    against the same double math in DuckDB); the resized pseudo-pixel
    block rides the same plan but has no SQL twin (FNV-chain decode),
    so its invariants stay unit-tested in test_multimodal.py."""
    from web_attack_detection_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
        resize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    feats = extract_media_features(media)
    return resize_media(feats).select("media_id", "width", "height", "out_w", "out_h")


# chunk starts: sequence(0, max(dur-400, 0), 200) — n = floor(g/200)+1,
# last = 200*floor(g/200), covering the short-clip (dur < window) case
# with a single formula. Same arithmetic in both engines.
_MM_AUDIO_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) * 2 AS BIGINT) AS duration_ms
  FROM documents
),
g AS (
  SELECT media_id, duration_ms,
         greatest(duration_ms - 400, 0) AS reach
  FROM m
)
SELECT media_id, duration_ms,
       CAST(floor(reach / 200.0) + 1 AS BIGINT) AS n_chunks,
       CAST(200 * floor(reach / 200.0) AS BIGINT) AS last_start_ms
FROM g
"""


@register(
    "mm_audio_chunks",
    _MM_AUDIO_ORACLE,
    doc="audio-style sliding-window chunking (400ms window / 200ms hop) over binary media",
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASR-training chunking plumbing: each binary payload is treated as
    fixed-rate audio (duration = 2 ms/byte, a portable stand-in for the
    sample-rate metadata a real decoder provides), windowed into
    overlapping 400 ms chunks at a 200 ms hop via ``sequence`` +
    ``explode`` — pure column expressions, no UDF; the real byte-slice
    per chunk swaps in where the start offsets are computed. The
    explode factor is duration/hop: at 100 TB pick the hop the trainer
    consumes, never re-chunk twice. Oracle recomputes the chunk count
    and final start offset arithmetically."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "text", "doc_id")
    dur = (F.octet_length("payload") * 2).cast("long")
    chunks = media.select(
        "media_id",
        dur.alias("duration_ms"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(dur - 400, F.lit(0).cast("long")),
                F.lit(200).cast("long"),
            )
        ).alias("start_ms"),
    )
    return chunks.groupBy("media_id", "duration_ms").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("start_ms").alias("last_start_ms"),
    )


@register(
    "mm_phash_dedup",
    None,
    doc="perceptual-hash image dedup: DCT phash + banded Hamming pairs (stub decode)",
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection end-to-end: fake-decode → 4×4 DCT
    pHash (mapInPandas, batched einsum) → nibble-banded candidate join
    → exact Hamming verify. The corpus is the documents-derived fake
    media plus planted byte-identical copies (shifted ids) — the only
    duplicates the non-locality-sensitive stand-in decode can surface;
    a real decoder slots into the same pipeline and the banding then
    finds perturbed near-copies too (operators/multimodal.phash_media).
    Rows-only: a DCT inside mapInPandas has no SQL twin. Planted-pair
    recovery + scalar/vectorized decode equivalence are pytested."""
    from web_attack_detection_spark.io.sources import union_by_name
    from web_attack_detection_spark.operators.multimodal import (
        attach_fake_media,
        phash_media,
        phash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 400)
    base = docs.select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    media = attach_fake_media(union_by_name(base, planted), "text", "doc_id")
    hashed = phash_media(media)
    return phash_near_dup_pairs(hashed, max_hamming=2).orderBy("id_a", "id_b")
