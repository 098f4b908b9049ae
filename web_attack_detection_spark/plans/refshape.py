"""The reference's ACTUAL workload shape, end to end (VERDICT r2 #1).

``/root/reference/main.py:28-44`` + ``utils/data_preprocessing.py`` is
a 49-column UNSW-NB15 CSV program: four headerless partition files,
files 1/3/4 unioned into train, file 2 as test, dtype-whitelist column
classification, and the 9-stage fit-on-train pipeline. These queries
push exactly that shape through the engine — the fixture CSVs are
synthesized deterministically from ``events`` (io/unsw.py) so the
DuckDB oracle can recompute the prepared output from first principles.

Scale shape: the CSV loaders are one scan per file (explicit schema —
no inference pass); the fit is the standard 2-pass fused pipeline; the
transform is map-only. Nothing here adds a shuffle beyond the fit's
tiny stats aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.functions.feature import (
    classify_columns,
    fit_feature_pipeline,
)
from web_attack_detection_spark.io.unsw import (
    UNSW_SQL_DERIVE,
    load_unsw,
    unsw_fixture_dir,
)
from web_attack_detection_spark.plans.registry import register

# width of the assembled feature vector with the leaky binary `label`
# column DROPPED (the documented divergence): 42 whitelist numerics +
# one-hot slots (size-1 each) for srcip(8) dstip(8) proto(5) state(4)
# service(5) = 42 + 7+7+4+3+4 = 67
_PREPARED_WIDTH = 67

_UNSW_PREPARED_ORACLE = f"""
WITH unsw AS ({UNSW_SQL_DERIVE}),
train AS (SELECT * FROM unsw WHERE __file <> 1),
test  AS (SELECT * FROM unsw WHERE __file = 1),
stats AS (
  SELECT COUNT(*) AS n_tot,
         VAR_SAMP(dur) AS v_dur, COUNT(dur) AS c_dur,
         AVG(ct_flw_http_mthd) AS m_h, VAR_SAMP(ct_flw_http_mthd) AS v_h,
         COUNT(ct_flw_http_mthd) AS c_h
  FROM train
),
labels AS (
  SELECT attack_cat,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, attack_cat ASC) - 1
              AS DOUBLE) AS lbl
  FROM train GROUP BY attack_cat
),
scaled AS (
  SELECT l.lbl AS label,
         t.dur / SQRT(s.v_dur * (s.c_dur - 1) / (s.n_tot - 1)) AS dur_scaled,
         COALESCE(t.ct_flw_http_mthd, s.m_h)
           / SQRT(s.v_h * (s.c_h - 1) / (s.n_tot - 1)) AS h_scaled
  FROM test t JOIN labels l USING (attack_cat) CROSS JOIN stats s
)
SELECT label,
       COUNT(*) AS n,
       {_PREPARED_WIDTH} AS width,
       CAST(SUM(CAST(ROUND(dur_scaled * 1000000) AS BIGINT)) AS BIGINT) AS sdur_scaled,
       CAST(SUM(CAST(ROUND(h_scaled * 1000000) AS BIGINT)) AS BIGINT) AS shttp_scaled
FROM scaled GROUP BY label
"""


@register(
    "ref_unsw_prepared",
    _UNSW_PREPARED_ORACLE,
    doc="reference-shaped UNSW CSV workload: 4-file ingest -> fit-on-train pipeline, prepared test split checked per class",
)
def ref_unsw_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's real preparation (``data_preprocessing.py``) on
    its real input shape: write/read the four headerless 49-column
    partition CSVs, union files 1/3/4 into train, fit the pipeline on
    train with the REFERENCE dtype whitelist, transform the test file,
    and summarize per indexed class: row count, assembled width, and
    integer-scaled sums of two scaled columns (``dur`` exercises the
    scaler; nullable ``ct_flw_http_mthd`` exercises imputer+scaler).

    Divergence (documented, SURVEY.md §1.3): the leaky binary ``label``
    column is dropped before the fit — the reference PCA's it into the
    features. The oracle recomputes everything from first principles
    (freq-desc label indexing, imputed sample variance) in SQL.
    """
    d = unsw_fixture_dir(spark, sf_dir)
    train, test = load_unsw(spark, d)
    model = fit_feature_pipeline(
        train.drop("label"), label_col="attack_cat", reference_compat=True
    )
    prep = model.transform(test.drop("label"))
    return prep.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("features")).cast("int").alias("width"),
        F.sum(F.round(F.col("dur_scaled") * 1000000).cast("long")).alias(
            "sdur_scaled"
        ),
        F.sum(
            F.round(F.col("ct_flw_http_mthd_scaled") * 1000000).cast("long")
        ).alias("shttp_scaled"),
    )


_UNSW_CLASSIFY_ORACLE = """
SELECT 'categorical' AS kind, 5 AS n_cols, TRUE AS ok
UNION ALL
SELECT 'numeric_ref_whitelist', 43, TRUE
UNION ALL
SELECT 'numeric_clean', 42, TRUE
"""


@register(
    "ref_unsw_classify",
    _UNSW_CLASSIFY_ORACLE,
    doc="reference dtype-whitelist classification on the UNSW shape, incl. the label-leak count",
)
def ref_unsw_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 on the reference's real schema: the integer/double whitelist
    sweeps the binary ``label`` into the 43 numerics (the leak —
    SURVEY.md §1.3); dropping it first gives the clean 42. Checked as
    structural counts so the oracle is schema-derived, not data-derived.
    """
    d = unsw_fixture_dir(spark, sf_dir)
    train, _ = load_unsw(spark, d)
    cats, nums = classify_columns(train, "attack_cat", reference_compat=True)
    _, nums_clean = classify_columns(
        train.drop("label"), "attack_cat", reference_compat=True
    )
    rows = [
        ("categorical", len(cats), sorted(cats) == ["dstip", "proto", "service", "srcip", "state"]),
        ("numeric_ref_whitelist", len(nums), "label" in nums),
        ("numeric_clean", len(nums_clean), "label" not in nums_clean),
    ]
    return spark.createDataFrame(rows, "kind string, n_cols int, ok boolean")


# fixed-weight linear scorer for the streaming detection query: plain
# double arithmetic in a FIXED order so Spark and DuckDB produce
# bit-identical logits, with first-max tie-break on both sides
_SCORE_FEATURES = "dur, sload / 1000.0, sttl / 100.0"

_UNSW_STREAM_ORACLE = f"""
WITH unsw AS ({UNSW_SQL_DERIVE}),
test AS (SELECT * FROM unsw WHERE __file = 1),
logits AS (
  SELECT 0.3 - 0.5 * dur + 0.2 * (sttl / 100.0) AS l_normal,
         -0.1 + 0.4 * dur + 0.3 * (sload / 1000.0) AS l_attack,
         0.05 * (sload / 1000.0) + 0.1 * (sttl / 100.0) AS l_suspicious
  FROM test
)
SELECT CASE WHEN l_normal >= l_attack AND l_normal >= l_suspicious THEN 'normal'
            WHEN l_attack >= l_suspicious THEN 'attack'
            ELSE 'suspicious' END AS prediction,
       COUNT(*) AS n
FROM logits GROUP BY 1
"""


@register(
    "ref_unsw_stream_score",
    _UNSW_STREAM_ORACLE,
    doc="streaming attack detection over the UNSW CSV shape: CSV file-source -> map-only scoring -> class counts, oracle-checked",
)
def ref_unsw_stream_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PURPOSE — web attack detection — run the way it
    would deploy: flows arrive as CSV drops (the latent Kafka seam,
    SURVEY §2.1 S3), a fixed fitted model scores each micro-batch
    map-side, and per-class counts aggregate in complete mode. The
    scorer is a fixed-weight linear model over (dur, sload, sttl) so
    the DuckDB oracle reproduces predictions BIT-EXACTLY (same double
    ops in the same order, same first-max tie-break) — streaming
    inference with a full value-level oracle, not rows-only. Scale
    shape: scoring is a stateless projection (no shuffle); the only
    state is |classes| running counts."""
    import uuid as _uuid

    from web_attack_detection_spark.io.unsw import unsw_schema

    d = unsw_fixture_dir(spark, sf_dir)
    # the file stream source wants a directory; glob-filter it down to
    # the test partition file
    stream = (
        spark.readStream.schema(unsw_schema())
        .option("header", "false")
        .option("pathGlobFilter", "UNSW-NB15_2.csv")
        .csv(d)
    )
    dur, sload, sttl = F.col("dur"), F.col("sload"), F.col("sttl")
    l_normal = F.lit(0.3) - F.lit(0.5) * dur + F.lit(0.2) * (sttl / F.lit(100.0))
    l_attack = F.lit(-0.1) + F.lit(0.4) * dur + F.lit(0.3) * (sload / F.lit(1000.0))
    l_susp = F.lit(0.05) * (sload / F.lit(1000.0)) + F.lit(0.1) * (sttl / F.lit(100.0))
    scored = stream.select(
        F.when((l_normal >= l_attack) & (l_normal >= l_susp), "normal")
        .when(l_attack >= l_susp, "attack")
        .otherwise("suspicious")
        .alias("prediction")
    )
    name = f"unsw_score_{_uuid.uuid4().hex[:8]}"
    q = (
        scored.groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).localCheckpoint(eager=True)


# battery prep contract: raw features = the 42 clean whitelist numerics
# assembled as-is; processed features = PCA(k=20) output. Width literals
# pin that structure — a drifted pipeline (leaked label column, changed
# k) breaks the hash match.
_BATTERY_SUMMARY_ORACLE = f"""
WITH unsw AS ({UNSW_SQL_DERIVE}),
train AS (SELECT * FROM unsw WHERE __file <> 1),
test  AS (SELECT * FROM unsw WHERE __file = 1),
labels AS (
  SELECT attack_cat,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, attack_cat ASC) - 1
              AS BIGINT) AS lbl
  FROM train GROUP BY attack_cat
),
splits AS (
  SELECT 'train' AS split, attack_cat FROM train
  UNION ALL
  SELECT 'test', attack_cat FROM test
),
s AS (
  SELECT split,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT l.lbl) AS BIGINT) AS n_classes,
         CAST(SUM(l.lbl) AS BIGINT) AS label_checksum
  FROM splits JOIN labels l USING (attack_cat) GROUP BY split
)
SELECT p.prep, s.split, s.n_rows,
       CAST(p.width AS BIGINT) AS width,
       s.n_classes, s.label_checksum
FROM s CROSS JOIN (
  SELECT 'raw' AS prep, 42 AS width
  UNION ALL SELECT 'processed', 20
) p
"""


@register(
    "ref_unsw_battery_summary",
    _BATTERY_SUMMARY_ORACLE,
    doc="battery prep-stage contract: per (prep, split) row counts, feature widths, label distributions — full oracle",
)
def ref_unsw_battery_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DETERMINISTIC half of ``ref_unsw_battery`` split out under a
    full DuckDB oracle (VERDICT r4 #8): the battery's preparation stage
    (the SAME ``runner.battery_preps`` code path ``run_pipeline``
    executes) summarized per (prep, split) — row counts after the
    fitted-label filter, assembled feature width (42 raw whitelist
    numerics / PCA k=20), class cardinality, and the indexed-label
    checksum (freq-desc rank mapping, exact integers). The
    seeded-iterative model accuracies stay in the rows-only battery;
    everything the fits CONSUME is value-checked here.

    Scale attribution (VERDICT r9 #3, measured at 10x sf0.1): the
    unstaged query's 10x cost split fixture-CSV-synthesis 8.8 s /
    fit 43.7 s / aggregates 8.2 s — the fit and the four summary
    aggregates each RE-PARSED the 49-column headerless CSV.  The
    splits are now parsed ONCE and pinned in the block manager
    (repartition + localCheckpoint — the ELT stage a 100 TB job would
    write to columnar storage), so every later pass reads columnar
    rows: measured 10x 60.7 s -> 35.3 s (fit 43.7 -> 21.5, aggregates
    8.2 -> 1.1; stage itself 4.5).  What remains at 10x is the fixture
    synthesis (8.2 s of serial coalesce(1) CSV writes — fixture
    manufacture, not query work) and the two in-memory fit passes
    (fused stats melt + Arrow Gramian) ending in the O(d^3) driver
    eigensolve.  Every oracle-checked value is an exact integer
    (counts, widths, label checksums), invariant to partitioning."""
    from web_attack_detection_spark.runner import battery_preps

    d = unsw_fixture_dir(spark, sf_dir)
    train, test = load_unsw(spark, d)
    train, test = train.drop("label"), test.drop("label")
    tgt = max(spark.sparkContext.defaultParallelism // 2, 1)
    train = train.repartition(tgt).localCheckpoint()
    test = test.repartition(max(tgt // 4, 1)).localCheckpoint()
    _, nums = classify_columns(train, "attack_cat", reference_compat=True)
    _, preps = battery_preps(
        train,
        test,
        label_col="attack_cat",
        raw_cols=nums,
        pca_k=20,
        reference_compat=True,
    )
    parts = []
    for prep_name, (tr, te) in preps.items():
        for split, df in (("train", tr), ("test", te)):
            parts.append(
                df.filter(F.col("label").isNotNull())
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.max(F.size("features")).cast("long").alias("width"),
                    F.count_distinct("label").cast("long").alias("n_classes"),
                    F.sum(F.col("label").cast("long")).alias("label_checksum"),
                )
                .select(
                    F.lit(prep_name).alias("prep"),
                    F.lit(split).alias("split"),
                    "n_rows",
                    "width",
                    "n_classes",
                    "label_checksum",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "ref_unsw_battery",
    None,
    doc="runner.run_pipeline over the UNSW-shaped CSVs: the reference's whole main() on its real input (rows-only)",
)
def ref_unsw_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 on the reference's real workload shape: the full program —
    4-CSV ingest, raw + processed preparations, timed model battery,
    evaluation, artifacts — via the SAME ``runner.run_pipeline`` code
    path the events workload uses, parameterized by loader/label/
    numeric columns. Rows-only: train_seconds is wall-clock and the
    NB accuracy depends on MLlib internals, but the summary shape
    (model × prep) and accuracy bounds are pytested.

    Profile (round-6 verdict #6, ``tools/profile_battery.py``, sf0.1):
    the wall is the 8 MLlib fits plus the one-time prep fits, not
    shareable re-derivation.  Stage timings (cold session): ingest
    8.5 s (first-touch CSV classload; ~1 s warm), 9-stage pipeline fit
    incl PCA20 10.6 s cold / ~3-4 s warm, per-prep train
    materialization 0.8+1.5 s, then the 4×2 fit+evaluate battery
    ~17 s cold / ~7 s warm (mlp and logreg are the iterative
    expensive ones; NB's single-pass fit is ~0.6 s).  The preps are
    computed ONCE by ``battery_preps`` and cached per prep before the
    fits, so the only candidate restructure — sharing prepared
    features across model variants — is already the shape; caching
    the CSV train for the fused fit was separately measured SLOWER
    (7.3 vs 8.7 s, round-5 note).  No restructure warranted.
    """
    import tempfile

    from web_attack_detection_spark.runner import run_pipeline

    def loader(s: SparkSession, sd: str):
        d = unsw_fixture_dir(s, sd)
        train, test = load_unsw(s, d)
        return train.drop("label"), test.drop("label")

    train, _ = loader(spark, sf_dir)
    _, nums = classify_columns(train, "attack_cat", reference_compat=True)
    with tempfile.TemporaryDirectory() as out:
        return run_pipeline(
            spark,
            sf_dir,
            out_dir=out,
            models=("nb",),
            pca_k=20,
            loader=loader,
            label_col="attack_cat",
            numeric_raw=nums,
            reference_compat=True,
        )
