"""In-engine distributed TRAINING of the reference's sequence-model zoo
(M2 Conv1D / M3 SimpleRNN / M4 LSTM).

Rounds 1-3 drew the boundary at "inference in-engine, training
out-of-engine" because TensorFlow has no install path in this image.
These queries close the gap without TF: :mod:`ml.train` implements each
architecture's numpy backward pass (finite-difference-checked in
tests/test_train.py) and trains with the MLlib-style
iterate-with-distributed-gradient loop — per epoch, one cached-scan
``mapInPandas`` produces per-partition gradient partials, a chunked
``applyInPandas`` reduce sums them (shuffling only ``partitions ×
params`` doubles, never rows), and the driver applies a momentum-SGD
step.  Reference architectures: ``/root/reference/models/
cnn_model.py:19-40``, ``rnn_model.py:17-34``, ``lstm_model.py:17-34``;
the reference's ``StandardScaler``-before-net prep
(``preprocessing/data_preprocessing.py``) is mirrored by the
fit-on-train per-position standardization here.

The task is a deterministic, architecture-agnostic probe: label each
embedding by the argmax of its four 16-dim block means (linear in the
input, so every architecture's dense head can learn it), split
train/test on ``vec_id % 4``, train a few full-batch epochs, and score
the held-out split DISTRIBUTED through ``sequence_scorer`` (the same
``predict_batch_udf`` path the M2-M4 inference queries use — proving
train-in-engine -> score-anywhere with one parameter dict).

Rows-only driver check (trained weights have no SQL twin — SURVEY.md §5
item 2); the hard assertions (gradient checks, distributed==local
gradient parity, learnability above the majority baseline) live in
tests/test_train.py.

Cost note (bench): these are the slowest registry entries after
ref_unsw_battery, and for the same reason — the wall is model compute
(10 sequential epochs; LSTM BPTT measured ~1.5 s/epoch at 1 200 rows
regardless of 8/16/32-way partitioning) plus the per-epoch job floor,
not plan waste. The Spark side per epoch is one cached scan and an
O(model) partial reduce; `tools/scale_probe_train.py` shows 50× rows →
3.5× epoch wall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

_N_CLASSES = 4
_SEQ_LEN = 64
_BLOCK = _SEQ_LEN // _N_CLASSES
_EPOCHS = 10
_LR = {"cnn": 0.12, "rnn": 0.2, "lstm": 0.3}
# cap the train set so the python-loop BPTT stays a fixed, small cost
# at any SF (the loop is a demo of the TRAINING dataflow, whose Spark
# cost is O(model) per epoch — see ml/train.py scale notes)
_MAX_TRAIN = 1200


def _block_label():
    """argmax over the four 16-dim block means of the raw embedding —
    computed BEFORE standardization so the labels are independent of
    the train split."""
    block_means = F.array(
        *[
            F.aggregate(
                F.slice("seq", k * _BLOCK + 1, _BLOCK), F.lit(0.0), lambda a, x: a + x
            )
            for k in range(_N_CLASSES)
        ]
    )
    return (F.array_position(block_means, F.array_max(block_means)) - 1).cast("int")


def _standardizer(train_df):
    """Fit per-position mean/std on the TRAIN split (posexplode →
    one tiny agg of seq_len rows), return a column fn applying
    (x - mean) / std via zip_with literal arrays — map-only at apply
    time, exactly like the feature pipeline's scaler."""
    stats = (
        train_df.select(F.posexplode("seq").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd"))
        .collect()
    )
    mu = [0.0] * _SEQ_LEN
    sd = [1.0] * _SEQ_LEN
    for r in stats:
        mu[r["pos"]] = r["mu"]
        sd[r["pos"]] = r["sd"] if r["sd"] and r["sd"] > 0 else 1.0
    mu_c = F.array(*[F.lit(v) for v in mu])
    sd_c = F.array(*[F.lit(v) for v in sd])

    def apply(col):
        return F.zip_with(
            F.zip_with(col, mu_c, lambda a, m: a - m), sd_c, lambda a, s: a / s
        )

    return apply


def _train_eval(spark: SparkSession, sf_dir: str, arch: str) -> DataFrame:
    from web_attack_detection_spark.ml.inference import sequence_scorer
    from web_attack_detection_spark.ml.train import (
        FORWARD_FNS,
        fit_sequence_net,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("seq")
    )
    labeled = emb.select("vec_id", "seq", _block_label().alias("label"))
    train = labeled.filter(F.col("vec_id") % 4 != 1)
    # deterministic hash down-sample to ~_MAX_TRAIN rows at any SF:
    # the python-loop BPTT cost stays fixed while the Spark dataflow
    # (cached scan + partial shuffle) is what actually scales
    n_all = train.count()
    if n_all > _MAX_TRAIN:
        keep = int(10_000 * _MAX_TRAIN / n_all)
        train = train.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(10_000)) < F.lit(keep)
        )
    test = labeled.filter(F.col("vec_id") % 4 == 1)

    std = _standardizer(train)
    tr = (
        train.select("vec_id", std(F.col("seq")).alias("seq"), "label")
        .repartition(16, "vec_id")  # stable hash partitioning -> the
        # chunk reduce sums partials in a deterministic partition order
        .cache()
    )
    n_train = tr.count()
    params, hist = fit_sequence_net(
        tr,
        arch,
        _SEQ_LEN,
        _N_CLASSES,
        epochs=_EPOCHS,
        lr=_LR[arch],
        seed=42,
    )
    tr.unpersist()

    scorer = sequence_scorer(FORWARD_FNS[arch], params, _SEQ_LEN)
    scored = test.select(
        "label", scorer(std(F.col("seq"))).alias("probs")
    ).select(
        "label",
        (F.array_position(F.col("probs"), F.array_max("probs")) - 1)
        .cast("int")
        .alias("prediction"),
    )
    per_label = scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("prediction") == F.col("label")).cast("long")).alias("nc"),
    )
    return per_label.agg(
        F.lit(n_train).alias("n_train"),
        F.sum("n").alias("n_test"),
        F.round(F.lit(hist[0]), 6).alias("init_loss"),
        F.round(F.lit(hist[-1]), 6).alias("final_loss"),
        F.round(F.lit((hist[0] - hist[-1]) / hist[0] * 100.0), 2).alias(
            "loss_drop_pct"
        ),
        F.round(F.sum("nc") / F.sum("n"), 6).alias("test_accuracy"),
        F.round(F.max("n") / F.sum("n"), 6).alias("majority_share"),
    )


@register(
    "ml_cnn_train_dist",
    None,
    doc="Conv1D stack trained IN-ENGINE: distributed numpy backprop, momentum SGD",
)
def ml_cnn_train_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 training in-engine (reference cnn_model.py:19-40, trained
    there with Keras/TF): numpy backprop through
    Conv1D(32/64/128)+pool -> Dense(128) -> softmax, gradients
    aggregated across executors per epoch, momentum SGD on the driver.
    Gradient correctness is finite-difference-checked; the distributed
    gradient equals the single-process one to 1e-9
    (tests/test_train.py)."""
    return _train_eval(spark, sf_dir, "cnn")


@register(
    "ml_rnn_train_dist",
    None,
    doc="SimpleRNN stack trained IN-ENGINE: distributed BPTT, momentum SGD",
)
def ml_rnn_train_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 training in-engine (reference rnn_model.py:17-34): full BPTT
    through SimpleRNN(64, seq) -> SimpleRNN(128) -> Dense(64) ->
    softmax. See ml_cnn_train_dist."""
    return _train_eval(spark, sf_dir, "rnn")


@register(
    "ml_lstm_train_dist",
    None,
    doc="LSTM stack trained IN-ENGINE: distributed BPTT, momentum SGD",
)
def ml_lstm_train_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 training in-engine (reference lstm_model.py:17-34): full BPTT
    through LSTM(64, seq) -> LSTM(128) -> Dense(64) -> softmax, Keras
    unit-forget-bias init. See ml_cnn_train_dist."""
    return _train_eval(spark, sf_dir, "lstm")


# ---------------------------------------------------------------------------
# model transpilation: trained weights compiled into Catalyst expressions
# ---------------------------------------------------------------------------


def transpile_linear_softmax(coef, intercept, features_col: str):
    """Compile a fitted linear multiclass model into pure Catalyst
    expressions: per-class margin columns ``intercept_k + sum_j
    coef[k][j] * features[j]`` and an argmax prediction.  The scoring
    subplan is whole-stage-codegen JVM — no Python worker, no Arrow
    hop, no model object on the executors; the model ships as literals
    INSIDE the plan (asserted in tests/test_train.py).  This is the
    production serving shape for linear models at 100 TB: scoring
    cost is the same as any projection, and predicate pushdown /
    column pruning still apply around it."""
    margins = F.array(
        *[
            sum(
                [F.lit(float(c)) * F.element_at(features_col, j + 1) for j, c in enumerate(row)],
                F.lit(float(b)),
            )
            for row, b in zip(coef, intercept)
        ]
    )
    pred = (F.array_position(margins, F.array_max(margins)) - 1).cast("double")
    return margins, pred


@register(
    "ml_logreg_transpiled",
    None,
    doc="fitted logreg transpiled to Catalyst expressions; in-query parity vs MLlib transform",
)
def ml_logreg_transpiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-transpile: fit MLlib multinomial logistic regression
    (the reference battery's convex baseline), then compile its
    coefficient matrix into the plan via
    :func:`transpile_linear_softmax` and score the held-out split
    twice — MLlib ``model.transform`` (JVM vector path) and the
    transpiled expressions (codegen path) — auditing argmax agreement
    IN-QUERY.  Proves the serving story end to end: a model fitted by
    the engine can be served by ANY Spark cluster as plain SQL
    expressions, no MLlib runtime or Python needed at score time.
    Returns one row: (n_rows, n_agree, accuracy_mllib,
    accuracy_transpiled)."""
    from pyspark.ml.classification import LogisticRegression

    from web_attack_detection_spark.functions.feature import fit_feature_pipeline
    from web_attack_detection_spark.ml.pipeline import to_vector

    events = load_table(spark, sf_dir, "events").drop("props", "ts")
    train = events.filter(F.col("event_id") % 4 != 1)
    test = events.filter(F.col("event_id") % 4 == 1)
    fp = fit_feature_pipeline(train, label_col="event_type")
    tr = to_vector(
        fp.transform(train).select("features", "label"), "features", "fv"
    ).cache()
    tr.count()
    model = LogisticRegression(
        featuresCol="fv", labelCol="label", maxIter=25, regParam=0.01,
        family="multinomial",
    ).fit(tr)
    tr.unpersist()

    coef = model.coefficientMatrix.toArray()
    intercept = model.interceptVector.toArray()
    margins, pred_t = transpile_linear_softmax(coef, intercept, "features")

    te = to_vector(fp.transform(test).select("features", "label"), "features", "fv")
    both = (
        model.transform(te)
        .select("label", "features", F.col("prediction").alias("pred_mllib"))
        .withColumn("pred_transpiled", pred_t)
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("pred_mllib") == F.col("pred_transpiled")).cast("long")).alias(
            "n_agree"
        ),
        F.round(
            F.avg((F.col("pred_mllib") == F.col("label")).cast("double")), 6
        ).alias("accuracy_mllib"),
        F.round(
            F.avg((F.col("pred_transpiled") == F.col("label")).cast("double")), 6
        ).alias("accuracy_transpiled"),
    )
