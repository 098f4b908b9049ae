"""In-engine distributed TRAINING of the reference's sequence-model zoo
(M2 Conv1D / M3 SimpleRNN / M4 LSTM).

Rounds 1-3 drew the boundary at "inference in-engine, training
out-of-engine" because TensorFlow has no install path in this image.
These queries close the gap without TF: :mod:`ml.train` implements each
architecture's numpy backward pass (finite-difference-checked in
tests/test_train.py) and trains under the REFERENCE'S OWN PROTOCOL
(``mlp_model.py:10-15,67-81``, identical across the model zoo):
Adam(lr=1e-3, Keras defaults), minibatch 64, up to 50 epochs,
EarlyStopping(monitor=val_loss, patience=5, restore_best_weights),
validating on the test split exactly as ``main.py:83,100`` does.
Each minibatch step is one synchronous data-parallel gradient — a
cached-scan ``mapInPandas`` over the batch's hash shard produces
per-partition gradient partials, a chunked reduce sums them
(shuffling only ``partitions × params`` doubles, never rows), and the
driver applies the Adam step (the per-batch allreduce dataflow
Horovod runs under Keras).  Reference architectures:
``/root/reference/models/
cnn_model.py:19-40``, ``rnn_model.py:17-34``, ``lstm_model.py:17-34``;
the reference's ``StandardScaler``-before-net prep
(``preprocessing/data_preprocessing.py``) is mirrored by the
fit-on-train per-position standardization here.

The task is a deterministic, architecture-agnostic probe: label each
embedding by the argmax of its four (_SEQ_LEN/4)-dim block means
(8-dim at the current L=32 slice; linear in the
input, so every architecture's dense head can learn it), split
train/test on ``vec_id % 4``, train under the reference protocol
until EarlyStopping fires, and score
the held-out split DISTRIBUTED through ``sequence_scorer`` (the same
``predict_batch_udf`` path the M2-M4 inference queries use — proving
train-in-engine -> score-anywhere with one parameter dict).

Rows-only driver check (trained weights have no SQL twin — SURVEY.md §5
item 2); the hard assertions (gradient checks, distributed==local
gradient parity, learnability above the majority baseline) live in
tests/test_train.py.

Execution: batch-64 SGD is a serial chain of updates, so the queries
run the protocol in FUSED mode — one ``mapInPandas`` job streams the
(hash-capped) train shard into a single task that runs the whole
minibatch/early-stop loop with the (bounded) validation sample
broadcast, emitting O(model) output; per-step allreduce exists as the
large-batch mode and is trajectory-parity-tested (ml/train.py).

Cost note (bench): these are among the slowest registry entries —
the wall is the serial numpy minibatch chain (9-27 epochs x ~6 batch
gradients + one val forward), not plan waste.
`tools/scale_probe_train_query.py` shows per-epoch cost stays flat
at 10x corpus volume (train and val are bounded samples; only the
parallel scans and the distributed held-out scoring grow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table, parallelize_scan
from web_attack_detection_spark.plans.registry import register

_N_CLASSES = 4
# the probe trains on the first 32 dims of the 64-dim embedding:
# BPTT cost is linear in sequence length and the architectures are
# length-agnostic (Keras input_shape=(seq_len, 1)), so the shorter
# probe sequence keeps the serial minibatch protocol inside bench
# budget without touching the model zoo; at L=32 every architecture
# still early-stops with held-out accuracy 0.69-0.75 vs 0.27 majority
_SEQ_LEN = 32
_BLOCK = _SEQ_LEN // _N_CLASSES
# Reference training protocol (mlp_model.py:10-15,67-81; identical in
# cnn/rnn/lstm_model.py): Adam(lr=1e-3, Keras defaults), batch 64,
# epochs<=50, EarlyStopping(val_loss, patience=5, restore_best).  The
# reference passes its TEST split as validation_data
# (main.py:83,100) — mirrored here.
_EPOCHS = 50
_LR = 1e-3
_BATCH = 64
_PATIENCE = 5
# reference dropout rates per architecture (cnn_model.py:33,
# rnn_model.py:21,23, lstm_model.py:21,23, mlp_model.py:21,23)
_DROPOUT = {"cnn": 0.5, "rnn": 0.3, "lstm": 0.3, "mlp": 0.3}
# cap the train set so the python-loop BPTT stays a fixed, small cost
# at any SF (the loop is a demo of the TRAINING dataflow, whose Spark
# cost is O(model) per epoch — see ml/train.py scale notes).  384 rows
# = 6 hash-shards of ~64; measured stop epochs 9-17 across the three
# architectures, so every run demonstrates a genuine early stop.
_MAX_TRAIN = 384
# EarlyStopping's monitor is a BOUNDED validation sample: at every
# fixture SF the whole test split fits under the cap, so behavior is
# exactly the reference's (validation_data = the test split); past the
# cap (the 10x scale probe, a real corpus) the monitor sees a
# deterministic hash sample — per-epoch validation cost must not grow
# with corpus volume (tools/scale_probe_train_query.py measured the
# LSTM's serial val forward dominating at 10x under a 2000 cap; 500
# keeps the monitor sample = the full fixture test split AND flat)
_MAX_VAL = 500


def _block_label():
    """argmax over the four _BLOCK-dim (= _SEQ_LEN/4, currently 8-dim)
    block means of the sliced embedding —
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
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, _SEQ_LEN).alias("seq"),
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
    # the reference validates on its TEST split (main.py:83,100);
    # cached because EarlyStopping scores it once per epoch, and
    # hash-bounded so the per-epoch monitor cost is corpus-independent
    val_base = test
    n_test_all = test.count()
    if n_test_all > _MAX_VAL:
        vkeep = int(10_000 * _MAX_VAL / n_test_all)
        val_base = test.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(10_000)) < F.lit(vkeep)
        )
    val = val_base.select(std(F.col("seq")).alias("seq"), "label").cache()
    params, hist = fit_sequence_net(
        tr,
        arch,
        _SEQ_LEN,
        _N_CLASSES,
        epochs=_EPOCHS,
        lr=_LR,
        clip_norm=0.0,  # the reference's Adam runs unclipped
        seed=42,
        optimizer="adam",
        batch_size=_BATCH,
        val_df=val,
        patience=_PATIENCE,
        # batch 64 is below the allreduce payoff point (a per-step
        # cluster round-trip costs more than the 64-row gradient);
        # the fused mode runs the identical protocol loop inside one
        # task with O(model) egress — see ml/train._fit_protocol_fused
        exec_mode="fused",
        # the reference's train-time regularization, architecture-
        # faithful rates: cnn_model.py:33 p=0.5 after Dense(128);
        # rnn/lstm_model.py:21,23 p=0.3 after each recurrent layer
        dropout=_DROPOUT[arch],
    )
    tr.unpersist()

    scorer = sequence_scorer(FORWARD_FNS[arch], params, _SEQ_LEN)
    # test derives from the unsplittable single-row-group scan (1
    # partition): spread the numpy forward across cores (guide §2.5;
    # io.sources.parallelize_scan — no-op on splittable inputs, output
    # partitioning-invariant: per-row scoring + integer confusion sums)
    test = parallelize_scan(spark, test)
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
    out = per_label.agg(
        F.lit(float(_DROPOUT[arch])).alias("dropout"),
        F.lit(n_train).alias("n_train"),
        F.sum("n").alias("n_test"),
        F.lit(len(hist["loss"])).alias("epochs_run"),
        F.lit(hist["best_epoch"]).alias("best_epoch"),
        F.lit(hist["early_stopped"]).alias("early_stopped"),
        F.round(F.lit(hist["loss"][0]), 6).alias("first_epoch_loss"),
        F.round(F.lit(hist["loss"][-1]), 6).alias("final_train_loss"),
        F.round(F.lit(min(hist["val_loss"])), 6).alias("best_val_loss"),
        F.round(F.sum("nc") / F.sum("n"), 6).alias("test_accuracy"),
        F.round(F.max("n") / F.sum("n"), 6).alias("majority_share"),
    )
    val.unpersist()
    return out


@register(
    "ml_cnn_train_dist",
    None,
    doc="Conv1D stack trained IN-ENGINE: reference protocol (Adam, batch 64, early stop)",
)
def ml_cnn_train_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 training in-engine (reference cnn_model.py:19-40, trained
    there with Keras/TF): numpy backprop through
    Conv1D(32/64/128)+pool -> Dense(128) -> softmax, trained under
    the REFERENCE'S protocol (cnn_model.py:74-81): Adam(1e-3),
    minibatch 64 (per-epoch deterministic hash shards, one synchronous
    data-parallel gradient per batch), EarlyStopping(val_loss,
    patience=5, restore-best), <=50 epochs, validating on the test
    split exactly as main.py:83,100 does.  Gradient correctness is
    finite-difference-checked; the distributed gradient equals the
    single-process one to 1e-9 (tests/test_train.py)."""
    return _train_eval(spark, sf_dir, "cnn")


@register(
    "ml_rnn_train_dist",
    None,
    doc="SimpleRNN stack trained IN-ENGINE: reference protocol (Adam, batch 64, early stop)",
)
def ml_rnn_train_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 training in-engine (reference rnn_model.py:17-34): full BPTT
    through SimpleRNN(64, seq) -> SimpleRNN(128) -> Dense(64) ->
    softmax. See ml_cnn_train_dist."""
    return _train_eval(spark, sf_dir, "rnn")


@register(
    "ml_lstm_train_dist",
    None,
    doc="LSTM stack trained IN-ENGINE: reference protocol (Adam, batch 64, early stop)",
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


# Pinned serving model for the oracle-checked half of
# ml_logreg_transpiled: INTEGER coefficients over integer-exact raw
# features, so every margin is an exact BIGINT in both engines and
# the argmax (first-max rule) is engine-deterministic. Classes are
# the stable event_type domain, alphabetical.
_PIN_CLASSES = ["click", "error", "purchase", "signup", "view"]
_PIN_COEF = [
    [2, -1, 3],
    [-3, 2, 1],
    [1, 3, -2],
    [-1, -2, -3],
    [3, 1, 2],
]
_PIN_INTERCEPT = [5, -7, 11, 0, -3]

# x1/x2/x3: integer-exact raw features (same expressions in both
# engines); the CASE chain replicates array_position's first-max rule
_PIN_FEATS_SQL = (
    "(CAST(ROUND(value * 100) AS BIGINT) % 128) AS x1, "
    "(user_id % 97) AS x2, (event_id % 13) AS x3"
)


def _pinned_oracle() -> str:
    margins = [
        f"({b} + {c[0]}*x1 + {c[1]}*x2 + {c[2]}*x3) AS m{k}"
        for k, (c, b) in enumerate(zip(_PIN_COEF, _PIN_INTERCEPT))
    ]
    n = len(_PIN_COEF)
    cases = []
    for k in range(n - 1):
        rest = ", ".join(f"m{j}" for j in range(k + 1, n))
        gt = f"GREATEST({rest})" if k < n - 2 else f"m{n-1}"
        cases.append(f"WHEN m{k} >= {gt} THEN {k}")
    case = "CASE " + " ".join(cases) + f" ELSE {n-1} END"
    label = (
        "CASE "
        + " ".join(
            f"WHEN event_type = '{c}' THEN {k}"
            for k, c in enumerate(_PIN_CLASSES)
        )
        + " END"
    )
    counts = ", ".join(
        f"CAST(SUM(CASE WHEN pred = {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_pred_{c}"
        for k, c in enumerate(_PIN_CLASSES)
    )
    return f"""
WITH te AS (
  SELECT event_type, {_PIN_FEATS_SQL}
  FROM events WHERE event_id % 4 = 1
),
m AS (SELECT event_type, {", ".join(margins)} FROM te),
p AS (SELECT event_type, {case} AS pred, {label} AS lbl FROM m)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS transpiled_equals_mllib,
       {counts},
       ROUND(SUM(CASE WHEN pred = lbl THEN 1 ELSE 0 END)
             / (1.0 * COUNT(*)), 6) AS acc_pinned
FROM p
"""


@register(
    "ml_logreg_transpiled",
    _pinned_oracle(),
    doc="logreg transpiled to Catalyst expressions: pinned-model serving FULL oracle + fitted-model parity audit",
)
def ml_logreg_transpiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-transpile, FULLY oracle-checked since round 7
    (VERDICT r6 #5; rows-only before).  Two halves in one row:

    - SERVING (oracle-exact): a PINNED integer-coefficient multiclass
      linear model (`_PIN_COEF`) compiled through the same
      :func:`transpile_linear_softmax` codegen path scores the test
      split on integer-exact raw features — every margin is a BIGINT
      in disguise (integer-valued doubles < 2^53), so per-class
      prediction counts and accuracy match DuckDB bit-for-bit, and
      array_position's first-max tie rule is replicated by the
      oracle's CASE chain.
    - FITTED (in-query audit): MLlib multinomial logistic regression
      is fitted as before, its coefficient matrix transpiled, and the
      held-out split scored BOTH ways (model.transform JVM vector path
      vs transpiled codegen path); ``transpiled_equals_mllib`` pins
      row-for-row argmax agreement (the oracle asserts TRUE — a broken
      transpilation hash-mismatches the driver compare).

    Proves the serving story end to end: a model fitted by the engine
    can be served by ANY Spark cluster as plain SQL expressions, no
    MLlib runtime or Python needed at score time."""
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
    fit_audit = both.agg(
        (
            F.sum(
                (F.col("pred_mllib") == F.col("pred_transpiled")).cast("long")
            )
            == F.count(F.lit(1))
        ).alias("transpiled_equals_mllib")
    )

    # pinned-model serving half (the oracle-exact relation): same
    # transpile codegen path, integer coefficients, raw features
    pin_feats = test.select(
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT) % 128").alias("x1"),
        F.expr("user_id % 97").alias("x2"),
        F.expr("event_id % 13").alias("x3"),
    ).withColumn(
        "rawf",
        F.array(
            F.col("x1").cast("double"),
            F.col("x2").cast("double"),
            F.col("x3").cast("double"),
        ),
    )
    _, pred_pin = transpile_linear_softmax(_PIN_COEF, _PIN_INTERCEPT, "rawf")
    lbl = F.coalesce(
        *[
            F.when(F.col("event_type") == c, F.lit(k))
            for k, c in enumerate(_PIN_CLASSES)
        ]
    )
    scored_pin = pin_feats.select(
        pred_pin.cast("int").alias("pred"), lbl.alias("lbl")
    )
    return (
        scored_pin.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.sum((F.col("pred") == k).cast("long")).alias(f"n_pred_{c}")
                for k, c in enumerate(_PIN_CLASSES)
            ],
            F.round(
                F.sum((F.col("pred") == F.col("lbl")).cast("long"))
                / (F.lit(1.0) * F.count(F.lit(1))),
                6,
            ).alias("acc_pinned"),
        )
        .crossJoin(F.broadcast(fit_audit))
        .select(
            "n_rows",
            "transpiled_equals_mllib",
            *[f"n_pred_{c}" for c in _PIN_CLASSES],
            "acc_pinned",
        )
    )


@register(
    "ml_mlp_train_protocol",
    None,
    doc="reference M1 MLP (256/128/64) trained IN-ENGINE under the exact reference protocol",
)
def ml_mlp_train_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 under the REFERENCE'S OWN training procedure, in-engine.

    ``ml_mlp_train_eval`` trains MLlib's MLP (L-BFGS, no minibatches,
    no early stopping) — the distributed-convex stand-in.  This query
    closes the remaining M1 protocol gap: the reference's exact stack
    (``mlp_model.py:19-26``: Dense(256) -> Dense(128) -> Dense(64) ->
    softmax, hidden ReLU) trained with Adam(1e-3, Keras defaults),
    minibatch 64, EarlyStopping(val_loss, patience=5, restore-best),
    <=50 epochs, validating on the test split as ``main.py:83`` does —
    through the same `_protocol_loop`/fused execution the M2-M4
    trainers use (ml/train.py).  Features come from the fitted feature
    pipeline (F7), train hash-capped like the other trainers; the
    held-out split is scored DISTRIBUTED via ``sequence_scorer``.
    Dropout(0.3) after the first two hidden layers runs as in the
    reference (mlp_model.py:21,23) — inverted dropout, masks seeded
    per (seed, epoch, step), FD-checked with a held mask in
    tests/test_train.py; the ``dropout`` config column below exposes
    the rate.

    The events labels are synthetic noise vs these features, so the
    honest outcome is val-loss plateau -> a fast early stop with
    accuracy at the majority baseline; the PROTOCOL mechanics (shards,
    Adam trajectory, restore-best) are what the battery of
    tests/test_train.py pins."""
    from web_attack_detection_spark.functions.feature import fit_feature_pipeline
    from web_attack_detection_spark.ml.inference import sequence_scorer
    from web_attack_detection_spark.ml.train import FORWARD_FNS, fit_sequence_net

    events = load_table(spark, sf_dir, "events").drop("props", "ts")
    train = events.filter(F.col("event_id") % 4 != 1)
    test = events.filter(F.col("event_id") % 4 == 1)
    fp = fit_feature_pipeline(train, label_col="event_type")
    tr_all = fp.transform(train).select(
        F.col("event_id").alias("vec_id"), F.col("features").alias("seq"), "label"
    )
    n_all = tr_all.count()
    cap = 1024  # 16 hash-shards of ~64 — MLP steps are cheap
    if n_all > cap:
        keep = int(10_000 * cap / n_all)
        tr_all = tr_all.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(10_000)) < F.lit(keep)
        )
    tr = tr_all.repartition(8, "vec_id").cache()
    n_train = tr.count()
    width = len(tr.select("seq").first()["seq"])
    n_classes = len(fp.label_model)  # fitted label map (O(classes))

    te = fp.transform(test).select(F.col("features").alias("seq"), "label")
    n_test_all = te.count()
    val_base = te
    if n_test_all > _MAX_VAL:
        vkeep = int(10_000 * _MAX_VAL / n_test_all)
        val_base = fp.transform(
            test.filter(F.pmod(F.xxhash64("event_id"), F.lit(10_000)) < F.lit(vkeep))
        ).select(F.col("features").alias("seq"), "label")
    val = val_base.cache()

    params, hist = fit_sequence_net(
        tr,
        "mlp",
        width,
        n_classes,
        epochs=_EPOCHS,
        lr=_LR,
        clip_norm=0.0,
        seed=42,
        optimizer="adam",
        batch_size=_BATCH,
        val_df=val,
        patience=_PATIENCE,
        exec_mode="fused",
        dropout=0.3,  # mlp_model.py:21,23
    )
    tr.unpersist()

    scorer = sequence_scorer(FORWARD_FNS["mlp"], params, width)
    te = parallelize_scan(spark, te)  # same single-row-group remedy as _train_eval
    scored = te.select("label", scorer(F.col("seq")).alias("probs")).select(
        "label",
        (F.array_position(F.col("probs"), F.array_max("probs")) - 1)
        .cast("int")
        .alias("prediction"),
    )
    per_label = scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("prediction") == F.col("label")).cast("long")).alias("nc"),
    )
    out = per_label.agg(
        F.lit(0.3).alias("dropout"),
        F.lit(n_train).alias("n_train"),
        F.sum("n").alias("n_test"),
        F.lit(len(hist["loss"])).alias("epochs_run"),
        F.lit(hist["best_epoch"]).alias("best_epoch"),
        F.lit(hist["early_stopped"]).alias("early_stopped"),
        F.round(F.lit(hist["loss"][0]), 6).alias("first_epoch_loss"),
        F.round(F.lit(hist["loss"][-1]), 6).alias("final_train_loss"),
        F.round(F.lit(min(hist["val_loss"])), 6).alias("best_val_loss"),
        F.round(F.sum("nc") / F.sum("n"), 6).alias("test_accuracy"),
        F.round(F.max("n") / F.sum("n"), 6).alias("majority_share"),
    )
    val.unpersist()
    return out


# ---------------------------------------------------------------------------
# served-confusion for the sequence-net family (r7 verdict #6): a PINNED
# integer hard-tanh RNN served by BOTH engine paths — transpiled Catalyst
# SQL (drives the full-oracle confusion relation) and the numpy/Arrow
# executor path the trained nets use (row-level agreement audit)
# ---------------------------------------------------------------------------

_SEQN_T = 6  # sequence length (first T events per user, event_id order)
_SEQN_H = 3  # hidden units
_SEQN_CLAMP = 100  # hard-tanh saturation (integer clamp, no division)
_SEQN_W = [2, -1, 1]  # input weights, one per hidden unit
_SEQN_U = [[1, -1, 0], [0, 1, -1], [-1, 0, 1]]  # recurrent weights
_SEQN_B = [1, -2, 3]  # hidden bias
_SEQN_V = [[2, -1, 1], [-2, 1, 3], [1, 2, -1], [3, -2, -2], [-1, 3, 2]]
_SEQN_C = [1, -1, 2, 0, -2]  # class bias


def _seqn_oracle() -> str:
    n_cls = len(_SEQN_V)
    xs = ",\n         ".join(
        f"COALESCE(MAX(CASE WHEN rn = {t} THEN x END), 0) AS x{t}"
        for t in range(1, _SEQN_T + 1)
    )
    steps = []
    for t in range(1, _SEQN_T + 1):
        cols = ", ".join(
            f"GREATEST(LEAST({_SEQN_U[i][0]}*h0 + {_SEQN_U[i][1]}*h1 + "
            f"{_SEQN_U[i][2]}*h2 + {_SEQN_W[i]}*x{t} + {_SEQN_B[i]}, "
            f"{_SEQN_CLAMP}), -{_SEQN_CLAMP}) AS nh{i}"
            for i in range(_SEQN_H)
        )
        ren = ", ".join(f"nh{i} AS h{i}" for i in range(_SEQN_H))
        steps.append(
            f", st_{t} AS MATERIALIZED (\n  SELECT user_id, "
            + ", ".join(f"x{u}" for u in range(1, _SEQN_T + 1))
            + f", {ren} FROM (SELECT *, {cols} FROM st_{t-1})\n)"
        )
    margins = ", ".join(
        f"({_SEQN_C[k]} + {_SEQN_V[k][0]}*h0 + {_SEQN_V[k][1]}*h1 + "
        f"{_SEQN_V[k][2]}*h2) AS m{k}"
        for k in range(n_cls)
    )
    cases = []
    for k in range(n_cls - 1):
        rest = ", ".join(f"m{j}" for j in range(k + 1, n_cls))
        gt = f"GREATEST({rest})" if k < n_cls - 2 else f"m{n_cls-1}"
        cases.append(f"WHEN m{k} >= {gt} THEN {k}")
    case = "CASE " + " ".join(cases) + f" ELSE {n_cls-1} END"
    return f"""
WITH seq0 AS MATERIALIZED (
  SELECT user_id, (CAST(ROUND(value * 100) AS BIGINT) % 16) - 8 AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
), st_0 AS MATERIALIZED (
  SELECT user_id,
         {xs},
         CAST(0 AS BIGINT) AS h0, CAST(0 AS BIGINT) AS h1,
         CAST(0 AS BIGINT) AS h2
  FROM seq0 WHERE rn <= {_SEQN_T} GROUP BY user_id
){"".join(steps)}, scored AS MATERIALIZED (
  SELECT user_id, {case} AS pred
  FROM (SELECT user_id, {margins} FROM st_{_SEQN_T})
), lab AS MATERIALIZED (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type ASC) AS rn
    FROM events GROUP BY user_id, event_type
  ) WHERE rn = 1
)
SELECT l.event_type AS label_type, CAST(s.pred AS INTEGER) AS pred_class,
       CAST(COUNT(*) AS BIGINT) AS n_users, TRUE AS audit_numpy_agrees
FROM scored s JOIN lab l USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2"""


@register(
    "ml_seqnet_served_confusion",
    _seqn_oracle(),
    doc="pinned integer hard-tanh RNN served by transpiled SQL AND the numpy/Arrow "
    "path: full-oracle confusion relation + row-level path-agreement audit",
)
def ml_seqnet_served_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level check for the sequence-net SERVING machinery (r7
    verdict #6): the trained CNN/RNN/LSTM queries are rows-only because
    float weights have no SQL twin, so this query pins the machinery
    they ride on with a model that DOES have one — a pinned
    integer-weight recurrent net whose hard-tanh is an integer clamp
    (GREATEST/LEAST, no division, no transcendental): h_t =
    clamp(U.h_(t-1) + W.x_t + b, +-{_SEQN_CLAMP}) over each user's
    first {_SEQN_T} events (event_id order, zero-padded), margins =
    V.h_T + c, first-max argmax.  Every step is exact BIGINT in both
    engines, so the per-(label, prediction) confusion relation is a
    FULL oracle — DuckDB replays the unrolled recurrence as chained
    MATERIALIZED CTEs (one per step; materialization stops the
    3^T expression inlining blowup, the text_bpe_train lesson — the
    Spark side chains one projection per step for the same reason).

    The SAME pinned weights then score the SAME sequences through the
    numpy int64 Arrow path (pandas_udf — the execution shape
    ml/nets.py's trained inference uses): ``audit_numpy_agrees`` pins
    row-for-row argmax equality between the codegen plan and the
    Python-worker plan (np.argmax and array_position share the
    first-max rule).  A drift in either serving path — Arrow batch
    handling, clamp semantics, argmax ties — hash-mismatches the
    driver compare or flips the audit.

    Scale: one windowed rank per user (partitioned, bounded), one
    groupBy(user) pivot to the fixed-width sequence, then pure
    map-side projections; the confusion aggregate is <= 25 rows."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    events = load_table(spark, sf_dir, "events").drop("props", "ts")
    x = (F.round(F.col("value") * 100).cast("long") % 16) - 8
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("event_id")
    )
    seq0 = events.select("user_id", x.alias("x"), rn.alias("rn")).filter(
        F.col("rn") <= _SEQN_T
    )
    sq = seq0.groupBy("user_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("rn") == t, F.col("x"))), F.lit(0)
            ).alias(f"x{t}")
            for t in range(1, _SEQN_T + 1)
        ]
    )
    # unrolled recurrence: ONE chained projection per step (a single
    # expression tree would re-inline 3^T times under CollapseProject)
    df = sq.select(
        "user_id",
        *[f"x{t}" for t in range(1, _SEQN_T + 1)],
        *[F.lit(0).cast("long").alias(f"h{i}") for i in range(_SEQN_H)],
    )
    for t in range(1, _SEQN_T + 1):
        pre = [
            (
                F.lit(_SEQN_U[i][0]) * F.col("h0")
                + F.lit(_SEQN_U[i][1]) * F.col("h1")
                + F.lit(_SEQN_U[i][2]) * F.col("h2")
                + F.lit(_SEQN_W[i]) * F.col(f"x{t}")
                + F.lit(_SEQN_B[i])
            )
            for i in range(_SEQN_H)
        ]
        df = df.select(
            "user_id",
            *[f"x{u}" for u in range(1, _SEQN_T + 1)],
            *[
                F.greatest(
                    F.least(pre[i], F.lit(_SEQN_CLAMP).cast("long")),
                    F.lit(-_SEQN_CLAMP).cast("long"),
                ).alias(f"h{i}")
                for i in range(_SEQN_H)
            ],
        )
    margins = F.array(
        *[
            F.lit(_SEQN_C[k])
            + F.lit(_SEQN_V[k][0]) * F.col("h0")
            + F.lit(_SEQN_V[k][1]) * F.col("h1")
            + F.lit(_SEQN_V[k][2]) * F.col("h2")
            for k in range(len(_SEQN_V))
        ]
    )
    scored = df.select(
        "user_id",
        *[f"x{t}" for t in range(1, _SEQN_T + 1)],
        (F.array_position(margins, F.array_max(margins)) - 1)
        .cast("int")
        .alias("pred"),
    ).localCheckpoint()  # reused by the confusion output AND the audit

    # numpy/Arrow path with the SAME weights (int64-exact)
    W, U, B = _SEQN_W, _SEQN_U, _SEQN_B
    V, C, T, H, CL = _SEQN_V, _SEQN_C, _SEQN_T, _SEQN_H, _SEQN_CLAMP

    def _np_pred_fn(xs):
        import numpy as np
        import pandas as pd

        if len(xs) == 0:  # Spark may hand an empty Arrow batch
            return pd.Series([], dtype="int32")
        X = np.stack([np.asarray(v, dtype="int64") for v in xs.to_numpy()])
        Ua = np.array(U, dtype="int64")
        h = np.zeros((len(X), H), dtype="int64")
        for t in range(T):
            pre = (
                h @ Ua.T
                + np.outer(X[:, t], np.array(W, dtype="int64"))
                + np.array(B, dtype="int64")
            )
            h = np.clip(pre, -CL, CL)
        m = h @ np.array(V, dtype="int64").T + np.array(C, dtype="int64")
        return pd.Series(np.argmax(m, axis=1).astype("int32"))

    np_pred = pandas_udf(_np_pred_fn, "int")
    xarr = F.array(*[F.col(f"x{t}") for t in range(1, _SEQN_T + 1)])
    agree = scored.select(
        (
            F.sum((F.col("pred") == np_pred(xarr)).cast("long"))
            == F.count(F.lit(1))
        ).alias("ok")
    ).first()["ok"]

    lw = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    lab = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(lw))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    return (
        scored.join(lab, "user_id")
        .groupBy(
            F.col("event_type").alias("label_type"),
            F.col("pred").alias("pred_class"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .withColumn("audit_numpy_agrees", F.lit(bool(agree)))
        .orderBy("label_type", "pred_class")
    )


# ---------------------------------------------------------------------------
# served-confusion for the CONVOLUTIONAL family: pinned integer conv1d +
# hard-tanh + max-pool — pure feed-forward expressions (no recursion),
# served by transpiled SQL (full oracle) AND the numpy/Arrow path (audit)
# ---------------------------------------------------------------------------

_CONV_K = [[1, -2, 1], [2, 1, -1]]  # 2 filters, kernel width 3
_CONV_BK = [3, -2]
_CONV_V = [[2, -1], [-1, 2], [1, 1], [-2, -1], [1, -2]]  # 5 classes x 2
_CONV_C = [0, 1, -1, 2, -2]


def _convnet_oracle() -> str:
    n_cls = len(_CONV_V)
    n_pos = _SEQN_T - 2  # valid conv positions for kernel 3
    xs = ",\n         ".join(
        f"COALESCE(MAX(CASE WHEN rn = {t} THEN x END), 0) AS x{t}"
        for t in range(1, _SEQN_T + 1)
    )
    acts = []
    for f, (k, b) in enumerate(zip(_CONV_K, _CONV_BK)):
        for p in range(1, n_pos + 1):
            acts.append(
                f"GREATEST(LEAST({k[0]}*x{p} + {k[1]}*x{p+1} + {k[2]}*x{p+2}"
                f" + {b}, {_SEQN_CLAMP}), -{_SEQN_CLAMP}) AS a{f}_{p}"
            )
    pools = ", ".join(
        f"GREATEST({', '.join(f'a{f}_{p}' for p in range(1, n_pos + 1))}) AS m{f}"
        for f in range(len(_CONV_K))
    )
    margins = ", ".join(
        f"({_CONV_C[k]} + {_CONV_V[k][0]}*m0 + {_CONV_V[k][1]}*m1) AS g{k}"
        for k in range(n_cls)
    )
    cases = []
    for k in range(n_cls - 1):
        rest = ", ".join(f"g{j}" for j in range(k + 1, n_cls))
        gt = f"GREATEST({rest})" if k < n_cls - 2 else f"g{n_cls-1}"
        cases.append(f"WHEN g{k} >= {gt} THEN {k}")
    case = "CASE " + " ".join(cases) + f" ELSE {n_cls-1} END"
    return f"""
WITH seq0 AS MATERIALIZED (
  SELECT user_id, (CAST(ROUND(value * 100) AS BIGINT) % 16) - 8 AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
), sq AS MATERIALIZED (
  SELECT user_id,
         {xs}
  FROM seq0 WHERE rn <= {_SEQN_T} GROUP BY user_id
), act AS MATERIALIZED (
  SELECT user_id, {", ".join(acts)} FROM sq
), pooled AS MATERIALIZED (
  SELECT user_id, {pools} FROM act
), scored AS MATERIALIZED (
  SELECT user_id, {case} AS pred
  FROM (SELECT user_id, {margins} FROM pooled)
), lab AS MATERIALIZED (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type ASC) AS rn
    FROM events GROUP BY user_id, event_type
  ) WHERE rn = 1
)
SELECT l.event_type AS label_type, CAST(s.pred AS INTEGER) AS pred_class,
       CAST(COUNT(*) AS BIGINT) AS n_users, TRUE AS audit_numpy_agrees
FROM scored s JOIN lab l USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2"""


@register(
    "ml_convnet_served_confusion",
    _convnet_oracle(),
    doc="pinned integer conv1d+hard-tanh+max-pool served by transpiled SQL AND "
    "the numpy/Arrow path: full-oracle confusion + path-agreement audit",
)
def ml_convnet_served_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONVOLUTIONAL analog of ml_seqnet_served_confusion,
    value-checking the other half of the trained-net serving machinery
    (the reference's M2 is a Conv1D stack — cnn_model.py:19-40): a
    pinned integer conv1d (2 filters, kernel 3, valid positions over
    each user's first-{_SEQN_T} event sequence), hard-tanh as the
    integer clamp, max-pool over positions (GREATEST — the exact
    integer analog of Keras MaxPooling1D), and a linear read-out with
    first-max argmax.  Feed-forward means NO recursion anywhere: the
    whole network is one layer of plain expressions in both engines,
    so the per-(label, prediction) confusion relation is a FULL
    oracle.  The SAME weights score the SAME sequences through numpy
    int64 on the Arrow path (conv as stacked shifted dots, np.clip,
    max over the position axis, np.argmax) and
    ``audit_numpy_agrees`` pins row-for-row agreement — together with
    the recurrent check, both architectures' serving paths
    (codegen SQL vs Python worker) are now value-pinned.

    Scale: one partitioned window rank, one groupBy(user) pivot, then
    pure map-side projections; output <= 25 rows."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    events = load_table(spark, sf_dir, "events").drop("props", "ts")
    x = (F.round(F.col("value") * 100).cast("long") % 16) - 8
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("event_id"))
    seq0 = events.select("user_id", x.alias("x"), rn.alias("rn")).filter(
        F.col("rn") <= _SEQN_T
    )
    sq = seq0.groupBy("user_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("rn") == t, F.col("x"))), F.lit(0)
            ).alias(f"x{t}")
            for t in range(1, _SEQN_T + 1)
        ]
    )
    n_pos = _SEQN_T - 2
    clamp_hi = F.lit(_SEQN_CLAMP).cast("long")
    clamp_lo = F.lit(-_SEQN_CLAMP).cast("long")
    pooled_cols = []
    for f, (k, b) in enumerate(zip(_CONV_K, _CONV_BK)):
        acts = [
            F.greatest(
                F.least(
                    F.lit(k[0]) * F.col(f"x{p}")
                    + F.lit(k[1]) * F.col(f"x{p+1}")
                    + F.lit(k[2]) * F.col(f"x{p+2}")
                    + F.lit(b),
                    clamp_hi,
                ),
                clamp_lo,
            )
            for p in range(1, n_pos + 1)
        ]
        pooled_cols.append(F.greatest(*acts).alias(f"m{f}"))
    pooled = sq.select(
        "user_id", *[f"x{t}" for t in range(1, _SEQN_T + 1)], *pooled_cols
    )
    margins = F.array(
        *[
            F.lit(_CONV_C[k])
            + F.lit(_CONV_V[k][0]) * F.col("m0")
            + F.lit(_CONV_V[k][1]) * F.col("m1")
            for k in range(len(_CONV_V))
        ]
    )
    scored = pooled.select(
        "user_id",
        *[f"x{t}" for t in range(1, _SEQN_T + 1)],
        (F.array_position(margins, F.array_max(margins)) - 1)
        .cast("int")
        .alias("pred"),
    ).localCheckpoint()  # reused by the confusion output AND the audit

    K, BK, V, C, T, CL = _CONV_K, _CONV_BK, _CONV_V, _CONV_C, _SEQN_T, _SEQN_CLAMP

    def _np_pred_fn(xs):
        import numpy as np
        import pandas as pd

        if len(xs) == 0:  # Spark may hand an empty Arrow batch
            return pd.Series([], dtype="int32")
        X = np.stack([np.asarray(v, dtype="int64") for v in xs.to_numpy()])
        pools = []
        for k, b in zip(K, BK):
            acts = np.stack(
                [
                    X[:, p] * k[0] + X[:, p + 1] * k[1] + X[:, p + 2] * k[2] + b
                    for p in range(T - 2)
                ],
                axis=1,
            )
            pools.append(np.clip(acts, -CL, CL).max(axis=1))
        m = np.stack(pools, axis=1) @ np.array(V, dtype="int64").T + np.array(
            C, dtype="int64"
        )
        return pd.Series(np.argmax(m, axis=1).astype("int32"))

    np_pred = pandas_udf(_np_pred_fn, "int")
    xarr = F.array(*[F.col(f"x{t}") for t in range(1, _SEQN_T + 1)])
    agree = scored.select(
        (
            F.sum((F.col("pred") == np_pred(xarr)).cast("long"))
            == F.count(F.lit(1))
        ).alias("ok")
    ).first()["ok"]

    lw = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    lab = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(lw))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    return (
        scored.join(lab, "user_id")
        .groupBy(
            F.col("event_type").alias("label_type"),
            F.col("pred").alias("pred_class"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .withColumn("audit_numpy_agrees", F.lit(bool(agree)))
        .orderBy("label_type", "pred_class")
    )
