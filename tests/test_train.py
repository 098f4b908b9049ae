"""In-engine sequence-model training (ml/train.py, plans/deepq.py).

The claims under test, strongest first:
1. each architecture's analytic gradient matches finite differences
   (the gold-standard backprop check);
2. the backward pass's embedded forward agrees exactly with the
   inference forward in ml/nets.py (no train/score drift);
3. the DISTRIBUTED gradient (mapInPandas partials + chunked reduce)
   equals the single-process gradient;
4. training actually learns: loss falls and held-out accuracy beats
   the majority class on separable synthetic data;
5. the registered queries run end-to-end and report learning.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_ORACLE
from web_attack_detection_spark.ml import nets, train

RNG = np.random.default_rng(11)


def _fd_max_rel_err(arch, seq_len, n_classes=3, n=4, n_coords=20, eps=1e-5):
    params = train.init_params(arch, seq_len, n_classes, seed=1)
    x = RNG.standard_normal((n, seq_len))
    y = RNG.integers(0, n_classes, n)
    _, grads = train.GRAD_FNS[arch](x, y, params)
    flat = train.flatten_params(params)
    gflat = train.flatten_params(grads)
    idxs = RNG.choice(flat.size, size=min(n_coords, flat.size), replace=False)
    worst = 0.0
    for i in idxs:
        fp = flat.copy()
        fp[i] += eps
        lp, _ = train.GRAD_FNS[arch](x, y, train.unflatten_params(params, fp))
        fm = flat.copy()
        fm[i] -= eps
        lm, _ = train.GRAD_FNS[arch](x, y, train.unflatten_params(params, fm))
        num = (lp - lm) / (2 * eps)
        worst = max(worst, abs(num - gflat[i]) / max(1e-8, abs(num) + abs(gflat[i])))
    return worst


@pytest.mark.parametrize(
    "arch,seq_len",
    [("cnn", 32), ("rnn", 6), ("lstm", 6)],
)
def test_gradient_matches_finite_differences(arch, seq_len):
    # 1e-4 tolerance: FD with eps=1e-5 carries ~1e-6 relative noise on
    # the tiniest coordinates; analytic errors show up orders louder
    assert _fd_max_rel_err(arch, seq_len) < 1e-4


def test_flatten_unflatten_roundtrip():
    for arch, L in (("cnn", 40), ("rnn", 8), ("lstm", 8)):
        p = train.init_params(arch, L, 5, seed=9)
        flat = train.flatten_params(p)
        p2 = train.unflatten_params(p, flat)
        flat2 = train.flatten_params(p2)
        assert np.array_equal(flat, flat2)
        # structure preserved
        assert sorted(p2.keys()) == sorted(p.keys())


@pytest.mark.parametrize("arch", ["cnn", "rnn", "lstm"])
def test_backward_forward_agrees_with_inference_forward(arch):
    """The cache-building forward inside *_loss_grads must produce the
    same probabilities as nets.*_forward — otherwise training optimizes
    a different function than scoring evaluates."""
    L = 34 if arch == "cnn" else 7
    params = train.init_params(arch, L, 4, seed=2)
    x = RNG.standard_normal((6, L))
    y = RNG.integers(0, 4, 6)
    loss_sum, _ = train.GRAD_FNS[arch](x, y, params)
    probs = train.FORWARD_FNS[arch](x, params)
    ce = -np.log(probs[np.arange(len(y)), y]).sum()
    assert abs(loss_sum - ce) < 1e-9


def test_distributed_gradient_equals_local(spark):
    n, L, C = 200, 28, 3  # L >= 28 so the CNN's three pool halvings survive
    X = RNG.standard_normal((n, L))
    y = RNG.integers(0, C, n).astype(int)
    df = (
        spark.createDataFrame(
            [(X[i].tolist(), int(y[i])) for i in range(n)],
            "seq array<double>, label int",
        )
        .repartition(6)
        .cache()
    )
    df.count()
    for arch in ("cnn", "rnn", "lstm"):
        params = train.init_params(arch, L, C, seed=5)
        loss_d, grad_d, n_d = train.distributed_loss_grad(
            df, arch, params, chunk=4096
        )
        ls, g = train.GRAD_FNS[arch](X, y, params)
        assert n_d == n
        assert abs(loss_d - ls / n) < 1e-9
        assert np.allclose(grad_d, train.flatten_params(g) / n, atol=1e-9)
    df.unpersist()


def test_fit_learns_separable_classes(spark):
    """Template-injected classes (high margin): every architecture must
    beat the majority baseline decisively and reduce training loss."""
    n, L, C = 400, 16, 3
    templates = RNG.standard_normal((C, L)) * 2.0
    y = RNG.integers(0, C, n)
    X = templates[y] + 0.3 * RNG.standard_normal((n, L))
    df = (
        spark.createDataFrame(
            [(X[i].tolist(), int(y[i])) for i in range(n)],
            "seq array<double>, label int",
        )
        .repartition(6)
        .cache()
    )
    df.count()
    for arch, lr in (("rnn", 0.2), ("lstm", 0.3)):
        params, hist = train.fit_sequence_net(
            df, arch, L, C, epochs=8, lr=lr, seed=4
        )
        probs = train.FORWARD_FNS[arch](X, params)
        acc = (probs.argmax(1) == y).mean()
        assert hist[-1] < hist[0] * 0.8, (arch, hist)
        assert acc > 0.8, (arch, acc)
    df.unpersist()


def test_cnn_fit_learns(spark):
    """CNN needs seq_len >= ~24 to survive its three pool halvings;
    separate case at L=32."""
    n, L, C = 400, 32, 3
    templates = RNG.standard_normal((C, L)) * 2.0
    y = RNG.integers(0, C, n)
    X = templates[y] + 0.3 * RNG.standard_normal((n, L))
    df = (
        spark.createDataFrame(
            [(X[i].tolist(), int(y[i])) for i in range(n)],
            "seq array<double>, label int",
        )
        .repartition(6)
        .cache()
    )
    df.count()
    params, hist = train.fit_sequence_net(df, "cnn", L, C, epochs=8, lr=0.12, seed=4)
    probs = nets.cnn_forward(X, params)
    acc = (probs.argmax(1) == y).mean()
    assert hist[-1] < hist[0] * 0.8, hist
    assert acc > 0.8, acc
    df.unpersist()


def test_trained_params_flow_through_sequence_scorer(spark):
    """Train-in-engine -> score-anywhere: the trained dict must score
    identically through the distributed predict_batch_udf path."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.ml.inference import sequence_scorer

    n, L, C = 120, 10, 3
    X = RNG.standard_normal((n, L))
    y = RNG.integers(0, C, n)
    df = spark.createDataFrame(
        [(X[i].tolist(), int(y[i])) for i in range(n)],
        "seq array<double>, label int",
    ).cache()
    df.count()
    params, _ = train.fit_sequence_net(df, "rnn", L, C, epochs=2, lr=0.1, seed=3)
    local = nets.rnn_forward(X, params)
    scorer = sequence_scorer(nets.rnn_forward, params, L)
    rows = df.select(scorer(F.col("seq")).alias("p")).collect()
    dist = np.array([r["p"] for r in rows])
    assert np.allclose(np.sort(dist, axis=0), np.sort(local, axis=0), atol=1e-12)
    df.unpersist()


def test_lstm_unit_forget_bias_applied():
    # fit_sequence_net must start LSTM forget gates open (Keras
    # unit_forget_bias) without touching the seeded inference weights
    seeded = train.init_params("lstm", 8, 3, seed=42)
    assert np.all(seeded["lstm1"][2] == 0.0)


@pytest.mark.parametrize(
    "qname", ["ml_cnn_train_dist", "ml_rnn_train_dist", "ml_lstm_train_dist"]
)
def test_train_queries_report_learning(spark, qname):
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    row = QUERIES[qname].fn(spark, SF_ORACLE).collect()[0]
    assert row["n_train"] > 0 and row["n_test"] > 0
    assert row["final_loss"] < row["init_loss"], row
    assert row["test_accuracy"] > row["majority_share"], row


def test_params_save_load_bit_exact(tmp_path):
    p = train.init_params("lstm", 8, 3, seed=7)
    f = str(tmp_path / "w.json")
    train.save_params(p, f)
    p2 = train.load_params(f)
    assert np.array_equal(train.flatten_params(p), train.flatten_params(p2))
    # structure: tuples stay tuples (nets.* unpack (w, u, b))
    assert isinstance(p2["lstm1"], tuple)
    x = RNG.standard_normal((5, 8))
    assert np.array_equal(nets.lstm_forward(x, p), nets.lstm_forward(x, p2))


def test_trained_then_saved_scores_identically(spark, tmp_path):
    """Full seam: fit in-engine -> save -> load -> same predictions."""
    n, L, C = 80, 10, 3
    X = RNG.standard_normal((n, L))
    y = RNG.integers(0, C, n)
    df = spark.createDataFrame(
        [(X[i].tolist(), int(y[i])) for i in range(n)],
        "seq array<double>, label int",
    ).cache()
    df.count()
    params, _ = train.fit_sequence_net(df, "rnn", L, C, epochs=2, lr=0.1, seed=3)
    f = str(tmp_path / "rnn.json")
    train.save_params(params, f)
    loaded = train.load_params(f)
    assert np.array_equal(nets.rnn_forward(X, params), nets.rnn_forward(X, loaded))
    df.unpersist()


def test_transpiled_scoring_plan_is_pure_jvm(spark):
    """transpile_linear_softmax output must contain no Python eval
    node: the whole point is serving without a Python worker."""
    from web_attack_detection_spark.plans.deepq import transpile_linear_softmax

    df = spark.range(100).selectExpr(
        "array(cast(id as double), cast(id % 7 as double)) as features"
    )
    coef = [[0.5, -1.0], [0.25, 2.0], [-0.75, 0.1]]
    intercept = [0.1, -0.2, 0.3]
    _, pred = transpile_linear_softmax(coef, intercept, "features")
    plan = df.select(pred.alias("p"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(n)" prefixes = operators fused into a WholeStageCodegen stage
    assert plan.lstrip().startswith("*("), plan[:200]


def test_driver_and_tree_reduce_identical(spark):
    """The adaptive reduce must be invisible: both depths produce the
    SAME floats (sums run in (part_id, chunk_id) order on both)."""
    n, L, C = 150, 28, 3
    X = RNG.standard_normal((n, L))
    y = RNG.integers(0, C, n)
    df = (
        spark.createDataFrame(
            [(X[i].tolist(), int(y[i])) for i in range(n)],
            "seq array<double>, label int",
        )
        .repartition(6)
        .cache()
    )
    df.count()
    params = train.init_params("cnn", L, C, seed=5)
    l1, g1, n1 = train.distributed_loss_grad(
        df, "cnn", params, chunk=4096, reduce_mode="driver"
    )
    l2, g2, n2 = train.distributed_loss_grad(
        df, "cnn", params, chunk=4096, reduce_mode="tree"
    )
    assert n1 == n2 == n
    assert l1 == l2
    assert np.array_equal(g1, g2)
    df.unpersist()


def test_resume_from_checkpoint_continues_learning(spark, tmp_path):
    """Weights-only checkpoint/resume: save after a few epochs, load in
    a 'new run', keep training — loss keeps falling from where it was."""
    n, L, C = 300, 16, 3
    templates = RNG.standard_normal((C, L)) * 2.0
    y = RNG.integers(0, C, n)
    X = templates[y] + 0.3 * RNG.standard_normal((n, L))
    df = (
        spark.createDataFrame(
            [(X[i].tolist(), int(y[i])) for i in range(n)],
            "seq array<double>, label int",
        )
        .repartition(4)
        .cache()
    )
    df.count()
    p1, h1 = train.fit_sequence_net(df, "rnn", L, C, epochs=3, lr=0.2, seed=4)
    ckpt = str(tmp_path / "ckpt.json")
    train.save_params(p1, ckpt)
    p2, h2 = train.fit_sequence_net(
        df, "rnn", L, C, epochs=3, lr=0.2, init=train.load_params(ckpt)
    )
    # the resumed run starts at the checkpoint's loss, not at init
    assert h2[0] < h1[0], (h1, h2)
    assert h2[-1] < h2[0], h2
    df.unpersist()


def test_distributed_grad_handles_empty_partitions(spark):
    """Over-partitioned tiny input: empty partitions emit no partials
    and the gradient is unchanged."""
    n, L, C = 40, 28, 3
    X = RNG.standard_normal((n, L))
    y = RNG.integers(0, C, n)
    df = (
        spark.createDataFrame(
            [(X[i].tolist(), int(y[i])) for i in range(n)],
            "seq array<double>, label int",
        )
        .repartition(63)  # far more partitions than rows
        .cache()
    )
    df.count()
    params = train.init_params("rnn", L, C, seed=5)
    loss_d, grad_d, n_d = train.distributed_loss_grad(df, "rnn", params)
    ls, g = train.GRAD_FNS["rnn"](X, y, params)
    assert n_d == n
    assert np.allclose(grad_d, train.flatten_params(g) / n, atol=1e-9)
    df.unpersist()
