"""ml_rnn_exact (VERDICT r9 #2): exact-GD recurrent net under full
oracle.  The DuckDB side is pinned by the oracle sweep; these tests
pin the algorithm against an independent numpy float64 runtime (the
three-implementation discipline of test_mlp_exact_gd_matches_numpy_twin)
and the BPTT-specific invariants: gradients must FLOW through all
three timesteps (nonzero recurrence gradients, nonzero t=1 deltas),
symmetry must stay broken, and the held-out confusion must cover the
test split exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from web_attack_detection_spark.plans import all_plans  # noqa: F401
from web_attack_detection_spark.plans.mlq import _lrgd_round_half_away
from web_attack_detection_spark.plans.registry import QUERIES
from web_attack_detection_spark.plans.rnnx import (
    _RNNX_H,
    _RNNX_LR,
    _RNNX_ROUNDS,
    _rnnx_init,
)

SF = "/root/testdata/sf0.001"


def _numpy_trajectory():
    """Independent float64 replay of the full training trajectory:
    same pinned init, same left-associated expression order, hard-tanh
    clamps, gated BPTT, 1e6-quantized order-free integer gradient
    sums.  Returns the tidy rows the Spark query must emit."""
    H = _RNNX_H
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    istest = (pdf["event_id"] % 4 == 1).to_numpy()
    x1q = np.floor(pdf["value"].to_numpy() * 10000 + 0.5).astype("int64")
    x2q = (pdf["user_id"].to_numpy() % 100).astype("int64")
    x3q = (pdf["event_id"].to_numpy() % 100).astype("int64")
    y_all = pdf["event_type"].isin(["purchase", "signup"]).to_numpy().astype("int64")
    tr = ~istest
    n = int(tr.sum())
    zs_tr, zs_te = [], []
    for xq in (x1q, x2q, x3q):
        m = float(int(xq[tr].sum())) / float(n)
        q = float(int((xq[tr].astype(object) ** 2).sum())) / float(n)
        sd = math.sqrt(q - m * m)
        zs_tr.append((xq[tr].astype("float64") - m) / sd)
        zs_te.append((xq[istest].astype("float64") - m) / sd)
    y = y_all[tr]
    B, U, R, V = _rnnx_init()
    n6 = float(n) * 1000000.0

    def q6(a):
        return np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)).astype("int64")

    def forward(zs):
        """pre[t][j], s[t][j] for t=1..3 (0-indexed lists), margin m —
        expression order mirrors _rnnx_pre_sql / the engine exactly."""
        pre, s = [], []
        for t in range(3):
            pt, st = [], []
            for j in range(H):
                e = B[j] + U[j] * zs[t]
                if t > 0:
                    for k in range(H):
                        e = e + R[j][k] * s[t - 1][k]
                pt.append(e)
                st.append(np.maximum(np.minimum(e, 1.0), -1.0))
            pre.append(pt)
            s.append(st)
        m = np.full_like(s[2][0], V[0])
        for j in range(H):
            m = m + V[j + 1] * s[2][j]
        return pre, s, m

    want = []
    for r in range(1, _RNNX_ROUNDS + 1):
        pre, s, m = forward(zs_tr)
        resid = 1.0 / (1.0 + np.exp(-m)) - y.astype("float64")
        gvb = int(q6(resid * 1000000.0).sum())
        gv = [int(q6(resid * s[2][j] * 1000000.0).sum()) for j in range(H)]
        d3 = [
            np.where(np.abs(pre[2][j]) < 1.0, resid * V[j + 1], 0.0)
            for j in range(H)
        ]
        c2 = []
        for k in range(H):
            e = R[0][k] * d3[0]
            for j in range(1, H):
                e = e + R[j][k] * d3[j]
            c2.append(e)
        d2 = [np.where(np.abs(pre[1][j]) < 1.0, c2[j], 0.0) for j in range(H)]
        c1 = []
        for k in range(H):
            e = R[0][k] * d2[0]
            for j in range(1, H):
                e = e + R[j][k] * d2[j]
            c1.append(e)
        d1 = [np.where(np.abs(pre[0][j]) < 1.0, c1[j], 0.0) for j in range(H)]
        gb = [int(q6((d1[j] + d2[j] + d3[j]) * 1000000.0).sum()) for j in range(H)]
        gu = [
            int(
                q6(
                    (d1[j] * zs_tr[0] + d2[j] * zs_tr[1] + d3[j] * zs_tr[2])
                    * 1000000.0
                ).sum()
            )
            for j in range(H)
        ]
        gr = {
            (j, k): int(q6((d2[j] * s[0][k] + d3[j] * s[1][k]) * 1000000.0).sum())
            for j in range(H)
            for k in range(H)
        }
        nc = int(((m >= 0.0) == (y == 1)).sum())
        for j in range(H):
            B[j] = B[j] - _RNNX_LR * (float(gb[j]) / n6)
            U[j] = U[j] - _RNNX_LR * (float(gu[j]) / n6)
            for k in range(H):
                R[j][k] = R[j][k] - _RNNX_LR * (float(gr[(j, k)]) / n6)
        V[0] = V[0] - _RNNX_LR * (float(gvb) / n6)
        for j in range(H):
            V[j + 1] = V[j + 1] - _RNNX_LR * (float(gv[j]) / n6)
        for j in range(H):
            want.append(
                (r, "in", j + 1, 0, gb[j], _lrgd_round_half_away(B[j] * 1000000))
            )
            want.append(
                (r, "in", j + 1, 1, gu[j], _lrgd_round_half_away(U[j] * 1000000))
            )
            for k in range(H):
                want.append(
                    (
                        r,
                        "rec",
                        j + 1,
                        k + 1,
                        gr[(j, k)],
                        _lrgd_round_half_away(R[j][k] * 1000000),
                    )
                )
        want.append((r, "out", 0, 0, gvb, _lrgd_round_half_away(V[0] * 1000000)))
        for j in range(H):
            want.append(
                (r, "out", 0, j + 1, gv[j], _lrgd_round_half_away(V[j + 1] * 1000000))
            )
        want.append((r, "acc", 0, 0, nc, n))
    _, _, mt = forward(zs_te)
    yt = y_all[istest]
    pred = (mt >= 0.0).astype("int64")
    for uy in (0, 1):
        for up in (0, 1):
            c = int(((yt == uy) & (pred == up)).sum())
            if c:
                want.append((_RNNX_ROUNDS, "cm", uy, up, c, 0))
    return want, n


@pytest.fixture(scope="module")
def rows(spark):
    return QUERIES["ml_rnn_exact"].fn(spark, SF).collect()


def test_rnn_exact_gd_matches_numpy_twin(rows):
    got = sorted(
        tuple(r[c] for c in ("round", "layer", "unit", "pidx", "grad_q", "w_q"))
        for r in rows
    )
    want, _ = _numpy_trajectory()
    assert got == sorted(want)


def test_rnn_exact_shape_and_bptt_invariants(rows):
    H, R = _RNNX_H, _RNNX_ROUNDS
    by: dict = {}
    for r in rows:
        by.setdefault(r["layer"], []).append(r)
    assert len(by["in"]) == R * H * 2  # bias + input weight per unit
    assert len(by["rec"]) == R * H * H
    assert len(by["out"]) == R * (H + 1)
    assert len(by["acc"]) == R
    # gradient FLOW through the recurrence: the BPTT chain is
    # load-bearing, not decorative — recurrence gradients are nonzero
    # in round 1 (d2/d3 reach s1/s2) and the recurrence weights move
    r1_rec = [r for r in by["rec"] if r["round"] == 1]
    assert any(r["grad_q"] != 0 for r in r1_rec)
    B0, U0, R0, V0 = _rnnx_init()
    moved = [
        r
        for r in by["rec"]
        if r["round"] == R
        and r["w_q"] != _lrgd_round_half_away(R0[r["unit"] - 1][r["pidx"] - 1] * 1e6)
    ]
    assert moved, "recurrence weights never moved — BPTT is dead"
    # symmetry broken: no two units share all final-round params
    finals = {}
    for r in by["in"]:
        if r["round"] == R:
            finals.setdefault(r["unit"], []).append(r["w_q"])
    sigs = [tuple(sorted(v)) for v in finals.values()]
    assert len(set(sigs)) == H
    # train n constant across rounds; held-out confusion covers the
    # test split exactly
    accs = sorted(by["acc"], key=lambda r: r["round"])
    n = accs[0]["w_q"]
    assert n > 0 and all(a["w_q"] == n for a in accs)
    import duckdb

    n_test = duckdb.sql(
        f"select count(*) from '{SF}/events.parquet' where event_id % 4 = 1"
    ).fetchone()[0]
    assert sum(r["grad_q"] for r in by["cm"]) == n_test
    assert all(r["pidx"] in (0, 1) for r in by["cm"])


def test_rnn_adam_exact_trajectory_and_moments(spark):
    """ml_rnn_adam_exact: same net trained with Keras' Adam
    formulation (lr_t-folded bias corrections, epsilon on the
    uncorrected sqrt(v)).  Round-1 moment relation m_1 = 0.1*g/(n*1e6)
    exactly (quantized both sides), round-1 gradient parity with the
    GD query (identical init => identical first forward pass), and
    the first step is bounded by lr_t(1) * (1/(1+eps'))."""
    from web_attack_detection_spark.plans.rnnx import _rnnx_lr_t

    rows = QUERIES["ml_rnn_adam_exact"].fn(spark, SF).collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r["layer"], []).append(r)
    H, R = _RNNX_H, _RNNX_ROUNDS
    assert len(by["in"]) == R * H * 2
    assert len(by["rec"]) == R * H * H
    assert len(by["out"]) == R * (H + 1)
    n = by["acc"][0]["w_q"]
    r1 = [r for r in rows if r["round"] == 1 and r["layer"] in ("in", "rec", "out")]
    for r in r1:
        g = r["grad_q"] / (n * 1e6)
        m1 = (1.0 - 0.9) * g
        assert r["m_q"] == _lrgd_round_half_away(m1 * 1e9), r
    gd = {
        (x["layer"], x["unit"], x["pidx"]): x["grad_q"]
        for x in QUERIES["ml_rnn_exact"].fn(spark, SF).collect()
        if x["round"] == 1 and x["layer"] in ("in", "rec", "out")
    }
    for r in r1:
        assert gd[(r["layer"], r["unit"], r["pidx"])] == r["grad_q"]
    # Keras first step: |w_1 - w_0| = lr_t(1) * |m|/(sqrt(v)+eps)
    # <= lr_t(1) * sqrt(10) for the first step (m/sqrt(v) = sqrt(0.1)
    # when v's EMA has one sample... bound loosely by lr_t * 1/sqrt(0.1))
    B0, U0, R0, V0 = _rnnx_init()
    init = {}
    for j in range(1, H + 1):
        init[("in", j, 0)] = B0[j - 1]
        init[("in", j, 1)] = U0[j - 1]
        for k in range(1, H + 1):
            init[("rec", j, k)] = R0[j - 1][k - 1]
    init[("out", 0, 0)] = V0[0]
    for j in range(1, H + 1):
        init[("out", 0, j)] = V0[j]
    bound = _rnnx_lr_t(1) / (0.1 ** 0.5) + 2e-6
    for r in r1:
        step = abs(r["w_q"] / 1e6 - init[(r["layer"], r["unit"], r["pidx"])])
        assert step <= bound, r
