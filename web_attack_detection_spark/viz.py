"""Visualization sinks (SURVEY.md §2.5 V1-V5).

The reference's four matplotlib sinks
(``/root/reference/utils/visualization.py:16-161``) each receive
driver-side Python data; V3 (training-time bars) and V4 (confusion
heatmap) are dead code there — V4's matrix has no producer at all.
Here every plot is fed from a SMALL aggregated DataFrame (the engine
reduces first; only |classes|- or |epochs|-sized data reaches the
driver), V3/V4 are wired in, and one run writes one timestamped
directory — not one per figure (the reference quirk at
``visualization.py:8-13``).

matplotlib is not in this image, so rendering is import-gated: with it
installed PNGs appear. Independently of matplotlib, every sink ALWAYS
writes (a) the plot data as a CSV sidecar and (b) a real image via the
dependency-free SVG renderer (``svg.py``) — so unlike the reference,
which loses everything unless the GUI run is screenshotted, a headless
run still produces both the data and a viewable figure.
"""

from __future__ import annotations

import csv
from datetime import datetime
from pathlib import Path

from pyspark.sql import DataFrame

from web_attack_detection_spark import svg as _svg

try:  # pragma: no cover - matplotlib absent in this image
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except ImportError:
    _HAVE_MPL = False


def make_run_dir(base: str = "plots", stamp: str | None = None) -> Path:
    """ONE directory per run (fixes the per-figure-dir quirk,
    ``/root/reference/utils/visualization.py:8-13``)."""
    stamp = stamp or datetime.now().strftime("%Y%m%d_%H%M%S")
    d = Path(base) / f"run_{stamp}"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _write_csv(path: Path, header: list[str], rows: list[tuple]) -> Path:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    return path


def plot_history(history: dict[str, list[float]], run_dir: Path, name: str) -> Path:
    """V1 — per-model accuracy/loss curves (reference
    ``visualization.py:16-52``), fed from the training-metrics dict."""
    epochs = range(1, len(next(iter(history.values()))) + 1)
    if _HAVE_MPL:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(8, 5))
        for k, vals in history.items():
            ax.plot(list(epochs), vals, label=k)
        ax.set_xlabel("epoch")
        ax.legend()
        out = run_dir / f"{name}_history.png"
        fig.savefig(out)
        plt.close(fig)
        return out
    keys = sorted(history)
    # series may be ragged (different optimizers converge at different
    # iteration counts) — blank-fill the CSV past each series' end
    n = max(len(history[k]) for k in keys)
    rows = [
        tuple([e] + [history[k][e - 1] if e - 1 < len(history[k]) else "" for k in keys])
        for e in range(1, n + 1)
    ]
    _write_csv(run_dir / f"{name}_history.csv", ["epoch", *keys], rows)
    out = run_dir / f"{name}_history.svg"
    out.write_text(_svg.line_chart(history, f"{name} training history"))
    return out


def plot_model_comparison(accuracies: dict[str, float], run_dir: Path) -> Path:
    """V2 — cross-model accuracy bars (``visualization.py:55-89``)."""
    items = sorted(accuracies.items())
    if _HAVE_MPL:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.bar([k for k, _ in items], [v for _, v in items])
        ax.set_ylabel("accuracy")
        out = run_dir / "model_comparison.png"
        fig.savefig(out)
        plt.close(fig)
        return out
    _write_csv(run_dir / "model_comparison.csv", ["model", "accuracy"], items)
    out = run_dir / "model_comparison.svg"
    out.write_text(_svg.bar_chart(items, "model accuracy", y_label="accuracy"))
    return out


def plot_training_times(times_s: dict[str, float], run_dir: Path) -> Path:
    """V3 — training-time bars; dead code in the reference
    (``visualization.py:92-125`` — never called), wired in here."""
    items = sorted(times_s.items())
    if _HAVE_MPL:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.bar([k for k, _ in items], [v for _, v in items])
        ax.set_ylabel("training time (s)")
        out = run_dir / "training_times.png"
        fig.savefig(out)
        plt.close(fig)
        return out
    _write_csv(run_dir / "training_times.csv", ["model", "seconds"], items)
    out = run_dir / "training_times.svg"
    out.write_text(_svg.bar_chart(items, "training time", y_label="seconds"))
    return out


def plot_confusion(cm_df: DataFrame, run_dir: Path, name: str = "confusion") -> Path:
    """V4 — confusion heatmap. The reference version has NO producer
    (``visualization.py:128-161``, cm passed in, never computed); here
    the input is the in-engine aggregation
    (ml/pipeline.confusion_matrix) — |classes|² rows collected, never
    raw data."""
    rows = [
        (r["label"], r["prediction"], r["n"])
        for r in cm_df.collect()
    ]
    labels = sorted({r[0] for r in rows} | {r[1] for r in rows})
    if _HAVE_MPL:  # pragma: no cover
        grid = {(a, p): n for a, p, n in rows}
        data = [[grid.get((a, p), 0) for p in labels] for a in labels]
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(data)
        ax.set_xticks(range(len(labels)), labels, rotation=45)
        ax.set_yticks(range(len(labels)), labels)
        out = run_dir / f"{name}.png"
        fig.savefig(out)
        plt.close(fig)
        return out
    _write_csv(run_dir / f"{name}.csv", ["label", "prediction", "n"], sorted(rows))
    grid_map = {(a, p): n for a, p, n in rows}
    grid = [[float(grid_map.get((a, p), 0)) for p in labels] for a in labels]
    out = run_dir / f"{name}.svg"
    out.write_text(_svg.heatmap([str(x) for x in labels], grid, "confusion matrix"))
    return out
