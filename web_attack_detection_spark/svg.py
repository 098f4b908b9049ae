"""Minimal dependency-free SVG chart renderer for the viz sinks.

The reference renders its four plots with matplotlib
(``/root/reference/utils/visualization.py:16-161``), which is absent
from this image. Rather than leaving the sinks as CSV-only fallbacks,
this module renders real images with nothing but the standard library:
SVG is a text format, and line/bar/heatmap charts at the reference's
complexity are a few dozen elements. Outputs open in any browser and
embed in any report — functionally replacing the reference's PNGs.

Layout model: a fixed margin for axes/labels, data mapped linearly
into the plot rect. All coordinates are rounded to 2 decimals to keep
files small and deterministic (same input → byte-identical SVG, which
the tests rely on).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

_W, _H = 640, 400
_ML, _MR, _MT, _MB = 60, 20, 30, 50  # margins: left/right/top/bottom
_PW, _PH = _W - _ML - _MR, _H - _MT - _MB  # plot rect

_PALETTE = ["#4C72B0", "#DD8452", "#55A868", "#C44E52", "#8172B3", "#937860"]


def _header(title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif" font-size="12">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_W / 2}" y="18" text-anchor="middle" font-size="14">'
        f"{escape(title)}</text>",
    ]


def _axes(x_label: str, y_label: str) -> list[str]:
    return [
        f'<line x1="{_ML}" y1="{_MT}" x2="{_ML}" y2="{_MT + _PH}" stroke="black"/>',
        f'<line x1="{_ML}" y1="{_MT + _PH}" x2="{_ML + _PW}" y2="{_MT + _PH}" stroke="black"/>',
        f'<text x="{_ML + _PW / 2}" y="{_H - 10}" text-anchor="middle">'
        f"{escape(x_label)}</text>",
        f'<text x="14" y="{_MT + _PH / 2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {_MT + _PH / 2})">{escape(y_label)}</text>',
    ]


def _y_scale(lo: float, hi: float):
    if hi == lo:  # degenerate range: center the single value
        hi, lo = lo + 1.0, lo - 1.0
    span = hi - lo

    def to_y(v: float) -> float:
        return round(_MT + _PH * (1 - (v - lo) / span), 2)

    return lo, hi, to_y


def _y_ticks(lo: float, hi: float, to_y) -> list[str]:
    out = []
    for i in range(5):
        v = lo + (hi - lo) * i / 4
        y = to_y(v)
        out.append(f'<line x1="{_ML - 4}" y1="{y}" x2="{_ML}" y2="{y}" stroke="black"/>')
        out.append(
            f'<text x="{_ML - 8}" y="{y + 4}" text-anchor="end">{v:.3g}</text>'
        )
    return out


def line_chart(
    series: dict[str, list[float]],
    title: str,
    x_label: str = "epoch",
    y_label: str = "value",
) -> str:
    """Multi-series line chart; x is the 1-based index (epochs).

    Total on degenerate input (ADVICE r2): an empty series dict or
    all-empty series renders an axes-only chart instead of raising —
    sinks must never crash a pipeline run over a no-history model."""
    series = {k: v for k, v in series.items() if v}
    all_vals = [v for vals in series.values() for v in vals]
    if not all_vals:
        parts = _header(title) + _axes(x_label, y_label)
        parts.append("</svg>")
        return "\n".join(parts)
    lo, hi, to_y = _y_scale(min(all_vals), max(all_vals))
    n = max(len(v) for v in series.values())
    parts = _header(title) + _axes(x_label, y_label) + _y_ticks(lo, hi, to_y)

    def to_x(i: int) -> float:  # i is 0-based point index
        return round(_ML + (_PW * i / max(n - 1, 1)), 2)

    for si, (name, vals) in enumerate(sorted(series.items())):
        color = _PALETTE[si % len(_PALETTE)]
        pts = " ".join(f"{to_x(i)},{to_y(v)}" for i, v in enumerate(vals))
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" stroke-width="2"/>'
        )
        parts.append(
            f'<text x="{_ML + _PW - 4}" y="{_MT + 14 + 14 * si}" text-anchor="end" '
            f'fill="{color}">{escape(name)}</text>'
        )
    # x ticks: first / middle / last
    for i in sorted({0, n // 2, n - 1}):
        x = to_x(i)
        parts.append(
            f'<line x1="{x}" y1="{_MT + _PH}" x2="{x}" y2="{_MT + _PH + 4}" stroke="black"/>'
        )
        parts.append(
            f'<text x="{x}" y="{_MT + _PH + 16}" text-anchor="middle">{i + 1}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def bar_chart(
    items: list[tuple[str, float]], title: str, y_label: str = "value"
) -> str:
    """Categorical bar chart (model-comparison / training-time sinks).
    Total on an empty items list: renders an axes-only chart."""
    if not items:
        parts = _header(title) + _axes("", y_label)
        parts.append("</svg>")
        return "\n".join(parts)
    lo, hi, to_y = _y_scale(0.0, max(v for _, v in items))
    parts = _header(title) + _axes("", y_label) + _y_ticks(lo, hi, to_y)
    n = len(items)
    slot = _PW / n
    bw = slot * 0.7
    y0 = to_y(0.0)
    for i, (name, v) in enumerate(items):
        x = round(_ML + slot * i + (slot - bw) / 2, 2)
        y = to_y(v)
        parts.append(
            f'<rect x="{x}" y="{y}" width="{round(bw, 2)}" '
            f'height="{round(y0 - y, 2)}" fill="{_PALETTE[i % len(_PALETTE)]}"/>'
        )
        parts.append(
            f'<text x="{round(x + bw / 2, 2)}" y="{_MT + _PH + 16}" '
            f'text-anchor="middle">{escape(str(name))}</text>'
        )
        parts.append(
            f'<text x="{round(x + bw / 2, 2)}" y="{round(y - 4, 2)}" '
            f'text-anchor="middle">{v:.3g}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def heatmap(
    labels: list[str], grid: list[list[float]], title: str
) -> str:
    """Square heatmap (confusion matrix): rows = actual, cols =
    predicted; cell shade scales with count (white → dark blue)."""
    k = len(labels)
    cell = min(_PW, _PH) / max(k, 1)
    hi = max((v for row in grid for v in row), default=1) or 1
    parts = _header(title)
    for r in range(k):
        for c in range(k):
            v = grid[r][c]
            # interpolate white -> #4C72B0
            t = v / hi
            rgb = (
                round(255 + (0x4C - 255) * t),
                round(255 + (0x72 - 255) * t),
                round(255 + (0xB0 - 255) * t),
            )
            x = round(_ML + c * cell, 2)
            y = round(_MT + r * cell, 2)
            parts.append(
                f'<rect x="{x}" y="{y}" width="{round(cell, 2)}" '
                f'height="{round(cell, 2)}" fill="rgb{rgb}" stroke="#ddd"/>'
            )
            parts.append(
                f'<text x="{round(x + cell / 2, 2)}" y="{round(y + cell / 2 + 4, 2)}" '
                f'text-anchor="middle" fill="{"white" if t > 0.6 else "black"}">'
                f"{int(v)}</text>"
            )
    for i, lab in enumerate(labels):
        parts.append(
            f'<text x="{round(_ML + i * cell + cell / 2, 2)}" y="{_MT - 6}" '
            f'text-anchor="middle">{escape(str(lab))}</text>'
        )
        parts.append(
            f'<text x="{_ML - 8}" y="{round(_MT + i * cell + cell / 2 + 4, 2)}" '
            f'text-anchor="end">{escape(str(lab))}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)
