"""Headless visualization: SVG renderings of signals, profiles, motifs
and discords (reference Visualize/plotMP/plotKMP, matrixprofile.go:
1406-1429, visualize.go:15-164, kmp.go:290-302).

The reference renders PNG via gonum/plot; this container has no
plotting libraries, but SVG is a pure-text format — the panels are
generated as polyline/circle elements directly, zero dependencies.
Layout mirrors the reference's: a signal panel with motif/discord
markers on top, the matrix profile below (plotMP, visualize.go:86-127);
the k-dimensional variant stacks one panel per dimension/level
(plotKMP, visualize.go:129-164); motif panels overlay each group's
aligned subsequences.
"""

from __future__ import annotations

import numpy as np

_W, _PANEL_H, _PAD = 900, 160, 36


def _scale(vals: np.ndarray, y0: float) -> list[tuple[float, float]]:
    v = np.asarray(vals, dtype=np.float64)
    finite = np.isfinite(v)
    if not finite.any():
        return []
    lo, hi = v[finite].min(), v[finite].max()
    span = (hi - lo) or 1.0
    xs = _PAD + (np.arange(v.size) / max(v.size - 1, 1)) * (_W - 2 * _PAD)
    ys = y0 + _PANEL_H - 8 - ((v - lo) / span) * (_PANEL_H - 16)
    return [(x, y) for x, y, ok in zip(xs, ys, finite) if ok]


def _polyline(points, color: str, width: float = 1.0) -> str:
    if not points:
        return ""
    pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in points)
    return f'<polyline fill="none" stroke="{color}" stroke-width="{width}" points="{pts}"/>'


def _panel(label: str, y0: float) -> str:
    return (
        f'<rect x="{_PAD}" y="{y0}" width="{_W - 2 * _PAD}" height="{_PANEL_H}" '
        f'fill="none" stroke="#ccc"/>'
        f'<text x="{_PAD + 4}" y="{y0 + 14}" font-size="12" fill="#555">{label}</text>'
    )


def render_profile_svg(
    series,
    mp,
    w: int,
    motifs=None,
    discords=None,
    path: str | None = None,
) -> str:
    """Signal + profile panels with motif (colored) and discord (red)
    window markers; returns the SVG text (and writes it when ``path``)."""
    series = np.asarray(series, dtype=np.float64)
    mp = np.asarray(mp, dtype=np.float64)
    height = 2 * (_PANEL_H + _PAD) + _PAD
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{height}" '
        f'viewBox="0 0 {_W} {height}">',
        _panel(f"signal (n={series.size})", _PAD),
        _polyline(_scale(series, _PAD), "#3366cc"),
        _panel(f"matrix profile (w={w})", _PANEL_H + 2 * _PAD),
        _polyline(_scale(mp, _PANEL_H + 2 * _PAD), "#333333"),
    ]
    colors = ["#e69f00", "#009e73", "#cc79a7", "#56b4e9", "#f0e442"]
    x_of = lambda i: _PAD + (i / max(series.size - 1, 1)) * (_W - 2 * _PAD)
    for g, group in enumerate(motifs or []):
        idxs = group.idx if hasattr(group, "idx") else group
        for i in idxs:
            parts.append(
                f'<rect x="{x_of(i):.1f}" y="{_PAD}" width="{x_of(i + w) - x_of(i):.1f}" '
                f'height="{_PANEL_H}" fill="{colors[g % len(colors)]}" opacity="0.25"/>'
            )
    for d in discords or []:
        parts.append(
            f'<circle cx="{x_of(d):.1f}" cy="{_PAD + 10}" r="4" fill="#d62728"/>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(svg)
    return svg


def render_kmp_svg(t, mp, w: int, path: str | None = None) -> str:
    """k stacked signal panels + k stacked level profiles (plotKMP)."""
    t = np.atleast_2d(np.asarray(t, dtype=np.float64))
    mp = np.atleast_2d(np.asarray(mp, dtype=np.float64))
    k = t.shape[0] + mp.shape[0]
    height = k * (_PANEL_H + _PAD) + _PAD
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{height}" '
        f'viewBox="0 0 {_W} {height}">'
    ]
    y = _PAD
    for d in range(t.shape[0]):
        parts += [_panel(f"dim {d}", y), _polyline(_scale(t[d], y), "#3366cc")]
        y += _PANEL_H + _PAD
    for d in range(mp.shape[0]):
        parts += [
            _panel(f"profile level {d} (w={w})", y),
            _polyline(_scale(mp[d], y), "#333333"),
        ]
        y += _PANEL_H + _PAD
    parts.append("</svg>")
    svg = "\n".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(svg)
    return svg


def render_pmp_svg(pmp, windows, path: str | None = None) -> str:
    """Pan-matrix-profile heat panel: one row per window size, cell
    intensity = profile value (normalized per row)."""
    rows = []
    for lvl, w_ in enumerate(windows):
        prof = np.asarray(pmp[lvl], dtype=np.float64)
        rows.append((w_, prof))
    height = _PAD * 2 + 14 * len(rows)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{height}" '
        f'viewBox="0 0 {_W} {height}">'
    ]
    for r, (w_, prof) in enumerate(sorted(rows)):
        finite = np.isfinite(prof)
        lo = prof[finite].min() if finite.any() else 0.0
        hi = prof[finite].max() if finite.any() else 1.0
        span = (hi - lo) or 1.0
        cell_w = (_W - 2 * _PAD) / max(prof.size, 1)
        y = _PAD + r * 14
        for i, v in enumerate(prof):
            if not np.isfinite(v):
                continue
            shade = int(255 * (1.0 - (v - lo) / span))
            parts.append(
                f'<rect x="{_PAD + i * cell_w:.1f}" y="{y}" width="{cell_w:.2f}" '
                f'height="12" fill="rgb({shade},{shade},255)"/>'
            )
        parts.append(
            f'<text x="2" y="{y + 10}" font-size="10" fill="#555">w={w_}</text>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(svg)
    return svg
