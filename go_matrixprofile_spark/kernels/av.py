"""Annotation vectors (reference av/annotation_vector.go).

An annotation vector weights the matrix profile before discovery:
mp'[i] = mp[i] + (1 - av[i]) · max(mp)  (matrixprofile.go:113-118).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .util import mov_mean_std

DEFAULT = "default"
COMPLEXITY = "complexity"
MEAN_STD = "mean_std"
CLIPPING = "clipping"


def create_av(kind: str, ts: np.ndarray, m: int) -> np.ndarray:
    """Dispatch by enum (av/annotation_vector.go:24-39)."""
    ts = np.asarray(ts, dtype=np.float64)
    if kind == DEFAULT:
        return _default(ts, m)
    if kind == COMPLEXITY:
        return _complexity(ts, m)
    if kind == MEAN_STD:
        return _mean_std(ts, m)
    if kind == CLIPPING:
        return _clipping(ts, m)
    raise ValueError(f"invalid annotation vector specified with matrix profile, {kind}")


def _default(d: np.ndarray, m: int) -> np.ndarray:
    """All ones (av/annotation_vector.go:43-49)."""
    return np.ones(d.size - m + 1)


def _complexity(d: np.ndarray, m: int) -> np.ndarray:
    """sqrt of windowed sum of squared diffs, then (x-min)/max
    (av/annotation_vector.go:53-80 — note the denominator is max, not
    max-min, matching the reference)."""
    diff2 = np.diff(d) ** 2
    win = sliding_window_view(diff2, m - 1)[: d.size - m + 1]
    av = np.sqrt(win.sum(axis=1))
    max_av = av.max()
    if max_av == 0:
        return np.zeros_like(av)
    return (av - av.min()) / max_av


def _mean_std(d: np.ndarray, m: int) -> np.ndarray:
    """1 where sliding std < mean(stds) (av/annotation_vector.go:84-94)."""
    _, std = mov_mean_std(d, m)
    return (std < std.mean()).astype(np.float64)


def _clipping(d: np.ndarray, m: int) -> np.ndarray:
    """Inverted count of samples at the global max/min per window
    (av/annotation_vector.go:98-123)."""
    is_clip = ((d == d.max()) | (d == d.min())).astype(np.float64)
    av = sliding_window_view(is_clip, m).sum(axis=1)
    av = av - av.min()
    max_val = av.max()
    if max_val == 0:
        # reference divides by zero here producing NaN; but its tests
        # never hit this path — guard with all-ones (no deweighting)
        return np.ones_like(av)
    return 1.0 - av / max_val


def apply_single_av(mp: np.ndarray, ts: np.ndarray, w: int, kind: str) -> np.ndarray:
    """mp'[i] = mp[i] + (1-av[i])·max(mp), validating av ∈ [0,1]
    (applySingleAV, matrixprofile.go:88-121). max(mp) floors at 0."""
    avec = create_av(kind, ts, w)
    if avec.size != mp.size:
        raise ValueError(
            f"annotation vector length, {avec.size}, does not match matrix profile length, {mp.size}"
        )
    # Go scans with val > maxMP starting at 0 (matrixprofile.go:98-104):
    # +Inf propagates, NaN never compares true
    cand = mp[~np.isnan(mp)]
    max_mp = float(max(0.0, cand.max())) if cand.size else 0.0
    if np.any((avec < 0.0) | (avec > 1.0)):
        bad = int(np.argmax((avec < 0.0) | (avec > 1.0)))
        raise ValueError(
            f"got an annotation vector value of {avec[bad]:.3f} at index {bad}. must be between 0 and 1"
        )
    return mp + (1.0 - avec) * max_mp
