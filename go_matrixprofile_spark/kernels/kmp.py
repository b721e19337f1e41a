"""k-dimensional matrix profile (mSTOMP), reference kmp.go.

For each query row idx, per-dim distance rows are sorted column-wise
across dimensions, cumulative-summed down dimensions, and the
"choose-k-of-d averaged" profile MP[d][i] = min(D[d][i]/(d+1)) is
min-updated (kmp.go:161-212).
"""

from __future__ import annotations

import json

import numpy as np

from .mass import cross_correlate
from .util import apply_exclusion_zone, mov_mean_std

_MAXINT = np.iinfo(np.int64).max


class KMP:
    """k-dim task: T is a k×n matrix of equal-length series (kmp.go:20-58)."""

    def __init__(self, t, w: int):
        t = [np.ascontiguousarray(row, dtype=np.float64) for row in t]
        if len(t) == 0 or t[0].size == 0:
            raise ValueError("slice is nil or has a length of 0")
        n = t[0].size
        for row in t:
            if row.size != n:
                raise ValueError("time series must have the same length")
        if w < 2:
            raise ValueError("subsequence length must be at least 2")
        if 2 * w >= n:
            raise ValueError("subsequence length must be less than half the timeseries")
        self.t = np.vstack(t)
        self.n = n
        self.w = int(w)
        self.mp: np.ndarray | None = None
        self.idx: np.ndarray | None = None
        self._t_mean = None
        self._t_std = None
        self._tf = None

    def _init_caches(self) -> None:
        """Sliding stats + per-dim FFT (kmp.go:134-153)."""
        means, stds = [], []
        for d in range(self.t.shape[0]):
            mu, sig = mov_mean_std(self.t[d], self.w)
            means.append(mu)
            stds.append(sig)
        self._t_mean = np.vstack(means)
        self._t_std = np.vstack(stds)
        self._tf = np.fft.rfft(self.t, axis=1)

    def compute(self) -> "KMP":
        return self._mstomp()

    def _mstomp(self) -> "KMP":
        """kmp.go:161-212, vectorized across profile positions per row."""
        self._init_caches()
        k, n, w = self.t.shape[0], self.n, self.w
        n_prof = n - w + 1
        self.mp = np.full((k, n_prof), np.inf)
        self.idx = np.full((k, n_prof), _MAXINT, dtype=np.int64)

        # first row's sliding dot per dim, reused as dots[d][0] seed
        cached = np.vstack(
            [cross_correlate(self.t[d, :w], self.t[d], self._tf[d]) for d in range(k)]
        )
        dots = cached.copy()
        d_mat = np.empty((k, n_prof))
        dims = np.arange(1, k + 1, dtype=np.float64)[:, None]
        for idx in range(n_prof):
            if idx > 0:
                # dots[d][j] = dots[d][j-1] - T[d][j-1]·T[d][idx-1]
                #            + T[d][j+w-1]·T[d][idx+w-1]  (kmp.go:185-189)
                dots[:, 1:] = (
                    dots[:, :-1]
                    - self.t[:, : n - w] * self.t[:, idx - 1 : idx][:, :1]
                    + self.t[:, w:n] * self.t[:, idx + w - 1 : idx + w][:, :1]
                )
                dots[:, 0] = cached[:, idx]
            with np.errstate(divide="ignore", invalid="ignore"):
                d_mat[:] = np.sqrt(
                    2.0
                    * w
                    * np.abs(
                        1.0
                        - (dots - w * self._t_mean * self._t_mean[:, idx : idx + 1])
                        / (w * self._t_std * self._t_std[:, idx : idx + 1])
                    )
                )
            for d in range(k):
                apply_exclusion_zone(d_mat[d], idx, w // 2)
            d_mat.sort(axis=0)  # columnWiseSort (kmp.go:245-256)
            np.cumsum(d_mat, axis=0, out=d_mat)  # columnWiseCumSum (kmp.go:258-267)
            scaled = d_mat / dims
            m = scaled < self.mp
            self.mp[m] = scaled[m]
            self.idx[m] = idx
        return self

    def visualize(self, filepath: str) -> None:
        """Render per-dim signals + per-level profiles to SVG
        (KMP.Visualize, kmp.go:290-302; plotKMP, visualize.go:129-164)."""
        if self.mp is None:
            raise ValueError("k-dimensional matrix profile is not computed yet")
        from ..functions.visualize import render_kmp_svg

        render_kmp_svg(self.t, self.mp, self.w, filepath)

    def to_json(self) -> str:
        """JSON snapshot (kmp.go:88-130)."""
        return json.dumps(
            {
                "t": self.t.tolist(),
                "n": self.n,
                "w": self.w,
                "mp": None if self.mp is None else self.mp.tolist(),
                "pi": None if self.idx is None else self.idx.tolist(),
            }
        )

    @classmethod
    def from_json(cls, payload: str) -> "KMP":
        d = json.loads(payload)
        kmp = cls(d["t"], d["w"])
        if d.get("mp") is not None:
            kmp.mp = np.array(d["mp"], dtype=np.float64)
            kmp.idx = np.array(d["pi"], dtype=np.int64)
        return kmp

    def save(self, filepath: str, fmt: str = "json") -> None:
        if fmt != "json":
            raise ValueError(f"invalid save format, {fmt}")
        with open(filepath, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, filepath: str, fmt: str = "json") -> "KMP":
        if fmt != "json":
            raise ValueError(f"invalid load format, {fmt}")
        with open(filepath) as f:
            return cls.from_json(f.read())
