"""1-D matrix profile: STMP / STAMP / STOMP / MPX, discovery, MPDist, update.

Pure-NumPy reimplementation of the reference's MatrixProfile
(/root/reference/matrixprofile.go). The reference parallelizes with
goroutine batches merged over channels; here each batch is a vectorized
NumPy pass and batches are folded sequentially in batch order, which
reproduces the reference's merge-order tie semantics exactly
(mergeMPResults, matrixprofile.go:607-661). Inside Spark this module
runs per conv_id inside Arrow-batched pandas UDFs; the batch dimension
additionally maps to separate Spark tasks for very long series (see
operators/profile.py).

Parity-critical details preserved (see SURVEY.md §7.4):
- STOMP/STAMP/STMP min-update uses ``<=`` (latest row wins ties,
  matrixprofile.go:536/748/868); MPX uses strict ``>`` in Pearson space
  (earliest diagonal wins, matrixprofile.go:1038-1044).
- Exclusion zones: w/2 for STAMP/STOMP/STMP (matrixprofile.go:481,505),
  max(1, w/4) for MPX (matrixprofile.go:998-1001).
- Within one MPX diagonal a cell's diagonal-side update precedes its
  offset-side update (offset j-diag is visited before offset j), so the
  vectorized version applies the diagonal-side mask first.
- mass divides by b_std without a zero-guard (matrixprofile.go:461);
  constant windows yield Inf/NaN exactly as in Go.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from .av import create_av
from .discover import discover_segments_from_idx
from .mass import calculate_distance_profile, cross_correlate, distance_profile
from .util import (
    apply_exclusion_zone,
    diag_batching_scheme,
    e2p,
    mov_mean_std,
    mu_invn,
    p2e,
)

_MAXINT = np.iinfo(np.int64).max


@dataclass
class MPOpts:
    """Options mirroring MPOpts (matrixprofile.go:350-370).

    Defaults: MPX, sample 1.0, Euclidean. n_jobs defaults to 1 (each
    Spark task is single-threaded; intra-series parallelism comes from
    diagonal batches mapped to separate tasks, not threads).
    ``seed`` is an extension: the reference's STAMP uses unseeded
    rand.Perm (matrixprofile.go:684), so its sampled output is
    irreproducible; we require a seed for determinism.
    """

    algorithm: str = "mpx"
    sample_pct: float = 1.0
    n_jobs: int = 1
    euclidean: bool = True
    remap_neg_corr: bool = False
    seed: int = 0


@dataclass
class MotifGroup:
    """A motif cluster: sorted member indices + seed pair distance (discover.go:9-12)."""

    idx: list[int] = field(default_factory=list)
    min_dist: float = 0.0


@dataclass
class AnalyzeOpts:
    """Defaults from NewAnalyzeOpts (analyze.go:5-20)."""

    k_motifs: int = 3
    r_motifs: float = 2.0
    k_discords: int = 3


class MatrixProfile:
    """Self- or AB-join matrix profile task (matrixprofile.go:28-86)."""

    def __init__(self, a, b=None, w: int = 0):
        a = np.ascontiguousarray(a, dtype=np.float64)
        if a.size == 0:
            raise ValueError("first slice is nil or has a length of 0")
        if b is not None:
            b = np.ascontiguousarray(b, dtype=np.float64)
            if b.size == 0:
                raise ValueError(
                    "second slice must be nil for self-join operation or have a length greater than 0"
                )
        self.a = a
        self.w = int(w)
        if b is None:
            self.b = a
            self.n = a.size
            self.self_join = True
        else:
            self.b = b
            self.n = b.size
            self.self_join = False
        if self.w > self.a.size or self.w > self.b.size:
            raise ValueError("subsequence length must be less than the timeseries")
        if self.w < 2:
            raise ValueError("subsequence length must be at least 2")
        self.av = "default"
        self.opts: MPOpts | None = None
        self.mp: np.ndarray | None = None
        self.idx: np.ndarray | None = None
        self.mpb: np.ndarray | None = None
        self.idxb: np.ndarray | None = None
        self.motifs: list[MotifGroup] = []
        self.discords: list[int] = []
        # caches (initCaches, matrixprofile.go:400-420)
        self._a_mean = self._a_std = self._b_mean = self._b_std = None
        self._bf = None

    # ------------------------------------------------------------------ caches

    def _init_caches(self) -> None:
        self._b_mean, self._b_std = mov_mean_std(self.b, self.w)
        self._a_mean, self._a_std = mov_mean_std(self.a, self.w)
        self._bf = np.fft.rfft(self.b)

    # ----------------------------------------------------------------- compute

    def compute(self, opts: MPOpts | None = None) -> "MatrixProfile":
        """Dispatch per Compute (matrixprofile.go:373-396)."""
        if opts is None:
            opts = MPOpts()
        self.opts = opts
        if opts.sample_pct < 1:
            self._stamp()
            return self
        algo = opts.algorithm
        if algo == "stomp":
            self._stomp()
        elif algo == "stamp":
            self._stamp()
        elif algo == "stmp":
            self._stmp()
        elif algo == "mpx":
            self._mpx()
        else:
            raise ValueError(f"Unsupported algorithm for matrix profile, {algo}")
        return self

    def _alloc(self, length: int) -> tuple[np.ndarray, np.ndarray]:
        return np.full(length, np.inf), np.full(length, _MAXINT, dtype=np.int64)

    def _merge(self, results, euclidean: bool, ba: bool = False) -> None:
        """Fold batch partials in batch order (mergeMPResults, matrixprofile.go:607-661)."""
        for res in results:
            if res is None:
                continue
            bmp, bidx, bmpb, bidxb = res
            if bmp is not None:
                if euclidean:
                    m = bmp <= self.mp
                else:
                    m = np.abs(bmp) < np.abs(self.mp)
                self.mp[m] = bmp[m]
                self.idx[m] = bidx[m]
            if bmpb is not None:
                if euclidean:
                    m = bmpb <= self.mpb
                else:
                    m = np.abs(bmpb) < np.abs(self.mpb)
                self.mpb[m] = bmpb[m]
                self.idxb[m] = bidxb[m]

    # STMP — naive O(n² log n) ordered join (matrixprofile.go:514-544)
    def _stmp(self) -> None:
        self._init_caches()
        n_prof = self.n - self.w + 1
        self.mp, self.idx = self._alloc(n_prof)
        for i in range(self.a.size - self.w + 1):
            prof = distance_profile(
                self.a, self.b, self.w, i, self._b_std, self.self_join, self._bf
            )
            m = prof <= self.mp
            self.mp[m] = prof[m]
            self.idx[m] = i
        return

    # STAMP — randomly ordered anytime join (matrixprofile.go:668-756)
    def _stamp(self) -> None:
        if self.opts.sample_pct <= 0.0:
            raise ValueError(
                f"must provide a sampling greater than 0 and at most 1, sample: {self.opts.sample_pct:.3f}"
            )
        self._init_caches()
        n_prof = self.n - self.w + 1
        self.mp, self.idx = self._alloc(n_prof)
        rng = np.random.default_rng(self.opts.seed)
        rand_idx = rng.permutation(self.a.size - self.w + 1)
        n_jobs = max(1, self.opts.n_jobs)
        batch_size = (self.a.size - self.w + 1) // n_jobs + 1
        results = [
            self._stamp_batch(b, batch_size, self.opts.sample_pct, rand_idx)
            for b in range(n_jobs)
        ]
        self._merge(results, euclidean=True)

    def _stamp_batch(self, idx, batch_size, sample, rand_idx):
        if idx * batch_size + self.w > self.a.size:
            return None
        n_prof = self.n - self.w + 1
        mp, mpidx = self._alloc(n_prof)
        for i in range(int(batch_size * sample)):
            g = idx * batch_size + i
            if g >= rand_idx.size:
                break
            row = int(rand_idx[g])
            prof = distance_profile(
                self.a, self.b, self.w, row, self._b_std, self.self_join, self._bf
            )
            m = prof <= mp
            mp[m] = prof[m]
            mpidx[m] = row
        return mp, mpidx, None, None

    # STOMP — ordered O(n²) with incremental dot recurrence (matrixprofile.go:763-876)
    def _stomp(self) -> None:
        self._init_caches()
        n_prof = self.n - self.w + 1
        self.mp, self.idx = self._alloc(n_prof)
        n_jobs = max(1, self.opts.n_jobs)
        batch_size = (self.a.size - self.w + 1) // n_jobs + 1
        results = [self._stomp_batch(b, batch_size) for b in range(n_jobs)]
        self._merge(results, euclidean=True)

    def _stomp_batch(self, idx, batch_size):
        a, b, w = self.a, self.b, self.w
        if idx * batch_size + w > a.size:
            return None
        start = idx * batch_size
        n, n_prof = self.n, self.n - w + 1
        dot = cross_correlate(a[start : start + w], b, self._bf)
        profile = calculate_distance_profile(
            dot, start, w, self._a_mean, self._a_std, self._b_mean, self._b_std, self.self_join
        )
        mp = profile.copy()
        mpidx = np.full(profile.size, start, dtype=np.int64)
        # preallocated buffers for the O(1)-per-cell row recurrence
        # (dot[j] = dot[j-1] - B[j-1]·A[row-1] + B[j+w-1]·A[row+w-1],
        # matrixprofile.go:851-862) and the distance conversion
        dot2 = np.empty(n_prof)
        t1 = np.empty(n_prof)
        t2 = np.empty(n_prof)
        diff = np.empty(n_prof - 1)
        tb = np.empty(n_prof - 1)
        b_head = b[: n - w]
        b_tail = b[w:n]
        wbm = float(w) * self._b_mean
        wbs = float(w) * self._b_std
        two_w = 2.0 * float(w)
        zone = w // 2
        for i in range(1, batch_size):
            row = start + i
            if row - 1 >= a.size or row + w - 1 >= a.size:
                break
            np.multiply(b_tail, a[row + w - 1], out=diff)
            np.multiply(b_head, a[row - 1], out=tb)
            diff -= tb
            np.add(dot[:-1], diff, out=dot2[1:])
            # first cell recomputed fresh (cache shortcut breaks on AB-joins)
            dot2[0] = np.dot(a[row : row + w], b[:w])
            dot, dot2 = dot2, dot
            # distance: sqrt(2w·|1 - (dot - w·μB·μA_i)/(w·σB·σA_i)|)
            np.multiply(wbm, self._a_mean[row], out=t1)
            np.subtract(dot, t1, out=t1)
            np.multiply(wbs, self._a_std[row], out=t2)
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 /= t2
                np.subtract(1.0, t1, out=t1)
                np.abs(t1, out=t1)
                t1 *= two_w
                np.sqrt(t1, out=t1)
            if self.self_join:
                apply_exclusion_zone(t1, row, zone)
            upd = np.nonzero(t1 <= mp)[0]
            if upd.size:
                mp[upd] = t1[upd]
                mpidx[upd] = row
        return mp, mpidx, None, None

    # MPX — diagonal-traversal Pearson-space join (matrixprofile.go:878-1198)
    def _mpx(self) -> None:
        w = self.w
        len_a = self.a.size - w + 1
        len_b = self.b.size - w + 1
        self.mp, self.idx = self._alloc(len_a)
        if not self.self_join:
            self.mpb, self.idxb = self._alloc(len_b)

        mua, siga = mu_invn(self.a, w)
        if self.self_join:
            mub, sigb = mua, siga
        else:
            mub, sigb = mu_invn(self.b, w)

        # difference streams: df[i+1] = ½(A[w+i]-A[i]);
        # dg[i+1] = (A[w+i]-μ[i+1]) + (A[i]-μ[i])  (matrixprofile.go:904-919)
        dfa = np.zeros(len_a)
        dga = np.zeros(len_a)
        dfa[1:] = 0.5 * (self.a[w : w + len_a - 1] - self.a[: len_a - 1])
        dga[1:] = (self.a[w : w + len_a - 1] - mua[1:len_a]) + (
            self.a[: len_a - 1] - mua[: len_a - 1]
        )
        if self.self_join:
            dfb, dgb = dfa, dga
        else:
            dfb = np.zeros(len_b)
            dgb = np.zeros(len_b)
            dfb[1:] = 0.5 * (self.b[w : w + len_b - 1] - self.b[: len_b - 1])
            dgb[1:] = (self.b[w : w + len_b - 1] - mub[1:len_b]) + (
                self.b[: len_b - 1] - mub[: len_b - 1]
            )

        n_jobs = max(1, self.opts.n_jobs)
        scheme = diag_batching_scheme(len_a, n_jobs)
        if self.self_join:
            c0_all = self._mpx_c0_all(mua)
            results = [
                self._mpx_batch(bidx, mua, siga, dfa, dga, bsz, c0_all)
                for bidx, bsz in scheme
            ]
        else:
            results = [
                self._mpxab_batch(bidx, mua, siga, dfa, dga, mub, sigb, dfb, dgb, bsz)
                for bidx, bsz in scheme
            ]
        self._merge(results, self.opts.euclidean)

        if self.self_join:
            return
        scheme = diag_batching_scheme(len_b, n_jobs)
        results = [
            self._mpxba_batch(bidx, mua, siga, dfa, dga, mub, sigb, dfb, dgb, bsz)
            for bidx, bsz in scheme
        ]
        self._merge(results, self.opts.euclidean)

    def _mpx_c0_all(self, mu):
        """Seed correlations for EVERY diagonal in one FFT sliding dot:
        c0[diag] = <a[diag:diag+w] - mu[diag], a[:w] - mu[0]>
                 = slidingdot(a[:w]-mu[0], a)[diag] - mu[diag]·Σ(a[:w]-mu[0]).
        Replaces len_a small np.dot calls (one per diagonal) with a
        single O(n log n) pass — ~15-20% of the whole MPX kernel."""
        a, w = self.a, self.w
        len_a = a.size - w + 1
        first = a[:w] - mu[0]
        bf = np.fft.rfft(a)
        return cross_correlate(first, a, bf)[:len_a] - mu[:len_a] * first.sum()

    def _mpx_batch(self, idx, mu, sig, df, dg, batch_size, c0_all=None):
        """One diagonal batch of the self-join (matrixprofile.go:996-1054).

        Per-diagonal vectorized: each diagonal is one cumsum + a handful
        of in-cache vector ops over the remaining offsets (the working
        vectors are O(n) and L2-resident, which beats 2-D blocking —
        measured: large blocks fall out of cache and run 5x slower,
        (D×T)-tiled variants with cumsum carry also lose, and packing
        (df, dg) into complex128 to fuse the two cross-multiplies into
        one Im(z·z') pass loses too: complex multiply computes the
        unused real part and .imag reads strided).
        Updates preserve Go's exact tie order: strict > in Pearson space
        with diagonals ascending, and within a diagonal the
        diagonal-side touch of a cell precedes its offset-side touch
        (offset j-diag is visited before offset j).
        """
        a, w = self.a, self.w
        excl = max(1, w // 4)
        len_a = a.size - w + 1
        if idx + excl > len_a:
            return None
        mp = np.full(len_a, -1.0)
        mpidx = np.zeros(len_a, dtype=np.int64)
        remap = self.opts.remap_neg_corr
        d_start = idx + excl
        d_end = min(idx + batch_size + excl, len_a)
        if d_start >= d_end:
            if self.opts.euclidean:
                mp = p2e(mp, w)
            return mp, mpidx, None, None
        if c0_all is None:
            c0_all = self._mpx_c0_all(mu)

        max_o = len_a - d_start
        t1 = np.empty(max_o)
        t2 = np.empty(max_o)
        for diag in range(d_start, d_end):
            omax = len_a - diag
            b1 = t1[:omax]
            b2 = t2[:omax]
            # c evolves by +df[o]*dg[o+diag] + df[o+diag]*dg[o] per offset;
            # term[0] is 0 (df[0]=dg[0]=0), so seeding it with c0 before
            # the cumsum folds the "+ c0" into the scan (one fewer pass)
            np.multiply(df[:omax], dg[diag : diag + omax], out=b1)
            np.multiply(df[diag : diag + omax], dg[:omax], out=b2)
            b1 += b2
            b1[0] += c0_all[diag]
            np.cumsum(b1, out=b1)
            np.multiply(sig[:omax], sig[diag : diag + omax], out=b2)
            b1 *= b2
            if remap:
                np.abs(b1, out=b1)
            # diagonal-side update first (offset j-diag precedes offset j)
            seg = mp[diag : diag + omax]
            upd = np.nonzero(b1 > seg)[0]
            if upd.size:
                seg[upd] = b1[upd]
                mpidx[diag + upd] = upd
            # offset-side update
            upd = np.nonzero(b1 > mp[:omax])[0]
            if upd.size:
                mp[upd] = b1[upd]
                mpidx[upd] = upd + diag
        if self.opts.euclidean:
            mp = p2e(mp, w)
        return mp, mpidx, None, None

    def _mpxab_batch(self, idx, mua, siga, dfa, dga, mub, sigb, dfb, dgb, batch_size):
        """AB-direction diagonal batch (matrixprofile.go:1057-1126)."""
        a, b, w = self.a, self.b, self.w
        len_a = a.size - w + 1
        len_b = b.size - w + 1
        if idx > len_a:
            return None
        mp = np.full(len_a, -1.0)
        mpidx = np.zeros(len_a, dtype=np.int64)
        mpb = np.full(len_b, -1.0)
        mpidxb = np.zeros(len_b, dtype=np.int64)
        remap = self.opts.remap_neg_corr
        firstb = b[:w] - mub[0]
        for diag in range(idx, idx + batch_size):
            if diag >= len_a:
                break
            c0 = np.dot(a[diag : diag + w] - mua[diag], firstb)
            omax = min(len_a - diag, len_b)
            c = c0 + np.cumsum(
                dfb[:omax] * dga[diag : diag + omax] + dfa[diag : diag + omax] * dgb[:omax]
            )
            corr = c * (sigb[:omax] * siga[diag : diag + omax])
            if remap:
                corr = np.abs(corr)
            # A-side cell offset+diag then B-side cell offset — distinct
            # arrays, each touched once per diagonal, order immaterial
            seg = mp[diag : diag + omax]
            m = corr > seg
            seg[m] = corr[m]
            mpidx[diag : diag + omax][m] = np.nonzero(m)[0]
            m = corr > mpb[:omax]
            mpb[:omax][m] = corr[m]
            mpidxb[:omax][m] = np.nonzero(m)[0] + diag
        if self.opts.euclidean:
            mp = p2e(mp, w)
            mpb = p2e(mpb, w)
        return mp, mpidx, mpb, mpidxb

    def _mpxba_batch(self, idx, mua, siga, dfa, dga, mub, sigb, dfb, dgb, batch_size):
        """BA-direction diagonal batch (matrixprofile.go:1129-1198)."""
        a, b, w = self.a, self.b, self.w
        len_a = a.size - w + 1
        len_b = b.size - w + 1
        if idx > len_a:
            return None
        mp = np.full(len_a, -1.0)
        mpidx = np.zeros(len_a, dtype=np.int64)
        mpb = np.full(len_b, -1.0)
        mpidxb = np.zeros(len_b, dtype=np.int64)
        remap = self.opts.remap_neg_corr
        firsta = a[:w] - mua[0]
        for diag in range(idx, idx + batch_size):
            if diag >= len_b:
                break
            c0 = np.dot(b[diag : diag + w] - mub[diag], firsta)
            omax = min(len_b - diag, len_a)
            c = c0 + np.cumsum(
                dfa[:omax] * dgb[diag : diag + omax] + dfb[diag : diag + omax] * dga[:omax]
            )
            corr = c * (siga[:omax] * sigb[diag : diag + omax])
            if remap:
                corr = np.abs(corr)
            m = corr > mp[:omax]
            mp[:omax][m] = corr[m]
            mpidx[:omax][m] = np.nonzero(m)[0] + diag
            seg = mpb[diag : diag + omax]
            m = corr > seg
            seg[m] = corr[m]
            mpidxb[diag : diag + omax][m] = np.nonzero(m)[0]
        if self.opts.euclidean:
            mp = p2e(mp, w)
            mpb = p2e(mpb, w)
        return mp, mpidx, mpb, mpidxb

    # -------------------------------------------------------------- streaming

    def update(self, new_values) -> "MatrixProfile":
        """Append points, recompute only the last distance profile.

        matrixprofile.go:548-593. The min-scan deliberately excludes the
        new point's own cell (loop bound len(profile)-1), which is then
        argmin-filled. Equivalence with a full stomp() recompute is the
        reference's own contract (matrixprofile_test.go:706-762).

        Boundary-pair correction (reference artifact NOT replicated,
        like pmp.go's array overrun): the half-open exclusion zone
        [idx-z, idx+z) makes the pair (new-z, new) visible only from
        row new-z — a row Update never recomputes — while the full
        recompute sees it, so Go's own Update silently violates its
        equivalence contract whenever the new window's nearest neighbor
        sits at exactly w/2. We evaluate that single pair explicitly.
        """
        for val in np.atleast_1d(np.asarray(new_values, dtype=np.float64)):
            if self.self_join:
                self.a = np.append(self.a, val)
                self.b = self.a
            else:
                self.b = np.append(self.b, val)
            self.n += 1
            self.mp = np.append(self.mp, np.inf)
            self.idx = np.append(self.idx, _MAXINT)
            self._init_caches()
            profile = distance_profile(
                self.a, self.b, self.w, self.a.size - self.w, self._b_std, self.self_join, self._bf
            )
            head = profile[:-1]
            m = head <= self.mp[:-1]
            self.mp[:-1][m] = head[m]
            self.idx[:-1][m] = self.n - self.w
            min_idx = int(np.argmin(head)) if head.size else _MAXINT
            self.mp[self.n - self.w] = head[min_idx] if head.size else np.inf
            self.idx[self.n - self.w] = min_idx
            if self.self_join:
                zone = self.w // 2
                q = self.n - self.w
                p = q - zone
                if zone > 0 and p >= 0:
                    w_ = float(self.w)
                    dot = float(np.dot(self.a[p : p + self.w], self.a[q : q + self.w]))
                    with np.errstate(divide="ignore", invalid="ignore"):
                        d = np.sqrt(
                            2.0
                            * w_
                            * abs(
                                1.0
                                - (dot - w_ * self._b_mean[p] * self._b_mean[q])
                                / (w_ * self._b_std[p] * self._b_std[q])
                            )
                        )
                    # <= so an exact tie resolves to p: the recompute's
                    # STOMP merge is latest-row-wins (<=), and every head
                    # candidate for window q is a row j < q - zone = p, so
                    # on a tie the recompute reports p (r02 advisor item)
                    if d <= self.mp[q]:
                        self.mp[q] = d
                        self.idx[q] = p
        return self

    # -------------------------------------------------------------- discovery

    def apply_av(self) -> tuple[np.ndarray, np.ndarray]:
        """AV-corrected copies of MP / MPB (ApplyAV, matrixprofile.go:125-156)."""
        from .av import apply_single_av

        abmp = np.array(self.mp, dtype=np.float64, copy=True)
        bamp = (
            np.array(self.mpb, dtype=np.float64, copy=True)
            if self.mpb is not None
            else np.empty(0)
        )
        if not self.opts.euclidean:
            abmp = p2e(abmp, self.w)
            bamp = p2e(bamp, self.w)
        abmp = apply_single_av(abmp, self.a, self.w, self.av)
        if self.mpb is not None:
            bamp = apply_single_av(bamp, self.b, self.w, self.av)
        if not self.opts.euclidean:
            abmp = e2p(abmp, self.w)
            bamp = e2p(bamp, self.w)
        return abmp, bamp

    def discover_motifs(
        self, k: int, radius: float, neighbor_count: int = 10, exclusion_zone: int = 0
    ) -> list[MotifGroup]:
        """Greedy top-k motif groups (DiscoverMotifs, matrixprofile.go:1229-1333)."""
        if not self.self_join:
            raise ValueError("can only find top motifs if a self join is performed")
        if neighbor_count == 0:
            neighbor_count = 10
        motifs = [MotifGroup() for _ in range(k)]
        mp_current, _ = self.apply_av()
        if self._bf is None:
            self._init_caches()
        found = 0
        for j in range(k):
            motif_distance = np.inf
            min_idx = _MAXINT
            fin = np.where(mp_current < motif_distance)[0]
            if fin.size:
                min_idx = int(fin[np.argmin(mp_current[fin])])
                motif_distance = float(mp_current[min_idx])
            if min_idx == _MAXINT:
                # profile exhausted: reference returns the full k-length
                # slice with zero-value groups (matrixprofile.go:1269-1272)
                return motifs
            motif_set = {min_idx, int(self.idx[min_idx])}
            initial = [min_idx, int(self.idx[min_idx])]
            prof = distance_profile(
                self.a, self.b, self.w, initial[0], self._b_std, self.self_join, self._bf
            )
            apply_exclusion_zone(prof, initial[0], exclusion_zone)
            apply_exclusion_zone(prof, initial[1], exclusion_zone)
            for g in range(j, -1, -1):
                for m_idx in motifs[g].idx:
                    apply_exclusion_zone(prof, m_idx, exclusion_zone)
            while True:
                min_dist_idx = int(np.argmin(prof))
                if prof[min_dist_idx] < motif_distance * radius:
                    motif_set.add(min_dist_idx)
                    apply_exclusion_zone(prof, min_dist_idx, exclusion_zone)
                else:
                    break
                if len(motif_set) == neighbor_count:
                    break
            motifs[j] = MotifGroup(idx=sorted(motif_set), min_dist=motif_distance)
            for m_idx in motif_set:
                apply_exclusion_zone(mp_current, m_idx, exclusion_zone)
            found = j + 1
        self.motifs = motifs[:found]
        return self.motifs

    def discover_discords(self, k: int, exclusion_zone: int = 0) -> list[int]:
        """Greedy top-k discords (DiscoverDiscords, matrixprofile.go:1338-1374)."""
        mp_current, _ = self.apply_av()
        k = min(k, mp_current.size)
        discords: list[int] = []
        for _ in range(k):
            finite = ~np.isinf(mp_current)
            max_idx = None
            max_val = 0.0
            cand = np.where(finite & (mp_current > max_val))[0]
            if cand.size:
                max_idx = int(cand[np.argmax(mp_current[cand])])
            if max_idx is None:
                break
            discords.append(max_idx)
            apply_exclusion_zone(mp_current, max_idx, exclusion_zone)
        self.discords = discords
        return discords

    def discover_segments(self) -> tuple[int, float, np.ndarray]:
        """FLUSS segmentation over the profile index (matrixprofile.go:1382-1403)."""
        return discover_segments_from_idx(self.idx)

    def analyze(
        self, mo: MPOpts | None = None, ao: AnalyzeOpts | None = None
    ) -> tuple[list[MotifGroup], list[int]]:
        """Compute → motifs → discords (Analyze, matrixprofile.go:1203-1225).

        Visualization (matrixprofile.go:1224) is intentionally omitted;
        results come back as data (SURVEY.md §2.9).
        """
        self.compute(mo)
        if ao is None:
            ao = AnalyzeOpts()
        motifs = self.discover_motifs(ao.k_motifs, ao.r_motifs, 10, self.w // 2)
        discords = self.discover_discords(ao.k_discords, self.w // 2)
        return motifs, discords

    def visualize(self, filepath: str) -> None:
        """Render signal + profile + motif/discord markers to SVG
        (Visualize, matrixprofile.go:1406-1429; plotMP,
        visualize.go:86-127 — PNG via gonum/plot there, dependency-free
        SVG here)."""
        if self.mp is None:
            raise ValueError("matrix profile is not computed yet")
        from ..functions.visualize import render_profile_svg

        render_profile_svg(
            self.a, self.mp, self.w, self.motifs, self.discords, filepath
        )

    # ------------------------------------------------------------- persistence

    def to_json(self) -> str:
        """JSON snapshot, the reference's only storage format (matrixprofile.go:159-201)."""
        return json.dumps(
            {
                "a": self.a.tolist(),
                "b": None if self.self_join else self.b.tolist(),
                "n": self.n,
                "w": self.w,
                "self_join": self.self_join,
                "mp": None if self.mp is None else self.mp.tolist(),
                "pi": None if self.idx is None else self.idx.tolist(),
                "mp_ba": None if self.mpb is None else self.mpb.tolist(),
                "pi_ba": None if self.idxb is None else self.idxb.tolist(),
                "annotation_vector": self.av,
                "options": None
                if self.opts is None
                else {
                    "algorithm": self.opts.algorithm,
                    "sample_pct": self.opts.sample_pct,
                    "n_jobs": self.opts.n_jobs,
                    "euclidean": self.opts.euclidean,
                    "remap_negative_correlation": self.opts.remap_neg_corr,
                },
            }
        )

    @classmethod
    def from_json(cls, payload: str) -> "MatrixProfile":
        d = json.loads(payload)
        mp = cls(np.array(d["a"]), None if d["b"] is None else np.array(d["b"]), d["w"])
        mp.av = d.get("annotation_vector", "default")
        if d.get("mp") is not None:
            mp.mp = np.array(d["mp"], dtype=np.float64)
            mp.idx = np.array(d["pi"], dtype=np.int64)
        if d.get("mp_ba") is not None:
            mp.mpb = np.array(d["mp_ba"], dtype=np.float64)
            mp.idxb = np.array(d["pi_ba"], dtype=np.int64)
        o = d.get("options")
        if o:
            mp.opts = MPOpts(
                algorithm=o["algorithm"],
                sample_pct=o["sample_pct"],
                n_jobs=o["n_jobs"],
                euclidean=o["euclidean"],
                remap_neg_corr=o["remap_negative_correlation"],
            )
        return mp

    def save(self, filepath: str, fmt: str = "json") -> None:
        if fmt != "json":
            raise ValueError(f"invalid save format, {fmt}")
        with open(filepath, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, filepath: str, fmt: str = "json") -> "MatrixProfile":
        if fmt != "json":
            raise ValueError(f"invalid load format, {fmt}")
        with open(filepath) as f:
            return cls.from_json(f.read())


def compute_mp(a, b=None, w: int = 0, opts: MPOpts | None = None) -> MatrixProfile:
    """Convenience: New + Compute."""
    return MatrixProfile(a, b, w).compute(opts)


def mpx_tile_partial(
    x: np.ndarray,
    y: np.ndarray,
    r0: int,
    c0: int,
    n_row: int,
    n_col: int,
    w: int,
    remap_neg_corr: bool = False,
    self_join: bool = True,
):
    """SCAMP-style 2-D tile partial of the MPX self-join.

    The distributed decomposition for mega-series: instead of shipping
    the WHOLE series to every diagonal-batch task (shuffle volume B×n
    and a single-row assembly that hits Spark's 2 GiB ceiling around
    10^8 points), the distance matrix's upper triangle is tiled into
    (row-range × col-range) blocks and each task receives only the two
    O(T + w) segments its block touches.

    Self-join (default): x covers global positions
    [r0, r0 + n_row + w - 1) of the series; y covers
    [c0, c0 + n_col + w - 1); c0 >= r0 (upper triangle). The tile
    computes corr for all pairs (gi, gj) with gi in the row range,
    gj in the col range and gj - gi >= excl = max(1, w//4) — the MPX
    exclusion zone (matrixprofile.go:998-1001).

    AB-join (self_join=False): x is a segment of series A at offset r0,
    y a segment of series B at offset c0 — independent coordinate
    systems, ALL pairs valid (no exclusion zone,
    mpxabBatch/mpxbaBatch matrixprofile.go:1057-1198); mp_row carries
    A-side partials with B-space neighbor indices and mp_col the
    reverse.

    Both use the same difference-stream recurrence as mpxBatch:
    local df/dg/mu/sig at position p equal their global values because
    every quantity is window-local. Diagonal seeds come from one FFT
    sliding dot per side (two total). Diagonals are traversed in
    ascending global-diagonal order with strict > (earliest diagonal
    wins ties, Go parity).

    Returns (mp_row, idx_row, mp_col, idx_col): Pearson-space partial
    profiles for the tile's row / col offset ranges, neighbor indices
    GLOBAL. Callers convert with p2e and merge partials by max-corr.
    """
    from .mass import cross_correlate

    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    excl = max(1, w // 4)
    lx = x.size - w + 1
    ly = y.size - w + 1
    nr = min(n_row, lx)
    nc = min(n_col, ly)
    mp_row = np.full(max(nr, 0), -1.0)
    idx_row = np.zeros(max(nr, 0), dtype=np.int64)
    mp_col = np.full(max(nc, 0), -1.0)
    idx_col = np.zeros(max(nc, 0), dtype=np.int64)
    if nr <= 0 or nc <= 0:
        return mp_row, idx_row, mp_col, idx_col

    mux, sigx = mu_invn(x, w)
    muy, sigy = mu_invn(y, w)
    dfx = np.zeros(lx)
    dgx = np.zeros(lx)
    dfx[1:] = 0.5 * (x[w : w + lx - 1] - x[: lx - 1])
    dgx[1:] = (x[w : w + lx - 1] - mux[1:lx]) + (x[: lx - 1] - mux[: lx - 1])
    dfy = np.zeros(ly)
    dgy = np.zeros(ly)
    dfy[1:] = 0.5 * (y[w : w + ly - 1] - y[: ly - 1])
    dgy[1:] = (y[w : w + ly - 1] - muy[1:ly]) + (y[: ly - 1] - muy[: ly - 1])

    if self_join:
        off = c0 - r0
        d_min = max(-(nr - 1), excl - off)
    else:
        d_min = -(nr - 1)
    d_max = nc - 1
    if d_min > d_max:
        return mp_row, idx_row, mp_col, idx_col

    # seeds: <x[i:i+w]-mux[i], y[j:j+w]-muy[j]> = dot - w·mux[i]·muy[j]
    seeds_pos = cross_correlate(x[:w], y)[:ly] - float(w) * mux[0] * muy[:ly]
    seeds_neg = (
        cross_correlate(y[:w], x)[:lx] - float(w) * muy[0] * mux[:lx]
        if d_min < 0
        else None
    )

    t1 = np.empty(max(nr, nc))
    t2 = np.empty(max(nr, nc))
    for d in range(d_min, d_max + 1):
        if d >= 0:
            i0, j0 = 0, d
            m = min(nr, nc - d)
            seed = seeds_pos[d]
        else:
            i0, j0 = -d, 0
            m = min(nr + d, nc)
            seed = seeds_neg[-d]
        if m <= 0:
            continue
        b1 = t1[:m]
        b2 = t2[:m]
        np.multiply(dfx[i0 : i0 + m], dgy[j0 : j0 + m], out=b1)
        np.multiply(dfy[j0 : j0 + m], dgx[i0 : i0 + m], out=b2)
        b1 += b2
        b1[0] = seed  # first cell carries the exact FFT seed, no step term
        np.cumsum(b1, out=b1)
        np.multiply(sigx[i0 : i0 + m], sigy[j0 : j0 + m], out=b2)
        b1 *= b2
        if remap_neg_corr:
            np.abs(b1, out=b1)
        # row side first (global cell gi = r0+i0+t is the smaller index —
        # mirrors the whole-series kernel's diagonal-side-first order)
        seg = mp_row[i0 : i0 + m]
        upd = np.nonzero(b1 > seg)[0]
        if upd.size:
            seg[upd] = b1[upd]
            idx_row[i0 + upd] = c0 + j0 + upd
        seg = mp_col[j0 : j0 + m]
        upd = np.nonzero(b1 > seg)[0]
        if upd.size:
            seg[upd] = b1[upd]
            idx_col[j0 + upd] = r0 + i0 + upd
    return mp_row, idx_row, mp_col, idx_col


def mpdist(a, b, w: int, opts: MPOpts | None = None, av: str = "default") -> float:
    """Matrix-profile distance between two series (MPDist, matrixprofile.go:243-338).

    k = 0.05·(len a + len b); returns the k-th smallest (0-indexed) of
    the concatenated AB/BA AV-corrected profiles, or the global max
    (Euclidean) / min (Pearson) when the profiles are shorter than k.
    """
    mp = MatrixProfile(a, b, w)
    mp.av = av
    mp.compute(opts)
    mpab, mpba = mp.apply_av()

    k = int(0.05 * (np.asarray(a).size + np.asarray(b).size))
    vals = np.concatenate([mpab, mpba])
    euclidean = mp.opts.euclidean
    if k < vals.size:
        if not euclidean:
            vals = -vals
        res = np.partition(vals, k)[k]
        return float(-res) if not euclidean else float(res)
    # degenerate path: trackVal starts at 0 (Euclidean) / 1 (Pearson)
    # (matrixprofile.go:308-311)
    track = 0.0 if euclidean else 1.0
    for d in np.concatenate([mp.mp, mp.mpb if mp.mpb is not None else np.empty(0)]):
        if euclidean:
            track = max(track, d)
        else:
            track = min(track, d)
    return float(track)
