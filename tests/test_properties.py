"""Property-based invariants (hypothesis) — deeper than the reference's
table-driven goldens (SURVEY.md §5): structural guarantees that must
hold for ANY input, not just fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from go_matrixprofile_spark.kernels.matrix_profile import MatrixProfile, MPOpts
from go_matrixprofile_spark.kernels.util import e2p, p2e


def series(min_n=12, max_n=80):
    return st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=64),
        min_size=min_n,
        max_size=max_n,
    ).map(lambda xs: np.asarray(xs, dtype=np.float64) + np.arange(len(xs)) * 1e-6)
    # the tiny ramp breaks constant windows so std > 0 (the IEEE
    # Inf/NaN semantics of constant windows are pinned separately by
    # the reference's own constant-series fixture)


def _well_conditioned(vals, w) -> bool:
    """Cross-path float comparisons are only meaningful when no window
    is near-constant relative to its magnitude: the (dot - w·µi·µj)
    cancellation error scales with (µ/σ)²·eps and dominates the (≈0)
    distances otherwise."""
    from go_matrixprofile_spark.kernels.util import mov_mean_std

    means, stds = mov_mean_std(vals, w)
    # near-zero distances carry sqrt-AMPLIFIED cancellation noise:
    # err(dist) ~ sqrt((mu/sigma)^2 * w * eps) — ratio 100 bounds it
    # near 4e-6, giving the 1e-4 assertions a ~25x margin
    return (
        bool(np.isfinite(stds).all())
        and stds.min() >= 1e-9
        and (np.abs(means).max() + 1.0) / stds.min() <= 100.0
    )


class TestProfileInvariants:
    @settings(max_examples=40, deadline=None)
    @given(series(), st.integers(min_value=2, max_value=8))
    def test_mpx_bounds_and_exclusion(self, vals, w):
        if vals.size < w + 4:
            return
        m = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="mpx"))
        n_prof = vals.size - w + 1
        excl = max(1, w // 4)
        assert m.mp.size == n_prof
        # z-normalized Euclidean distance is bounded by 2*sqrt(w)
        finite = np.isfinite(m.mp)
        assert (m.mp[finite] >= -1e-9).all()
        assert (m.mp[finite] <= 2.0 * np.sqrt(w) + 1e-9).all()
        # neighbor indices in range and outside the exclusion zone
        valid = m.idx >= 0
        assert (m.idx[valid] < n_prof).all()
        offs = np.arange(n_prof)[valid]
        assert (np.abs(m.idx[valid] - offs) >= excl).all()

    @settings(max_examples=25, deadline=None)
    @given(series(), st.integers(min_value=2, max_value=6))
    def test_algorithms_agree(self, vals, w):
        """STOMP / STMP / MPX produce the same profile values (their
        exclusion zones differ — w/2 vs w/4 — so compare where both are
        defined: stomp == stmp exactly, mpx <= stomp + tolerance since
        MPX sees strictly more candidate pairs)."""
        if vals.size < w + 4 or not _well_conditioned(vals, w):
            return
        stomp = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="stomp"))
        stmp = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="stmp"))
        # the reference's own cross-algorithm tolerance (SURVEY.md §5)
        np.testing.assert_allclose(stomp.mp, stmp.mp, atol=1e-4, equal_nan=True)
        mpx = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="mpx"))
        both = np.isfinite(stomp.mp) & np.isfinite(mpx.mp)
        assert (mpx.mp[both] <= stomp.mp[both] + 1e-4).all()

    @settings(max_examples=25, deadline=None)
    @given(series(min_n=20), st.integers(min_value=2, max_value=6))
    def test_stamp_anytime_upper_bound(self, vals, w):
        """STAMP's anytime property: a sampled profile is an elementwise
        UPPER bound of the full profile (each omitted row can only have
        lowered a cell), and sample_pct=1.0 equals STOMP."""
        if vals.size < w + 4 or not _well_conditioned(vals, w):
            return
        full = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="stomp"))
        half = MatrixProfile(vals, None, w).compute(
            MPOpts(algorithm="stamp", sample_pct=0.5, seed=3)
        )
        both = np.isfinite(full.mp) & np.isfinite(half.mp)
        assert (half.mp[both] >= full.mp[both] - 1e-4).all()
        one = MatrixProfile(vals, None, w).compute(
            MPOpts(algorithm="stamp", sample_pct=1.0)
        )
        np.testing.assert_allclose(one.mp, full.mp, atol=1e-4, equal_nan=True)

    @settings(max_examples=30, deadline=None)
    @given(series(min_n=24), st.integers(min_value=2, max_value=6),
           st.integers(min_value=1, max_value=6))
    def test_update_equals_recompute(self, vals, w, n_new):
        if vals.size < w + 6 + n_new or not _well_conditioned(vals, w):
            return
        cut = vals.size - n_new
        inc = MatrixProfile(vals[:cut].copy(), None, w).compute(
            MPOpts(algorithm="stomp")
        )
        inc.update(vals[cut:])
        full = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="stomp"))
        np.testing.assert_allclose(inc.mp, full.mp, atol=1e-4, equal_nan=True)


class TestConversions:
    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
            min_size=1,
            max_size=50,
        ),
        st.integers(min_value=2, max_value=64),
    )
    def test_p2e_e2p_roundtrip(self, corrs, w):
        p = np.asarray(corrs)
        back = e2p(p2e(p, w), w)
        np.testing.assert_allclose(back, np.clip(p, 0.0, 1.0), atol=1e-9)


class TestCompression:
    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            min_size=1,
            max_size=200,
        )
    )
    def test_gorilla_roundtrip_bit_exact(self, xs):
        from go_matrixprofile_spark.functions.compress import (
            compress_values,
            decompress_values,
        )

        vals = np.asarray(xs, dtype=np.float64)
        back = decompress_values(compress_values(vals))
        # bit-exact including NaN payloads and infinities
        assert (
            vals.view(np.uint64) == np.asarray(back, dtype=np.float64).view(np.uint64)
        ).all()
