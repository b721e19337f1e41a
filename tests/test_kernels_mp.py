"""Golden-vector parity for the 1-D matrix profile algorithms.

Fixtures from /root/reference/matrixprofile_test.go (canonical series at
:419-421, MPX AB/remap at :631-653, constant-series at :548-549, MASS at
:233-236, crossCorrelate at :169-173). Tolerances mirror the reference:
1e-7 for STMP/STAMP/STOMP and primitives, 1e-4 for MPX
(matrixprofile_test.go:452/692).
"""

import numpy as np
import pytest

from go_matrixprofile_spark.kernels import MatrixProfile, MPOpts, compute_mp, mpdist
from go_matrixprofile_spark.kernels.mass import cross_correlate, distance_profile, mass
from go_matrixprofile_spark.kernels.util import mov_mean_std

SIG = np.array([0.0, 0.99, 1.0, 0.0, 0.0, 0.98, 1.0, 0.0, 0.0, 0.96, 1.0, 0.0])
WANT_MP = np.array(
    [
        0.014355034678331376,
        0.014355034678269504,
        0.0291386974835963,
        0.029138697483626783,
        0.01435503467830044,
        0.014355034678393249,
        0.029138697483504856,
        0.029138697483474377,
        0.0291386974835963,
    ]
)
WANT_IDX = np.array([4, 5, 6, 7, 0, 1, 2, 3, 4])


class TestNew:
    # matrixprofile_test.go:13-42
    def test_empty_a(self):
        with pytest.raises(ValueError):
            MatrixProfile([], None, 2)

    def test_empty_b(self):
        with pytest.raises(ValueError):
            MatrixProfile([1, 2, 3], [], 2)

    def test_w_too_large(self):
        with pytest.raises(ValueError):
            MatrixProfile([1, 2, 3], None, 4)

    def test_w_too_small(self):
        with pytest.raises(ValueError):
            MatrixProfile([1, 2, 3], None, 1)

    def test_self_join_flag(self):
        mp = MatrixProfile([1, 2, 3, 4], None, 2)
        assert mp.self_join and mp.n == 4

    def test_ab_join(self):
        mp = MatrixProfile([1, 2, 3, 4], [1, 2, 3, 4, 5], 2)
        assert not mp.self_join and mp.n == 5


class TestCrossCorrelate:
    # matrixprofile_test.go:159-217
    @pytest.mark.parametrize(
        "q,t,want",
        [
            ([1, 2], [1, 2, 3, 3, 2, 1], [5, 8, 9, 7, 4]),
            ([1, 2], [1, 2, 3, 3, 2, 1, 1], [5, 8, 9, 7, 4, 3]),
            ([1, 2, 1], [1, 2, 3, 4, 3, 2, 1], [8, 12, 14, 12, 8]),
            ([1, 2, 1], [1, 2, 3, 4, 3, 2, 1, 1], [8, 12, 14, 12, 8, 5]),
        ],
    )
    def test_golden(self, q, t, want):
        got = cross_correlate(np.array(q, dtype=float), np.array(t, dtype=float))
        np.testing.assert_allclose(got, want, atol=1e-7)


class TestMass:
    # matrixprofile_test.go:219-278
    def test_golden(self):
        q = np.array([0.0, 1.0, 1.0, 0.0])
        t = np.array([0.0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0])
        _, b_std = mov_mean_std(t, q.size)
        got = mass(q, t, b_std)
        want = [
            0,
            2.8284271247461903,
            4,
            2.8284271247461903,
            0,
            2.8284271247461903,
            4,
            2.8284271247461903,
            0,
        ]
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_near_zero_std_stress(self):
        # matrixprofile_test.go:233-236
        q = np.array([1.0, 1.0, 4.5, 4.5])
        t = np.array(
            [1e-6, 1e-5, 1e-5, 1e-5, 5, 5, 1e-5, 1e-5, 1e-5, 1e-5, 7, 7, 1e-5, 1e-5]
        )
        _, b_std = mov_mean_std(t, q.size)
        got = mass(q, t, b_std)
        assert got.size == t.size - q.size + 1
        assert np.isfinite(got).all()


class TestDistanceProfile:
    # matrixprofile_test.go:280-336: self-join exclusion zone w/2 at idx=0
    def test_exclusion_zone(self):
        t = np.array([0.0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0])
        _, b_std = mov_mean_std(t, 4)
        prof = distance_profile(t, t, 4, 0, b_std, self_join=True)
        assert np.isinf(prof[0]) and np.isinf(prof[1])
        assert np.isfinite(prof[2:]).all()

    def test_idx_out_of_range(self):
        t = np.array([0.0, 1, 1, 0, 0, 1])
        _, b_std = mov_mean_std(t, 4)
        with pytest.raises(ValueError):
            distance_profile(t, t, 4, 9, b_std, self_join=True)


@pytest.mark.parametrize("algo", ["stmp", "stamp", "stomp", "mpx"])
@pytest.mark.parametrize("n_jobs", [1, 2, 4, 100])
class TestCanonicalFixture:
    """matrixprofile_test.go:404-704 — identical MP/Idx for every
    algorithm and for n_jobs ∈ {1,2,4,100} (parallelism invariance)."""

    def test_canonical(self, algo, n_jobs):
        tol = 1e-4 if algo == "mpx" else 1e-7
        mp = compute_mp(SIG, None, 4, MPOpts(algorithm=algo, n_jobs=n_jobs))
        np.testing.assert_allclose(mp.mp, WANT_MP, atol=tol)
        np.testing.assert_array_equal(mp.idx, WANT_IDX)


class TestStompConstantSeries:
    # matrixprofile_test.go:548-549: constant series → all +Inf (or NaN) profile
    def test_constant(self):
        mp = compute_mp(np.ones(16), None, 4, MPOpts(algorithm="stomp"))
        assert not np.isfinite(mp.mp).any()


class TestMpxAbJoin:
    # matrixprofile_test.go:631-632
    def test_ab_1(self):
        a = np.array([1.0, 2, 1, 3, 1])
        b = np.array([2.0, 1, 1, 2, 1, 3, 1, -1, -2])
        mp = compute_mp(a, b, 2, MPOpts(algorithm="mpx"))
        np.testing.assert_allclose(mp.mp, [0, 0, 0, 0], atol=1e-4)
        np.testing.assert_array_equal(mp.idx, [2, 3, 2, 3])

    def test_ab_2(self):
        a = np.array([1.0, 1, 1, 1, 1])
        b = np.array([1.0, 1, 1, 1, 1, 2, 2, 3, 4, 5])
        mp = compute_mp(a, b, 2, MPOpts(algorithm="mpx"))
        np.testing.assert_allclose(mp.mp, [2, 2, 2, 2], atol=1e-4)
        np.testing.assert_array_equal(mp.idx, [0, 1, 2, 3])


class TestMpxRemapNegCorr:
    # matrixprofile_test.go:639-653
    SER = np.array([0.0, 1, 1, 1, 0, 0, 2, 1, 0, 0, 2, 1])

    def test_no_remap(self):
        mp = compute_mp(self.SER, None, 4, MPOpts(algorithm="mpx", remap_neg_corr=False))
        want = [1.9550, 1.8388, 0.8739, 0, 0, 1.9550, 0.8739, 0, 0]
        np.testing.assert_allclose(mp.mp, want, atol=1e-4)
        np.testing.assert_array_equal(mp.idx, [4, 2, 6, 7, 8, 1, 2, 3, 4])

    def test_remap(self):
        mp = compute_mp(self.SER, None, 4, MPOpts(algorithm="mpx", remap_neg_corr=True))
        want = [1.0183, 1.0183, 0.8739, 0, 0, 1.2060, 0.8739, 0, 0]
        np.testing.assert_allclose(mp.mp, want, atol=1e-4)
        np.testing.assert_array_equal(mp.idx, [6, 3, 4, 7, 8, 3, 2, 3, 4])

    def test_remap_parallel_values(self):
        # The reference only pins remap Idx at p=1 (matrixprofile_test.go:
        # 641-644): remapped |corr| ties resolve differently across batch
        # merges. Values must still be invariant at any p.
        for n_jobs in (2, 4, 100):
            mp = compute_mp(
                self.SER, None, 4, MPOpts(algorithm="mpx", remap_neg_corr=True, n_jobs=n_jobs)
            )
            want = [1.0183, 1.0183, 0.8739, 0, 0, 1.2060, 0.8739, 0, 0]
            np.testing.assert_allclose(mp.mp, want, atol=1e-4)


class TestStampSampling:
    def test_zero_sample_errors(self):
        # matrixprofile.go:669-671
        with pytest.raises(ValueError):
            compute_mp(SIG, None, 4, MPOpts(algorithm="stamp", sample_pct=0.0))

    def test_partial_sample_runs(self):
        mp = compute_mp(SIG, None, 4, MPOpts(algorithm="stamp", sample_pct=0.5, seed=7))
        assert mp.mp.size == SIG.size - 4 + 1


class TestUpdate:
    """Streaming ≡ batch contract (matrixprofile_test.go:706-762)."""

    def _assert_equals_recompute(self, mp):
        full = compute_mp(mp.a, None, 4, MPOpts(algorithm="stomp"))
        np.testing.assert_allclose(mp.mp, full.mp, atol=1e-7)

    def test_updates(self):
        mp = compute_mp(SIG.copy(), None, 4, MPOpts(algorithm="stomp"))
        mp.update([])
        self._assert_equals_recompute(mp)
        mp.update([0.5])
        self._assert_equals_recompute(mp)
        mp.update([0.2, 0.3, 0.4, 0.9])
        self._assert_equals_recompute(mp)

    def test_boundary_pair_at_half_window(self):
        """Regression: when an appended window's nearest neighbor sits at
        exactly w/2 before it, the half-open exclusion zone hides the
        pair from the new row's profile; Go's own Update misses it and
        violates its equivalence contract. Seed 16 constructs such a
        neighbor (full.idx[q] == q - w/2 for a post-cut q)."""
        w, n = 16, 68
        rng = np.random.default_rng(16)
        vals = np.abs(rng.normal(30, 20, n)).cumsum() * 0.01 + rng.random(n)
        cut = int(n * 0.8)
        full = compute_mp(vals, None, w, MPOpts(algorithm="stomp"))
        assert any(
            full.idx[q] == q - w // 2 for q in range(cut - w + 1, n - w + 1)
        ), "fixture must exercise the boundary pair"
        inc = compute_mp(vals[:cut].copy(), None, w, MPOpts(algorithm="stomp"))
        inc.update(vals[cut:])
        np.testing.assert_allclose(inc.mp, full.mp, atol=1e-9)


class TestMPDist:
    # matrixprofile_test.go:128-157: both golden pairs → distance ≈ 0
    def test_golden_1(self):
        a = np.array([1.0, 2, 3, 4, 3, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        b = np.array([0.0, 0, 0, 0, 0, 0, 0, 0, -1, -2, -3, -2, -1, 0, 1, 2, 1, 0])
        assert abs(mpdist(a, b, 5)) < 1e-4

    def test_golden_2(self):
        a = np.array([1.0, 2, 3, 4, 3, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        b = np.array([0.0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 1, 0])
        assert abs(mpdist(a, b, 5)) < 1e-4


class TestSaveLoad:
    # matrixprofile_test.go:85-126
    def test_roundtrip(self, tmp_path):
        mp = compute_mp(SIG, None, 4, MPOpts(algorithm="mpx"))
        path = str(tmp_path / "mp.json")
        mp.save(path)
        back = MatrixProfile.load(path)
        np.testing.assert_allclose(back.mp, mp.mp, atol=0)
        np.testing.assert_array_equal(back.idx, mp.idx)
        assert back.w == mp.w and back.self_join

    def test_bad_format(self, tmp_path):
        mp = compute_mp(SIG, None, 4)
        with pytest.raises(ValueError):
            mp.save(str(tmp_path / "x.csv"), "csv")
