"""Golden-vector parity for discovery operators and annotation vectors.

Fixtures from matrixprofile_test.go:764-922, discover_test.go:8-54,
av/annotation_vector_test.go:8-108.
"""

import numpy as np
import pytest

from go_matrixprofile_spark.kernels import MatrixProfile, MPOpts, compute_mp
from go_matrixprofile_spark.kernels.av import create_av
from go_matrixprofile_spark.kernels.discover import (
    arc_curve,
    discover_segments_from_idx,
    iac,
)


class TestArcCurve:
    # discover_test.go:8-35
    @pytest.mark.parametrize(
        "idx,want",
        [
            ([1, 1, 1, 1, 1], [0, 0, 2, 1, 0]),
            ([4, 5, 6, 0, 2, 1, 0], [0, 3, 5, 6, 4, 2, 0]),
            ([4, 5, 12, 0, 2, 1, 0], [0, 3, 5, 5, 3, 1, 0]),
            ([4, 5, -1, 0, 2, 1, 0], [0, 3, 5, 5, 3, 1, 0]),
            ([4, 5, 6, 2, 2, 1, 0], [0, 2, 4, 6, 4, 2, 0]),
            ([2, 3, 0, 0, 6, 3, 4], [0, 3, 2, 0, 1, 2, 0]),
        ],
    )
    def test_golden(self, idx, want):
        np.testing.assert_allclose(arc_curve(np.array(idx)), want, atol=1e-7)


class TestIac:
    # discover_test.go:37-54
    def test_golden(self):
        assert abs(iac(62, 124) - 62) < 1e-7
        assert abs(iac(0, 124) - 0) < 1e-7


class TestDiscoverSegments:
    # matrixprofile_test.go:880-922 (via exported CAC fixtures)
    def test_golden_1(self):
        idx, val, histo = discover_segments_from_idx(np.array([4, 5, 6, 0, 2, 1, 0]))
        assert idx == 5
        assert abs(val - 0.7) < 1e-7
        np.testing.assert_allclose(histo, [1, 1, 1, 1, 1, 0.7, 1], atol=1e-4)

    def test_golden_2(self):
        idx, val, histo = discover_segments_from_idx(np.array([2, 3, 0, 0, 6, 3, 4]))
        assert idx == 3
        assert abs(val - 0.0) < 1e-7
        np.testing.assert_allclose(
            histo, [1, 1, 0.7, 0, 0.29166666, 0.7, 1], atol=1e-4
        )


class TestDiscoverDiscords:
    # matrixprofile_test.go:764-799: fabricate a profile then discover
    def _mp_with_profile(self):
        mp = MatrixProfile(np.arange(1.0, 7.0), None, 3)
        mp.opts = MPOpts(algorithm="stomp")
        mp.mp = np.array([1.0, 2.0, 3.0, 4.0])
        mp.idx = np.array([0, 0, 0, 0], dtype=np.int64)
        return mp

    def test_k4_zone0(self):
        assert self._mp_with_profile().discover_discords(4, 0) == [3, 3, 3, 3]

    def test_k4_zone1(self):
        assert self._mp_with_profile().discover_discords(4, 1) == [3, 1]

    def test_k10_zone1(self):
        assert self._mp_with_profile().discover_discords(10, 1) == [3, 1]

    def test_k0(self):
        assert self._mp_with_profile().discover_discords(0, 1) == []


class TestDiscoverMotifs:
    # matrixprofile_test.go:801-878
    def test_golden_groups(self):
        a = np.array(
            [0, 0, 0.56, 0.99, 0.97, 0.75, 0, 0, 0, 0.43, 0.98, 0.99, 0.65, 0, 0, 0, 0.6, 0.97, 0.965, 0.8, 0, 0, 0]
        )
        mp = compute_mp(a, None, 7, MPOpts(algorithm="stomp"))
        motifs = mp.discover_motifs(3, 2.0, 10, 7 // 2)
        got_idx = [g.idx for g in motifs]
        got_dist = [g.min_dist for g in motifs]
        assert got_idx == [[0, 14], [0, 7], [3, 10]]
        np.testing.assert_allclose(
            got_dist,
            [0.1459619228330262, 0.3352336136782056, 0.46369664551715467],
            atol=1e-7,
        )

    def test_small_case(self):
        a = np.array([0.0, 1, 0, 0, 1, 0, 0])
        mp = compute_mp(a, None, 3, MPOpts(algorithm="stomp"))
        motifs = mp.discover_motifs(2, 2.0, 10, 3 // 2)
        assert [g.idx for g in motifs] == [[0, 3], [1, 4]]

    def test_ab_join_errors(self):
        mp = compute_mp(
            np.array([0.0, 1, 0, 0, 1, 0, 0]),
            np.array([1.0, 0, 0, 1, 0, 0, 1]),
            3,
            MPOpts(algorithm="mpx"),
        )
        with pytest.raises(ValueError):
            mp.discover_motifs(2, 2.0, 10, 1)


class TestAnnotationVectors:
    # av/annotation_vector_test.go:8-108
    def test_default(self):
        np.testing.assert_allclose(create_av("default", np.zeros(6), 3), np.ones(4))

    def test_complexity(self):
        got = create_av("complexity", np.array([0.0, 3, 0, 2, 0, 1]), 3)
        want = [0.47295372330527, 0.32279030890406757, 0.13962038997193682, 0]
        np.testing.assert_allclose(got, want, atol=1e-7)

    @pytest.mark.parametrize(
        "ts,want",
        [
            ([0.0, 3, 0, 2, 0, 1], [0, 0, 1, 1]),
            ([-10.0, 10, -10, 1, -1, 1], [0, 0, 1, 1]),
        ],
    )
    def test_mean_std(self, ts, want):
        np.testing.assert_allclose(create_av("mean_std", np.array(ts), 3), want, atol=1e-7)

    @pytest.mark.parametrize(
        "ts,want",
        [
            ([0.0, 3, 0, 2, 0, 1], [0, 0.5, 0.5, 1]),
            ([0.0, 1, 2, 3, 4, 5], [0, 1, 1, 0]),
        ],
    )
    def test_clipping(self, ts, want):
        np.testing.assert_allclose(create_av("clipping", np.array(ts), 3), want, atol=1e-7)

    def test_invalid_kind(self):
        with pytest.raises(ValueError):
            create_av("nope", np.zeros(6), 3)


class TestAnalyze:
    # Analyze pipeline: Compute → motifs(3,2,10,w/2) → discords(3,w/2)
    # (matrixprofile.go:1203-1225), visualization omitted
    def test_runs(self):
        a = np.array(
            [0, 0, 0.56, 0.99, 0.97, 0.75, 0, 0, 0, 0.43, 0.98, 0.99, 0.65, 0, 0, 0, 0.6, 0.97, 0.965, 0.8, 0, 0, 0]
        )
        mp = MatrixProfile(a, None, 7)
        motifs, discords = mp.analyze(MPOpts(algorithm="stomp"))
        assert len(motifs) >= 1 and len(discords) >= 1
