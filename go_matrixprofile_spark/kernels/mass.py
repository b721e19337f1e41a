"""FFT sliding-dot-product + MASS distance kernels.

Reimplements the reference's crossCorrelate / mass / distanceProfile /
calculateDistanceProfile (matrixprofile.go:427-508) with numpy.fft.
The reference divides the inverse FFT by N explicitly; numpy's irfft is
already 1/N-normalized so no extra division appears here.
"""

from __future__ import annotations

import numpy as np

from .util import apply_exclusion_zone, z_normalize


def cross_correlate(q: np.ndarray, b: np.ndarray, bf: np.ndarray | None = None) -> np.ndarray:
    """Sliding dot product of query q against series b via FFT.

    matrixprofile.go:427-446: pad the reversed query to len(b), multiply
    spectra, inverse-transform, return positions w-1 .. end (length
    len(b)-len(q)+1).
    """
    q = np.asarray(q, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n = b.size
    w = q.size
    qpad = np.zeros(n)
    qpad[:w] = q[::-1]
    if bf is None:
        bf = np.fft.rfft(b)
    dot = np.fft.irfft(np.fft.rfft(qpad) * bf, n=n)
    return dot[w - 1 :]


def mass(
    q: np.ndarray,
    b: np.ndarray,
    b_std: np.ndarray,
    bf: np.ndarray | None = None,
) -> np.ndarray:
    """Mueen's algorithm for similarity search.  matrixprofile.go:451-464.

    dist[i] = sqrt(|2 (w - dot_i / b_std_i)|). Deliberately no zero-guard
    on b_std — constant windows produce Inf/NaN exactly like the
    reference (matrixprofile.go:461), which its constant-series fixture
    depends on.
    """
    qnorm = z_normalize(q)
    w = qnorm.size
    dot = cross_correlate(qnorm, b, bf)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(np.abs(2.0 * (float(w) - dot / b_std)))


def distance_profile(
    a: np.ndarray,
    b: np.ndarray,
    w: int,
    idx: int,
    b_std: np.ndarray,
    self_join: bool,
    bf: np.ndarray | None = None,
) -> np.ndarray:
    """Distance profile of subsequence A[idx:idx+w] vs every window of B.

    matrixprofile.go:470-484. Self-join applies an exclusion zone of w/2
    around idx.
    """
    if idx > a.size - w:
        raise ValueError(
            f"index {idx} beyond length of timeseries {a.size} minus subsequence length {w}"
        )
    profile = mass(a[idx : idx + w], b, b_std, bf)
    if self_join:
        apply_exclusion_zone(profile, idx, w // 2)
    return profile


def calculate_distance_profile(
    dot: np.ndarray,
    idx: int,
    w: int,
    a_mean: np.ndarray,
    a_std: np.ndarray,
    b_mean: np.ndarray,
    b_std: np.ndarray,
    self_join: bool,
) -> np.ndarray:
    """Convert a sliding dot product into a distance profile.

    matrixprofile.go:489-508:
    d[i] = sqrt(2w |1 - (dot_i - w·μB_i·μA_idx) / (w·σB_i·σA_idx)|)
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        profile = np.sqrt(
            2.0
            * float(w)
            * np.abs(
                1.0 - (dot - float(w) * b_mean * a_mean[idx]) / (float(w) * b_std * a_std[idx])
            )
        )
    if self_join:
        apply_exclusion_zone(profile, idx, w // 2)
    return profile
