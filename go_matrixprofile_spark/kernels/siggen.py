"""Deterministic synthetic signal generators (reference siggen/siggen.go).

Used to seed the synthetic transcript corpus and benchmark series. Noise
takes an explicit seeded Generator (the reference uses the global
unseeded rand, siggen/siggen.go:88-94 — we require determinism).
"""

from __future__ import annotations

import numpy as np


def sin(amp, freq, phase, offset, sample_rate, duration_sec) -> np.ndarray:
    """amp·sin(2π·f·i/fs + phase) + offset  (siggen/siggen.go:11-18)."""
    n = int(sample_rate * duration_sec)
    i = np.arange(n, dtype=np.float64)
    return amp * np.sin(2.0 * np.pi * freq * i / sample_rate + phase) + offset


def sawtooth(amp, freq, phase, offset, sample_rate, duration_sec) -> np.ndarray:
    """-2A/π · atan(cot(π·f·i/fs)) + offset  (siggen/siggen.go:22-29)."""
    n = int(sample_rate * duration_sec)
    i = np.arange(n, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = -2.0 * amp / np.pi * np.arctan(1.0 / np.tan(i / sample_rate * np.pi * freq)) + offset
    return out


def square(amp, freq, phase, offset, sample_rate, duration_sec) -> np.ndarray:
    """Sign of a sine, scaled (siggen/siggen.go:33-49)."""
    n = int(sample_rate * duration_sec)
    i = np.arange(n, dtype=np.float64)
    val = np.sin(2.0 * np.pi * freq * i / sample_rate + phase)
    return np.where(val > 0, amp, np.where(val < 0, -amp, 0.0)) + offset


def rect(amp, offset, width, sample_rate, duration_sec) -> np.ndarray:
    """Rectangular pulse (siggen/siggen.go:53-76)."""
    n = int(sample_rate * duration_sec)
    out = np.zeros(n)
    start = int((offset - width / 2.0) / sample_rate)
    end = int((offset + width / 2.0) / sample_rate)
    start = min(max(start, 0), n - 1)
    end = min(max(end, 0), n - 1)
    out[start:end] = amp
    return out


def line(slope, offset, n: int) -> np.ndarray:
    """slope·i + offset  (siggen/siggen.go:79-85)."""
    return slope * np.arange(n, dtype=np.float64) + offset


def noise(amp, n: int, rng: np.random.Generator | int = 0) -> np.ndarray:
    """amp·(U[0,1) - 0.5), explicitly seeded (siggen/siggen.go:88-94)."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    return amp * (rng.random(n) - 0.5)


def add(*sigs: np.ndarray) -> np.ndarray:
    """Elementwise sum padded to the longest signal (siggen/siggen.go:98-112)."""
    max_len = max((len(s) for s in sigs), default=0)
    out = np.zeros(max_len)
    for s in sigs:
        out[: len(s)] += s
    return out


def append_sigs(first: np.ndarray, *sigs: np.ndarray) -> np.ndarray:
    """Concatenate signals (siggen/siggen.go:115-130)."""
    return np.concatenate([first, *sigs]) if sigs else np.asarray(first, dtype=np.float64)
