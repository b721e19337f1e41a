"""Pure-NumPy media codecs: RIFF/WAV PCM16 and binary PPM (P6).

These two formats are fully specified byte layouts that need no
external codec library, so the engine decodes them for REAL — the
multimodal stub (operators/multimodal.py) remains only for formats
that genuinely require PIL/ffmpeg (jpeg/mp3/mp4), which this container
lacks. Encoders exist so tests and the synthetic corpus can produce
valid payloads deterministically.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM16 RIFF/WAVE from float samples in [-1, 1]."""
    data = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (data * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    datac = b"data" + struct.pack("<I", len(pcm))
    return hdr + fmt + datac + pcm


def decode_wav_pcm16(buf: bytes) -> tuple[int, np.ndarray]:
    """Parse a PCM16 RIFF/WAVE payload → (sample_rate, float64 samples
    in [-1, 1], channels flattened to mono by averaging)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, channels, data = 12, None, 1, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, channels, sr = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only uncompressed PCM16 is supported")
        elif cid == b"data":
            data = np.frombuffer(body[: sz - (sz % 2)], dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = data.astype(np.float64) / 32767.0
    if channels > 1:
        samples = samples[: (samples.size // channels) * channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return int(sr), samples


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6) from a (h, w, 3) uint8 array."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("PPM requires 3 channels")
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) payload → (h, w, 3) uint8, tolerating
    comments and arbitrary whitespace in the header."""
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raw = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


def wav_features(buf: bytes, dim: int = 16) -> list[float]:
    """Real audio features from a decoded WAV: duration, RMS,
    zero-crossing rate, spectral centroid (rfft), then per-chunk RMS
    profile padded/truncated to dim floats total."""
    sr, x = decode_wav_pcm16(buf)
    n = x.size
    dur = n / float(sr)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / sr)
        centroid = float((spec * freqs).sum() / spec.sum()) if spec.sum() > 0 else 0.0
    else:
        centroid = 0.0
    head = [dur, rms, zcr, centroid]
    k = max(1, dim - len(head))
    chunks = np.array_split(x, k)
    prof = [float(np.sqrt(np.mean(c * c))) if c.size else 0.0 for c in chunks]
    return (head + prof)[:dim]


def ppm_features(buf: bytes, dim: int = 16) -> list[float]:
    """Real image features from a decoded PPM: dims, per-channel means,
    then a normalized luminance histogram padded to dim floats total."""
    px = decode_ppm(buf).astype(np.float64)
    h, w, _ = px.shape
    means = px.reshape(-1, 3).mean(axis=0)
    lum = px @ np.array([0.299, 0.587, 0.114])
    head = [float(w), float(h), float(means[0]), float(means[1]), float(means[2])]
    k = max(1, dim - len(head))
    hist, _ = np.histogram(lum, bins=k, range=(0.0, 255.0))
    hist = hist.astype(np.float64) / max(1, lum.size)
    return (head + hist.tolist())[:dim]
