"""MP3 (MPEG-1 Layer III) frame-level parsing, ISO/IEC 11172-3.

Upgrades the mp3 stand-in from "opaque random bytes" to the same tier
the AVI/MP4 container walks occupy: the FRAME STRUCTURE is real —
sync-word scan, header field decode (version/layer/bitrate/sample-rate/
padding), per-frame length arithmetic (144 * bitrate / sample_rate +
padding) — so duration, frame count and bitrate profile are exact
header-derived physics. Only the PCM reconstruction (Huffman + IMDCT +
hybrid filterbank) stays out of scope: that is the part that genuinely
needs a codec library, and payloads whose frames don't parse fall to
the multimodal stub path.

The writer emits spec-conformant frame headers with deterministic
filler main_data, which is exactly what a header-walk demuxer (or a
duration estimator, the common production use) consumes.
"""

from __future__ import annotations

import numpy as np

_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_SAMPLE_RATES_V1 = [44100, 48000, 32000]
_SAMPLES_PER_FRAME = 1152


def _frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def encode_mp3_frames(
    duration_s: float,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    seed: int = 0,
) -> bytes:
    """Spec-conformant MPEG-1 Layer III frame sequence of at least
    ``duration_s`` seconds: valid headers, deterministic filler
    main_data. Padding alternates the way CBR encoders pad at
    non-integral frame sizes (frame i padded iff i is odd and the
    exact size is fractional)."""
    if sample_rate not in _SAMPLE_RATES_V1:
        raise ValueError(f"sample_rate must be one of {_SAMPLE_RATES_V1}")
    if bitrate_kbps not in _BITRATES_V1L3[1:]:
        raise ValueError(f"unsupported MPEG-1 L3 bitrate {bitrate_kbps}")
    br_idx = _BITRATES_V1L3.index(bitrate_kbps)
    sr_idx = _SAMPLE_RATES_V1.index(sample_rate)
    n_frames = max(1, -(-int(duration_s * sample_rate) // _SAMPLES_PER_FRAME))
    fractional = (144 * bitrate_kbps * 1000) % sample_rate != 0
    rng = np.random.default_rng([seed, sample_rate, bitrate_kbps])
    out = bytearray()
    for i in range(n_frames):
        padding = 1 if (fractional and i % 2 == 1) else 0
        # AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM: sync, MPEG-1 (11),
        # Layer III (01), no CRC (1), bitrate, sample rate, padding,
        # stereo (00)
        h1 = 0xFF
        h2 = 0b11111011
        h3 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        h4 = 0b00000100  # joint-stereo off, mode ext 01, no copyright
        body_len = _frame_len(bitrate_kbps, sample_rate, padding) - 4
        body = rng.integers(0, 256, body_len, dtype=np.uint8)
        # a real main_data byte can't recreate a sync word right after
        # the header; avoid 0xFF in the first body byte so parsers that
        # re-sync defensively never split a frame
        if body_len:
            body[0] = body[0] & 0x7F
        out += bytes((h1, h2, h3, h4)) + body.tobytes()
    return bytes(out)


def parse_mp3_frames(buf: bytes) -> dict:
    """Walk the frame chain: (n_frames, sample_rate, bitrate_kbps list,
    duration_s, n_padded). Raises ValueError when the payload is not a
    parsable MPEG-1 Layer III stream (wrong sync, reserved indices,
    truncated tail) — the caller quarantines/stubs those."""
    pos, n = 0, len(buf)
    frames, sample_rate, n_padded = [], None, 0
    while pos + 4 <= n:
        if buf[pos] != 0xFF or (buf[pos + 1] & 0xFE) != 0xFA:
            raise ValueError(f"bad sync at byte {pos}")
        # protection bit (buf[pos+1] & 1): when CRC is present the
        # 2-byte checksum sits inside the frame length, so the walk
        # needs no special handling — frames are NOT CRC-validated here
        br_idx = buf[pos + 2] >> 4
        sr_idx = (buf[pos + 2] >> 2) & 0x3
        padding = (buf[pos + 2] >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"reserved bitrate/sample-rate index at {pos}")
        sr = _SAMPLE_RATES_V1[sr_idx]
        if sample_rate is None:
            sample_rate = sr
        elif sr != sample_rate:
            raise ValueError("sample rate changes mid-stream")
        flen = _frame_len(_BITRATES_V1L3[br_idx], sr, padding)
        if pos + flen > n:
            raise ValueError(f"truncated final frame at {pos}")
        frames.append(_BITRATES_V1L3[br_idx])
        n_padded += padding
        pos += flen
    if not frames:
        raise ValueError("no MP3 frames")
    if pos != n:
        raise ValueError(f"{n - pos} trailing bytes after last frame")
    return {
        "n_frames": len(frames),
        "sample_rate": sample_rate,
        "bitrates_kbps": frames,
        "duration_s": len(frames) * _SAMPLES_PER_FRAME / sample_rate,
        "n_padded": n_padded,
    }


def mp3_features(buf: bytes, dim: int = 16) -> list[float]:
    """Header-walk audio features: duration, sample rate (kHz), frame
    count, mean/min/max bitrate, padded fraction, then a bitrate
    histogram — fixed head mirrors wav/flac features' physics-first
    layout."""
    info = parse_mp3_frames(buf)
    br = np.asarray(info["bitrates_kbps"], dtype=np.float64)
    head = [
        float(info["duration_s"]),
        info["sample_rate"] / 1000.0,
        float(info["n_frames"]),
        float(br.mean()),
        float(br.min()),
        float(br.max()),
        info["n_padded"] / info["n_frames"],
    ]
    k = max(1, dim - len(head))
    hist, _ = np.histogram(br, bins=k, range=(32.0, 320.0))
    hist = hist.astype(np.float64) / br.size
    return (head + hist.tolist())[:dim]
