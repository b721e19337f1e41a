"""MJPEG-in-MP4 (ISO base media file format, ISO/IEC 14496-12).

Retires the mp4-class video stub at the same tier the AVI path took:
the CONTAINER is parsed for real — ftyp/moov/trak box walk, sample
tables (stsd/stts/stsc/stsz/stco) resolved to per-sample byte ranges —
and because the sample entry is 'jpeg' (Motion-JPEG in MP4), every
sample decodes with the existing pure-NumPy baseline JPEG codec
(functions/media.decode_jpeg_baseline). No codec library is involved
anywhere; H.264/H.265-coded mp4s still fall to the multimodal stub
path by design (their samples genuinely need ffmpeg).

Writer layout: [ftyp][mdat][moov] with one video track, one chunk
holding all samples, timescale = fps and sample_delta = 1 so the mvhd
duration equals the frame count. The box tree is the minimal
spec-conformant subset a real demuxer needs: every full box carries
version/flags, stco points at the true file offset of sample 0.
"""

from __future__ import annotations

import struct

import numpy as np

from .media import decode_jpeg_baseline, encode_jpeg_baseline


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mjpeg_mp4(frames: np.ndarray, fps: int = 5, quality: int = 85) -> bytes:
    """(n, h, w, 3) uint8 frames -> MJPEG-in-MP4 bytes.

    Each frame is its own baseline JPEG sample in mdat; the moov sample
    tables describe one chunk of n samples with constant duration.
    """
    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[-1] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    samples = [encode_jpeg_baseline(f, quality=quality) for f in frames]
    sizes = [len(s) for s in samples]
    mdat = _box(b"mdat", b"".join(samples))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2")
    sample0_off = len(ftyp) + 8  # first sample sits right after mdat's header

    # ---- stbl
    visual = (
        struct.pack(">6xH", 1)  # reserved, data_reference_index
        + struct.pack(">HH12x", 0, 0)  # predefined/reserved block
        + struct.pack(">HH", w, h)
        + struct.pack(">II4xH", 0x480000, 0x480000, 1)  # 72dpi, frame_count
        + b"\x00" + b"\x00" * 31  # compressorname (pascal, empty)
        + struct.pack(">Hh", 24, -1)  # depth, predefined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", visual))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, sample0_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    # ---- minf / mdia / trak / moov
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">H6x", 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">4x") + b"vide" + b"\x00" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">III4xI8xHHHH", 0, 0, 1, n, 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">IH10x", 0x10000, 0x100)
        + _MATRIX
        + struct.pack(">24xI", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for sibling boxes in
    buf[start:end]; raises ValueError on truncated/absurd sizes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        fourcc = buf[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {fourcc!r} at {pos} (size {size})")
        yield fourcc, pos + 8, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    """Body range of the first box at the given nested path."""
    for fourcc, b0, b1 in _walk(buf, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return b0, b1
            return _find(buf, b0, b1, path[1:])
    raise ValueError(f"box {b'/'.join(path)!r} not found")


def parse_mp4(buf: bytes) -> dict:
    """Container-level metadata from the box tree — the real demux
    step: (brand, timescale, duration_s, width, height, n_samples,
    sample_format, sample_sizes, sample_offsets). Works on any
    single-video-track ISO BMFF file regardless of codec; only the
    SAMPLE DECODE below requires the 'jpeg' entry."""
    if len(buf) < 12:
        raise ValueError("not an ISO BMFF payload")
    f0, _ = _find(buf, 0, len(buf), [b"ftyp"])
    brand = buf[f0 : f0 + 4].decode("latin1")
    m0, m1 = _find(buf, 0, len(buf), [b"moov"])
    v0, _ = _find(buf, m0, m1, [b"mvhd"])
    if buf[v0] != 0:
        # version 1 moves timescale/duration past 64-bit timestamps;
        # refuse rather than read the timestamp halves as garbage
        raise ValueError(f"mvhd version {buf[v0]} unsupported (v0 only)")
    timescale, duration = struct.unpack(">II", buf[v0 + 12 : v0 + 20])
    t0, t1 = _find(buf, m0, m1, [b"trak"])
    # width/height are the last 8 bytes of tkhd (16.16 fixed point),
    # version-independent since we index from the box END
    _, k0, k1 = next(f for f in _walk(buf, t0, t1) if f[0] == b"tkhd")
    if buf[k0] != 0:
        raise ValueError(f"tkhd version {buf[k0]} unsupported (v0 only)")
    w16, h16 = struct.unpack(">II", buf[k1 - 8 : k1])
    s0, s1 = _find(buf, t0, t1, [b"mdia", b"minf", b"stbl"])
    d0, _ = _find(buf, s0, s1, [b"stsd"])
    fmt = buf[d0 + 12 : d0 + 16].decode("latin1")
    z0, _ = _find(buf, s0, s1, [b"stsz"])
    fixed, n = struct.unpack(">II", buf[z0 + 4 : z0 + 12])
    if fixed:
        sizes = [fixed] * n
    else:
        sizes = list(struct.unpack(f">{n}I", buf[z0 + 12 : z0 + 12 + 4 * n]))
    c0, _ = _find(buf, s0, s1, [b"stco"])
    (n_chunks,) = struct.unpack(">I", buf[c0 + 4 : c0 + 8])
    if n_chunks != 1:
        raise ValueError("only single-chunk sample layouts supported")
    (chunk_off,) = struct.unpack(">I", buf[c0 + 8 : c0 + 12])
    offsets, off = [], chunk_off
    for sz in sizes:
        offsets.append(off)
        off += sz
    if offsets and offsets[-1] + sizes[-1] > len(buf):
        raise ValueError("sample table points past end of file")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_s": duration / timescale if timescale else 0.0,
        "width": w16 >> 16,
        "height": h16 >> 16,
        "n_samples": n,
        "sample_format": fmt,
        "sample_sizes": sizes,
        "sample_offsets": offsets,
    }


def mp4_samples(buf: bytes) -> list[bytes]:
    """Raw per-sample byte strings via the resolved sample table."""
    info = parse_mp4(buf)
    return [
        buf[o : o + s]
        for o, s in zip(info["sample_offsets"], info["sample_sizes"])
    ]


def decode_mjpeg_mp4(buf: bytes) -> np.ndarray:
    """(n, h, w, 3) uint8 frames: box walk + per-sample baseline JPEG
    decode. Raises ValueError for non-'jpeg' sample entries (real
    codec-bound mp4s) — those stay on the multimodal stub path."""
    info = parse_mp4(buf)
    if info["sample_format"] != "jpeg":
        raise ValueError(
            f"sample entry {info['sample_format']!r} needs a codec library"
        )
    frames = [decode_jpeg_baseline(s) for s in mp4_samples(buf)]
    if not frames:
        raise ValueError("mp4 has no video samples")
    return np.stack(frames)


def mp4_features(buf: bytes, dim: int = 16) -> list[float]:
    """Same fixed head as mjpeg_features (w, h, n, mean luminance,
    motion energy) + luminance histogram, so downstream consumers are
    container-agnostic across AVI and MP4 video."""
    fr = decode_mjpeg_mp4(buf).astype(np.float64)
    n, h, w = fr.shape[:3]
    lum = fr @ np.array([0.299, 0.587, 0.114])
    motion = float(np.mean(np.abs(np.diff(lum, axis=0)))) if n > 1 else 0.0
    head = [float(w), float(h), float(n), float(lum.mean()), motion]
    k = max(1, dim - len(head))
    hist, _ = np.histogram(lum, bins=k, range=(0.0, 255.0))
    hist = hist.astype(np.float64) / max(1, lum.size)
    return (head + hist.tolist())[:dim]
