"""Pure-NumPy media codecs: RIFF/WAV PCM16, binary PPM (P6), baseline
JPEG (ITU T.81), and MJPEG-in-AVI video.

These formats are fully specified byte layouts that need no external
codec library, so the engine decodes them for REAL — the multimodal
stub (operators/multimodal.py) remains only for formats that genuinely
require ffmpeg (mp3/mp4), which this container lacks. Encoders exist
so tests and the synthetic corpus can produce valid payloads
deterministically.
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


# ---------------------------------------------------------------- JPEG (ITU T.81 baseline)
#
# Pure-NumPy baseline sequential JPEG, spec-conformant byte layout:
# JFIF APP0, Annex-K quantization + Huffman tables, 4:4:4 sampling (one
# 8x8 block per component per MCU), byte stuffing, ones'-complement
# coefficient coding. Written against the public ITU T.81 spec so the
# multimodal path decodes real image payloads without PIL; round-trip
# and DCT physics are pinned by tests/test_multimodal_lineage.py.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0, :] /= np.sqrt(2.0)
    return m


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length), per T.81 C.2."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(spec) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map for decoding."""
    return {(ln, cd): sym for sym, (cd, ln) in _huff_codes(spec).items()}


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.out)


def _coeff_bits(v: int) -> tuple[int, int]:
    """JPEG coefficient coding: (category, ones'-complement bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def encode_jpeg_baseline(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Baseline sequential JPEG (SOF0), 4:4:4, Annex-K tables."""
    import struct as _s

    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    comps = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    qtabs = [_scale_quant(_QUANT_LUMA, quality), _scale_quant(_QUANT_CHROMA, quality)]
    dc_codes = [_huff_codes(_DC_LUMA_SPEC), _huff_codes(_DC_CHROMA_SPEC)]
    ac_codes = [_huff_codes(_AC_LUMA_SPEC), _huff_codes(_AC_CHROMA_SPEC)]
    M = _dct_matrix()
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, hp, 8):
        for bx in range(0, wp, 8):
            for ci, plane in enumerate(comps):
                blk = plane[
                    min(by, h - 1) : by + 8, min(bx, w - 1) : bx + 8
                ]
                # edge-replicate partial blocks
                pad = np.pad(
                    blk,
                    ((0, 8 - blk.shape[0]), (0, 8 - blk.shape[1])),
                    mode="edge",
                )
                tq = ci > 0
                coef = M @ (pad - 128.0) @ M.T
                qc = np.round(coef / qtabs[tq]).astype(np.int64)
                zz = qc.flatten()[_ZIGZAG]
                dc, ac = dc_codes[tq], ac_codes[tq]
                size, extra = _coeff_bits(int(zz[0]) - prev_dc[ci])
                prev_dc[ci] = int(zz[0])
                code, ln = dc[size]
                bw.put(code, ln)
                bw.put(extra, size)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if nz.size else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac[0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    size, extra = _coeff_bits(v)
                    code, ln = ac[(run << 4) | size]
                    bw.put(code, ln)
                    bw.put(extra, size)
                    run = 0
                if last < 63:
                    code, ln = ac[0x00]  # EOB
                    bw.put(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return _s.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in tbl.flatten()[_ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    jfif = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof = seg(
        0xFFC0,
        bytes([8]) + _s.pack(">HH", h, w) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sos = seg(
        0xFFDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    return (
        b"\xff\xd8" + jfif + dqt(0, qtabs[0]) + dqt(1, qtabs[1]) + sof
        + dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
        + dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
        + sos + scan + b"\xff\xd9"
    )


class _BitReader:
    """MSB-first bit reader over a de-stuffed scan byte stream."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise ValueError("truncated JPEG scan")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_huff(self, lookup: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 17:
            code = (code << 1) | self.read(1)
            ln += 1
            sym = lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    """Ones'-complement coefficient decode (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_baseline(buf: bytes) -> np.ndarray:
    """Parse a baseline sequential JPEG (SOF0, 8-bit, no subsampling or
    restart intervals) → (h, w, 3) uint8 RGB (or (h, w, 1) grayscale).

    Pure NumPy + stdlib against the public ITU T.81 layout: marker walk,
    DQT/DHT/SOF0/SOS, canonical Huffman decode, dequantize, dezigzag,
    IDCT, YCbCr→RGB. Raises on progressive (SOF2), arithmetic coding,
    subsampled chroma, or DRI≠0 — the baseline subset matches what
    encode_jpeg_baseline emits and keeps the hot loop testable.
    """
    import struct as _s

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, quant_id)
    h = w = 0
    scan_comps: list[tuple[int, int, int]] = []  # (comp_id, dc_tid, ac_tid)
    scan_data = b""
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker desync in JPEG stream")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = _s.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                prec_id = body[bpos]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[bpos + 1 : bpos + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = zz
                qtabs[prec_id & 0xF] = tbl.reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                cls_id = body[bpos]
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                hufftabs[(cls_id >> 4, cls_id & 0xF)] = _huff_lookup((bits, vals))
                bpos += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = _s.unpack(">HH", body[1:5])
            nc = body[5]
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, samp, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            if _s.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS: entropy data follows until next marker
            ns = body[0]
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
            # de-stuff: FF00 -> FF; stop at any other FFxx marker
            raw = bytearray()
            p = pos
            while p < len(buf) - 1:
                if buf[p] == 0xFF:
                    if buf[p + 1] == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    break
                raw.append(buf[p])
                p += 1
            scan_data = bytes(raw)
            pos = p
    if not comps or not scan_data:
        raise ValueError("missing SOF0/SOS")

    M = _dct_matrix()
    rd = _BitReader(scan_data)
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.zeros((hp, wp)) for _ in comps]
    order = {cid: i for i, (cid, _, _) in enumerate(comps)}
    prev_dc = [0] * len(comps)
    for by in range(0, hp, 8):
        for bx in range(0, wp, 8):
            for cid, dct_id, act_id in scan_comps:
                ci = order[cid]
                dc_lu = hufftabs[(0, dct_id)]
                ac_lu = hufftabs[(1, act_id)]
                zz = np.zeros(64, dtype=np.int64)
                size = rd.read_huff(dc_lu)
                prev_dc[ci] += _extend(rd.read(size), size)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = rd.read_huff(ac_lu)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0 and run == 15:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(rd.read(size), size)
                    k += 1
                blk = np.zeros(64, dtype=np.float64)
                blk[_ZIGZAG] = zz
                coef = blk.reshape(8, 8) * qtabs[comps[ci][2]]
                planes[ci][by : by + 8, bx : bx + 8] = M.T @ coef @ M + 128.0
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_features(buf: bytes, dim: int = 16) -> list[float]:
    """Real image features from a decoded baseline JPEG: dims,
    per-channel means, luminance histogram — same layout as
    ppm_features so image features are format-agnostic downstream."""
    px = decode_jpeg_baseline(buf).astype(np.float64)
    h, w = px.shape[:2]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    means = px.reshape(-1, 3).mean(axis=0)
    lum = px @ np.array([0.299, 0.587, 0.114])
    head = [float(w), float(h), float(means[0]), float(means[1]), float(means[2])]
    k = max(1, dim - len(head))
    hist, _ = np.histogram(lum, bins=k, range=(0.0, 255.0))
    hist = hist.astype(np.float64) / max(1, lum.size)
    return (head + hist.tolist())[:dim]


# ---------------------------------------------------------------- MJPEG/AVI

def encode_mjpeg_avi(
    frames: np.ndarray, fps: int = 10, quality: int = 85
) -> bytes:
    """Motion-JPEG in a RIFF AVI container from (n, h, w, 3) uint8
    frames: proper avih/strh/strf headers, one '00dc' chunk per frame
    (each a standalone baseline JPEG), plus an idx1 index."""
    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    jpegs = [encode_jpeg_baseline(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    max_size = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1000000 // fps,  # microseconds per frame
        max_size * fps,  # max bytes per second
        0, 0x10,         # padding, flags (AVIF_HASINDEX)
        n, 0, 1, 0,      # total frames, initial, streams, sug. buffer
        w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0xFFFFFFFF & -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to 'movi' fourcc
    off = 4
    idx_entries = []
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(buf: bytes) -> np.ndarray:
    """(n, h, w, 3) uint8 frames from an MJPEG AVI: walk the RIFF
    chunk tree to the 'movi' LIST and decode every '00dc'/'00db'
    chunk as a baseline JPEG. Raises ValueError on malformed input."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")

    def walk(data: bytes, want: bytes) -> bytes | None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if fourcc == b"LIST":
                if body[:4] == want:
                    return body[4:]
                found = walk(body[4:], want)
                if found is not None:
                    return found
            pos += 8 + size + (size % 2)
        return None

    movi = walk(buf[12:], b"movi")
    if movi is None:
        raise ValueError("AVI has no movi list")
    frames = []
    pos = 0
    while pos + 8 <= len(movi):
        fourcc = movi[pos : pos + 4]
        (size,) = struct.unpack("<I", movi[pos + 4 : pos + 8])
        if fourcc in (b"00dc", b"00db"):
            frames.append(decode_jpeg_baseline(movi[pos + 8 : pos + 8 + size]))
        pos += 8 + size + (size % 2)
    if not frames:
        raise ValueError("AVI movi list has no video frames")
    return np.stack(frames)


def mjpeg_features(buf: bytes, dim: int = 16) -> list[float]:
    """Real video features from a decoded MJPEG AVI: dims, frame
    count, mean luminance, mean inter-frame motion energy, plus a
    luminance histogram — the fixed head keeps video features
    format-agnostic downstream (cf. ppm_features/jpeg_features)."""
    fr = decode_mjpeg_avi(buf).astype(np.float64)
    n, h, w = fr.shape[:3]
    lum = fr @ np.array([0.299, 0.587, 0.114])
    motion = (
        float(np.mean(np.abs(np.diff(lum, axis=0)))) if n > 1 else 0.0
    )
    head = [float(w), float(h), float(n), float(lum.mean()), motion]
    k = max(1, dim - len(head))
    hist, _ = np.histogram(lum, bins=k, range=(0.0, 255.0))
    hist = hist.astype(np.float64) / max(1, lum.size)
    return (head + hist.tolist())[:dim]
