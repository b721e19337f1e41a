"""Pure-Python/NumPy FLAC codec (subset), written against the public
FLAC format specification (RFC 9639 / xiph.org format docs).

Retires the "audio is codec-bound" stub category for lossless audio:
FLAC needs only integer math — no DSP library — so the engine decodes
it for REAL, like WAV/PPM/JPEG/MJPEG-AVI before it. Supported subset
(the bitstream features every real encoder emits for simple material):

- fLaC marker + STREAMINFO metadata block (incl. the MD5 of the
  unencoded samples, verified on decode)
- fixed-blocksize frames, mono or independent stereo, 16-bit samples
- CONSTANT, VERBATIM, FIXED-predictor (order 0-4) and LPC subframes
  (any order on decode; encoder emits Levinson-Durbin LPC at
  ``lpc_order`` > 0 with 12-bit quantized coefficients)
- partitioned-Rice residual coding (4-bit parameters), partition
  order 0 on encode, any order on decode
- frame-header CRC-8 and whole-frame CRC-16, verified on decode

Wasted-bits and stereo decorrelation (left/side etc.) are not emitted
by this encoder and are rejected with a clear error on decode — the
honest boundary of the subset. Throughput note: Rice coding walks bits
in Python, which is fine for the clip-length payloads the multimodal
pipeline feature-extracts (mapInPandas batches, a few thousand samples
each).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.bytepos >= len(self.data):
                raise ValueError("flac: bitstream truncated")
            avail = 8 - self.bitpos
            take = min(n, avail)
            byte = self.data[self.bytepos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    n = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number")
        n = (n << 6) | (cont & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _levinson_durbin(autoc: np.ndarray, order: int) -> np.ndarray:
    """LPC coefficients from autocorrelation (classic recursion)."""
    err = autoc[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = autoc[i + 1] - np.dot(lpc[:i], autoc[i:0:-1])
        k = acc / err if err > 0 else 0.0
        lpc[i] = k
        lpc[:i] = lpc[:i] - k * lpc[i - 1 :: -1] if i else lpc[:i]
        err *= 1.0 - k * k
        if err <= 0:
            break
    return lpc


def _quantize_lpc(lpc: np.ndarray, precision: int = 12) -> tuple[np.ndarray, int]:
    """Quantize float LPC coefficients to `precision`-bit ints with a
    common power-of-two shift (the bitstream's qlp representation)."""
    cmax = float(np.abs(lpc).max())
    if cmax <= 0:
        return np.zeros(lpc.size, dtype=np.int64), 0
    # largest shift such that round(coef * 2^shift) fits precision bits
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    lim = (1 << (precision - 1)) - 1
    q = np.clip(np.round(lpc * (1 << shift)), -lim - 1, lim).astype(np.int64)
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    """Integer LPC residual exactly as the decoder will reconstruct:
    pred = (sum q[i] * x[n-1-i]) >> shift (arithmetic)."""
    order = q.size
    n = x.size
    hist = np.stack([x[order - 1 - i : n - 1 - i] for i in range(order)])
    pred = (q @ hist) >> shift
    return x[order:] - pred


def _best_rice_k(u: np.ndarray) -> int:
    best_k, best_bits = 0, None
    for k in range(15):
        bits = int((u >> k).sum()) + u.size * (1 + k)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
        if (u >> k).sum() == 0 and k > 0:
            break
    return best_k


def encode_flac(
    samples: np.ndarray, sample_rate: int, lpc_order: int = 8
) -> bytes:
    """Encode float samples in [-1, 1] (mono 1-D or (n, 2) stereo) to a
    spec-conformant FLAC stream (16-bit, fixed 4096-sample blocks).

    Per block and channel the encoder picks the cheapest of CONSTANT,
    FIXED order 0-2, Levinson-Durbin LPC of order ``lpc_order`` (12-bit
    quantized coefficients; 0 disables), or VERBATIM, by exact Rice bit
    cost — the same decision a production encoder makes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        chans = [np.clip(x, -1, 1)]
    elif x.ndim == 2 and x.shape[1] in (1, 2):
        chans = [np.clip(x[:, c], -1, 1) for c in range(x.shape[1])]
    else:
        raise ValueError("mono 1-D or (n, 1|2) stereo input required")
    pcm = [(c * 32767.0).round().astype(np.int64) for c in chans]
    n_total = pcm[0].size
    n_ch = len(pcm)

    interleaved = np.empty(n_total * n_ch, dtype="<i2")
    for c in range(n_ch):
        interleaved[c::n_ch] = pcm[c].astype("<i2")
    md5 = hashlib.md5(interleaved.tobytes()).digest()

    frames = bytearray()
    frame_idx = 0
    for start in range(0, n_total, _BLOCK):
        bs = min(_BLOCK, n_total - start)
        w = _BitWriter()
        w.put(0b11111111111110, 14)  # sync
        w.put(0, 1)  # reserved
        w.put(0, 1)  # fixed-blocksize strategy
        w.put(0b0111, 4)  # blocksize: 16-bit value-1 at header end
        w.put(0b0000, 4)  # sample rate: from STREAMINFO
        w.put(n_ch - 1, 4)  # independent channels
        w.put(0b100, 3)  # 16 bits per sample
        w.put(0, 1)  # reserved
        for b in _utf8_number(frame_idx):
            w.put(b, 8)
        w.put(bs - 1, 16)
        hdr = bytes(w.buf)  # byte-aligned here by construction
        assert w.nbits == 0
        w.put(_crc8(hdr), 8)

        for c in range(n_ch):
            blk = pcm[c][start : start + bs]
            w.put(0, 1)
            if bs == 1 or np.all(blk == blk[0]):
                w.put(0b000000, 6)  # CONSTANT
                w.put(0, 1)
                w.put(int(blk[0]), 16)
                continue

            def rice_cost(res):
                u = ((res << 1) ^ (res >> 63)).astype(np.int64)
                k = _best_rice_k(u)
                return int((u >> k).sum()) + u.size * (1 + k), k, u

            # candidate 1: best fixed predictor (order 0-2)
            order = min(
                range(3),
                key=lambda o: int(np.abs(_fixed_residual(blk, o)).sum())
                if bs > o
                else 1 << 62,
            )
            fres = _fixed_residual(blk, order)
            fbits, fk, fu = rice_cost(fres)
            fbits += order * 16

            # candidate 2: Levinson-Durbin LPC (12-bit quantized coefs)
            lbits = 1 << 62
            if 0 < lpc_order < bs:
                xf = blk.astype(np.float64)
                autoc = np.array(
                    [np.dot(xf[: bs - i], xf[i:]) for i in range(lpc_order + 1)]
                )
                qlp, shift = _quantize_lpc(
                    _levinson_durbin(autoc, lpc_order), 12
                )
                lres = _lpc_residual(blk, qlp, shift)
                lbits, lk, lu = rice_cost(lres)
                lbits += lpc_order * 16 + 4 + 5 + lpc_order * 12

            best = min(fbits, lbits, bs * 16)
            if best == bs * 16:
                w.put(0b000001, 6)  # VERBATIM is cheapest
                w.put(0, 1)
                for v in blk:
                    w.put(int(v), 16)
                continue
            if best == lbits:
                w.put(0b100000 | (lpc_order - 1), 6)  # LPC
                w.put(0, 1)
                for v in blk[:lpc_order]:
                    w.put(int(v), 16)
                w.put(12 - 1, 4)  # coefficient precision - 1
                w.put(shift, 5)
                for q in qlp:
                    w.put(int(q), 12)
                k, u = lk, lu
            else:
                w.put(0b001000 | order, 6)  # FIXED
                w.put(0, 1)  # no wasted bits
                for v in blk[:order]:
                    w.put(int(v), 16)
                k, u = fk, fu
            w.put(0b00, 2)  # 4-bit rice params
            w.put(0, 4)  # partition order 0
            w.put(k, 4)
            for uu in u:
                w.put_unary(int(uu) >> k)
                w.put(int(uu), k)
        w.align()
        body = w.bytes()
        frames += body + struct.pack(">H", _crc16(body))
        frame_idx += 1

    si = _BitWriter()
    si.put(_BLOCK if n_total else 0, 16)  # min blocksize
    si.put(_BLOCK, 16)  # max blocksize
    si.put(0, 24)  # min framesize unknown
    si.put(0, 24)  # max framesize unknown
    si.put(sample_rate, 20)
    si.put(n_ch - 1, 3)
    si.put(15, 5)  # bits per sample - 1
    si.put(n_total, 36)
    streaminfo = si.bytes() + md5
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return b"fLaC" + meta + bytes(frames)


def decode_flac(buf: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream (subset above) → (sample_rate, float64 mono
    samples in [-1, 1]; stereo averaged to mono like decode_wav_pcm16).
    Verifies header CRC-8, frame CRC-16 and the STREAMINFO MD5."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    sr = n_ch = bps = n_total = None
    md5_expect = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("flac: missing STREAMINFO")
        hdr = buf[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + blen]
        if btype == 0:
            r = _BitReader(body)
            r.read(16), r.read(16), r.read(24), r.read(24)
            sr = r.read(20)
            n_ch = r.read(3) + 1
            bps = r.read(5) + 1
            n_total = r.read(36)
            md5_expect = body[18:34]
        pos += 4 + blen
        if last:
            break
    if sr is None:
        raise ValueError("flac: missing STREAMINFO")
    if bps != 16:
        raise ValueError("flac: only 16-bit streams supported")

    chans: list[list[int]] = [[] for _ in range(n_ch)]
    while pos < len(buf):
        frame_start = pos
        r = _BitReader(buf, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        r.read(1)
        r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("flac: reserved blocksize code")
        if sr_code in (12, 13, 14):
            r.read(8 if sr_code == 12 else 16)
        hdr_len = r.bytepos - frame_start
        if _crc8(buf[frame_start : frame_start + hdr_len]) != r.read(8):
            raise ValueError("flac: frame header CRC mismatch")
        if ch_code > 1:
            raise ValueError("flac: only independent mono/stereo supported")

        for c in range(n_ch):
            if r.read(1):
                raise ValueError("flac: bad subframe padding bit")
            stype = r.read(6)
            if r.read(1):
                raise ValueError("flac: wasted bits not supported")
            def read_rice_residual(order: int) -> list[int]:
                method = r.read(2)
                if method != 0:
                    raise ValueError("flac: only 4-bit rice supported")
                porder = r.read(4)
                res: list[int] = []
                for p in range(1 << porder):
                    cnt = bs >> porder
                    if p == 0:
                        cnt -= order
                    k = r.read(4)
                    if k == 15:
                        raise ValueError("flac: rice escape not supported")
                    for _ in range(cnt):
                        q = r.read_unary()
                        u = (q << k) | r.read(k)
                        res.append((u >> 1) ^ -(u & 1))
                return res

            if stype == 0:
                v = r.read_signed(16)
                chans[c].extend([v] * bs)
            elif stype == 1:
                chans[c].extend(r.read_signed(16) for _ in range(bs))
            elif 8 <= stype <= 12:
                order = stype - 8
                warm = [r.read_signed(16) for _ in range(order)]
                out = list(warm)
                coefs = _FIXED_COEFS[order]
                for rr in read_rice_residual(order):
                    pred = sum(coefs[i] * out[-1 - i] for i in range(order))
                    out.append(pred + rr)
                chans[c].extend(out)
            elif stype >= 32:
                order = (stype & 31) + 1
                warm = [r.read_signed(16) for _ in range(order)]
                precision = r.read(4) + 1
                if precision == 16:
                    raise ValueError("flac: invalid qlp precision")
                shift = r.read_signed(5)
                if shift < 0:
                    raise ValueError("flac: negative qlp shift not supported")
                qlp = [r.read_signed(precision) for _ in range(order)]
                out = list(warm)
                for rr in read_rice_residual(order):
                    pred = sum(qlp[i] * out[-1 - i] for i in range(order)) >> shift
                    out.append(pred + rr)
                chans[c].extend(out)
            else:
                raise ValueError(f"flac: reserved subframe type {stype}")
        r.align()
        body_len = r.bytepos - frame_start
        (crc_expect,) = struct.unpack(">H", buf[r.bytepos : r.bytepos + 2])
        if _crc16(buf[frame_start : frame_start + body_len]) != crc_expect:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.bytepos + 2

    arr = np.array(chans, dtype=np.int64)[:, :n_total]
    interleaved = np.empty(arr.shape[1] * n_ch, dtype="<i2")
    for c in range(n_ch):
        interleaved[c::n_ch] = arr[c].astype("<i2")
    if md5_expect and md5_expect != b"\x00" * 16:
        if hashlib.md5(interleaved.tobytes()).digest() != md5_expect:
            raise ValueError("flac: decoded-audio MD5 mismatch")
    mono = arr.astype(np.float64).mean(axis=0) / 32767.0
    return int(sr), mono


def flac_features(buf: bytes, dim: int = 16) -> list[float]:
    """Same feature head as wav_features (duration, RMS, ZCR, spectral
    centroid + per-chunk RMS profile), from a REAL FLAC decode."""
    sr, x = decode_flac(buf)
    n = x.size
    dur = n / float(sr)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        if n > 1
        else 0.0
    )
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
