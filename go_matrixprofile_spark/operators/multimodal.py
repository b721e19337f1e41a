"""Multimodal columns: images/audio/video as opaque binary + metadata.

The engine treats media as `binary` payload columns with typed metadata
structs, processed by Arrow-batched `mapInPandas` UDFs so bytes never
cross a per-row Python boundary.

Two decode tiers:
- REAL decode for byte formats needing no codec library, parsed with
  pure NumPy (functions/media.py, functions/flac.py, functions/mp4.py,
  functions/mp3.py): RIFF/WAV PCM16 (kind='wav'), FLAC per RFC 9639
  (kind='flac' or an audio payload with the fLaC magic), binary PPM
  (kind='ppm'), baseline sequential JPEG per ITU T.81 (kind='image'
  with an FFD8 payload), MJPEG video in BOTH containers — RIFF/AVI and
  ISO BMFF mp4 (box walk + per-sample JPEG decode) — and MP3 at the
  frame level (ISO 11172-3 header walk: exact duration/bitrate
  physics) — duration/RMS/ZCR/spectral-centroid for decoded audio,
  dims/channel-means/luminance-histogram for images, dims/frame-count/
  motion-energy/luminance for video.
- STUB only for payloads whose SAMPLES genuinely require a codec
  library (H.264/H.265 mp4 tracks, PCM reconstruction of mp3, png):
  decode_stub=True (default) derives a deterministic signature from
  payload byte statistics so plumbing, schemas, batch shapes, and
  partitioning stay fully real and testable; decode_stub=False raises
  NotImplementedError at the decode site.

Schemas:
  media(doc_id long, kind string, payload binary,
        meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
  features(doc_id long, kind string, n_bytes int, sha string,
           feature array<float>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        # per-row quarantine: non-null iff the real decoder failed on this
        # payload (truncated/progressive/etc) and the stub signature was
        # substituted — same corrupt-record posture as the JSONL source
        T.StructField("decode_err", T.StringType(), True),
    ]
)


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media corpus: REAL WAV/PPM payloads (decodable)
    interleaved with opaque random payloads for the stubbed kinds."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.flac import encode_flac
        from ..functions.media import (
            encode_jpeg_baseline,
            encode_mjpeg_avi,
            encode_ppm,
            encode_wav_pcm16,
        )
        from ..functions.mp3 import encode_mp3_frames
        from ..functions.mp4 import encode_mjpeg_mp4

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                kind = ["wav", "ppm", "image", "audio", "video", "flac"][int(i) % 6]
                if kind == "flac":
                    sr = 8000
                    dur = float(rng.uniform(0.05, 0.4))
                    t = np.arange(int(sr * dur)) / sr
                    freq = float(rng.uniform(100, 1000))
                    payload = encode_flac(0.5 * np.sin(2 * np.pi * freq * t), sr)
                    meta = {"width": None, "height": None, "sample_rate": sr, "n_frames": None}
                elif kind == "wav":
                    sr = 8000
                    dur = float(rng.uniform(0.05, 0.4))
                    t = np.arange(int(sr * dur)) / sr
                    freq = float(rng.uniform(100, 1000))
                    payload = encode_wav_pcm16(0.5 * np.sin(2 * np.pi * freq * t), sr)
                    meta = {"width": None, "height": None, "sample_rate": sr, "n_frames": None}
                elif kind == "ppm":
                    w = int(rng.integers(8, 64))
                    h = int(rng.integers(8, 64))
                    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    payload = encode_ppm(px)
                    meta = {"width": w, "height": h, "sample_rate": None, "n_frames": None}
                elif kind == "image":
                    # real baseline JPEG: smooth gradient + noise patch
                    w = int(rng.integers(8, 64))
                    h = int(rng.integers(8, 64))
                    gx = np.linspace(0, 255, w)[None, :].repeat(h, axis=0)
                    gy = np.linspace(0, 255, h)[:, None].repeat(w, axis=1)
                    px = np.stack([gx, gy, (gx + gy) / 2], axis=-1)
                    px += rng.normal(0, 8, px.shape)
                    payload = encode_jpeg_baseline(
                        np.clip(px, 0, 255).astype(np.uint8), quality=85
                    )
                    meta = {"width": w, "height": h, "sample_rate": None, "n_frames": None}
                elif kind == "video":
                    # real MJPEG video, container alternating between
                    # RIFF/AVI and ISO BMFF mp4 (both decode for real)
                    w = int(rng.integers(8, 32))
                    h = int(rng.integers(8, 32))
                    nf = int(rng.integers(2, 8))
                    gx = np.linspace(0, 200, w)[None, :].repeat(h, axis=0)
                    frames = np.stack(
                        [np.clip(gx + 10.0 * f, 0, 255) for f in range(nf)]
                    )
                    frames = np.repeat(
                        frames[..., None], 3, axis=-1
                    ).astype(np.uint8)
                    if (int(i) // 6) % 2 == 0:
                        payload = encode_mjpeg_avi(frames, fps=5, quality=85)
                    else:
                        payload = encode_mjpeg_mp4(frames, fps=5, quality=85)
                    meta = {"width": w, "height": h, "sample_rate": None, "n_frames": nf}
                else:  # 'audio': real MPEG-1 Layer III frame stream
                    sr = 44100
                    dur = float(rng.uniform(0.1, 0.8))
                    br = int(rng.choice([96, 128, 192]))
                    payload = encode_mp3_frames(dur, sr, br, seed=int(i))
                    meta = {
                        "width": None,
                        "height": None,
                        "sample_rate": sr,
                        "n_frames": None,
                    }
                rows.append((int(i), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "payload", "meta"])

    return spark.range(n).repartition(max(1, min(n, 32))).mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract media payloads (Arrow-batched).

    WAV (RIFF/PCM16), FLAC (RFC 9639 subset, CRC+MD5-verified), PPM
    (P6), baseline JPEG (ITU T.81 SOF0), MJPEG video in both RIFF/AVI
    and ISO BMFF mp4 containers, and frame-level MP3 (ISO 11172-3
    header walk) decode for REAL via the pure-NumPy codecs in
    functions.media / functions.flac / functions.mp4 / functions.mp3.
    Only codec-bound samples remain stubbed (H.264-class mp4 tracks,
    mp3 PCM reconstruction, png): with decode_stub=True the "decoder"
    derives a deterministic dim-float signature from payload byte
    statistics — the Spark-side plumbing (schema, batching,
    partitioning, binary transport) is identical to a real decoder.

    Per-row quarantine (r03 advisor finding): a payload the real decoder
    rejects (truncated, progressive, subsampled …) must not kill the
    whole mapInPandas stage at corpus scale. Decode failures fall back
    to the stub signature and carry the exception in ``decode_err``;
    clean rows have decode_err NULL. NotImplementedError for stubbed
    kinds under decode_stub=False still raises — that's a configuration
    signal, not data corruption.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.flac import flac_features
        from ..functions.media import (
            jpeg_features,
            mjpeg_features,
            ppm_features,
            wav_features,
        )
        from ..functions.mp3 import mp3_features
        from ..functions.mp4 import mp4_features, parse_mp4

        def stub_sig(buf: bytes) -> np.ndarray:
            arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float32)
            # deterministic fake embedding: per-chunk byte means
            chunks = np.array_split(arr, dim)
            feat = np.array(
                [c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32
            )
            return (feat - feat.mean()) / (feat.std() + 1e-6)

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                buf = bytes(row.payload)
                feat, err = None, None
                try:
                    if row.kind == "wav":
                        feat = np.asarray(wav_features(buf, dim), dtype=np.float32)
                    elif row.kind in ("flac", "audio") and buf[:4] == b"fLaC":
                        feat = np.asarray(flac_features(buf, dim), dtype=np.float32)
                    elif (
                        row.kind == "audio"
                        and len(buf) >= 2
                        and buf[0] == 0xFF
                        and (buf[1] & 0xFE) == 0xFA
                    ):
                        feat = np.asarray(mp3_features(buf, dim), dtype=np.float32)
                    elif row.kind == "ppm":
                        feat = np.asarray(ppm_features(buf, dim), dtype=np.float32)
                    elif row.kind == "image" and buf[:2] == b"\xff\xd8":
                        feat = np.asarray(jpeg_features(buf, dim), dtype=np.float32)
                    elif (
                        row.kind == "video"
                        and buf[:4] == b"RIFF"
                        and buf[8:12] == b"AVI "
                    ):
                        feat = np.asarray(mjpeg_features(buf, dim), dtype=np.float32)
                    elif row.kind == "video" and buf[4:8] == b"ftyp":
                        # demux first: a HEALTHY mp4 whose sample entry
                        # is codec-bound (avc1/hev1-class) is NOT a
                        # quarantine case — leave feat/err None so the
                        # decode_stub gate below applies (raise under
                        # decode_stub=False, stub signature otherwise);
                        # corrupt box trees raise → quarantined
                        info = parse_mp4(buf)
                        if info["sample_format"] == "jpeg":
                            feat = np.asarray(
                                mp4_features(buf, dim), dtype=np.float32
                            )
                except Exception as e:  # noqa: BLE001 — quarantine, don't kill the stage
                    err = f"{type(e).__name__}: {e}"
                if feat is None and err is None and row.kind == "flac":
                    # kind explicitly claims FLAC but the magic is absent
                    # (truncated/corrupt): quarantine, don't silently stub
                    # (kind='image'/'video' with foreign magic stay on the
                    # stub path by design — they cover png/mp4-class
                    # payloads the container cannot decode)
                    err = "bad magic: kind='flac' payload lacks fLaC signature"
                if feat is None and err is None and not decode_stub:
                    raise NotImplementedError(
                        "codec-bound payload (H.264-class mp4 / mp3 PCM / "
                        "png) requires ffmpeg, absent in this image"
                    )
                if feat is None:  # stubbed kind, or quarantined decode failure
                    feat = stub_sig(buf)
                out.append(
                    (
                        row.doc_id,
                        row.kind,
                        len(buf),
                        hashlib.sha1(buf).hexdigest(),
                        feat.tolist(),
                        err,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "kind", "n_bytes", "sha", "feature", "decode_err"],
            )

    # spread an under-split source (e.g. one parquet row group): the
    # per-sample decode below is CPU-heavy and would serialize in 1 task
    from .spread import spread_input

    return spread_input(media).mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame.

    MJPEG payloads in BOTH containers are REAL: frame_bytes is the
    sampled frame's own standalone JPEG — the '00dc' chunk body for
    RIFF/AVI, the stsz/stco-resolved mdat sample for ISO BMFF mp4 —
    decodable downstream with decode_jpeg_baseline, so the image
    feature path applies per frame. Other payloads keep the stub
    behavior (even byte slices stand in for frames) so the plumbing
    stays exercised for formats that would need ffmpeg."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                buf = bytes(row.payload)
                if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
                    # walk to the movi list, emit every_n-th jpeg chunk
                    def walk(data: bytes, want: bytes) -> bytes | None:
                        pos = 0
                        while pos + 8 <= len(data):
                            fourcc = data[pos : pos + 4]
                            (size,) = struct.unpack(
                                "<I", data[pos + 4 : pos + 8]
                            )
                            body = data[pos + 8 : pos + 8 + size]
                            if fourcc == b"LIST":
                                if body[:4] == want:
                                    return body[4:]
                                found = walk(body[4:], want)
                                if found is not None:
                                    return found
                            pos += 8 + size + (size % 2)
                        return None

                    movi = walk(buf[12:], b"movi") or b""
                    pos, f_idx = 0, 0
                    while pos + 8 <= len(movi):
                        fourcc = movi[pos : pos + 4]
                        (size,) = struct.unpack("<I", movi[pos + 4 : pos + 8])
                        if fourcc in (b"00dc", b"00db"):
                            if f_idx % every_n == 0:
                                rows.append(
                                    (
                                        row.doc_id,
                                        f_idx,
                                        movi[pos + 8 : pos + 8 + size],
                                    )
                                )
                            f_idx += 1
                        pos += 8 + size + (size % 2)
                    continue
                if buf[4:8] == b"ftyp":
                    from ..functions.mp4 import mp4_samples

                    try:
                        samples = mp4_samples(buf)
                    except Exception:  # noqa: BLE001 — corrupt sample
                        # tables raise struct.error, not just ValueError;
                        # either way quarantine the payload (no frames)
                        # instead of killing the mapInPandas stage
                        samples = []
                    for f_idx in range(0, len(samples), every_n):
                        rows.append((row.doc_id, f_idx, samples[f_idx]))
                    continue
                n_frames = row.meta["n_frames"] if row.meta is not None else None
                if not n_frames:
                    continue
                per = max(1, len(buf) // int(n_frames))
                for f_idx in range(0, int(n_frames), every_n):
                    rows.append((row.doc_id, f_idx, buf[f_idx * per : (f_idx + 1) * per]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    from .spread import spread_input

    return (
        spread_input(media.where(F.col("kind") == "video"))
        .mapInPandas(kernel, schema)
    )
