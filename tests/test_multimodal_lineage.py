"""Multimodal plumbing + lineage/checkpoint resume tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestMultimodal:
    def test_feature_extraction_deterministic(self, spark):
        from go_matrixprofile_spark.operators.multimodal import (
            extract_features,
            synthesize_media,
        )

        media = synthesize_media(spark, 12)
        feats = extract_features(media, dim=16).orderBy("doc_id").toPandas()
        assert len(feats) == 12
        assert all(len(f) == 16 for f in feats["feature"])
        # deterministic regeneration
        again = extract_features(synthesize_media(spark, 12), dim=16).orderBy("doc_id").toPandas()
        assert (feats["sha"] == again["sha"]).all()

    def test_decode_stub_gate(self, spark):
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
            synthesize_media,
        )

        # every synthesized kind now decodes for real (wav/flac/ppm/
        # jpeg/mjpeg-avi/mjpeg-mp4/mp3-frames): decode_stub=False must
        # succeed across the whole corpus with no quarantined rows
        media = synthesize_media(spark, 12)
        feats = extract_features(media, decode_stub=False).toPandas()
        assert len(feats) == 12
        assert feats["decode_err"].isna().all()
        # a genuinely codec-bound payload (foreign magic) still raises
        # under decode_stub=False — that's a configuration signal
        foreign = spark.createDataFrame(
            [(0, "audio", b"\x89PNGnot-an-mp3-frame-stream", None)],
            MEDIA_SCHEMA,
        )
        with pytest.raises(Exception):
            extract_features(foreign, decode_stub=False).count()

    def test_flac_real_decode_through_spark(self, spark):
        """FLAC payloads decode for REAL (RFC 9639 subset: fixed
        predictors + Rice, CRC-8/16 + MD5 verified): a pure sine's RMS
        is amp/sqrt(2) and its spectral centroid sits at the tone —
        same physics pins as the WAV path."""
        import pandas as pd

        from go_matrixprofile_spark.functions.flac import encode_flac
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        sr, freq, amp = 8000, 440.0, 0.8
        t = np.arange(sr) / sr  # 1 second
        payload = encode_flac(amp * np.sin(2 * np.pi * freq * t), sr)
        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "flac", payload, {"width": None, "height": None,
                                       "sample_rate": sr, "n_frames": None})],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        # decode_stub=False: the FLAC path must be REAL, not the stub
        feats = extract_features(media, dim=16, decode_stub=False).toPandas()
        assert feats["decode_err"].iloc[0] is None
        dur, rms, zcr, centroid = feats["feature"].iloc[0][:4]
        assert abs(dur - 1.0) < 1e-6
        assert abs(rms - amp / np.sqrt(2)) < 1e-3
        assert abs(centroid - freq) < 2.0
        assert abs(zcr - 2 * freq / sr) < 0.01

    def test_flac_roundtrip_and_integrity(self):
        """Codec-level: bit-exact roundtrip (mono + stereo + constant +
        partial last block) and loud failure on corruption."""
        import numpy as np
        import pytest as _pytest

        from go_matrixprofile_spark.functions.flac import decode_flac, encode_flac

        rng = np.random.default_rng(31)
        sr = 16000
        for sig in (
            0.5 * np.sin(2 * np.pi * 330 * np.arange(5000) / sr),
            np.full(4097, 0.25),
            rng.normal(0, 0.2, 1234),
            np.stack([rng.normal(0, 0.3, 3000), rng.normal(0, 0.1, 3000)], axis=1),
        ):
            buf = encode_flac(sig, sr)
            got_sr, got = decode_flac(buf)
            assert got_sr == sr
            want = (np.clip(sig, -1, 1) * 32767.0).round() / 32767.0
            if want.ndim == 2:
                want = want.mean(axis=1)
            np.testing.assert_allclose(got, want, atol=1e-12)
        bad = bytearray(buf)
        bad[len(bad) // 2] ^= 0xFF
        with _pytest.raises(ValueError):
            decode_flac(bytes(bad))
        # LPC subframes: a pure sine must pick the Levinson-Durbin path
        # (cost-based), compress far better than fixed predictors, and
        # still roundtrip bit-exactly
        sine = 0.6 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)
        b_fixed = encode_flac(sine, sr, lpc_order=0)
        b_lpc = encode_flac(sine, sr, lpc_order=8)
        assert len(b_lpc) < 0.65 * len(b_fixed)
        _, got = decode_flac(b_lpc)
        want = (np.clip(sine, -1, 1) * 32767.0).round() / 32767.0
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_corrupt_payload_quarantined_not_fatal(self, spark):
        """A truncated JPEG (FFD8 magic, garbage body) must not kill the
        stage: the row survives with decode_err set and the stub
        signature, clean rows keep decode_err NULL (r03 advisor item)."""
        import pandas as pd

        from go_matrixprofile_spark.functions.media import encode_jpeg_baseline
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        good_px = np.full((16, 16, 3), 128, dtype=np.uint8)
        good = encode_jpeg_baseline(good_px, quality=85)
        bad = b"\xff\xd8\xff\xe0" + b"\x00" * 40  # truncated after APP0 magic
        meta = {"width": 16, "height": 16, "sample_rate": None, "n_frames": None}
        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "image", good, meta), (1, "image", bad, meta)],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feats = extract_features(media, dim=8).orderBy("doc_id").toPandas()
        assert len(feats) == 2  # stage survived the corrupt row
        assert feats["decode_err"].iloc[0] is None
        assert feats["decode_err"].iloc[1]  # quarantined with the reason
        assert len(feats["feature"].iloc[1]) == 8  # stub signature emitted

    def test_wav_real_decode_through_spark(self, spark):
        """WAV PCM16 payloads decode for REAL: a pure sine's RMS is
        amp/sqrt(2) and its spectral centroid sits at the tone."""
        import pandas as pd

        from go_matrixprofile_spark.functions.media import encode_wav_pcm16
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        sr, freq, amp = 8000, 440.0, 0.8
        t = np.arange(sr) / sr  # 1 second
        payload = encode_wav_pcm16(amp * np.sin(2 * np.pi * freq * t), sr)
        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "wav", payload, {"width": None, "height": None,
                                      "sample_rate": sr, "n_frames": None})],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feat = extract_features(media, dim=16).toPandas()["feature"].iloc[0]
        dur, rms, zcr, centroid = feat[:4]
        assert abs(dur - 1.0) < 1e-6
        assert abs(rms - amp / np.sqrt(2)) < 1e-3
        assert abs(centroid - freq) < 2.0
        # ~2 zero crossings per cycle
        assert abs(zcr - 2 * freq / sr) < 0.01

    def test_ppm_real_decode_through_spark(self, spark):
        """PPM P6 payloads decode for REAL: dims and channel means are
        exact, header comments tolerated."""
        import pandas as pd

        from go_matrixprofile_spark.functions.media import decode_ppm, encode_ppm
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        px = np.zeros((10, 20, 3), dtype=np.uint8)
        px[..., 0] = 200  # red-dominant
        px[..., 1] = 50
        payload = encode_ppm(px)
        # roundtrip + comment tolerance
        np.testing.assert_array_equal(decode_ppm(payload), px)
        commented = b"P6\n# a comment\n20 10\n255\n" + px.tobytes()
        np.testing.assert_array_equal(decode_ppm(commented), px)

        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "ppm", payload, {"width": 20, "height": 10,
                                      "sample_rate": None, "n_frames": None})],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feat = extract_features(media, dim=16).toPandas()["feature"].iloc[0]
        w, h, mr, mg, mb = feat[:5]
        assert (w, h) == (20.0, 10.0)
        assert (mr, mg, mb) == (200.0, 50.0, 0.0)

    def test_jpeg_roundtrip_physics(self):
        """Baseline JPEG codec (ITU T.81, pure NumPy): a constant image
        round-trips EXACTLY (all energy in dequantized DC), a smooth
        gradient round-trips within quantization error, a non-multiple-
        of-8 image keeps its dimensions, and malformed payloads raise."""
        from go_matrixprofile_spark.functions.media import (
            decode_jpeg_baseline,
            encode_jpeg_baseline,
        )

        c = np.full((16, 24, 3), 130, dtype=np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(c, quality=90))
        np.testing.assert_array_equal(out, c)

        h, w = 37, 51  # deliberately not multiples of 8
        gx = np.linspace(0, 255, w)[None, :].repeat(h, axis=0)
        gy = np.linspace(0, 255, h)[:, None].repeat(w, axis=1)
        img = np.stack([gx, gy, (gx + gy) / 2], axis=-1).astype(np.uint8)
        buf = encode_jpeg_baseline(img, quality=90)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        got = decode_jpeg_baseline(buf)
        assert got.shape == (h, w, 3)
        err = np.abs(got.astype(float) - img.astype(float))
        assert err.mean() < 2.0 and err.max() <= 12

        # quality monotonicity: lower quality -> smaller payload
        assert len(encode_jpeg_baseline(img, quality=30)) < len(buf)

        with pytest.raises(ValueError):
            decode_jpeg_baseline(b"\x00\x01\x02")
        with pytest.raises(ValueError):
            decode_jpeg_baseline(b"\xff\xd8" + b"\xff\xc2\x00\x04\x08\x00")

    def test_jpeg_real_decode_through_spark(self, spark):
        """kind='image' JPEG payloads decode for REAL through the Spark
        feature extractor: dims exact, channel means within
        quantization error of the source."""
        import pandas as pd

        from go_matrixprofile_spark.functions.media import encode_jpeg_baseline
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        px = np.zeros((24, 40, 3), dtype=np.uint8)
        px[..., 0] = 180
        px[..., 1] = 60
        px[..., 2] = 20
        payload = encode_jpeg_baseline(px, quality=90)
        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "image", payload, {"width": 40, "height": 24,
                                        "sample_rate": None, "n_frames": None})],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feat = extract_features(media, dim=16, decode_stub=False).toPandas()[
            "feature"
        ].iloc[0]
        w, h, mr, mg, mb = feat[:5]
        assert (w, h) == (40.0, 24.0)
        assert abs(mr - 180) <= 2 and abs(mg - 60) <= 2 and abs(mb - 20) <= 2

    def test_wav_roundtrip_multichannel_and_errors(self):
        from go_matrixprofile_spark.functions.media import (
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        x = np.sin(np.arange(100) / 7.0) * 0.3
        sr, back = decode_wav_pcm16(encode_wav_pcm16(x, 16000))
        assert sr == 16000
        np.testing.assert_allclose(back, x, atol=1.0 / 32767)
        with pytest.raises(ValueError):
            decode_wav_pcm16(b"nonsense bytes")

    def test_frame_sampling(self, spark):
        from go_matrixprofile_spark.operators.multimodal import (
            frame_sample,
            synthesize_media,
        )

        media = synthesize_media(spark, 12)
        frames = frame_sample(media, every_n=20).toPandas()
        assert len(frames) > 0
        assert (frames["frame_idx"] % 20 == 0).all()


class TestLineage:
    def test_checkpoint_resume_skips_committed(self, spark, tmp_path):
        from go_matrixprofile_spark.plans.lineage import checkpoint_stage, read_lineage

        root = str(tmp_path / "ckpt")
        df1 = spark.createDataFrame(
            [("c1", 1.0), ("c1", 2.0), ("c2", 3.0)], ["conv_id", "v"]
        )
        out1 = checkpoint_stage(df1, root, "tier_1m")
        assert out1.count() == 3
        lin = read_lineage(spark, root).toPandas()
        assert set(lin["partition_key"]) == {"c1", "c2"}

        # rerun with one new partition: committed partitions are skipped
        df2 = spark.createDataFrame(
            [("c1", 99.0), ("c3", 4.0)], ["conv_id", "v"]
        )
        out2 = checkpoint_stage(df2, root, "tier_1m")
        pdf = out2.toPandas()
        # c1 not rewritten (resume semantics): its value stays 1.0/2.0
        assert sorted(pdf[pdf.conv_id == "c1"]["v"]) == [1.0, 2.0]
        assert 4.0 in set(pdf["v"])
        lin = read_lineage(spark, root).toPandas()
        assert set(lin["partition_key"]) == {"c1", "c2", "c3"}
        # no duplicate lineage rows per partition
        assert lin.groupby("partition_key").size().max() == 1


class TestMjpegVideo:
    def test_avi_roundtrip_and_real_features(self, spark):
        """MJPEG-AVI codec: constant frames roundtrip exactly; the Spark
        feature extractor decodes kind='video' AVIs for REAL (dims,
        frame count, motion energy); frame_sample emits standalone
        decodable JPEGs."""
        import pandas as pd

        from go_matrixprofile_spark.functions.media import (
            decode_jpeg_baseline,
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
            frame_sample,
        )

        nf, h, w = 5, 16, 24
        frames = np.zeros((nf, h, w, 3), dtype=np.uint8)
        for i in range(nf):
            frames[i, :, :, :] = 40 * i + 20  # constant per frame, steps of 40
        buf = encode_mjpeg_avi(frames, fps=5, quality=90)
        np.testing.assert_array_equal(decode_mjpeg_avi(buf), frames)

        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "video", buf, {"width": w, "height": h,
                                    "sample_rate": None, "n_frames": nf})],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feat = extract_features(media, dim=16, decode_stub=False).toPandas()[
            "feature"
        ].iloc[0]
        fw, fh, fn, mean_lum, motion = feat[:5]
        assert (fw, fh, fn) == (float(w), float(h), float(nf))
        # constant frames at 20,60,...,180 -> mean 100, inter-frame |diff| 40
        assert abs(mean_lum - 100.0) <= 2.0
        assert abs(motion - 40.0) <= 2.0

        sampled = frame_sample(media, every_n=2).toPandas()
        assert list(sampled["frame_idx"]) == [0, 2, 4]
        px = decode_jpeg_baseline(bytes(sampled["frame_bytes"].iloc[1]))
        assert px.shape == (h, w, 3)
        np.testing.assert_array_equal(px, frames[2])

    def test_mp4_roundtrip_and_real_features(self, spark):
        """MJPEG-in-MP4 (ISO BMFF): the box walk resolves the sample
        tables to per-frame JPEGs — identical physics pins as the AVI
        container, same fixed feature head, frame_sample emits
        standalone decodable JPEGs; malformed boxes raise."""
        import pandas as pd

        from go_matrixprofile_spark.functions.media import decode_jpeg_baseline
        from go_matrixprofile_spark.functions.mp4 import (
            decode_mjpeg_mp4,
            encode_mjpeg_mp4,
            parse_mp4,
        )
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
            frame_sample,
        )

        nf, h, w = 5, 16, 24
        frames = np.zeros((nf, h, w, 3), dtype=np.uint8)
        for i in range(nf):
            frames[i, :, :, :] = 40 * i + 20
        buf = encode_mjpeg_mp4(frames, fps=5, quality=90)
        np.testing.assert_array_equal(decode_mjpeg_mp4(buf), frames)
        info = parse_mp4(buf)
        assert (info["width"], info["height"], info["n_samples"]) == (w, h, nf)
        assert info["sample_format"] == "jpeg"
        assert abs(info["duration_s"] - 1.0) < 1e-9  # 5 frames @ 5 fps
        with pytest.raises(ValueError):
            parse_mp4(buf[: len(buf) // 2])  # truncated moov

        media = spark.createDataFrame(
            pd.DataFrame(
                [(0, "video", buf, {"width": w, "height": h,
                                    "sample_rate": None, "n_frames": nf})],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feat = extract_features(media, dim=16, decode_stub=False).toPandas()[
            "feature"
        ].iloc[0]
        fw, fh, fn, mean_lum, motion = feat[:5]
        assert (fw, fh, fn) == (float(w), float(h), float(nf))
        assert abs(mean_lum - 100.0) <= 2.0
        assert abs(motion - 40.0) <= 2.0

        sampled = frame_sample(media, every_n=2).toPandas()
        assert list(sampled["frame_idx"]) == [0, 2, 4]
        px = decode_jpeg_baseline(bytes(sampled["frame_bytes"].iloc[1]))
        assert px.shape == (h, w, 3)
        np.testing.assert_array_equal(px, frames[2])


class TestMp3Frames:
    def test_frame_walk_physics(self, spark):
        """MP3 frame-level parse: header-exact duration/bitrate through
        the Spark feature path; truncated and garbage payloads
        quarantine with decode_err instead of killing the stage."""
        import pandas as pd

        from go_matrixprofile_spark.functions.mp3 import (
            encode_mp3_frames,
            parse_mp3_frames,
        )
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        buf = encode_mp3_frames(1.0, 44100, 128, seed=5)
        info = parse_mp3_frames(buf)
        # 44100 samples need ceil(44100/1152)=39 frames; CBR 128k @
        # 44.1k has fractional frame size -> alternating padding
        assert info["n_frames"] == 39
        assert abs(info["duration_s"] - 39 * 1152 / 44100) < 1e-12
        assert info["n_padded"] == 19
        assert set(info["bitrates_kbps"]) == {128}

        media = spark.createDataFrame(
            pd.DataFrame(
                [
                    (0, "audio", buf,
                     {"width": None, "height": None,
                      "sample_rate": 44100, "n_frames": None}),
                    (1, "audio", buf[:-11],  # truncated mid final frame
                     {"width": None, "height": None,
                      "sample_rate": 44100, "n_frames": None}),
                ],
                columns=["doc_id", "kind", "payload", "meta"],
            ),
            schema=MEDIA_SCHEMA,
        )
        feats = extract_features(media, dim=16).orderBy("doc_id").toPandas()
        dur, sr_khz, n_frames, br_mean = feats["feature"].iloc[0][:4]
        assert abs(dur - info["duration_s"]) < 1e-6
        assert abs(sr_khz - 44.1) < 1e-4  # feature vector is float32
        assert n_frames == 39.0
        assert br_mean == 128.0
        assert feats["decode_err"].iloc[0] is None
        assert "truncated" in feats["decode_err"].iloc[1]

class TestMp4EdgePaths:
    def test_codec_bound_and_corrupt_mp4_paths(self, spark):
        """A HEALTHY mp4 with a codec-bound sample entry (avc1-class)
        is a configuration signal: decode_stub=False raises, stub mode
        emits the stub signature with NO decode_err. A CORRUPT sample
        table (struct-level damage) quarantines with decode_err and
        frame_sample yields no frames instead of failing the stage.
        Version-1 mvhd boxes are refused, not misparsed."""
        import pandas as pd

        from go_matrixprofile_spark.functions.mp4 import (
            encode_mjpeg_mp4,
            parse_mp4,
        )
        from go_matrixprofile_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
            frame_sample,
        )

        frames = np.full((3, 8, 8, 3), 90, dtype=np.uint8)
        buf = encode_mjpeg_mp4(frames, fps=5)

        # avc1 sample entry: patch the stsd entry fourcc
        i = buf.index(b"stsd")
        avc = buf[: i + 16] + b"avc1" + buf[i + 20 :]
        assert parse_mp4(avc)["sample_format"] == "avc1"
        # corrupt stsz: absurd sample count -> struct-level failure
        j = buf.index(b"stsz")
        bad = buf[: j + 12] + (10**6).to_bytes(4, "big") + buf[j + 16 :]
        # version-1 mvhd: refused with a clean ValueError
        k = buf.index(b"mvhd")
        v1 = buf[: k + 4] + b"\x01" + buf[k + 5 :]
        with pytest.raises(ValueError, match="mvhd version 1"):
            parse_mp4(v1)

        def media_df(payload):
            return spark.createDataFrame(
                pd.DataFrame(
                    [(0, "video", payload,
                      {"width": 8, "height": 8,
                       "sample_rate": None, "n_frames": 3})],
                    columns=["doc_id", "kind", "payload", "meta"],
                ),
                schema=MEDIA_SCHEMA,
            )

        # codec-bound: stub mode -> stub signature, NOT an error row
        row = extract_features(media_df(avc), decode_stub=True).toPandas().iloc[0]
        assert row["decode_err"] is None
        # codec-bound: decode_stub=False -> loud NotImplementedError
        with pytest.raises(Exception, match="NotImplementedError|codec-bound"):
            extract_features(media_df(avc), decode_stub=False).count()
        # corrupt: quarantined with decode_err, stage survives
        row = extract_features(media_df(bad), decode_stub=False).toPandas().iloc[0]
        assert row["decode_err"] is not None
        # corrupt: frame_sample yields zero frames, no stage failure
        assert frame_sample(media_df(bad), every_n=1).count() == 0
