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
            extract_features,
            synthesize_media,
        )
        from py4j.protocol import Py4JJavaError

        media = synthesize_media(spark, 3)
        with pytest.raises(Exception):
            extract_features(media, decode_stub=False).count()

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
