"""Chunked (tiled) matrix profile: bounded-segment plumbing at mega-thread
scale and kernel-vs-whole equality at 16k."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


class TestTilePlumbing:
    def test_mega_thread_segments_bounded(self, spark):
        """A 2^21-point conversation must never materialize as one row:
        every segment array is bounded by t_width + w - 1 and the tile
        fan-out is k(k+1)/2. (The O(n^2) kernel itself is exercised at
        smaller n — this pins the plan that removes the 2 GiB row
        ceiling.)"""
        from go_matrixprofile_spark.operators.profile import chunked_tile_inputs

        n = 1 << 21
        w = 128
        k = 4
        src = (
            spark.range(n)
            .select(
                F.lit("mega").alias("conv_id"),
                F.lit("m").alias("metric"),
                F.col("id").cast("double").alias("bucket_s"),
                (F.sin(F.col("id") / 37.0) + F.col("id") % 13 / 7.0).alias("value"),
            )
        )
        tiles = chunked_tile_inputs(src, w, k).select(
            "r",
            "c",
            F.size("row_vals").alias("nrow"),
            F.size("col_vals").alias("ncol"),
            "len_a",
            "t_width",
        )
        pdf = tiles.toPandas()
        len_a = n - w + 1
        t_width = int(np.ceil(len_a / k))
        assert len(pdf) == k * (k + 1) // 2
        assert (pdf["t_width"] == t_width).all()
        bound = t_width + w - 1
        assert pdf["nrow"].max() <= bound
        assert pdf["ncol"].max() <= bound
        # every tile ships ~2/k of the series, not the whole series
        assert pdf["nrow"].max() < n // 2

    def test_chunked_equals_whole_16k(self, spark):
        """Tile decomposition reproduces the whole-series MPX profile on
        a 16,384-point series (values to 1e-9, indices exactly)."""
        from go_matrixprofile_spark.kernels import siggen
        from go_matrixprofile_spark.kernels.matrix_profile import MatrixProfile, MPOpts
        from go_matrixprofile_spark.operators.profile import matrix_profile_chunked

        n, w = 16384, 64
        sig = siggen.add(
            siggen.sin(1.0, 4, 0, 0, 100, n / 100)[:n], siggen.noise(0.25, n, 11)
        )
        pdf = pd.DataFrame(
            {
                "conv_id": "c16k",
                "metric": "m",
                "bucket_s": np.arange(n, dtype=np.float64),
                "value": sig,
            }
        )
        src = spark.createDataFrame(pdf)
        want = MatrixProfile(sig, None, w).compute(MPOpts(algorithm="mpx"))
        for kwargs in ({"n_batches": 8}, {"tile_points": 3000}):
            got = (
                matrix_profile_chunked(src, w=w, **kwargs)
                .orderBy("offset")
                .toPandas()
            )
            assert len(got) == want.mp.size, kwargs
            np.testing.assert_allclose(got["mp"].to_numpy(), want.mp, atol=1e-9)
            mism = int((got["idx"].to_numpy() != want.idx).sum())
            assert mism == 0, kwargs


class TestTileEdgeCases:
    @pytest.mark.parametrize("n", [9, 17, 33, 64])
    def test_tiny_and_odd_series(self, spark, n):
        """Tile decomposition at degenerate sizes: series barely longer
        than w, lengths not divisible by the tile width — values and
        indices must still equal the whole-series kernel."""
        from go_matrixprofile_spark.kernels.matrix_profile import MatrixProfile, MPOpts
        from go_matrixprofile_spark.operators.profile import matrix_profile_chunked

        w = 8
        rng = np.random.default_rng(n)
        sig = rng.normal(0, 1, n).cumsum() + rng.random(n)
        src = spark.createDataFrame(
            pd.DataFrame(
                {
                    "conv_id": "c",
                    "metric": "m",
                    "bucket_s": np.arange(n, dtype=np.float64),
                    "value": sig,
                }
            )
        )
        want = MatrixProfile(sig, None, w).compute(MPOpts(algorithm="mpx"))
        for kwargs in ({"n_batches": 4}, {"tile_points": 10}):
            got = (
                matrix_profile_chunked(src, w=w, **kwargs).orderBy("offset").toPandas()
            )
            assert len(got) == want.mp.size, (n, kwargs)
            np.testing.assert_allclose(
                got["mp"].to_numpy(), want.mp, atol=1e-9, err_msg=str((n, kwargs))
            )
            assert (got["idx"].to_numpy() == want.idx).all(), (n, kwargs)


class TestABChunked:
    def test_ab_tiles_equal_whole(self, spark):
        """Tiled AB-join reproduces matrix_profile_ab values exactly
        (both directions), with bounded per-task segments."""
        from go_matrixprofile_spark.kernels import siggen
        from go_matrixprofile_spark.operators.profile import (
            matrix_profile_ab,
            matrix_profile_ab_chunked,
        )

        w = 12
        rows_a, rows_b = [], []
        for cid in range(2):
            na, nb = 300 + cid * 41, 240 + cid * 17
            a = siggen.add(
                siggen.sin(1.0, 4, 0, 0, 60, na / 60)[:na], siggen.noise(0.3, na, cid)
            )
            b = siggen.add(
                siggen.sin(0.7, 6, 1, 0, 60, nb / 60)[:nb],
                siggen.noise(0.3, nb, cid + 10),
            )
            rows_a += [(f"c{cid}", float(i), float(v)) for i, v in enumerate(a)]
            rows_b += [(f"c{cid}", float(i), float(v)) for i, v in enumerate(b)]
        cols = ["conv_id", "bucket_s", "value"]
        src_a = spark.createDataFrame(pd.DataFrame(rows_a, columns=cols))
        src_b = spark.createDataFrame(pd.DataFrame(rows_b, columns=cols))
        key = ["conv_id", "direction", "offset"]
        want = (
            matrix_profile_ab(
                src_a.withColumn("metric", F.lit("m")),
                src_b.withColumn("metric", F.lit("m")),
                w=w,
            )
            .orderBy(key)
            .toPandas()
        )
        got = (
            matrix_profile_ab_chunked(src_a, src_b, w=w, tile_points=100)
            .orderBy(key)
            .toPandas()
        )
        assert len(got) == len(want) > 0
        np.testing.assert_allclose(
            got["mp"].to_numpy(), want["mp"].to_numpy(), atol=1e-9
        )
        assert (got["idx"].to_numpy() == want["idx"].to_numpy()).all()


class TestPanDistributed:
    def test_equals_per_conv_pan(self, spark):
        """(conv, window) task granularity produces exactly the per-conv
        pan-MP (same kernel per window, different physical plan)."""
        from go_matrixprofile_spark.kernels import siggen
        from go_matrixprofile_spark.operators.profile import (
            pan_matrix_profile,
            pan_matrix_profile_distributed,
        )

        rows = []
        for cid in range(3):
            n = 80 + cid * 17
            sig = siggen.add(
                siggen.sin(1.0, 3, 0, 0, 50, n / 50)[:n], siggen.noise(0.2, n, cid)
            )
            for i, v in enumerate(sig):
                rows.append((f"c{cid}", "m", float(i), float(v)))
        src = spark.createDataFrame(
            pd.DataFrame(rows, columns=["conv_id", "metric", "bucket_s", "value"])
        )
        key = ["conv_id", "metric", "w", "offset"]
        a = pan_matrix_profile(src, 6, 10).orderBy(key).toPandas()
        b = pan_matrix_profile_distributed(src, 6, 10).orderBy(key).toPandas()
        assert len(a) == len(b) > 0
        np.testing.assert_allclose(a["mp"].to_numpy(), b["mp"].to_numpy(), atol=1e-12)
        assert (a["idx"].to_numpy() == b["idx"].to_numpy()).all()
