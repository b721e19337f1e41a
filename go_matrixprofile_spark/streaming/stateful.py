"""Stateful Structured Streaming matrix profile.

The reference's Update API (matrixprofile.go:548-593) as a Spark
stateful streaming operator: per-conversation GroupState holds the
series plus its profile; each micro-batch appends the new points
through the kernel's incremental ``update()`` (one distance profile
per appended point — O(n log n), never a full recompute) and emits the
refreshed profile stamped with an update sequence number.

State is bounded by ``max_points`` per conversation — beyond it the
conversation freezes and belongs on the batch tiled path
(operators/profile.matrix_profile_chunked); unbounded per-key state is
how streaming jobs die at corpus scale. A frozen conversation is NOT
silent: every batch that delivers points to it emits one marker row
(offset = -1, mp = NaN, idx = count of points dropped in that batch,
seq unchanged) so downstream operators can route it to the batch path
instead of mistaking the stall for a quiet stream.

Output mode is append: each batch emits the conversation's full
refreshed profile under a new ``seq``; readers take the max seq per
conversation (same latest-wins convention as streaming/ingest.read_tier).
At scale you would emit only the changed suffix or summary rows —
the full-profile emission keeps the update≡recompute contract directly
testable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

OUT_SCHEMA = "conv_id string, seq int, offset int, mp double, idx bigint"
STATE_SCHEMA = "vals array<double>, mp array<double>, idx array<bigint>, seq int"
POINT_SCHEMA = "conv_id string, bucket_s double, value double"


def stream_matrix_profile(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    w: int = 8,
    max_points: int = 100_000,
):
    """File-source stream of series points → stateful per-conv MP."""

    stream = spark.readStream.schema(POINT_SCHEMA).parquet(input_dir)

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        from ..kernels.matrix_profile import MatrixProfile, MPOpts

        (conv_id,) = key
        batches = [pdf for pdf in pdf_iter]
        new = pd.concat(batches).sort_values("bucket_s")["value"].to_numpy(
            dtype=np.float64
        )
        if state.exists:
            vals_l, mp_l, idx_l, seq = state.get
            vals = np.asarray(vals_l, dtype=np.float64)
        else:
            vals, mp_l, idx_l, seq = np.empty(0), None, None, 0

        if vals.size >= max_points:
            # frozen: drop the batch but emit a visible marker row —
            # offset -1, idx = dropped-point count, seq NOT bumped; read
            # via frozen_markers (latest_profiles filters offset >= 0)
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "seq": np.array([seq], dtype=np.int32),
                    "offset": np.array([-1], dtype=np.int32),
                    "mp": np.array([np.nan]),
                    "idx": np.array([new.size], dtype=np.int64),
                }
            )
            return

        out_mp = out_idx = None
        if mp_l:  # incremental: kernel update() per appended point
            m = MatrixProfile(vals, None, w)
            m.mp = np.asarray(mp_l, dtype=np.float64)
            m.idx = np.asarray(idx_l, dtype=np.int64)
            m.update(new)
            vals, out_mp, out_idx = m.a, m.mp, m.idx
        else:
            vals = np.concatenate([vals, new])
            if vals.size > w:
                m = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="stomp"))
                out_mp, out_idx = m.mp, m.idx

        seq += 1
        state.update(
            (
                vals.tolist(),
                out_mp.tolist() if out_mp is not None else None,
                out_idx.tolist() if out_idx is not None else None,
                seq,
            )
        )
        if out_mp is None:
            return
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "seq": np.int32(seq),
                "offset": np.arange(out_mp.size, dtype=np.int32),
                "mp": out_mp,
                "idx": out_idx,
            }
        )

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout")
        .writeStream.option("checkpointLocation", checkpoint_dir)
    )


def latest_profiles(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest emitted REAL profile per conversation (max seq wins).

    Frozen-conversation marker rows (offset = -1, mp = NaN) reuse the
    last real seq, so without the offset filter they'd interleave with
    the profile — and repeated frozen batches stack several markers at
    that seq (r03 advisor finding). Markers are exposed separately via
    ``frozen_markers``.
    """
    from pyspark.sql import Window, functions as F

    raw = spark.read.parquet(out_dir).where(F.col("offset") >= 0)
    return (
        raw.withColumn("_mx", F.max("seq").over(Window.partitionBy("conv_id")))
        .where("seq = _mx")
        .drop("_mx")
    )


def frozen_markers(spark: SparkSession, out_dir: str) -> DataFrame:
    """Frozen-conversation markers: one row per batch that hit a frozen
    conversation, with ``idx`` = points dropped in that batch. Route
    these conv_ids to the batch tiled path
    (operators/profile.matrix_profile_chunked)."""
    from pyspark.sql import functions as F

    return spark.read.parquet(out_dir).where(F.col("offset") < 0)
