"""Distributed matrix profile over per-conversation series.

Two physical strategies (chosen by series length, SURVEY.md §7.4):

1. ``matrix_profile`` — whole-series-per-task: groupBy(conv_id, metric)
   → applyInPandas runs the NumPy kernel on the assembled series. Right
   for the post-rollup regime where per-conv series are ≤ ~1e6 points:
   parallelism comes from the *number of conversations* (the reference's
   own thread scaling is flat beyond 2 cores — BASELINE.md — so
   cross-series data parallelism is the scaling axis that matters).

2. ``matrix_profile_chunked`` — intra-series parallelism for mega
   threads: the MPX diagonal workload is split by DiagBatchingScheme
   into B balanced batches, each (conv, batch) becomes its own Spark
   task computing a partial profile, and partials merge with
   min_by(struct(mp, -batch)) — reproducing the reference's
   "later batch wins Euclidean ties" channel-merge order
   (mergeMPResults, matrixprofile.go:607-661) as a shuffle aggregation.

Output schema (FIXTURES.md A.2):
  mp_profile(conv_id, metric, w int, offset int, mp double, idx int)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..kernels.kmp import KMP
from ..kernels.matrix_profile import MatrixProfile, MPOpts, mpdist
from ..kernels.pmp import PMP

MP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("mp", T.DoubleType(), True),
        T.StructField("idx", T.LongType(), True),
    ]
)

MOTIF_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("group", T.IntegerType(), False),
        T.StructField("idx", T.ArrayType(T.IntegerType()), False),
        T.StructField("min_dist", T.DoubleType(), False),
    ]
)

DISCORD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("idx", T.IntegerType(), False),
    ]
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("idx", T.IntegerType(), False),
        T.StructField("cac", T.DoubleType(), False),
    ]
)


def _series_values(pdf: pd.DataFrame) -> np.ndarray:
    return pdf.sort_values("bucket_s")["value"].to_numpy(dtype=np.float64)


def cpu_partitions(df: DataFrame, factor: int = 3) -> int:
    """Partition count for CPU-heavy kernel stages: a few tasks per core.

    AQE sizes partitions by shuffle BYTES, which is the wrong currency
    for stages whose cost is NumPy compute per row — it happily
    coalesces a few-MB shuffle to ONE partition and serializes every
    kernel (observed: identical MP wall-clock at local[4/16/32]).
    An explicit numbered repartition is exempt from AQE coalescing."""
    return df.sparkSession.sparkContext.defaultParallelism * factor


def assemble_series(series: DataFrame, value_col: str = "value") -> DataFrame:
    """Collapse a long-format series table to one array row per
    (conv_id, metric), sorted by bucket.

    This runs entirely JVM-side (shuffle + array_sort + transform), so
    the per-conv exchange ships compact array rows instead of millions
    of long-format rows through the Arrow/pandas boundary — measured
    ~2-3x faster end-to-end for the MP operators. The pre-repartition
    pins the exchange width for the downstream kernel stage (see
    cpu_partitions)."""
    src = series.repartition(cpu_partitions(series), "conv_id", "metric")
    return src.groupBy("conv_id", "metric").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket_s", F.col(value_col).alias("v")))),
            lambda s: s["v"],
        ).alias("vals")
    )


def matrix_profile(
    series: DataFrame,
    w: int,
    opts: MPOpts | None = None,
    value_col: str = "value",
    min_len: int | None = None,
) -> DataFrame:
    """Self-join MP per (conv_id, metric); series shorter than w+1 are
    skipped (no profile defined). Series are assembled to array rows
    JVM-side; the NumPy kernel sees one row per conversation."""
    return matrix_profile_assembled(
        assemble_series(series, value_col), w, opts, min_len
    )


def matrix_profile_assembled(
    assembled: DataFrame,
    w: int,
    opts: MPOpts | None = None,
    min_len: int | None = None,
) -> DataFrame:
    """MP over pre-assembled array rows (conv_id, metric, vals) — the
    entry point when series are already stored array-per-conv (e.g. a
    materialized tier), skipping the assembly shuffle."""
    opts = opts or MPOpts()
    min_len = max(min_len or 0, w + 1)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for row in pdf.itertuples(index=False):
                vals = np.asarray(row.vals, dtype=np.float64)
                if vals.size < min_len:
                    continue
                mp = MatrixProfile(vals, None, w).compute(opts)
                n = mp.mp.size
                yield pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "metric": row.metric,
                        "w": np.int32(w),
                        "offset": np.arange(n, dtype=np.int32),
                        "mp": mp.mp,
                        "idx": mp.idx,
                    }
                )

    return assembled.mapInPandas(kernel, MP_SCHEMA)


def matrix_profile_chunked(
    series: DataFrame,
    w: int,
    n_batches: int = 8,
    opts: MPOpts | None = None,
    value_col: str = "value",
) -> DataFrame:
    """MPX with intra-series parallelism: B diagonal-batch tasks per conv.

    Stage 1 assembles each conv's series once (sorted array per row),
    stage 2 explodes a batch index 0..B-1 (each task re-derives its
    diagonal range from DiagBatchingScheme — deterministic), stage 3
    computes the batch partial in a pandas UDF, stage 4 merges with a
    shuffle min_by that encodes the reference's tie order.
    """
    opts = opts or MPOpts(algorithm="mpx")
    src = series.select(
        "conv_id", "metric", "bucket_s", F.col(value_col).alias("value")
    )
    assembled = src.groupBy("conv_id", "metric").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket_s", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    batched = assembled.withColumn(
        "batch", F.explode(F.sequence(F.lit(0), F.lit(n_batches - 1)))
    ).repartition(cpu_partitions(series), "conv_id", "metric", "batch")

    part_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("batch", T.IntegerType(), False),
            T.StructField("offset", T.IntegerType(), False),
            T.StructField("mp", T.DoubleType(), True),
            T.StructField("idx", T.LongType(), True),
        ]
    )

    def batch_kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.util import diag_batching_scheme

        for pdf in it:
            for row in pdf.itertuples(index=False):
                vals = np.asarray(row.vals, dtype=np.float64)
                if vals.size < w + 1:
                    continue
                mp_task = MatrixProfile(vals, None, w)
                mp_task.opts = opts
                len_a = vals.size - w + 1
                scheme = diag_batching_scheme(len_a, n_batches)
                bidx, bsz = scheme[row.batch]
                from ..kernels.util import mu_invn

                mua, siga = mu_invn(vals, w)
                len_prof = len_a
                dfa = np.zeros(len_prof)
                dga = np.zeros(len_prof)
                dfa[1:] = 0.5 * (vals[w : w + len_prof - 1] - vals[: len_prof - 1])
                dga[1:] = (vals[w : w + len_prof - 1] - mua[1:len_prof]) + (
                    vals[: len_prof - 1] - mua[: len_prof - 1]
                )
                res = mp_task._mpx_batch(bidx, mua, siga, dfa, dga, bsz)
                if res is None:
                    continue
                bmp, bi, _, _ = res
                yield pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "metric": row.metric,
                        "batch": np.int32(row.batch),
                        "offset": np.arange(bmp.size, dtype=np.int32),
                        "mp": bmp,
                        "idx": bi,
                    }
                )

    partials = batched.mapInPandas(batch_kernel, part_schema)
    # later batch wins Euclidean ties (<= in mergeMPResults): order by
    # (mp asc, batch desc) and take the first via min_by on a struct
    merged = partials.groupBy("conv_id", "metric", "offset").agg(
        F.min_by(
            F.struct("mp", "idx"), F.struct(F.col("mp"), (-F.col("batch")).alias("nb"))
        ).alias("best")
    )
    return merged.select(
        "conv_id",
        "metric",
        F.lit(w).cast("int").alias("w"),
        "offset",
        F.col("best.mp").alias("mp"),
        F.col("best.idx").alias("idx"),
    )


def discover(
    series: DataFrame,
    w: int,
    k_motifs: int = 3,
    r_motifs: float = 2.0,
    k_discords: int = 3,
    opts: MPOpts | None = None,
    av: str = "default",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Analyze pipeline per conv: MP → motifs + discords + segmentation.

    The greedy discovery loops are inherently sequential per series
    (each pick mutates the profile — SURVEY.md §2.5) so they run inside
    the per-conv UDF; results explode into three tables.
    """
    opts = opts or MPOpts()
    assembled = assemble_series(series)

    combined_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("rank", T.IntegerType(), False),
            T.StructField("idx", T.ArrayType(T.IntegerType()), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                conv_id, metric = rec.conv_id, rec.metric
                vals = np.asarray(rec.vals, dtype=np.float64)
                if vals.size < max(2 * w, w + 4):
                    continue
                mp = MatrixProfile(vals, None, w)
                mp.av = av
                mp.compute(opts)
                try:
                    motifs = mp.discover_motifs(k_motifs, r_motifs, 10, w // 2)
                except ValueError:
                    motifs = []
                for g, group in enumerate(motifs):
                    if group.idx:
                        rows.append((conv_id, metric, w, "motif", g, group.idx, group.min_dist))
                for r, d_idx in enumerate(mp.discover_discords(k_discords, w // 2)):
                    rows.append((conv_id, metric, w, "discord", r, [d_idx], float(mp.mp[d_idx])))
                seg_idx, seg_val, _ = mp.discover_segments()
                rows.append((conv_id, metric, w, "segment", 0, [seg_idx], seg_val))
            yield pd.DataFrame(
                rows, columns=["conv_id", "metric", "w", "kind", "rank", "idx", "score"]
            )

    combined = assembled.mapInPandas(kernel, combined_schema)
    motifs = combined.where(F.col("kind") == "motif").select(
        "conv_id", "metric", "w", F.col("rank").alias("group"), "idx", F.col("score").alias("min_dist")
    )
    discords = combined.where(F.col("kind") == "discord").select(
        "conv_id", "metric", "w", "rank", F.element_at("idx", 1).alias("idx")
    )
    segments = combined.where(F.col("kind") == "segment").select(
        "conv_id", "metric", "w", F.element_at("idx", 1).alias("idx"), F.col("score").alias("cac")
    )
    return motifs, discords, segments


def k_matrix_profile(series_multi: DataFrame, w: int) -> DataFrame:
    """k-dimensional matrix profile (mSTOMP, kmp.go:161-212) per conv.

    Input: (conv_id, dim string, bucket_s, value) — dims must share a
    bucket grid (use gap-fill first). Output one profile row per
    (conv_id, dim-level, offset): level d is the best d+1-of-k profile.
    """
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("level", T.IntegerType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("offset", T.IntegerType(), False),
            T.StructField("mp", T.DoubleType(), True),
            T.StructField("idx", T.LongType(), True),
        ]
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (conv_id,) = key
        mat = pdf.pivot_table(
            index="dim", columns="bucket_s", values="value", aggfunc="first"
        ).sort_index()
        t = mat.to_numpy(dtype=np.float64)
        if t.shape[1] <= 2 * w or np.isnan(t).any():
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        kmp = KMP(list(t), w).compute()
        frames = []
        for d in range(kmp.mp.shape[0]):
            n = kmp.mp.shape[1]
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "level": np.int32(d),
                        "w": np.int32(w),
                        "offset": np.arange(n, dtype=np.int32),
                        "mp": kmp.mp[d],
                        "idx": kmp.idx[d],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    src = series_multi.repartition(cpu_partitions(series_multi), "conv_id")
    return src.groupBy("conv_id").applyInPandas(kernel, schema)


def pan_matrix_profile(
    series: DataFrame, lower_m: int, upper_m: int, opts: MPOpts | None = None
) -> DataFrame:
    """Pan-MP per conv: one profile per window in [lower_m, upper_m]
    (pmp.go:119-161). Output keyed by (conv_id, metric, w, offset)."""
    opts = opts or MPOpts()
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("offset", T.IntegerType(), False),
            T.StructField("mp", T.DoubleType(), True),
            T.StructField("idx", T.LongType(), True),
        ]
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id, metric = key
        vals = _series_values(pdf)
        if vals.size < upper_m + 2:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        p = PMP(vals).compute(lower_m, upper_m, opts)
        frames = []
        for level, w in enumerate(range(lower_m, upper_m + 1)):
            if w not in p.pwindows:
                continue
            prof = p.pmp[level][: vals.size - w + 1]
            idx = p.pidx[level][: vals.size - w + 1]
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "metric": metric,
                        "w": np.int32(w),
                        "offset": np.arange(prof.size, dtype=np.int32),
                        "mp": prof,
                        "idx": idx,
                    }
                )
            )
        if not frames:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        return pd.concat(frames, ignore_index=True)

    src = series.select("conv_id", "metric", "bucket_s", "value").repartition(
        cpu_partitions(series), "conv_id", "metric"
    )
    return src.groupBy("conv_id", "metric").applyInPandas(kernel, schema)


def mpdist_pairs(
    series: DataFrame, w: int, max_convs: int = 20, opts: MPOpts | None = None
) -> DataFrame:
    """Conversation-to-conversation MPDist similarity matrix
    (MPDist, matrixprofile.go:243-338) over the first max_convs convs.

    Series are assembled per conv (one aggregation), the small
    conv-level table self-joins (broadcast — it is max_convs rows), and
    each pair's MPDist runs as one Arrow-batched task.
    """
    opts = opts or MPOpts()
    assembled = (
        series.select("conv_id", "metric", "bucket_s", "value")
        .groupBy("conv_id", "metric")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket_s", "value"))),
                lambda s: s["value"],
            ).alias("vals")
        )
        .where(F.size("vals") > w * 2)
    )
    ranked = assembled.orderBy("conv_id").limit(max_convs)
    a = ranked.select(
        F.col("conv_id").alias("a_id"), F.col("metric").alias("metric"), F.col("vals").alias("a_vals")
    )
    b = ranked.select(
        F.col("conv_id").alias("b_id"), F.col("metric").alias("metric_b"), F.col("vals").alias("b_vals")
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("a_id") < F.col("b_id")) & (F.col("metric") == F.col("metric_b")),
    ).select("a_id", "b_id", "metric", "a_vals", "b_vals")

    schema = T.StructType(
        [
            T.StructField("a_id", T.StringType(), False),
            T.StructField("b_id", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("mpdist", T.DoubleType(), True),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                d = mpdist(
                    np.asarray(row.a_vals, dtype=np.float64),
                    np.asarray(row.b_vals, dtype=np.float64),
                    w,
                    opts,
                )
                out.append((row.a_id, row.b_id, row.metric, float(d)))
            yield pd.DataFrame(out, columns=["a_id", "b_id", "metric", "mpdist"])

    return pairs.mapInPandas(kernel, schema)


def streaming_update_check(series: DataFrame, w: int, split: float = 0.8) -> DataFrame:
    """Incremental Update ≡ full recompute evidence per conv
    (the reference's own streaming contract, matrixprofile_test.go:706-762).

    Splits each series at `split`, computes the prefix profile, streams
    the suffix through update(), recomputes from scratch, and reports
    the max abs deviation — the engine's incremental-batch path is
    correct when max_abs_diff ≈ 0.
    """
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("n_new", T.IntegerType(), False),
            T.StructField("max_abs_diff", T.DoubleType(), True),
        ]
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id, metric = key
        vals = _series_values(pdf)
        cut = int(vals.size * split)
        if cut < w + 2 or vals.size - cut < 1:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        try:
            inc = MatrixProfile(vals[:cut], None, w).compute(MPOpts(algorithm="stomp"))
            inc.update(vals[cut:])
            full = MatrixProfile(vals, None, w).compute(MPOpts(algorithm="stomp"))
        except ValueError:
            # constant query window: the reference's Update errors the
            # same way (ZNormalize zero-std, util/util.go:33-35) — skip
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        diff = float(np.nanmax(np.abs(inc.mp - full.mp))) if full.mp.size else 0.0
        return pd.DataFrame(
            [(conv_id, metric, vals.size, vals.size - cut, diff)],
            columns=["conv_id", "metric", "n", "n_new", "max_abs_diff"],
        )

    src = series.select("conv_id", "metric", "bucket_s", "value").repartition(
        cpu_partitions(series), "conv_id", "metric"
    )
    return src.groupBy("conv_id", "metric").applyInPandas(kernel, schema)


def matrix_profile_ab(
    series_a: DataFrame,
    series_b: DataFrame,
    w: int,
    opts: MPOpts | None = None,
) -> DataFrame:
    """AB-join matrix profile per conv_id: every window of A joined with
    every window of B (mpxabBatch/mpxbaBatch, matrixprofile.go:1057-1198).

    Inputs are long-format series; the two sides are assembled to array
    rows and equi-joined on conv_id (broadcast when one side is small).
    Output has both directions: direction='ab' rows are A-side (MP/Idx),
    'ba' rows are B-side (MPB/IdxB).
    """
    opts = opts or MPOpts(algorithm="mpx")
    a = assemble_series(series_a).select(
        "conv_id", F.col("vals").alias("a_vals")
    )
    b = assemble_series(series_b).select(
        "conv_id", F.col("vals").alias("b_vals")
    )
    joined = a.join(b, "conv_id")

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("direction", T.StringType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("offset", T.IntegerType(), False),
            T.StructField("mp", T.DoubleType(), True),
            T.StructField("idx", T.LongType(), True),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for row in pdf.itertuples(index=False):
                av = np.asarray(row.a_vals, dtype=np.float64)
                bv = np.asarray(row.b_vals, dtype=np.float64)
                if av.size < w + 1 or bv.size < w + 1:
                    continue
                mp = MatrixProfile(av, bv, w).compute(opts)
                for direction, prof, idx in (
                    ("ab", mp.mp, mp.idx),
                    ("ba", mp.mpb, mp.idxb),
                ):
                    if prof is None:
                        continue
                    yield pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "direction": direction,
                            "w": np.int32(w),
                            "offset": np.arange(prof.size, dtype=np.int32),
                            "mp": prof,
                            "idx": idx,
                        }
                    )

    return joined.repartition(cpu_partitions(joined), "conv_id").mapInPandas(
        kernel, schema
    )


def matrix_profile_auto(
    series: DataFrame,
    w: int,
    opts: MPOpts | None = None,
    value_col: str = "value",
    chunk_threshold: int = 8192,
    n_batches: int = 8,
) -> DataFrame:
    """Skew-aware MP: routes each conversation by series length.

    Mega-threads are the skew hazard of transcript corpora (power-law
    lengths): one giant conversation as a single task stalls the stage.
    Short series (< chunk_threshold points) run whole-series-per-task;
    long ones run as chunked diagonal batches (one task per
    DiagBatchingScheme batch) merged by min_by — so the longest
    conversation contributes n_batches balanced tasks instead of one
    straggler.
    """
    opts = opts or MPOpts(algorithm="mpx")
    src = series.select(
        "conv_id", "metric", "bucket_s", F.col(value_col).alias("value")
    )
    lengths = src.groupBy("conv_id", "metric").agg(F.count("*").alias("n"))
    short_keys = lengths.where(F.col("n") < chunk_threshold).select("conv_id", "metric")
    long_keys = lengths.where(F.col("n") >= chunk_threshold).select("conv_id", "metric")
    short = src.join(F.broadcast(short_keys), ["conv_id", "metric"], "left_semi")
    long = src.join(F.broadcast(long_keys), ["conv_id", "metric"], "left_semi")
    prof_short = matrix_profile(short, w, opts, min_len=None)
    prof_long = matrix_profile_chunked(long, w, n_batches=n_batches, opts=opts)
    return prof_short.unionByName(prof_long)
