"""Distributed matrix profile over per-conversation series.

Two physical strategies (chosen by series length, SURVEY.md §7.4):

1. ``matrix_profile`` — whole-series-per-task: groupBy(conv_id, metric)
   → applyInPandas runs the NumPy kernel on the assembled series. Right
   for the post-rollup regime where per-conv series are ≤ ~1e6 points:
   parallelism comes from the *number of conversations* (the reference's
   own thread scaling is flat beyond 2 cores — BASELINE.md — so
   cross-series data parallelism is the scaling axis that matters).

2. ``matrix_profile_chunked`` — intra-series parallelism for mega
   threads via SCAMP-style 2-D tiles: the distance matrix's upper
   triangle splits into blocks, each tile task receives only the two
   O(T + w) series segments its block touches (never the whole
   series), computes an exact Pearson-space partial
   (kernels.mpx_tile_partial), and partials merge with
   max_by(corr, tie → earliest global diagonal) before one final
   Pearson→Euclidean conversion. Shuffle volume is O(k·n) per conv and
   no single row holds a full series, so mega-threads clear both the
   B×n replication cost and Spark's 2 GiB row ceiling.

``matrix_profile_auto`` routes conversations between the two by
length; the tile width (= chunk_threshold) fixes per-task work, so
task count grows with series length instead of task size.

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


def assemble_series(
    series: DataFrame, value_col: str = "value", repartition: bool = True
) -> DataFrame:
    """Collapse a long-format series table to one array row per
    (conv_id, metric), sorted by bucket.

    This runs entirely JVM-side (shuffle + array_sort + transform), so
    the per-conv exchange ships compact array rows instead of millions
    of long-format rows through the Arrow/pandas boundary — measured
    ~2-3x faster end-to-end for the MP operators.

    Plan shape (r06): the kernel-width repartition keys on conv_id
    ONLY. The aggregation's ClusteredDistribution((conv_id, metric)) is
    satisfied by hashpartitioning(conv_id), so the explicit numbered
    exchange (exempt from AQE byte-coalescing — see cpu_partitions) is
    REUSED by the aggregation and the long rows cross exactly one
    exchange; the former (conv_id, metric) repartition key was NOT
    reusable whenever metric was a constant-folded literal (Catalyst
    aliases the folded literal into a fresh grouping attribute the
    partitioning does not match), which silently doubled the shuffle.
    Callers that do their own downstream repartition pass
    repartition=False."""
    src = (
        series.repartition(cpu_partitions(series), "conv_id")
        if repartition
        else series
    )
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
    spread: bool = True,
) -> DataFrame:
    """MP over pre-assembled array rows (conv_id, metric, vals) — the
    entry point when series are already stored array-per-conv (e.g. a
    materialized tier), skipping the assembly shuffle.

    spread=True round-robins the (compact) array rows across
    cpu_partitions before the kernel: the assembly aggregation leaves
    rows hash-laid-out by conv_id, and for fleets whose series count is
    near the partition count, hash collisions put 2-3 series in some
    kernel tasks while others sit empty — the stage makespan becomes 3
    series-times instead of 2 (measured on the 64×16k bench fleet).
    The extra exchange moves only one array row per series (MBs), not
    the long-format points, and the kernel needs no key clustering.
    Regime note (measured): the spread pays off for FEW-LARGE-SERIES
    fleets (the reference's own workload: −20% on 64×16k, where one
    collided task idles half the cluster for a whole kernel-time); for
    MANY-SMALL-SERIES corpus fleets the keys already balance the
    partitions (~30+ series each) and the spread only adds an array
    shuffle + a stage barrier (−1.1 s on a 10× fleet) — such callers
    should pass spread=False to keep assembly→kernel stage fusion."""
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

    if spread:
        assembled = assembled.repartition(cpu_partitions(assembled))
    return assembled.mapInPandas(kernel, MP_SCHEMA)


def _grid_positions(
    src: DataFrame, keys: list[str], grid_step: int | None
) -> DataFrame:
    """(keys..., value, pos, n): each point's rank within its key group
    ordered by bucket_s, plus the group size — shared by the self-join
    and AB tile builders.

    grid_step=None sorts each group with a row_number window: a SINGLE
    task per group, the last whole-series bottleneck for a 10^8-point
    mega-thread. With grid_step set, groups verified to be the regular
    grid {min_b + i*step} get pos derived ARITHMETICALLY — one aggregate
    + a shuffled join, no per-group sort. A group is that grid iff it
    has n distinct bucket_s, one residue class mod step, and exactly the
    right span — pigeonhole leaves no other arrangement. Groups that
    fail the check fall back to the window sort, so a wrong grid_step
    degrades to the slow-but-correct path, never to mis-positioned
    points.
    """
    from pyspark.sql.window import Window

    def _window_pos(s: DataFrame) -> DataFrame:
        wpos = Window.partitionBy(*keys).orderBy("bucket_s")
        return s.select(
            *keys,
            "value",
            (F.row_number().over(wpos) - 1).cast("long").alias("pos"),
            F.count("*").over(Window.partitionBy(*keys)).alias("n"),
        )

    if grid_step is None:
        return _window_pos(src)
    step = F.lit(float(grid_step))
    gstats = src.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.min("bucket_s").alias("min_b"),
        F.max("bucket_s").alias("max_b"),
        F.count_distinct(F.col("bucket_s")).alias("n_uniq"),
        F.count_distinct(F.col("bucket_s") % step).alias("n_res"),
    )
    regular = (
        (F.col("n_uniq") == F.col("n"))
        & (F.col("n_res") == 1)
        & (F.col("max_b") - F.col("min_b") == step * (F.col("n") - 1))
    )
    joined = src.join(gstats, keys)
    reg = joined.where(regular).select(
        *keys,
        "value",
        F.round((F.col("bucket_s") - F.col("min_b")) / step).cast("long").alias("pos"),
        "n",
    )
    irr = _window_pos(joined.where(~regular).select(*keys, "bucket_s", "value"))
    return reg.unionByName(irr)


def chunked_tile_inputs(
    src: DataFrame,
    w: int,
    k: int | None = None,
    tile_points: int | None = None,
    grid_step: int | None = None,
) -> DataFrame:
    """Build the bounded tile-task table for the chunked matrix profile.

    src: (conv_id, metric, bucket_s, value). Output: one row per
    upper-triangular tile (conv_id, metric, r, c, row_vals, col_vals,
    len_a, t_width) where each vals array is bounded by t_width + w - 1
    points — never the whole series. Stages: window-sort positions,
    assign each point to the ≤2 overlapping segments that need it,
    aggregate segments to bounded array rows, cross the tile list with
    the two segments per tile via equi-joins. All built-ins; the only
    shuffles are the position sort, the segment aggregation, and the
    two segment joins — each keyed on bounded (conv, metric, seg) keys.

    Tile sizing, exactly one of:
    - ``tile_points``: FIXED tile width — the scale knob. Per-task work
      is then ~tile_points² cells regardless of series length, and the
      tile count grows with the square of length: a 10^8-point
      conversation decomposes into uniformly-sized tasks instead of k
      ever-fatter ones. Use this at corpus scale.
    - ``k``: tiles per side (t_width = ceil(len_a / k)) — task COUNT is
      fixed per conversation; fine for bounded exploration.

    ``grid_step``: declare the input a regular grid with this bucket_s
    spacing (e.g. 3600 for a gap-filled hourly tier). Positions are then
    derived ARITHMETICALLY — pos = (bucket_s - min_bucket)/step via one
    aggregate + a shuffled join — instead of a per-(conv, metric)
    row_number sort, whose single sort task is the last whole-series
    bottleneck for a 10^8-point mega-thread. Regularity is verified per
    group (distinct count, span, single residue class); groups that fail
    fall back to the window sort, so a wrong ``grid_step`` degrades to
    the slow-but-correct path rather than mis-positioning points
    (see _grid_positions).
    """
    if (k is None) == (tile_points is None):
        raise ValueError("pass exactly one of k / tile_points")

    pts = _grid_positions(src, ["conv_id", "metric"], grid_step)
    pts = pts.where(F.col("n") >= w + 1)
    # tile width floored at w so the two-candidate segment assignment
    # below stays valid (w - 1 <= T)
    if tile_points is not None:
        t_width_col = F.lit(max(int(tile_points), w)).cast("long")
    else:
        t_width_col = F.greatest(
            F.ceil((F.col("n") - w + 1) / k).cast("long"), F.lit(w)
        )
    pts = pts.withColumn("len_a", F.col("n") - w + 1).withColumn(
        "t_width", t_width_col
    )
    # point at pos p feeds segment s iff s*T <= p < (s+1)*T + w - 1:
    # candidates are p//T and p//T - 1 (the latter iff p mod T < w - 1)
    s_hi = (F.col("pos") / F.col("t_width")).cast("long")
    seg_candidates = F.array(
        F.when(s_hi < F.ceil(F.col("len_a") / F.col("t_width")).cast("long"), s_hi),
        F.when((s_hi >= 1) & (F.col("pos") % F.col("t_width") < w - 1), s_hi - 1),
    )
    seg_pts = pts.select(
        "conv_id",
        "metric",
        "value",
        "pos",
        "len_a",
        "t_width",
        F.explode(F.filter(seg_candidates, lambda s: s.isNotNull())).alias("seg"),
    )
    segments = seg_pts.groupBy("conv_id", "metric", "seg").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "value"))), lambda s: s["value"]
        ).alias("vals"),
        F.first("len_a").alias("len_a"),
        F.first("t_width").alias("t_width"),
    )

    # tile list: (conv, metric, r, c) for 0 <= r <= c < n_segs
    convs = segments.groupBy("conv_id", "metric").agg(F.max("seg").alias("max_seg"))
    tiles = convs.select(
        "conv_id",
        "metric",
        F.explode(F.sequence(F.lit(0), F.col("max_seg"))).alias("r"),
        "max_seg",
    ).select(
        "conv_id",
        "metric",
        "r",
        F.explode(F.sequence(F.col("r"), F.col("max_seg"))).alias("c"),
    )
    row_seg = segments.select(
        "conv_id",
        "metric",
        F.col("seg").alias("r"),
        F.col("vals").alias("row_vals"),
        "len_a",
        "t_width",
    )
    col_seg = segments.select(
        "conv_id", "metric", F.col("seg").alias("c"), F.col("vals").alias("col_vals")
    )
    # round-robin: tile rows are uniform-cost kernel tasks; even spread
    # beats by-key hashing (collisions idle ~1/e of the slots) and the
    # tile kernel needs no key clustering
    return (
        tiles.join(row_seg, ["conv_id", "metric", "r"])
        .join(col_seg, ["conv_id", "metric", "c"])
        .repartition(cpu_partitions(src))
    )


def matrix_profile_chunked(
    series: DataFrame,
    w: int,
    n_batches: int = 8,
    opts: MPOpts | None = None,
    value_col: str = "value",
    tile_points: int | None = None,
    grid_step: int | None = None,
) -> DataFrame:
    """MPX with intra-series parallelism via SCAMP-style 2-D tiles.

    The distance matrix's upper triangle is tiled into k×k blocks
    (k(k+1)/2 ≈ n_batches tasks per conv); each tile task receives ONLY
    the two overlapping series segments its block touches — O(T + w)
    points each — instead of the whole series. Shuffle volume is
    O(k·n) per conv (vs B·n for the old exploded-array plan) and no
    single row ever holds the full series, so a 10^8-point conversation
    no longer approaches Spark's 2 GiB row ceiling.

    Stages: (1) window-sort positions per conv, (2) assign each point
    to the ≤2 segments that need it (built-ins: explode over a filtered
    candidate array), (3) aggregate each segment to one bounded array
    row, (4) build the tile list and equi-join the two segments per
    tile, (5) kernel task computes the tile partial in Pearson space
    (kernels.mpx_tile_partial — exact, FFT-seeded diagonals), (6) merge
    partials with max_by(corr, tie → earliest global diagonal), then
    convert to Euclidean (p2e). Currently Euclidean output only.
    """
    opts = opts or MPOpts(algorithm="mpx")
    if not opts.euclidean:
        raise ValueError("matrix_profile_chunked emits Euclidean profiles only")
    src = series.select(
        "conv_id", "metric", "bucket_s", F.col(value_col).alias("value")
    )
    if tile_points is not None:
        tile_in = chunked_tile_inputs(src, w, tile_points=tile_points, grid_step=grid_step)
    else:
        # k tiles per side so that k(k+1)/2 ≈ n_batches tasks per conv
        k = max(1, int(round(((8 * n_batches + 1) ** 0.5 - 1) / 2)))
        tile_in = chunked_tile_inputs(src, w, k=k, grid_step=grid_step)
    part_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("offset", T.IntegerType(), False),
            T.StructField("corr", T.DoubleType(), True),
            T.StructField("idx", T.LongType(), True),
        ]
    )

    def tile_kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.matrix_profile import mpx_tile_partial

        for pdf in it:
            for row in pdf.itertuples(index=False):
                t_w = int(row.t_width)
                len_a = int(row.len_a)
                r0 = int(row.r) * t_w
                c0 = int(row.c) * t_w
                n_row = min(t_w, len_a - r0)
                n_col = min(t_w, len_a - c0)
                if n_row <= 0 or n_col <= 0:
                    continue
                mpr, idr, mpc, idc = mpx_tile_partial(
                    np.asarray(row.row_vals, dtype=np.float64),
                    np.asarray(row.col_vals, dtype=np.float64),
                    r0,
                    c0,
                    n_row,
                    n_col,
                    w,
                    remap_neg_corr=opts.remap_neg_corr,
                )
                frames = [
                    pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "metric": row.metric,
                            "offset": np.arange(r0, r0 + mpr.size, dtype=np.int32),
                            "corr": mpr,
                            "idx": idr,
                        }
                    )
                ]
                if not (row.r == row.c):
                    frames.append(
                        pd.DataFrame(
                            {
                                "conv_id": row.conv_id,
                                "metric": row.metric,
                                "offset": np.arange(c0, c0 + mpc.size, dtype=np.int32),
                                "corr": mpc,
                                "idx": idc,
                            }
                        )
                    )
                else:
                    # diagonal tile: row/col ranges coincide; emit the
                    # element-wise better of the two partials. Exact
                    # Pearson ties break toward the smaller |idx - offset|
                    # (earliest global diagonal), and at EQUAL distance
                    # toward the col partial, whose idx = offset - d is
                    # the lower one — the whole-series kernel touches the
                    # diagonal side (lower idx) first within a diagonal,
                    # so strict > there means lower idx wins (r02 advisor
                    # item). Same key as the cross-tile max_by merge.
                    offs = np.arange(r0, r0 + mpr.size, dtype=np.int64)
                    better = (mpc > mpr) | (
                        (mpc == mpr) & (np.abs(idc - offs) <= np.abs(idr - offs))
                    )
                    mpr2 = np.where(better, mpc, mpr)
                    idr2 = np.where(better, idc, idr)
                    frames = [
                        pd.DataFrame(
                            {
                                "conv_id": row.conv_id,
                                "metric": row.metric,
                                "offset": np.arange(r0, r0 + mpr.size, dtype=np.int32),
                                "corr": mpr2,
                                "idx": idr2,
                            }
                        )
                    ]
                yield pd.concat(frames, ignore_index=True)

    partials = tile_in.mapInPandas(tile_kernel, part_schema)
    # merge: max corr; ties -> earliest global diagonal (MPX's strict >
    # with ascending diagonals, matrixprofile.go:1038-1044); at EQUAL
    # diagonal distance (candidates offset-d and offset+d both tied) ->
    # the lower idx, because the whole-series kernel's diagonal-side
    # touch precedes the offset-side touch within a diagonal
    diag_dist = F.abs(F.col("idx") - F.col("offset"))
    merged = partials.groupBy("conv_id", "metric", "offset").agg(
        F.max_by(
            F.struct("corr", "idx"),
            F.struct(
                F.col("corr"),
                (-diag_dist).alias("nd"),
                (-F.col("idx")).alias("ni"),
            ),
        ).alias("best")
    )
    # p2e: d = sqrt(2w(1 - min(corr, 1)))  (util/util.go:266-274)
    return merged.select(
        "conv_id",
        "metric",
        F.lit(w).cast("int").alias("w"),
        "offset",
        F.sqrt(2.0 * w * (1.0 - F.least(F.col("best.corr"), F.lit(1.0)))).alias("mp"),
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
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Analyze pipeline per conv: MP → motifs + discords + segmentation.

    The greedy discovery loops are inherently sequential per series
    (each pick mutates the profile — SURVEY.md §2.5) so they run inside
    the per-conv UDF; results explode into three tables. Series shorter
    than max(2w, w+4) have no meaningful discovery (the reference's own
    constructors reject 2w >= n, kmp.go:52) — they are NOT silently
    dropped: the fourth returned table lists every skipped
    (conv_id, metric) with its length and the floor it missed.
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
                    # surfaced, not dropped: score = observed length,
                    # idx = [required floor]
                    rows.append(
                        (conv_id, metric, w, "skipped", 0,
                         [max(2 * w, w + 4)], float(vals.size))
                    )
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
    skipped = combined.where(F.col("kind") == "skipped").select(
        "conv_id",
        "metric",
        "w",
        F.element_at("idx", 1).alias("min_len_required"),
        F.col("score").cast("int").alias("series_len"),
    )
    return motifs, discords, segments, skipped


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


def pan_matrix_profile_distributed(
    series: DataFrame,
    lower_m: int,
    upper_m: int,
    opts: MPOpts | None = None,
    windows_per_task: int = 8,
) -> DataFrame:
    """Pan-MP with (conv, window-batch) task granularity and a FUSED
    multi-window kernel.

    ``pan_matrix_profile`` computes every window inside ONE per-conv
    task (faithful to pmp.go:119-161, which loops mp.Compute over
    windows) — fine for a wide fleet, but a few long conversations
    leave cores idle while each task grinds through the whole window
    range. Here the window dimension becomes data: the per-conv array
    crosses with the broadcast window-BATCH list (binary_split order +
    sample_pct truncation, pmp.go:119-121, chunked into
    ``windows_per_task`` groups) and each (conv, metric, batch) is its
    own task running kernels.pmp.pmp_fused — one shared product+cumsum
    pass per diagonal feeds every window in the batch (~1.4x the
    per-window kernel at 4k/32 windows), and each conversation's array
    ships once per BATCH instead of once per window (shuffle volume
    ÷ windows_per_task; the dominant win at fleet scale).

    ``windows_per_task`` trades task granularity against amortization:
    1 reproduces the old (conv, window) layout; len(windows) puts each
    conv in a single task. Values match the faithful kernel to
    accumulation order (pinned ≤1e-9 by pytest; the driver oracle
    rounds at 4 decimals).
    """
    from ..kernels.pmp import pmp_fused
    from ..kernels.util import binary_split

    opts = opts or MPOpts()
    windows = binary_split(lower_m, upper_m)
    windows = windows[: int(len(windows) * opts.sample_pct)]
    if not windows:
        raise ValueError("Need more than one subsequence window for pmp")
    wpt = max(1, int(windows_per_task))
    batches = [
        (b, [int(x) for x in windows[i : i + wpt]])
        for b, i in enumerate(range(0, len(windows), wpt))
    ]
    # no pre-repartition: the cross join below is followed by its own
    # per-(conv, batch) numbered repartition
    assembled = assemble_series(series, repartition=False)
    spark = series.sparkSession
    wdf = spark.createDataFrame(batches, "batch int, ws array<int>")
    tasks = assembled.crossJoin(F.broadcast(wdf)).repartition(
        cpu_partitions(series)
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for row in pdf.itertuples(index=False):
                vals = np.asarray(row.vals, dtype=np.float64)
                # same whole-conv gate as pan_matrix_profile: a conv is
                # in the pan-MP iff it fits the LARGEST window
                if vals.size < upper_m + 2:
                    continue
                fused = pmp_fused(vals, list(row.ws), opts)
                for w, (mp, idx) in fused.items():
                    yield pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "metric": row.metric,
                            "w": np.int32(w),
                            "offset": np.arange(mp.size, dtype=np.int32),
                            "mp": mp,
                            "idx": idx,
                        }
                    )

    return tasks.mapInPandas(kernel, MP_SCHEMA)


def mpdist_pairs(
    series: DataFrame,
    w: int,
    max_convs: int = 20,
    opts: MPOpts | None = None,
    conv_ids: list[str] | None = None,
) -> DataFrame:
    """Conversation-to-conversation MPDist similarity matrix
    (MPDist, matrixprofile.go:243-338).

    All-pairs MPDist is inherently quadratic in conversations, so the
    pair space must be bounded: pass an explicit ``conv_ids`` list
    (broadcast semi-join — no sort, the scale path) or fall back to the
    first ``max_convs`` by conv_id (orderBy+limit; fine for bounded
    exploration, not for a full-corpus plan). Series are assembled per
    conv (one aggregation), the small conv-level table self-joins
    (broadcast), and each pair's MPDist runs as one Arrow-batched task.
    """
    opts = opts or MPOpts()
    src = series.select("conv_id", "metric", "bucket_s", "value")
    if conv_ids is not None:
        keys = series.sparkSession.createDataFrame(
            [(c,) for c in conv_ids], "conv_id string"
        )
        src = src.join(F.broadcast(keys), "conv_id", "left_semi")
    assembled = (
        src.groupBy("conv_id", "metric")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket_s", "value"))),
                lambda s: s["value"],
            ).alias("vals")
        )
        .where(F.size("vals") > w * 2)
    )
    ranked = (
        assembled
        if conv_ids is not None
        else assembled.orderBy("conv_id").limit(max_convs)
    )
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
    # no pre-repartition: the equi-join and the kernel repartition below
    # establish their own partitioning
    a = assemble_series(series_a, repartition=False).select(
        "conv_id", F.col("vals").alias("a_vals")
    )
    b = assemble_series(series_b, repartition=False).select(
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

    # round-robin: one array row per conv, spread exactly evenly over
    # the kernel tasks (a by-key repartition leaves ~1/e of the slots
    # empty to hash collisions); mapInPandas needs no key clustering
    return joined.repartition(cpu_partitions(joined)).mapInPandas(kernel, schema)


def _ab_segments(
    src: DataFrame, w: int, t_w: int, side: str, grid_step: int | None = None
) -> DataFrame:
    """Overlapping fixed-width segments of one AB-join side:
    (conv_id, seg, vals, len_p) with vals bounded by t_w + w - 1.
    grid_step: see _grid_positions — arithmetic positions for regular
    grids instead of a single-task per-conv sort."""
    pts = _grid_positions(src, ["conv_id"], grid_step).where(F.col("n") >= w + 1)
    pts = pts.withColumn("len_p", F.col("n") - w + 1)
    s_hi = (F.col("pos") / t_w).cast("long")
    seg_candidates = F.array(
        F.when(s_hi < F.ceil(F.col("len_p") / t_w).cast("long"), s_hi),
        F.when((s_hi >= 1) & (F.col("pos") % t_w < w - 1), s_hi - 1),
    )
    seg_pts = pts.select(
        "conv_id",
        "value",
        "pos",
        "len_p",
        F.explode(F.filter(seg_candidates, lambda s: s.isNotNull())).alias("seg"),
    )
    return seg_pts.groupBy("conv_id", "seg").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "value"))), lambda s: s["value"]
        ).alias(f"{side}_vals"),
        F.first("len_p").alias(f"{side}_len"),
    )


def matrix_profile_ab_chunked(
    series_a: DataFrame,
    series_b: DataFrame,
    w: int,
    tile_points: int = 4096,
    grid_step: int | None = None,
) -> DataFrame:
    """Tiled AB-join matrix profile: the full A-offsets × B-offsets
    rectangle splits into fixed-width tiles; each task receives one
    O(T+w) segment per side (kernels.mpx_tile_partial with
    self_join=False — no exclusion zone, both directions). Same scale
    contract as the self-join tiles: per-task work ~tile_points² cells,
    shuffle volume O((na+nb)·k), no whole-series rows. Output matches
    matrix_profile_ab: (conv_id, direction ab|ba, w, offset, mp, idx).
    grid_step: arithmetic positions for regular-grid input (e.g. a
    gap-filled tier) instead of a single-task per-conv sort — see
    _grid_positions.
    """
    t_w = max(int(tile_points), w)
    a_src = series_a.select("conv_id", "bucket_s", "value")
    b_src = series_b.select("conv_id", "bucket_s", "value")
    a_segs = _ab_segments(a_src, w, t_w, "a", grid_step)
    b_segs = _ab_segments(b_src, w, t_w, "b", grid_step)
    tiles = (
        a_segs.withColumnRenamed("seg", "r")
        .join(b_segs.withColumnRenamed("seg", "c"), "conv_id")
        .repartition(cpu_partitions(series_a))
    )

    part_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("direction", T.StringType(), False),
            T.StructField("offset", T.IntegerType(), False),
            T.StructField("corr", T.DoubleType(), True),
            T.StructField("idx", T.LongType(), True),
        ]
    )

    def tile_kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.matrix_profile import mpx_tile_partial

        for pdf in it:
            for row in pdf.itertuples(index=False):
                r0 = int(row.r) * t_w
                c0 = int(row.c) * t_w
                n_row = min(t_w, int(row.a_len) - r0)
                n_col = min(t_w, int(row.b_len) - c0)
                if n_row <= 0 or n_col <= 0:
                    continue
                mpr, idr, mpc, idc = mpx_tile_partial(
                    np.asarray(row.a_vals, dtype=np.float64),
                    np.asarray(row.b_vals, dtype=np.float64),
                    r0,
                    c0,
                    n_row,
                    n_col,
                    w,
                    self_join=False,
                )
                yield pd.concat(
                    [
                        pd.DataFrame(
                            {
                                "conv_id": row.conv_id,
                                "direction": "ab",
                                "offset": np.arange(r0, r0 + mpr.size, dtype=np.int32),
                                "corr": mpr,
                                "idx": idr,
                            }
                        ),
                        pd.DataFrame(
                            {
                                "conv_id": row.conv_id,
                                "direction": "ba",
                                "offset": np.arange(c0, c0 + mpc.size, dtype=np.int32),
                                "corr": mpc,
                                "idx": idc,
                            }
                        ),
                    ],
                    ignore_index=True,
                )

    partials = tiles.mapInPandas(tile_kernel, part_schema)
    # tie rule: smallest signed diagonal d = j_B - i_A wins — the first
    # diagonal mpx_tile_partial's ascending-d traversal touches, on BOTH
    # sides of the tile (A side at fixed i visits j ascending; B side at
    # fixed j visits i descending — both are d ascending with strict >).
    # For direction 'ab' (offset in A, idx in B) d = idx - offset, so the
    # key minimizes idx; for 'ba' (offset in B, idx in A) d = offset -
    # idx, so the key MAXIMIZES idx. The whole-series Go kernel's own AB
    # tie order (mpxab's descending-j pass before mpxba's ascending-j,
    # matrixprofile.go:1057-1198) is a pass-structure artifact the tiles
    # cannot reproduce without order-aware interiors; raw-float AB tie
    # parity with Go is pinned by matrix_profile_ab (golden fixtures),
    # and the tiled path pins THIS rule with a tie-specific pytest.
    tie = F.when(F.col("direction") == "ab", -F.col("idx")).otherwise(F.col("idx"))
    merged = partials.groupBy("conv_id", "direction", "offset").agg(
        F.max_by(
            F.struct("corr", "idx"),
            F.struct(F.col("corr"), tie.alias("ni")),
        ).alias("best")
    )
    return merged.select(
        "conv_id",
        "direction",
        F.lit(w).cast("int").alias("w"),
        "offset",
        F.sqrt(2.0 * w * (1.0 - F.least(F.col("best.corr"), F.lit(1.0)))).alias("mp"),
        F.col("best.idx").alias("idx"),
    )


def matrix_profile_auto(
    series: DataFrame,
    w: int,
    opts: MPOpts | None = None,
    value_col: str = "value",
    chunk_threshold: int = 8192,
    n_batches: int = 8,
    grid_step: int | None = None,
) -> DataFrame:
    """Skew-aware MP: routes each conversation by series length.

    Mega-threads are the skew hazard of transcript corpora (power-law
    lengths): one giant conversation as a single task stalls the stage.
    Short series (< chunk_threshold points) run whole-series-per-task;
    long ones run as FIXED-WIDTH 2-D tiles (tile_points =
    chunk_threshold) — per-task work stays ~chunk_threshold² cells no
    matter how long the conversation, so a 10^8-point mega-thread
    becomes many uniform tasks instead of a few ever-fatter ones.
    """
    opts = opts or MPOpts(algorithm="mpx")
    src = series.select(
        "conv_id", "metric", "bucket_s", F.col(value_col).alias("value")
    )
    # routing via a computed length column through a NON-broadcast join:
    # at corpus scale the short-key list is nearly every (conv, metric)
    # pair — billions of rows — so broadcasting it would funnel the whole
    # routing table through the driver. A shuffled join on (conv, metric)
    # re-uses the exact partitioning the downstream series assembly and
    # tile stages shuffle on anyway.
    lengths = src.groupBy("conv_id", "metric").agg(F.count("*").alias("n"))
    routed = src.join(lengths, ["conv_id", "metric"])
    short = routed.where(F.col("n") < chunk_threshold).drop("n")
    long = routed.where(F.col("n") >= chunk_threshold).drop("n")
    prof_short = matrix_profile(short, w, opts, min_len=None)
    prof_long = matrix_profile_chunked(
        long, w, opts=opts, tile_points=chunk_threshold, grid_step=grid_step
    )
    return prof_short.unionByName(prof_long)
