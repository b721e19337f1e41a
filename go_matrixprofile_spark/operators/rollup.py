"""Tiered continuous aggregates (raw→1m→1h→1d) + gap-fill.

The rollup is the classic partial/final aggregation split: the 1m tier
aggregates raw points; every higher tier aggregates the *next-lower
tier's partials* (sum of counts, sum of sums, min of mins, first by
earliest child bucket via min_by) — a 1d row never rescans raw data.
At 10^12-turn scale each tier is ~60× smaller than the one below; the
only shuffle per tier is the hash aggregation on
(conv_id, metric, bucket_s).

Shuffle/skew design: the per-tier group keys include the bucket, so a
mega-thread's raw rows spread across many reducers instead of hammering
one (conv_id, metric) partition; map-side partial aggregation collapses
most rows before the exchange, and AQE coalesces the small upper-tier
shuffles. This is why the tiers deliberately do NOT pre-partition by
conv_id alone.

Time is numeric epoch seconds end-to-end (bucket_s) — see
operators/series.py.

Tier schema (FIXTURES.md A.2, bucket as epoch seconds):
  (conv_id string, metric string, bucket_s long,
   cnt long, sum double, min double, max double,
   first double, last double)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _bucket(seconds: int):
    return (F.floor(F.col("bucket_s") / seconds) * seconds).cast("long")


def rollup_raw(series_raw: DataFrame, tier: str = "1m") -> DataFrame:
    """raw points → first tier of partial aggregates.

    first/last are ordered by the raw event time (min_by/max_by),
    deterministic because raw bucket_s values are unique per
    (conv_id, metric) in transcript-derived series.
    """
    seconds = TIER_SECONDS[tier]
    return (
        series_raw.groupBy(
            "conv_id", "metric", _bucket(seconds).alias("bucket_s")
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min_by("value", "bucket_s").alias("first"),
            F.max_by("value", "bucket_s").alias("last"),
        )
    )


def rollup_tier(lower_tier: DataFrame, tier: str) -> DataFrame:
    """next tier from the lower tier's partials — no raw rescan.

    first of the hour = the `first` of its earliest minute bucket
    (min_by on the child bucket_s); counts and sums add; min/max fold.
    """
    seconds = TIER_SECONDS[tier]
    return (
        lower_tier.groupBy(
            "conv_id", "metric", _bucket(seconds).alias("bucket_s")
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", "bucket_s").alias("first"),
            F.max_by("last", "bucket_s").alias("last"),
        )
    )


def rollup_all_tiers(series_raw: DataFrame) -> dict[str, DataFrame]:
    """raw→1m→1h→1d, each tier derived from the previous."""
    t1m = rollup_raw(series_raw, "1m")
    t1h = rollup_tier(t1m, "1h")
    t1d = rollup_tier(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def _aligned_obs(tier: DataFrame, step_seconds: int, value_col: str) -> DataFrame:
    """Observation rows that land on the dense per-(conv,metric) grid,
    each annotated with its fill span.

    The gap-fill grid spans each series' own [min, max] in steps of
    ``step_seconds`` anchored at the group's min bucket, so sparse
    conversations don't explode into the global time range; observations
    off the grid residue (possible only when the tier granularity does
    not divide into ``step_seconds``) anchor the span but contribute no
    value — exactly the semantics of the former dense-grid left join,
    where such rows matched no grid bucket.

    One window pass over the TIER rows (not the dense grid) computes the
    group bounds and, over the aligned rows, the next grid-aligned
    observation; every dense bucket is then generated arithmetically by
    the caller's `sequence` explode. This replaces the former plan —
    bounds aggregation + grid explode + join + a second window over the
    DENSE table — with a single exchange over the (much smaller) tier,
    and the explode output stays hash-partitioned by conv_id, so a
    downstream per-conv stage (profile assembly) re-uses the exchange.

    Columns: obs_s (grid-aligned obs bucket), v (its value, may be
    null), span_end (last dense bucket this obs covers: next aligned obs
    minus one step, or the grid end for the final obs).
    """
    step = F.lit(int(step_seconds)).cast("long")
    part = Window.partitionBy("conv_id", "metric")
    obs = tier.select(
        "conv_id",
        "metric",
        F.col("bucket_s").cast("long").alias("obs_s"),
        F.col(value_col).alias("v"),
    )
    bounded = obs.select(
        "conv_id",
        "metric",
        "obs_s",
        "v",
        F.min("obs_s").over(part).alias("lo"),
        F.max("obs_s").over(part).alias("hi"),
    ).where((F.col("obs_s") - F.col("lo")) % step == 0)
    # last grid bucket: lo + floor((hi - lo)/step)*step, in exact long
    # arithmetic ((hi - lo) % step is non-negative: hi >= lo)
    g_hi = F.col("lo") + (
        (F.col("hi") - F.col("lo")) - (F.col("hi") - F.col("lo")) % step
    )
    ow = part.orderBy("obs_s")
    return bounded.select(
        "conv_id",
        "metric",
        "obs_s",
        "v",
        # greatest() guards out-of-contract duplicate buckets (sequence
        # rejects a descending range with a positive step)
        F.greatest(
            F.coalesce(F.lead("obs_s").over(ow) - step, g_hi), F.col("obs_s")
        ).alias("span_end"),
    )


def gap_fill_locf(
    tier: DataFrame,
    step_seconds: int = 60,
    value_col: str = "sum",
) -> DataFrame:
    """Dense grid per (conv_id, metric) + last-observation-carried-forward.

    Output: (conv_id, metric, bucket_s long, value double, filled bool);
    `filled` marks synthesized buckets. Each observation carries forward
    over its span (obs bucket up to the bucket before the next
    observation), so the dense rows are generated already carrying their
    value — one window over the tier + an arithmetic sequence explode,
    instead of materializing the dense grid first and LOCF-scanning it
    with a second window (see _aligned_obs).
    """
    step = F.lit(int(step_seconds)).cast("long")
    spans = _aligned_obs(tier, step_seconds, value_col)
    # carried = last non-null value at or before this obs: only differs
    # from v for null-valued observations (impossible for rollup tiers,
    # where every aggregate of a non-empty group is non-null)
    wprev = (
        Window.partitionBy("conv_id", "metric")
        .orderBy("obs_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = spans.select(
        "conv_id",
        "metric",
        "obs_s",
        "v",
        "span_end",
        F.last("v", ignorenulls=True).over(wprev).alias("value"),
    )
    return carried.select(
        "conv_id",
        "metric",
        F.explode(F.sequence("obs_s", "span_end", step)).alias("bucket_s"),
        "value",
        "obs_s",
        "v",
    ).select(
        "conv_id",
        "metric",
        "bucket_s",
        "value",
        ((F.col("bucket_s") != F.col("obs_s")) | F.col("v").isNull()).alias("filled"),
    )


def gap_fill_interpolate(
    tier: DataFrame, step_seconds: int = 60, value_col: str = "sum"
) -> DataFrame:
    """Linear-interpolation variant of gap-fill.

    Missing buckets take prev + (next-prev)·(t-t_prev)/(t_next-t_prev);
    after the last observation the previous value carries (LOCF tail).
    Same single-window span construction as gap_fill_locf: the
    interpolation endpoints (previous / next non-null observation and
    their times) are window functions over the TIER rows, and each dense
    bucket interpolates arithmetically inside the span explode.
    """
    step = F.lit(int(step_seconds)).cast("long")
    spans = _aligned_obs(tier, step_seconds, value_col)
    part = Window.partitionBy("conv_id", "metric").orderBy("obs_s")
    wprev = part.rowsBetween(Window.unboundedPreceding, 0)
    wnext = part.rowsBetween(1, Window.unboundedFollowing)
    ts = F.col("obs_s").cast("double")
    ann = spans.select(
        "conv_id",
        "metric",
        "obs_s",
        "v",
        "span_end",
        F.last("v", ignorenulls=True).over(wprev).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), ts), ignorenulls=True)
        .over(wprev)
        .alias("pt"),
        F.first("v", ignorenulls=True).over(wnext).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), ts), ignorenulls=True)
        .over(wnext)
        .alias("nt"),
    )
    rows = ann.select(
        "conv_id",
        "metric",
        F.explode(F.sequence("obs_s", "span_end", step)).alias("bucket_s"),
        "obs_s",
        "v",
        "pv",
        "pt",
        "nv",
        "nt",
    )
    # identical expression shape (and therefore bit-identical IEEE
    # arithmetic) to the former dense-grid formulation: at an observed
    # bucket the value passes through; interior buckets interpolate
    # between the nearest non-null observations; past the last (or
    # before the first) non-null observation the available endpoint
    # carries. For interior buckets the previous non-null observation
    # at-or-before the generating obs IS the previous non-null at the
    # bucket (there is no observation strictly inside a span).
    gts = F.col("bucket_s").cast("double")
    at_obs = (F.col("bucket_s") == F.col("obs_s")) & F.col("v").isNotNull()
    interp = F.when(at_obs, F.col("v")).otherwise(
        F.when(
            F.col("nv").isNotNull() & F.col("pv").isNotNull() & (F.col("nt") != F.col("pt")),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (gts - F.col("pt"))
            / (F.col("nt") - F.col("pt")),
        ).otherwise(F.coalesce("pv", "nv"))
    )
    return rows.select(
        "conv_id",
        "metric",
        "bucket_s",
        interp.alias("value"),
        ((F.col("bucket_s") != F.col("obs_s")) | F.col("v").isNull()).alias("filled"),
    )
