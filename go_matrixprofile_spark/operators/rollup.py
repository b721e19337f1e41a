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


def _grid(tier: DataFrame, step_seconds: int, value_col: str) -> DataFrame:
    """Dense per-(conv,metric) bucket grid left-joined with observations.

    The grid spans each series' own [min, max] so sparse conversations
    don't explode into the global time range.
    """
    bounds = tier.groupBy("conv_id", "metric").agg(
        F.min("bucket_s").cast("long").alias("lo"),
        F.max("bucket_s").cast("long").alias("hi"),
    )
    grid = bounds.select(
        "conv_id",
        "metric",
        F.explode(F.sequence("lo", "hi", F.lit(step_seconds).cast("long"))).alias(
            "bucket_s"
        ),
    )
    obs = tier.select(
        "conv_id",
        "metric",
        F.col("bucket_s").cast("long").alias("bucket_s"),
        F.col(value_col).alias("v"),
    )
    return grid.join(obs, ["conv_id", "metric", "bucket_s"], "left")


def gap_fill_locf(
    tier: DataFrame,
    step_seconds: int = 60,
    value_col: str = "sum",
) -> DataFrame:
    """Dense grid per (conv_id, metric) + last-observation-carried-forward.

    Output: (conv_id, metric, bucket_s long, value double, filled bool);
    `filled` marks synthesized buckets. LOCF = built-in
    last(value, ignoreNulls) over an unbounded-preceding window
    (as-of semantics).
    """
    joined = _grid(tier, step_seconds, value_col)
    w = (
        Window.partitionBy("conv_id", "metric")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "conv_id",
        "metric",
        "bucket_s",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("filled"),
    )


def gap_fill_interpolate(
    tier: DataFrame, step_seconds: int = 60, value_col: str = "sum"
) -> DataFrame:
    """Linear-interpolation variant of gap-fill.

    Missing buckets take prev + (next-prev)·(t-t_prev)/(t_next-t_prev);
    after the last observation the previous value carries (LOCF tail).
    """
    joined = _grid(tier, step_seconds, value_col)
    part = Window.partitionBy("conv_id", "metric").orderBy("bucket_s")
    wprev = part.rowsBetween(Window.unboundedPreceding, 0)
    wnext = part.rowsBetween(0, Window.unboundedFollowing)
    ts = F.col("bucket_s").cast("double")
    prev_v = F.last("v", ignorenulls=True).over(wprev)
    next_v = F.first("v", ignorenulls=True).over(wnext)
    prev_t = F.last(F.when(F.col("v").isNotNull(), ts), ignorenulls=True).over(wprev)
    next_t = F.first(F.when(F.col("v").isNotNull(), ts), ignorenulls=True).over(wnext)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            next_v.isNotNull() & prev_v.isNotNull() & (next_t != prev_t),
            prev_v + (next_v - prev_v) * (ts - prev_t) / (next_t - prev_t),
        ).otherwise(F.coalesce(prev_v, next_v))
    )
    return joined.select(
        "conv_id",
        "metric",
        "bucket_s",
        interp.alias("value"),
        F.col("v").isNull().alias("filled"),
    )
