"""Tiered continuous aggregates (raw→1m→1h→1d) + gap-fill.

The rollup is the classic partial/final aggregation split: the 1m tier
aggregates raw points; every higher tier aggregates the *next-lower
tier's partials* (sum of counts, sum of sums, min of mins, first by
earliest child bucket via min_by) — so a 1d row never rescans raw
data. At 10^12-turn scale each tier is ~60× smaller than the one
below; the only shuffle per tier is the hash aggregation on
(conv_id, metric, bucket), which AQE coalesces.

Tier schema (FIXTURES.md A.2):
  (conv_id string, metric string, bucket_ts timestamp,
   cnt long, sum double, min double, max double,
   first double, last double)

Gap-fill materializes the dense per-minute grid per (conv_id, metric)
with sequence()+explode and fills missing buckets by
last-observation-carried-forward (as-of semantics): built-in
last(value, ignoreNulls=True) over an unbounded-preceding window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _bucket(col, seconds: int):
    """Truncate a timestamp column to an epoch-aligned bucket."""
    return F.timestamp_seconds(
        (F.col(col).cast("long") / seconds).cast("long") * seconds
    )


def rollup_raw(series_raw: DataFrame, tier: str = "1m") -> DataFrame:
    """raw points → first tier of partial aggregates.

    first/last are ordered by the raw event timestamp (min_by/max_by),
    deterministic because raw bucket_ts values are unique per
    (conv_id, metric) in transcript-derived series.
    """
    seconds = TIER_SECONDS[tier]
    return (
        series_raw.groupBy(
            "conv_id", "metric", _bucket("bucket_ts", seconds).alias("bucket_ts")
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min_by("value", "bucket_ts").alias("first"),
            F.max_by("value", "bucket_ts").alias("last"),
        )
    )


def rollup_tier(lower_tier: DataFrame, tier: str) -> DataFrame:
    """next tier from the lower tier's partials — no raw rescan.

    first of the hour = the `first` of its earliest minute bucket
    (min_by on the child bucket_ts); counts and sums add; min/max fold.
    """
    seconds = TIER_SECONDS[tier]
    return (
        lower_tier.groupBy(
            "conv_id", "metric", _bucket("bucket_ts", seconds).alias("bucket_ts")
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", "bucket_ts").alias("first"),
            F.max_by("last", "bucket_ts").alias("last"),
        )
    )


def rollup_all_tiers(series_raw: DataFrame) -> dict[str, DataFrame]:
    """raw→1m→1h→1d, each tier derived from the previous."""
    t1m = rollup_raw(series_raw, "1m")
    t1h = rollup_tier(t1m, "1h")
    t1d = rollup_tier(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def gap_fill_locf(
    tier: DataFrame,
    step_seconds: int = 60,
    value_col: str = "sum",
) -> DataFrame:
    """Dense grid per (conv_id, metric) + last-observation-carried-forward.

    Output: (conv_id, metric, bucket_ts, value double, filled boolean)
    where filled marks synthesized buckets. The grid spans each
    series' own [min_bucket, max_bucket] so sparse conversations don't
    explode into the global time range.
    """
    bounds = tier.groupBy("conv_id", "metric").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    grid = bounds.select(
        "conv_id",
        "metric",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {step_seconds} seconds"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(
        tier.select("conv_id", "metric", "bucket_ts", F.col(value_col).alias("v")),
        ["conv_id", "metric", "bucket_ts"],
        "left",
    )
    w = (
        Window.partitionBy("conv_id", "metric")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "conv_id",
        "metric",
        "bucket_ts",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("filled"),
    )


def gap_fill_interpolate(
    tier: DataFrame, step_seconds: int = 60, value_col: str = "sum"
) -> DataFrame:
    """Linear-interpolation variant of gap-fill.

    Same grid; missing buckets take
    prev + (next - prev) · (t - t_prev)/(t_next - t_prev).
    Buckets after the last observation stay at the previous value
    (LOCF tail), before the first stay null.
    """
    bounds = tier.groupBy("conv_id", "metric").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    grid = bounds.select(
        "conv_id",
        "metric",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {step_seconds} seconds"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(
        tier.select("conv_id", "metric", "bucket_ts", F.col(value_col).alias("v")),
        ["conv_id", "metric", "bucket_ts"],
        "left",
    )
    part = Window.partitionBy("conv_id", "metric").orderBy("bucket_ts")
    wprev = part.rowsBetween(Window.unboundedPreceding, 0)
    wnext = part.rowsBetween(0, Window.unboundedFollowing)
    ts = F.col("bucket_ts").cast("double")
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
        "bucket_ts",
        interp.alias("value"),
        F.col("v").isNull().alias("filled"),
    )
