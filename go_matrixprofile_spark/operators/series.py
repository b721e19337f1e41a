"""Per-conversation series derivation from transcript tables.

Input: the north-rule transcript shape
  (conv_id string, turn_idx int, role string, text string, tool string,
   ts timestamp)
Output: the long-format series table
  series_raw(conv_id string, metric string, bucket_ts timestamp,
             value double)
with metric ∈ {text_len, inter_turn_latency_s, turn_rate}.

All three derivations are pure built-in-function DataFrame plans
(window functions + tumbling windows): Catalyst pushes column pruning
into the scan and the only shuffle is the per-conv window sort /
aggregation, which at cluster scale is hash-partitioned by conv_id.
The reference has no relational layer at all (SURVEY.md §2.8); these
are the engine's new ingest operators per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

METRIC_TEXT_LEN = "text_len"
METRIC_LATENCY = "inter_turn_latency_s"
METRIC_TURN_RATE = "turn_rate"


def text_len_series(transcripts: DataFrame) -> DataFrame:
    """value = length(text) per turn, at raw turn timestamps."""
    return transcripts.select(
        "conv_id",
        F.lit(METRIC_TEXT_LEN).alias("metric"),
        F.col("ts").alias("bucket_ts"),
        F.length("text").cast("double").alias("value"),
    )


def inter_turn_latency_series(transcripts: DataFrame) -> DataFrame:
    """value = seconds since the previous turn of the same conversation.

    Window over (conv_id, turn_idx); the first turn has no predecessor
    and is dropped (no latency defined).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.select(
            "conv_id",
            F.lit(METRIC_LATENCY).alias("metric"),
            F.col("ts").alias("bucket_ts"),
            (
                F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
            ).alias("value"),
        )
        .where(F.col("value").isNotNull())
    )


def turn_rate_series(transcripts: DataFrame, bucket: str = "1 minute") -> DataFrame:
    """value = turns per tumbling bucket (defined at bucket granularity)."""
    return (
        transcripts.groupBy(
            "conv_id", F.window("ts", bucket).alias("win")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .select(
            "conv_id",
            F.lit(METRIC_TURN_RATE).alias("metric"),
            F.col("win.start").alias("bucket_ts"),
            "value",
        )
    )


def derive_series(transcripts: DataFrame) -> DataFrame:
    """All three metrics unioned into one long-format series table."""
    return (
        text_len_series(transcripts)
        .unionByName(inter_turn_latency_series(transcripts))
        .unionByName(turn_rate_series(transcripts))
    )
