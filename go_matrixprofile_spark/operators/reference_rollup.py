"""Single-node pandas reference implementation of the rollup pipeline.

The north rule requires the Spark engine's rolled-up points to exactly
match a reference single-node implementation at every tier; this module
IS that reference (used only by pytest — never by the engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def derive_series_pandas(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Mirror of operators/series.derive_series."""
    t = transcripts.sort_values(["conv_id", "turn_idx"])
    text_len = pd.DataFrame(
        {
            "conv_id": t["conv_id"],
            "metric": "text_len",
            "bucket_ts": t["ts"],
            "value": t["text"].str.len().astype(float),
        }
    )
    ts_sec = t["ts"].astype("datetime64[ns]").astype("int64") / 1e9
    lat = pd.DataFrame(
        {
            "conv_id": t["conv_id"],
            "metric": "inter_turn_latency_s",
            "bucket_ts": t["ts"],
            "value": ts_sec - ts_sec.groupby(t["conv_id"]).shift(1),
        }
    ).dropna(subset=["value"])
    minute = t["ts"].dt.floor("min")
    tr = (
        t.groupby(["conv_id", minute], as_index=False)
        .size()
        .rename(columns={"ts": "bucket_ts", "size": "value"})
    )
    turn_rate = pd.DataFrame(
        {
            "conv_id": tr["conv_id"],
            "metric": "turn_rate",
            "bucket_ts": tr["bucket_ts"],
            "value": tr["value"].astype(float),
        }
    )
    return pd.concat([text_len, lat, turn_rate], ignore_index=True)


def rollup_pandas(series: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Tier aggregate straight from raw points (the oracle for the
    partial/final split: a correct tier-on-tier rollup must equal it)."""
    s = series.sort_values(["conv_id", "metric", "bucket_ts"]).copy()
    sec = TIER_SECONDS[tier]
    ns = s["bucket_ts"].astype("datetime64[ns]").astype("int64")
    s["bucket"] = pd.to_datetime((ns // (sec * 10**9)) * sec * 10**9)
    g = s.groupby(["conv_id", "metric", "bucket"])["value"]
    out = g.agg(cnt="count", sum="sum", min="min", max="max", first="first", last="last")
    return out.reset_index().rename(columns={"bucket": "bucket_ts"})


def gap_fill_locf_pandas(tier: pd.DataFrame, step_seconds: int = 60, value_col: str = "sum") -> pd.DataFrame:
    """Mirror of operators/rollup.gap_fill_locf."""
    frames = []
    for (conv, metric), grp in tier.groupby(["conv_id", "metric"]):
        grp = grp.sort_values("bucket_ts")
        grid = pd.date_range(
            grp["bucket_ts"].min(), grp["bucket_ts"].max(), freq=f"{step_seconds}s"
        )
        g = grp.set_index("bucket_ts")[value_col].reindex(grid)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "metric": metric,
                    "bucket_ts": grid,
                    "value": g.ffill().to_numpy(),
                    "filled": g.isna().to_numpy(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)
