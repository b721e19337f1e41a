"""Single-node pandas reference implementation of the rollup pipeline.

The north rule requires the Spark engine's rolled-up points to exactly
match a reference single-node implementation at every tier; this module
IS that reference (used only by pytest — never by the engine).
Time is epoch seconds (bucket_s), mirroring operators/series.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _epoch_s(ts: pd.Series) -> pd.Series:
    return ts.astype("datetime64[ns]").astype("int64") / 1e9


def derive_series_pandas(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Mirror of operators/series.derive_series."""
    t = transcripts.sort_values(["conv_id", "turn_idx"])
    ts_sec = _epoch_s(t["ts"])
    text_len = pd.DataFrame(
        {
            "conv_id": t["conv_id"],
            "metric": "text_len",
            "bucket_s": ts_sec,
            "value": t["text"].str.len().astype(float),
        }
    )
    lat = pd.DataFrame(
        {
            "conv_id": t["conv_id"],
            "metric": "inter_turn_latency_s",
            "bucket_s": ts_sec,
            "value": ts_sec - ts_sec.groupby(t["conv_id"]).shift(1),
        }
    ).dropna(subset=["value"])
    minute = (ts_sec // 60 * 60).astype("int64")
    tr = (
        pd.DataFrame({"conv_id": t["conv_id"], "bucket_s": minute})
        .groupby(["conv_id", "bucket_s"], as_index=False)
        .size()
    )
    turn_rate = pd.DataFrame(
        {
            "conv_id": tr["conv_id"],
            "metric": "turn_rate",
            "bucket_s": tr["bucket_s"].astype(float),
            "value": tr["size"].astype(float),
        }
    )
    return pd.concat([text_len, lat, turn_rate], ignore_index=True)


def rollup_pandas(series: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Tier aggregate straight from raw points (the oracle for the
    partial/final split: a correct tier-on-tier rollup must equal it)."""
    s = series.sort_values(["conv_id", "metric", "bucket_s"]).copy()
    sec = TIER_SECONDS[tier]
    s["bucket"] = (s["bucket_s"] // sec * sec).astype("int64")
    g = s.groupby(["conv_id", "metric", "bucket"])["value"]
    out = g.agg(cnt="count", sum="sum", min="min", max="max", first="first", last="last")
    return out.reset_index().rename(columns={"bucket": "bucket_s"})


def gap_fill_locf_pandas(
    tier: pd.DataFrame, step_seconds: int = 60, value_col: str = "sum"
) -> pd.DataFrame:
    """Mirror of operators/rollup.gap_fill_locf."""
    frames = []
    for (conv, metric), grp in tier.groupby(["conv_id", "metric"]):
        grp = grp.sort_values("bucket_s")
        lo, hi = int(grp["bucket_s"].min()), int(grp["bucket_s"].max())
        grid = np.arange(lo, hi + 1, step_seconds, dtype="int64")
        g = grp.set_index(grp["bucket_s"].astype("int64"))[value_col].reindex(grid)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "metric": metric,
                    "bucket_s": grid,
                    "value": g.ffill().to_numpy(),
                    "filled": g.isna().to_numpy(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)
