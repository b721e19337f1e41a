"""Benchmark: headline engine throughput + N→4N scaling evidence.

Runs the flagship pipelines at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

  {"metric": "...", "value": <headline>, "unit": "sec",
   "queries": {...}, "sf": ..., "throughput": {...}, "scaling": {...}}

Headline queries:
  q_rollup   — transcript series → 1m→1h→1d tiers (rows/sec)
  q_gapfill  — hourly LOCF gap-fill
  q_mpx      — MPX matrix profile over per-conv gap-filled hourly rate
               (plus the synthetic transcript corpus at fixed size)
  q_dedup    — minhash-LSH near-dup candidates over documents
  q_knn      — brute-force cosine top-k over embeddings

Scaling evidence (north rule, sandbox substitute per BASELINE.md): when
SPARK_GRAFT_SCALING=1 (or run with --scaling), re-runs the MP+rollup
job at local[8] and local[32] in separate Spark sessions on identical
input and reports throughput at both plus
efficiency = (T_8/T_32)/4.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _bench_queries(spark, sf_dir: str) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from go_matrixprofile_spark.kernels.matrix_profile import MPOpts
    from go_matrixprofile_spark.operators import rollup as R
    from go_matrixprofile_spark.operators import series as S
    from go_matrixprofile_spark.operators.dedup import minhash_lsh_pairs
    from go_matrixprofile_spark.operators.profile import matrix_profile
    from go_matrixprofile_spark.operators.simsearch import knn_brute_cosine
    from go_matrixprofile_spark.sources.transcripts import transcripts_from_events

    times: dict[str, float] = {}
    stats: dict[str, float] = {}

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = transcripts_from_events(events)

    # rollup: all three metrics, all three tiers
    t0 = time.time()
    series = S.derive_series(t)
    tiers = R.rollup_all_tiers(series)
    tier_rows = sum(df.count() for df in tiers.values())
    times["q_rollup"] = time.time() - t0
    raw_rows = series.count()
    stats["rollup_input_rows"] = raw_rows
    stats["rollup_tier_rows"] = tier_rows
    stats["rollup_points_per_sec"] = (raw_rows + tier_rows) / times["q_rollup"]

    # gap-fill
    t0 = time.time()
    rate = S.turn_rate_series(t, 3600)
    tier_1h = R.rollup_raw(rate, "1h")
    filled = R.gap_fill_locf(tier_1h, 3600, value_col="sum")
    filled_rows = filled.count()
    times["q_gapfill"] = time.time() - t0
    stats["gapfill_rows"] = filled_rows

    # matrix profile over the gap-filled hourly rate
    t0 = time.time()
    prof = matrix_profile(filled, w=24, opts=MPOpts(algorithm="mpx"))
    mp_rows = prof.count()
    times["q_mpx"] = time.time() - t0
    stats["mp_windows"] = mp_rows
    stats["mp_windows_per_sec"] = mp_rows / times["q_mpx"]

    # dedup (minhash LSH candidates)
    t0 = time.time()
    pairs = minhash_lsh_pairs(documents, 8, 8, 2)
    stats["dedup_pairs"] = pairs.count()
    times["q_dedup"] = time.time() - t0

    # similarity search
    t0 = time.time()
    knn = knn_brute_cosine(embeddings, n_queries=8, k=5)
    stats["knn_rows"] = knn.count()
    times["q_knn"] = time.time() - t0

    return times, stats


def _session(cores: int | str, name: str):
    from go_matrixprofile_spark.session import get_spark

    return get_spark(name, cores=cores)


def _scaling_run(sf_dir: str) -> dict:
    """Same MP+rollup job at local[8] vs local[32] (north-rule evidence)."""
    out = {}
    for cores in (8, 32):
        spark = _session(cores, f"bench-scale-{cores}")
        t0 = time.time()
        times, stats = _bench_queries(spark, sf_dir)
        wall = time.time() - t0
        out[f"local{cores}"] = {
            "wall_sec": round(wall, 2),
            "rollup_points_per_sec": round(stats["rollup_points_per_sec"], 1),
            "mp_windows_per_sec": round(stats["mp_windows_per_sec"], 1),
        }
        spark.stop()
    t8 = out["local8"]["wall_sec"]
    t32 = out["local32"]["wall_sec"]
    out["scaling_efficiency"] = round((t8 / t32) / 4.0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING") == "1" or "--scaling" in sys.argv

    spark = _session(cpus, "bench")
    t_total0 = time.time()
    times, stats = _bench_queries(spark, sf_dir)
    total = time.time() - t_total0
    spark.stop()

    result = {
        "metric": "engine_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": sf,
        "throughput": {
            "rollup_points_per_sec": round(stats["rollup_points_per_sec"], 1),
            "mp_windows_per_sec": round(stats["mp_windows_per_sec"], 1),
        },
        "stats": {k: int(v) for k, v in stats.items() if k.endswith(("rows", "pairs", "windows"))},
    }
    if do_scaling:
        result["scaling"] = _scaling_run(sf_dir)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
