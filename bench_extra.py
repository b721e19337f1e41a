"""Round-6 optimization harness: per-query isolation + plan capture.

NOT the driver bench (bench.py is frozen); this file exists so the
optimization round can (a) time each bench query in isolation against a
noop sink (guide §1.4 — computation only, no sink/count ambiguity),
(b) dump .explain("formatted") for every examined query into
plans/r06/<name>_<suffix>.txt, and (c) label jobs for UI readability.

Usage:
  python bench_extra.py explain <suffix>       # write plans/r06/*_<suffix>.txt
  python bench_extra.py time [reps]            # isolated per-query noop timing
  python bench_extra.py time-one <name> [reps] # one query only
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _build(spark):
    """The exact DataFrames bench.py times, as lazy plans keyed by query
    name. Mirrors bench.py:_bench_queries but returns the DFs instead of
    counting them (bench.py itself is frozen)."""
    from bench import N_SYNTH, SYNTH_LEN, SYNTH_W, _synthetic_series
    from go_matrixprofile_spark.kernels.matrix_profile import MPOpts
    from go_matrixprofile_spark.operators import rollup as R
    from go_matrixprofile_spark.operators import series as S
    from go_matrixprofile_spark.operators.dedup import (
        minhash_lsh_pairs,
        winnow_dup_pairs,
    )
    from go_matrixprofile_spark.operators.profile import matrix_profile
    from go_matrixprofile_spark.operators.simsearch import knn_brute_cosine
    from go_matrixprofile_spark.sources.transcripts import transcripts_from_events

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t = transcripts_from_events(events)

    series = S.derive_series(t)
    t1m = R.rollup_raw(series, "1m")
    t1h = R.rollup_tier(t1m, "1h")
    t1d = R.rollup_tier(t1h, "1d")

    rate = S.turn_rate_series(t, 3600)
    tier_1h = R.rollup_raw(rate, "1h")
    filled = R.gap_fill_locf(tier_1h, 3600, value_col="sum")

    out = {
        "q_rollup_1m": t1m,
        "q_rollup_1h": t1h,
        "q_rollup_1d": t1d,
        "q_gapfill": filled,
        "q_mpx": matrix_profile(filled, w=24, opts=MPOpts(algorithm="mpx")),
        "q_dedup": minhash_lsh_pairs(documents, 8, 8, 2),
        "q_knn": knn_brute_cosine(embeddings, n_queries=8, k=5),
        "q_winnow": winnow_dup_pairs(documents, k=8, window=4, min_shared=5, max_df=25),
    }
    synth = _synthetic_series(spark, N_SYNTH, SYNTH_LEN)
    out["q_mpx_16k"] = (
        matrix_profile(synth, w=SYNTH_W, opts=MPOpts(algorithm="mpx")),
        synth,  # persisted outside the timed region, like bench.py
    )
    return out


def _session():
    from go_matrixprofile_spark.session import get_spark

    return get_spark("bench-extra", cores=CPUS)


def cmd_explain(suffix: str) -> None:
    spark = _session()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name, df in _build(spark).items():
        if isinstance(df, tuple):
            df = df[0]
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print("wrote", path)
    spark.stop()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_time(reps: int, only: str | None = None) -> None:
    spark = _session()
    qs = _build(spark)
    results: dict[str, list[float]] = {}
    for name, df in qs.items():
        if only and name != only:
            continue
        pre = None
        if isinstance(df, tuple):
            df, pre = df
            pre = pre.persist()
            pre.count()
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            _noop(df)
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if pre is not None:
            pre.unpersist()
        results[name] = samples
        print(name, samples, "min", min(samples), flush=True)
    print(json.dumps({k: {"min": min(v), "all": v} for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "explain":
        cmd_explain(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "time-one":
        cmd_time(int(sys.argv[3]) if len(sys.argv) > 3 else 3, sys.argv[2])
    else:
        cmd_time(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
