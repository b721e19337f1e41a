"""Physical-plan audit: assert the Catalyst plans we designed for.

Every operator family gets the plan invariants that make it survive a
100x scale-up, checked as substrings of the FORMATTED physical plan:

- column pruning reaches the parquet scan (ReadSchema excludes unused
  columns);
- predicate pushdown reaches the scan (PushedFilters non-empty for
  filtered reads);
- small sides broadcast (BroadcastHashJoin / broadcast semi-joins), no
  accidental CartesianProduct in the LSH/dedup join family;
- aggregations split partial/final (map-side combine before the
  exchange);
- kernel stages sit behind explicit repartitions (Exchange
  hashpartitioning with our numbered partition count).

Run: python tools/plan_audit.py [sf_dir]   (writes PLANS.md)
Exit 1 on any violated invariant.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from go_matrixprofile_spark.session import get_spark

    spark = get_spark("plan-audit", cores=8, shuffle_partitions=8)
    qs = e.queries()

    checks: list[tuple[str, str, list[tuple[str, bool]]]] = []

    def check(name, df, must=(), must_not=()):
        p = plan_of(df)
        results = [(f"contains '{m}'", m in p) for m in must]
        results += [(f"absent   '{m}'", m not in p) for m in must_not]
        checks.append((name, p, results))

    # 1. column pruning: text_len query needs props/user_id/ts/event_id/
    #    event_type; `value` must be pruned out of the scan
    df = qs["series_text_len"](spark, sf_dir)
    p = plan_of(df)
    pruned = "value" not in p.split("ReadSchema")[1].split("\n")[0] if "ReadSchema" in p else False
    checks.append(
        (
            "series_text_len: scan prunes unused `value` column",
            p,
            [("ReadSchema excludes value", pruned), ("contains 'Scan parquet'", "Scan parquet" in p)],
        )
    )

    # 2. predicate pushdown: jaccard caps doc_id < 300 at the scan
    check(
        "dedup_ngram_jaccard: doc_id filter pushed to parquet",
        qs["dedup_ngram_jaccard"](spark, sf_dir),
        must=["PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,300)"],
        must_not=["CartesianProduct"],
    )

    # 3. LSH family: bucket joins are hash joins, never cartesian
    check(
        "dedup_minhash_lsh: band-bucket self-join is a hash join",
        qs["dedup_minhash_lsh"](spark, sf_dir),
        must=["Join"],
        must_not=["CartesianProduct"],
    )
    check(
        "cosine_near_dup: banded bucket join, no cartesian",
        qs["cosine_near_dup"](spark, sf_dir),
        must_not=["CartesianProduct"],
    )

    # 4. brute knn: query side broadcast (BroadcastNestedLoopJoin is the
    #    expected physical form for the qid != nid theta-join: the
    #    broadcast side is 8 rows, the corpus streams)
    check(
        "knn_brute_cosine: query side broadcast, corpus streams",
        qs["knn_brute_cosine"](spark, sf_dir),
        must=["Broadcast"],
    )

    # 5. rollup: partial/final aggregation split (map-side combine)
    check(
        "rollup_1h: partial aggregation before the exchange",
        qs["rollup_1h"](spark, sf_dir),
        must=["partial_sum", "hashpartitioning"],
    )

    # 6. MP auto-routing: length routing via broadcast semi-joins
    from go_matrixprofile_spark.operators.profile import matrix_profile_auto
    from go_matrixprofile_spark.operators.series import turn_rate_series
    from go_matrixprofile_spark.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(spark.read.parquet(f"{sf_dir}/events.parquet"))
    auto = matrix_profile_auto(turn_rate_series(t, 3600), w=8)
    check(
        "matrix_profile_auto: broadcast LeftSemi length routing",
        auto,
        must=["BroadcastHashJoin", "LeftSemi"],
        must_not=["CartesianProduct"],
    )

    # 7. chunked MP: tile join is a hash join on bounded keys; kernel
    #    stage behind an explicit repartition
    check(
        "matrix_profile_chunked: hash joins + pinned repartition",
        qs["mp_chunked_oracle"](spark, sf_dir),
        must=["hashpartitioning", "REPARTITION_BY_NUM"],
        must_not=["CartesianProduct"],
    )

    # 8. gap-fill: grid explode + single window per (conv, metric)
    check(
        "gapfill_locf: explode grid + one window sort",
        qs["gapfill_locf"](spark, sf_dir),
        must=["explode(", "Window"],
        must_not=["CartesianProduct"],
    )

    failures = 0
    lines = [
        "# PLANS — physical-plan audit (tools/plan_audit.py)",
        "",
        f"Spark {spark.version}, sf_dir={sf_dir}. Each operator family's",
        "scale-critical plan invariants, asserted as substrings of the",
        "FORMATTED physical plan (excerpts below are trimmed).",
        "",
    ]
    for name, p, results in checks:
        ok = all(r for _, r in results)
        failures += 0 if ok else 1
        lines.append(f"## {'✅' if ok else '❌'} {name}")
        for desc, r in results:
            lines.append(f"- {'ok  ' if r else 'FAIL'} {desc}")
        # keep a compact excerpt: the node list (first section of formatted)
        excerpt = p.split("\n\n")[0]
        if len(excerpt) > 2400:
            excerpt = excerpt[:2400] + "\n... (trimmed)"
        lines += ["", "```", excerpt, "```", ""]
        print(("OK  " if ok else "FAIL") + " " + name)

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"\n{'ALL PLAN INVARIANTS HOLD' if failures == 0 else f'{failures} FAILURES'} -> PLANS.md")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
