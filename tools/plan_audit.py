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

    # 2. predicate pushdown: jaccard caps doc_id < 300 at the scan;
    #    shingle document frequency is a partial-aggregated groupBy+join,
    #    never a frameless Window that funnels a stop-shingle's rows
    #    through one task
    check(
        "dedup_ngram_jaccard: doc_id filter pushed to parquet, DF via partial agg",
        qs["dedup_ngram_jaccard"](spark, sf_dir),
        must=["PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,300)", "partial_count"],
        must_not=["CartesianProduct", "Window"],
    )

    # 3. LSH family: bucket joins are hash joins, never cartesian
    check(
        "dedup_minhash_lsh: band-bucket self-join is a hash join",
        qs["dedup_minhash_lsh"](spark, sf_dir),
        must=["Join"],
        must_not=["CartesianProduct"],
    )
    check(
        "cosine_near_dup: banded bucket join, bucket caps via partial agg",
        qs["cosine_near_dup"](spark, sf_dir),
        must=["partial_count"],
        must_not=["CartesianProduct", "Window"],
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

    # 6. MP auto-routing: length routing via a computed-n column through
    #    a NON-broadcast shuffled join (at corpus scale the routing key
    #    list is nearly every (conv, metric) pair — a broadcast would
    #    pull billions of rows through the driver)
    from go_matrixprofile_spark.operators.profile import matrix_profile_auto
    from go_matrixprofile_spark.operators.series import turn_rate_series
    from go_matrixprofile_spark.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # disable the planner's size-based broadcasting for this one plan:
    # at sf0.01 the length table genuinely fits the 10MB threshold, so a
    # BroadcastHashJoin here would be the PLANNER's (correct, stats-based)
    # choice — the invariant is that no broadcast survives when the
    # threshold is off, i.e. nothing is FORCED via F.broadcast and the
    # plan degrades to a shuffled join at corpus scale
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        auto = matrix_profile_auto(turn_rate_series(t, 3600), w=8)
        auto_plan = plan_of(auto)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    routing_shuffled = ("SortMergeJoin" in auto_plan) or (
        "ShuffledHashJoin" in auto_plan
    )
    checks.append(
        (
            "matrix_profile_auto: non-broadcast length-column routing",
            auto_plan,
            [
                ("routing join is SortMerge/ShuffledHash", routing_shuffled),
                ("partial_count length agg", "partial_count" in auto_plan),
                (
                    "no forced broadcast (threshold off)",
                    "BroadcastHashJoin" not in auto_plan,
                ),
                ("absent   'CartesianProduct'", "CartesianProduct" not in auto_plan),
            ],
        )
    )

    # 7. chunked MP: tile join is a hash join on bounded keys; kernel
    #    stage behind an explicit repartition
    check(
        "matrix_profile_chunked: hash joins + pinned repartition",
        qs["mp_chunked_oracle"](spark, sf_dir),
        must=["hashpartitioning", "REPARTITION_BY_NUM"],
        must_not=["CartesianProduct"],
    )

    # 7b. chunked MP on a declared regular grid: positions derive
    #     arithmetically — NO window sort anywhere in the plan (the
    #     per-conv row_number over a 10^8-point mega-thread was the last
    #     single-task whole-series stage)
    from go_matrixprofile_spark.operators.profile import matrix_profile_chunked

    grid_src = spark.range(4096).select(
        F.lit("g").alias("conv_id"),
        F.lit("m").alias("metric"),
        (F.col("id") * 3600).cast("double").alias("bucket_s"),
        F.sin(F.col("id") / 17.0).alias("value"),
    )
    # (the plan still CONTAINS a Window node — it is the zero-row
    # irregular-fallback branch of the union; regular groups take the
    # min/max/count-distinct aggregate + join path asserted here)
    check(
        "matrix_profile_chunked(grid_step): arithmetic position stats agg",
        matrix_profile_chunked(grid_src, w=64, tile_points=1024, grid_step=3600),
        must=["hashpartitioning", "REPARTITION_BY_NUM", "partial_min", "partial_max"],
        must_not=["CartesianProduct"],
    )

    # 8. gap-fill: grid explode + single window per (conv, metric)
    check(
        "gapfill_locf: explode grid + one window sort",
        qs["gapfill_locf"](spark, sf_dir),
        must=["explode(", "Window"],
        must_not=["CartesianProduct"],
    )

    # 8b. fused series derivation: text_len + latency share one scan +
    #     one window leg (explode of metric structs); turn_rate is
    #     max(row_number per (conv_id, bucket)) on a stacked window —
    #     its leg keeps a scan, but Catalyst prunes it to a 3-column
    #     read with NO text payload, and the former dedicated
    #     (conv_id, bucket) pre-aggregation exchange is gone (2, not 3,
    #     exchanges). Formatted plans print each scan node twice
    #     (tree + detail), so 2 physical scans == 4 occurrences.
    from go_matrixprofile_spark.operators.series import derive_series

    p = plan_of(
        derive_series(
            transcripts_from_events(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            )
        )
    )
    checks.append(
        (
            "derive_series: fused plan (explode + stacked rate window)",
            p,
            [
                ("exactly 2 parquet scans", p.count("Scan parquet") == 4),
                ("explode fuses the point metrics", "Generate" in p),
                ("single Union of the two branches", p.count("Union") == 2),
                ("exactly 2 exchanges (no rate pre-agg shuffle)", p.count("Exchange") == 4),
                (
                    "rate-leg scan prunes the text payload",
                    p.count("ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint>")
                    >= 1,
                ),
            ],
        )
    )

    # 9. substring-level dedup: fingerprint document frequency is a
    #    map-side-combinable partial agg + join (the df-gate), the
    #    self-join is a hash join on fp — no cartesian, no frameless
    #    hot-key Window beyond the per-doc winnowing sort
    check(
        "winnow_dup_pairs: df-gate via partial agg, fp self-join hashed",
        qs["winnow_dup_pairs"](spark, sf_dir),
        must=["partial_count", "Join"],
        must_not=["CartesianProduct"],
    )

    # 9b. PQ ADC: the query LUT broadcasts against the long code table
    #     (no cartesian); the corpus-sized side carries only codes
    check(
        "knn_pq_adc_refined: broadcast LUT against the code table",
        qs["knn_pq_adc_refined"](spark, sf_dir),
        must=["BroadcastHashJoin", "partial_sum"],
        must_not=["CartesianProduct"],
    )

    # 9c. knn family top-k: every final ranking is
    #     row_number().over(partitionBy(qid).orderBy(...)) + filter,
    #     which Spark rewrites to a map-side WindowGroupLimit — without
    #     that rewrite the ranking sorts the whole scored corpus in one
    #     task per query. The rewrite was previously an unasserted
    #     optimizer courtesy (r03 verdict nit #2); pin it for all four
    #     families so a refactor to an unsupported rank pattern fails
    #     the audit.
    for fam in ("knn_brute_cosine", "knn_lsh_cosine", "knn_ivf_cosine", "knn_pq_adc_refined"):
        check(
            f"{fam}: top-k compiles to map-side WindowGroupLimit",
            qs[fam](spark, sf_dir),
            must=["WindowGroupLimit"],
        )

    # 9d. dedup_groups: the component resolution is iterative
    #     (per-round localCheckpoint truncates lineage), so the final
    #     plan must read the labels from a materialized checkpoint scan
    #     — not replay every propagation round — and the doc join stays
    #     a hash join
    check(
        "dedup_groups: labels from checkpoint scan, hash-joined to docs",
        qs["dedup_groups"](spark, sf_dir),
        must=["Scan ExistingRDD"],
        must_not=["CartesianProduct"],
    )

    # 9e. BPE token counting: the 48-replace merge chain is a single
    #     shuffle-free projection (no Exchange, no Python UDF) — the
    #     whole tokenizer stays inside whole-stage codegen
    p = plan_of(qs["token_counts_bpe"](spark, sf_dir))
    checks.append(
        (
            "token_counts_bpe: shuffle-free single-scan replace chain",
            p,
            [
                ("no exchange (pure projection)", "Exchange" not in p),
                ("no python UDF", "Python" not in p),
                # formatted plans print each scan node twice (tree +
                # detail): exactly one parquet scan == 2 occurrences
                ("single parquet scan", p.count("Scan parquet") == 2),
            ],
        )
    )

    # 9f. trigram lang ID: doc-profile ranking is keyed by doc_id (no
    #     hot key) and its rank-filter compiles to map-side
    #     WindowGroupLimit; the 600-row profile table broadcasts
    check(
        "lang_id: per-doc WindowGroupLimit + broadcast profile join",
        qs["lang_id"](spark, sf_dir),
        must=["WindowGroupLimit", "BroadcastHashJoin", "partial_count"],
        must_not=["CartesianProduct"],
    )

    # 9g. sequence packing: exactly ONE exchange (the bucket shuffle)
    #     feeding one Arrow-batched group pass — packing adds no
    #     shuffle beyond routing docs to their bucket streams
    from go_matrixprofile_spark.operators.corpus import pack_sequences

    toy_corpus = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("n_bpe_tokens")
    )
    p = plan_of(pack_sequences(toy_corpus, budget=512, n_buckets=16))
    checks.append(
        (
            "pack_sequences: single bucket shuffle + one Arrow group pass",
            p,
            [
                ("exactly one exchange", p.count("Exchange") == 2),
                ("Arrow group apply", "FlatMapGroupsInPandas" in p),
            ],
        )
    )

    # 9h. as-of join: union + one running window per key — NO join
    #     operator at all (the range-join formulation would blow up
    #     N×M per key), one shuffle on the key
    check(
        "asof_turn_hourly: union + running window, no join",
        qs["asof_turn_hourly"](spark, sf_dir),
        must=["Union", "Window", "hashpartitioning"],
        must_not=["Join", "CartesianProduct"],
    )

    # 10. repetition stats: both aggregations split partial/final
    #     (gram counts combine map-side before any exchange); keys all
    #     include doc_id so no hot key exists
    check(
        "quality_repetition: partial-agg gram counts, no window",
        qs["quality_repetition"](spark, sf_dir),
        must=["partial_count", "hashpartitioning"],
        must_not=["CartesianProduct", "Window"],
    )

    # 11. oversized-doc splitting: pure sequence+explode arithmetic on
    #     the token table — NO exchange of its own (the only exchanges
    #     in the plan, if any, belong to the upstream token count; on
    #     the raw token projection there must be none at all)
    from go_matrixprofile_spark.operators.corpus import split_documents

    toy_tok = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 300 + 1).alias("n_bpe_tokens")
    )
    check(
        "split_documents: shuffle-free explode projection",
        split_documents(toy_tok, budget=64),
        must=["Generate"],
        must_not=["Exchange", "Join", "FlatMapGroupsInPandas"],
    )

    # 11b. chunk-aware packing keeps the single-shuffle shape
    p = plan_of(
        pack_sequences(
            split_documents(toy_tok, budget=64),
            budget=64,
            n_buckets=16,
            token_col="n_tokens",
            chunk_col="chunk_idx",
        )
    )
    checks.append(
        (
            "split+pack: still exactly one bucket shuffle",
            p,
            [
                ("exactly one exchange", p.count("Exchange") == 2),
                ("Arrow group apply", "FlatMapGroupsInPandas" in p),
            ],
        )
    )

    # 12. corpus-learned BPE application: the replace chain from the
    #     distributed trainer compiles to the same single-scan
    #     shuffle-free projection as the seed-vocabulary chain (the
    #     training rounds run eagerly before this plan exists)
    from go_matrixprofile_spark.operators.text import token_counts_bpe

    toy_docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps again and again") for i in range(4)],
        "doc_id long, text string",
    )
    check(
        "token_counts_bpe(learned merges): single-scan, no shuffle, no Python",
        token_counts_bpe(toy_docs, merges=[("t", "h"), ("th", "e"), ("a", "n")]),
        must=["Scan"],
        must_not=["Exchange", "BatchEvalPython", "FlatMapGroupsInPandas"],
    )

    # 13. nearest as-of: two in-partition sorted window passes over ONE
    #     key exchange — no join operator, no second shuffle
    from go_matrixprofile_spark.operators.asof import asof_join

    toy_l = spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.col("id").cast("double").alias("t"),
    )
    toy_r = spark.range(100).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 5).cast("double").alias("rt"),
        F.col("id").cast("double").alias("v"),
    )
    p = plan_of(
        asof_join(
            toy_l, toy_r, by=["k"], left_on="t", right_on="rt",
            value_cols=["v"], direction="nearest",
        )
    )
    checks.append(
        (
            "asof_join(nearest): one key shuffle, two window passes, no join",
            p,
            [
                ("exactly one exchange", p.count("Exchange") == 2),
                ("window pass present", "Window" in p),
                ("no join operator", "Join" not in p),
            ],
        )
    )

    # 14. decontamination: benchmark gram set broadcast — corpus-side
    #     grams stream map-side against the hash set, the only corpus
    #     shuffle is the doc_id hit aggregation
    from go_matrixprofile_spark.operators.decontam import decontaminate

    toy_docs2 = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 8) for i in range(50)],
        "doc_id long, text string",
    )
    toy_bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 4)], "bench_id long, text string"
    )
    check(
        "decontaminate: broadcast benchmark grams, no corpus-side merge join",
        decontaminate(toy_docs2, toy_bench, n=13),
        must=["BroadcastHashJoin", "partial_count"],
        must_not=["SortMergeJoin", "CartesianProduct"],
    )

    # 15. cleaning chain: C4 line filter + PII redaction is ONE narrow
    #     JVM projection — no shuffle, no Python, whole-stage codegen
    #     straight off the scan
    from go_matrixprofile_spark.operators.cleaning import clean_lines, redact_pii

    cleaned = redact_pii(clean_lines(toy_docs2), text_col="clean_text")
    p = plan_of(cleaned)
    # the higher-order line filter is an interpreted Project (Spark
    # doesn't codegen lambda functions) — the invariant is that the
    # chain stays Scan+Project ONLY: narrow, shuffle-free, JVM-side
    nodes = {
        ln.strip("*+- ").split(" (")[0]
        for ln in p.split("\n\n")[0].splitlines()
        if "(" in ln and ln.strip().startswith(("*", "+", ":", "Scan", "Project"))
    }
    checks.append(
        (
            "clean_lines->redact_pii: single narrow projection, no shuffle, no Python",
            p,
            [
                ("no exchange", "Exchange" not in p),
                ("no Python eval", "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p),
                ("plan is Scan+Project only", nodes <= {"Project", "Scan ExistingRDD", "Scan parquet"}),
            ],
        )
    )

    # 15b. span merge: hit rows only cross ONE doc_id exchange for the
    #      ordered gaps-and-islands window; benchmark side stays broadcast
    from go_matrixprofile_spark.operators.decontam import contaminated_spans

    p = plan_of(contaminated_spans(toy_docs2, toy_bench, n=13))
    checks.append(
        (
            "contaminated_spans: broadcast gram join, one doc_id exchange for the window",
            p,
            [
                ("broadcast gram join", "BroadcastHashJoin" in p),
                ("window pass present", "Window" in p),
                ("no merge join", "SortMergeJoin" not in p),
            ],
        )
    )

    # 16. mixture sampling / train-val split: pure projections — the
    #     weight table is a literal map expression (NO join of any
    #     kind), the epoch fan-out is one Generate, and nothing
    #     shuffles at any corpus size
    from go_matrixprofile_spark.operators.mixture import (
        mixture_sample,
        train_val_split,
    )

    pq_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(
        mixture_sample(pq_docs, {"src0": 2.5, "src1": 0.25}, seed=42).select(
            "doc_id", "source", "epoch", "order_key"
        )
    )
    checks.append(
        (
            "mixture_sample: literal weight map, one Generate, no join, no shuffle",
            p,
            [
                ("no exchange", "Exchange" not in p),
                ("no join", "Join" not in p and "CartesianProduct" not in p),
                ("epoch fan-out is a Generate", "Generate" in p),
                ("no Python eval", "BatchEvalPython" not in p and "InPandas" not in p),
                (
                    "text pruned out of the scan",
                    "ReadSchema" in p
                    and "text" not in p.split("ReadSchema")[1].split("\n")[0],
                ),
            ],
        )
    )
    p = plan_of(train_val_split(pq_docs.select("doc_id"), val_frac=0.1, seed=7))
    checks.append(
        (
            "train_val_split: single narrow projection, no shuffle",
            p,
            [
                ("no exchange", "Exchange" not in p),
                ("no join", "Join" not in p),
                ("no Python eval", "BatchEvalPython" not in p and "InPandas" not in p),
            ],
        )
    )

    # 17. tokenize -> split -> pack -> materialize: the token join is
    #     the ONLY join, the seq assembly the only aggregation; no
    #     Python anywhere except the packer's own applyInPandas
    from go_matrixprofile_spark.operators.corpus import (
        materialize_sequences,
        pack_sequences,
        split_documents,
    )
    from go_matrixprofile_spark.operators.text import tokenize_bpe

    tk = tokenize_bpe(pq_docs)
    p = plan_of(tk)
    checks.append(
        (
            "tokenize_bpe: shuffle-free JVM projection",
            p,
            [
                ("no exchange", "Exchange" not in p),
                ("no Python eval", "BatchEvalPython" not in p and "InPandas" not in p),
            ],
        )
    )
    pk = pack_sequences(
        split_documents(tk.select("doc_id", "n_bpe_tokens"), budget=256),
        budget=256, n_buckets=8, token_col="n_tokens", chunk_col="chunk_idx",
    )
    p = plan_of(materialize_sequences(pk, tk, budget=256))
    checks.append(
        (
            "materialize_sequences: one token join, one seq aggregation, no window",
            p,
            [
                ("has a join", "Join" in p),
                ("no cartesian", "CartesianProduct" not in p),
                ("seq agg present", "partial" in p or "HashAggregate" in p or "ObjectHashAggregate" in p),
                ("no window", "Window" not in p),
            ],
        )
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
