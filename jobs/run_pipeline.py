"""End-to-end transcript → rollup → matrix-profile pipeline job.

The production entry point (north rule: ships as spark-submit
--py-files): every stage checkpoints to partitioned parquet with
per-partition lineage, so a killed run resumes without redoing
committed conversations.

    spark-submit --py-files go_matrixprofile_spark.zip \
        jobs/run_pipeline.py --input <transcripts.parquet> \
        --output <workdir> [--w 16] [--gen-convs 200]

Stages (each checkpointed under --output):
  1. series_raw   — text_len / latency / turn_rate derivation
  2. tier_1m/1h/1d — continuous aggregates (tier-on-tier)
  3. filled_1h    — LOCF gap-fill of the hourly turn rate
  4. mp_profile   — MPX per conversation
  5. discords/motifs/segments — discovery tables
  6. compressed   — Gorilla blobs of the 1m tier
  7. (with --docs) doc_quality / doc_dup_exact / doc_dup_substr —
     the document-pipeline stages (Gopher repetition stats, exact
     dedup groups, substring-level winnowing dup pairs), checkpointed
     by doc_id bucket so resume works at bucket granularity
  8. (with --val-frac / --mixture / --mixture-tau) doc_val —
     deterministic hash
     holdout roster — and domain-weighted epoch sampling ahead of
     packing; epoch copies pack as composite streams doc_id*K+epoch
     (decode: doc = id // K, epoch = id % K), and every flag variant
     packs into its own stage directory so resume can't serve the
     wrong deliverable
  9. (with --materialize) doc_seqs — packed sequences assembled into
     per-sequence token streams + vocab input_ids (the tensor-ready
     deliverable)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcript parquet dir (north-rule schema)")
    ap.add_argument("--output", required=True, help="checkpoint root dir")
    ap.add_argument("--w", type=int, default=16)
    ap.add_argument("--gen-convs", type=int, default=0,
                    help="if >0 and --input missing, synthesize this many convs")
    ap.add_argument("--docs", help="documents parquet (doc_id, text) for the doc-pipeline stages")
    ap.add_argument("--benchmark", help="optional eval-set parquet (bench_id, text): adds the doc_decontam stage and gates the corpus on it")
    ap.add_argument("--val-frac", type=float, default=0.0,
                    help="if >0, deterministically hold out this fraction of corpus docs as validation (doc_val stage) and pack only the train split")
    ap.add_argument("--mixture", default=None,
                    help="JSON {source: epoch_weight} mixture table: up-/down-sample domains before packing (unlisted sources weight 1.0)")
    ap.add_argument("--mixture-tau", type=float, default=None,
                    help="derive the mixture table from the docs' domain fractions at this sampling temperature (XLM-R rule, p_d ~ f_d^tau) instead of passing --mixture explicitly")
    ap.add_argument("--mix-seed", type=int, default=0,
                    help="seed for the val-split / mixture hash draws")
    ap.add_argument("--materialize", action="store_true",
                    help="also materialize packed sequences into token streams + vocab input_ids (doc_seqs stage)")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()
    mixture_weights = json.loads(args.mixture) if args.mixture else None
    if mixture_weights is not None and (
        not isinstance(mixture_weights, dict)
        or any(not isinstance(v, (int, float)) or v < 0 for v in mixture_weights.values())
    ):
        raise SystemExit("--mixture must be a JSON object of nonnegative weights")
    if mixture_weights is not None and args.mixture_tau is not None:
        raise SystemExit("--mixture and --mixture-tau are mutually exclusive")
    if args.mixture_tau is not None and args.mixture_tau <= 0:
        raise SystemExit("--mixture-tau must be > 0")
    if (
        mixture_weights is not None
        or args.mixture_tau is not None
        or args.val_frac > 0
    ) and not args.docs:
        # these flags only shape the document deliverable: silently
        # ignoring them would look like a (wrong) success
        raise SystemExit("--mixture/--mixture-tau/--val-frac require --docs")
    if args.materialize and not args.docs:
        raise SystemExit("--materialize requires --docs")
    if args.docs and not os.path.exists(args.docs):
        # fail closed like --benchmark: a typo'd docs path must not
        # silently skip every doc stage and exit 0
        raise SystemExit(f"--docs {args.docs} does not exist")
    if args.benchmark and not os.path.exists(args.benchmark):
        # a typo'd eval-set path must FAIL before any compute, not
        # silently ship a contaminated corpus (fail closed, like --input)
        raise SystemExit(f"--benchmark {args.benchmark} does not exist")

    from go_matrixprofile_spark.functions.compress_ops import compress_series
    from go_matrixprofile_spark.kernels.matrix_profile import MPOpts
    from go_matrixprofile_spark.operators import rollup as R
    from go_matrixprofile_spark.operators import series as S
    from go_matrixprofile_spark.operators.profile import discover, matrix_profile
    from go_matrixprofile_spark.plans.lineage import checkpoint_stage
    from go_matrixprofile_spark.session import get_spark

    spark = get_spark("pipeline", cores=args.cores)
    t_start = time.time()
    metrics: dict[str, object] = {}

    if args.input and os.path.isdir(args.input):
        transcripts = spark.read.parquet(args.input)
    elif args.gen_convs:
        from go_matrixprofile_spark.sources.datagen import generate_transcripts

        transcripts = generate_transcripts(spark, args.gen_convs)
    else:
        raise SystemExit("--input dir missing and --gen-convs not given")

    # ONE input-version tag shared by the thunk-stage committed probe and
    # checkpoint_stage itself: divergent values would make resume either
    # replay or wrongly skip the eager stages
    input_version = "v0"

    def stage(name, df, partition_col="conv_id"):
        from pyspark.sql import functions as F

        from go_matrixprofile_spark.plans.lineage import read_lineage

        t0 = time.time()
        if callable(df):
            # stages whose OPERATOR runs eagerly at construction time
            # (dedup_groups: iterative components with per-round
            # actions) pass a thunk; if lineage already records the
            # stage for this input version, read the checkpoint back
            # instead of rebuilding — checkpoint_stage's per-partition
            # anti-join can only save the WRITE, not the compute
            lin = read_lineage(spark, args.output)
            committed = (
                lin is not None
                and lin.where(
                    (F.col("stage") == name)
                    & (F.col("input_version") == input_version)
                )
                .limit(1)
                .count()
                > 0
            )
            if committed:
                out = spark.read.parquet(os.path.join(args.output, name))
                metrics[name] = round(time.time() - t0, 2)
                metrics[f"{name}_rows"] = out.count()
                return out
            df = df()
        out = checkpoint_stage(
            df, args.output, name,
            partition_col=partition_col, input_version=input_version,
        )
        n = out.count()
        metrics[name] = round(time.time() - t0, 2)
        metrics[f"{name}_rows"] = n
        return out

    series = stage("series_raw", S.derive_series(transcripts))
    t1m = stage("tier_1m", R.rollup_raw(series, "1m"))
    t1h = stage("tier_1h", R.rollup_tier(t1m, "1h"))
    stage("tier_1d", R.rollup_tier(t1h, "1d"))
    filled = stage(
        "filled_1h",
        R.gap_fill_locf(
            t1h.where("metric = 'turn_rate'"), 3600, value_col="sum"
        ),
    )
    stage("mp_profile", matrix_profile(filled, w=args.w, opts=MPOpts(algorithm="mpx")))
    motifs, discords, segments, _ = discover(filled, w=args.w)
    stage("motifs", motifs.withColumn("idx", motifs["idx"].cast("array<int>")))
    stage("discords", discords)
    stage("segments", segments)
    stage("compressed", compress_series(series.where("metric = 'text_len'")))

    if args.docs:
        from pyspark.sql import functions as F

        from go_matrixprofile_spark.operators.dedup import (
            dedup_exact,
            winnow_dup_pairs,
        )
        from go_matrixprofile_spark.operators.text import repetition_stats

        docs = spark.read.parquet(args.docs)
        if (
            mixture_weights is not None or args.mixture_tau is not None
        ) and "source" not in docs.columns:
            # fail BEFORE any stage computes, like --benchmark: the
            # mixture key is the docs' source/domain column
            raise SystemExit(
                "--mixture/--mixture-tau require a 'source' column in "
                f"--docs (found: {docs.columns})"
            )
        if args.mixture_tau is not None:
            # derive the table from the raw docs' domain fractions (one
            # small agg job); the derived weights land in the variant
            # tag below, so a corpus change re-derives into a fresh
            # stage directory instead of resuming the stale packing
            from go_matrixprofile_spark.operators.mixture import (
                temperature_weights,
            )

            mixture_weights = temperature_weights(docs, tau=args.mixture_tau)
            metrics["mixture_weights"] = {
                k: round(v, 4) for k, v in sorted(mixture_weights.items())
            }
        # per-doc partitioning would be one dir per doc; bucket to 64
        stage(
            "doc_quality",
            repetition_stats(docs).withColumn(
                "doc_bucket", (F.col("doc_id") % 64).cast("int")
            ),
            partition_col="doc_bucket",
        )
        stage(
            "doc_dup_exact",
            dedup_exact(docs).withColumn(
                "doc_bucket", (F.col("keep_doc_id") % 64).cast("int")
            ),
            partition_col="doc_bucket",
        )
        stage(
            "doc_dup_substr",
            winnow_dup_pairs(docs, min_shared=5, max_df=25).withColumn(
                "doc_bucket", (F.col("a_id") % 64).cast("int")
            ),
            partition_col="doc_bucket",
        )
        # resolve all near-dup pair sources into components and mark the
        # survivor per group — the stage that actually DROPS fuzzy dups;
        # `WHERE keep` on this table is the training corpus
        from go_matrixprofile_spark.operators.dedup import dedup_groups

        groups = stage(
            "doc_dedup_groups",
            lambda: dedup_groups(docs).withColumn(
                "doc_bucket", (F.col("doc_id") % 64).cast("int")
            ),
            partition_col="doc_bucket",
        )
        # materialize the training corpus (survivors ∧ quality ∧
        # repetition, with real BPE token counts) reusing the
        # checkpointed groups, split oversized docs to the packing
        # budget, then pack into fixed-token-budget sequences — the
        # pipeline's deliverable, with SUM(n_tokens) <= budget holding
        # for EVERY sequence (no oversized-doc exception)
        from go_matrixprofile_spark.operators.corpus import (
            build_corpus,
            pack_sequences,
            split_documents,
        )

        corpus = stage(
            "doc_corpus",
            build_corpus(docs, groups=groups).withColumn(
                "doc_bucket", (F.col("doc_id") % 64).cast("int")
            ),
            partition_col="doc_bucket",
        )
        if args.benchmark:
            # contamination gate BETWEEN corpus materialization and
            # packing: flags stay checkpointed for audit; the packed
            # deliverable carries clean docs only
            from go_matrixprofile_spark.operators.decontam import decontaminate

            bench = spark.read.parquet(args.benchmark)
            if "bench_id" not in bench.columns and "doc_id" in bench.columns:
                # eval sets exported from a documents-shaped table are
                # keyed doc_id; remap instead of failing the whole job
                bench = bench.withColumnRenamed("doc_id", "bench_id")
            flags = stage(
                "doc_decontam",
                decontaminate(docs, bench).withColumn(
                    "doc_bucket", (F.col("doc_id") % 64).cast("int")
                ),
                partition_col="doc_bucket",
            )
            corpus = corpus.join(
                flags.where("NOT contaminated").select("doc_id"), "doc_id"
            )
        corpus = corpus.drop("doc_bucket")
        # every (--benchmark, --val-frac, --mixture, --mix-seed) combo
        # is a DIFFERENT deliverable: compose a variant suffix for the
        # stages it shapes, so re-running an existing --output with
        # different flags (or a different seed, which samples a
        # different holdout / fractional-epoch subset) can't be
        # anti-joined away against another variant's committed
        # partitions and silently serve the wrong dataset
        variant = ""
        if args.benchmark:
            variant += "_decontam"
        if args.val_frac > 0:
            variant += f"_v{args.val_frac:g}"
        if mixture_weights is not None:
            import hashlib

            mix_tag = hashlib.md5(
                json.dumps(mixture_weights, sort_keys=True).encode()
            ).hexdigest()[:8]
            variant += f"_m{mix_tag}"
        if args.val_frac > 0 or mixture_weights is not None:
            variant += f"_s{args.mix_seed}"
        if args.val_frac > 0:
            # deterministic, subset-consistent hash holdout: the val
            # roster is checkpointed for audit, and only train docs
            # flow into mixing/packing
            from go_matrixprofile_spark.operators.mixture import train_val_split

            assigned = train_val_split(
                corpus, val_frac=args.val_frac, seed=args.mix_seed
            )
            stage(
                f"doc_val{variant}",
                assigned.where("split = 'val'")
                .select("doc_id", "n_bpe_tokens")
                .withColumn("doc_bucket", (F.col("doc_id") % 64).cast("int")),
                partition_col="doc_bucket",
            )
            corpus = assigned.where("split = 'train'").drop("split")
        if mixture_weights is not None:
            # domain-weighted epoch sampling; each (doc, epoch) copy
            # becomes its own packing stream under a collision-free
            # composite id doc_id*K+epoch (K = max possible copies), so
            # consumers decode doc = id // K, epoch = id % K
            import math

            from go_matrixprofile_spark.operators.mixture import mixture_sample

            k_copies = int(math.ceil(max([*mixture_weights.values(), 1.0]))) + 1
            mixed = mixture_sample(
                corpus.join(docs.select("doc_id", "source"), "doc_id"),
                mixture_weights,
                key_col="source",
                seed=args.mix_seed,
            )
            corpus = mixed.select(
                (F.col("doc_id") * k_copies + F.col("epoch")).alias("doc_id"),
                "n_bpe_tokens",
            )
        chunks = split_documents(corpus, budget=2048)
        order_col = None
        if mixture_weights is not None:
            # pack in shuffled training order, not corpus doc order:
            # re-derive the portable order key on the composite id
            # (constant across a copy's chunks, distinct across epoch
            # copies) and let pack_sequences bucket+sort on it
            from go_matrixprofile_spark.operators.mixture import shuffle_key

            chunks = chunks.withColumn(
                "order_key", shuffle_key(args.mix_seed, F.col("doc_id"))
            )
            order_col = "order_key"
        packed = stage(
            f"doc_packed{variant}",
            pack_sequences(
                chunks, budget=2048, token_col="n_tokens",
                chunk_col="chunk_idx", order_col=order_col,
            ),
            partition_col="bucket",
        )
        if args.materialize:
            # the tensor-ready deliverable: per-sequence token streams
            # (and vocab input_ids) assembled from the packed chunks
            from go_matrixprofile_spark.functions.bpe import MERGES
            from go_matrixprofile_spark.operators.corpus import (
                bpe_vocab,
                materialize_sequences,
            )
            from go_matrixprofile_spark.operators.text import tokenize_bpe

            pk = packed
            if mixture_weights is not None:
                # epoch copies carry composite ids; re-key to the
                # original doc for the token join (all copies of a doc
                # share one token array). Exact FLOOR division on longs:
                # subtracting pmod first makes the dividend exactly
                # divisible, so `div` (integer, exact at any magnitude —
                # a float floor() loses exactness above 2^53) equals
                # floor even for negative hash-derived doc_ids, where a
                # bare `div` truncates toward zero and would re-key a
                # copy to the WRONG document (advisor item r5)
                pk = packed.withColumn(
                    "doc_id",
                    F.expr(
                        f"(doc_id - pmod(doc_id, {k_copies})) div {k_copies}"
                    ),
                )
            stage(
                f"doc_seqs{variant}",
                materialize_sequences(
                    pk, tokenize_bpe(docs), budget=2048,
                    vocab=bpe_vocab(MERGES),
                ),
                partition_col="bucket",
            )

    metrics["total_sec"] = round(time.time() - t_start, 2)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
