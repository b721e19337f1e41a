"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on /root/testdata/sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 plus
                the training-data-pipeline operators); each callable
                takes (spark, sf_dir) and returns a DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL per oracle-checkable query.

Design notes for cross-engine value-hash stability:
- No timestamps in outputs: buckets are epoch seconds (BIGINT) —
  identical int64 micros in the parquet on both engines, independent of
  session timezones.
- Every float output is ROUND(x, 4..6) on BOTH sides.
- Hash primitive: first 8 hex chars of md5 as int64 — Spark
  `conv(substring(md5(x),1,8),16,10)`, DuckDB
  `('0x'||substr(md5(x),1,8))::BIGINT` — verified equal.
- Matrix-profile / KMP / PMP / MPDist queries are not SQL-expressible;
  they have no oracle entry (rows-only check) and are instead pinned by
  the Go golden-fixture pytest suite (tests/test_kernels_*.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_matrixprofile_spark.kernels.matrix_profile import MPOpts
from go_matrixprofile_spark.operators import cleaning as CL
from go_matrixprofile_spark.operators import decontam as DC
from go_matrixprofile_spark.operators import dedup as DD
from go_matrixprofile_spark.operators import mixture as MX
from go_matrixprofile_spark.operators import rollup as R
from go_matrixprofile_spark.operators import series as S
from go_matrixprofile_spark.operators import simsearch as SS
from go_matrixprofile_spark.operators import text as TX
from go_matrixprofile_spark.operators.profile import (
    discover,
    k_matrix_profile,
    matrix_profile,
    matrix_profile_ab,
    matrix_profile_chunked,
    mpdist_pairs,
    pan_matrix_profile,
    pan_matrix_profile_distributed,
    streaming_update_check,
)
from go_matrixprofile_spark.sources.transcripts import transcripts_from_events


# --------------------------------------------------------------------- inputs


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(_events(spark, sf_dir))


def _hourly_rate_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly turn-rate series per conversation — the standard
    input to the matrix-profile queries."""
    t = _transcripts(spark, sf_dir)
    s = S.turn_rate_series(t, 3600)
    tier = R.rollup_raw(s, "1h")
    return R.gap_fill_locf(tier, 3600, value_col="sum")


# ---------------------------------------------------------------- the queries


def q_series_text_len(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    return t.select("conv_id", "turn_idx", F.length("text").alias("text_len"))


def q_series_latency(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    lat = S.inter_turn_latency_series(t)
    # join turn_idx back for a stable key (latency series keys by ts)
    return lat.select("conv_id", F.round("value", 6).alias("latency_s"))


def q_series_turn_rate(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    s = S.turn_rate_series(t, 60)
    return s.select(
        "conv_id",
        F.col("bucket_s").cast("long").alias("bucket_s"),
        F.col("value").cast("long").alias("turns"),
    )


def _rollup_select(tier: DataFrame) -> DataFrame:
    return tier.select(
        "conv_id",
        "bucket_s",
        "cnt",
        F.round("sum", 4).alias("sum_v"),
        F.round("min", 4).alias("min_v"),
        F.round("max", 4).alias("max_v"),
        F.round("first", 4).alias("first_v"),
        F.round("last", 4).alias("last_v"),
    )


def q_rollup_1m(spark, sf_dir):
    s = S.text_len_series(_transcripts(spark, sf_dir))
    return _rollup_select(R.rollup_raw(s, "1m"))


def q_rollup_1h(spark, sf_dir):
    s = S.text_len_series(_transcripts(spark, sf_dir))
    return _rollup_select(R.rollup_tier(R.rollup_raw(s, "1m"), "1h"))


def q_rollup_1d(spark, sf_dir):
    s = S.text_len_series(_transcripts(spark, sf_dir))
    return _rollup_select(R.rollup_tier(R.rollup_tier(R.rollup_raw(s, "1m"), "1h"), "1d"))


def q_gapfill_locf(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    return filled.select(
        "conv_id",
        "bucket_s",
        F.round("value", 4).alias("value"),
        "filled",
    )


def q_gapfill_interp(spark, sf_dir):
    """ORACLE-CHECKED linear-interpolation gap-fill: missing buckets take
    prev + (next-prev)·(t-t_prev)/(t_next-t_prev); LOCF after the last
    observation (operators/rollup.gap_fill_interpolate)."""
    t = _transcripts(spark, sf_dir)
    s = S.turn_rate_series(t, 3600)
    tier = R.rollup_raw(s, "1h")
    filled = R.gap_fill_interpolate(tier, 3600, value_col="sum")
    return filled.select(
        "conv_id", "bucket_s", F.round("value", 4).alias("value"), "filled"
    )


def q_sessionize(spark, sf_dir):
    return S.sessionize(_transcripts(spark, sf_dir), 1800.0)


def q_asof_turn_hourly(spark, sf_dir):
    """ORACLE-CHECKED as-of join (vs DuckDB's NATIVE ASOF JOIN): stamp
    every turn with the most recent COMPLETED hourly turn-rate bucket
    (bucket close <= turn time; first-hour turns get NULL). Union +
    running last() per conv — one shuffle, no range-join blowup."""
    from go_matrixprofile_spark.operators.asof import asof_join

    t = _transcripts(spark, sf_dir)
    rate = S.turn_rate_series(t, 3600).select(
        "conv_id",
        (F.col("bucket_s") + 3600).alias("bucket_close"),
        "value",
    )
    lhs = t.select("conv_id", "turn_idx", S.ts_seconds().alias("ts_s"))
    out = asof_join(
        lhs, rate, by=["conv_id"], left_on="ts_s", right_on="bucket_close",
        value_cols=["value"],
    )
    return out.select(
        "conv_id",
        "turn_idx",
        F.round("value", 4).alias("prev_hour_rate"),
        F.col("asof_bucket_close").cast("bigint").alias("asof_bucket_close"),
    )


def q_dedup_exact(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    return DD.ngram_jaccard_pairs(
        _documents(spark, sf_dir), k=8, threshold=0.2, max_doc_id=300
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return DD.minhash_lsh_pairs(_documents(spark, sf_dir), 8, 8, 2, max_doc_id=None)


def q_dedup_simhash(spark, sf_dir):
    return DD.simhash(_documents(spark, sf_dir), 16)


def q_dedup_simhash_pairs(spark, sf_dir):
    """ORACLE-CHECKED simhash near-dup pairs: banded signature joins
    (pigeonhole complete for hamming <= 3 with 4 bands) + exact
    bit_count(xor) verification."""
    return DD.simhash_near_dup_pairs(
        _documents(spark, sf_dir), n_bits=32, n_bands=4, max_hamming=3
    )


def q_text_quality(spark, sf_dir):
    return TX.text_quality(_documents(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return TX.token_counts(_documents(spark, sf_dir))


def q_token_counts_bpe(spark, sf_dir):
    """ORACLE-CHECKED real BPE token counting: an explicit 48-entry
    merges table (learned deterministically from an embedded seed
    corpus) applied as a JVM-side replace chain — no per-row Python,
    and the DuckDB oracle applies the identical chain."""
    return TX.token_counts_bpe(_documents(spark, sf_dir))


def q_token_counts_bpe_corpus(spark, sf_dir):
    """ORACLE-CHECKED corpus-learned BPE: the merges table is trained
    DISTRIBUTED over the actual documents table (iterative Spark pair
    counting, operators/bpe_train.py) and applied as the usual JVM
    replace chain; the oracle trains the same 48 merges with the
    pure-Python reference trainer over the same parquet and applies the
    identical chain in DuckDB — training and application both
    cross-checked."""
    from go_matrixprofile_spark.operators.bpe_train import train_bpe_distributed

    docs = _documents(spark, sf_dir)
    merges = train_bpe_distributed(docs, 48)
    return TX.token_counts_bpe(docs, merges=merges)


def q_lang_id(spark, sf_dir):
    """ORACLE-CHECKED character-trigram language ID (Cavnar–Trenkle
    rank profiles over 8 languages; out-of-place distance, integer
    math) — replaces the r03 marker-word heuristic."""
    return TX.lang_id(_documents(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    return TX.fingerprint(_documents(spark, sf_dir))


def _bench_slice(spark, sf_dir):
    """Deterministic benchmark stand-in for the decontamination gate
    queries: every 41st document plays the eval set, so benchmark
    members (and any doc sharing a normalized 13-gram with one) are
    contaminated by construction."""
    return (
        _documents(spark, sf_dir)
        .where(F.col("doc_id") % 41 == 0)
        .select(F.col("doc_id").alias("bench_id"), "text")
    )


def q_decontaminate(spark, sf_dir):
    """ORACLE-CHECKED GPT-3-style benchmark decontamination (word-13-
    gram overlap, broadcast gram join): full per-document verdict table
    — gram/hit counts, hit fraction, any-hit contamination flag."""
    out = DC.decontaminate(
        _documents(spark, sf_dir), _bench_slice(spark, sf_dir), n=13
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_hits",
        F.round("hit_frac", 6).alias("hit_frac"),
        "contaminated",
    )


def q_decontam_spans(spark, sf_dir):
    """ORACLE-CHECKED span-level contamination audit: positions of hit
    13-grams merged into maximal word intervals (gaps-and-islands over
    [pos, pos+13) windows) — the excision surface for pipelines that
    cut contaminated windows instead of dropping whole documents."""
    return DC.contaminated_spans(
        _documents(spark, sf_dir), _bench_slice(spark, sf_dir), n=13
    )


def q_mixture_sample(spark, sf_dir):
    """ORACLE-CHECKED domain-weighted epoch sampling (GPT-3/Pile-style
    mixture table): floor(weight) guaranteed copies + salted-md5
    Bernoulli for the fractional part, one row per (doc, epoch) with a
    portable global-shuffle order_key. Pure projection + one generate —
    literal weight map, no join, no shuffle."""
    return MX.mixture_sample(
        _documents(spark, sf_dir),
        weights={"src0": 2.5, "src3": 0.25, "src7": 0.0, "src11": 1.75},
        key_col="source",
        seed=42,
    ).select("doc_id", "source", "epoch", "order_key")


def q_train_val_split(spark, sf_dir):
    """ORACLE-CHECKED deterministic train/validation assignment:
    salted-md5 uniform per doc_id vs val_frac — disjoint, partitioning-
    independent, subset-consistent (filtering upstream never moves a
    surviving doc between splits). Pure projection, no shuffle."""
    return MX.train_val_split(
        _documents(spark, sf_dir), val_frac=0.1, seed=7
    ).select("doc_id", "split")


def q_clean_docs(spark, sf_dir):
    """ORACLE-CHECKED C4 line cleaning + PII redaction chain. The
    corpus documents are single-line and PII-free, so the query first
    assembles a deterministic multi-line variant per doc (a short line,
    a javascript line, synthetic e-mail/phone/IP lines, a brace line on
    every 53rd doc), then runs clean_lines -> redact_pii in one narrow
    shuffle-free projection; the oracle replays the identical assembly
    and rules in SQL."""
    docs = _documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(".\nshort\nContact user"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(
                "@example.com or call 555-123-4567 today."
                "\nEnable javascript to proceed now."
                "\nPing 10.0.0."
            ),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" fast."),
            F.when(
                F.col("doc_id") % 53 == 0, F.lit("\nBrace { line here.")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return CL.redact_pii(CL.clean_lines(docs), text_col="clean_text")



def q_knn_pq_adc_refined(spark, sf_dir):
    """ORACLE-CHECKED refined-PQ ANN: one Lloyd iteration on top of the
    seed codebooks (assign → per-position centroid means → reassign),
    centroid means quantized to 6 decimals so the refined assignment is
    bit-reproducible across engines; ADC top-k over the refined codes."""
    return SS.knn_pq_adc(
        _embeddings(spark, sf_dir), n_queries=8, k=5, refine=1, centroid_round=6
    )


def q_winnow_dup_pairs(spark, sf_dir):
    """ORACLE-CHECKED substring-level near-dup pairs: docs sharing >= 5
    rare winnowing fingerprints (SWA guarantee — every common substring
    of length >= 11 shares one); df-gated self-join, bounded blocks."""
    return DD.winnow_dup_pairs(
        _documents(spark, sf_dir), k=8, window=4, min_shared=5, max_df=25
    )


def q_dedup_groups(spark, sf_dir):
    """ORACLE-CHECKED near-dup group resolution: distributed connected
    components (min-label propagation + pointer jumping, all
    groupBy/join rounds) over the union of minhash-LSH, simhash and
    winnowing pair sources — every doc gets (component_id = min member,
    keep = is-survivor). The stage that lets a pipeline actually DROP
    fuzzy duplicates instead of stopping at pairs."""
    return DD.dedup_groups(_documents(spark, sf_dir))


def q_corpus_build(spark, sf_dir):
    """ORACLE-CHECKED training-corpus materialization: the composed end
    stage — near-dup group survivors ∧ quality ≥ 0.3 ∧ dup-3gram ≤ 0.5,
    carrying the real BPE token count for budget accounting. Composes
    four independently-green operators; each gate is one doc_id hash
    join."""
    from go_matrixprofile_spark.operators.corpus import build_corpus

    return build_corpus(_documents(spark, sf_dir))


def q_split_documents(spark, sf_dir):
    """ORACLE-CHECKED oversized-document splitting: chunk every doc
    whose real-BPE token count exceeds the packing budget into
    budget-sized pieces (full chunks + remainder), so the sequence
    packer's SUM(n_tokens) <= budget invariant holds with no exception
    class. Pure sequence+explode arithmetic — no shuffle."""
    from go_matrixprofile_spark.operators.corpus import split_documents

    tok = TX.token_counts_bpe(_documents(spark, sf_dir)).select(
        "doc_id", "n_bpe_tokens"
    )
    return split_documents(tok, budget=64)


def q_pack_sequences(spark, sf_dir):
    """ORACLE-CHECKED greedy sequence packing — the full accounting
    chain (real-BPE counts -> budget chunking -> salted-bucket greedy
    pack): every (doc, chunk) row's (bucket, seq_id, seq_offset)
    assignment hash-matches a DuckDB recursive-CTE replay of the
    identical greedy walk (one frontier row per bucket per step)."""
    from go_matrixprofile_spark.operators.corpus import (
        pack_sequences,
        split_documents,
    )

    tok = TX.token_counts_bpe(_documents(spark, sf_dir)).select(
        "doc_id", "n_bpe_tokens"
    )
    chunks = split_documents(tok, budget=64)
    return pack_sequences(
        chunks, budget=64, n_buckets=8, token_col="n_tokens",
        chunk_col="chunk_idx",
    )


def q_tokenize_bpe(spark, sf_dir):
    """ORACLE-CHECKED BPE tokenization to token ARRAYS (exploded to
    (doc_id, pos, token) rows for robust cross-engine value hashing):
    the actual tokenizer surface feeding materialize_sequences, not
    just the counts — DuckDB runs the identical per-word replace
    chain inside a list lambda."""
    from go_matrixprofile_spark.operators.text import tokenize_bpe

    return tokenize_bpe(_documents(spark, sf_dir)).select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


def q_quality_repetition(spark, sf_dir):
    """ORACLE-CHECKED Gopher-style repetition signals (Rae et al. 2021):
    top-/duplicate-n-gram occurrence fractions for n=1..3 per doc — the
    degenerate-repetition filter a training pipeline runs before dedup."""
    return TX.repetition_stats(_documents(spark, sf_dir))


def q_knn_brute_cosine(spark, sf_dir):
    return SS.knn_brute_cosine(_embeddings(spark, sf_dir), n_queries=8, k=5)


def q_knn_lsh_cosine(spark, sf_dir):
    return SS.knn_lsh_cosine(
        _embeddings(spark, sf_dir), n_queries=8, k=5, n_tables=4, band_size=4
    )


def q_knn_ivf_cosine(spark, sf_dir):
    """ORACLE-CHECKED IVF ANN: deterministic coarse quantizer (first 16
    vectors as centroids), nearest-centroid assignment (argmax cosine
    rounded to 6 so ties break identically across engines), query
    probes its 4 closest cells, exact cosine top-k within them."""
    return SS.knn_ivf_cosine(
        _embeddings(spark, sf_dir), n_queries=8, k=5, n_centroids=16, n_probe=4
    )


def q_cosine_near_dup(spark, sf_dir):
    return SS.cosine_near_dup_pairs(
        _embeddings(spark, sf_dir), threshold=0.3, n_tables=4, band_size=4
    )


# ------------------------- matrix-profile queries (rows-only, Go-fixture-pinned)


def q_mp_event_rate(spark, sf_dir):
    """ORACLE-CHECKED full-scale MPX profile (no bounded subset): every
    conversation's complete gap-filled hourly turn-rate series (~700
    points each at sf0.01), w=24, vs a DuckDB twin that computes the
    whole quadratic profile via per-diagonal product prefix sums
    (O(n²) rows instead of the O(n²·w) element join the bounded
    oracles use). Profile quantized to 4 decimals in BOTH engines
    before hashing; the argmin idx column is excluded (mutual-nearest
    pairs carry bit-identical mp at both arc ends, so raw-float argmin
    flips between engines — the idx path stays pinned by the Go golden
    fixtures in pytest)."""
    filled = _hourly_rate_filled(spark, sf_dir)
    prof = matrix_profile(filled, w=24, opts=MPOpts(algorithm="mpx"))
    return prof.select(
        "conv_id", F.col("offset").alias("j"), F.round("mp", 4).alias("mp")
    )


def q_mp_stomp_event_rate(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    sub = filled.where(F.col("conv_id").cast("int") < 20)
    return matrix_profile(sub, w=24, opts=MPOpts(algorithm="stomp"))


def q_mp_chunked(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    sub = filled.where(F.col("conv_id").cast("int") < 20)
    # gap-filled hourly tier is a regular grid: positions derive
    # arithmetically (no per-conv row_number sort)
    return matrix_profile_chunked(sub, w=24, n_batches=4, grid_step=3600)


def q_mp_discords(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    _, discords, _, _ = discover(filled, w=24)
    return discords


def q_mp_motifs(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    motifs, _, _, _ = discover(filled, w=24)
    return motifs.select(
        "conv_id", "metric", "w", "group", F.round("min_dist", 4).alias("min_dist")
    )


def q_mp_segments(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    _, _, segments, _ = discover(filled, w=24)
    return segments.select("conv_id", "metric", "w", "idx", F.round("cac", 4).alias("cac"))


def q_kmp_event_types(spark, sf_dir):
    """3-dim KMP: per-conv hourly counts of three event roles on a
    shared gap-filled grid."""
    t = _transcripts(spark, sf_dir).where(F.col("role").isin("click", "view", "error"))
    s = (
        t.groupBy(
            "conv_id", "role", S.bucket_of(S.ts_seconds(), 3600).alias("bucket_s")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .select(
            "conv_id",
            F.col("role").alias("metric"),
            F.col("bucket_s").cast("double").alias("bucket_s"),
            "value",
        )
    )
    tier = R.rollup_raw(s, "1h")
    filled = R.gap_fill_locf(tier, 3600, value_col="sum")
    # common grid across dims: keep only buckets where all three dims
    # have a value so the per-conv pivot is dense
    multi = filled.select("conv_id", F.col("metric").alias("dim"), "bucket_s", "value")
    counts = multi.groupBy("conv_id", "bucket_s").agg(F.count("*").alias("ndims"))
    full = counts.where(F.col("ndims") == 3).select("conv_id", "bucket_s")
    aligned = multi.join(full, ["conv_id", "bucket_s"])
    sub = aligned.where(F.col("conv_id").cast("int") < 30)
    return k_matrix_profile(sub, w=12)


def q_pmp_event_rate(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    sub = filled.where(F.col("conv_id").cast("int") < 15)
    return pan_matrix_profile(sub, 8, 12)


def q_mpdist_pairs(spark, sf_dir):
    filled = _hourly_rate_filled(spark, sf_dir)
    return mpdist_pairs(filled, w=16, max_convs=12).select(
        "a_id", "b_id", "metric", F.round("mpdist", 4).alias("mpdist")
    )


def q_update_equivalence(spark, sf_dir):
    """ORACLE-CHECKED Update ≡ recompute (matrixprofile_test.go:706-762):
    the engine streams the last 20% of each series through update() and
    reports the max abs deviation vs a full recompute. The oracle
    derives (n, n_new) independently from the transcripts and pins
    max_abs_diff to exactly 0 at 6 decimals — a materially false
    incremental path cannot hash-match."""
    # noisy µs-resolution latency series: no constant windows, so the
    # incremental path never hits the reference's zero-std error
    lat = S.inter_turn_latency_series(_transcripts(spark, sf_dir))
    sub = lat.where(F.col("conv_id").cast("int") < 10)
    chk = streaming_update_check(sub, w=16)
    return chk.select(
        "conv_id", "metric", "n", "n_new", F.round("max_abs_diff", 6).alias("max_abs_diff")
    )


def q_mp_ab_join(spark, sf_dir):
    """AB-join per conversation: latency series joined against the
    hourly turn-rate series — where does one signal's shape best match
    the other's (both directions)."""
    t = _transcripts(spark, sf_dir)
    lat = S.inter_turn_latency_series(t).where(F.col("conv_id").cast("int") < 30)
    rate = _hourly_rate_filled(spark, sf_dir).where(F.col("conv_id").cast("int") < 30)
    return matrix_profile_ab(lat, rate, w=12).select(
        "conv_id", "direction", "w", "offset", F.round("mp", 4).alias("mp"), "idx"
    )


def q_mp_av_discords(spark, sf_dir):
    """Annotation-vector-corrected discovery: complexity AV deweights
    flat regions before discord ranking (av/annotation_vector.go:53-80)."""
    filled = _hourly_rate_filled(spark, sf_dir)
    sub = filled.where(F.col("conv_id").cast("int") < 40)
    _, discords, _, _ = discover(sub, w=24, av="complexity")
    return discords


def _latency40(spark, sf_dir):
    """Bounded oracle input: each conversation's first 40 inter-turn
    latencies (only conversations with >= 40), so the quadratic ANSI-SQL
    twin stays cheap (33 offsets per conv at w=8)."""
    from pyspark.sql.window import Window

    lat = S.inter_turn_latency_series(_transcripts(spark, sf_dir))
    w40 = Window.partitionBy("conv_id").orderBy("bucket_s")
    first40 = lat.withColumn("rn", F.row_number().over(w40)).where("rn <= 40")
    eligible = (
        first40.groupBy("conv_id").agg(F.count("*").alias("n")).where("n = 40")
    )
    return first40.join(eligible.select("conv_id"), "conv_id").drop("rn", "n")


def q_mp_stomp_oracle(spark, sf_dir):
    """ORACLE-CHECKED matrix profile: STOMP self-join (w=8) over each
    conversation's first 40 inter-turn latencies, verified value-for-value
    against a quadratic ANSI-SQL implementation of the z-normalized
    distance (calculate_distance_profile, matrixprofile.go:489-508) with
    the w/2 exclusion zone."""
    prof = matrix_profile(_latency40(spark, sf_dir), w=8, opts=MPOpts(algorithm="stomp"))
    return prof.select(
        "conv_id", F.col("offset").alias("j"), F.round("mp", 4).alias("mp")
    )


def _greedy_top3_discords(prof: DataFrame, zone: int = 4) -> DataFrame:
    """Distributed greedy top-3 argmax with exclusion-zone suppression
    (DiscoverDiscords, matrixprofile.go:1338-1374) over a quantized
    profile (conv_id, offset, mp already rounded). Ties break on the
    lower offset — deterministic and engine-portable.

    No persist: the filtered profile is ~33 rows per conversation at
    oracle scale, and two oracle queries call this per run — caching it
    would leak blocks across the sweep (r02 advisor finding)."""
    from pyspark.sql.window import Window

    cur = prof.where("mp > 0 AND NOT isnan(mp)")
    order = Window.partitionBy("conv_id").orderBy(
        F.col("mp").desc(), F.col("offset").asc()
    )
    picks = []
    for r in range(3):
        top = (
            cur.withColumn("rn", F.row_number().over(order))
            .where("rn = 1")
            .select(
                "conv_id",
                F.lit(r).cast("int").alias("rank"),
                F.col("offset").alias("idx"),
            )
        )
        picks.append(top)
        if r < 2:
            cur = (
                cur.join(
                    F.broadcast(top.select("conv_id", F.col("idx").alias("dx"))),
                    "conv_id",
                )
                .where(f"offset < dx - {zone} OR offset >= dx + {zone}")
                .select("conv_id", "offset", "mp")
            )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def q_mp_discords_oracle(spark, sf_dir):
    """ORACLE-CHECKED greedy top-3 discords (DiscoverDiscords,
    matrixprofile.go:1338-1374): argmax with w/2 exclusion-zone
    suppression over the engine-computed profile.

    The profile is quantized to 4 decimals BEFORE the greedy and ties
    break on the lower offset, because mutual-nearest-neighbor pairs
    have bit-identical mp at both arc ends — 1e-15 arithmetic noise
    would otherwise flip the argmax between engines. The raw-float
    kernel greedy (mp.discover_discords) is pinned separately by the Go
    golden fixtures (matrixprofile_test.go:764-799) in pytest; this
    query value-checks the distributed top-k-with-suppression plan."""
    prof = matrix_profile(_latency40(spark, sf_dir), w=8, opts=MPOpts(algorithm="stomp"))
    return _greedy_top3_discords(
        prof.select("conv_id", "offset", F.round("mp", 4).alias("mp"))
    )


def q_mp_mpx_oracle(spark, sf_dir):
    """ORACLE-CHECKED default-algorithm (MPX) profile: diagonal
    traversal with the max(1, w/4) exclusion zone
    (matrixprofile.go:998-1001) and the clamped Pearson→Euclidean
    conversion (util/util.go:266-274), vs the quadratic SQL twin."""
    prof = matrix_profile(_latency40(spark, sf_dir), w=8, opts=MPOpts(algorithm="mpx"))
    return prof.select(
        "conv_id", F.col("offset").alias("j"), F.round("mp", 4).alias("mp")
    )


def _textlen40(spark, sf_dir):
    """Bounded text-length series: first 40 turns' text lengths per
    conversation (conversations with >= 40 turns only)."""
    from pyspark.sql.window import Window

    tl = S.text_len_series(_transcripts(spark, sf_dir))
    w40 = Window.partitionBy("conv_id").orderBy("bucket_s")
    first40 = tl.withColumn("rn", F.row_number().over(w40)).where("rn <= 40")
    eligible = (
        first40.groupBy("conv_id").agg(F.count("*").alias("n")).where("n = 40")
    )
    return first40.join(eligible.select("conv_id"), "conv_id").drop("rn", "n")


def q_mp_ab_oracle(spark, sf_dir):
    """ORACLE-CHECKED AB-join (mpxabBatch/mpxbaBatch,
    matrixprofile.go:1057-1198): latency series joined against the
    text-length series per conversation, both directions, no exclusion
    zone — vs the quadratic cross-profile in SQL."""
    prof = matrix_profile_ab(
        _latency40(spark, sf_dir), _textlen40(spark, sf_dir), w=8
    )
    return prof.select(
        "conv_id", "direction", "offset", F.round("mp", 4).alias("mp")
    )


def q_mp_chunked_oracle(spark, sf_dir):
    """ORACLE-CHECKED tiled (chunked) matrix profile: the SCAMP-style
    2-D tile decomposition (operators/profile.matrix_profile_chunked)
    must reproduce the same values as whole-series MPX — the oracle is
    the identical quadratic SQL as mp_mpx_oracle."""
    prof = matrix_profile_chunked(_latency40(spark, sf_dir), w=8, n_batches=4)
    return prof.select(
        "conv_id", F.col("offset").alias("j"), F.round("mp", 4).alias("mp")
    )



def q_mp_motifs_oracle(spark, sf_dir):
    """ORACLE-CHECKED motif discovery (DiscoverMotifs,
    matrixprofile.go:1229-1333), one group, neighbor cap 4, radius 2:
    seed pair = profile argmin + its index, then greedy neighbor adds
    from the seed's distance profile under exclusion-zone suppression
    (distance_profile's internal w/2 zone + zones around found members).
    All comparisons run on 4-decimal-quantized distances on BOTH sides
    (see q_mp_discords_oracle for why); the distance row itself comes
    from the real kernel (kernels.mass.distance_profile)."""
    from pyspark.sql import types as T2

    src = _latency40(spark, sf_dir)
    prof = matrix_profile(src, w=8, opts=MPOpts(algorithm="stomp"))
    series_arr = src.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket_s", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    prof_arr = prof.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("offset", "mp"))), lambda s: s["mp"]
        ).alias("mps"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("offset", "idx"))), lambda s: s["idx"]
        ).alias("idxs"),
    )
    joined = series_arr.join(prof_arr, "conv_id")
    schema = T2.StructType(
        [
            T2.StructField("conv_id", T2.StringType(), False),
            T2.StructField("member", T2.IntegerType(), False),
            T2.StructField("min_dist", T2.DoubleType(), False),
        ]
    )

    def kern(it):
        import numpy as np
        import pandas as pd

        from go_matrixprofile_spark.kernels.mass import distance_profile
        from go_matrixprofile_spark.kernels.util import (
            apply_exclusion_zone,
            mov_mean_std,
        )

        w, zone, radius, cap = 8, 4, 2.0, 4
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                vals = np.asarray(row.vals, dtype=np.float64)
                mp = np.round(np.asarray(row.mps, dtype=np.float64), 4)
                idxs = np.asarray(row.idxs, dtype=np.int64)
                s1 = int(np.argmin(mp))  # earliest wins ties
                s2 = int(idxs[s1])
                mdist = float(mp[s1])
                _, b_std = mov_mean_std(vals, w)
                dist = np.round(
                    distance_profile(vals, vals, w, s1, b_std, True, None), 4
                )
                apply_exclusion_zone(dist, s1, zone)
                apply_exclusion_zone(dist, s2, zone)
                members = {s1, s2}
                while len(members) < cap:
                    pick = int(np.argmin(dist))
                    if not (dist[pick] < mdist * radius):
                        break
                    members.add(pick)
                    apply_exclusion_zone(dist, pick, zone)
                for m in sorted(members):
                    rows.append((row.conv_id, m, mdist))
            yield pd.DataFrame(rows, columns=["conv_id", "member", "min_dist"])

    return joined.mapInPandas(kern, schema)


def q_kmp_oracle(spark, sf_dir):
    """ORACLE-CHECKED k-dimensional matrix profile (mSTOMP,
    kmp.go:161-212): 2 dims (bounded latency + text-length series on a
    shared positional grid); per-pair dim distances sort + cumsum
    across dims, level-d profile = min over rows of the (d+1)-smallest
    sum / (d+1) — in SQL, a row_number over dims per (i, j) and a
    running SUM."""
    from pyspark.sql.window import Window

    lat = _latency40(spark, sf_dir)
    txt = _textlen40(spark, sf_dir)
    wpos = Window.partitionBy("conv_id").orderBy("bucket_s")
    a = lat.select(
        "conv_id",
        F.lit("a_lat").alias("dim"),
        (F.row_number().over(wpos) - 1).cast("double").alias("bucket_s"),
        "value",
    )
    b = txt.select(
        "conv_id",
        F.lit("b_text").alias("dim"),
        (F.row_number().over(wpos) - 1).cast("double").alias("bucket_s"),
        "value",
    )
    both = a.join(b.select("conv_id").distinct(), "conv_id", "left_semi").unionByName(
        b.join(a.select("conv_id").distinct(), "conv_id", "left_semi")
    )
    prof = k_matrix_profile(both, w=8)
    # ROUND 3 (not 4): the level-d profile sums d+1 distances, amplifying
    # float error to ~1e-7 — at 4 decimals a rounding-boundary straddle
    # appears roughly once per 1e5 rows (observed at sf0.1)
    return prof.select("conv_id", "level", "offset", F.round("mp", 3).alias("mp"))


def q_pmp_oracle(spark, sf_dir):
    """ORACLE-CHECKED pan matrix profile (pmp.go:119-161): one MPX
    profile per window in [6, 10] over the bounded latency series,
    computed with (conv, window) task granularity
    (pan_matrix_profile_distributed) — vs a window-parameterized
    quadratic SQL twin with MPX's max(1, w/4) exclusion zone."""
    prof = pan_matrix_profile_distributed(_latency40(spark, sf_dir), 6, 10)
    return prof.select("conv_id", "w", "offset", F.round("mp", 4).alias("mp"))



def q_mp_av_discords_oracle(spark, sf_dir):
    """ORACLE-CHECKED annotation-vector discovery: the complexity AV
    (av/annotation_vector.go:53-80) deweights flat regions —
    mp' = mp + (1-av)·max(mp) (applySingleAV, matrixprofile.go:88-121)
    — then greedy top-3 discords on the corrected profile. The AV and
    correction run through kernels/av.py inside an Arrow-batched task;
    the SQL twin rebuilds both from windowed diffs."""
    from pyspark.sql import types as T2

    src = _latency40(spark, sf_dir)
    prof = matrix_profile(src, w=8, opts=MPOpts(algorithm="stomp"))
    series_arr = src.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket_s", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    prof_arr = prof.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("offset", "mp"))),
            lambda s: s["mp"],
        ).alias("mps")
    )
    joined = series_arr.join(prof_arr, "conv_id")
    schema = T2.StructType(
        [
            T2.StructField("conv_id", T2.StringType(), False),
            T2.StructField("offset", T2.IntegerType(), False),
            T2.StructField("mp", T2.DoubleType(), False),
        ]
    )

    def kern(it):
        import numpy as np
        import pandas as pd

        from go_matrixprofile_spark.kernels.av import apply_single_av

        for pdf in it:
            for row in pdf.itertuples(index=False):
                mp = np.asarray(row.mps, dtype=np.float64)
                corrected = apply_single_av(
                    mp, np.asarray(row.vals, dtype=np.float64), 8, "complexity"
                )
                yield pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "offset": np.arange(corrected.size, dtype=np.int32),
                        "mp": np.round(corrected, 4),
                    }
                )

    return _greedy_top3_discords(joined.mapInPandas(kern, schema))


def q_mp_segments_oracle(spark, sf_dir):
    """ORACLE-CHECKED FLUSS segmentation (DiscoverSegments,
    matrixprofile.go:1382-1403): arc curve = +1/-1 interval marks +
    prefix sum over the profile index, CAC = min(1, histo/iac) with
    pinned ends — all ANSI-SQL-expressible (arcCurve, discover.go:18-36)."""
    _, _, segments, _ = discover(
        _latency40(spark, sf_dir), w=8, opts=MPOpts(algorithm="stomp")
    )
    return segments.select("conv_id", "idx", F.round("cac", 4).alias("cac"))


def q_mpdist_oracle(spark, sf_dir):
    """ORACLE-CHECKED MPDist (matrixprofile.go:243-338) between the first
    8 eligible conversations' bounded latency series: k-th smallest
    (k = 0.05*(na+nb), 0-indexed) of the concatenated AB/BA profiles —
    in SQL, row_number = k+1 over the union of the two quadratic
    min-profiles."""
    return mpdist_pairs(_latency40(spark, sf_dir), w=8, max_convs=8).select(
        "a_id", "b_id", F.round("mpdist", 4).alias("mpdist")
    )


def q_compress_roundtrip(spark, sf_dir):
    """Gorilla codec through the Spark operators: compress the hourly
    turn-rate tier, decompress, verify bitwise equality per conv."""
    from go_matrixprofile_spark.functions.compress_ops import (
        compress_series,
        decompress_series,
    )

    t = _transcripts(spark, sf_dir)
    s = S.turn_rate_series(t, 3600)
    comp = compress_series(s, chunk_points=4096)
    back = decompress_series(comp).select(
        "conv_id", "metric", "bucket_s", F.col("value").alias("value_rt")
    )
    joined = s.join(back, ["conv_id", "metric", "bucket_s"], "full")
    return joined.groupBy("conv_id", "metric").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(
            F.when(
                F.col("value").eqNullSafe(F.col("value_rt")), 0
            ).otherwise(1)
        ).alias("n_mismatch"),
    )


def q_mp_transcript_corpus(spark, sf_dir):
    """Native-pipeline showcase: synthetic transcript corpus (north-rule
    schema) → 1m text_len rollup → MPX profile. Corpus size is fixed
    (deterministic) — independent of sf_dir."""
    from go_matrixprofile_spark.sources import datagen

    t = datagen.generate_transcripts(spark, 24, mega_every=0)
    s = S.text_len_series(t)
    tier = R.rollup_raw(s, "1m")
    return matrix_profile(tier.withColumnRenamed("first", "value"), w=16, value_col="value")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → transcripts → hourly turn-rate → gap-fill →
    MPX(w=16) → top-3 discords per conversation, on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    filled = _hourly_rate_filled(spark, sf_dir)
    _, discords, _, _ = discover(filled, w=16, k_discords=3)
    return discords


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries so every query fits the driver's 50-row
    correctness table (round 2 exposed 52 and the last two fell off).
    Value-checked (oracle-backed) queries come first; the rows-only
    full-scale variants sit at the tail. Three r02 rows-only entries
    whose operators are value-checked by bounded twins were trimmed to
    make room: mp_stomp_event_rate (mp_stomp_oracle), mp_chunked
    (mp_chunked_oracle), mp_av_discords (mp_av_discords_oracle) — the
    query functions remain importable for ad-hoc use."""
    return {
        # ---- value-checked vs the DuckDB oracle (41) ----
        "series_text_len": q_series_text_len,
        "series_latency": q_series_latency,
        "series_turn_rate": q_series_turn_rate,
        "rollup_1m": q_rollup_1m,
        "rollup_1h": q_rollup_1h,
        "rollup_1d": q_rollup_1d,
        "gapfill_locf": q_gapfill_locf,
        "gapfill_interp": q_gapfill_interp,
        "sessionize": q_sessionize,
        "asof_turn_hourly": q_asof_turn_hourly,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        # (dedup_simhash swapped out for asof_turn_hourly at the 50-row
        # gate: the signature aggregation stays value-checked inside
        # dedup_simhash_pairs, whose oracle re-derives the signatures)
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "text_quality": q_text_quality,
        # token_counts (regex count) upgraded to the real-BPE variant in
        # r4; the plain projection stays importable as q_token_counts
        "token_counts_bpe": q_token_counts_bpe,
        "tokenize_bpe": q_tokenize_bpe,
        "token_counts_bpe_corpus": q_token_counts_bpe_corpus,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "decontaminate": q_decontaminate,
        "decontam_spans": q_decontam_spans,
        "winnow_dup_pairs": q_winnow_dup_pairs,
        "dedup_groups": q_dedup_groups,
        "corpus_build": q_corpus_build,
        "split_documents": q_split_documents,
        "pack_sequences": q_pack_sequences,
        "quality_repetition": q_quality_repetition,
        "knn_brute_cosine": q_knn_brute_cosine,
        "knn_lsh_cosine": q_knn_lsh_cosine,
        "knn_ivf_cosine": q_knn_ivf_cosine,
        "knn_pq_adc_refined": q_knn_pq_adc_refined,
        "mixture_sample": q_mixture_sample,
        "train_val_split": q_train_val_split,
        "clean_docs": q_clean_docs,
        "cosine_near_dup": q_cosine_near_dup,
        "update_equivalence": q_update_equivalence,
        "compress_roundtrip": q_compress_roundtrip,
        "mp_stomp_oracle": q_mp_stomp_oracle,
        "mp_discords_oracle": q_mp_discords_oracle,
        "mp_segments_oracle": q_mp_segments_oracle,
        "mpdist_oracle": q_mpdist_oracle,
        "mp_mpx_oracle": q_mp_mpx_oracle,
        "mp_ab_oracle": q_mp_ab_oracle,
        "mp_av_discords_oracle": q_mp_av_discords_oracle,
        "pmp_oracle": q_pmp_oracle,
        "kmp_oracle": q_kmp_oracle,
        "mp_motifs_oracle": q_mp_motifs_oracle,
        "mp_chunked_oracle": q_mp_chunked_oracle,
        # ---- full-scale variants, rows-only by design (6) ----
        # (mp_segments and mp_motifs dropped to keep the dict at the
        # driver's 50-row gate after winnow_dup_pairs and
        # quality_repetition joined the value-checked block: their
        # oracle twins mp_segments_oracle / mp_motifs_oracle are
        # value-checked above and mp_discords exercises the same
        # full-scale profile + discovery path)
        # (mp_discords dropped for the 50-row gate when dedup_groups
        # joined the value-checked block: discords are doubly
        # value-checked by mp_discords_oracle AND mp_av_discords_oracle,
        # and mp_event_rate keeps the full-scale profile path)
        # (pmp_event_rate dropped for the 50-row gate when corpus_build
        # joined the value-checked block: the pan-MP family is
        # value-checked by pmp_oracle; kmp_event_types keeps a
        # multi-profile full-scale row)
        "mp_event_rate": q_mp_event_rate,
        # (kmp_event_types dropped for the 50-row gate when
        # split_documents joined the value-checked block: the KMP family
        # is value-checked by kmp_oracle and the function stays
        # importable for ad-hoc full-scale runs)
        # (mp_ab_join dropped for the 50-row gate when knn_pq_adc joined
        # the value-checked block: the AB path stays value-checked by
        # mp_ab_oracle — mp_ab_chunked_oracle later ceded its row in the
        # round-5 twin swaps, with the tiled AB path pytest-pinned by
        # test_ab_tiles_equal_whole; mpdist_pairs dropped when
        # knn_pq_adc_refined joined — MPDist is value-checked by
        # mpdist_oracle)
        # (mp_transcript_corpus dropped for the 50-row gate when
        # token_counts_bpe_corpus joined the value-checked block: the
        # datagen→rollup→MPX showcase stays importable and
        # jobs/run_pipeline.py --gen-convs drives the same chain
        # end-to-end every round)
    }


# ---------------------------------------------------------------- oracle SQL

_T = """
transcripts AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         event_type AS role,
         props AS text,
         ts
  FROM events
)
"""

# Shared CTE fragments for the matrix-profile oracle family: each
# conversation's first 40 inter-turn latencies (conversations with >= 40
# only), per-offset sliding stats at w=8 (33 offsets).
_LAT40 = f"""{_T},
lat AS (
  SELECT conv_id, ts,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS v
  FROM transcripts QUALIFY v IS NOT NULL
),
ranked AS (
  SELECT conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts) - 1 AS INT) AS pos, v
  FROM lat QUALIFY pos < 40
),
eligible AS (SELECT conv_id FROM ranked GROUP BY 1 HAVING COUNT(*) = 40),
el AS (SELECT r.conv_id, r.pos, r.v FROM ranked r JOIN eligible e USING (conv_id)),
offs AS (
  SELECT conv_id, CAST(unnest(generate_series(0, 32)) AS INT) AS i FROM eligible
),
stats AS (
  SELECT o.conv_id, o.i, AVG(e.v) AS mu, STDDEV_POP(e.v) AS sig
  FROM offs o JOIN el e ON e.conv_id = o.conv_id AND e.pos >= o.i AND e.pos <= o.i + 7
  GROUP BY 1, 2
)"""

# Quadratic self-join distance matrix with STOMP's w/2 exclusion zone
# (distanceProfile, matrixprofile.go:470-484: row i excludes
# j in [i-4, i+3]); prof = min over i per offset j.
_SELF_DISTS = """
dots AS (
  SELECT a.conv_id, a.i AS i, b.i AS j, SUM(av.v * bv.v) AS dot
  FROM offs a
  JOIN offs b ON b.conv_id = a.conv_id
  JOIN el av ON av.conv_id = a.conv_id AND av.pos >= a.i AND av.pos <= a.i + 7
  JOIN el bv ON bv.conv_id = a.conv_id AND bv.pos = b.i + (av.pos - a.i)
  WHERE (a.i - b.i > 4) OR (b.i - a.i >= 4)
  GROUP BY 1, 2, 3
),
dists AS (
  SELECT d.conv_id, d.i, d.j,
         SQRT(2*8*ABS(1 - (d.dot - 8*si.mu*sj.mu)/(8*si.sig*sj.sig))) AS dist
  FROM dots d
  JOIN stats si ON si.conv_id = d.conv_id AND si.i = d.i
  JOIN stats sj ON sj.conv_id = d.conv_id AND sj.i = d.j
),
prof AS (SELECT conv_id, j, MIN(dist) AS mp FROM dists GROUP BY 1, 2)
"""

# winnowing fingerprint set (k=8, window=4), shared by the
# winnow_fingerprints and winnow_dup_pairs oracles
_WINNOW_FPS = """
grams AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, substr(text, CAST(i AS INT), 8) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM documents)
  WHERE length(substr(text, CAST(i AS INT), 8)) > 0
),
hashed AS (
  SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hv FROM grams
),
wins AS (
  SELECT doc_id, pos,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM hashed
),
fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE pos <= n - 4)
"""

_SHINGLES = """
shingles AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS shingle
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM docs)
  WHERE length(substr(text, CAST(i AS INT), 8)) > 0
)
"""

# dedup_groups oracle: the three text pair sources (same parameters as
# their individually-green oracles, CTEs prefix-renamed to coexist),
# unioned, then transitive closure via a recursive CTE — component =
# MIN reachable node; docs in no pair are their own singleton. The CTE
# list is kept separate so the corpus_build oracle can reuse it.
_DEDUP_GROUPS_CTES = r"""
docs AS (SELECT doc_id, text FROM documents),
mh_shingles AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS shingle
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM docs)
  WHERE length(substr(text, CAST(i AS INT), 8)) > 0
),
mh_h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM mh_shingles),
mh AS (
  SELECT doc_id, CAST(hi.i AS INT) AS h_idx,
         MIN(((2*hi.i + 1) * hv + (7*hi.i + 3)) % 2147483647) AS minhash
  FROM mh_h, generate_series(0, 7) hi(i)
  GROUP BY 1, 2
),
mh_bands AS (
  SELECT doc_id, CAST(h_idx // 2 AS INT) AS band,
         string_agg(h_idx || ':' || minhash, '_' ORDER BY h_idx || ':' || minhash) AS band_sig
  FROM mh GROUP BY 1, 2
),
mh_cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM mh_bands a JOIN mh_bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
-- verify minhash candidates with exact n-gram Jaccard >= 0.5 before
-- clustering (transitive closure amplifies false edges); simhash and
-- winnow pairs carry their own verification already
mh_sizes AS (SELECT doc_id, COUNT(*) AS n FROM mh_shingles GROUP BY 1),
mh_inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM mh_cand c
  JOIN mh_shingles a ON a.doc_id = c.a_id
  JOIN mh_shingles b ON b.doc_id = c.b_id AND b.shingle = a.shingle
  GROUP BY 1, 2
),
mh_pairs AS (
  SELECT i.a_id, i.b_id
  FROM mh_inter i
  JOIN mh_sizes sa ON sa.doc_id = i.a_id
  JOIN mh_sizes sb ON sb.doc_id = i.b_id
  WHERE ROUND(i.n_inter / CAST(sa.n + sb.n - i.n_inter AS DOUBLE), 4) >= 0.5
),
sh_toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
sh_h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM sh_toks),
sh_bits AS (
  SELECT doc_id, CAST(b.i AS INT) AS bit, SUM(((hv >> CAST(b.i AS INT)) & 1) * 2 - 1) AS s
  FROM sh_h, generate_series(0, 31) b(i)
  GROUP BY 1, 2
),
sh_sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
              AS BIGINT) AS sig
  FROM sh_bits GROUP BY 1
),
sh_bands AS (
  SELECT doc_id, sig, CAST(b.i AS INT) AS band,
         (sig >> (CAST(b.i AS INT) * 8)) & 255 AS band_bits
  FROM sh_sigs, generate_series(0, 3) b(i)
),
sh_pairs AS (
  SELECT a_id, b_id FROM (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS sa, b.sig AS sb
    FROM sh_bands a JOIN sh_bands b
      ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id
  ) WHERE bit_count(xor(sa, sb)) <= 3
),
wn_grams AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, substr(text, CAST(i AS INT), 8) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM documents)
  WHERE length(substr(text, CAST(i AS INT), 8)) > 0
),
wn_hashed AS (
  SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hv FROM wn_grams
),
wn_wins AS (
  SELECT doc_id, pos,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM wn_hashed
),
wn_fps AS (SELECT DISTINCT doc_id, fp FROM wn_wins WHERE pos <= n - 4),
wn_rare AS (
  SELECT f.doc_id, f.fp FROM wn_fps f
  JOIN (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM wn_fps GROUP BY fp)
        WHERE df <= 25) r USING (fp)
),
wn_pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM wn_rare a JOIN wn_rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
all_pairs AS (
  SELECT a_id, b_id FROM mh_pairs
  UNION SELECT a_id, b_id FROM sh_pairs
  UNION SELECT a_id, b_id FROM wn_pairs
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM all_pairs
  UNION SELECT b_id, a_id FROM all_pairs
),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, rc.r FROM edges e JOIN reach rc ON rc.u = e.v
),
comp AS (SELECT u AS doc_id, MIN(r) AS component_id FROM reach GROUP BY u)"""

_DEDUP_GROUPS_SQL = f"""
WITH RECURSIVE
{_DEDUP_GROUPS_CTES}
SELECT d.doc_id,
       CAST(COALESCE(c.component_id, d.doc_id) AS BIGINT) AS component_id,
       COALESCE(c.component_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""


def oracle_sql() -> dict[str, str]:
    d = {
        "series_text_len": f"""
WITH {_T}
SELECT conv_id, turn_idx, length(text) AS text_len FROM transcripts
""",
        "series_latency": f"""
WITH {_T}
SELECT conv_id,
       ROUND(epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx), 6) AS latency_s
FROM transcripts
QUALIFY latency_s IS NOT NULL
""",
        "series_turn_rate": f"""
WITH {_T}
SELECT conv_id,
       CAST(FLOOR(epoch(ts)/60)*60 AS BIGINT) AS bucket_s,
       COUNT(*) AS turns
FROM transcripts GROUP BY 1, 2
""",
        "rollup_1m": f"""
WITH {_T},
s AS (SELECT conv_id, ts, CAST(length(text) AS DOUBLE) AS v FROM transcripts)
SELECT conv_id,
       CAST(FLOOR(epoch(ts)/60)*60 AS BIGINT) AS bucket_s,
       COUNT(*) AS cnt,
       ROUND(SUM(v), 4) AS sum_v,
       ROUND(MIN(v), 4) AS min_v,
       ROUND(MAX(v), 4) AS max_v,
       ROUND(arg_min(v, ts), 4) AS first_v,
       ROUND(arg_max(v, ts), 4) AS last_v
FROM s GROUP BY 1, 2
""",
        "rollup_1h": f"""
WITH {_T},
s AS (SELECT conv_id, ts, CAST(length(text) AS DOUBLE) AS v FROM transcripts)
SELECT conv_id,
       CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
       COUNT(*) AS cnt,
       ROUND(SUM(v), 4) AS sum_v,
       ROUND(MIN(v), 4) AS min_v,
       ROUND(MAX(v), 4) AS max_v,
       ROUND(arg_min(v, ts), 4) AS first_v,
       ROUND(arg_max(v, ts), 4) AS last_v
FROM s GROUP BY 1, 2
""",
        "rollup_1d": f"""
WITH {_T},
s AS (SELECT conv_id, ts, CAST(length(text) AS DOUBLE) AS v FROM transcripts)
SELECT conv_id,
       CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS bucket_s,
       COUNT(*) AS cnt,
       ROUND(SUM(v), 4) AS sum_v,
       ROUND(MIN(v), 4) AS min_v,
       ROUND(MAX(v), 4) AS max_v,
       ROUND(arg_min(v, ts), 4) AS first_v,
       ROUND(arg_max(v, ts), 4) AS last_v
FROM s GROUP BY 1, 2
""",
        "gapfill_locf": f"""
WITH {_T},
counts AS (
  SELECT conv_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM transcripts GROUP BY 1, 2
),
bounds AS (SELECT conv_id, MIN(b) AS lo, MAX(b) AS hi FROM counts GROUP BY 1),
grid AS (
  SELECT conv_id, CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT) AS b
  FROM bounds
),
j AS (
  SELECT g.conv_id, g.b, c.v
  FROM grid g LEFT JOIN counts c ON c.conv_id = g.conv_id AND c.b = g.b
)
SELECT conv_id, b AS bucket_s,
       ROUND(last_value(v IGNORE NULLS) OVER (
         PARTITION BY conv_id ORDER BY b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value,
       (v IS NULL) AS filled
FROM j
""",
        "gapfill_interp": f"""
WITH {_T},
counts AS (
  SELECT conv_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM transcripts GROUP BY 1, 2
),
bounds AS (SELECT conv_id, MIN(b) AS lo, MAX(b) AS hi FROM counts GROUP BY 1),
grid AS (
  SELECT conv_id, CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT) AS b
  FROM bounds
),
j AS (
  SELECT g.conv_id, g.b, c.v
  FROM grid g LEFT JOIN counts c ON c.conv_id = g.conv_id AND c.b = g.b
),
w_ AS (
  SELECT conv_id, b, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         last_value(CASE WHEN v IS NOT NULL THEN CAST(b AS DOUBLE) END IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(CASE WHEN v IS NOT NULL THEN CAST(b AS DOUBLE) END IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT conv_id, b AS bucket_s,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  WHEN nv IS NOT NULL AND pv IS NOT NULL AND nt <> pt
                    THEN pv + (nv - pv) * (CAST(b AS DOUBLE) - pt) / (nt - pt)
                  ELSE COALESCE(pv, nv) END, 4) AS value,
       (v IS NULL) AS filled
FROM w_
""",
        "sessionize": f"""
WITH {_T},
lagged AS (
  SELECT conv_id, turn_idx, ts,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
  FROM transcripts
),
flagged AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
sess AS (
  SELECT conv_id, ts,
         SUM(new_s) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT conv_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_turns,
       CAST(FLOOR(MIN(epoch(ts))) AS BIGINT) AS start_s,
       CAST(FLOOR(MAX(epoch(ts))) AS BIGINT) AS end_s
FROM sess GROUP BY 1, 2
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
FROM documents GROUP BY 1
""",
        "dedup_ngram_jaccard": f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
{_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY 1),
rare AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 10000
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.a_id
  JOIN shingles sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id,
       ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
WHERE ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 4) >= 0.2
""",
        "dedup_minhash_lsh": f"""
WITH docs AS (SELECT doc_id, text FROM documents),
{_SHINGLES},
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM shingles),
mh AS (
  SELECT doc_id, CAST(hi.i AS INT) AS h_idx,
         MIN(((2*hi.i + 1) * hv + (7*hi.i + 3)) % 2147483647) AS minhash
  FROM h, generate_series(0, 7) hi(i)
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, CAST(h_idx // 2 AS INT) AS band,
         string_agg(h_idx || ':' || minhash, '_' ORDER BY h_idx || ':' || minhash) AS band_sig
  FROM mh GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
""",
        "dedup_simhash_pairs": """
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM toks),
bits AS (
  SELECT doc_id, CAST(b.i AS INT) AS bit, SUM(((hv >> CAST(b.i AS INT)) & 1) * 2 - 1) AS s
  FROM h, generate_series(0, 31) b(i)
  GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
              AS BIGINT) AS sig
  FROM bits GROUP BY 1
),
bands AS (
  SELECT doc_id, sig, CAST(b.i AS INT) AS band,
         (sig >> (CAST(b.i AS INT) * 8)) & 255 AS band_bits
  FROM sigs, generate_series(0, 3) b(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS sa, b.sig AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
""",
        "text_quality": _TEXT_QUALITY_SQL,
        "token_counts_bpe": _TOKEN_BPE_SQL,
        "tokenize_bpe": _tokenize_bpe_sql(),
        "token_counts_bpe_corpus": _token_bpe_corpus_sql(),
        "lang_id": _LANG_ID_SQL,
        "doc_fingerprint": r"""
SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
FROM documents
""",
        "decontaminate": r"""
WITH bench AS (SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 41 = 0),
bg AS (
  SELECT DISTINCT array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+12], ' ') AS gram
  FROM (SELECT regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
        FROM bench),
       unnest(generate_series(1, greatest(len(ws) - 12, 0))) t(i)
),
dg AS (
  SELECT doc_id, array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+12], ' ') AS gram
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
        FROM documents),
       unnest(generate_series(1, greatest(len(ws) - 12, 0))) t(i)
),
hits AS (
  SELECT dg.doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
  FROM dg LEFT JOIN bg USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(CASE WHEN COALESCE(h.n_grams, 0) > 0
                  THEN CAST(h.n_hits AS DOUBLE) / CAST(h.n_grams AS DOUBLE)
                  ELSE 0.0 END, 6) AS hit_frac,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
        "decontam_spans": r"""
WITH bench AS (SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 41 = 0),
bg AS (
  SELECT DISTINCT array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+12], ' ') AS gram
  FROM (SELECT regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
        FROM bench),
       unnest(generate_series(1, greatest(len(ws) - 12, 0))) t(i)
),
dg AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+12], ' ') AS gram
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
        FROM documents),
       unnest(generate_series(1, greatest(len(ws) - 12, 0))) t(i)
),
hits AS (SELECT doc_id, pos FROM dg JOIN bg USING (gram)),
lagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 13
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 13 AS span_end,
       COUNT(*) AS n_hit_grams
FROM isl GROUP BY doc_id, island
""",
        "asof_turn_hourly": f"""
WITH {_T},
rate AS (
  SELECT conv_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         CAST(COUNT(*) AS DOUBLE) AS value
  FROM transcripts GROUP BY 1, 2
),
l AS (SELECT conv_id, turn_idx, epoch(ts) AS ts_s FROM transcripts),
r AS (SELECT conv_id, bucket_s + 3600 AS bucket_close, value FROM rate)
SELECT l.conv_id, l.turn_idx,
       ROUND(r.value, 4) AS prev_hour_rate,
       CAST(r.bucket_close AS BIGINT) AS asof_bucket_close
FROM l ASOF LEFT JOIN r
  ON l.conv_id = r.conv_id AND l.ts_s >= r.bucket_close
""",
        "dedup_groups": _DEDUP_GROUPS_SQL,
        "corpus_build": f"""
WITH RECURSIVE
{_DEDUP_GROUPS_CTES},
q AS ({_TEXT_QUALITY_SQL}),
rep AS ({_REPETITION_SQL}),
tok AS ({_TOKEN_BPE_SQL})
SELECT d.doc_id, tok.n_bpe_tokens, q.quality
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
JOIN rep ON rep.doc_id = d.doc_id
JOIN tok ON tok.doc_id = d.doc_id
WHERE COALESCE(c.component_id, d.doc_id) = d.doc_id
  AND q.quality >= 0.3
  AND (rep.dup_3gram_frac IS NULL OR rep.dup_3gram_frac <= 0.5)
""",
        "winnow_dup_pairs": f"""
WITH {_WINNOW_FPS},
dfs AS (SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp),
rare AS (
  SELECT f.doc_id, f.fp FROM fps f
  JOIN (SELECT fp FROM dfs WHERE df <= 25) r USING (fp)
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 5
""",
        "split_documents": f"""
WITH tok AS ({_TOKEN_BPE_SQL}),
chunks AS (
  SELECT doc_id, n_bpe_tokens,
         CAST(unnest(generate_series(
           0, CAST(greatest(ceil(n_bpe_tokens / 64.0), 1) AS BIGINT) - 1
         )) AS INT) AS chunk_idx
  FROM tok
)
SELECT doc_id, chunk_idx,
       CAST(least(64, n_bpe_tokens - chunk_idx * CAST(64 AS BIGINT)) AS BIGINT)
         AS n_tokens
FROM chunks
""",
        "pack_sequences": f"""
WITH RECURSIVE tok AS ({_TOKEN_BPE_SQL}),
chunks AS (
  SELECT doc_id, n_bpe_tokens,
         CAST(unnest(generate_series(
           0, CAST(greatest(ceil(n_bpe_tokens / 64.0), 1) AS BIGINT) - 1
         )) AS INT) AS chunk_idx
  FROM tok
),
sized AS (
  SELECT doc_id, chunk_idx,
         CAST(least(64, n_bpe_tokens - chunk_idx * CAST(64 AS BIGINT)) AS BIGINT)
           AS n_tokens,
         CAST(doc_id % 8 AS INT) AS bucket
  FROM chunks
),
nr AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id, chunk_idx) AS rn
  FROM sized
),
walk AS (
  SELECT bucket, rn, doc_id, chunk_idx, n_tokens,
         CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off,
         CASE WHEN n_tokens >= 64 THEN CAST(0 AS BIGINT) ELSE n_tokens END AS fill,
         CASE WHEN n_tokens >= 64 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS nseq
  FROM nr WHERE rn = 1
  UNION ALL
  SELECT r.bucket, r.rn, r.doc_id, r.chunk_idx, r.n_tokens,
         CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64
              THEN w.nseq + 1 ELSE w.nseq END,
         CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64
              THEN CAST(0 AS BIGINT) ELSE w.fill END,
         CASE WHEN (CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64 THEN 0 ELSE w.fill END) + r.n_tokens >= 64
              THEN CAST(0 AS BIGINT)
              ELSE (CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64 THEN 0 ELSE w.fill END) + r.n_tokens END,
         CASE WHEN (CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64 THEN 0 ELSE w.fill END) + r.n_tokens >= 64
              THEN (CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64 THEN w.nseq + 1 ELSE w.nseq END) + 1
              ELSE (CASE WHEN w.fill > 0 AND w.fill + r.n_tokens > 64 THEN w.nseq + 1 ELSE w.nseq END) END
  FROM walk w JOIN nr r ON r.bucket = w.bucket AND r.rn = w.rn + 1
)
SELECT doc_id, chunk_idx, n_tokens, bucket,
       (CAST(bucket AS BIGINT) << 40) + seq AS seq_id, off AS seq_offset
FROM walk
""",
        "quality_repetition": _REPETITION_SQL,
        "mp_stomp_oracle": f"""
WITH {_LAT40},
{_SELF_DISTS}
SELECT conv_id, j, ROUND(mp, 4) AS mp FROM prof
""",
        "mp_discords_oracle": f"""
WITH {_LAT40},
{_SELF_DISTS},
rprof AS (SELECT conv_id, j, ROUND(mp, 4) AS mp FROM prof),
d1 AS (
  SELECT conv_id, j, mp FROM rprof WHERE mp > 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY mp DESC, j ASC) = 1
),
p2 AS (
  SELECT p.conv_id, p.j, p.mp FROM rprof p JOIN d1 ON d1.conv_id = p.conv_id
  WHERE p.j < d1.j - 4 OR p.j >= d1.j + 4
),
d2 AS (
  SELECT conv_id, j, mp FROM p2 WHERE mp > 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY mp DESC, j ASC) = 1
),
p3 AS (
  SELECT p.conv_id, p.j, p.mp FROM p2 p JOIN d2 ON d2.conv_id = p.conv_id
  WHERE p.j < d2.j - 4 OR p.j >= d2.j + 4
),
d3 AS (
  SELECT conv_id, j, mp FROM p3 WHERE mp > 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY mp DESC, j ASC) = 1
)
SELECT conv_id, CAST(0 AS INT) AS "rank", CAST(j AS INT) AS idx FROM d1
UNION ALL SELECT conv_id, CAST(1 AS INT), CAST(j AS INT) FROM d2
UNION ALL SELECT conv_id, CAST(2 AS INT), CAST(j AS INT) FROM d3
""",
        "mp_segments_oracle": f"""
WITH {_LAT40},
{_SELF_DISTS},
prof_idx AS (
  SELECT conv_id, j, i FROM dists
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id, j ORDER BY dist ASC, i DESC) = 1
),
marks AS (
  SELECT conv_id, LEAST(j, i) + 1 AS pos, 1 AS delta FROM prof_idx WHERE ABS(i - j) >= 2
  UNION ALL
  SELECT conv_id, GREATEST(j, i) AS pos, -1 AS delta FROM prof_idx WHERE ABS(i - j) >= 2
),
mark_agg AS (SELECT conv_id, pos, SUM(delta) AS d FROM marks GROUP BY 1, 2),
positions AS (
  SELECT conv_id, CAST(unnest(generate_series(0, 32)) AS INT) AS x FROM eligible
),
histo AS (
  SELECT p.conv_id, p.x,
         SUM(COALESCE(m.d, 0)) OVER (PARTITION BY p.conv_id ORDER BY p.x) AS h
  FROM positions p LEFT JOIN mark_agg m ON m.conv_id = p.conv_id AND m.pos = p.x
),
cac AS (
  SELECT conv_id, x,
         CASE WHEN x = 0 OR x = 32 THEN 1.0
              ELSE LEAST(1.0, h / (-POWER(SQRT(2.0/33)*(x - 33/2.0), 2) + 33/2.0))
         END AS c
  FROM histo
)
SELECT conv_id, CAST(x AS INT) AS idx, ROUND(c, 4) AS cac FROM cac
QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY c ASC, x ASC) = 1
""",
        "mpdist_oracle": f"""
WITH {_LAT40},
conv8 AS (SELECT conv_id FROM eligible ORDER BY conv_id LIMIT 8),
prs AS (
  SELECT a.conv_id AS a_id, b.conv_id AS b_id
  FROM conv8 a JOIN conv8 b ON a.conv_id < b.conv_id
),
dots AS (
  SELECT p.a_id, p.b_id, oa.i AS i, ob.i AS j, SUM(av.v * bv.v) AS dot
  FROM prs p
  JOIN offs oa ON oa.conv_id = p.a_id
  JOIN offs ob ON ob.conv_id = p.b_id
  JOIN el av ON av.conv_id = p.a_id AND av.pos >= oa.i AND av.pos <= oa.i + 7
  JOIN el bv ON bv.conv_id = p.b_id AND bv.pos = ob.i + (av.pos - oa.i)
  GROUP BY 1, 2, 3, 4
),
dists AS (
  SELECT d.a_id, d.b_id, d.i, d.j,
         SQRT(2*8*ABS(1 - (d.dot - 8*sa.mu*sb.mu)/(8*sa.sig*sb.sig))) AS dist
  FROM dots d
  JOIN stats sa ON sa.conv_id = d.a_id AND sa.i = d.i
  JOIN stats sb ON sb.conv_id = d.b_id AND sb.i = d.j
),
mpab AS (SELECT a_id, b_id, i AS o, MIN(dist) AS v FROM dists GROUP BY 1, 2, 3),
mpba AS (SELECT a_id, b_id, j AS o, MIN(dist) AS v FROM dists GROUP BY 1, 2, 3),
allv AS (
  SELECT a_id, b_id, v FROM mpab
  UNION ALL SELECT a_id, b_id, v FROM mpba
)
SELECT a_id, b_id, ROUND(v, 4) AS mpdist FROM allv
QUALIFY ROW_NUMBER() OVER (PARTITION BY a_id, b_id ORDER BY v ASC) = 5
""",
        # full-scale MPX profile: the same LOCF-filled hourly turn-rate
        # series the engine computes over, then the complete quadratic
        # profile via per-diagonal product prefix sums — dot(i, i+d) is a
        # 24-row running sum over the diagonal's pointwise products, so
        # the oracle materializes O(n²) product rows per conversation
        # instead of O(n²·w) join rows (what makes a ~700-point-series,
        # 150-conversation full profile tractable in DuckDB)
        "mp_event_rate": f"""
WITH {_T},
counts AS (
  SELECT conv_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM transcripts GROUP BY 1, 2
),
bounds AS (SELECT conv_id, MIN(b) AS lo, MAX(b) AS hi FROM counts GROUP BY 1),
grid AS (
  SELECT conv_id, CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT) AS b
  FROM bounds
),
jg AS (
  SELECT g.conv_id, g.b, c.v
  FROM grid g LEFT JOIN counts c ON c.conv_id = g.conv_id AND c.b = g.b
),
ser AS (
  SELECT conv_id,
         CAST((b - MIN(b) OVER (PARTITION BY conv_id)) / 3600 AS INT) AS pos,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM jg
),
stats AS (
  SELECT conv_id, pos AS i,
         AVG(v) OVER w24 AS mu, STDDEV_POP(v) OVER w24 AS sig,
         COUNT(*) OVER w24 AS m
  FROM ser
  WINDOW w24 AS (PARTITION BY conv_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)
),
fstats AS (SELECT conv_id, i, mu, sig FROM stats WHERE m = 24),
prods AS (
  SELECT a.conv_id, b.pos - a.pos AS d, a.pos AS i, a.v * b.v AS p
  FROM ser a JOIN ser b
    ON b.conv_id = a.conv_id AND b.pos - a.pos >= 6
),
dots AS (
  SELECT conv_id, d, i,
         SUM(p) OVER wd AS dot, COUNT(*) OVER wd AS m
  FROM prods
  WINDOW wd AS (PARTITION BY conv_id, d ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)
),
dists AS (
  -- MuInvN zero-sigma guard + P2E clamp (util/util.go:266-274)
  SELECT dt.conv_id, dt.i, dt.i + dt.d AS jj,
         SQRT(2*24*(1 - LEAST(
           CASE WHEN si.sig = 0 OR sj.sig = 0 THEN 0.0
                ELSE (dt.dot - 24*si.mu*sj.mu)/(24*si.sig*sj.sig) END, 1.0))) AS dist
  FROM dots dt
  JOIN fstats si ON si.conv_id = dt.conv_id AND si.i = dt.i
  JOIN fstats sj ON sj.conv_id = dt.conv_id AND sj.i = dt.i + dt.d
  WHERE dt.m = 24
),
allmins AS (
  SELECT conv_id, i AS o, dist FROM dists
  UNION ALL SELECT conv_id, jj, dist FROM dists
)
SELECT conv_id, o AS j, ROUND(MIN(dist), 4) AS mp FROM allmins GROUP BY 1, 2
""",
        "mp_mpx_oracle": f"""
WITH {_LAT40},
dots AS (
  SELECT a.conv_id, a.i AS i, b.i AS j, SUM(av.v * bv.v) AS dot
  FROM offs a
  JOIN offs b ON b.conv_id = a.conv_id AND ABS(a.i - b.i) >= 2
  JOIN el av ON av.conv_id = a.conv_id AND av.pos >= a.i AND av.pos <= a.i + 7
  JOIN el bv ON bv.conv_id = a.conv_id AND bv.pos = b.i + (av.pos - a.i)
  GROUP BY 1, 2, 3
),
dists AS (
  -- MuInvN zero-sigma guard: constant windows contribute corr 0
  SELECT d.conv_id, d.j,
         SQRT(2*8*(1 - LEAST(
           CASE WHEN si.sig = 0 OR sj.sig = 0 THEN 0.0
                ELSE (d.dot - 8*si.mu*sj.mu)/(8*si.sig*sj.sig) END, 1.0))) AS dist
  FROM dots d
  JOIN stats si ON si.conv_id = d.conv_id AND si.i = d.i
  JOIN stats sj ON sj.conv_id = d.conv_id AND sj.i = d.j
)
SELECT conv_id, j, ROUND(MIN(dist), 4) AS mp FROM dists GROUP BY 1, 2
""",
        "mp_ab_oracle": f"""
WITH {_LAT40},
tl AS (SELECT conv_id, ts, CAST(length(text) AS DOUBLE) AS v FROM transcripts),
ranked_t AS (
  SELECT conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts) - 1 AS INT) AS pos, v
  FROM tl QUALIFY pos < 40
),
eligible_t AS (SELECT conv_id FROM ranked_t GROUP BY 1 HAVING COUNT(*) = 40),
both_c AS (SELECT conv_id FROM eligible INTERSECT SELECT conv_id FROM eligible_t),
el_a AS (SELECT e.conv_id, e.pos, e.v FROM el e JOIN both_c USING (conv_id)),
el_t AS (
  SELECT r.conv_id, r.pos, r.v FROM ranked_t r JOIN both_c USING (conv_id)
),
offs_b AS (
  SELECT conv_id, CAST(unnest(generate_series(0, 32)) AS INT) AS i FROM both_c
),
stats_a AS (
  SELECT o.conv_id, o.i, AVG(e.v) AS mu, STDDEV_POP(e.v) AS sig
  FROM offs_b o JOIN el_a e ON e.conv_id = o.conv_id AND e.pos >= o.i AND e.pos <= o.i + 7
  GROUP BY 1, 2
),
stats_t AS (
  SELECT o.conv_id, o.i, AVG(e.v) AS mu, STDDEV_POP(e.v) AS sig
  FROM offs_b o JOIN el_t e ON e.conv_id = o.conv_id AND e.pos >= o.i AND e.pos <= o.i + 7
  GROUP BY 1, 2
),
dots AS (
  SELECT a.conv_id, a.i AS i, b.i AS j, SUM(av.v * bv.v) AS dot
  FROM offs_b a
  JOIN offs_b b ON b.conv_id = a.conv_id
  JOIN el_a av ON av.conv_id = a.conv_id AND av.pos >= a.i AND av.pos <= a.i + 7
  JOIN el_t bv ON bv.conv_id = a.conv_id AND bv.pos = b.i + (av.pos - a.i)
  GROUP BY 1, 2, 3
),
dists AS (
  -- MPX's MuInvN sets 1/sigma to 0 for constant windows
  -- (util/util.go:99-137) so their correlation contributes 0, unlike
  -- the unguarded STOMP mass path — mirror that here
  SELECT d.conv_id, d.i, d.j,
         SQRT(2*8*(1 - LEAST(
           CASE WHEN sa.sig = 0 OR st.sig = 0 THEN 0.0
                ELSE (d.dot - 8*sa.mu*st.mu)/(8*sa.sig*st.sig) END, 1.0))) AS dist
  FROM dots d
  JOIN stats_a sa ON sa.conv_id = d.conv_id AND sa.i = d.i
  JOIN stats_t st ON st.conv_id = d.conv_id AND st.i = d.j
)
SELECT conv_id, 'ab' AS direction, CAST(i AS INT) AS "offset", ROUND(MIN(dist), 4) AS mp
FROM dists GROUP BY 1, 3
UNION ALL
SELECT conv_id, 'ba' AS direction, CAST(j AS INT) AS "offset", ROUND(MIN(dist), 4) AS mp
FROM dists GROUP BY 1, 3
""",
        "mp_motifs_oracle": f"""
WITH {_LAT40},
{_SELF_DISTS},
prof_idx AS (
  SELECT conv_id, j, i FROM dists
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id, j ORDER BY dist ASC, i DESC) = 1
),
rprof AS (SELECT conv_id, j, ROUND(mp, 4) AS mp FROM prof),
seed AS (
  SELECT r.conv_id, r.j AS s1, p.i AS s2, r.mp AS mdist
  FROM rprof r JOIN prof_idx p ON p.conv_id = r.conv_id AND p.j = r.j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY r.conv_id ORDER BY r.mp ASC, r.j ASC) = 1
),
drow AS (
  -- the seed's distance row; dists already carries distance_profile's
  -- internal w/2 zone around i = s1, the s2 zone is applied here
  SELECT d.conv_id, d.j, ROUND(d.dist, 4) AS dist, s.mdist
  FROM dists d JOIN seed s ON s.conv_id = d.conv_id AND d.i = s.s1
  WHERE d.j < s.s2 - 4 OR d.j >= s.s2 + 4
),
p1 AS (
  SELECT conv_id, j AS m1, dist, mdist FROM drow
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY dist ASC, j ASC) = 1
),
c1 AS (
  SELECT d.* FROM drow d
  JOIN p1 ON p1.conv_id = d.conv_id AND p1.dist < 2 * p1.mdist
  WHERE d.j < p1.m1 - 4 OR d.j >= p1.m1 + 4
),
p2 AS (
  SELECT conv_id, j AS m2, dist, mdist FROM c1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY dist ASC, j ASC) = 1
),
members AS (
  SELECT conv_id, s1 AS member FROM seed
  UNION SELECT conv_id, s2 FROM seed
  UNION SELECT conv_id, m1 FROM p1 WHERE dist < 2 * mdist
  UNION SELECT conv_id, m2 FROM p2 WHERE dist < 2 * mdist
)
SELECT m.conv_id, CAST(m.member AS INT) AS member, s.mdist AS min_dist
FROM members m JOIN seed s ON s.conv_id = m.conv_id
""",
        "kmp_oracle": f"""
WITH {_LAT40},
tl AS (SELECT conv_id, ts, CAST(length(text) AS DOUBLE) AS v FROM transcripts),
ranked_t AS (
  SELECT conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts) - 1 AS INT) AS pos, v
  FROM tl QUALIFY pos < 40
),
eligible_t AS (SELECT conv_id FROM ranked_t GROUP BY 1 HAVING COUNT(*) = 40),
both_c AS (SELECT conv_id FROM eligible INTERSECT SELECT conv_id FROM eligible_t),
el_d AS (
  SELECT e.conv_id, 'a_lat' AS dim, e.pos, e.v FROM el e JOIN both_c USING (conv_id)
  UNION ALL
  SELECT r.conv_id, 'b_text' AS dim, r.pos, r.v FROM ranked_t r JOIN both_c USING (conv_id)
),
offs_b AS (
  SELECT conv_id, CAST(unnest(generate_series(0, 32)) AS INT) AS i FROM both_c
),
stats_d AS (
  SELECT e.conv_id, e.dim, o.i, AVG(e.v) AS mu, STDDEV_POP(e.v) AS sig
  FROM offs_b o
  JOIN el_d e ON e.conv_id = o.conv_id AND e.pos >= o.i AND e.pos <= o.i + 7
  GROUP BY 1, 2, 3
),
dots_d AS (
  SELECT av.dim, a.conv_id, a.i AS i, b.i AS j, SUM(av.v * bv.v) AS dot
  FROM offs_b a
  JOIN offs_b b ON b.conv_id = a.conv_id
   AND ((a.i - b.i > 4) OR (b.i - a.i >= 4))
  JOIN el_d av ON av.conv_id = a.conv_id AND av.pos >= a.i AND av.pos <= a.i + 7
  JOIN el_d bv ON bv.conv_id = a.conv_id AND bv.dim = av.dim
   AND bv.pos = b.i + (av.pos - a.i)
  GROUP BY 1, 2, 3, 4
),
dists_d AS (
  -- mSTOMP divides by sigma with NO zero-guard (kmp.go:191-195): a
  -- constant window yields IEEE +Inf (numpy). DuckDB's x/0 is NULL, so
  -- the Inf is written explicitly; Inf-contaminated levels then stay
  -- Inf through the cumsum exactly like the engine.
  SELECT d.conv_id, d.dim, d.i, d.j,
         CASE WHEN si.sig = 0 OR sj.sig = 0 THEN 'Infinity'::DOUBLE
              ELSE SQRT(2*8*ABS(1 - (d.dot - 8*si.mu*sj.mu)/(8*si.sig*sj.sig)))
         END AS dist
  FROM dots_d d
  JOIN stats_d si ON si.conv_id = d.conv_id AND si.dim = d.dim AND si.i = d.i
  JOIN stats_d sj ON sj.conv_id = d.conv_id AND sj.dim = d.dim AND sj.i = d.j
),
ranked_d AS (
  SELECT conv_id, i, j, dist,
         ROW_NUMBER() OVER (PARTITION BY conv_id, i, j ORDER BY dist ASC) AS rk
  FROM dists_d
),
cums AS (
  SELECT conv_id, i, j,
         CAST(rk - 1 AS INT) AS level,
         SUM(dist) OVER (PARTITION BY conv_id, i, j ORDER BY rk) / rk AS scaled
  FROM ranked_d
)
SELECT conv_id, level, CAST(j AS INT) AS "offset", ROUND(MIN(scaled), 3) AS mp
FROM cums GROUP BY 1, 2, 3
""",
        "pmp_oracle": f"""
WITH {_LAT40},
wins AS (SELECT CAST(unnest(generate_series(6, 10)) AS INT) AS w),
offs_w AS (
  SELECT e.conv_id, wn.w, CAST(unnest(generate_series(0, 40 - wn.w)) AS INT) AS i
  FROM eligible e, wins wn
),
stats_w AS (
  SELECT o.conv_id, o.w, o.i, AVG(e.v) AS mu, STDDEV_POP(e.v) AS sig
  FROM offs_w o
  JOIN el e ON e.conv_id = o.conv_id AND e.pos >= o.i AND e.pos <= o.i + o.w - 1
  GROUP BY 1, 2, 3
),
dots_w AS (
  SELECT a.conv_id, a.w, a.i AS i, b.i AS j, SUM(av.v * bv.v) AS dot
  FROM offs_w a
  JOIN offs_w b ON b.conv_id = a.conv_id AND b.w = a.w
   AND ABS(a.i - b.i) >= GREATEST(1, a.w // 4)
  JOIN el av ON av.conv_id = a.conv_id AND av.pos >= a.i AND av.pos <= a.i + a.w - 1
  JOIN el bv ON bv.conv_id = a.conv_id AND bv.pos = b.i + (av.pos - a.i)
  GROUP BY 1, 2, 3, 4
),
dists_w AS (
  SELECT d.conv_id, d.w, d.j,
         SQRT(2*d.w*(1 - LEAST(
           CASE WHEN si.sig = 0 OR sj.sig = 0 THEN 0.0
                ELSE (d.dot - d.w*si.mu*sj.mu)/(d.w*si.sig*sj.sig) END, 1.0))) AS dist
  FROM dots_w d
  JOIN stats_w si ON si.conv_id = d.conv_id AND si.w = d.w AND si.i = d.i
  JOIN stats_w sj ON sj.conv_id = d.conv_id AND sj.w = d.w AND sj.i = d.j
)
SELECT conv_id, w, CAST(j AS INT) AS "offset", ROUND(MIN(dist), 4) AS mp
FROM dists_w GROUP BY 1, 2, 3
""",
        "mp_av_discords_oracle": f"""
WITH {_LAT40},
{_SELF_DISTS},
diffs AS (
  SELECT conv_id, pos,
         POWER(lead(v) OVER (PARTITION BY conv_id ORDER BY pos) - v, 2) AS d2
  FROM el QUALIFY d2 IS NOT NULL
),
avr AS (
  SELECT o.conv_id, o.i, SQRT(SUM(d.d2)) AS ar
  FROM offs o JOIN diffs d ON d.conv_id = o.conv_id AND d.pos >= o.i AND d.pos <= o.i + 6
  GROUP BY 1, 2
),
avn AS (
  SELECT conv_id, i,
         (ar - MIN(ar) OVER (PARTITION BY conv_id)) / MAX(ar) OVER (PARTITION BY conv_id) AS av
  FROM avr
),
rprof AS (
  SELECT p.conv_id, p.j,
         ROUND(p.mp + (1 - a.av) * (MAX(p.mp) OVER (PARTITION BY p.conv_id)), 4) AS mp
  FROM prof p JOIN avn a ON a.conv_id = p.conv_id AND a.i = p.j
),
d1 AS (
  SELECT conv_id, j, mp FROM rprof WHERE mp > 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY mp DESC, j ASC) = 1
),
p2 AS (
  SELECT p.conv_id, p.j, p.mp FROM rprof p JOIN d1 ON d1.conv_id = p.conv_id
  WHERE p.j < d1.j - 4 OR p.j >= d1.j + 4
),
d2 AS (
  SELECT conv_id, j, mp FROM p2 WHERE mp > 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY mp DESC, j ASC) = 1
),
p3 AS (
  SELECT p.conv_id, p.j, p.mp FROM p2 p JOIN d2 ON d2.conv_id = p.conv_id
  WHERE p.j < d2.j - 4 OR p.j >= d2.j + 4
),
d3 AS (
  SELECT conv_id, j, mp FROM p3 WHERE mp > 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY mp DESC, j ASC) = 1
)
SELECT conv_id, CAST(0 AS INT) AS "rank", CAST(j AS INT) AS idx FROM d1
UNION ALL SELECT conv_id, CAST(1 AS INT), CAST(j AS INT) FROM d2
UNION ALL SELECT conv_id, CAST(2 AS INT), CAST(j AS INT) FROM d3
""",
        "update_equivalence": f"""
WITH {_T},
lat AS (
  SELECT conv_id,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS v
  FROM transcripts QUALIFY v IS NOT NULL
),
counts AS (
  SELECT conv_id, COUNT(*) AS n FROM lat
  WHERE CAST(conv_id AS INT) < 10 GROUP BY 1
),
calc AS (
  SELECT conv_id, CAST(n AS INT) AS n,
         CAST(FLOOR(n * 0.8) AS INT) AS cut
  FROM counts
)
SELECT conv_id, 'inter_turn_latency_s' AS metric, n,
       CAST(n - cut AS INT) AS n_new, 0.0 AS max_abs_diff
FROM calc WHERE cut >= 18 AND n - cut >= 1
""",
        "compress_roundtrip": f"""
WITH {_T},
counts AS (
  SELECT conv_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b
  FROM transcripts GROUP BY conv_id, b
)
SELECT conv_id, 'turn_rate' AS metric, COUNT(*) AS n_points,
       CAST(0 AS BIGINT) AS n_mismatch
FROM counts GROUP BY conv_id
""",
        "mixture_sample": """
WITH w AS (
  SELECT doc_id, source,
         CAST(CASE source WHEN 'src0' THEN 2.5 WHEN 'src3' THEN 0.25
              WHEN 'src7' THEN 0.0 WHEN 'src11' THEN 1.75
              ELSE 1.0 END AS DOUBLE) AS wt,
         ('0x' || substr(md5('mix:42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
), n AS (
  SELECT doc_id, source,
         CAST(FLOOR(wt) AS INT)
           + CASE WHEN u < wt - FLOOR(wt) THEN 1 ELSE 0 END AS n_copies
  FROM w
), ep AS (
  SELECT doc_id, source,
         CAST(unnest(generate_series(0, n_copies - 1)) AS INT) AS epoch
  FROM n
)
SELECT doc_id, source, epoch,
       ('0x' || substr(md5('shuf:42:' || CAST(epoch AS VARCHAR) || ':'
                           || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS order_key
FROM ep
""",
        "train_val_split": """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5('split:7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 / 4294967296.0 < 0.1
            THEN 'val' ELSE 'train' END AS split
FROM documents
""",
        "knn_brute_cosine": _KNN_SQL,
        "knn_lsh_cosine": _KNN_LSH_SQL,
        "knn_ivf_cosine": _KNN_IVF_SQL,
        "knn_pq_adc_refined": f"""
WITH {_DIMS},
seed_d2 AS (
  SELECT v.vec_id, CAST((v.i - 1) // 16 AS INT) AS sub, c.vec_id AS code,
         ROUND(SUM((v.x - c.x) * (v.x - c.x)), 6) AS d2
  FROM dims v JOIN dims c ON c.i = v.i AND c.vec_id < 16
  GROUP BY 1, 2, 3
),
seed_codes AS (
  SELECT vec_id, sub, code FROM seed_d2
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) = 1
),
-- one Lloyd step: per-(sub, code, position) mean of assigned subvector
-- elements, ROUND 6 (matches the engine's centroid_round=6 so the
-- refined assignment is summation-order-independent); empty clusters
-- keep the seed slice
assigned_elems AS (
  SELECT sc.sub, sc.code, d.i AS i, d.x
  FROM seed_codes sc
  JOIN dims d ON d.vec_id = sc.vec_id AND CAST((d.i - 1) // 16 AS INT) = sc.sub
),
ref_means AS (
  SELECT sub, code, i, ROUND(AVG(x), 6) AS cx
  FROM assigned_elems GROUP BY 1, 2, 3
),
seed_cb AS (
  SELECT CAST((i - 1) // 16 AS INT) AS sub, vec_id AS code, i, x
  FROM dims WHERE vec_id < 16
),
ref_cb AS (
  SELECT s.sub, s.code, s.i, COALESCE(m.cx, s.x) AS x
  FROM seed_cb s LEFT JOIN ref_means m
    ON m.sub = s.sub AND m.code = s.code AND m.i = s.i
),
ref_d2 AS (
  SELECT v.vec_id, c.sub, c.code,
         ROUND(SUM((v.x - c.x) * (v.x - c.x)), 6) AS d2
  FROM dims v JOIN ref_cb c ON c.i = v.i
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, sub, code FROM ref_d2
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) = 1
),
lut AS (SELECT vec_id AS qid, sub, code, d2 AS pd FROM ref_d2 WHERE vec_id < 8),
approx AS (
  SELECT l.qid, co.vec_id AS nid, ROUND(SUM(l.pd), 4) AS dist
  FROM codes co JOIN lut l ON l.sub = co.sub AND l.code = co.code
  WHERE l.qid <> co.vec_id
  GROUP BY 1, 2
)
SELECT qid, CAST(rank AS INT) AS rank, nid, dist FROM (
  SELECT qid, nid, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rank
  FROM approx) WHERE rank <= 5
""",
        "clean_docs": r"""
WITH src AS (
  SELECT doc_id,
         text || '.' || chr(10) || 'short' || chr(10) ||
         'Contact user' || CAST(doc_id % 100 AS VARCHAR) ||
         '@example.com or call 555-123-4567 today.' || chr(10) ||
         'Enable javascript to proceed now.' || chr(10) ||
         'Ping 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) || ' fast.' ||
         CASE WHEN doc_id % 53 = 0 THEN chr(10) || 'Brace { line here.' ELSE '' END AS text
  FROM documents
),
l AS (
  SELECT doc_id, i, trim(x[i]) AS t
  FROM (SELECT doc_id, string_split(text, chr(10)) AS x FROM src),
       unnest(generate_series(1, len(x))) u(i)
),
k AS (
  SELECT doc_id, i, t FROM l
  WHERE len(regexp_split_to_array(t, '\s+')) >= 3
    AND regexp_matches(t, '[.!?"'']$')
    AND NOT contains(lower(t), 'javascript')
),
agg AS (
  SELECT doc_id, string_agg(t, chr(10) ORDER BY i) AS clean_text,
         COUNT(*) AS n_kept
  FROM k GROUP BY 1
),
c AS (
  SELECT s.doc_id,
         COALESCE(a.clean_text, '') AS clean_text,
         CAST(len(string_split(s.text, chr(10))) AS BIGINT) AS n_lines,
         CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
         NOT (contains(lower(s.text), 'lorem ipsum') OR contains(s.text, '{')) AS keep_doc
  FROM src s LEFT JOIN agg a USING (doc_id)
),
s1 AS (
  SELECT doc_id, n_lines, n_kept, keep_doc,
    CAST(len(regexp_extract_all(clean_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
    regexp_replace(clean_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM c
),
s2 AS (
  SELECT doc_id, n_lines, n_kept, keep_doc, n_emails,
    CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
    regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_lines, n_kept, keep_doc,
       regexp_replace(t2, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS text_redacted,
       n_emails, n_ips,
       CAST(len(regexp_extract_all(t2, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones
FROM s2
""",
        "cosine_near_dup": _NEAR_DUP_SQL,
    }
    # algorithm variants that must agree value-for-value with an
    # existing quadratic oracle: the tiled/chunked path and MPX share
    # one spec
    d["mp_chunked_oracle"] = d["mp_mpx_oracle"]
    return d


_REPETITION_SQL = r"""
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id, 1 AS n, unnest(ws) AS gram FROM words
  UNION ALL
  SELECT doc_id, 2 AS n,
         unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS gram
  FROM words
  UNION ALL
  SELECT doc_id, 3 AS n,
         unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in range(1, len(ws) - 1)]) AS gram
  FROM words
),
cnts AS (
  SELECT doc_id, n, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, n, gram
),
per AS (
  SELECT doc_id, n, CAST(SUM(c) AS BIGINT) AS total, MAX(c) AS top,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
  FROM cnts GROUP BY doc_id, n
)
SELECT doc_id,
  MAX(CASE WHEN n = 1 THEN total END) AS n_words,
  ROUND(MAX(CASE WHEN n = 1 THEN top END)
        / NULLIF(MAX(CASE WHEN n = 1 THEN total END), 0), 4) AS top_1gram_frac,
  ROUND(MAX(CASE WHEN n = 1 THEN dup END)
        / NULLIF(MAX(CASE WHEN n = 1 THEN total END), 0), 4) AS dup_1gram_frac,
  ROUND(MAX(CASE WHEN n = 2 THEN top END)
        / NULLIF(MAX(CASE WHEN n = 2 THEN total END), 0), 4) AS top_2gram_frac,
  ROUND(MAX(CASE WHEN n = 2 THEN dup END)
        / NULLIF(MAX(CASE WHEN n = 2 THEN total END), 0), 4) AS dup_2gram_frac,
  ROUND(MAX(CASE WHEN n = 3 THEN top END)
        / NULLIF(MAX(CASE WHEN n = 3 THEN total END), 0), 4) AS top_3gram_frac,
  ROUND(MAX(CASE WHEN n = 3 THEN dup END)
        / NULLIF(MAX(CASE WHEN n = 3 THEN total END), 0), 4) AS dup_3gram_frac
FROM per GROUP BY doc_id
"""

_TEXT_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' the ', ''))) / 5 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' a ', ''))) / 3 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' of ', ''))) / 4 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' and ', ''))) / 5 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' to ', ''))) / 4 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' in ', ''))) / 4 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' is ', ''))) / 4 AS BIGINT)
       + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' it ', ''))) / 4 AS BIGINT)
         AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       ROUND((n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE), 4) AS avg_token_len,
       ROUND(n_punct / CAST(n_chars AS DOUBLE), 4) AS punct_ratio,
       ROUND(stop_hits / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
       ROUND(
         least(n_tokens / 64.0, 1.0) * 0.4
         + least((stop_hits / CAST(n_tokens AS DOUBLE)) * 4.0, 1.0) * 0.4
         + (1.0 - least((n_punct / CAST(n_chars AS DOUBLE)) * 8.0, 1.0)) * 0.2, 4) AS quality
FROM base
"""

def _lang_id_sql() -> str:
    """Cavnar–Trenkle rank-profile LID, generated from the SAME trigram
    profiles the engine uses (functions/langprofiles.py) so Spark and
    DuckDB score identically — integer rank math end to end."""
    from go_matrixprofile_spark.functions.langprofiles import (
        K_DOC,
        N_PROF,
        PROFILES,
    )

    values = ",\n    ".join(
        f"('{lang}', '{tri}', {r})"
        for lang in sorted(PROFILES)
        for tri, r in sorted(PROFILES[lang].items(), key=lambda kv: kv[1])
    )
    return f"""
WITH norm AS (
  SELECT doc_id, ' ' || regexp_replace(lower(text), '[^a-z]', ' ', 'g') || ' ' AS n
  FROM documents
),
tris AS (
  SELECT doc_id, substr(n, CAST(i AS INT), 3) AS tri
  FROM (SELECT doc_id, n, unnest(generate_series(1, greatest(length(n) - 2, 1))) AS i
        FROM norm)
  WHERE length(substr(n, CAST(i AS INT), 3)) = 3
    AND substr(n, CAST(i AS INT), 3) <> '   '
),
cnt AS (SELECT doc_id, tri, COUNT(*) AS c FROM tris GROUP BY 1, 2),
top AS (
  SELECT doc_id, tri,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tri ASC) - 1 AS r
  FROM cnt QUALIFY r < {K_DOC}
),
prof(lang, tri, pr) AS (VALUES
    {values}
),
crossed AS (
  SELECT t.doc_id, t.tri, t.r, l.lang
  FROM top t CROSS JOIN (SELECT DISTINCT lang FROM prof) l
),
j AS (
  SELECT c.doc_id, c.lang,
         COALESCE(ABS(c.r - p.pr), {N_PROF}) AS pen, p.pr
  FROM crossed c LEFT JOIN prof p ON p.lang = c.lang AND p.tri = c.tri
),
scored AS (
  SELECT doc_id, lang, SUM(pen) AS dist, COUNT(pr) AS matched
  FROM j GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang, matched FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist ASC, lang ASC) = 1
)
SELECT d.doc_id,
       CASE WHEN b.matched > 0 THEN b.lang ELSE 'und' END AS pred_lang
FROM documents d LEFT JOIN best b USING (doc_id)
"""


_LANG_ID_SQL = _lang_id_sql()


def _token_bpe_sql(merges=None) -> str:
    """REAL BPE token count, generated from the SAME merges table the
    engine applies (functions/bpe.py): identical brace-wrapped symbol
    rendering and identical replace chain, so the counts agree exactly.
    Pass `merges` to build the chain for a different (e.g.
    corpus-learned) vocabulary."""
    from go_matrixprofile_spark.functions.bpe import MERGES

    if merges is None:
        merges = MERGES
    s = (
        "array_to_string(list_transform("
        "list_filter(ws, w -> regexp_matches(w, '^[a-z]+$')), "
        r"w -> regexp_replace(w, '(.)', '{\1}', 'g')), '|')"
    )
    for x, y in merges:
        s = f"replace({s}, '{{{x}}}{{{y}}}', '{{{x}{y}}}')"
    return rf"""
WITH words AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS ws
  FROM documents
),
m AS (
  SELECT doc_id, text,
         len(ws) AS n_pre,
         len(list_filter(ws, w -> regexp_matches(w, '^[a-z]+$'))) AS n_alpha,
         {s} AS s
  FROM words
)
SELECT doc_id,
       len(regexp_split_to_array(text, '\s+')) AS n_ws_tokens,
       CAST(n_pre AS INT) AS n_pretokens,
       CAST(n_pre - n_alpha + (length(s) - length(replace(s, '{{', ''))) AS INT)
         AS n_bpe_tokens
FROM m
"""


_TOKEN_BPE_SQL = _token_bpe_sql()


def _tokenize_bpe_sql() -> str:
    """Token-ARRAY twin of _token_bpe_sql: the identical replace chain
    applied per word inside a DuckDB list lambda, merged symbols split
    back out of the brace string, non-alpha pre-tokens passing through
    in position; parallel unnest zips (pos, token)."""
    from go_matrixprofile_spark.functions.bpe import MERGES

    chain = r"regexp_replace(w, '(.)', '{\1}', 'g')"
    for x, y in MERGES:
        chain = f"replace({chain}, '{{{x}}}{{{y}}}', '{{{x}{y}}}')"
    return rf"""
WITH words AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id,
    flatten(list_transform(ws, w -> CASE WHEN regexp_matches(w, '^[a-z]+$')
      THEN list_transform(str_split({chain}, '}}{{'),
                          t -> replace(replace(t, '{{', ''), '}}', ''))
      ELSE [w] END)) AS toks
  FROM words
)
SELECT doc_id,
       CAST(unnest(generate_series(1, len(toks))) AS INT) - 1 AS pos,
       unnest(toks) AS token
FROM tok
"""

_TOKEN_BPE_CORPUS_SQL_CACHE: dict[str, str] = {}


def _token_bpe_corpus_sql() -> str:
    """Replace chain for the CORPUS-LEARNED vocabulary: the reference
    (pure-Python) trainer functions/bpe.train_bpe runs over the same
    documents table the driver checks against (sf0.01 by contract;
    override with SPARK_GRAFT_ORACLE_SF_DIR), using the engine's exact
    pre-tokenization. The Spark query learns its merges DISTRIBUTED
    (operators/bpe_train.train_bpe_distributed, pytest-pinned ≡ this
    trainer), so the two chains are the same table derived by two
    independent implementations — a genuine cross-engine check of both
    the training and the application."""
    import os
    import re

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if sf_dir in _TOKEN_BPE_CORPUS_SQL_CACHE:
        return _TOKEN_BPE_CORPUS_SQL_CACHE[sf_dir]
    import duckdb

    from go_matrixprofile_spark.functions.bpe import train_bpe

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    con.close()
    # the engine's exact pre-tokenization (operators/text._WORDISH over
    # lowercased text, alpha pre-tokens only) — a whitespace split
    # would miss punctuation-adjacent words the chain does merge
    words: list[str] = []
    for t in texts:
        words += [
            w
            for w in re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", t.lower())
            if re.fullmatch(r"[a-z]+", w)
        ]
    merges = train_bpe(" ".join(words), 48)
    sql = _token_bpe_sql(merges)
    _TOKEN_BPE_CORPUS_SQL_CACHE[sf_dir] = sql
    return sql

# embeddings exploded to (vec_id, i, x) rows — the portable base for all
# embedding SQL (DuckDB's table-valued generate_series can't take lateral
# column args, but unnest of the list form in a projection can)
_DIMS = """
dims AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
),
norms AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM dims GROUP BY 1)
"""


_KNN_SQL = f"""
WITH {_DIMS},
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, SUM(a.x * b.x) AS dot
  FROM dims a JOIN dims b ON a.i = b.i AND a.vec_id < 8 AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, nid, ROUND(dot / (na.nrm * nb.nrm), 4) AS score
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid
),
ranked AS (
  SELECT qid, nid, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rank
  FROM scored
)
SELECT qid, CAST(rank AS INT) AS rank, nid, score FROM ranked WHERE rank <= 5
"""

def _lsh_band_sigs_cte(n_tables: int, band_size: int) -> str:
    """Banded multi-table signature CTE (needs _DIMS in scope): table
    t = p // band_size, bucket = the band's sign bits — matching
    operators/simsearch.lsh_band_buckets."""
    n_planes = n_tables * band_size
    return f"""
plane_dots AS (
  SELECT d.vec_id, p.p,
         SUM(d.x * ((('0x' || substr(md5(p.p || '_' || (d.i - 1)), 1, 2))::INT % 2) * 2 - 1)) AS dot
  FROM dims d, (SELECT unnest(generate_series(0, {n_planes - 1})) AS p) p
  GROUP BY 1, 2
),
bsigs AS (
  SELECT vec_id, CAST(p // {band_size} AS INT) AS tbl,
         CAST(SUM(CASE WHEN dot > 0 THEN CAST(POWER(2, p % {band_size}) AS BIGINT) ELSE 0 END) AS INT) AS bucket
  FROM plane_dots GROUP BY 1, 2
)
"""


_KNN_LSH_SQL = f"""
WITH {_DIMS},
{_lsh_band_sigs_cte(4, 4)},
cand AS (
  SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
  FROM bsigs a JOIN bsigs b
    ON a.tbl = b.tbl AND a.bucket = b.bucket
   AND a.vec_id < 8 AND a.vec_id <> b.vec_id
),
dots AS (
  SELECT c.qid, c.nid, SUM(da.x * db.x) AS dot
  FROM cand c
  JOIN dims da ON da.vec_id = c.qid
  JOIN dims db ON db.vec_id = c.nid AND db.i = da.i
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, nid, ROUND(dot / (na.nrm * nb.nrm), 4) AS score
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid
),
ranked AS (
  SELECT qid, nid, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rank
  FROM scored
)
SELECT qid, CAST(rank AS INT) AS rank, nid, score FROM ranked WHERE rank <= 5
"""

_KNN_IVF_SQL = f"""
WITH {_DIMS},
cdots AS (
  SELECT d.vec_id, c.vec_id AS centroid_id, SUM(d.x * c.x) AS dot
  FROM dims d JOIN dims c ON c.i = d.i AND c.vec_id < 16
  GROUP BY 1, 2
),
csims AS (
  SELECT v.vec_id, v.centroid_id,
         ROUND(v.dot / (na.nrm * nb.nrm), 6) AS sim
  FROM cdots v
  JOIN norms na ON na.vec_id = v.vec_id
  JOIN norms nb ON nb.vec_id = v.centroid_id
),
assigns AS (
  SELECT vec_id, centroid_id FROM csims
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC) = 1
),
probes AS (
  SELECT vec_id AS qid, centroid_id FROM csims WHERE vec_id < 8
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC) <= 4
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM probes p JOIN assigns a
    ON a.centroid_id = p.centroid_id AND a.vec_id <> p.qid
),
dots AS (
  SELECT c.qid, c.nid, SUM(da.x * db.x) AS dot
  FROM cand c
  JOIN dims da ON da.vec_id = c.qid
  JOIN dims db ON db.vec_id = c.nid AND db.i = da.i
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, nid, ROUND(dot / (na.nrm * nb.nrm), 4) AS score
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid
),
ranked AS (
  SELECT qid, nid, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rank
  FROM scored
)
SELECT qid, CAST(rank AS INT) AS rank, nid, score FROM ranked WHERE rank <= 5
"""

_NEAR_DUP_SQL = f"""
WITH {_DIMS},
{_lsh_band_sigs_cte(4, 4)},
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bsigs a JOIN bsigs b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.a_id, c.b_id, SUM(da.x * db.x) AS dot
  FROM cand c
  JOIN dims da ON da.vec_id = c.a_id
  JOIN dims db ON db.vec_id = c.b_id AND db.i = da.i
  GROUP BY 1, 2
)
SELECT a_id, b_id, ROUND(dot / (na.nrm * nb.nrm), 4) AS cosine
FROM dots JOIN norms na ON na.vec_id = a_id JOIN norms nb ON nb.vec_id = b_id
WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.3
"""
