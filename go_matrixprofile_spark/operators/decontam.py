"""Benchmark decontamination: flag training documents that overlap an
evaluation set.

The standard training-data hygiene stage (Brown et al. 2020, GPT-3
appendix C; PaLM/Llama reports use the same shape): a document is
contaminated when it shares at least one word n-gram (n=13 is the
customary size) with any benchmark document. Dedup removes documents
similar to EACH OTHER; decontamination removes documents similar to a
REFERENCE set — same machinery, different join target, and a filter no
serious pretraining corpus ships without.

Plan shape at 100 TB: the benchmark side is distinct n-grams of the
eval set — millions of rows at most, broadcast by default so the
corpus-side explode streams map-side against the hash set with NO
shuffle of corpus data. Per-doc hit counts aggregate on doc_id (the
natural document key, no hot key). With a huge reference set pass
``broadcast_benchmark=False`` and the join shuffles on the gram key
like any dedup candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_ngrams(
    df: DataFrame, id_col: str, n: int, keep_empty: bool = False
) -> DataFrame:
    """(id, gram): space-joined word n-grams of normalized text
    (lowercase, non-alphanumeric → space — so punctuation/formatting
    differences between corpus and benchmark don't hide overlap).
    keep_empty emits one NULL-gram row for docs too short for any
    n-gram, so a downstream per-doc aggregation covers EVERY doc
    without a corpus-sized join back."""
    norm = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")),
        " ",
    )
    ln = F.greatest(F.size(norm) - (n - 1), F.lit(0))
    grams = F.when(ln > 0, F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.array_join(F.slice(norm, i, n), " "),
    )).otherwise(F.array())
    exp = F.explode_outer(grams) if keep_empty else F.explode(grams)
    return df.select(F.col(id_col), exp.alias("gram"))


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination verdict against a benchmark table.

    documents: (doc_id, text); benchmark: (bench_id, text) — any extra
    columns pass through untouched on neither side. Returns one row per
    document: (doc_id, n_grams, n_hits, contaminated) where n_grams is
    the document's word-``n``-gram count, n_hits how many of its gram
    OCCURRENCES appear anywhere in the benchmark, and contaminated =
    n_hits > 0. Filter ``WHERE NOT contaminated`` for the clean corpus;
    keep n_hits for audit thresholds (some pipelines drop only above a
    hit fraction).
    """
    bench_grams = _word_ngrams(benchmark, "bench_id", n).select("gram").distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    # explode_outer keeps a NULL-gram row for too-short docs, so the
    # doc_id aggregation alone covers every document — no corpus-sized
    # join back onto `documents`
    doc_grams = _word_ngrams(documents, "doc_id", n, keep_empty=True)
    return (
        doc_grams.join(bench_grams.withColumn("_hit", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )
