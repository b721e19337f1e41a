"""Training-corpus materialization: the composed end stage of the
document pipeline.

A training-data pipeline's final document query is always the same
shape: keep the canonical survivor of every near-dup group, drop
low-quality and degenerate-repetition documents, and carry the real
token count for budget accounting. ``build_corpus`` composes the
engine's oracle-checked operators into exactly that:

    dedup_groups (keep)            — fuzzy-dup survivors only
    ∧ text_quality.quality ≥ q     — length/stopword/punct gate
    ∧ repetition ≤ r (or N/A)      — Gopher dup-3gram gate
    → (doc_id, n_bpe_tokens, quality)

Every component is an independent single-purpose operator; this module
adds NO new semantics, only the join plan — each gate is one hash join
on doc_id (the natural partitioning all document operators share), so
the composition adds no shuffle beyond its inputs' own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_corpus(
    documents: DataFrame,
    min_quality: float = 0.3,
    max_dup_3gram: float = 0.5,
) -> DataFrame:
    """(doc_id, n_bpe_tokens, quality) for every document that survives
    dedup + quality + repetition gating — ``SUM(n_bpe_tokens)`` over
    this is the training token budget."""
    from .dedup import dedup_groups
    from .text import repetition_stats, text_quality, token_counts_bpe

    keepers = dedup_groups(documents).where("keep").select("doc_id")
    quality = text_quality(documents).select("doc_id", "quality")
    rep = repetition_stats(documents).select("doc_id", "dup_3gram_frac")
    tokens = token_counts_bpe(documents).select("doc_id", "n_bpe_tokens")
    return (
        keepers.join(quality, "doc_id")
        .where(F.col("quality") >= min_quality)
        .join(rep, "doc_id")
        .where(
            F.col("dup_3gram_frac").isNull()
            | (F.col("dup_3gram_frac") <= max_dup_3gram)
        )
        .join(tokens, "doc_id")
        .select("doc_id", "n_bpe_tokens", "quality")
    )
