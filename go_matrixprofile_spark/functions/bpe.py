"""Deterministic byte-pair-encoding merges + reference tokenizer.

The merges table is LEARNED at import from the embedded seed corpus by
the standard BPE procedure (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units"): repeatedly
count adjacent symbol pairs over the word vocabulary and fuse the most
frequent (ties broken by lexicographically smallest pair, so the table
is bit-deterministic). Training is a few milliseconds over the ~40
embedded sentences; the table is explicit, inspectable and
engine-portable — exactly the "merges.txt" artifact a real tokenizer
ships.

Applying the merges needs NO per-row Python in Spark: a word is
rendered as brace-wrapped symbols ("low" → "{l}{o}{w}") and each merge
(x, y) → xy becomes one literal string replacement
"{x}{y}" → "{xy}", applied in rank order. Left-to-right non-overlapping
replacement (the semantics of both Spark's `replace` and DuckDB's
`replace`) merges occurrences exactly like the reference tokenizer's
leftmost-first scan, and a pair involving a compound symbol always has
a higher rank than the merge that created it, so one pass per rank in
rank order reproduces iterative lowest-rank-first merging. Words join
with '|', which can never complete a "{x}{y}" pattern across a word
boundary. Only lowercase-alphabetic pre-tokens are merged (so the
brace markers can never collide with symbol text); numeric and
punctuation pre-tokens count as one token each.
"""

from __future__ import annotations

from collections import Counter

# Original sentences (written for this fixture): plain English prose
# with enough repetition of common character sequences for BPE to find
# the classic subwords (th, the, in, er, and, ing, ...).
SEED_CORPUS = """
the quick brown fox jumps over the lazy dog while the other dogs watch
she is running and jumping in the garden with the children this morning
the engineers are testing the new system and checking the results again
there will be another meeting in the afternoon about the training data
the weather in the mountains is colder than the weather near the coast
reading and writing are the things that the students practice every day
the answer to the question depends on the meaning of the other words
they are building another bridge over the river near the old station
the workers finished painting the walls and cleaning the floors today
a thinking machine should understand the meaning behind the sentences
the findings suggest that the larger models are learning faster now
the children were singing and dancing during the evening celebration
nothing in the report explains the difference between the two systems
the farmers are planting the seeds and watering the fields in spring
the interesting thing about the ocean is the endless sound of waves
understanding the underlying patterns requires looking at the details
"""


def train_bpe(corpus: str, n_merges: int = 48) -> list[tuple[str, str]]:
    """Learn an ordered merges table from whitespace-tokenized text."""
    vocab = Counter()
    for word in corpus.split():
        if word.isalpha():
            vocab[tuple(word.lower())] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        # most frequent; ties -> lexicographically smallest (determinism)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        fused = best[0] + best[1]
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


MERGES: list[tuple[str, str]] = train_bpe(SEED_CORPUS, 48)


def apply_bpe(word: str, merges: list[tuple[str, str]] | None = None) -> list[str]:
    """Reference (pure-Python) BPE application: lowest-rank pair first,
    leftmost occurrence first — the ground truth the Spark/DuckDB
    replace-chain must reproduce."""
    merges = MERGES if merges is None else merges
    rank = {pair: r for r, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best_r, best_i = None, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def count_tokens(text: str, merges: list[tuple[str, str]] | None = None) -> int:
    """Reference token count over the engine's pre-tokenization:
    alphabetic pre-tokens are BPE-merged, everything else is 1 token."""
    import re

    n = 0
    for tok in re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", text.lower()):
        # only ASCII-alphabetic pre-tokens are merged (matching the
        # engine's ^[a-z]+$ filter); digits/punct/other count as 1
        n += len(apply_bpe(tok, merges)) if re.fullmatch(r"[a-z]+", tok) else 1
    return n
