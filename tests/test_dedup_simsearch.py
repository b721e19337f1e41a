"""Dedup + similarity-search operator tests: banded LSH recall, bucket
caps, and hot-shingle-safe exact Jaccard."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embeddings(spark):
    """Deterministic corpus: 60 base vectors (md5-derived components)
    plus 5 planted near-duplicates of vector 0 (tiny perturbations)."""
    import hashlib

    import numpy as np

    dim = 16
    rows = []
    for vid in range(60):
        v = np.array(
            [
                int(hashlib.md5(f"{vid}_{d}".encode()).hexdigest()[:8], 16) % 1000 / 500.0
                - 1.0
                for d in range(dim)
            ]
        )
        rows.append((vid, [float(x) for x in v]))
    base = np.array(rows[0][1])
    for j in range(5):
        pert = base + (np.arange(dim) % 3 - 1) * 0.001 * (j + 1)
        rows.append((100 + j, [float(x) for x in pert]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )


class TestBandedLSH:
    def test_near_dups_found_and_exact(self, spark, embeddings):
        from go_matrixprofile_spark.operators.simsearch import cosine_near_dup_pairs

        got = cosine_near_dup_pairs(
            embeddings, threshold=0.999, n_tables=4, band_size=4
        ).toPandas()
        # every planted duplicate pair (0, 100+j) and (100+i, 100+j) is
        # nearly identical -> must share at least one band bucket
        ids = {0, 100, 101, 102, 103, 104}
        found = {(r.a_id, r.b_id) for r in got.itertuples()}
        for a in sorted(ids):
            for b in sorted(ids):
                if a < b:
                    assert (a, b) in found, f"missing planted pair {(a, b)}"
        assert (got["cosine"] >= 0.999).all()

    def test_bucket_cap_bounds_blocks(self, spark, embeddings):
        from go_matrixprofile_spark.operators.simsearch import (
            _cap_buckets,
            lsh_band_buckets,
        )

        bk = lsh_band_buckets(embeddings, n_tables=2, band_size=2)
        capped = _cap_buckets(bk, max_bucket=10)
        sizes = (
            capped.groupBy("tbl", "bucket").count().agg(F.max("count")).collect()[0][0]
        )
        assert sizes is None or sizes <= 10  # None = every bucket was over-full
        # with 65 vectors and 4 buckets/table, uncapped max must exceed 10
        raw_max = bk.groupBy("tbl", "bucket").count().agg(F.max("count")).collect()[0][0]
        assert raw_max > 10

    def test_knn_lsh_subset_of_brute(self, spark, embeddings):
        from go_matrixprofile_spark.operators.simsearch import (
            knn_brute_cosine,
            knn_lsh_cosine,
        )

        brute = knn_brute_cosine(embeddings, n_queries=2, k=3).toPandas()
        ann = knn_lsh_cosine(
            embeddings, n_queries=2, k=3, n_tables=4, band_size=4
        ).toPandas()
        # ANN scores can't beat brute-force at the same rank
        for qid in (0, 1):
            b = brute[brute.qid == qid].sort_values("rank")["score"].to_numpy()
            a = ann[ann.qid == qid].sort_values("rank")["score"].to_numpy()
            assert len(a) <= len(b)
            for i, s in enumerate(a):
                assert s <= b[i] + 1e-9


class TestJaccardCandidates:
    def test_hot_shingle_capped_but_jaccard_exact(self, spark):
        from go_matrixprofile_spark.operators.dedup import ngram_jaccard_pairs

        # doc 0/1 near-identical (share rare shingles); docs 2-9 share
        # ONLY one hot 8-gram ("common!!") which max_df=5 excludes from
        # candidate generation
        hot = "common!!"
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
        ] + [(i, f"{hot} " + str(i) * 15) for i in range(2, 10)]
        docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        got = ngram_jaccard_pairs(docs, k=8, threshold=0.1, max_df=5).toPandas()
        pairs = {(r.a_id, r.b_id) for r in got.itertuples()}
        assert (0, 1) in pairs
        # hot-only pairs are not candidates
        for a, b in pairs:
            assert not (a >= 2 and b >= 2)
        # the reported jaccard is exact over ALL shingles (including any
        # hot ones), verified against a pandas computation
        def shingle_set(t):
            return {t[i : i + 8] for i in range(max(len(t) - 7, 1)) if t[i : i + 8]}

        s0, s1 = shingle_set(rows[0][1]), shingle_set(rows[1][1])
        want = round(len(s0 & s1) / len(s0 | s1), 4)
        got01 = got[(got.a_id == 0) & (got.b_id == 1)]["jaccard"].iloc[0]
        assert abs(got01 - want) < 1e-9
