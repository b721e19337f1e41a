"""Benchmark-decontamination tests (word-13-gram overlap flagging)."""

import numpy as np
import pandas as pd


class TestDecontaminate:
    def test_planted_overlap_flagged(self, spark):
        from go_matrixprofile_spark.operators.decontam import decontaminate

        rng = np.random.default_rng(53)
        vocab = [f"word{i}" for i in range(200)]
        bench_texts = [
            " ".join(rng.choice(vocab, size=30)) for _ in range(5)
        ]
        clean = [" ".join(rng.choice(vocab, size=40)) for _ in range(6)]
        # doc 6: a verbatim 15-word span from benchmark 0 (punctuation
        # and case noise must not hide it); doc 7: only a 12-word span
        # (below n=13 -> NOT contaminated)
        b0 = bench_texts[0].split()
        dirty = " ".join(rng.choice(vocab, size=10)) + " " + " ".join(b0[:15]).upper() + "!"
        near = " ".join(rng.choice(vocab, size=10)) + " " + " ".join(b0[:12])
        texts = clean + [dirty, near]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        bench = spark.createDataFrame(
            pd.DataFrame({"bench_id": range(len(bench_texts)), "text": bench_texts})
        )
        got = decontaminate(docs, bench, n=13).orderBy("doc_id").toPandas()
        assert bool(got["contaminated"].iloc[6])
        assert got["n_hits"].iloc[6] == 3  # 15-word span -> 3 shared 13-grams
        assert not bool(got["contaminated"].iloc[7])
        # random 40-word docs over a 200-word vocab can't reproduce a
        # specific benchmark 13-gram
        assert not got["contaminated"].iloc[:6].any()
        # every doc exactly once, gram counts = max(words-12, 0)
        assert list(got["doc_id"]) == list(range(len(texts)))
        for i, t in enumerate(texts):
            w = len([x for x in t.split() if x])
            assert got["n_grams"].iloc[i] == max(w - 12, 0), i

    def test_matches_duckdb(self, spark):
        """Cross-engine: the same verdicts from an independent DuckDB
        SQL implementation over identical frames."""
        import duckdb

        from go_matrixprofile_spark.operators.decontam import decontaminate

        rng = np.random.default_rng(59)
        vocab = [f"w{i}" for i in range(50)]
        texts = [" ".join(rng.choice(vocab, size=int(s))) for s in rng.integers(5, 60, 30)]
        bench_texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(4)]
        # plant one overlap
        texts[11] = texts[11] + " " + bench_texts[2]
        docs_pd = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        bench_pd = pd.DataFrame({"bench_id": range(len(bench_texts)), "text": bench_texts})
        got = (
            decontaminate(
                spark.createDataFrame(docs_pd),
                spark.createDataFrame(bench_pd),
                n=13,
            )
            .orderBy("doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("docs", docs_pd)
        con.register("bench", bench_pd)
        want = con.execute(
            r"""
            WITH dg AS (
              SELECT doc_id, array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+12], ' ') AS gram
              FROM (
                SELECT doc_id,
                       regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
                FROM docs
              ), unnest(generate_series(1, greatest(len(ws) - 12, 0))) t(i)
            ),
            bg AS (
              SELECT DISTINCT array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+12], ' ') AS gram
              FROM (
                SELECT regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
                FROM bench
              ), unnest(generate_series(1, greatest(len(ws) - 12, 0))) t(i)
            ),
            hits AS (
              SELECT dg.doc_id, COUNT(*) AS n_grams,
                     SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
              FROM dg LEFT JOIN bg USING (gram) GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   COALESCE(h.n_hits, 0) > 0 AS contaminated
            FROM docs d LEFT JOIN hits h USING (doc_id)
            ORDER BY d.doc_id
            """
        ).df()
        con.close()
        assert got["contaminated"].iloc[11]
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.reset_index(drop=True),
            check_dtype=False,
        )
