"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. The query side is small and
  broadcast; the corpus side streams — one wide scan, no shuffle of the
  corpus. Dot products run JVM-side via zip_with + aggregate.
- LSH (random hyperplane) bucketing: the scale path — each vector maps
  to a sign-bit signature; candidates share a bucket, so the quadratic
  pair space shrinks to per-bucket blocks. Hyperplane components are
  deterministic md5-derived ±1 values so Spark and the SQL oracle agree
  bit-for-bit.
- embedding cosine near-dup: pairs above a cosine threshold within LSH
  buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cosine(a, b):
    # cast BEFORE multiplying: float32 products would drift vs the
    # double-precision oracle
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def knn_brute_cosine(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first n_queries vectors.

    Ties break deterministically by (score desc, neighbor id asc) on the
    ROUNDED score so ordering is stable across engines.
    """
    from pyspark.sql.window import Window

    q = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 4).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "score")
    )


def lsh_signatures(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane sign signature per vector.

    Plane p's component for dimension d is md5-derived ±1 — the same
    construction is written in the oracle SQL, so signatures are
    engine-portable without shipping plane matrices.
    """
    e = F.col("embedding")
    sig = None
    for p in range(n_planes):
        # ±1 from the low hex digit of md5("<p>_<d>")
        comp = F.transform(
            F.sequence(F.lit(0), F.size(e) - 1),
            lambda d: (
                F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(p), d)), 1, 2), 16, 10)
                .cast("int")
                % 2
                * 2
                - 1
            ).cast("double"),
        )
        dot = F.aggregate(
            F.zip_with(e, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * (2**p)
        sig = bit if sig is None else sig + bit
    return embeddings.select("vec_id", sig.cast("int").alias("bucket"))


def knn_lsh_cosine(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5, n_planes: int = 6
) -> DataFrame:
    """ANN: brute-force only within the query's LSH bucket."""
    from pyspark.sql.window import Window

    sigs = lsh_signatures(embeddings, n_planes)
    with_sig = embeddings.join(sigs, "vec_id")
    q = with_sig.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("bucket").alias("qb")
    )
    c = with_sig.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"), F.col("bucket").alias("nb")
    )
    scored = (
        F.broadcast(q)
        .join(c, (F.col("qb") == F.col("nb")) & (F.col("qid") != F.col("nid")))
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 4).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "score")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, n_planes: int = 6
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold, candidate
    space limited to same-LSH-bucket pairs."""
    sigs = lsh_signatures(embeddings, n_planes)
    with_sig = embeddings.join(sigs, "vec_id")
    a = with_sig.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("ae"), F.col("bucket").alias("ab")
    )
    b = with_sig.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("be"), F.col("bucket").alias("bb")
    )
    return (
        a.join(b, (F.col("ab") == F.col("bb")) & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id", F.round(_cosine(F.col("ae"), F.col("be")), 4).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
