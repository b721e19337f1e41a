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

import hashlib

from pyspark.sql import DataFrame, functions as F

from .spread import spread_input


def _plane_components(p: int, dim: int) -> list[float]:
    """Plane p's ±1 components for dimensions 0..dim-1, evaluated in
    Python at PLAN-BUILD time. Bit-identical to the in-plan expression
    conv(substring(md5(concat_ws('_', p, d)), 1, 2), 16, 10) % 2 * 2 - 1
    the SQL oracle uses (same md5 over the same 'p_d' string), but
    computed once per plan instead of dim×planes md5 calls PER ROW —
    the former per-row construction spent more time rebuilding the
    constant plane matrix than taking the dot products."""
    return [
        float((int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:2], 16) % 2) * 2 - 1)
        for d in range(dim)
    ]


def _embedding_dim(embeddings: DataFrame) -> int:
    """Dimension of the embedding column: one single-row scalar fetch
    at plan-build time (the embeddings contract is fixed-dim). Empty
    input returns 1 — every downstream plan is empty anyway."""
    row = embeddings.select(F.size("embedding").alias("d")).first()
    return 1 if row is None or row["d"] is None else int(row["d"])


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
    # spread the streamed corpus side: the per-pair cosine below is the
    # expensive part and an unsplittable source would run it in 1 task
    c = spread_input(embeddings).select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne")
    )
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
    engine-portable without shipping plane matrices. The plane matrix
    is constant, so it is evaluated ONCE in Python at plan-build time
    and embedded as literal arrays (_plane_components) instead of
    re-deriving dim×n_planes md5 values per row; the input is spread
    to cluster parallelism first (no-op for well-split sources).
    """
    dim = _embedding_dim(embeddings)
    e = F.col("embedding")
    sig = None
    for p in range(n_planes):
        comp = F.lit(_plane_components(p, dim))
        dot = F.aggregate(
            F.zip_with(e, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * (2**p)
        sig = bit if sig is None else sig + bit
    return spread_input(embeddings).select("vec_id", sig.cast("int").alias("bucket"))


def lsh_band_buckets(
    embeddings: DataFrame, n_tables: int = 4, band_size: int = 4
) -> DataFrame:
    """Banded multi-table LSH buckets: (vec_id, tbl, bucket).

    Table t owns planes [t*band_size, (t+1)*band_size); its bucket is
    the band's sign-bit signature. Multi-table = recall (a near pair
    only needs to agree on ONE full band); band_size = block size
    control (2^band_size buckets per table). Global plane index p uses
    the same md5("p_d") ±1 construction as lsh_signatures, so the SQL
    oracle shares one plane definition.

    At corpus scale this replaces single-table bucketing whose
    2^n_planes buckets produce quadratic per-bucket blocks; here each
    table's bucket count and each bucket's size are independently
    tunable, and `_cap_buckets` bounds the worst block.
    """
    e = F.col("embedding")
    # constant plane matrix as literal arrays (see _plane_components):
    # one Python evaluation per plan instead of dim×planes md5s per row
    dim = _embedding_dim(embeddings)
    tables = []
    for t in range(n_tables):
        sig = None
        for j in range(band_size):
            comp = F.lit(_plane_components(t * band_size + j, dim))
            dot = F.aggregate(
                F.zip_with(e, comp, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * (2**j)
            sig = bit if sig is None else sig + bit
        tables.append(F.struct(F.lit(t).alias("tbl"), sig.cast("int").alias("bucket")))
    return spread_input(embeddings).select(
        "vec_id", F.explode(F.array(*tables)).alias("e")
    ).select("vec_id", "e.tbl", "e.bucket")


def _cap_buckets(buckets: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop over-full (tbl, bucket) blocks: a degenerate bucket (all-zero
    vectors, constant embeddings) would otherwise reintroduce the
    quadratic pair blowup the bucketing exists to prevent. Dropped
    buckets lose candidates by design — the multi-table layout gives
    those pairs other chances."""
    if max_bucket is None:
        return buckets
    # bucket sizes via groupBy + join (map-side-combinable partial
    # counts), NOT a frameless window that would route every row of a
    # degenerate bucket through one task before the filter discards them
    small = (
        buckets.groupBy("tbl", "bucket")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") <= max_bucket)
        .select("tbl", "bucket")
    )
    return buckets.join(small, ["tbl", "bucket"])


def knn_lsh_cosine(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_tables: int = 4,
    band_size: int = 4,
    max_bucket: int | None = 100000,
) -> DataFrame:
    """ANN: exact cosine restricted to vectors sharing any LSH band
    bucket with the query (multi-table union improves recall)."""
    from pyspark.sql.window import Window

    bk = _cap_buckets(lsh_band_buckets(embeddings, n_tables, band_size), max_bucket)
    qb = bk.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), "tbl", "bucket"
    )
    cand = (
        F.broadcast(qb)
        .join(bk.select(F.col("vec_id").alias("nid"), "tbl", "bucket"), ["tbl", "bucket"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    q = embeddings.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = spread_input(embeddings).select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne")
    )
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(c, "nid")
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 4).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "score")
    )


def _lloyd_mean_update(
    elems: DataFrame, keys: list[str], prev: DataFrame,
    centroid_round: int | None,
) -> DataFrame:
    """One Lloyd mean step shared by the IVF and PQ refiners: per-key
    element-wise mean of assigned member positions (optionally
    quantized for cross-engine reproducibility), empty cells keep the
    previous centroid, lineage truncated per iteration.

    elems: (*keys, pos, v) exploded member positions; prev: the
    (*keys, ce) table being refined."""
    mean_v = F.avg(F.col("v").cast("double"))
    if centroid_round is not None:
        mean_v = F.round(mean_v, centroid_round)
    means = elems.groupBy(*keys, "pos").agg(mean_v.alias("mv"))
    new_ce = means.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s["mv"],
        ).alias("nce")
    )
    return (
        prev.join(new_ce, keys, "left")
        .select(*keys, F.coalesce("nce", "ce").alias("ce"))
        .localCheckpoint(eager=True)  # truncate per-iteration lineage
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
    refine: int = 0,
    centroid_round: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic centroids + nearest-centroid
    assignment.

    Seed centroids are the first n_centroids vectors by vec_id — a
    deterministic, engine-portable choice. ``refine`` > 0 runs that
    many Lloyd (spherical k-means) iterations on top: argmax-cosine
    assign, recompute each cell's centroid as the element-wise mean of
    its members (posexplode → per-position avg, optionally quantized
    via ``centroid_round`` for cross-engine reproducibility — the same
    discipline as ``pq_codes``), empty cells keep their previous
    centroid. Every step is the same broadcast + partial-agg plan —
    no driver-side data; per-iteration localCheckpoint bounds lineage.

    Returns (centroids, assignments) where assignments = (vec_id,
    centroid_id): one broadcast join + per-row argmax over n_centroids
    cosines, all JVM built-ins.

    centroids: a precomputed (centroid_id, ce) table — e.g. from
    ``load_ann_index`` — to assign against a SAVED quantizer instead
    of re-deriving one (train once, serve forever); ``refine`` is
    ignored when given.
    """
    from pyspark.sql.window import Window

    # spread an under-split source once: the per-row n_centroids-cosine
    # argmax below otherwise runs in one task for a single-split input
    embeddings = spread_input(embeddings)

    def assign_to(cents_df: DataFrame) -> DataFrame:
        # dim guard: wrong-dimension centroids (e.g. a stale artifact)
        # would null-pad every cosine into NULL and rank garbage
        sim = F.when(
            F.size("embedding") == F.size("ce"),
            F.round(_cosine(F.col("embedding"), F.col("ce")), 6),
        ).otherwise(
            F.assert_true(
                F.lit(False),
                "centroid dimension != embedding dimension "
                "(artifact from a different embedding space?)",
            ).cast("double")
        )
        scored = embeddings.crossJoin(F.broadcast(cents_df)).select(
            "vec_id", "centroid_id", sim.alias("sim")
        )
        w_ = Window.partitionBy("vec_id").orderBy(
            F.col("sim").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w_))
            .where("rn = 1")
            .select("vec_id", "centroid_id")
        )

    if centroids is not None:
        return centroids, assign_to(centroids)
    cents = embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    for _ in range(refine):
        members = embeddings.join(assign_to(cents), "vec_id").select(
            "centroid_id", F.posexplode("embedding").alias("pos", "v")
        )
        cents = _lloyd_mean_update(members, ["centroid_id"], cents, centroid_round)
    return cents, assign_to(cents)


def knn_ivf_cosine(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    refine: int = 0,
    centroid_round: int | None = None,
) -> DataFrame:
    """IVF ANN: exact cosine restricted to the query's n_probe nearest
    centroid cells. The scale path for embedding search when hyperplane
    LSH recall is insufficient: cell sizes are ~N/n_centroids, probes
    bound the scanned fraction to n_probe/n_centroids."""
    from pyspark.sql.window import Window

    cents, assigns = ivf_assign(
        embeddings, n_centroids, centroids=centroids,
        refine=refine, centroid_round=centroid_round,
    )
    q_emb = embeddings.where(F.col("vec_id") < n_queries)
    # query → its n_probe closest centroids
    probed = q_emb.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").alias("qid"),
        "centroid_id",
        F.round(_cosine(F.col("embedding"), F.col("ce")), 6).alias("sim"),
    )
    wp = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        probed.withColumn("rn", F.row_number().over(wp))
        .where(f"rn <= {n_probe}")
        .select("qid", "centroid_id")
    )
    cand = (
        F.broadcast(probes)
        .join(assigns.select(F.col("vec_id").alias("nid"), "centroid_id"), "centroid_id")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    q = embeddings.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = spread_input(embeddings).select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne")
    )
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(c, "nid")
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 4).alias("score"))
    )
    w_ = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w_))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "score")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 4,
    band_size: int = 4,
    max_bucket: int | None = 100000,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold; candidate
    space = pairs sharing any (tbl, bucket), per-bucket size capped."""
    bk = _cap_buckets(lsh_band_buckets(embeddings, n_tables, band_size), max_bucket)
    a = bk.select(F.col("vec_id").alias("a_id"), "tbl", "bucket")
    b = bk.select(F.col("vec_id").alias("b_id"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    ea = embeddings.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ae"))
    eb = embeddings.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("be"))
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .select("a_id", "b_id", F.round(_cosine(F.col("ae"), F.col("be")), 4).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _l2sq(a, b):
    # cast BEFORE subtracting: float32 arithmetic would drift vs the
    # double-precision oracle
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_assign(sv: DataFrame, cb: DataFrame) -> DataFrame:
    """L2-nearest codebook entry per (vec, subvector): distances
    quantized (ROUND 6) before the argmin with lowest-code tie-break so
    the choice hashes identically across engines."""
    from pyspark.sql.window import Window

    scored = sv.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "sub",
        "code",
        F.round(_l2sq(F.col("xe"), F.col("ce")), 6).alias("d2"),
    )
    w_ = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("d2").asc(), F.col("code").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_))
        .where("rn = 1")
        .select("vec_id", "sub", "code")
    )


def pq_codes(
    embeddings: DataFrame,
    m_sub: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    refine: int = 0,
    centroid_round: int | None = None,
    codebooks: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization codebooks + codes (deterministic).

    The vector splits into m_sub subvectors of dim/m_sub dims; the
    per-subvector SEED codebook is the matching slice of the first
    k_codes vectors by vec_id — deterministic and engine-portable, same
    policy as ivf_assign. ``refine`` > 0 runs that many Lloyd (k-means)
    iterations on top: assign codes, recompute each (sub, code)
    centroid as the element-wise mean of its assigned subvectors
    (posexplode → per-position avg → re-assemble), empty clusters keep
    their previous centroid. The refinement is deterministic (means of
    a deterministic assignment) and every step is the same broadcast +
    partial-agg plan shape — no driver-side data.

    Returns (codebooks, codes): codebooks = (sub, code, ce) — tiny,
    broadcastable (m_sub * k_codes rows); codes = (vec_id, sub, code) —
    the 100-TB payoff: ceil(log2 k_codes) bits per subvector instead of
    4 bytes per float dim (64-dim float32 -> 4 uint8 codes is a 16x-
    64x memory cut), so the ADC scan touches codes, never raw vectors.
    The driver's oracle query runs refine=0 (the seed codebook is
    SQL-expressible); refined codebooks are pinned by pytest
    (quantization error must not increase per iteration).
    """
    sub_len = dim // m_sub
    if sub_len * m_sub != dim:
        raise ValueError("m_sub must divide dim")
    # spread an under-split source once: the subvector explode + code
    # assignment below otherwise runs in one task for a 1-split input
    embeddings = spread_input(embeddings)

    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            lambda s: F.struct(
                s.cast("int").alias("sub"),
                F.slice(F.col("embedding"), s * sub_len + 1, sub_len).alias("v"),
            ),
        )
    ).alias("e")
    cb = (
        embeddings.where(F.col("vec_id") < k_codes)
        .select(F.col("vec_id").alias("code"), subs)
        .select("code", "e.sub", F.transform("e.v", lambda x: x.cast("double")).alias("ce"))
    )
    sv = embeddings.select("vec_id", subs).select(
        "vec_id", "e.sub", F.col("e.v").alias("xe")
    )
    if codebooks is not None:
        # serve from a SAVED quantizer (load_ann_index): assign codes
        # against the given (sub, code, ce) table, no seed/refine.
        # Shape guard: a codebook trained with different (dim, m_sub)
        # would zip_with-null-pad every distance into NULL and return
        # plausible garbage — fail loudly instead
        checked = codebooks.select(
            "sub",
            "code",
            F.when(F.size("ce") == sub_len, F.col("ce"))
            .otherwise(
                F.assert_true(
                    F.lit(False),
                    f"codebook entry length != dim/m_sub = {sub_len} "
                    "(artifact trained with different dim/m_sub?)",
                ).cast("array<double>")
            )
            .alias("ce"),
        )
        return checked, _pq_assign(sv, checked)
    if refine > 0:
        # materialize the subvector explode ONCE: each Lloyd iteration
        # re-reads sv (assignment) and chains joins on the previous cb —
        # without the checkpoint the unmaterialized lineage re-executes
        # the explode every iteration and the plan tree grows per round
        # (r03 verdict nit #1)
        sv = sv.localCheckpoint(eager=True)
    for _ in range(refine):
        # quantized centroid means (centroid_round) make the refined
        # assignment reproducible bit-for-bit across engines — used by
        # the cross-engine oracle query
        assigned = sv.join(_pq_assign(sv, cb), ["vec_id", "sub"])
        elems = assigned.select(
            "sub", "code", F.posexplode("xe").alias("pos", "v")
        )
        cb = _lloyd_mean_update(elems, ["sub", "code"], cb, centroid_round)
    codes = _pq_assign(sv, cb)
    return cb, codes


def knn_pq_adc(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    m_sub: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    refine: int = 0,
    centroid_round: int | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ ANN via asymmetric distance computation: approximate
    ||q - x||^2 = sum over subvectors of ||q_s - codebook[code_s(x)]||^2.

    Plan: the per-query lookup table (n_queries * m_sub * k_codes rows —
    tiny) broadcasts against the LONG code table (N * m_sub rows of 3
    ints), one hash aggregation sums the m_sub parts, a per-query
    window ranks. The corpus-sized scan touches ONLY codes: no raw
    vector leaves the codebook/query side, which is what makes the scan
    memory-bound-feasible at 10^11 vectors. Distances are quantized
    (ROUND 4) before ranking, ties broken by nid, so the top-k hashes
    identically across engines.
    """
    sub_len = dim // m_sub
    from pyspark.sql.window import Window

    cb, codes = pq_codes(
        embeddings, m_sub, k_codes, dim, refine, centroid_round,
        codebooks=codebooks,
    )
    q_subs = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("qid"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m_sub - 1)),
                    lambda s: F.struct(
                        s.cast("int").alias("sub"),
                        F.slice(F.col("embedding"), s * sub_len + 1, sub_len).alias("v"),
                    ),
                )
            ).alias("e"),
        )
        .select("qid", "e.sub", F.col("e.v").alias("qe"))
    )
    lut = q_subs.join(cb, "sub").select(
        "qid",
        "sub",
        "code",
        F.round(_l2sq(F.col("qe"), F.col("ce")), 6).alias("pd"),
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", F.col("vec_id").alias("nid"))
        .agg(F.round(F.sum("pd"), 4).alias("dist"))
    )
    w_ = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nid").asc())
    return (
        approx.withColumn("rank", F.row_number().over(w_))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "dist")
    )


_ANN_INDEX_VERSION = "ann-index-v1"


def save_ann_index(
    path: str,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> None:
    """Persist the trained ANN quantizers as a JSON artifact (train
    once, serve forever — the same persistence surface as the BPE
    merges artifact, operators/bpe_train.save_merges).

    centroids: an ``ivf_assign`` (centroid_id, ce) table; codebooks: a
    ``pq_codes`` (sub, code, ce) table. Either may be omitted. Both
    are PARAMETER tables (tens to thousands of rows — they broadcast
    in every serving plan), so the artifact is driver bytes, not data:
    each table folds to ONE driver row via collect_list before the
    write, never a row-by-row collect of corpus data.
    """
    import json

    doc: dict = {"version": _ANN_INDEX_VERSION, "shapes": {}}
    if centroids is not None:
        row = centroids.agg(
            F.array_sort(
                F.collect_list(F.struct("centroid_id", "ce"))
            ).alias("a")
        ).first()
        doc["centroids"] = [
            {"centroid_id": r["centroid_id"], "ce": [float(x) for x in r["ce"]]}
            for r in (row["a"] or [])
        ]
        if doc["centroids"]:
            doc["shapes"]["n_centroids"] = len(doc["centroids"])
            doc["shapes"]["dim"] = len(doc["centroids"][0]["ce"])
    if codebooks is not None:
        row = codebooks.agg(
            F.array_sort(F.collect_list(F.struct("sub", "code", "ce"))).alias("a")
        ).first()
        doc["codebooks"] = [
            {"sub": r["sub"], "code": r["code"], "ce": [float(x) for x in r["ce"]]}
            for r in (row["a"] or [])
        ]
        if doc["codebooks"]:
            subs = {r["sub"] for r in doc["codebooks"]}
            doc["shapes"]["m_sub"] = len(subs)
            doc["shapes"]["sub_len"] = len(doc["codebooks"][0]["ce"])
            doc["shapes"]["k_codes"] = sum(
                1 for r in doc["codebooks"] if r["sub"] == min(subs)
            )
    if "centroids" not in doc and "codebooks" not in doc:
        raise ValueError("nothing to save: pass centroids and/or codebooks")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f)


def load_ann_index(
    spark, path: str
) -> tuple[DataFrame | None, DataFrame | None]:
    """Load a ``save_ann_index`` artifact back as (centroids,
    codebooks) DataFrames (None for an absent table) — feed them to
    ``knn_ivf_cosine(centroids=...)`` / ``knn_pq_adc(codebooks=...)``
    to serve against the saved quantizers without retraining. Raises
    on unknown artifact versions rather than silently mis-indexing."""
    import json

    with open(path, "r", encoding="utf-8") as f:
        doc = json.load(f)
    if doc.get("version") != _ANN_INDEX_VERSION:
        raise ValueError(
            f"unsupported ann-index artifact version {doc.get('version')!r} "
            f"(expected {_ANN_INDEX_VERSION})"
        )
    cents = None
    if "centroids" in doc:
        cents = spark.createDataFrame(
            [(r["centroid_id"], [float(x) for x in r["ce"]]) for r in doc["centroids"]],
            "centroid_id long, ce array<double>",
        )
    cb = None
    if "codebooks" in doc:
        cb = spark.createDataFrame(
            [(r["sub"], r["code"], [float(x) for x in r["ce"]]) for r in doc["codebooks"]],
            "sub int, code long, ce array<double>",
        )
    return cents, cb
