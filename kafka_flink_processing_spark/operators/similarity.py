"""Embedding similarity search (approximate-nearest-neighbor extensions).

- cosine_topk: brute-force baseline. Query set broadcast against the corpus;
  dot products via zip_with + sequential aggregate fold (JVM-side, and
  bit-reproducible against the DuckDB oracle's list_reduce). At 100 TB the
  corpus side stays partitioned; cost is O(|Q| * N) — correct but the
  fallback path.
- lsh_cosine_topk: random-hyperplane LSH. 16 fixed literal hyperplanes ->
  16-bit signature; candidates = same-signature bucket; exact cosine + top-k
  within bucket. The scale path: one shuffle on the signature, bucket sizes
  ~ N/2^16 per hash cell. Deterministic (seeded literal planes), so the
  oracle reproduces it exactly; recall vs brute force is asserted in
  tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_flink_processing_spark.functions.constants import LSH_PLANES


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order — matches list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _cosine(dot: Column, na: Column, nb: Column) -> Column:
    """cosine = dot / (na * nb), NULL when the denominator is 0 (cosine
    is undefined for the zero vector). This matches DuckDB, where x / 0
    is NULL, so every oracle agrees without special-casing — while
    Spark's ANSI mode would otherwise kill the whole job with
    DIVIDE_BY_ZERO on the first zero-norm embedding in the corpus
    (found by the r9 emb_degenerate fuzz family). NaN norms propagate
    NaN in both engines (NaN != 0 under Spark's NaN semantics)."""
    den = na * nb
    return F.when(den != 0, dot / den)


def with_unit_info(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("nrm", _norm(F.col(vec_col)))


def cosine_topk(emb: DataFrame, query_ids, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self)."""
    base = with_unit_info(emb, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("nrm"))
    q = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("nrm").alias("qn"))
    c = base.select(F.col(id_col).alias("cand_id"),
                    F.col(vec_col).alias("cv"), F.col("nrm").alias("cn"))
    cos = _cosine(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
    scored = (F.broadcast(q).join(c, F.col("query_id") != F.col("cand_id"))
               .select("query_id", "cand_id", cos.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def lsh_signature(vec_col: Column) -> Column:
    """16-bit random-hyperplane signature from the fixed literal planes."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(LSH_PLANES):
        arr = F.array(*[F.lit(w) for w in plane])
        proj = _dot(vec_col, arr)
        sig = sig + F.when(proj > 0, F.lit(2 ** p).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return sig


# OR-amplification: candidate if ANY band matches. 2-bit bands keep recall
# high even for the weak-similarity regime (cos ~0.3 => P(cand) ~0.96);
# at larger corpora raise LSH_BAND_BITS (bucket ~ N/2^bits per band) to trade
# recall for candidate volume.
LSH_BAND_BITS = 2
LSH_N_BANDS = 8


def lsh_cosine_topk(emb: DataFrame, query_ids, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ANN top-k with banded hyperplane LSH (OR-amplification).

    The 16-bit signature is split into 4 bands of 4 bits; a corpus vector is
    a candidate if it matches the query on any band. Band width tunes the
    bucket size (~N/2^bits per band); at larger corpora raise LSH_BAND_BITS
    rather than scanning bigger buckets. Exact cosine + top-k on candidates.
    """
    base = with_unit_info(emb, vec_col).withColumn(
        "sig", lsh_signature(F.col(vec_col)))
    mask = (1 << LSH_BAND_BITS) - 1
    bands = base.select(
        F.col(id_col), F.col(vec_col), F.col("nrm"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(F.col("sig"), b * LSH_BAND_BITS)
                      .bitwiseAND(mask).alias("key"))
            for b in range(LSH_N_BANDS)])).alias("bk")) \
        .select(F.col(id_col), F.col(vec_col), F.col("nrm"),
                F.col("bk.band"), F.col("bk.key"))
    q = bands.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("nrm").alias("qn"), F.col("band").alias("qband"),
        F.col("key").alias("qkey"))
    c = bands.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"),
                     F.col("nrm").alias("cn"), F.col("band"), F.col("key"))
    matched = (F.broadcast(q)
               .join(c, (F.col("qband") == F.col("band"))
                     & (F.col("qkey") == F.col("key"))
                     & (F.col("query_id") != F.col("cand_id"))))
    # A pair can match in several bands (OR-amplification), so dedup is
    # required — but score FIRST, then dedup on (query_id, cand_id): the
    # shuffle then carries three scalars per row instead of two embedding
    # arrays, and the groupBy partial-aggregates map-side (the duplicate
    # band matches collapse before the exchange). Duplicates score
    # identically, so first() is deterministic.
    cos = _cosine(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
    scored = (matched.select("query_id", "cand_id", cos.alias("cosine"))
              .groupBy("query_id", "cand_id")
              .agg(F.first("cosine").alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


# IVF coarse quantizer: K cells, probe the nprobe nearest cells per query.
# The codebook comes from the k-means trainer (operators/kmeans.py::
# kmeans_train): by default ivf_cosine_topk trains it on the corpus it is
# indexing (a quantizer is an artifact OF its corpus — a codebook trained
# on one draw recalls ~0.4 on another vs ~0.9 same-corpus); registered
# queries instead pass the pinned per-corpus artifact from
# functions/ivf_codebook.py (generated by tools/train_ivf_codebook.py) so
# the DuckDB oracle can embed the identical 6dp literals.
IVF_K = 16
IVF_NPROBE = 4
IVF_TRAIN_ITERS = 10


def _codebook_df(spark, centroids) -> DataFrame:
    """(cid, cv, cn) rows from a k x d centroid matrix."""
    df = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cid int, cv array<double>")
    return df.withColumn("cn", _norm(F.col("cv")))


def _scored_cells(base: DataFrame, cents: DataFrame, id_col: str,
                  vec_col: str) -> DataFrame:
    """Every (vector, centroid) cosine: broadcast K-row codebook against the
    partitioned corpus — N*K scored rows, never shuffled."""
    cos_to_cent = _cosine(_dot(F.col(vec_col), F.col("cv")),
                          F.col("nrm"), F.col("cn"))
    return (base.crossJoin(F.broadcast(cents))
                .select(F.col(id_col), F.col(vec_col), F.col("nrm"),
                        F.col("cid"), cos_to_cent.alias("ccos")))


def _argmax_cell(scored_cells: DataFrame, id_col: str,
                 vec_col: str) -> DataFrame:
    """Nearest-cell assignment (id, cell, vec, nrm) via broadcast-scored
    rows + map-side max_by partial aggregation (one ~N-row exchange).
    Semantically identical to assign_cells (max_by(cid, struct(ccos,
    -cid)) == the fold's first-strict-max; oracle ROW_NUMBER(ORDER BY
    cos DESC, cid)); kept beside it because the two win in DIFFERENT
    plan shapes, measured at sf0.1: when a fat join/re-rank follows in
    the same stage, the literal fold's CodegenFallback drags the whole
    stage interpreted (ivf_cosine_topk 0.85 s agg vs 1.65 s map), while
    a standalone assignment is 3x faster as a pure map
    (kmeans_assign_cells 0.9 s -> 0.3 s)."""
    tie = F.struct(F.col("ccos").alias("c"), (-F.col("cid")).alias("nj"))
    return scored_cells.groupBy(id_col).agg(
        F.max_by("cid", tie).cast("long").alias("cell"),
        F.first(vec_col).alias(vec_col),
        F.first("nrm").alias("nrm"))


def _dot_expr_sql(a: str, b: str) -> str:
    """SQL rendering of _dot (same ops, same fold order)."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")


def _ivf_best_sql(vec_col: str, nrm_col: str, centroids) -> str:
    """struct<v double, j int>: the argmax-cosine centroid (ties ->
    smallest cid; NULL cosines — zero-norm vectors — lose to any
    non-NULL, and an all-NULL row keeps j=0 with v NULL), via a
    first-strict-max fold over the K literal-centroid cosines. Replays
    the previous max_by(cid, struct(ccos, -cid)) aggregation bit for
    bit — NaN
    orders above every double in both the fold's `>` and max_by's
    struct ordering — but as a PURE MAP: the centroid table enters the
    plan as constants, so cell assignment adds no join and no exchange.
    `nrm_col` must be a materialized column (with_unit_info): it is
    referenced once per centroid and must not re-evaluate."""
    import math

    # One 2-D centroid literal + a precomputed norm literal instead of K
    # inlined vectors (r12: analysis cost scales with tree size — see
    # _pq_sqds_sql). The norms are computed here with the SAME IEEE ops
    # in the same order the constant-folded sqrt(dot(lit, lit)) ran on
    # the JVM (sequential fold, correctly-rounded sqrt), so the literal
    # denotes the identical double.
    def _py_norm(cv) -> float:
        acc = 0.0
        for v in cv:
            fv = float(v)
            acc = acc + fv * fv
        return math.sqrt(acc)

    cents = _lit_mat_sql(centroids)
    cns = "array(" + ", ".join(_dlit(_py_norm(cv)) for cv in centroids) + ")"
    den = f"({nrm_col} * element_at({cns}, i + 1))"
    cos = (f"CASE WHEN {den} <> 0 THEN "
           f"{_dot_expr_sql(vec_col, f'element_at({cents}, i + 1)')}"
           f" / {den} END")
    take = ("COALESCE(x > acc.v, acc.v IS NULL AND x IS NOT NULL) "
            "OR acc.j = -1")
    return (f"aggregate(transform(sequence(0, {len(centroids) - 1}), "
            f"i -> {cos}), "
            "named_struct('v', CAST(NULL AS DOUBLE), 'j', -1, 'i', -1), "
            "(acc, x) -> named_struct("
            f"'v', IF({take}, x, acc.v), "
            f"'j', IF({take}, acc.i + 1, acc.j), "
            "'i', acc.i + 1), "
            "acc -> named_struct('v', acc.v, 'j', acc.j))")


def assign_cells(base: DataFrame, centroids,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 with_cosine: bool = False) -> DataFrame:
    """Map-only IVF cell assignment: same output relation as
    the old broadcast-score + max_by aggregation — (id, cell, vec, nrm
    [, cell_cosine]) — with the codebook compiled into the projection
    instead of broadcast-joined and re-aggregated, removing the
    corpus-sized exchange from every index build. `base` must already
    carry the nrm column (with_unit_info)."""
    st = base.withColumn(
        "_asg", F.expr(_ivf_best_sql(vec_col, "nrm", centroids)))
    cols = [F.col(id_col), F.col("_asg.j").cast("long").alias("cell"),
            F.col(vec_col), F.col("nrm")]
    if with_cosine:
        cols.append(F.col("_asg.v").alias("cell_cosine"))
    return st.select(*cols)


def ivf_cosine_topk(emb: DataFrame, query_ids, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    centroids=None) -> DataFrame:
    """ANN top-k with an IVF (inverted-file) index.

    Build: the K-row k-means codebook — trained on this corpus by
    operators/kmeans.py::kmeans_train when `centroids` is None, or the
    caller's pinned artifact (functions/ivf_codebook.py for the testdata
    corpora) — broadcast-joins the corpus; N*K scored rows never shuffle;
    map-side max_by partial aggregation reduces them to one (vector, cell)
    row per vector before the single exchange on vec_id.

    Search: each query probes its IVF_NPROBE nearest cells; candidates =
    corpus vectors in probed cells (equi-join on cell against the broadcast
    probe list); exact cosine + top-k re-rank. Cost ~ nprobe/K of brute
    force; at 100 TB raise K so cells stay executor-sized and the probe
    join stays broadcast.
    """
    if centroids is None:
        from kafka_flink_processing_spark.operators.kmeans import kmeans_train
        centroids, _ = kmeans_train(emb, k=IVF_K, iters=IVF_TRAIN_ITERS,
                                    id_col=id_col, vec_col=vec_col)
    base = with_unit_info(emb, vec_col)
    cents = _codebook_df(emb.sparkSession, centroids)
    # agg-based assignment here, NOT assign_cells: the exact re-rank
    # join follows in-stage, and the measured sf0.1 tradeoff favors the
    # codegen-friendly aggregation (see _argmax_cell's docstring)
    scored_cells = _scored_cells(base, cents, id_col, vec_col)
    asg = _argmax_cell(scored_cells, id_col, vec_col)

    wq = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
    probes = (scored_cells.filter(F.col(id_col).isin(list(query_ids)))
              .withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= IVF_NPROBE)
              .select(F.col(id_col).alias("query_id"),
                      F.col(vec_col).alias("qv"), F.col("nrm").alias("qn"),
                      F.col("cid").cast("long").alias("cell")))

    # No distinct needed: every corpus vector is argmax-assigned to exactly
    # ONE cell and a query's probe list holds distinct cells, so each
    # (query, candidate) pair joins at most once — a dedup here would be an
    # array-keyed shuffle over the whole candidate set for nothing.
    cand = (F.broadcast(probes)
            .join(asg, "cell")
            .filter(F.col("query_id") != F.col(id_col))
            .select("query_id", "qv", "qn",
                    F.col(id_col).alias("cand_id"),
                    F.col(vec_col).alias("cv"), F.col("nrm").alias("cn")))
    cos = _cosine(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
    scored = cand.select("query_id", "cand_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def _sqd(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (index order — matches the
    oracle's list_reduce; per-element cast to double like _dot)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x)


def _sqd_expr_sql(a: str, b: str) -> str:
    """SQL rendering of _sqd (same ops, same fold order — bit-identical;
    rendered as text so the whole PQ projection reaches the JVM in ONE
    F.expr parse instead of thousands of py4j Column-builder calls,
    which measured ~6 s of driver time per query at M*K*dsub = 1024
    literals)."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")


def _lit_vec_sql(cv) -> str:
    """A literal double vector; the string-cast parses via the same
    correctly-rounded double parser every engine shares, so the 6dp
    codebook text denotes identical bits here, in the Column API, and
    in the DuckDB oracle."""
    return ("array(" + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)"
                                 for v in cv) + ")")


def _dlit(v) -> str:
    """One double as a SQL 'D'-suffixed literal — the same correctly
    rounded text->double parse as the CAST form (identical bits), with
    one parser token instead of a Cast(Literal) pair. Exists for the
    codebook-sized literals (r12): expression ANALYSIS cost is
    proportional to tree size and every DataFrame method re-analyzes
    the whole plan, so the M*K*dsub codebook wants the fewest nodes
    per value."""
    r = repr(float(v))
    return r + "D" if ("e" in r or "." in r or "inf" in r) else r + ".0D"


def _lit_mat_sql(mat) -> str:
    """A K x d centroid matrix as one 2-D array literal (D-suffixed)."""
    return ("array(" + ", ".join(
        "array(" + ", ".join(_dlit(v) for v in cv) + ")"
        for cv in mat) + ")")


def _pq_sqds_sql(vec_col: str, codebook) -> str:
    """SQL for the M x K matrix (array<array<double>>) of squared
    distances from the vector's m-th slice to each literal centroid —
    the codebook enters the plan as constants, not a joined relation.
    r12 shape: ONE 3-D codebook literal walked by transform lambdas
    instead of M*K inlined sqd expressions — ~5x fewer expression nodes,
    which is what the per-call DataFrame analysis cost scales with; the
    optimizer constant-folds the codebook to a single array value, and
    the inner transform produces the K distances in exactly the j order
    (and the outer the m order) the array(...) form had, with the same
    per-element arithmetic, so results are bit-identical."""
    m_count = len(codebook)
    dsub = len(codebook[0][0])
    cb = ("array(" + ", ".join(_lit_mat_sql(sub) for sub in codebook)
          + ")")
    sqd = _sqd_expr_sql(f"slice({vec_col}, m * {dsub} + 1, {dsub})", "cv")
    return (f"transform(sequence(0, {m_count - 1}), m -> "
            f"transform(element_at({cb}, m + 1), cv -> {sqd}))")


def _pq_best_expr(vec_col: str, codebook) -> Column:
    """array<struct<v double, j int>>: per subspace, the argmin centroid
    (ties -> smallest j) and ITS squared distance, via a first-strict-min
    fold. The fold iterates over the materialized sqds array ITSELF (a
    positional counter in the accumulator), so the K distance
    expressions evaluate exactly once per row — a fold over
    sequence(0..K-1) indexing into sqds would re-evaluate the whole
    array inside every lambda step.
    Replays the oracle's ROW_NUMBER(ORDER BY sqd, j) exactly, including
    non-finite inputs: both engines order NaN above every double, so
    `x < acc.v` skips NaN unless everything is NaN (then j=0 wins in
    both — the first element is always taken via the j = -1 guard)."""
    return F.expr(
        f"transform({_pq_sqds_sql(vec_col, codebook)}, sqds -> "
        "aggregate(sqds, "
        "named_struct('v', CAST('Infinity' AS DOUBLE), "
        "'j', -1, 'i', -1), "
        "(acc, x) -> named_struct("
        "'v', IF(x < acc.v OR acc.j = -1, x, acc.v), "
        "'j', IF(x < acc.v OR acc.j = -1, acc.i + 1, acc.j), "
        "'i', acc.i + 1), "
        "acc -> named_struct('v', acc.v, 'j', acc.j)))")


def _pq_lut_expr(vec_col: str, codebook) -> Column:
    """Flat M*K ADC lookup table (index = m*K + j) as one map-side
    expression."""
    return F.expr(f"flatten({_pq_sqds_sql(vec_col, codebook)})")


def _ivf_centroids_lit_sql(centroids) -> str:
    """The whole centroid table as one 2-D array literal."""
    return _lit_mat_sql(centroids)


def residual_expr(vec_col: str, cell_col: str, centroids) -> Column:
    """vec - C_ivf[cell], elementwise in double — the quantity residual
    IVFADC encodes (Jegou et al. 2011 §V.A): PQ distortion drops because
    residuals concentrate near 0 once the coarse quantizer has absorbed
    the cell mean. Map-side: the centroid table is a 2-D literal indexed
    by the (already-computed) cell column."""
    return F.expr(
        f"zip_with({vec_col}, "
        f"element_at({_ivf_centroids_lit_sql(centroids)}, "
        f"CAST({cell_col} AS INT) + 1), "
        "(x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))")


def pq_encode(emb: DataFrame, codebook,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Product-quantization encode (Jegou et al. 2011): per subspace m,
    code = argmin_j ||x_m - C[m][j]||^2 (ties -> smallest j, the
    oracle's ROW_NUMBER order). Returns (id, codes array<int>,
    distortion double) where distortion is the reconstruction error
    sum_m min_j ||x_m - C[m][j]||^2, folded in subspace order so the
    double is bit-identical cross-engine.

    Scale shape: encode is a PURE MAP — the pinned codebook is compiled
    into the projection as literals, so the plan is scan -> project with
    ZERO exchanges (the crossJoin+groupBy formulation this replaced
    shuffled N*M argmin partials for nothing). At 100 TB this IS the
    point of PQ: one pass compresses the corpus ~16x (M bytes + id vs
    M*dsub floats) and every downstream ADC scan reads codes, not
    vectors."""
    best = _pq_best_expr(vec_col, codebook)
    # one Project materializes the per-subspace structs; the consumers
    # reference it twice, which CollapseProject leaves un-inlined
    # (non-cheap expression), so the fold runs once per row
    st = emb.select(F.col(id_col), best.alias("_pq"))
    return st.select(
        id_col,
        F.transform(F.col("_pq"), lambda s: s["j"]).alias("codes"),
        F.aggregate(F.transform(F.col("_pq"), lambda s: s["v"]),
                    F.lit(0.0), lambda acc, x: acc + x).alias("distortion"))


def pq_adc_topk(emb: DataFrame, query_ids, codebook, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """ANN top-k by PQ asymmetric distance computation: encode the corpus
    once (pq_encode), build each query's M x K lookup table of exact
    subspace distances to every centroid, then approximate
    ||q - x||^2 ~ sum_m LUT[m][codes_x[m]] with a fixed-order fold.
    Returns (query_id, cand_id, adist, rank), rank by (adist ASC,
    cand_id) — fully deterministic, so the DuckDB oracle replays it
    bit-exact.

    Scale shape: the whole query is ONE exchange (the per-query top-k):
    encode is a pure map (literal codebook), the |Q|-row LUT side is a
    map over the filtered queries, and the ADC scan reads the M-byte
    codes relation (the compressed corpus), not the vectors — the
    textbook memory-bandwidth win of PQ."""
    M = len(codebook)
    K = len(codebook[0])
    enc = pq_encode(emb, codebook, id_col, vec_col).select(id_col, "codes")

    luts = (emb.filter(F.col(id_col).isin(list(query_ids)))
            .select(F.col(id_col).alias("query_id"),
                    _pq_lut_expr(vec_col, codebook).alias("lut")))

    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(M - 1)), F.lit(0.0),
        lambda acc, m: acc + F.element_at(
            F.col("lut"),
            m * K + F.element_at(F.col("codes"), m + 1) + 1))
    scored = (enc.crossJoin(F.broadcast(luts))
              .filter(F.col("query_id") != F.col(id_col))
              .select("query_id", F.col(id_col).alias("cand_id"),
                      adist.alias("adist")))
    w = Window.partitionBy("query_id").orderBy(F.col("adist"),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def pq_adc_rerank_topk(emb: DataFrame, query_ids, codebook, k: int = 10,
                       shortlist: int = 50,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """The production PQ pattern: ADC retrieves a `shortlist`-sized
    candidate set from the compressed codes, then ONLY the shortlist's
    original vectors are fetched for an exact squared-L2 re-rank —
    recall recovers toward exact while the corpus-wide scan still reads
    M-byte codes. Returns (query_id, cand_id, dist, rank) by exact
    distance.

    Scale shape: the code scan is the similarity_pq_topk plan; the
    re-rank join touches |Q| * shortlist vectors (broadcastable), so
    the full-precision corpus is read ~|Q|*R/N as often as brute force
    would read it."""
    short = pq_adc_topk(emb, query_ids, codebook, k=shortlist,
                        id_col=id_col, vec_col=vec_col)
    q = (emb.filter(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qv")))
    cand = (short.select("query_id", "cand_id")
            .join(emb.select(F.col(id_col).alias("cand_id"),
                             F.col(vec_col).alias("cv")), "cand_id")
            .join(F.broadcast(q), "query_id"))
    scored = cand.select("query_id", "cand_id",
                         _sqd(F.col("qv"), F.col("cv")).alias("dist"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist"),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def ivfpq_adc_topk(emb: DataFrame, query_ids, codebook, k: int = 10,
                   nprobe: int = IVF_NPROBE,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   centroids=None) -> DataFrame:
    """IVFADC (Jegou et al. 2011 §V, the FAISS default architecture):
    IVF coarse-cell pruning COMPOSED with PQ asymmetric-distance scoring
    — each query probes its `nprobe` nearest cells and scans only those
    cells' M-byte PQ codes, so the two orthogonal scale levers multiply:
    read nprobe/K of the corpus (IVF) at ~1/16 the bytes per row (PQ).
    Raw vectors are encoded (no residual — the deterministic variant
    both engines replay bit-exact; FAISS's encode_residual=false mode).
    Returns (query_id, cand_id, adist, rank) by (adist ASC, cand_id).

    Index build = the cell argmax (broadcast centroid scores, one
    map-side-combined exchange of N rows) followed by a pure-map PQ
    encode (literal codebook) with the cell riding along — the (cell,
    codes) index needs no corpus-sized self-join and no PQ shuffle. At
    100 TB the index is materialized once (partitioned by cell) and
    queries touch nprobe cells of codes."""
    if centroids is None:
        from kafka_flink_processing_spark.operators.kmeans import kmeans_train
        centroids, _ = kmeans_train(emb, k=IVF_K, iters=IVF_TRAIN_ITERS,
                                    id_col=id_col, vec_col=vec_col)
    spark = emb.sparkSession
    M = len(codebook)
    K = len(codebook[0])

    # coarse quantizer: map-only literal-codebook assignment — one
    # (vector, cell) row per corpus vector, no exchange
    base = with_unit_info(emb, vec_col)
    cents = _codebook_df(spark, centroids)
    asg = assign_cells(base, centroids, id_col, vec_col)
    scored_cells = _scored_cells(base, cents, id_col, vec_col)

    # PQ-encode the assigned corpus — a pure map over asg (literal
    # codebook), the cell column rides along untouched
    codes = asg.select(
        F.col(id_col), F.col("cell"),
        F.transform(_pq_best_expr(vec_col, codebook),
                    lambda s: s["j"]).alias("codes"))

    # query side: nprobe nearest cells + the flat M x K ADC lookup table
    wq = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(),
                                            F.col("cid"))
    probes = (scored_cells.filter(F.col(id_col).isin(list(query_ids)))
              .withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select(F.col(id_col).alias("query_id"),
                      F.col("cid").cast("long").alias("cell")))
    luts = (emb.filter(F.col(id_col).isin(list(query_ids)))
            .select(F.col(id_col).alias("query_id"),
                    _pq_lut_expr(vec_col, codebook).alias("lut")))

    # probed-cell code scan: each (query, candidate) joins at most once
    # (argmax assigns one cell per vector; a query's probe cells are
    # distinct), then M LUT lookups per candidate
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(M - 1)), F.lit(0.0),
        lambda acc, m: acc + F.element_at(
            F.col("lut"),
            m * K + F.element_at(F.col("codes"), m + 1) + 1))
    cand = (codes.join(F.broadcast(probes.join(luts, "query_id")), "cell")
            .filter(F.col("query_id") != F.col(id_col))
            .select("query_id", F.col(id_col).alias("cand_id"),
                    adist.alias("adist")))
    w = Window.partitionBy("query_id").orderBy(F.col("adist"),
                                               F.col("cand_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))


def ivfpq_residual_adc_topk(emb: DataFrame, query_ids, codebook,
                            k: int = 10, nprobe: int = IVF_NPROBE,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            centroids=None) -> DataFrame:
    """Residual IVFADC — the full FAISS-default encoding (Jegou et al.
    2011 §V.A): each corpus vector PQ-encodes its RESIDUAL x - C_ivf[
    cell(x)] rather than the raw vector, so the codebook only has to
    cover the within-cell spread (distortion drops, recall rises at the
    same M x K budget). The price is a per-(query, probe-cell) lookup
    table — ||q - C_ivf[cell]||-relative distances differ per cell — but
    that side is |Q| * nprobe rows and broadcasts.

    Index build stays ALL map: literal-centroid cell argmax, literal
    residual subtraction, literal-codebook code argmin — scan -> project,
    zero corpus exchanges. The codebook must be residual-trained
    (tools/train_pq_codebook.py --residual; functions/
    pq_residual_codebook.py is the pinned artifact)."""
    if centroids is None:
        from kafka_flink_processing_spark.operators.kmeans import kmeans_train
        centroids, _ = kmeans_train(emb, k=IVF_K, iters=IVF_TRAIN_ITERS,
                                    id_col=id_col, vec_col=vec_col)
    M = len(codebook)
    K = len(codebook[0])

    base = with_unit_info(emb, vec_col)
    asg = assign_cells(base, centroids, id_col, vec_col)
    resid = asg.withColumn("_rv",
                           residual_expr(vec_col, "cell", centroids))
    codes = resid.select(
        F.col(id_col), F.col("cell"),
        F.transform(_pq_best_expr("_rv", codebook),
                    lambda s: s["j"]).alias("codes"))

    # query side: nprobe nearest cells, then ONE LUT per (query, cell)
    # over the query's residual AGAINST THAT CELL
    cents = _codebook_df(emb.sparkSession, centroids)
    scored_cells = _scored_cells(base, cents, id_col, vec_col)
    wq = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(),
                                            F.col("cid"))
    probes = (scored_cells.filter(F.col(id_col).isin(list(query_ids)))
              .withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select(F.col(id_col).alias("query_id"),
                      F.col("cid").cast("long").alias("cell"),
                      F.col(vec_col)))
    luts = (probes
            .withColumn("_qr", residual_expr(vec_col, "cell", centroids))
            .select("query_id", "cell",
                    _pq_lut_expr("_qr", codebook).alias("lut")))

    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(M - 1)), F.lit(0.0),
        lambda acc, m: acc + F.element_at(
            F.col("lut"),
            m * K + F.element_at(F.col("codes"), m + 1) + 1))
    cand = (codes.join(F.broadcast(luts), "cell")
            .filter(F.col("query_id") != F.col(id_col))
            .select("query_id", F.col(id_col).alias("cand_id"),
                    adist.alias("adist")))
    w = Window.partitionBy("query_id").orderBy(F.col("adist"),
                                               F.col("cand_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))


def cosine_pairs(emb: DataFrame, threshold: float = 0.45,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute force: O(n^2) all-pairs
    theta-join. TEST-ONLY BASELINE and the oracle's ground truth —
    production paths go through lsh_cosine_pairs (the registered query
    does), which replaces the all-pairs join with LSH bucket candidates."""
    base = with_unit_info(emb, vec_col)
    a = base.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                    F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                    F.col("nrm").alias("nb"))
    cos = _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
             .select("vec_a", "vec_b", cos.alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def lsh_cosine_pairs(emb: DataFrame, threshold: float = 0.45,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs via banded-LSH candidates + exact
    re-scoring — no all-pairs join anywhere in the plan.

    Candidates = pairs agreeing on at least one of the 8 2-bit signature
    bands (equi-join on (band, key), shuffle-partitioned by bucket);
    survivors get the exact sequential-fold cosine and the threshold
    filter, so every emitted pair is exact. Completeness is probabilistic:
    a pair at cosine t is a candidate with 1-(1-p(t)^2)^8 where
    p(t) = 1 - arccos(t)/pi (~98.7% at t=0.45, ->1 fast as t grows; at the
    production near-dup regime t>=0.8 the miss rate is ~1e-5 and buckets
    prune hard). On the testdata corpora the candidate set contains every
    above-threshold pair (recall 1.0 vs the brute-force baseline,
    test-asserted), so the registered query hash-matches its brute-force
    DuckDB oracle. For guaranteed-exact output at low thresholds use
    cosine_pairs (quadratic) — low-threshold exact pair mining has no
    sub-quadratic complete algorithm.
    """
    base = with_unit_info(emb, vec_col).withColumn(
        "sig", lsh_signature(F.col(vec_col)))
    mask = (1 << LSH_BAND_BITS) - 1
    bands = base.select(
        F.col(id_col), F.col(vec_col), F.col("nrm"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(F.col("sig"), b * LSH_BAND_BITS)
                      .bitwiseAND(mask).alias("key"))
            for b in range(LSH_N_BANDS)])).alias("bk")) \
        .select(F.col(id_col), F.col(vec_col), F.col("nrm"),
                F.col("bk.band"), F.col("bk.key"))
    a = bands.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                     F.col("nrm").alias("na"), "band", "key")
    b = bands.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                     F.col("nrm").alias("nb"), "band", "key")
    cand = (a.join(b, ["band", "key"])
             .filter(F.col("vec_a") < F.col("vec_b")))
    # Score and threshold BEFORE the dedup: the multi-band duplicates then
    # collapse in a groupBy over two long keys carrying one double (partial
    # aggregation map-side), instead of a distinct whose key is two whole
    # embedding arrays. Duplicate band matches score identically, so
    # first() is deterministic.
    cos = _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (cand.select("vec_a", "vec_b", cos.alias("cosine"))
                .filter(F.col("cosine") >= threshold)
                .groupBy("vec_a", "vec_b")
                .agg(F.first("cosine").alias("cosine")))


# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication by
# clustering the embedding space and pruning near-identical vectors WITHIN
# each cluster — the pairwise cosine never crosses cluster boundaries, which
# is what makes it tractable at corpus scale.
SEMDEDUP_THRESHOLD = 0.45  # the testdata's planted near-dup regime (same
#                            threshold as lsh_cosine_pairs)


def semdedup(emb: DataFrame, threshold: float = SEMDEDUP_THRESHOLD,
             centroids=None, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Semantic dedup: one (id, cell, keep) row per vector.

    A vector is dropped iff some SAME-CELL vector with a smaller id sits at
    cosine >= threshold — the deterministic keep-lowest-id variant of
    SemDeDup's per-cluster pruning (the paper keeps one random member per
    e-ball; lowest-id is the engine-portable refinement). Cross-cell
    near-dups are deliberately out of scope — that approximation is the
    algorithm's entire scale story.

    Scale shape: cell assignment is the IVF quantizer's (broadcast codebook,
    map-side argmax, one ~N-row exchange); the pairwise stage joins on
    `cell` only, so cost is sum(m_c^2) over cell sizes m_c — at 100 TB you
    raise K with the corpus (cells stay executor-sized) exactly as for
    similarity_ivf_topk, and the pair join parallelizes per cell. Dropping
    is a size-(#dups) distinct + left join back onto the assignment.
    """
    if centroids is None:
        from kafka_flink_processing_spark.operators.kmeans import kmeans_train
        centroids, _ = kmeans_train(emb, k=IVF_K, iters=IVF_TRAIN_ITERS,
                                    id_col=id_col, vec_col=vec_col)
    base = with_unit_info(emb, vec_col)
    asg = assign_cells(base, centroids, id_col, vec_col)
    a = asg.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                   F.col("nrm").alias("na"), "cell")
    b = asg.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                   F.col("nrm").alias("nb"), "cell")
    cos = _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    dups = (a.join(b, "cell")
             .filter(F.col("vec_a") < F.col("vec_b"))
             .select(F.col("vec_b").alias(id_col), cos.alias("cosine"))
             .filter(F.col("cosine") >= threshold)
             .select(id_col).distinct()
             .withColumn("_dup", F.lit(True)))
    return (asg.join(dups, id_col, "left")
               .select(F.col(id_col), F.col("cell"),
                       F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")))
