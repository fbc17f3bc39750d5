"""SQ8 per-vector affine int8 scalar quantization: encode, asymmetric
exact-re-rank serving, and the engine-independent exact shortlist.
Split out of the single similarity module in r11 — and, unlike the
other four split modules, NOT a pure move: the same round changed
``_sq8_exact_shortlist``'s prefilter corpus norm from exact-decimal to
primitive double with a survivor-only exact recomputation (the
``with_dbl_and_approx_norm`` discipline; margin headroom 10⁷ → 10⁵,
see the function docstring)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (
    _ACC,
    _QDEC,
    _ensure_ann_base,
    _rank_topk,
    cosine_for_pairs,
    dbl_vector,
    dot_double,
    dot_exact,
    quantized_vector,
)

# ----------------------------------------------- scalar quantization (SQ8)


def sq8_encode(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector affine int8 scalar quantization — the OTHER standard
    embedding-store codec next to PQ (a direct-scaled PER-ROW variant
    of the FAISS scalar-quantizer family; FAISS QT_8bit itself trains
    per-DIMENSION min/max over the corpus, whereas here (scale, offset)
    travel WITH each row's codes — no training pass, no store-wide
    geometry): ``code_i = round((x_i − mn) /
    scale)`` with ``scale = (mx − mn)/255`` over the vector's own
    [mn, mx] range, reconstruction ``x̂_i = offset + scale·code_i``,
    so ``|x − x̂|∞ ≤ scale/2`` by construction. 4× smaller than
    float32 where PQ is 32×: the fidelity/compression point a serving
    tier picks when recall matters more than memory (SQ8 re-ranks are
    near-exact; PQ codes are 8 bytes but lossy). A FLAT vector (mx ==
    mn) gets scale 1 and all-zero codes — x̂ = offset exactly.

    Returns (id, codes array<int> in [0, 255], scale, offset). One
    in-row projection over the scan — zero shuffles, zero UDFs; the
    parquet-persisted form is the 100-TB store layout (int codes
    dictionary/RLE-compress far below the float payload).

    Like every positional codec relation in this module (PQ codes=,
    adc_side=, picks=), the output is only meaningful to a consumer
    decoding with ITS OWN (scale, offset) columns — they travel WITH
    the codes, so there is no cross-relation geometry to guard."""
    v = dbl_vector(vec_col)
    mn = F.array_min(v)
    mx = F.array_max(v)
    scale = F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(F.lit(1.0))
    codes = F.transform(
        v,
        lambda x: F.round((x - mn) / scale).cast("int"),
    )
    return emb.select(
        F.col(id_col),
        codes.alias("codes"),
        scale.alias("scale"),
        mn.alias("offset"),
    )


# SQ8 exact-mode corpus quantization scale: the reconstructed
# component x̂_i = offset + scale·code_i becomes the integer
# x̃_i = trunc(offset·1e15) + trunc(scale·1e15)·code_i. 1e15 (not the
# query side's 1e12 _QSCALE) because scale ~ range/255 sits two-three
# decimal orders below the components — at 1e12 the quantized scale
# would keep only ~4 significant digits of it. Magnitudes stay
# decimal-safe for unit-ish embedding components: |x̃| ≤ ~3e15 (fits a
# long, < 2^53 so its double image is exact, and decimal(17,0)); the
# norm fold Σx̃² ≤ ~6e32 and the pair fold Σ qv·x̃ ≤ ~2e30 both sit
# inside the _ACC accumulator.
_SQ8_XSCALE = 1e15
_SQ8_XDEC = "decimal(17,0)"


def _sq8_norm_guard(norm: Column, ident: Column, side: str) -> Column:
    """Loud zero-norm guard for the SQ8 serve paths: cosine is
    undefined for an all-zero vector, and without the guard the NULL
    score would silently rank the row last (corpus side) or NULL every
    pair (query side) — the same silent-mis-serve class the PQ hook
    guards refuse. Matches the module discipline: the margin proofs
    already assume norms ≥ 1e-3 (see the _QSCALE comment), so a zero
    vector is a caller bug, not data to serve."""
    return F.when(norm > 0, norm).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"sq8_topk: zero-norm {side} vector "),
                ident.cast("string"),
                F.lit(
                    " (all-zero embedding) has no cosine direction — "
                    "filter zero vectors before serving (the module's "
                    "norm ≥ 1e-3 margin contract, see _QSCALE)"
                ),
            )
        ).cast("double")
    )


def _sq8_exact_shortlist(
    base: DataFrame,
    side: DataFrame,
    query_ids_max: int,
    refine: int,
    id_col: str,
) -> DataFrame:
    """Engine-independent SQ8 ADC shortlist — the exact-mode twin of
    :func:`sq8_topk`'s double scoring, same convention pinning as the
    PQ legs' exact mode: quantize the codec's OWN (scale, offset) to
    trunc(·1e15) longs so the reconstructed component
    x̃_i = offq + sq·code_i is an INTEGER; the per-pair numerator
    Σ qv_i·x̃_i and the survivor-side corpus norm Σ x̃_i² then fold as
    exact decimals with the module's ONE string-hopped double
    conversion each, and shortlist MEMBERSHIP (row_number over score
    DESC, id_b ≤ refine) is bitwise identical in Spark and the DuckDB
    oracle. Reads ONLY (codes, scale, offset) — exactly the persisted
    ``sq8_encode`` store layout, so a parquet-read codes relation
    serves without the source vectors.

    Two-pass (the ``_exact_adc_topk`` discipline): a primitive-double
    pass over the SAME quantized quantities ranks all pairs (|x̃| and
    |qv| are < 2^53, so their double images are exact; the approx→
    exact gap is m-term summation error plus the prefilter's
    primitive-double corpus norm — the ``with_dbl_and_approx_norm``
    discipline, so the corpus pays codegen folds, never interpreted
    decimal folds — together ~1e-12 in cosine units); the interpreted
    decimal folds run only within 1e-6 of each query's refine-th
    approximate score (≥ 10⁵ headroom), and the refine-th cut is a
    SECOND window over the SAME partitioning so the pair upstream
    executes once (the r8 kth-window rule)."""
    sq = (F.col("scale") * F.lit(_SQ8_XSCALE)).cast("long")
    offq = (F.col("offset") * F.lit(_SQ8_XSCALE)).cast("long")
    xt = F.transform("codes", lambda c: offq + sq * c.cast("long"))
    # the prefilter's corpus norm is PRIMITIVE DOUBLE (the
    # with_dbl_and_approx_norm discipline: corpus-wide interpreted
    # decimal folds are the thing to avoid — its ~1e-12 relative error
    # is absorbed by the 1e-6 margin); the exact-decimal norm folds
    # only for margin survivors, below
    xnd = F.sqrt(
        F.aggregate(
            F.col("_xtd"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    corpus = (
        side.select(F.col(id_col).alias("id_b"), xt.alias("_xt"))
        .withColumn(
            "_xtd", F.transform("_xt", lambda x: x.cast("double"))
        )
        .withColumn(
            "_xnd", _sq8_norm_guard(xnd, F.col("id_b"), "corpus")
        )
    )
    qv = quantized_vector(F.col("vdbl"))
    queries = (
        base.filter(F.col(id_col) < query_ids_max)
        .select(F.col(id_col).alias("id_a"), qv.alias("_qv"))
        .select(
            "id_a",
            "_qv",
            F.transform("_qv", lambda x: x.cast("double")).alias("_qvd"),
            _sq8_norm_guard(
                F.sqrt(dot_exact(F.col("_qv"), F.col("_qv"))),
                F.col("id_a"),
                "query",
            ).alias("_qn"),
        )
    )
    nd = F.aggregate(
        F.zip_with(F.col("_qvd"), F.col("_xtd"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # SLIM the pair frame before the rank exchange (the _exact_adc_topk
    # discipline): only (ids, norms, approx score) scalars shuffle —
    # the four 64-element arrays would multiply the exchange ~50×; the
    # margin survivors re-fetch them below at O(queries·refine) via
    # candidate-bounded broadcasts
    pairs = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "_qn",
            (nd / (F.col("_qn") * F.col("_xnd"))).alias("_sd"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.col("_sd").desc(), F.col("id_b"))
    ranked = pairs.withColumn("_ar", F.row_number().over(w)).withColumn(
        "_rth",
        F.max(F.when(F.col("_ar") == refine, F.col("_sd"))).over(
            Window.partitionBy("id_a")
        ),
    )
    surv = ranked.filter(
        F.col("_rth").isNull() | (F.col("_sd") >= F.col("_rth") - 1e-6)
    ).select("id_a", "id_b", "_qn")
    refetch = (
        corpus.select("id_b", "_xt")
        .join(F.broadcast(surv), "id_b")
        .join(F.broadcast(queries.select("id_a", "_qv")), "id_a")
    )
    n_exact = (
        F.aggregate(
            F.zip_with(
                F.col("_qv"),
                F.col("_xt"),
                lambda a, b: a.cast(_QDEC) * b.cast(_SQ8_XDEC),
            ),
            F.lit(0).cast(_ACC),
            lambda acc, x: (acc + x).cast(_ACC),
        )
        .cast("string")
        .cast("double")
    )
    # survivor-only EXACT corpus norm (matches the oracle's sq8xn):
    # the module's one string-hopped conversion, O(queries·refine)
    # decimal folds
    xn_exact = F.sqrt(
        F.aggregate(
            F.col("_xt"),
            F.lit(0).cast(_ACC),
            lambda acc, x: (
                acc + x.cast(_SQ8_XDEC) * x.cast(_SQ8_XDEC)
            ).cast(_ACC),
        )
        .cast("string")
        .cast("double")
    )
    exact = refetch.select(
        "id_a",
        "id_b",
        "_qv",
        "_qn",
        (n_exact / (F.col("_qn") * xn_exact)).alias("_s"),
    )
    we = Window.partitionBy("id_a").orderBy(F.col("_s").desc(), F.col("id_b"))
    return (
        exact.withColumn("_er", F.row_number().over(we))
        .filter(F.col("_er") <= refine)
        .select("id_a", "id_b", "_qv", "_qn")
    )


def sq8_topk(
    emb: DataFrame,
    codes: DataFrame | None = None,
    query_ids_max: int = 20,
    k: int = 5,
    refine: int | None = None,
    id_col: str = "vec_id",
    exact: bool = False,
) -> DataFrame:
    """Asymmetric SQ8 top-k — the scalar-quantized serve twin of
    ``brute_force_topk`` (same API: queries are corpus rows with id <
    ``query_ids_max``, self excluded, exact-decimal final cosines,
    (cosine DESC, id_b) tie-break): queries stay full-precision, the
    corpus scans as int8 codes, the approximate-cosine top-``refine``
    shortlist per query is re-ranked on the module's exact cosine
    (``cosine_for_pairs`` + the shared ``_rank_topk`` tail). With
    ``refine`` ≥ corpus the output is IDENTICAL to ``brute_force_topk``
    (pytest-pinned) — the SQ8 scan only prunes who reaches the exact
    re-rank, the standard quantized-serving contract this module's PQ
    paths follow.

    Scale shape, the ``_codes_adc_side`` discipline: the per-row
    decode NEVER runs per pair. dot(q, x̂) decomposes affinely —
    ``offset·Σq_i + scale·Σ q_i·code_i`` — and ``|x̂|²`` =
    ``n·offset² + 2·offset·scale·Σc_i + scale²·Σc_i²``, so the corpus
    side precomputes (Σc_i, Σc_i², |x̂|) ONCE per row
    (query-independent, rides the code scan) and each (query, row)
    pair costs ONE integer-weighted fold Σ q_i·code_i plus four
    scalar ops. Queries (with Σq_i and |q|) broadcast; the corpus
    side STREAMS — a full scan like brute force, at 4× less memory
    traffic, with the exact folds at O(queries·refine) instead of
    pair cardinality. Pass ``codes`` (an ``sq8_encode`` output, e.g.
    read back from parquet) to serve from a persisted store; None
    encodes on the fly in the same pass.

    ``exact=True`` (the oracle-attested mode, like the PQ legs'):
    shortlist membership itself goes engine-independent — the ADC
    score is recomputed over trunc-quantized (scale, offset, query)
    integers with exact-decimal folds (see
    :func:`_sq8_exact_shortlist` for the convention and the two-pass
    margin discipline), so the emitted top-k is bitwise reproducible
    by an independent SQL engine. The double mode ranks the raw-double
    ADC score: same semantics, engine-local membership at ulp
    boundaries — the serving default.

    Zero-norm vectors (query or corpus) raise in-plan instead of
    silently NULL-ranking — see :func:`_sq8_norm_guard`."""
    refine = 4 * k if refine is None else refine
    if refine < k:
        raise ValueError(f"refine {refine} < k {k}: shortlist must cover top-k")
    base = _ensure_ann_base(emb, id_col)
    side = codes if codes is not None else sq8_encode(base, id_col, "vdbl")
    if exact:
        short = _sq8_exact_shortlist(base, side, query_ids_max, refine, id_col)
        # fused exact re-rank (scheduling-lean, the r9 fuse rule): the
        # shortlist already carries the query's quantized vector and
        # hopped norm, so the corpus side is the ONLY fetch — one
        # broadcast of the candidate-bounded shortlist into the cached
        # base scan (never the reverse: the corpus is unbounded), with
        # the exact-decimal folds at O(queries·refine). Semantics ≡
        # cosine_for_pairs(exact_norms_in_base=False) + _rank_topk —
        # same dot_exact, same denominator order, same ranking tail.
        corp = base.select(
            F.col(id_col).alias("id_b"),
            quantized_vector(F.col("vdbl")).alias("_vqb"),
        )
        scored = corp.join(F.broadcast(short), "id_b").select(
            "id_a",
            "id_b",
            (
                dot_exact(F.col("_qv"), F.col("_vqb"))
                / (
                    F.col("_qn")
                    * F.sqrt(dot_exact(F.col("_vqb"), F.col("_vqb")))
                )
            ).alias("cosine"),
        )
        return _rank_topk(scored, k)
    n_dim = F.size("codes")
    sc1 = F.aggregate(
        F.col("codes"), F.lit(0.0), lambda acc, c: acc + c
    )
    sc2 = F.aggregate(
        F.col("codes"), F.lit(0.0), lambda acc, c: acc + c * c
    )
    xn = F.sqrt(
        n_dim * F.col("offset") * F.col("offset")
        + 2.0 * F.col("offset") * F.col("scale") * sc1
        + F.col("scale") * F.col("scale") * sc2
    )
    corpus = side.select(
        F.col(id_col).alias("id_b"),
        "codes",
        "scale",
        "offset",
        _sq8_norm_guard(xn, F.col(id_col), "corpus").alias("_xn"),
    )
    qbase = base.filter(F.col(id_col) < query_ids_max)
    queries = qbase.select(
        F.col(id_col).alias("id_a"),
        F.col("vdbl").alias("_q"),
        F.aggregate(
            F.col("vdbl"), F.lit(0.0), lambda acc, x: acc + x
        ).alias("_qs"),
        _sq8_norm_guard(
            F.sqrt(dot_double(F.col("vdbl"), F.col("vdbl"))),
            F.col(id_col),
            "query",
        ).alias("_qn"),
    )
    dotqc = F.aggregate(
        F.zip_with(F.col("_q"), F.col("codes"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    apx = (F.col("offset") * F.col("_qs") + F.col("scale") * dotqc) / (
        F.col("_qn") * F.col("_xn")
    )
    adc = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", apx.alias("_adc"))
    )
    wa = Window.partitionBy("id_a").orderBy(F.col("_adc").desc(), F.col("id_b"))
    shortlist = (
        adc.withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= refine)
        .select("id_a", "id_b")
    )
    scored = cosine_for_pairs(
        base, shortlist, exact_norms_in_base=False, id_col=id_col
    )
    return _rank_topk(scored, k)
