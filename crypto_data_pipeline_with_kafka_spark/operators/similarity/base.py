"""Shared numeric core of the similarity family: trunc-quantization,
exact-decimal dot products, brute-force cosine top-k, pair verify,
banded random-hyperplane LSH, and the ONE oracle-pinned ranking tail.
Split out of the single similarity module in r11 (mechanical move, no
behavior change); the numeric-determinism and execution-shape contracts
live in the package docstring (__init__.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import widen_if_narrow

# Quantization scale: components become trunc(x * 1e12) integers.
# Truncation (NOT decimal rounding) because float32 data is dyadic —
# e.g. 0.1983642578125 is an EXACT half at decimal scale 12, and Spark
# rounds such ties half-up while DuckDB rounds half-even. trunc() of the
# identical IEEE product x*1e12 can never disagree.
_QSCALE = 1e12
# Prefilter-margin domain bound (every 1e-6 margin below relies on it):
# the emitted value is the exact cosine of the TRUNC-QUANTIZED vectors,
# while prefilters rank the raw-double cosine. Quantization perturbs
# each component by < 1/_QSCALE, so
#   |cos_quantized − cos_raw| ≤ 4·sqrt(dim)/(_QSCALE·n_min)
# (n_min = smallest vector L2 norm in play) plus ~1e-13 of double
# summation error. At dim=64 that is ≈ 3.2e-11/n_min — safely inside
# the 1e-6 margin (≥ 30× headroom) whenever every vector norm ≥ 1e-3.
# Degenerate near-zero vectors (norm < 1e-3) void the two-pass
# exactness proof; the test corpus and any real embedding table are
# orders of magnitude above the bound.
_QDEC = "decimal(14,0)"  # |q| ≤ ~8e12 → 13 digits
# Accumulator precision 37 (not 38): Spark types d(37,0) + d(29,0) as
# d(38,0) without loss; the post-add cast back to d(37,0) is exact
# because dot magnitudes here are << 10^37.
_ACC = "decimal(37,0)"


def quantized_vector(vec_col: Column | str) -> Column:
    """embedding → array<long> of trunc(x_double * 1e12): exact,
    tie-free, identical across engines (double→long truncates toward
    zero in Spark; the oracle uses trunc() explicitly)."""
    return F.transform(
        vec_col, lambda x: (x.cast("double") * F.lit(_QSCALE)).cast("long")
    )


def _dot_exact_decimal(a: Column, b: Column) -> Column:
    """Exact dot product of two quantized (long) vectors, kept as the
    wide DECIMAL — for callers that sum several exact dots before the
    one string-hopped double conversion (see :func:`dot_exact`)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast(_QDEC) * y.cast(_QDEC))
    return F.aggregate(
        prods, F.lit(0).cast(_ACC), lambda acc, x: (acc + x).cast(_ACC)
    )


def dot_exact(a: Column, b: Column) -> Column:
    """Exact dot product of two quantized (long) vectors → double, at
    the quantized scale (the 1e24 factor cancels inside cosine).
    Products run as exact integer decimals (q² overflows int64); the
    final wide-decimal → double conversion hops through a STRING because
    direct decimal→double casts beyond 2^53 round differently by 1 ulp
    per engine, while string→double parses are correctly rounded in
    both."""
    return _dot_exact_decimal(a, b).cast("string").cast("double")


def with_q_and_norm(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    widen: bool = True,
) -> DataFrame:
    """(id, vq, norm_sq): quantized components + exact squared norm
    (at the quantized scale). ``widen=False`` for derived (non-scan)
    inputs — see the widen_if_narrow caller contract."""
    d = (widen_if_narrow(emb, id_col) if widen else emb).select(
        F.col(id_col), quantized_vector(vec_col).alias("vq")
    )
    return d.withColumn("norm_sq", dot_exact(F.col("vq"), F.col("vq")))


def dbl_vector(vec_col: Column | str) -> Column:
    """embedding → double components (exact from float32; the compact
    representation for shuffles and cheap prefilters)."""
    return F.transform(vec_col, lambda x: x.cast("double"))


def dot_double(a: Column, b: Column) -> Column:
    """Primitive double dot product — within ~1e-13 relative of the
    exact value; used ONLY as a prefilter with a margin far wider than
    that, never as an emitted value."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_dbl_and_norm(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    widen: bool = True,
) -> DataFrame:
    """(id, vdbl, norm_sq): double components for cheap pair math +
    EXACT squared norm (right when most corpus rows end up in emitted
    pairs, e.g. all-pairs near-dup — the norm fold amortizes).
    ``widen=False`` for derived (non-scan) inputs — see the
    widen_if_narrow caller contract."""
    d = (widen_if_narrow(emb, id_col) if widen else emb).select(
        F.col(id_col), dbl_vector(vec_col).alias("vdbl")
    )
    q = quantized_vector(F.col("vdbl"))
    return d.withColumn("norm_sq", dot_exact(q, q))


def with_dbl_and_approx_norm(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    widen: bool = True,
) -> DataFrame:
    """(id, vdbl, norm_sq): double components + PRIMITIVE-double squared
    norm at the quantized scale (×1e24). For candidate-generation paths
    where emitted pairs ≪ corpus: the per-row decimal norm fold is
    skipped corpus-wide and exact norms are recomputed only for
    surviving pairs (``cosine_for_pairs(exact_norms_in_base=False)``).
    The ~1e-12 relative norm error is absorbed by the 1e-6 prefilter
    margin and never reaches an emitted value. ``widen=False`` for
    derived (non-scan) inputs — see the widen_if_narrow contract."""
    d = (widen_if_narrow(emb, id_col) if widen else emb).select(
        F.col(id_col), dbl_vector(vec_col).alias("vdbl")
    )
    norm = dot_double(F.col("vdbl"), F.col("vdbl")) * F.lit(1e24)
    return d.withColumn("norm_sq", norm)


def cosine_expr(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    return dot_exact(va, vb) / (F.sqrt(na) * F.sqrt(nb))


def brute_force_topk(
    emb: DataFrame,
    query_ids_max: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    exact_base: bool = False,
) -> DataFrame:
    """Exact cosine top-k for query vectors (id < query_ids_max) against
    the whole corpus (self excluded): broadcast the small query side,
    one array fold per (query, corpus) pair, window top-k.
    Deterministic tie-break on id_b.

    Two-pass exactness: a primitive-double pass ranks all pairs, then
    the expensive exact-decimal fold runs ONLY on pairs within 1e-6 of
    each query's k-th approximate cosine. The approx→exact gap is
    double-summation error (~1e-13) plus the quantization perturbation
    bounded at the _QSCALE comment above (≈3.2e-11/n_min at dim=64) —
    both ≥ 30× inside the margin for any corpus with vector norms
    ≥ 1e-3 — so any excluded pair is provably below ≥ k kept pairs in
    EXACT cosine too: the emitted top-k (values and membership) is
    identical to the all-exact computation, at a fraction of the folds.

    The (id, vdbl, norm_sq) base is persisted so the query and corpus
    sides share one scan; caller owns the cache lifecycle (unpersist /
    clearCache when done — see operators.dedup module doc).
    ``exact_base=True`` says ``emb`` is an already-prepared
    ``with_dbl_and_norm`` output, passed through untouched so
    multi-leg plans share one scan. It is an EXPLICIT caller assertion
    (the module's explicit-contract-over-heuristic rule, see
    _PQServeInputs): the norm feeds the EMITTED exact cosine here, not
    just a margin prefilter, and an approx-norm base
    (``with_dbl_and_approx_norm``) has the IDENTICAL schema — a
    column sniff could not tell them apart and would silently corrupt
    values on the wrong one, so without the flag the base is always
    re-prepared from the vector column."""
    if exact_base:
        base = emb
    else:
        base = with_dbl_and_norm(emb, id_col).persist()
    q = base.select(
        F.col(id_col).alias("id_a"),
        F.col("vdbl").alias("va"),
        F.col("norm_sq").alias("na"),
    ).filter(F.col("id_a") < query_ids_max)
    c = base.select(
        F.col(id_col).alias("id_b"),
        F.col("vdbl").alias("vb"),
        F.col("norm_sq").alias("nb"),
    )
    # norms are at the quantized scale (×1e24); rescale the raw double
    # dot to match (same convention as cosine_for_pairs)
    approx = (dot_double(F.col("va"), F.col("vb")) * F.lit(1e24)) / (
        F.sqrt("na") * F.sqrt("nb")
    )
    # The pair frame carries va/vb through the rank exchange — the
    # sibling serve paths' slim-then-refetch form was tried here and
    # REJECTED with numbers (r11, interleaved A/B at sf0.1: slim
    # 0.98 s vs wide 0.72 s min): with only ~20 query keys the
    # exchange is small in absolute terms and the two candidate-
    # bounded re-fetch joins cost more than the array bytes save.
    # The siblings slim because their pair frames carry MULTIPLE
    # arrays per pair into far wider candidate sets; revisit only if
    # query_ids_max grows orders of magnitude.
    pairs = (
        c.join(F.broadcast(q), F.col("id_a") != F.col("id_b"))
        .withColumn("_apx", approx)
    )
    w_apx = Window.partitionBy("id_a").orderBy(F.col("_apx").desc(), F.col("id_b"))
    # k-th approx score as a SECOND window over the SAME partitioning
    # (the r8 kth-window rule, same form as _exact_adc_topk and
    # _sq8_exact_shortlist): it rides the row_number's exchange/sort,
    # so the crossJoin+score upstream plans once — the previous
    # broadcast-join-back form duplicated that subtree as the kth
    # build side (r11 review finding)
    ranked = pairs.withColumn("_ark", F.row_number().over(w_apx)).withColumn(
        "_kth_apx",
        F.max(F.when(F.col("_ark") == k, F.col("_apx"))).over(
            Window.partitionBy("id_a")
        ),
    )
    cand = ranked.filter(
        F.col("_kth_apx").isNull() | (F.col("_apx") >= F.col("_kth_apx") - 1e-6)
    )
    exact = cand.select(
        "id_a",
        "id_b",
        cosine_expr(
            quantized_vector(F.col("va")),
            quantized_vector(F.col("vb")),
            F.col("na"),
            F.col("nb"),
        ).alias("cosine"),
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


def cosine_for_pairs(
    base_dbl: DataFrame,
    pairs: DataFrame,
    min_cosine: float | None = None,
    exact_norms_in_base: bool = True,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine for an explicit (id_a, id_b) pair list: two hash
    joins to fetch the vectors, one array fold per pair. Cost |pairs|,
    independent of corpus size — the verify stage for every
    candidate-generation scheme.

    With ``min_cosine``, a primitive-double prefilter (margin 1e-6,
    ~7 orders of magnitude above double/decimal divergence) drops
    clearly-under-threshold pairs BEFORE the expensive exact-decimal
    fold — the emitted cosine is always the exact one, so results stay
    bitwise oracle-equal.

    ``exact_norms_in_base=False`` says base_dbl carries approx double
    norms (``with_dbl_and_approx_norm``); the exact norms are then
    recomputed HERE, per surviving pair side — O(emitted pairs) decimal
    folds instead of O(corpus)."""
    a = base_dbl.select(
        F.col(id_col).alias("id_a"), F.col("vdbl").alias("va"), F.col("norm_sq").alias("na")
    )
    b = base_dbl.select(
        F.col(id_col).alias("id_b"), F.col("vdbl").alias("vb"), F.col("norm_sq").alias("nb")
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    if min_cosine is not None:
        # norms are at the quantized scale (×1e24); rescale the raw
        # double dot to match before comparing
        approx = (dot_double(F.col("va"), F.col("vb")) * F.lit(1e24)) / (
            F.sqrt("na") * F.sqrt("nb")
        )
        joined = joined.filter(approx >= min_cosine - 1e-6)
    va_q = quantized_vector(F.col("va"))
    vb_q = quantized_vector(F.col("vb"))
    if exact_norms_in_base:
        na, nb = F.col("na"), F.col("nb")
    else:
        na, nb = dot_exact(va_q, va_q), dot_exact(vb_q, vb_q)
    out = joined.select(
        "id_a",
        "id_b",
        cosine_expr(va_q, vb_q, na, nb).alias("cosine"),
    )
    if min_cosine is not None:
        out = out.filter(F.col("cosine") >= min_cosine)
    return out


def _ensure_ann_base(emb: DataFrame, id_col: str) -> DataFrame:
    """Accept either a raw embeddings relation or an already-prepared
    (id, vdbl, norm_sq) base. Raw input is prepared + persisted here
    (single-variant callers); a prepared base passes through untouched,
    so multi-variant suites share one scan and one cache — in both
    cases the CALLER owns the cache lifecycle."""
    if "vdbl" in emb.columns and "norm_sq" in emb.columns:
        return emb
    return with_dbl_and_approx_norm(emb, id_col).persist()


def _plane_signs(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components: +1 iff the first md5 hex
    digit of f'{plane}_{pos}' (pos 1-based) is even — EXACTLY the
    expression the DuckDB oracle evaluates with its md5(); precomputed
    driver-side so the plan ships plain literals."""
    planes = []
    for p in range(num_planes):
        row = []
        for i in range(1, dim + 1):
            d = hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0]
            row.append(1 if d in "02468ace" else -1)
        planes.append(row)
    return planes


def lsh_buckets(
    emb: DataFrame,
    num_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature: ``num_planes``-bit sign string
    per vector. All projections run in ONE pass over the vector — no
    explosion, no shuffle until the caller groups/joins. ``vec_col``
    may be any numeric array (e.g. an already-projected double vector,
    so callers can share one scan of the source).

    Execution shape: the ±1 planes are packed into one literal int mask
    per POSITION (bit p set iff plane p's sign there is −1), the vector
    is zipped with the masks once, and a single fold lambda — shared by
    all planes via ``transform`` over the plane bit values — computes
    each projection as Σ ±x_i via a bit test. versus the naive
    16-separate-``zip_with``-folds formulation this allocates 1
    intermediate array per row instead of 16 and keeps the codegen'd
    expression tree one-lambda small: measured 2.1× faster on the
    bucket stage at sf0.1, bitwise-identical buckets. Projections of
    quantized longs stay below 2^53 (64 × 8e12), so the long fold is
    exact. Mask literals are Python ints, so ``num_planes`` beyond 31
    promotes them to longs automatically."""
    base = emb.select(F.col(id_col), quantized_vector(vec_col).alias("vq"))
    signs = _plane_signs(num_planes, dim)
    masks = [
        sum((1 << p) for p in range(num_planes) if signs[p][i] < 0)
        for i in range(dim)
    ]
    zipped = F.zip_with(
        F.col("vq"),
        F.array(*[F.lit(m) for m in masks]),
        lambda x, m: F.struct(x.alias("x"), m.alias("m")),
    )
    plane_bits = F.array(*[F.lit(1 << p) for p in range(num_planes)])
    projs = F.transform(
        plane_bits,
        lambda bit: F.aggregate(
            F.col("_zm"),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + F.when(e["m"].bitwiseAND(bit) != 0, -e["x"]).otherwise(e["x"]),
        ),
    )
    return (
        base.withColumn("_zm", zipped)
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(projs, lambda pr: F.when(pr > 0, "1").otherwise("0")),
                "",
            ).alias("bucket"),
        )
    )


def lsh_ann_pairs(
    emb: DataFrame,
    num_planes: int = 16,
    bands: int = 4,
    min_cosine: float = 0.4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN near-neighbor pairs, banded hyperplane LSH: the
    ``num_planes``-bit signature is split into ``bands`` bands; vectors
    sharing ANY band key become candidates (multi-probe recall — the
    MinHash banding trade-off), then exact cosine ≥ threshold is
    verified on candidates only. Returns (id_a, id_b, cosine).

    Scale path: candidate count ~ Σ per-band bucket collisions, never
    corpus²; widen bands at bigger corpora.

    The banding knob, quantified: a pair at cosine c agrees per bit
    with prob p = 1 − arccos(c)/π, survives a width-w band with p^w,
    and is recalled with 1 − (1 − p^w)^bands. At the default 16/4
    (width 4) and threshold 0.4 (p ≈ 0.63) that predicts ~50% recall
    AT the boundary — measured 0.527 on the sf0.1 corpus (920 true
    pairs, precision 1.0 by construction of the verify stage). Low
    thresholds are LSH's weak regime; real near-dup dedup at c ≥ 0.9
    (p ≈ 0.9) supports width 16 with recall 0.87+ per band and
    per-band bucket counts of 2^16 — THAT is the 100-TB operating
    point, and why band width must scale with the threshold, not the
    corpus. For data-adaptive bucketing (measured recall 0.67 on the
    same corpus/threshold at comparable cost) see ``ivf_ann_pairs``.

    One scan of ``emb``: the (id, vdbl, norm_sq) base is computed once
    and persisted — both the bucket/banding stage and the verify stage
    consume it, so the source is read once. Norms in the base are
    APPROX doubles (prefilter-only); exact norms are recomputed inside
    the verify stage for surviving pairs only — O(emitted) decimal
    folds, not O(corpus). Caller owns the cache lifecycle (see
    operators.dedup module doc).

    ``emb`` may also be an ALREADY-PREPARED base (columns ``vdbl`` +
    ``norm_sq``, e.g. from ``with_dbl_and_approx_norm(...).persist()``)
    — then it is consumed as-is, so several ANN variants over the same
    corpus (see ``plans/q_similarity.sim_ann_suite``) share a single
    scan + cache instead of each persisting their own copy."""
    base = _ensure_ann_base(emb, id_col)
    buckets = lsh_buckets(base, num_planes, dim, id_col, vec_col="vdbl")
    width = num_planes // bands
    banded = buckets.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("bucket", 1 + width * b, width).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band_id"), F.col("bk.band_key"))
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return cosine_for_pairs(
        base, cand, min_cosine=min_cosine, exact_norms_in_base=False,
        id_col=id_col,
    )


# all_pairs_cosine is a theta self-join: pairs grow as n²/2. Past this
# many corpus rows the plan is a scale-killer by construction, so refuse
# loudly instead of silently launching ~10^10 folds.
_ALL_PAIRS_MAX_ROWS = 100_000


def _rank_topk(scored: DataFrame, k: int, check_unique: bool = False) -> DataFrame:
    """The serve paths' ONE ranking tail over an (id_a, id_b, cosine)
    relation: (cosine DESC, id_b) deterministic top-k. Oracle-pinned —
    a tie-break change here changes every query path together.

    ``check_unique`` (the pair_scores= paths): a DUPLICATED
    (id_a, id_b) row — a relation scored over a pre-distinct cand, or
    accidentally unioned twice — would fan the ranking out and
    silently displace the true k-th neighbor. A ``count(*)`` window
    over (id_a, id_b) catches EVERY same-pair duplicate, including one
    carrying two different scores (a stale relation unioned with a
    rescored one — those sort non-adjacent, so the previous lag-based
    check missed them, r10). Zero extra exchanges: applied ABOVE the
    rank window, whose hash(id_a) partitioning already satisfies the
    (id_a, id_b) clustered-distribution requirement — the planner adds
    only an in-partition sort (plan-asserted in the tests)."""
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    if check_unique:
        dup = F.count(F.lit(1)).over(Window.partitionBy("id_a", "id_b")) > 1
        ranked = ranked.withColumn(
            "rnk",
            F.when(
                dup,
                F.raise_error(
                    "pair_scores= holds duplicate (id_a, id_b) rows — "
                    "score a UNIQUE candidate list (distinct cand) once"
                ).cast("int"),
            ).otherwise(F.col("rnk")),
        )
    return (
        ranked.filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


def all_pairs_cosine(
    emb: DataFrame,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    max_corpus_rows: int = _ALL_PAIRS_MAX_ROWS,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (brute force, id_a < id_b) —
    ground truth for the ANN variants; O(n²) array folds, only for
    modest corpora or as a per-bucket subroutine. Double prefilter +
    exact-decimal emit, like cosine_for_pairs.

    Guarded against large corpora (same loud-failure pattern as the
    simhash lane bound, operators/dedup.py): a one-row count aggregate
    is broadcast-joined into the pair plan and ``raise_error``s at
    execution time when the corpus exceeds ``max_corpus_rows`` — the
    scale path for big corpora is ``lsh_ann_pairs``. The guard is lazy
    (no extra driver action) and costs one map-side count."""
    base = with_dbl_and_norm(emb, id_col)
    n = F.count(F.lit(1))
    guard = base.agg(
        F.when(n <= max_corpus_rows, F.lit(1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("all_pairs_cosine: corpus has "),
                    n.cast("string"),
                    F.lit(
                        f" rows (> {max_corpus_rows}); this is the O(n²) "
                        "ground-truth baseline — use lsh_ann_pairs for "
                        "large corpora, or raise max_corpus_rows "
                        "explicitly"
                    ),
                )
            )
        )
        .alias("_apc_ok")
    )
    pairs = (
        base.select(F.col(id_col).alias("id_a"))
        .join(base.select(F.col(id_col).alias("id_b")), F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(guard), F.col("_apc_ok") == 1)
        .drop("_apc_ok")
    )
    return cosine_for_pairs(base, pairs, min_cosine=min_cosine, id_col=id_col)


