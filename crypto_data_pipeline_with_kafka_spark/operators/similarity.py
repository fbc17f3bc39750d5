"""Embedding similarity search (LLM-pipeline operator family):
brute-force cosine top-k as the exactness baseline, banded
random-hyperplane LSH as the scale path, and cosine near-dup pairing.

Numeric determinism: float32 components are quantized to
trunc(x·1e12) integers (tie-free — decimal rounding of dyadic floats
ties, and engines break ties differently); dots and norms accumulate as
exact integer decimals with one string-hopped cast to double at the
end — so Spark and the DuckDB oracle agree BITWISE, and rank order
(hence top-k membership) is identical across engines. Cosine is
scale-invariant, so the 1e24 factor cancels.

Execution shape: the hot path is array-native — ``zip_with`` +
``aggregate`` folds inside whole-stage codegen. Vectors are never
posexploded into (id, pos, v) rows, so a pair costs one array fold,
not a 64-row shuffle. At 100 TB: brute-force is O(queries × corpus)
and only for small query sets; the banded-LSH variant buckets the
corpus once and joins within buckets, with band width as the
recall/candidate-volume knob.
"""

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
    clearCache when done — see operators.dedup module doc). An
    already-prepared (id, vdbl, norm_sq) base passes through untouched
    so multi-leg plans share one scan — it MUST carry EXACT norms
    (``with_dbl_and_norm``): the norm feeds the emitted exact cosine
    here, not just a margin prefilter, so an approx-norm base
    (``with_dbl_and_approx_norm``) would silently corrupt values."""
    if "vdbl" in emb.columns and "norm_sq" in emb.columns:
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
    pairs = (
        c.join(F.broadcast(q), F.col("id_a") != F.col("id_b"))
        .withColumn("_apx", approx)
    )
    w_apx = Window.partitionBy("id_a").orderBy(F.col("_apx").desc(), F.col("id_b"))
    ranked = pairs.withColumn("_ark", F.row_number().over(w_apx))
    kth = ranked.filter(F.col("_ark") == k).select(
        "id_a", F.col("_apx").alias("_kth_apx")
    )
    cand = ranked.join(F.broadcast(kth), "id_a", "left").filter(
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


def resolve_num_centroids(base: DataFrame, num_centroids) -> int:
    """IVF cell-count tuning: pass an int to use it verbatim, or
    ``"auto"`` to apply the C ∝ sqrt(corpus) rule — C = ceil(sqrt(n))
    clamped to [32, 65536]. The rule is what keeps per-cell candidate
    volume flat as the corpus grows (SCALE.md's 10× measurement: a
    FIXED C at 10× data cost 2.7× more wall than the sqrt-scaled C).
    ``"auto"`` spends ONE count job over the corpus — at deploy scale,
    prefer passing the known corpus cardinality's sqrt explicitly so
    index builds stay probe-free."""
    if num_centroids == "auto":
        import math

        n = base.count()
        return max(32, min(65536, math.isqrt(max(n - 1, 0)) + 1))
    return int(num_centroids)


def _seed_centroids(base: DataFrame, num_centroids: int, id_col: str) -> DataFrame:
    """Deterministic seeded centroid pick: the ``num_centroids`` corpus
    vectors with the smallest md5(id) — a seeded pseudo-random draw, the
    standard bootstrap before Lloyd iterations. Returns
    (centroid_id, cvec<array<double>>). The pick plans as
    TakeOrderedAndProject (partial top-C per partition, never a global
    sort); row_number runs over the C picked rows only."""
    seed_key = F.md5(F.col(id_col).cast("string"))
    picked = base.orderBy(seed_key, F.col(id_col)).limit(num_centroids)
    rank_w = Window.orderBy(seed_key, F.col(id_col))
    return picked.select(
        F.row_number().over(rank_w).alias("centroid_id"),
        F.col("vdbl").alias("cvec"),
    )


def lloyd_refined_centroids(
    emb: DataFrame,
    num_centroids: int = 32,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """K-means (Lloyd) refinement of the seeded IVF centroids —
    ``rounds`` assign-and-average iterations. Returns
    (centroid_id, cvec) for ``ivf_assignments(centroids=...)`` /
    ``ivf_ann_pairs(lloyd_rounds=...)``. Cell assignment needs cluster
    COVERAGE, not optimality, so a couple of rounds is the whole
    point — this bounds the iteration count by construction.

    Deterministic by design (same corpus → bitwise-same centroids, so
    refined-IVF results stay reproducible and testable like everything
    else in this module):

    * assignment: in-row argmax of the primitive-double cosine against
      the broadcast packed centroids, ties to the SMALLER centroid_id
      (the packed array is sorted by centroid_id and the fold keeps the
      incumbent on equality). Per-row array folds have a fixed
      left-to-right order — no shuffle-order dependence.
    * averaging: per-(centroid, dimension) sums of the trunc(x·1e12)
      quantized longs as exact DECIMAL(28,0) via posexplode +
      groupBy(centroid_id, pos) — map-side combined (the shuffle
      carries ≤ partitions × C × dim pre-aggregated rows, never the
      corpus × dim explode), overflow-free (|q|·n ≤ 8e12·10¹⁵ < 10²⁸).
      This shape is dimension-scalable: C × dim ROWS, not dim AGG
      COLUMNS (a per-dimension column list is a codegen/planner hazard
      past a few hundred dims). Means reassemble with sort_array over
      (pos, mean) structs — positional, deterministic. Each sum takes
      one string-hopped cast to double (correctly rounded — a direct
      wide-decimal→double cast is not) and the (sum / n) / 1e12
      division chain; exact integer sums make the mean independent of
      partitioning and merge order.
    * empty cells keep their previous centroid (left join + coalesce),
      so centroid_id stays a dense 1..C.

    Execution shape per round: one broadcast of the O(C) packed
    centroids, one groupBy(centroid_id, pos) shuffle emitting ≤ C·dim
    rows, one groupBy(centroid_id) reassembly of ≤ C rows, one O(C)
    left join. The corpus is re-scanned once per round — persist the
    (id, vdbl) base (or pass an already-persisted ANN base) for
    multi-round refinement. Each round's O(C) centroid relation is
    eagerly ``localCheckpoint``-ed: the round job is tiny, truncating
    lineage keeps later rounds' plans flat (a persisted-only chain
    re-analyzes every earlier round per action), and the blocks are
    reclaimed by the ContextCleaner — no caller-side cache lifecycle.

    ``dim`` is accepted for API stability but no longer needed (the
    positional aggregation never enumerates dimensions in the plan).
    Reference: the IVF bootstrap in ``ivf_assignments`` (SCALE.md notes
    a deployment would add exactly these rounds)."""
    del dim  # dimensionality never appears in the plan anymore
    base = emb.select(F.col(id_col), dbl_vector(vec_col).alias("vdbl"))
    num_centroids = resolve_num_centroids(base, num_centroids)
    cents = _seed_centroids(base, num_centroids, id_col)
    for _ in range(rounds):
        packed = cents.select(
            "centroid_id",
            "cvec",
            dot_double(F.col("cvec"), F.col("cvec")).alias("cn2"),
        ).agg(
            F.sort_array(
                F.collect_list(F.struct("centroid_id", "cvec", "cn2"))
            ).alias("_cs")
        )
        scored = base.crossJoin(F.broadcast(packed))
        sc = F.transform(
            F.col("_cs"),
            lambda c: F.struct(
                c["centroid_id"].alias("cid"),
                (dot_double(F.col("vdbl"), c["cvec"]) / F.sqrt(c["cn2"])).alias(
                    "s"
                ),
            ),
        )
        # strict > keeps the first (smallest-cid) maximum — deterministic
        best = F.aggregate(
            sc,
            F.struct(
                F.lit(None).cast("integer").alias("cid"),
                F.lit(float("-inf")).alias("s"),
            ),
            lambda acc, c: F.when(c["s"] > acc["s"], c).otherwise(acc),
        )
        assigned = scored.select(
            best["cid"].alias("centroid_id"),
            quantized_vector(F.col("vdbl")).alias("_vq"),
        )
        dim_sums = assigned.select(
            "centroid_id", F.posexplode("_vq").alias("pos", "_q")
        ).groupBy("centroid_id", "pos").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_q").cast("decimal(28,0)")).alias("_s"),
        )
        mean_el = (
            F.col("_s").cast("string").cast("double") / F.col("_n")
        ) / F.lit(_QSCALE)
        means = (
            dim_sums.select(
                "centroid_id",
                F.struct(F.col("pos"), mean_el.alias("m")).alias("_pm"),
            )
            .groupBy("centroid_id")
            .agg(F.sort_array(F.collect_list("_pm")).alias("_pms"))
            .select(
                "centroid_id",
                F.transform(F.col("_pms"), lambda s: s["m"]).alias("mvec"),
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("mvec"), F.col("cvec")).alias("cvec"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_assignments(
    emb: DataFrame,
    num_centroids: int = 32,
    probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    with_rank: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """IVF (inverted-file) cell assignment — the data-adaptive
    alternative to hyperplane LSH bucketing. Returns (id, centroid_id)
    with ``probes`` rows per vector (its top-``probes`` nearest
    centroids by double cosine). ``carry_cols`` names extra ``emb``
    columns to ride along on every output row (assignment is per-row,
    so carrying them costs nothing and saves the caller a self-join —
    the retrain re-assignment pass keeps ``batch_id`` this way).

    Centroids are a DETERMINISTIC one-pass sample: the ``num_centroids``
    corpus vectors with the smallest md5(id) — a seeded pseudo-random
    draw, the standard bootstrap before Lloyd iterations (available via
    ``lloyd_refined_centroids`` / the ``centroids`` parameter; coverage,
    not optimality, is what IVF needs, so the bootstrap alone is a valid
    configuration). No Date.now()/rand(): same corpus → same cells, so
    results are reproducible and testable.

    Execution shape at 100 TB: the centroid pick plans as
    TakeOrderedAndProject (orderBy + limit — partial top-C per
    partition, never a global sort); the centroid table is
    O(num_centroids) — genuinely broadcastable, unlike a corpus
    relation — and is packed into ONE array-of-structs row, so the
    whole top-P selection happens INSIDE each corpus row with array
    higher-order functions: score C centroids, sort, filter to the
    boundary set, re-score exactly, slice P, explode. ZERO shuffles —
    the naive formulation (cross join to corpus×C rows, then two
    ``row_number`` windows partitioned by vector id) shuffles 32× the
    corpus twice; this one touches the exchange only at the O(C)
    centroid pick. Ranking uses dot/|centroid| only (the query
    vector's norm is constant across centroids, so it cannot change
    the argmax — one fold per pair, not three). Probing the top-P
    cells (multi-probe) recovers boundary pairs that split across
    adjacent cells — the IVF analogue of LSH's multiple bands.

    Assignment scores are EXACT (quantized-decimal dots with the
    string-hopped double conversion, like every emitted cosine): a
    primitive-double score would rank identically almost always, but
    'almost' is not oracle-exact — summation order differs across
    engines, and a 1-ulp flip at the P-th probe boundary would change
    the candidate set. Exact scores make even the probe assignment
    value-checkable in DuckDB — via the same two-pass trick as
    ``brute_force_topk``: a primitive-double pass ranks all C scores,
    and the exact-decimal fold runs only on centroids within a margin
    of the P-th approximate score (scores live at the ×1e12 quantized
    scale, where the double+quantization gap is ≤ ~15; the 1e6 margin
    — 1e-6 at raw scale — has ~6e4× headroom), so the selected probes
    are provably the all-exact ones at a third of the folds.

    When the corpus has fewer than ``probes`` centroids every cell is
    probed (the DuckDB oracle's ``row_number ... <= probes`` reading —
    a degenerate configuration, but the engines agree on it).

    ``centroids`` (optional) supplies an external (centroid_id, cvec)
    relation — e.g. ``lloyd_refined_centroids`` — in place of the
    seeded pick; the registered oracle-checked query keeps the seeded
    default (whose pick is SQL-replicable), a deployment passes
    refined centroids for better cell balance."""
    carry = [F.col(c) for c in carry_cols]
    base = emb.select(F.col(id_col), *carry, dbl_vector(vec_col).alias("vdbl"))
    cents0 = (
        centroids
        if centroids is not None
        else _seed_centroids(
            base, resolve_num_centroids(base, num_centroids), id_col
        )
    )
    cq = quantized_vector(F.col("cvec"))
    cents = cents0.select(
        "centroid_id",
        "cvec",
        cq.alias("cvq"),
        F.sqrt(dot_exact(cq, cq)).alias("cnorm"),  # = |c|·1e12, exact
    )
    # one row, C structs; sort_array orders by centroid_id (first
    # struct field), making the packed order deterministic
    packed = cents.agg(
        F.sort_array(
            F.collect_list(F.struct("centroid_id", "cvec", "cvq", "cnorm"))
        ).alias("_cs")
    )
    # pass 1: primitive-double score per centroid at the ×1e12 scale,
    # computed inside the row (C folds, no row multiplication yet)
    scored = base.crossJoin(F.broadcast(packed)).select(
        F.col(id_col),
        *carry,
        quantized_vector(F.col("vdbl")).alias("_vq"),
        F.transform(
            F.col("_cs"),
            lambda c: F.struct(
                c["centroid_id"].alias("cid"),
                c["cvq"].alias("cvq"),
                c["cnorm"].alias("cnorm"),
                (
                    (dot_double(F.col("vdbl"), c["cvec"]) * F.lit(1e24))
                    / c["cnorm"]
                ).alias("apx"),
            ),
        ).alias("_sc"),
    )
    # P-th best approx VALUE (ties at the value cannot change the
    # ≥ pth − margin boundary set); null-safe when C < probes
    pth = F.coalesce(
        F.get(
            F.sort_array(
                F.transform(F.col("_sc"), lambda s: s["apx"]), asc=False
            ),
            F.lit(probes - 1),
        ),
        F.lit(float("-inf")),
    )
    bounded = scored.select(
        F.col(id_col),
        *carry,
        "_vq",
        F.filter(
            F.col("_sc"), lambda s: s["apx"] >= pth - F.lit(1e6)
        ).alias("_near"),
    )
    # pass 2: exact-decimal score on the boundary set only, then the
    # in-row top-P: sort by (score desc, centroid asc), slice, explode
    exact = F.transform(
        F.col("_near"),
        lambda s: F.struct(
            s["cid"].alias("cid"),
            (dot_exact(F.col("_vq"), s["cvq"]) / s["cnorm"]).alias("score"),
        ),
    )
    by_score_desc = lambda l, r: (  # noqa: E731
        F.when(l["score"] > r["score"], F.lit(-1))
        .when(l["score"] < r["score"], F.lit(1))
        .when(l["cid"] < r["cid"], F.lit(-1))
        .when(l["cid"] > r["cid"], F.lit(1))
        .otherwise(F.lit(0))
    )
    top = F.slice(F.array_sort(exact, by_score_desc), 1, probes)
    if with_rank:
        # probe_rank 1..P (1 = the nearest cell) — lets one assignment
        # serve both the pair path (all probes) and the query path's
        # corpus index (rank 1 only) without a second scoring pass
        return bounded.select(
            F.col(id_col), *carry, F.posexplode(top).alias("_pos", "_pr")
        ).select(
            F.col(id_col),
            *carry,
            F.col("_pr.cid").alias("centroid_id"),
            (F.col("_pos") + 1).cast("int").alias("probe_rank"),
        )
    return bounded.select(
        F.col(id_col), *carry, F.explode(top).alias("_pr")
    ).select(F.col(id_col), *carry, F.col("_pr.cid").alias("centroid_id"))


def ivf_ann_pairs(
    emb: DataFrame,
    num_centroids: int = 32,
    probes: int = 3,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    lloyd_rounds: int = 0,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """ANN near-neighbor pairs via IVF cells: vectors probing a common
    centroid become candidates; exact cosine ≥ threshold is verified on
    candidates only (same two-stage contract as ``lsh_ann_pairs``, so
    precision is 1.0 by construction and emitted cosines are
    decimal-exact). Returns (id_a, id_b, cosine).

    vs LSH banding: cells adapt to the DATA (a clustered corpus gets
    clustered cells) instead of fixed random hyperplanes, so recall at
    low thresholds is data-dependent rather than bounded by the
    p^width collision curve; candidate volume ~ Σ cell_size² /
    num_centroids-ish, tuned by num_centroids ∝ sqrt(corpus) as in IVF
    indexes. One scan: the (id, vdbl, norm) base is persisted and
    feeds assignment and verify; caller owns the cache lifecycle (see
    operators.dedup module doc). Like ``lsh_ann_pairs``, ``emb`` may be
    an already-prepared (vdbl, norm_sq) base to share one scan across
    variants. ``lloyd_rounds`` > 0 refines the seeded centroids with
    that many k-means rounds (``lloyd_refined_centroids``) before
    assignment — better cell balance on clustered corpora; the
    registered oracle query keeps 0 so the centroid pick stays
    SQL-replicable. ``assignments`` supplies a precomputed
    (id, centroid_id[, probe_rank]) relation (``ivf_assignments`` over
    the same base) so multi-variant suites score the corpus once."""
    base = _ensure_ann_base(emb, id_col)
    if assignments is None:
        num_centroids = resolve_num_centroids(base, num_centroids)
        cents = (
            lloyd_refined_centroids(
                base, num_centroids, lloyd_rounds, id_col, vec_col="vdbl"
            )
            if lloyd_rounds > 0
            else None
        )
        assignments = ivf_assignments(
            base, num_centroids, probes, id_col, vec_col="vdbl", centroids=cents
        )
    assign = assignments.select(F.col(id_col), "centroid_id")
    a = assign.select(F.col(id_col).alias("id_a"), "centroid_id")
    b = assign.select(F.col(id_col).alias("id_b"), "centroid_id")
    cand = (
        a.join(b, "centroid_id")
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


def ivf_candidate_pairs(
    assignments: DataFrame,
    query_ids_max: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b): each query's probed-cell candidate list from ONE
    ranked ``ivf_assignments(..., with_rank=True)`` relation — the
    corpus index is the ``probe_rank == 1`` slice, the query side its
    ``id < query_ids_max`` rows, and a pair is a query meeting a
    corpus row in a shared cell (self excluded). This is the SHARED
    first stage of every IVF serve path: pass it (ideally
    ``localCheckpoint``-ed) as ``cand=`` to :func:`ivf_topk` and
    :func:`ivf_pq_topk` so a suite running the exact, raw-PQ, and
    residual-PQ query paths derives the candidate join ONCE instead
    of once per leg (r9 job audit: each un-shared derivation is 2-3
    AQE stage materializations of size-independent overhead). No
    distinct needed: the corpus side is one rank-1 row per id and the
    query side one row per (id, probed centroid), so each (id_a, id_b)
    arises from at most one shared cell."""
    corpus_cells = assignments.filter(F.col("probe_rank") == 1).select(
        F.col(id_col), "centroid_id"
    )
    query_cells = assignments.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col), "centroid_id"
    )
    return (
        query_cells.select(F.col(id_col).alias("id_a"), "centroid_id")
        .join(
            corpus_cells.select(F.col(id_col).alias("id_b"), "centroid_id"),
            "centroid_id",
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids_max: int = 20,
    k: int = 5,
    num_centroids: int = 32,
    probes: int = 3,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
    cand: DataFrame | None = None,
    pair_scores: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed ANN top-k — the QUERY-path scale twin of
    ``brute_force_topk`` (same API: query vectors are the corpus rows
    with id < ``query_ids_max``, self excluded, deterministic id_b
    tie-break): the corpus is assigned ONCE to its single nearest cell
    (this is the reusable index — persist it, or write (id, centroid_id)
    to the warehouse and share it across query batches), each query
    multi-probes its top-``probes`` cells, and only the probed cells'
    members are exactly re-scored. Candidates per query ≈ the probed
    cells' sizes — sublinear in the corpus, vs brute force's full scan
    per query. Recall is the IVF trade: a true neighbor living outside
    every probed cell is missed; raise ``probes`` (or refine centroids
    via ``lloyd_refined_centroids``/``centroids``) to buy recall with
    candidate volume. Emitted cosines are the same exact-decimal values
    as the brute-force path, so hits agree bitwise with
    ``brute_force_topk`` on the overlap (test-pinned with measured
    recall).

    ``assignments`` supplies one precomputed
    ``ivf_assignments(..., probes=<this probes>, with_rank=True)``
    relation over the same base: the corpus index is its
    ``probe_rank == 1`` slice and the query probes its ``id <
    query_ids_max`` rows — a suite running both the pair path and the
    query path then scores the corpus against the centroids ONCE.
    ``cand`` supplies the (id_a, id_b) candidate list directly (an
    :func:`ivf_candidate_pairs` output, ideally pinned) — a suite
    running several serve paths then derives the candidate join once.
    ``pair_scores`` goes one step further: the EXACT-cosine scored
    candidate relation itself (``cosine_for_pairs(base, cand, ...)``,
    pinned), covering exactly this call's candidate pairs — the
    re-rank fold then runs once per suite instead of once per leg
    (:func:`ivf_pq_topk` takes the same relation for its shortlist
    re-rank). ``cand`` is REQUIRED alongside — it is the reference
    list the coverage guard checks ``pair_scores`` against (every
    candidate pair must appear — a relation scored under a min_cosine
    or from a stale cand raises in-plan instead of silently serving
    the wrong candidate set). Unlike :func:`ivf_pq_topk`, which always
    derives a shortlist to validate against, this path alone has NO
    other reference: a bare pair_scores scored over a different probe
    count or query set would rank verbatim and serve a silently
    different candidate set, so the bare form is refused (r10, was a
    documented asymmetry)."""
    if pair_scores is not None:
        if cand is None:
            raise ValueError(
                "pair_scores= without cand=: ivf_topk would rank the "
                "supplied relation verbatim with no coverage check — a "
                "relation scored over a different probe count or query "
                "set serves a silently different candidate set. Pass "
                "the cand= the relation was scored over (ivf_pq_topk "
                "validates against its own derived shortlist; this "
                "path has no other reference list)"
            )
        # no base derivation (and no orphaned persist); shares the
        # ranking tail below so the oracle-pinned tie-break rule has
        # exactly one definition. Duplicate-pair fan-out is refused
        # in-plan by the tail's uniqueness window (rides the rank
        # exchange)
        scored = cand.join(pair_scores, ["id_a", "id_b"], "left").select(
            "id_a",
            "id_b",
            F.when(
                F.col("cosine").isNull(),
                F.raise_error(
                    "pair_scores= does not cover cand=: score the "
                    "SAME candidate list (no min_cosine filter)"
                ).cast("double"),
            )
            .otherwise(F.col("cosine"))
            .alias("cosine"),
        )
        return _rank_topk(scored, k, check_unique=True)
    base = _ensure_ann_base(emb, id_col)
    if cand is None:
        if assignments is not None:
            cand = ivf_candidate_pairs(assignments, query_ids_max, id_col)
        else:
            if centroids is None:
                # resolve only when actually seeding — 'auto' with
                # supplied centroids (the load_ivf_index serve path)
                # must not spend a corpus count whose result is
                # discarded
                num_centroids = resolve_num_centroids(base, num_centroids)
                cents = _seed_centroids(base, num_centroids, id_col)
            else:
                cents = centroids
            corpus_cells = ivf_assignments(
                base, num_centroids, probes=1, id_col=id_col, vec_col="vdbl",
                centroids=cents,
            )
            qbase = base.filter(F.col(id_col) < query_ids_max)
            query_cells = ivf_assignments(
                qbase, num_centroids, probes=probes, id_col=id_col,
                vec_col="vdbl", centroids=cents,
            )
            # NO distinct (see ivf_candidate_pairs — same structural
            # uniqueness; a dedup here was one of the ivfpq leg's ~7
            # size-independent shuffle stages, r9 job audit)
            cand = (
                query_cells.select(F.col(id_col).alias("id_a"), "centroid_id")
                .join(
                    corpus_cells.select(
                        F.col(id_col).alias("id_b"), "centroid_id"
                    ),
                    "centroid_id",
                )
                .filter(F.col("id_a") != F.col("id_b"))
                .select("id_a", "id_b")
            )
    scored = cosine_for_pairs(base, cand, exact_norms_in_base=False, id_col=id_col)
    return _rank_topk(scored, k)


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


# ------------------------------------------------- IVF index persistence


def save_ivf_index(centroids: DataFrame, assignments: DataFrame, path: str) -> None:
    """Persist a trained IVF index for reuse across query batches,
    sessions, and jobs — the train-once/query-forever deployment shape
    ``ivf_topk``'s docstring promises. Two-table parquet layout:
    ``centroids/`` (centroid_id, cvec) and ``assignments/`` (id,
    probe_rank) PARTITIONED BY centroid_id — a serve-time read of one
    probed cell's inverted list prunes to that cell's directory
    (PartitionFilters, plan-tested), which is exactly the IVF access
    pattern. Overwrite mode, so re-training is idempotent.

    At 100 TB the assignments table is one row per corpus vector per
    probe; partition count = num_centroids (tuned ∝ sqrt(corpus)),
    each a sequential columnar read. The centroid table is O(C) and
    broadcastable on load."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    (
        assignments.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/assignments")
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read back ``(centroids, assignments)`` written by
    :func:`save_ivf_index`, ready to pass into ``ivf_topk``/
    ``ivf_ann_pairs`` via their ``centroids=``/``assignments=`` hooks.
    The partition-discovered ``centroid_id`` is cast back to the
    writer-side int so joins/filters line up typed."""
    cents = spark.read.parquet(f"{path}/centroids")
    assigns = spark.read.parquet(f"{path}/assignments").withColumn(
        "centroid_id", F.col("centroid_id").cast("int")
    )
    return cents, assigns


def incremental_ivf_update(
    new_vectors: DataFrame,
    store_dir: str,
    batch_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    min_cosine: float = 0.8,
    probes: int = 1,
    pq_codebooks: DataFrame | None = None,
) -> DataFrame:
    """Index an ARRIVING embedding batch against a persisted IVF store
    and flag each new vector's best earlier near-duplicate — the dense
    twin of ``operators.dedup.incremental_minhash_dedup`` (same
    operational shape: a 100-TB corpus is never re-indexed from
    scratch; new data joins a persisted index).

    ``probes`` is the recall knob, applied ASYMMETRICALLY the way IVF
    serving does: every vector is INDEXED at its single primary cell
    (the store layout never multiplies), while the ARRIVING batch
    probes its top-``probes`` cells for candidates — a pair is
    examined iff the LATER side's probe set contains the EARLIER
    side's primary cell (within a batch, later = larger id; across
    batches, later = later arrival). Cell assignment is a pure
    function of the vector, so at ``probes > 1`` the flag set is
    batching-invariant UNDER THE STORE'S ARRIVAL CONTRACT — batches
    in increasing (batch_id, id) order, the same contract the minhash
    store documents. Out-of-order arrival still flags every pair
    whose later-ARRIVING member probes the earlier one's primary
    cell; the orientation just follows arrival instead of id.
    ``probes=1`` (the default, and the registered contract) is
    orientation-free — both sides sit at one cell — so its
    batching-invariance needs no arrival-order caveat.

    Store layout under ``store_dir``: ``centroids/`` (the trained cell
    centers — written from the ``centroids`` argument on the FIRST call
    or by a prior ``save_ivf_index``; re-passing centroids later
    re-trains the geometry and invalidates earlier cells, so don't) and
    ``cells/batch_id=N/centroid_id=C/`` — the inverted lists WITH their
    vectors (id, vec), the standard IVF payload, partitioned so a
    cell's list is one directory read.

    Per batch: assign the batch to its primary cells (broadcast O(C)
    centroids, in-row top-1 — zero shuffles, see ``ivf_assignments``);
    candidates = same-cell pairs, batch-vs-earlier (index scanned,
    batch side broadcast — the index is NEVER shuffled) plus
    within-batch (earlier = smaller id); exact-cosine verify on
    candidates only; flag each new vector's best earlier match
    (max cosine ≥ ``min_cosine``, ties to the smallest id). Writes
    OVERWRITE only this batch's own partitions and every index read
    prunes to ``batch_id < batch_id`` at planning time, so the step is
    idempotent under foreachBatch redelivery and crash-safe — the same
    contract (and the same batching-invariance argument) as the
    minhash store: cell assignment and pairwise cosine are per-row /
    per-pair deterministic, so WHEN a pair's members arrive doesn't
    change whether it is flagged, and the union of incremental flags
    equals the one-shot ``ivf_ann_pairs`` derivation at probes=1
    (pytest-pinned).

    ``pq_codebooks`` opts the store into the IVF-PQ serve layout: the
    codebooks (a ``pq_train`` output — train them ONCE over a bootstrap
    corpus, the same fixed-geometry contract as ``centroids``) are
    persisted at ``pq_codebooks/`` on the first call, each batch's
    vectors are PQ-encoded in the same pass that assigns cells, and the
    cell rows carry an extra ``codes array<int>`` column — so a serve
    job (:func:`read_ivf_pq_store` → :func:`ivf_pq_topk`) scans 8-byte
    codes instead of full vectors. Like centroids, re-passing
    codebooks later re-trains the code geometry and stales earlier
    batches' codes, so don't. The dedup flag path is unchanged (exact
    cosine over full vectors); codes are a serving artifact.

    Returns the flagged rows (id, match_id, cosine) read back from the
    flag store."""
    spark = new_vectors.sparkSession
    # local import: sources.sinks ← operators would be circular the other way
    from crypto_data_pipeline_with_kafka_spark.sources.sinks import target_exists

    cpath = f"{store_dir}/centroids"
    cells_path = f"{store_dir}/cells"
    books_path = f"{store_dir}/pq_codebooks"
    if centroids is not None:
        centroids.write.mode("overwrite").parquet(cpath)
    elif not target_exists(spark, cpath):
        raise ValueError(
            f"no trained centroids at {cpath}: pass centroids= on the "
            "first call (e.g. from lloyd_refined_centroids / "
            "_seed_centroids over a bootstrap corpus) or save_ivf_index "
            "first — incremental updates require a fixed cell geometry"
        )
    cents = spark.read.parquet(cpath)
    if pq_codebooks is not None:
        if target_exists(spark, f"{store_dir}/cells") and "codes" not in (
            spark.read.parquet(f"{store_dir}/cells").columns
        ):
            # a mixed store is worse than either pure layout: code-less
            # early batches would serve NULL ADC scores (silently
            # unreachable vectors) or lose the coded batches' codes on
            # retrain, depending on which batch schema a reader samples
            raise ValueError(
                f"pq_codebooks= on a store whose existing cells at "
                f"{store_dir}/cells carry no codes: enable PQ from the "
                "store's FIRST batch — earlier batches' vectors were "
                "never encoded and cannot be served by ADC; rebuild "
                "the store (retrain_ivf_store will not backfill codes)"
            )
        pq_codebooks.write.mode("overwrite").parquet(books_path)
    books = (
        spark.read.parquet(books_path)
        if target_exists(spark, books_path)
        else None
    )

    if new_vectors.isEmpty():
        # P7 guard, same reasoning as foreach_batch_idempotent_append:
        # a partitionBy write of zero rows creates a parquet-less
        # cells/batch_id=N dir (just _SUCCESS) that would poison every
        # later batch's schema inference on the index read.
        return (
            new_vectors.select(F.col(id_col).alias("vec_id"))
            .withColumn("match_id", F.col("vec_id"))
            .withColumn("cosine", F.lit(None).cast("double"))
            .limit(0)
        )

    base_new = with_dbl_and_approx_norm(
        new_vectors.select(F.col(id_col).alias("vec_id"), vec_col),
        "vec_id",
        vec_col,
    ).persist()
    assign_new = ivf_assignments(
        base_new,
        probes=probes,
        id_col="vec_id",
        vec_col="vdbl",
        centroids=cents,
        with_rank=True,
    ).persist()
    primary_new = assign_new.filter(F.col("probe_rank") == 1)

    def read_earlier(keep_batch: bool = False) -> DataFrame:
        # batch_id is a partition dir: pruned at planning time, so a
        # redelivered/half-written current batch is never scanned
        df = (
            spark.read.parquet(cells_path)
            .filter(F.col("batch_id") < batch_id)
            .withColumn("centroid_id", F.col("centroid_id").cast("int"))
        )
        return df if keep_batch else df.drop("batch_id")

    # earlier side (id_a) sits at its PRIMARY cell; the arriving side
    # (id_b) brings all its probe cells — the asymmetric serve rule
    new_a = primary_new.select(F.col("vec_id").alias("id_a"), "centroid_id")
    new_b = assign_new.select(F.col("vec_id").alias("id_b"), "centroid_id")
    cand = (
        new_a.join(F.broadcast(new_b), "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    have_store = target_exists(spark, cells_path)
    if have_store:
        old_a = read_earlier().select(F.col("vec_id").alias("id_a"), "centroid_id")
        cand = cand.unionByName(
            old_a.join(F.broadcast(new_b), "centroid_id")
            # an id re-ingested in a later batch meets its indexed self
            # here — never flag a row as its own duplicate
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
        )
    cand = cand.distinct().persist()

    # verify base: the batch plus ONLY the candidate earlier vectors
    # (left-semi key-pruned store read — O(candidates), not O(index));
    # no forced broadcast on the collision-bounded candidate list (AQE
    # decides), mirroring the minhash store's skew reasoning.
    base_all = base_new
    if have_store:
        # a re-ingested id's CURRENT vector (this batch) is
        # authoritative — anti-join its stored earlier vector out so
        # the cosine verify never runs against the stale one
        ids_a = cand.select(F.col("id_a").alias("vec_id")).distinct()
        old_vecs = (
            read_earlier(keep_batch=True)
            .drop("centroid_id")
            .join(ids_a, "vec_id", "left_semi")
            .join(base_new.select("vec_id"), "vec_id", "left_anti")
            # an id re-ingested across EARLIER batches has one stored
            # row per ingest; latest batch wins (candidate-bounded agg)
            .groupBy("vec_id")
            .agg(F.max_by(vec_col, "batch_id").alias(vec_col))
        )
        base_all = base_new.unionByName(
            # widen=False: old_vecs is a derived plan (store read +
            # left-semi join); the widen probe would materialize those
            # stages under AQE just to count partitions
            with_dbl_and_approx_norm(old_vecs, "vec_id", vec_col, widen=False)
        )
    dup_pairs = cosine_for_pairs(
        base_all, cand, min_cosine=min_cosine, exact_norms_in_base=False
    )
    w = Window.partitionBy("id_b").orderBy(
        F.col("cosine").desc(), F.col("id_a").asc()
    )
    flagged = (
        dup_pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id_b").alias("vec_id"),
            F.col("id_a").alias("match_id"),
            "cosine",
        )
    )
    flagged_path = f"{store_dir}/flagged/batch_id={batch_id}"
    flagged.write.mode("overwrite").parquet(flagged_path)
    # the index stores ONE row per vector — its primary cell — at any
    # probes setting (multi-probe is a read-side recall knob only)
    cells_new = new_vectors.select(
        F.col(id_col).alias("vec_id"), vec_col
    ).join(primary_new.select("vec_id", "centroid_id"), "vec_id")
    if books is not None:
        # PQ-encode in the same pass (in-row math against the broadcast
        # packed codebooks — no extra shuffle joins the codes in before
        # the layout write). Residual-tagged books (pq_train_residual)
        # switch the encoded quantity to x − c(x) against each row's
        # PRIMARY cell — the IVFADC store layout; retrain_ivf_store
        # re-encodes these codes against its new geometry.
        if "residual" in books.columns:
            enc_src = (
                new_vectors.select(F.col(id_col).alias("vec_id"), vec_col)
                .join(primary_new.select("vec_id", "centroid_id"), "vec_id")
                .join(
                    F.broadcast(
                        cents.select(
                            "centroid_id", F.col("cvec").alias("_cvec")
                        )
                    ),
                    "centroid_id",
                )
                .select(
                    "vec_id",
                    F.zip_with(
                        dbl_vector(vec_col), "_cvec", lambda a, b: a - b
                    ).alias("_rvec"),
                )
            )
            codes_new = pq_encode(enc_src, books, id_col="vec_id", vec_col="_rvec")
        else:
            codes_new = pq_encode(
                new_vectors.select(F.col(id_col).alias("vec_id"), vec_col),
                books,
                id_col="vec_id",
                vec_col=vec_col,
            )
        cells_new = cells_new.join(codes_new, "vec_id")
    (
        cells_new.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{cells_path}/batch_id={batch_id}")
    )
    for df in (base_new, assign_new, cand):
        df.unpersist()
    return spark.read.parquet(flagged_path)


def _cells_vec_col(stored: DataFrame) -> str:
    """The vector column of a cells-store read is whatever the writer's
    ``vec_col`` was — the one column besides the fixed trio (and the
    optional PQ ``codes`` column a ``pq_codebooks=`` store carries)."""
    others = [
        c
        for c in stored.columns
        if c not in ("vec_id", "centroid_id", "batch_id", "codes")
    ]
    if len(others) != 1:
        raise ValueError(
            f"cells store has ambiguous vector column: {stored.columns}"
        )
    return others[0]


def read_ivf_pq_store(
    spark, store_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Serve-side view of an :func:`incremental_ivf_update` store
    written with ``pq_codebooks=``: ``(cells, codebooks, centroids)``
    where ``cells`` is ONE row per vec_id — (vec_id, <vec>, codes,
    centroid_id), latest batch wins. The store itself keeps one row per
    ingest (idempotence/pruning need the batch layout); re-ingested
    content is authoritative at its latest batch, the same
    latest-content-wins contract as the minhash/hamming stores — so
    the serve view must collapse history, one candidate-bounded
    ``max_by`` aggregation here (a long-lived serve tier would
    materialize this view at compaction time instead of per-read).

    Feed straight into :func:`ivf_pq_topk`::

        cells, books, cents = read_ivf_pq_store(spark, store)
        ivf_pq_topk(cells.select("vec_id", vec),
                    centroids=cents,
                    corpus_cells=cells.select("vec_id", "centroid_id"),
                    codebooks=books,
                    codes=cells.select("vec_id", "codes"), ...)
    """
    stored = spark.read.parquet(f"{store_dir}/cells").withColumn(
        "centroid_id", F.col("centroid_id").cast("int")
    )
    vec_col = _cells_vec_col(stored)
    if "codes" not in stored.columns:
        raise ValueError(
            f"{store_dir}/cells has no codes column: the store was not "
            "written with pq_codebooks= (enable it from the store's "
            "FIRST batch — earlier code-less batches cannot be served "
            "by ADC)"
        )
    # NULL codes mean a batch predates the codebooks (a mixed store
    # that slipped past the write-side guard, e.g. via direct writes):
    # such rows would be silently unreachable from every ADC shortlist,
    # so fail loudly instead of serving a quiet recall hole
    codes_checked = F.when(
        F.col("_s.codes").isNotNull(), F.col("_s.codes")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("read_ivf_pq_store: vec_id "),
                F.col("vec_id").cast("string"),
                F.lit(
                    " has no PQ codes (a batch written before the "
                    "codebooks existed) — rebuild the store with "
                    "pq_codebooks= from its first batch"
                ),
            )
        )
    )
    latest = (
        stored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct(vec_col, "codes", "centroid_id"), "batch_id"
            ).alias("_s")
        )
        .select(
            "vec_id",
            F.col(f"_s.{vec_col}").alias(vec_col),
            codes_checked.alias("codes"),
            F.col("_s.centroid_id").alias("centroid_id"),
        )
    )
    books = spark.read.parquet(f"{store_dir}/pq_codebooks")
    cents = spark.read.parquet(f"{store_dir}/centroids")
    return latest, books, cents


def ivf_store_needs_retrain(spark, store_dir: str, factor: float = 2.0) -> bool:
    """True when the sqrt-corpus rule's C for the store's CURRENT size
    is ≥ ``factor`` × the trained centroid count — the C-doubling
    threshold at which a grown incremental store has re-created the
    fixed-C anti-pattern (SCALE.md's 10× measurement: fixed C cost 22×
    wall at 10× data). Cost: one O(C) centroid count plus a stats-only
    parquet ROW count as the first pass — raw rows upper-bound distinct
    ids (a re-ingested id has one stored row per ingest), so when even
    the raw bound stays under the threshold the answer is False with no
    data scan; only a store that crosses the bound pays the exact
    distinct-id count (the number retraining itself would derive)."""
    cents_c = spark.read.parquet(f"{store_dir}/centroids").count()
    cells = spark.read.parquet(f"{store_dir}/cells")
    if resolve_num_centroids(cells, "auto") < factor * cents_c:
        return False  # distinct ids <= raw rows: cannot need retrain
    auto_c = resolve_num_centroids(cells.select("vec_id").distinct(), "auto")
    return auto_c >= factor * cents_c


def retrain_ivf_store(
    spark,
    store_dir: str,
    num_centroids="auto",
    *,
    lloyd_rounds: int = 0,
    only_if_needed: bool = False,
    factor: float = 2.0,
) -> int | None:
    """Re-train an :func:`incremental_ivf_update` store's cell geometry
    to match its CURRENT size and re-assign every persisted vector to
    the new cells — the migration path a growing store needs: geometry
    is trained once at bootstrap, and a corpus that grows 100× under
    that fixed C degrades exactly the way ``num_centroids='auto'``
    exists to prevent (SCALE.md's fixed-C 10× measurement). Returns the
    new C, or None when ``only_if_needed`` and the store is still
    within ``factor`` of its trained geometry.

    What happens: C is re-derived from the store's current size
    (``'auto'`` = the sqrt-corpus rule, or pass an int), new centroids
    are trained over the STORED vectors (the deterministic seeded pick,
    optionally ``lloyd_rounds`` k-means refinements — same trainers as
    the one-shot path, so a fresh store trained on the same corpus gets
    bitwise-identical geometry, which is what the equivalence test
    pins), and ONE distributed pass re-assigns all cells
    (``ivf_assignments(probes=1, carry_cols=('batch_id',))`` — per-row
    scoring against the broadcast O(C) centroids, zero shuffles before
    the layout repartition). The ``batch_id`` layout is preserved, so
    incremental idempotence/pruning semantics continue unchanged and
    the next ``incremental_ivf_update`` sees exactly the store a
    fresh-trained sibling would have. ``flagged/`` is untouched:
    flags are cosine-VERIFIED verdicts, valid under any geometry —
    re-training changes future candidate recall, never past truths.

    Swap protocol — the ``compact_partitions`` backup-rename discipline
    extended with a COMMIT MARKER, because this swap covers TWO
    directories whose geometries must stay consistent: both new tables
    are staged by distributed writes first, then ``.retrain_commit`` is
    created (the point of no return — it asserts both staged tables are
    complete), then four renames + two deletes, then the marker is
    removed. Recovery (:func:`recover_ivf_store`, run automatically at
    the start of every retrain) rolls FORWARD to the new geometry when
    the marker exists — a crash between the cells swap and the
    centroids swap can therefore never be 'repaired' into a
    mixed-geometry store — and treats marker-less staged dirs as
    incomplete writes to sweep. Run retraining when no updater races
    it — the streaming runner's contract is stop stream → retrain →
    restart (``streaming.pipeline.run_incremental_ivf_stream``)."""
    # local import: warehouse is a peer package module; it imports
    # nothing from operators, so this cannot cycle
    from crypto_data_pipeline_with_kafka_spark.warehouse import _HadoopFs

    cells_path = f"{store_dir}/cells"
    cents_path = f"{store_dir}/centroids"
    recover_ivf_store(spark, store_dir)
    if only_if_needed and not ivf_store_needs_retrain(spark, store_dir, factor):
        return None

    hfs = _HadoopFs(spark, store_dir)
    staged_cells = f"{store_dir}/.retrain_cells"
    staged_cents = f"{store_dir}/.retrain_centroids"
    backup_cells = f"{store_dir}/.retrain_backup_cells"
    backup_cents = f"{store_dir}/.retrain_backup_centroids"

    from crypto_data_pipeline_with_kafka_spark.sources.sinks import target_exists

    stored = spark.read.parquet(cells_path)
    vec_col = _cells_vec_col(stored)
    books_path = f"{store_dir}/pq_codebooks"
    books = (
        spark.read.parquet(books_path)
        if target_exists(spark, books_path)
        else None
    )
    residual_books = books is not None and "residual" in books.columns
    # RAW-layout PQ codes are cell-geometry-independent — carried
    # through the re-assignment untouched. RESIDUAL-tagged codes die
    # with their geometry, so they are dropped here and RE-ENCODED
    # against the new centroids inside the same re-assignment pass
    # below (the books stay fixed — like centroids at bootstrap, they
    # are the code geometry; only the quantized residuals move).
    extra_cols = (
        ("codes",) if "codes" in stored.columns and not residual_books else ()
    )
    vecs = stored.select("vec_id", vec_col, "batch_id", *extra_cols)
    # Training/C-derivation sees ONE row per id (latest batch wins): a
    # re-ingested id has one stored row per ingest, and training on the
    # raw store would inflate auto-C and make the seeded pick
    # partition-order-dependent (stale and current rows carry IDENTICAL
    # md5 sort keys, so limit(C) could pick either — breaking the
    # retrained-equals-fresh determinism contract). The store CONTENT
    # keeps every batch's rows — incremental pruning semantics are
    # untouched; only the trainer sees the deduped view.
    train_vecs = vecs.groupBy("vec_id").agg(
        F.max_by(vec_col, "batch_id").alias(vec_col)
    )

    c = resolve_num_centroids(train_vecs, num_centroids)
    if lloyd_rounds > 0:
        cents = lloyd_refined_centroids(
            train_vecs,
            num_centroids=c,
            rounds=lloyd_rounds,
            id_col="vec_id",
            vec_col=vec_col,
        )
    else:
        base = train_vecs.select("vec_id", dbl_vector(vec_col).alias("vdbl"))
        cents = _seed_centroids(base, c, "vec_id")
    # pin the geometry before it feeds both the staged write and the
    # re-assignment (a lazy plan would otherwise re-derive it twice)
    cents = cents.localCheckpoint()

    re_cells = ivf_assignments(
        vecs,
        probes=1,
        id_col="vec_id",
        vec_col=vec_col,
        centroids=cents,
        carry_cols=("batch_id", vec_col) + extra_cols,
    )
    if residual_books:
        # re-encode x − c_new(x) per stored row, in-row against the
        # broadcast packed books + O(C) new centroids — no join back
        # on vec_id (stale re-ingested rows share ids across batches),
        # no second corpus pass: this IS the re-assignment pass
        packed = _packed_codebooks(books)
        re_cells = (
            re_cells.join(
                F.broadcast(
                    cents.select("centroid_id", F.col("cvec").alias("_cvec"))
                ),
                "centroid_id",
            )
            .crossJoin(F.broadcast(packed))
            .withColumn(
                "_rvec",
                F.zip_with(dbl_vector(vec_col), "_cvec", lambda a, b: a - b),
            )
            .withColumn("codes", _codes_expr("_rvec", exact=False))
            .drop("_cb", "_cvec", "_rvec")
        )
        extra_cols = ("codes",)
    (
        # one exchange on the layout keys so each (batch, cell) dir
        # lands as one file — this IS the maintenance pass, small-file
        # consolidation included
        re_cells.select("vec_id", vec_col, *extra_cols, "batch_id", "centroid_id")
        .repartition("batch_id", "centroid_id")
        .write.mode("overwrite")
        .partitionBy("batch_id", "centroid_id")
        .parquet(staged_cells)
    )
    cents.write.mode("overwrite").parquet(staged_cents)

    # COMMIT POINT: the marker asserts both staged tables are complete
    # and the swap has begun — recovery rolls FORWARD from here, so a
    # crash between the two table swaps can never strand mixed geometry
    hfs.touch(f"{store_dir}/.retrain_commit")
    hfs.rename(cells_path, backup_cells)
    hfs.rename(staged_cells, cells_path)
    hfs.rename(cents_path, backup_cents)
    hfs.rename(staged_cents, cents_path)
    hfs.delete(backup_cells)
    hfs.delete(backup_cents)
    hfs.delete(f"{store_dir}/.retrain_commit")
    return c


def recover_ivf_store(spark, store_dir: str) -> None:
    """Crash recovery for an interrupted :func:`retrain_ivf_store`.
    Two regimes, decided by the ``.retrain_commit`` marker:

    * marker PRESENT — both staged tables were complete and the swap
      had begun: roll each table FORWARD (staged → live, sweeping
      backups), so the store ends at the NEW geometry and the marker
      is removed. Rolling forward — never restoring one table's backup
      while the other is already swapped — is what keeps the cells and
      centroids geometries CONSISTENT through any crash point of the
      two-directory swap.
    * marker ABSENT — staged dirs are incomplete distributed writes
      (leaked bytes): delete them; a backup whose live sibling is
      missing is the authoritative copy — restore it; a backup with a
      live sibling is swept.

    Called automatically at the start of every retrain; exposed for an
    operator who wants to repair the store without retraining."""
    from crypto_data_pipeline_with_kafka_spark.warehouse import _HadoopFs

    hfs = _HadoopFs(spark, store_dir)
    marker = f"{store_dir}/.retrain_commit"
    tables = (
        (
            f"{store_dir}/cells",
            f"{store_dir}/.retrain_cells",
            f"{store_dir}/.retrain_backup_cells",
        ),
        (
            f"{store_dir}/centroids",
            f"{store_dir}/.retrain_centroids",
            f"{store_dir}/.retrain_backup_centroids",
        ),
    )
    if hfs.exists(marker):
        for live, staged, backup in tables:
            if hfs.exists(staged):
                # this table's swap had not (fully) happened: advance it
                if hfs.exists(live):
                    if hfs.exists(backup):
                        hfs.delete(backup)
                    hfs.rename(live, backup)
                hfs.rename(staged, live)
            if hfs.exists(backup):
                hfs.delete(backup)
        hfs.delete(marker)
        return
    for live, staged, backup in tables:
        if hfs.exists(backup):
            if hfs.exists(live):
                hfs.delete(backup)
            else:
                hfs.rename(backup, live)
        if hfs.exists(staged):
            hfs.delete(staged)


# ----------------------------------------------------- product quantization


def pq_pick_ids(
    emb: DataFrame,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """(sub_id, code, id) of :func:`pq_train`'s seeded pick — the pick
    rule ranks ids by md5(sub_id|id) and never looks at a vector VALUE,
    so ONE pick relation (O(m·k) rows, pin it) seeds every codebook a
    suite trains over the same corpus: raw books from the raw vectors,
    residual books from the residuals (r10 — the rivfpq leg's book
    training re-ran the whole ranked pick pass the raw leg had already
    paid). Value-free also means slimmer: the two pick shuffles move
    (id, sub_id, hash) rows, not m sliced sub-vectors per row. Thread
    through ``pq_train(picks=)`` / ``pq_train_residual(picks=)`` /
    ``ivf_pq_topk(pq_picks=)``; identical picks (and therefore
    identical books) to the in-call pass, pytest-pinned.

    The relation is GEOMETRY-STAMPED (literal ``_pm``/``_pk`` columns
    = this call's num_subvectors/codes_per_subvector): picks are
    positional seeds, and a consumer trained at a different geometry
    would mis-train PLAUSIBLY — a range check alone misses a SMALLER
    pick geometry (an 8×8 picks relation passes every 8×16 range and
    even ``_packed_codebooks``' uniform-dense validation, because the
    pack derives m·k from the book itself) — so ``pq_train`` refuses
    unstamped relations at plan-build and mismatched stamps in-row."""
    exploded = emb.select(F.col(id_col)).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(num_subvectors - 1))
        ).alias("sub_id"),
        F.spark_partition_id().alias("_pid"),
    ).withColumn(
        "_sk",
        F.md5(
            F.concat(
                F.col("sub_id").cast("string"),
                F.lit("|"),
                F.col(id_col).cast("string"),
            )
        ),
    )
    w_local = Window.partitionBy("sub_id", "_pid").orderBy(
        "_sk", F.col(id_col)
    )
    pruned = (
        exploded.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= codes_per_subvector)
    )
    w_glob = Window.partitionBy("sub_id").orderBy("_sk", F.col(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= codes_per_subvector)
        .select(
            F.col("sub_id").cast("int").alias("sub_id"),
            (F.col("_rn") - 1).cast("int").alias("code"),
            F.col(id_col),
            F.lit(num_subvectors).cast("int").alias("_pm"),
            F.lit(codes_per_subvector).cast("int").alias("_pk"),
        )
    )


def pq_train(
    emb: DataFrame,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    lloyd_rounds: int = 0,
    exact: bool = False,
    prequantized: bool = False,
    picks: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011) — the memory
    side of the ANN story: each vector splits into ``num_subvectors``
    sub-vectors and each sub-vector is later replaced by the id of its
    nearest codebook entry, so a 64-dim float32 embedding (256 B)
    serves from ``num_subvectors`` bytes of codes (32× at the defaults;
    a billion-vector store drops from ~256 GB of vectors to ~8 GB of
    codes + a KB-scale codebook). Returns (sub_id, code, cvec
    array<double>, cnorm_sq) — O(m·k) rows, broadcastable by
    construction.

    Deterministic training, like every trainer in this module: the
    codebook for sub-space j is the ``codes_per_subvector`` corpus
    sub-vectors with the smallest md5(j|id) — a per-sub-space seeded
    pseudo-random draw. ``lloyd_rounds > 0`` refines each sub-space's
    codebook with that many deterministic k-means rounds
    (``lloyd_refined_centroids`` over the sub-vector relation) — the
    production polish: random-pick codes are COVERAGE, k-means codes
    are fit, and on a near-orthogonal corpus the refinement is what
    lifts ADC recall (measured in the tests). The seeded pick runs ALL
    sub-spaces in one pass (explode + two-level per-sub-space top-k —
    see the inline note), never a corpus shuffle keyed on m hot values;
    Lloyd refinement trains each sub-space independently as
    ``num_subvectors`` small iterative jobs.

    ``exact=True`` stores trunc-quantized long components and
    exact-decimal ``cnorm_sq`` instead of doubles (module-header
    convention) — the ORACLE-CHECKABLE numeric mode: every downstream
    distance/score is then an exact integer a SQL twin reproduces
    bitwise. Same picks, same plan shape; the double mode stays the
    fast production path. Pass ``dim`` to skip the one-row inference
    job (same threading contract as ``num_centroids``).

    ``prequantized=True`` (exact mode only): ``vec_col`` ALREADY holds
    trunc-quantized longs at the module scale — skip the quantization
    step. This is how residual training stays an exact integer
    pipeline: :func:`pq_train_residual` quantizes x and c separately
    and subtracts in integer space (quantizing the double difference
    instead would re-truncate an already-rounded value, and the
    off-by-one-ulp cases diverge between engines)."""
    if prequantized and not exact:
        raise ValueError(
            "prequantized=True only pairs with exact=True: the double "
            "path consumes raw components directly"
        )
    if exact and lloyd_rounds > 0:
        raise ValueError(
            "exact=True requires lloyd_rounds=0: Lloyd means are "
            "IEEE-double centroids, not oracle-replayable integers"
        )
    if picks is not None and lloyd_rounds > 0:
        raise ValueError(
            "picks= seeds the md5 draw; Lloyd refinement re-derives "
            "its own seeds per sub-space — drop one"
        )
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    if dim % num_subvectors != 0:
        raise ValueError(f"dim {dim} not divisible by {num_subvectors} subvectors")
    d = dim // num_subvectors
    norm_fn = _dot_exact_decimal if exact else dot_double
    if picks is not None:
        # shared seeded pick (see pq_pick_ids): fetch the picked rows'
        # vectors with one broadcast join over the corpus scan and
        # slice in-row — the ranked pick pass ran ONCE for the suite,
        # not once per book. The picks relation is POSITIONAL input
        # like codes=/adc_side=, so mismatches refuse loudly instead
        # of mis-training plausibly (r10 review, twice): the relation
        # must carry pq_pick_ids' geometry STAMP (a bare range check
        # missed a SMALLER pick geometry — an 8×8 picks passes every
        # 8×16 range check AND _packed_codebooks' uniform-dense
        # validation, which derives m·k from the book itself), checked
        # in-row on the cvec column every consumer reads (an in-plan
        # guard only fires in plans that keep its column — a bare
        # .count() prunes everything, the module-wide in-plan-guard
        # caveat). A STALE-corpus picks relation (picked ids no longer
        # in emb, silently dropped by this join) leaves the book short
        # and IS caught by _packed_codebooks downstream.
        if "_pm" not in picks.columns or "_pk" not in picks.columns:
            raise ValueError(
                "picks= must be a pq_pick_ids relation (geometry-"
                "stamped _pm/_pk columns): picks are positional seeds, "
                "and an unstamped relation cannot prove it was built "
                "at this call's num_subvectors/codes_per_subvector"
            )
        if prequantized:
            full = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        else:
            full = quantized_vector(vec_col) if exact else dbl_vector(vec_col)
        geom_ok = (F.col("_pm") == num_subvectors) & (
            F.col("_pk") == codes_per_subvector
        )
        sub = F.slice(F.col("_v"), F.col("sub_id") * d + 1, F.lit(d))
        # the raise's cast type-matches BOTH modes' cvec element type
        cvec_ck = F.when(geom_ok, sub).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pq_train(picks=): picks were built at "),
                    F.col("_pm").cast("string"),
                    F.lit("x"),
                    F.col("_pk").cast("string"),
                    F.lit(
                        f" but this call trains {num_subvectors}x"
                        f"{codes_per_subvector} — a foreign-geometry "
                        "pick mis-addresses sub-spaces while the book "
                        "stays plausible-looking (pq_pick_ids takes "
                        "the same num_subvectors/codes_per_subvector)"
                    ),
                )
            ).cast("array<bigint>" if (exact or prequantized) else "array<double>")
        )
        return (
            emb.select(F.col(id_col), full.alias("_v"))
            .join(F.broadcast(picks), id_col)
            .select(
                F.col("sub_id").cast("int").alias("sub_id"),
                F.col("code").cast("int").alias("code"),
                cvec_ck.alias("cvec"),
                norm_fn(cvec_ck, cvec_ck).alias("cnorm_sq"),
            )
        )
    if lloyd_rounds > 0:
        books = []
        for j in range(num_subvectors):
            sub = F.transform(
                F.slice(vec_col, j * d + 1, d), lambda x: x.cast("double")
            )
            refined = lloyd_refined_centroids(
                emb.select(F.col(id_col), sub.alias("_sub")),
                num_centroids=codes_per_subvector,
                rounds=lloyd_rounds,
                id_col=id_col,
                vec_col="_sub",
            )
            books.append(
                refined.select(
                    F.lit(j).alias("sub_id"),
                    (F.col("centroid_id") - 1).cast("int").alias("code"),
                    "cvec",
                    norm_fn(F.col("cvec"), F.col("cvec")).alias("cnorm_sq"),
                )
            )
        out = books[0]
        for b in books[1:]:
            out = out.unionByName(b)
        return out
    # seeded pick, ALL sub-spaces in ONE pass: each corpus row explodes
    # into its m (sub_id, sub-vector) rows, then a two-level top-k —
    # row_number within (sub_id, input partition) prunes to k rows per
    # group map-sized, the global window per sub_id ranks only the
    # surviving m·k·P rows. Same picks and codes as the former
    # per-sub-space orderBy().limit() loop (top-k by (_sk, id) is
    # order-insensitive to the pruning level), but 3 stages instead of
    # 2·m TakeOrdered jobs — and no single hot key: the first shuffle
    # spreads over m × input-partition-count groups, each bounded by
    # one input partition's rows
    if prequantized:
        full = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    else:
        full = quantized_vector(vec_col) if exact else dbl_vector(vec_col)
    exploded = (
        emb.select(F.col(id_col), full.alias("_v"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.lit(num_subvectors - 1))
            ).alias("sub_id"),
            F.col("_v"),
            F.spark_partition_id().alias("_pid"),
        )
        .select(
            F.col(id_col),
            F.col("sub_id"),
            "_pid",
            F.slice(F.col("_v"), F.col("sub_id") * d + 1, F.lit(d)).alias(
                "cvec"
            ),
            F.md5(
                F.concat(
                    F.col("sub_id").cast("string"),
                    F.lit("|"),
                    F.col(id_col).cast("string"),
                )
            ).alias("_sk"),
        )
    )
    w_local = Window.partitionBy("sub_id", "_pid").orderBy(
        "_sk", F.col(id_col)
    )
    pruned = (
        exploded.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= codes_per_subvector)
    )
    w_glob = Window.partitionBy("sub_id").orderBy("_sk", F.col(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= codes_per_subvector)
        .select(
            F.col("sub_id").cast("int").alias("sub_id"),
            (F.col("_rn") - 1).cast("int").alias("code"),
            "cvec",
            norm_fn(F.col("cvec"), F.col("cvec")).alias("cnorm_sq"),
        )
    )


def pq_train_residual(
    emb: DataFrame,
    centroids: DataFrame,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    lloyd_rounds: int = 0,
    exact: bool = False,
    picks: DataFrame | None = None,
) -> DataFrame:
    """PQ codebooks over RESIDUALS x − c(x) against a FIXED cell
    geometry (the IVFADC training step): assign each vector its primary
    cell (broadcast O(C) centroids, in-row — zero shuffles), subtract
    the centroid vector, train :func:`pq_train` over the residual
    relation. The returned books carry a literal ``residual`` boolean
    column — the tag :func:`ivf_pq_topk` / :func:`pq_topk` check so
    residual codes are never silently decoded as raw reconstructions
    (or vice versa): codes are positional references whose MEANING
    depends on what was quantized, and a mismatch mis-scores
    plausibly instead of erroring. Train once over a bootstrap corpus,
    then pass as ``pq_codebooks=`` to :func:`incremental_ivf_update` —
    the store detects the tag, encodes each arriving batch's residuals
    against its assigned cells, and ``retrain_ivf_store`` RE-ENCODES
    the codes against the new geometry in its re-assignment pass
    (residual codes die with their geometry; the retrain pass is
    exactly where the new geometry and every stored vector meet).

    ``exact=True`` (r9): the ORACLE-CHECKABLE residual layout. x and c
    are trunc-quantized to longs SEPARATELY and subtracted in INTEGER
    space — rq_i = trunc(x_i·s) − trunc(c_i·s) — so the residual
    relation is exact integers a SQL twin re-derives (quantizing the
    double difference would re-truncate a rounded value; the
    off-by-one cases diverge). The returned books hold long components
    at the module scale and pass straight to the exact encode / LUT /
    ADC machinery. Exact books are a QUERY-path artifact: the
    incremental store encodes batches in the production double mode
    and refuses exact books loudly at plan-build
    (``_check_codebook_mode`` — pytest-pinned), the same idiom as
    every other mode mismatch in this module."""
    if exact:
        if lloyd_rounds > 0:
            raise ValueError(
                "exact=True requires lloyd_rounds=0 (see pq_train)"
            )
        base = emb.select(F.col(id_col), dbl_vector(vec_col).alias("_vd"))
        assign = ivf_assignments(
            base, probes=1, id_col=id_col, vec_col="_vd", centroids=centroids
        )
        res = (
            base.join(assign, id_col)
            .join(
                F.broadcast(
                    centroids.select(
                        "centroid_id", F.col("cvec").alias("_cvec")
                    )
                ),
                "centroid_id",
            )
            .select(
                F.col(id_col),
                F.zip_with(
                    quantized_vector("_vd"),
                    quantized_vector("_cvec"),
                    lambda a, b: a - b,
                ).alias("_rvec"),
            )
        )
        return pq_train(
            res, num_subvectors, codes_per_subvector, id_col=id_col,
            vec_col="_rvec", dim=dim, exact=True, prequantized=True,
            picks=picks,
        ).withColumn("residual", F.lit(True))
    base = emb.select(F.col(id_col), dbl_vector(vec_col).alias("_vd"))
    assign = ivf_assignments(
        base, probes=1, id_col=id_col, vec_col="_vd", centroids=centroids
    )
    res = (
        base.join(assign, id_col)
        .join(
            F.broadcast(
                centroids.select("centroid_id", F.col("cvec").alias("_cvec"))
            ),
            "centroid_id",
        )
        .select(
            F.col(id_col),
            F.zip_with("_vd", "_cvec", lambda a, b: a - b).alias("_rvec"),
        )
    )
    return pq_train(
        res, num_subvectors, codes_per_subvector, id_col=id_col,
        vec_col="_rvec", dim=dim, lloyd_rounds=lloyd_rounds, picks=picks,
    ).withColumn("residual", F.lit(True))


def _check_residual_tag(
    codebooks: DataFrame, residual: bool, caller: str
) -> None:
    """Residual codebooks (``pq_train_residual``) carry a literal
    ``residual`` column; raw books don't. A mismatch between the tag
    and the caller's decode mode never errors on its own — raw codes
    decoded as residuals (or residuals as raw) produce plausible
    scores with collapsed recall — so refuse at plan-build from the
    schema, the same idiom as ``_check_codebook_mode``."""
    tagged = "residual" in codebooks.columns
    if tagged and not residual:
        raise ValueError(
            f"{caller}: codebooks carry the residual tag (trained by "
            "pq_train_residual over x − c(x)) but the caller decodes "
            "raw reconstructions — pass residual=True with the cell "
            "geometry the books were trained against"
        )
    if residual and not tagged:
        raise ValueError(
            f"{caller}: residual=True with UNTAGGED codebooks — these "
            "books quantize raw vectors (e.g. a read_ivf_pq_store "
            "raw-layout store), and decoding their codes as residuals "
            "mis-scores silently; train residual books with "
            "pq_train_residual (which tags them) or drop residual=True"
        )


def _check_codebook_mode(codebooks: DataFrame, exact: bool, caller: str) -> None:
    """exact=True pairs with LONG (trunc-quantized, ×1e12-scale)
    codebook components from ``pq_train(exact=True)``; exact=False
    with doubles. A mismatch would not error — it silently mis-scores
    (raw-scale sub-vectors against 1e12-scale entries collapse every
    distance to ~|cvec|², assigning one code corpus-wide) — so refuse
    at plan-build from the schema."""
    dt = dict(codebooks.dtypes).get("cvec", "<missing>")
    want = "array<bigint>" if exact else "array<double>"
    if dt != want:
        raise ValueError(
            f"{caller}: codebook cvec type {dt} does not match "
            f"exact={exact} (expected {want}) — exact mode pairs with "
            "pq_train(exact=True) quantized-long components, the "
            "default double mode with double components"
        )


def _packed_codebooks(codebooks: DataFrame):
    """ONE row holding every codebook entry sorted by (sub_id, code) —
    the broadcastable O(m·k) relation every PQ stage crossJoins.

    Validates the pack: every downstream consumer addresses entry
    (sub_id=j, code=c) by ARRAY POSITION j·(kmax+1)+c+1, which silently
    mis-scores if a caller-supplied codebook has ragged per-sub-space
    entry counts or non-dense codes (``pq_train`` always emits uniform
    dense books; external parquet might not). The sorted pack is valid
    iff entry p (0-based) is exactly (sub_id = p div k, code = p mod k)
    — one in-row forall, raised loudly at execution (zero extra jobs,
    the module's guard idiom)."""
    packed = codebooks.agg(
        F.sort_array(
            F.collect_list(F.struct("sub_id", "code", "cvec", "cnorm_sq"))
        ).alias("_cb")
    )
    cb = F.col("_cb")
    k = (
        F.aggregate(cb, F.lit(-1), lambda acc, c: F.greatest(acc, c["code"]))
        + 1
    )
    m = (
        F.aggregate(cb, F.lit(-1), lambda acc, c: F.greatest(acc, c["sub_id"]))
        + 1
    )
    positional = F.transform(
        cb,
        lambda c, p: (c["sub_id"] == F.floor(p / k).cast("int"))
        & (c["code"] == p % k),
    )
    valid = (F.size(cb) == m * k) & F.forall(positional, lambda x: x)
    return packed.select(
        F.when(valid, cb)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "pq codebooks must be uniform and dense: every "
                        "sub_id needs the same entry count with codes "
                        "0..k-1 (positional ADC addressing) — got "
                    ),
                    F.size(cb).cast("string"),
                    F.lit(" entries for "),
                    m.cast("string"),
                    F.lit(" sub-spaces with max code "),
                    (k - 1).cast("string"),
                )
            )
        )
        .alias("_cb")
    )


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    prequantized: bool = False,
) -> DataFrame:
    """(id, codes array<int>): each sub-vector replaced by its nearest
    codebook entry (squared L2, left-to-right fold — the order a
    sequential reference reproduces bitwise; ties keep the SMALLER
    code). In-row math against the broadcast packed codebooks — zero
    shuffles, the encode pass pipelines into the scan.

    ``exact=True`` pairs with an ``exact`` codebook: distances are
    exact integer decimals over trunc-quantized components, so the
    argmin (ties to the smaller code) is engine-independent and a SQL
    oracle re-derives every code bitwise. ``prequantized=True``:
    ``vec_col`` already holds quantized longs (the exact-residual
    convention — see :func:`pq_train`)."""
    if prequantized and not exact:
        raise ValueError("prequantized=True only pairs with exact=True")
    _check_codebook_mode(codebooks, exact, "pq_encode")
    packed = _packed_codebooks(codebooks)
    return (
        emb.crossJoin(F.broadcast(packed))
        .select(
            F.col(id_col),
            _codes_expr(vec_col, exact, prequantized).alias("codes"),
        )
    )


def _codes_expr(
    vec_col: Column | str, exact: bool, prequantized: bool = False
) -> Column:
    """The nearest-code assignment as an expression over a row holding
    the packed ``_cb`` codebook array — shared by :func:`pq_encode`
    and the fused encode+ADC path in :func:`_codes_adc_side`."""
    m = F.aggregate(
        F.col("_cb"),
        F.lit(-1),
        lambda acc, c: F.greatest(acc, c["sub_id"]),
    ) + 1
    # dim of each sub-space from the first entry's cvec
    d = F.size(F.element_at(F.col("_cb"), 1)["cvec"])
    if exact:
        vq = (
            (F.col(vec_col) if isinstance(vec_col, str) else vec_col)
            if prequantized
            else quantized_vector(vec_col)
        )
    else:
        vq = None

    def best_code(j):
        def dist2(c):
            if exact:
                sub = F.slice(vq, j * d + 1, d)
                diffs = F.zip_with(
                    sub,
                    c["cvec"],
                    lambda a, b: (a - b).cast(_QDEC) * (a - b).cast(_QDEC),
                )
                return F.aggregate(
                    diffs,
                    F.lit(0).cast(_ACC),
                    lambda acc, x: (acc + x).cast(_ACC),
                )
            sub = F.transform(
                F.slice(vec_col, j * d + 1, d), lambda x: x.cast("double")
            )
            return F.aggregate(
                F.zip_with(sub, c["cvec"], lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        entries = F.filter(F.col("_cb"), lambda c: c["sub_id"] == j)
        # bind each entry's distance ONCE (interpreted higher-order
        # functions are not memoized — see module header): transform to
        # (bd, bc) structs first, then fold the min, so the inner
        # squared-L2 loop runs once per entry, not twice
        scored = F.transform(
            entries,
            lambda c: F.struct(dist2(c).alias("bd"), c["code"].alias("bc")),
        )
        # exact mode has no decimal infinity — seed with bc = -1 and
        # adopt the first entry unconditionally (entries are in code
        # order, strict < keeps the smaller code on ties either way)
        init_bd = (
            F.lit(None).cast(_ACC) if exact else F.lit(float("inf"))
        )
        return F.aggregate(
            scored,
            F.struct(init_bd.alias("bd"), F.lit(-1).alias("bc")),
            lambda acc, s: F.when(acc["bc"] == -1, s)
            .when(s["bd"] < acc["bd"], s)
            .otherwise(acc),
        )["bc"]

    return F.transform(F.sequence(F.lit(0), m - 1), best_code)


def _pq_query_luts(
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    exact: bool,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(id_a, _qn, _lut) for a (small) query frame against the
    broadcast packed codebooks — the per-query ADC lookup table: for
    entry (j, c) at array position p, ``_lut[p]`` = dot(q_sub_j, cvec);
    the corpus-side columns (positions, reconstructed norm) live in
    :func:`_codes_adc_side`. ``exact`` switches the kernels between
    primitive doubles (fast path) and the module's exact-decimal
    convention (oracle path).

    ``cents`` (residual decomposition): also emit ``_qcm``, a
    centroid_id → dot(q, c) map over the broadcast cell geometry —
    the per-(query, cell) half of the decomposed IVFADC score, fused
    into this one projection so the serve path needs no separate
    qc relation or join (exact mode: decimal values at the LUT
    scale; double mode: primitive doubles)."""
    _check_codebook_mode(codebooks, exact, "_pq_query_luts")
    packed = _packed_codebooks(codebooks)
    d = F.size(F.element_at(F.col("_cb"), 1)["cvec"])
    if exact:
        qvec = quantized_vector(vec_col)
        qnorm = F.sqrt(dot_exact(F.col("_q"), F.col("_q")))
        lut_entry = lambda c: _dot_exact_decimal(  # noqa: E731
            F.slice(F.col("_q"), c["sub_id"] * d + 1, d), c["cvec"]
        )
        qc_dot = lambda c: _dot_exact_decimal(  # noqa: E731
            F.col("_q"), quantized_vector(c["cvec"])
        )
    else:
        qvec = dbl_vector(vec_col)
        qnorm = F.sqrt(dot_double(F.col("_q"), F.col("_q")))
        lut_entry = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(
                F.slice(F.col("_q"), c["sub_id"] * d + 1, d),
                c["cvec"],
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        qc_dot = lambda c: dot_double(F.col("_q"), c["cvec"])  # noqa: E731
    src = queries.select(
        F.col(id_col).alias("id_a"), qvec.alias("_q")
    ).crossJoin(F.broadcast(packed))
    extra = []
    if cents is not None:
        # ONE row holding the whole O(C) geometry, sorted by id (the
        # struct sort key) — safe for sparse/non-dense centroid ids
        # because the lookup is a MAP, not positional
        cpack = F.broadcast(
            cents.agg(
                F.array_sort(
                    F.collect_list(F.struct("centroid_id", "cvec"))
                ).alias("_ccb")
            )
        )
        src = src.crossJoin(cpack)
        extra.append(
            F.map_from_entries(
                F.transform(
                    F.col("_ccb"),
                    lambda c: F.struct(c["centroid_id"], qc_dot(c)),
                )
            ).alias("_qcm")
        )
    return src.select(
        "id_a",
        qnorm.alias("_qn"),
        F.transform(F.col("_cb"), lut_entry).alias("_lut"),
        *extra,
    )


def _codes_adc_side(
    codes: DataFrame | None,
    codebooks: DataFrame,
    id_col: str,
    exact: bool,
    emb: DataFrame | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """(id_b, _idx, _xn) — the per-CORPUS-ROW half of an ADC scan,
    computed once per row and NEVER per (query, row) pair: ``_idx``
    holds each code's position in the sorted codebook pack
    (j·(kmax+1)+c+1) and ``_xn`` the reconstructed norm |x̂| (sum of
    the selected entries' stored norms). The pair loop downstream is
    then one m-lookup fold plus a division — higher-order functions
    run interpreted, so hoisting the norm fold and position transform
    off the pair cardinality is what keeps the scan ~codes-sized.

    Pass ``codes=None`` with ``emb``/``vec_col`` to FUSE the encode
    into the same packed-codebook pass — one broadcast crossJoin for
    encode + positions + norm instead of two (the on-the-fly serve
    path); a persisted codes relation skips the encode entirely."""
    _check_codebook_mode(codebooks, exact, "_codes_adc_side")
    packed = _packed_codebooks(codebooks)
    if codes is None:
        src = emb.crossJoin(F.broadcast(packed)).select(
            F.col(id_col),
            _codes_expr(vec_col, exact).alias("codes"),
            F.col("_cb"),
        )
    else:
        src = codes.crossJoin(F.broadcast(packed))
    staged = src.select(
        F.col(id_col).alias("id_b"),
        "codes",
        F.transform(F.col("_cb"), lambda c: c["cnorm_sq"]).alias("_cn"),
        _kmax_plus_one().alias("_kk"),
    )
    staged = staged.select(
        "id_b", _adc_positions(F.col("_kk")).alias("_idx"), "_cn"
    )
    if exact:
        # decimal norm sum, ONE string-hopped double conversion (the
        # dot_exact convention)
        xn = F.sqrt(
            F.aggregate(
                F.col("_idx"),
                F.lit(0).cast(_ACC),
                lambda acc, i: (acc + F.element_at("_cn", i)).cast(_ACC),
            ).cast("string").cast("double")
        )
    else:
        xn = F.sqrt(
            F.aggregate(
                F.col("_idx"),
                F.lit(0.0),
                lambda acc, i: acc + F.element_at("_cn", i),
            )
        )
    return staged.select("id_b", "_idx", xn.alias("_xn"))


def pq_adc_side(
    codes: DataFrame | None,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    exact: bool = False,
    emb: DataFrame | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """The per-corpus-row half of an ADC scan — (id_b, _idx, _xn):
    code positions in the packed codebook plus the reconstructed norm
    |x̂| — as a FIRST-CLASS relation. This is the persistable serving
    index of a PQ deployment (codes + norms is exactly what an IVFPQ
    cell store scans); compute it once, persist/localCheckpoint it,
    and pass it to :func:`pq_topk` and :func:`ivf_pq_topk` via
    ``adc_side=`` so a suite running both query paths folds the
    corpus-wide (in exact mode, interpreted-decimal) norm pass ONCE.
    Contract mirrors ``codes=``: the relation is only meaningful with
    the codebooks (and exact mode) that produced it."""
    return _codes_adc_side(codes, codebooks, id_col, exact, emb, vec_col)


def _kmax_plus_one() -> Column:
    """kmax+1 (the positional-addressing stride) from a row's ``_cb``
    pack — BIND this as a column before use: interpreted lambdas are
    not memoized, so referencing the aggregate inside a per-element
    lambda would re-fold the pack once per code."""
    return (
        F.aggregate(
            F.col("_cb"), F.lit(0), lambda acc, c: F.greatest(acc, c["code"])
        )
        + 1
    )


def _adc_positions(kk: Column) -> Column:
    """Each code's position in the sorted codebook pack —
    j·(kk)+c+1, the ONE addressing convention ``_packed_codebooks``
    validates; ``kk`` is a pre-bound :func:`_kmax_plus_one` column."""
    return F.transform(F.col("codes"), lambda c, j: j * kk + c + 1)


def _adc_lut_sum(exact: bool, init: Column | None = None) -> Column:
    """The m-lookup ADC dot over a joined row: sum of the query LUT
    entries selected by the corpus row's precomputed positions.
    ``init`` seeds the fold with an additive term of the SAME kind
    (exact: a decimal; double: a double) — the residual decomposition's
    dot(q, centroid), summed INSIDE the decimal accumulation so the
    one double conversion happens after the full exact sum (exact
    decimal addition is associative, so the combined value is
    engine-independent regardless of term order)."""
    if exact:
        return F.aggregate(
            F.col("_idx"),
            (F.lit(0) if init is None else init).cast(_ACC),
            lambda acc, i: (acc + F.element_at("_lut", i)).cast(_ACC),
        ).cast("string").cast("double")
    return F.aggregate(
        F.col("_idx"),
        F.lit(0.0) if init is None else init,
        lambda acc, i: acc + F.element_at("_lut", i),
    )


def _adc_pair_cosine(exact: bool, init: Column | None = None) -> Column:
    """The asymmetric-distance cosine over a joined row holding a
    query's LUT (``_pq_query_luts``) and a corpus row's precomputed
    ADC columns (``_codes_adc_side``): m table lookups for the dot,
    divided by the query norm × the precomputed reconstructed norm.
    ``init`` threads the residual decomposition's centroid term into
    the numerator fold (see :func:`_adc_lut_sum`)."""
    return _adc_lut_sum(exact, init) / (F.col("_qn") * F.col("_xn"))


def _exact_adc_topk(
    paired: DataFrame,
    queries: DataFrame,
    k: int,
    qc_col: str | None = None,
) -> DataFrame:
    """Two-pass exact-decimal ADC top-k over a pair frame (the
    ``brute_force_topk`` trick, shared by :func:`pq_topk` exact mode
    and :func:`ivf_pq_topk`'s exact shortlist): ``paired`` carries
    (id_a, id_b, _idx, _qn, _xn, _lutd) — a primitive-double ADC pass
    ranks ALL pairs, and the interpreted exact-decimal fold runs only
    on pairs within 1e-6 of each query's k-th approximate score. Both
    passes sum the SAME m entries over the SAME (_qn·_xn) denominator,
    so the approx→exact gap is one decimal→double cast (≤ 1 ulp per
    entry) plus m-term double-summation error — ≤ ~1e-14 in cosine
    units, ≥ 10⁷ inside the margin — hence any excluded pair is
    provably below ≥ k kept pairs in the EXACT score too: emitted
    values, membership, and rank are identical to the all-exact
    computation, with decimal folds at O(queries·k) instead of pair
    cardinality. Returns (id_a, id_b, cosine_pq, rnk ≤ k).

    The k-th approximate score is a SECOND window over the SAME
    partitioning (unbounded frame) — it rides the row_number's
    exchange/sort, so the encode+pair upstream executes ONCE; a
    separate kth frame joined back would re-execute that whole plan a
    second time (measured ~2× the leg's wall at sf0.1).

    ``qc_col`` names an exact-decimal additive term carried on
    ``paired`` (the residual decomposition's per-(query, cell)
    dot(q, c)): the prefilter adds its double cast, the exact fold
    seeds its decimal accumulator with it — one extra correctly-
    rounded addition on each side, absorbed by the same 1e-6 margin."""
    apx = F.aggregate(
        F.col("_idx"),
        F.lit(0.0) if qc_col is None else F.col(qc_col).cast("double"),
        lambda acc, i: acc + F.element_at("_lutd", i),
    ) / (F.col("_qn") * F.col("_xn"))
    # slim the pair frame BEFORE the rank shuffle: _idx (m ints),
    # _qn/_xn scalars and the approx score travel; the decimal LUT is
    # re-joined from the broadcast query frame only for margin
    # survivors
    slim = paired.select(
        "id_a", "id_b", "_idx", "_qn", "_xn", apx.alias("_apx"),
        *([qc_col] if qc_col is not None else []),
    )
    w_apx = Window.partitionBy("id_a").orderBy(
        F.col("_apx").desc(), F.col("id_b")
    )
    ranked = slim.withColumn(
        "_ark", F.row_number().over(w_apx)
    ).withColumn(
        "_kth_apx",
        F.max(F.when(F.col("_ark") == k, F.col("_apx"))).over(
            Window.partitionBy("id_a")
        ),
    )
    cand = ranked.filter(
        F.col("_kth_apx").isNull()
        | (F.col("_apx") >= F.col("_kth_apx") - 1e-6)
    ).join(F.broadcast(queries.select("id_a", "_lut")), "id_a")
    scored = cand.select(
        "id_a",
        "id_b",
        _adc_pair_cosine(
            True, None if qc_col is None else F.col(qc_col)
        ).alias("cosine_pq"),
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine_pq").desc(), F.col("id_b")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine_pq", F.col("rnk").cast("int").alias("rnk"))
    )


def _residual_adc_side(
    codes: DataFrame | None,
    codebooks: DataFrame,
    corpus_cells: DataFrame | None,
    cents: DataFrame | None,
    id_col: str,
    exact: bool = False,
    res: DataFrame | None = None,
) -> DataFrame:
    """(id_b, centroid_id, _idx, _xn) for RESIDUAL codes: like
    :func:`_codes_adc_side`, but the reconstructed vector is
    x̂ = c + r̂ (primary centroid plus the decoded residual), so the
    norm is rebuilt in-row from the broadcast centroid vectors and the
    selected codebook entries — still once per corpus row, never per
    pair, and still query-independent.

    ``exact=True``: the centroid quantizes to longs in-row, x̂ = cq +
    r̂q stays integer (the books already hold quantized residuals),
    and |x̂| is the decimal norm with the module's ONE string-hopped
    double conversion — so the norm, and with it every residual ADC
    score downstream, is engine-independent.

    Pass ``res`` (an (id, centroid_id, _cvec, _rvec) relation — the
    residual derivation already holds all three) to FUSE the encode
    into this same packed-codebook projection: one in-row pass
    computes codes + positions + reconstructed norm with ZERO joins
    (the ``_codes_adc_side`` codes=None fusion, residual flavor).
    ``codes``/``corpus_cells``/``cents`` are the persisted-codes path:
    a stored codes relation re-joins its cells and geometry."""
    packed = _packed_codebooks(codebooks)
    if res is not None:
        staged = res.crossJoin(F.broadcast(packed)).select(
            F.col(id_col).alias("id_b"),
            "centroid_id",
            _codes_expr("_rvec", exact, prequantized=exact).alias("codes"),
            "_cvec",
            F.col("_cb"),
            _kmax_plus_one().alias("_kk"),
        )
    else:
        staged = (
            codes.join(corpus_cells.select(F.col(id_col), "centroid_id"), id_col)
            .join(
                F.broadcast(
                    cents.select("centroid_id", F.col("cvec").alias("_cvec"))
                ),
                "centroid_id",
            )
            .crossJoin(F.broadcast(packed))
            .select(
                F.col(id_col).alias("id_b"),
                "centroid_id",
                "codes",
                "_cvec",
                F.col("_cb"),
                _kmax_plus_one().alias("_kk"),
            )
        )
    staged = staged.select(
        "id_b",
        "centroid_id",
        "_cvec",
        F.col("_cb"),
        _adc_positions(F.col("_kk")).alias("_idx"),
    )
    rhat = F.flatten(
        F.transform(
            F.col("_idx"), lambda i: F.element_at(F.col("_cb"), i)["cvec"]
        )
    )
    cvec = quantized_vector(F.col("_cvec")) if exact else F.col("_cvec")
    staged = staged.select(
        "id_b",
        "centroid_id",
        "_idx",
        F.zip_with(cvec, rhat, lambda a, b: a + b).alias("_xhat"),
    )
    if exact:
        xn = F.sqrt(
            _dot_exact_decimal(F.col("_xhat"), F.col("_xhat"))
            .cast("string")
            .cast("double")
        )
    else:
        xn = F.sqrt(dot_double(F.col("_xhat"), F.col("_xhat")))
    return staged.select("id_b", "centroid_id", "_idx", xn.alias("_xn"))


def pq_topk(
    emb: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame | None = None,
    query_ids_max: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    adc_side: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: queries stay
    full-precision, the corpus is its 8-byte codes. Per query, a
    lookup table of dot(q_subvector, codebook entry) is built in-row
    against the broadcast codebooks (m·k small dots); each corpus
    row's score is then m table lookups — the classic PQ scan that
    reads codes instead of vectors, 32× less memory traffic at the
    defaults. Approximate cosine = LUT-sum / (|q| · |x̂|), with |x̂|²
    the sum of the selected entries' stored norms (exact for the
    RECONSTRUCTED vector; ranking quality is bounded by quantization
    error, measured against ``brute_force_topk`` in the tests).
    Same API shape as the brute/IVF query paths: queries are corpus
    rows with id < ``query_ids_max``, self excluded, (score DESC,
    id_b ASC) deterministic top-k. Pass ``codes`` (a ``pq_encode``
    output, e.g. read back from parquet) to serve from a persisted
    code store; None encodes ``emb`` on the fly.

    ``exact=True`` (with an ``exact`` codebook/codes): the LUT holds
    exact-decimal dots, the m-lookup score and reconstructed norm sum
    as decimals with ONE string-hopped double conversion each, and the
    query norm is the module's exact decimal norm — every emitted
    cosine_pq is then bitwise-reproducible by a SQL oracle (same
    IEEE division tree over identical correctly-rounded doubles).

    Exact mode ranks via the shared two-pass :func:`_exact_adc_topk`
    (primitive-double prefilter, exact-decimal folds only inside the
    k-th score's margin) — output provably identical to the all-exact
    computation, with decimal folds at O(queries·k) instead of pair
    cardinality; the margin/error proof lives on the helper."""
    _check_residual_tag(codebooks, False, "pq_topk")
    queries = _pq_query_luts(
        emb.filter(F.col(id_col) < query_ids_max), codebooks, id_col,
        vec_col, exact,
    )
    if exact:
        # double twin of the LUT, derived once per QUERY row (≤ 20) —
        # the prefilter never feeds an emitted value, so the cast's
        # engine-dependent ulp is irrelevant
        queries = queries.withColumn(
            "_lutd", F.transform(F.col("_lut"), lambda x: x.cast("double"))
        )
    # the query side (with its LUTs) broadcasts explicitly and the
    # codes side STREAMS: each corpus row's positions/norm evaluate
    # once (see _codes_adc_side; with codes=None the encode fuses into
    # the same pass), then fan out across the broadcast queries — a
    # non-equi join the other way round would re-derive the encode
    # expressions at pair cardinality
    side = (
        adc_side
        if adc_side is not None
        else _codes_adc_side(codes, codebooks, id_col, exact, emb, vec_col)
    )
    paired = (
        side.crossJoin(F.broadcast(queries))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    if exact:
        return _exact_adc_topk(paired, queries, k)
    scored = paired.select(
        "id_a", "id_b", _adc_pair_cosine(False).alias("cosine_pq")
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine_pq").desc(), F.col("id_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine_pq", F.col("rnk").cast("int").alias("rnk"))
    )


class _PQServeInputs:
    """ONE construction site for :func:`ivf_pq_topk`'s pinned-relation
    hook surface (r10): the serve tier takes up to eight optional
    relations (centroids / assignments / corpus_cells / codebooks /
    codes / adc_side / cand / pair_scores) whose pairwise contracts
    were scattered refusal blocks across the serve branches — a matrix
    that took three r9 commits to make symmetric. Every PLAN-BUILD
    refusal now runs here, in one ordered block, BEFORE any eager pin
    can materialize a job; the serve body consumes validated fields.
    Adding a hook means adding its guard HERE, next to every guard it
    must compose with.

    Also owns the fused-path broadcast decision (``should_broadcast``):
    the forced broadcast of candidate-bounded relations hard-fails past
    Spark's 8 GB cap where the shuffle it replaces is disk-backed, so
    ``serve_broadcast=False`` is the explicit big-serve escape (r9
    ADVICE). A plan-time AUTO gate was built and REJECTED: a
    localCheckpoint's stats carry the PRE-pin join estimate (measured
    4.6e14 'bytes' for an actual 3712-row pinned cand), so estimate-
    gating silently un-forced every suite serve and cost ~2 s of AQE
    stage materializations per suite run at sf0.1 — an explicit caller
    contract beats a wrong heuristic. Rule of thumb for that contract:
    Spark broadcasts hard-cap at 8 GB / int-max rows, so the force is
    safe up to ~1e8 slim (id_a, id_b) candidate rows at 16 B each (the
    ADC side it bounds is ≤ one slim row per distinct id_b)."""

    def __init__(
        self,
        *,
        k: int,
        refine: int | None,
        residual: bool,
        exact: bool,
        centroids,
        assignments,
        corpus_cells,
        codebooks,
        codes,
        adc_side,
        cand,
        pair_scores,
        pq_picks,
        serve_broadcast: bool,
        caller: str = "ivf_pq_topk",
    ) -> None:
        self.refine = 4 * k if refine is None else refine
        self.serve_broadcast = serve_broadcast
        if self.refine < k:
            raise ValueError(
                f"refine {self.refine} < k {k}: shortlist must cover top-k"
            )
        if adc_side is not None and residual:
            raise ValueError(
                "adc_side= carries raw-layout reconstructed norms — the "
                "residual branch rebuilds x̂ = c + r̂ per cell "
                "and must derive its own side"
            )
        if codes is not None and codebooks is None:
            raise ValueError(
                "codes= without codebooks=: persisted codes are POSITIONAL "
                "references into the codebooks that produced them — freshly "
                "trained books would decode every code against the wrong "
                "entries while scores stay plausible-looking"
            )
        if adc_side is not None and codebooks is None:
            raise ValueError(
                "adc_side= without codebooks=: the side's _idx positions are "
                "POSITIONAL references into the codebooks that produced it — "
                "freshly trained books would build query LUTs whose entries "
                "the side's positions mis-address, collapsing recall while "
                "scores stay plausible-looking (same contract as codes=)"
            )
        if pq_picks is not None and codebooks is not None:
            raise ValueError(
                "pq_picks= with codebooks=: the picks seed in-call TRAINING "
                "and the supplied books are already trained — a silently "
                "ignored hook hides a caller bug, so refuse (drop one)"
            )
        if assignments is None and corpus_cells is not None and centroids is None:
            raise ValueError(
                "corpus_cells without centroids: queries cannot "
                "probe an unknown cell geometry — pass the store's "
                "centroids alongside its cells"
            )
        if residual:
            if assignments is not None and centroids is None:
                raise ValueError(
                    "residual=True cannot run from assignments= alone: "
                    "residuals are taken against the cell geometry's "
                    "centroid VECTORS, which the assignments relation "
                    "does not carry — pass centroids= alongside (the "
                    "relation the assignments were ranked against) or "
                    "drop assignments="
                )
            if (codebooks is not None or codes is not None) and centroids is None:
                # residual codebooks/codes are meaningless against any
                # geometry but the one that produced them; a re-derived
                # seeded pick over a changed corpus would decode
                # residuals of the WRONG centroids — scores stay
                # plausible-looking while recall silently collapses
                raise ValueError(
                    "residual=True with persisted codebooks=/codes= requires "
                    "the centroids= they were trained against — residual "
                    "codes die with their cell geometry (and raw-vector "
                    "codes, e.g. read_ivf_pq_store's, are not residual codes)"
                )
        if codebooks is not None:
            # centroids alone don't prove residual books hold residual
            # entries (a raw-layout store's (books, cents) pair passes
            # the geometry guard above — the tag is what refuses it);
            # and a mode mismatch (double books with exact=True or vice
            # versa) must surface here, at plan-build, not inside the
            # LUT builder after an eager cand pin has run real jobs
            _check_residual_tag(codebooks, residual, caller)
            _check_codebook_mode(codebooks, exact, caller)

    def should_broadcast(self) -> bool:
        """Whether the fused serve path may FORCE-broadcast its
        candidate-bounded relations (skipping two AQE shuffle-stage
        materializations per serve). True (the default) is the fused
        serving contract — candidate volume ≲ 10⁸ rows; False streams
        the same relations and lets AQE pick the joins at runtime
        (which still broadcasts genuinely small sides). No auto mode —
        see the class docstring for why the plan-stats gate was
        rejected."""
        return self.serve_broadcast


def ivf_pq_topk(
    emb: DataFrame,
    query_ids_max: int = 20,
    k: int = 5,
    num_centroids: int = 32,
    probes: int = 3,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    refine: int | None = None,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
    corpus_cells: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
    dim: int | None = None,
    residual: bool = False,
    exact: bool = False,
    adc_side: DataFrame | None = None,
    cand: DataFrame | None = None,
    pair_scores: DataFrame | None = None,
    serve_broadcast: bool = True,
    pq_picks: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with exact re-ranking — the memory-bounded serve tier
    (Jégou et al. 2011, the FAISS IVFPQ layout): ``ivf_topk`` prunes
    WHICH vectors each query examines (probed cells) but re-scores
    every candidate against its FULL vector (256 B at dim 64); here the
    probed cells are scanned as ``num_subvectors``-byte PQ codes via
    the per-query ADC lookup table, only the ADC top-``refine``
    shortlist (default 4k) is fetched at full precision for exact
    re-scoring, and the final top-k ranks on the same exact-decimal
    cosine as every other query path. A billion-vector cell store
    drops 32× in scan traffic at the defaults; full vectors are
    touched for ~refine rows per query, not per-cell volume.

    Recall: candidates are ivf_topk's (same cells, same probes); the
    ADC shortlist is the only extra approximation, and with ``refine``
    ≥ the probed-cell candidate volume the output is IDENTICAL to
    ``ivf_topk`` (pytest-pinned) — ``refine`` buys exactness back at
    full-vector-fetch cost, the standard IVF-PQ knob.

    ``serve_broadcast`` gates the fused path's forced broadcasts of
    candidate-bounded relations (True, the default, forces — the
    caller asserts the ~1e8-row fused-serving contract; False streams
    them and lets AQE pick the joins — the explicit escape when a
    candidate list might breach the 8 GB broadcast cap; there is no
    auto mode — see _PQServeInputs for why plan-stats gating was
    rejected). ``pq_picks`` (a pinned
    :func:`pq_pick_ids` relation) seeds in-call codebook training so
    a suite training raw AND residual books over the same corpus runs
    the ranked pick pass once; only meaningful with ``codebooks=None``
    (the combination is refused). Every hook's pairwise contract is
    validated in ONE place, :class:`_PQServeInputs`, before any eager
    pin runs a job.

    Hooks mirror ``ivf_topk``/``pq_topk``: pass ``assignments`` (a
    ranked ``ivf_assignments`` over the same base) to reuse a suite's
    one corpus-vs-centroids pass, ``centroids`` for a persisted cell
    geometry (with ``corpus_cells`` — an (id, centroid_id) relation,
    e.g. a store's stored primary cells — to skip re-assigning the
    corpus entirely: :func:`read_ivf_pq_store` supplies all four
    store-side pieces), ``codebooks``/``codes`` for a persisted PQ
    layout (an :func:`incremental_ivf_update` store written with
    ``pq_codebooks=``), ``cand`` for a shared candidate-pair list
    (:func:`ivf_candidate_pairs`, ideally pinned — a suite running
    exact/raw-PQ/residual-PQ serve legs then derives the cells join
    once), ``pair_scores`` for the shared exact-cosine scored relation
    over that same cand (the re-rank fold then runs once per suite:
    the shortlist joins into it instead of re-running
    ``cosine_for_pairs``; caller contract — it must COVER this call's
    candidates, i.e. be scored over the same cand), and ``dim`` to
    keep training probe-free.

    Scale shape: queries (with their O(m·k) LUT arrays) broadcast into
    the candidate join; codes join shuffles only the candidate list;
    the full-vector join after the shortlist is O(queries · refine).

    ``residual=True`` is the textbook IVFADC refinement: quantize the
    RESIDUAL x − c(x) against each vector's primary centroid instead
    of the raw vector. Residuals are smaller and better centered than
    raw vectors, so the same code budget spends its resolution where
    the cell already localized the point — on clustered data this is
    what makes 8-byte codes usable at all (pytest measures the recall
    gain on a planted clustered corpus). Scoring decomposes as
    dot(q, x̂) = dot(q, c) + dot(q, r̂): the first term is one
    O(queries·C) broadcastable relation, the second the usual ADC LUT
    over the RESIDUAL codebooks; the reconstructed norm |c + r̂| is
    precomputed per corpus row at index time (query-independent).
    Requires an explicit cell geometry when ``codebooks``/``codes``
    are supplied (codes are only meaningful against the geometry that
    produced the residuals — the same fixed-geometry contract as the
    incremental store's centroids), and the codebooks must carry the
    ``residual`` tag :func:`pq_train_residual` writes — raw books with
    a matching geometry would otherwise decode raw codes as residuals,
    scoring plausibly with collapsed recall. The STORE supports both
    layouts: raw books (untagged) write geometry-independent codes
    that survive retrain untouched; residual-tagged books write IVFADC
    codes that ``retrain_ivf_store`` re-encodes against the new
    geometry inside its re-assignment pass.

    ``exact=True`` (with ``exact`` codebooks/codes): the ADC SHORTLIST
    itself becomes engine-independent — codes, LUTs, and the refine
    ranking run in the module's exact integer decimals (via the shared
    :func:`_exact_adc_topk` two-pass, so the decimal folds stay
    O(queries·refine)), and the final top-k re-ranks on the exact-
    decimal cosine like every other query path. A SQL oracle can then
    replay the ENTIRE pipeline bitwise, shortlist membership included
    (the double-mode shortlist is rank-stable only up to float
    summation order). Composes with ``residual=True`` (r9): residuals
    are taken in INTEGER space (quantize x and c separately, subtract
    — the ``pq_train_residual(exact=True)`` convention), the dot(q,c)
    cell term is an exact decimal at the same scale as the LUT
    entries and sums INTO the shortlist fold's decimal accumulator
    before the one string-hopped double conversion (decimal addition
    is associative, so term order cannot split engines), and |x̂| =
    |cq + r̂q| is the decimal norm — the full IVFADC serve path,
    shortlist membership included, checks bitwise."""
    # the full hook guard matrix runs in ONE place, before anything
    # eager (r10 consolidation — see _PQServeInputs). exact=True with
    # residual=True (r9): the decomposed score is order-stable —
    # dot(q, c) and the residual LUT entries are each exact decimals,
    # and decimal addition is associative, so summing the centroid
    # term INTO the LUT fold before the module's one string-hopped
    # double conversion pins the combined numerator bitwise.
    inputs = _PQServeInputs(
        k=k, refine=refine, residual=residual, exact=exact,
        centroids=centroids, assignments=assignments,
        corpus_cells=corpus_cells, codebooks=codebooks, codes=codes,
        adc_side=adc_side, cand=cand, pair_scores=pair_scores,
        pq_picks=pq_picks, serve_broadcast=serve_broadcast,
    )
    refine = inputs.refine
    base = _ensure_ann_base(emb, id_col)
    # uniqueness of the candidate pairs is structural when WE derive
    # the cells: corpus side is one rank-1 (or probes=1) row per id,
    # query side one row per (id, probed centroid) — each (id_a, id_b)
    # arises from at most one shared cell, so the pair distinct is a
    # pure fixed-cost exchange + aggregate. Only EXTERNAL corpus_cells
    # (no such contract) still dedup.
    cells_external = corpus_cells is not None and assignments is None
    if assignments is not None:
        corpus_cells = assignments.filter(F.col("probe_rank") == 1).select(
            F.col(id_col), "centroid_id"
        )
        query_cells = assignments.filter(F.col(id_col) < query_ids_max).select(
            F.col(id_col), "centroid_id"
        )
    else:
        if centroids is None:
            # corpus_cells-without-centroids already refused by inputs
            num_centroids = resolve_num_centroids(base, num_centroids)
            cents = _seed_centroids(base, num_centroids, id_col)
        else:
            cents = centroids
        if corpus_cells is None:
            corpus_cells = ivf_assignments(
                base, num_centroids, probes=1, id_col=id_col, vec_col="vdbl",
                centroids=cents,
            )
        qbase = base.filter(F.col(id_col) < query_ids_max)
        query_cells = ivf_assignments(
            qbase, num_centroids, probes=probes, id_col=id_col, vec_col="vdbl",
            centroids=cents,
        )
    cand_supplied = cand is not None
    if cand is None:
        cand = (
            query_cells.select(F.col(id_col).alias("id_a"), "centroid_id")
            .join(
                corpus_cells.select(F.col(id_col).alias("id_b"), "centroid_id"),
                "centroid_id",
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
        )
        if cells_external:
            cand = cand.distinct()

    def _double_adc_shortlist(adc: DataFrame) -> DataFrame:
        wa = Window.partitionBy("id_a").orderBy(
            F.col("_adc").desc(), F.col("id_b")
        )
        return (
            adc.withColumn("_ar", F.row_number().over(wa))
            .filter(F.col("_ar") <= refine)
            .select("id_a", "id_b")
        )

    if residual:
        if assignments is not None:
            # assignments supply the cells, centroids the vectors (the
            # bare-assignments form is refused by inputs) — the caller
            # asserts they describe the SAME geometry (a suite sharing
            # one ranked corpus-vs-centroids pass)
            cents = centroids
        # the pair list is consumed TWICE (the encode semi-join's id
        # list and the probe side of the shortlist join): un-pinned,
        # each reference re-runs the cells join with its own AQE stage
        # materializations — candidate volume is O(queries · cell), so
        # the pin is small by construction (r9 job audit). A supplied
        # cand= is the caller's to pin. Pinned AFTER every refusal
        # above: the eager checkpoint runs real jobs, and a call that
        # is going to be refused must refuse at plan-build, not after
        # materializing the candidate join.
        if not cand_supplied:
            cand = cand.localCheckpoint()
        # gated candidate-bounded force-broadcasts — the raw branch's
        # twin (r10): serve_broadcast=False is the big-serve escape
        fb = F.broadcast if inputs.should_broadcast() else (lambda d: d)
        cvecs = F.broadcast(
            cents.select("centroid_id", F.col("cvec").alias("_cvec"))
        )
        # exact mode quantizes x and c SEPARATELY and subtracts in
        # integer space (the pq_train_residual convention): the
        # residual relation is then exact longs a SQL twin re-derives
        rsub = (
            F.zip_with(
                quantized_vector("vdbl"),
                quantized_vector("_cvec"),
                lambda a, b: a - b,
            )
            if exact
            else F.zip_with("vdbl", "_cvec", lambda a, b: a - b)
        )
        res = (
            base.join(corpus_cells.select(F.col(id_col), "centroid_id"), id_col)
            .join(cvecs, "centroid_id")
            .select(
                F.col(id_col), "centroid_id", "_cvec", rsub.alias("_rvec")
            )
        )
        if codebooks is None:
            # training sees the WHOLE corpus (codebooks are the
            # geometry). Pin the residual relation FIRST: the seeded
            # pick and the fused encode+norm side each consume it, and
            # un-pinned both would re-run the corpus-wide assignment
            # join + subtraction; then pin the O(m·k) books so the
            # downstream packers don't re-run the picks. (A deployment
            # passes persisted codebooks/codes and never pays either.)
            res = res.localCheckpoint()
            codebooks = pq_train(
                res, num_subvectors, codes_per_subvector, id_col=id_col,
                vec_col="_rvec", dim=dim, exact=exact, prequantized=exact,
                picks=pq_picks,
            ).localCheckpoint()
        # encode/ADC-precompute only rows some query actually probes —
        # the equi-join on id_b would discard the rest anyway, but only
        # AFTER their in-row encode/norm folds had run
        # semi-join right side needs no distinct: LeftSemi is
        # duplicate-agnostic, and the dedup was another fixed-cost
        # exchange + aggregate pair (r9 job audit)
        cand_ids = cand.select(F.col("id_b").alias(id_col))
        if codes is None:
            # FUSED encode + ADC side: res already carries the cell id
            # and centroid vector, so one in-row projection computes
            # codes + positions + reconstructed norm with zero joins —
            # the separate encode pass, its codes↔cells re-join, and
            # the geometry re-join were each an AQE stage
            # materialization of size-independent overhead (r9 job
            # audit: 28 jobs → the fused leg's count)
            rside_rel = _residual_adc_side(
                None, codebooks, None, None, id_col, exact=exact,
                res=res.join(fb(cand_ids), id_col, "left_semi"),
            )
        else:
            rside_rel = _residual_adc_side(
                codes.join(fb(cand_ids), id_col, "left_semi"),
                codebooks, corpus_cells, cents, id_col, exact=exact,
            )
        # the per-(query, cell) dot(q, c) term rides the query LUT
        # projection as a centroid_id → dot MAP (cents= hook): no
        # separate qc relation, no third pair-frame join. Exact mode
        # keeps the values WIDE DECIMALS (the LUT scale) so the
        # shortlist fold sums them into the decimal accumulator before
        # the one double conversion
        queries = _pq_query_luts(
            base.filter(F.col(id_col) < query_ids_max), codebooks, id_col,
            "vdbl", exact=exact, cents=cents,
        )
        rside = fb(rside_rel)
        qc_val = F.element_at(F.col("_qcm"), F.col("centroid_id"))
        if exact:
            # ≤ query_ids_max rows; pinned because the two-pass
            # shortlist broadcasts this frame twice (pair join + margin
            # re-join) and each un-pinned broadcast re-runs the packed/
            # geometry aggregations upstream
            queries = queries.withColumn(
                "_lutd",
                F.transform(F.col("_lut"), lambda x: x.cast("double")),
            ).localCheckpoint()
            paired = (
                cand.join(F.broadcast(queries), "id_a")
                .join(rside, "id_b")
                .withColumn("_qc", qc_val)
            )
            shortlist = _exact_adc_topk(
                paired, queries, refine, qc_col="_qc"
            ).select("id_a", "id_b")
        else:
            adc = (
                cand.join(F.broadcast(queries), "id_a")
                .join(rside, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    (
                        (qc_val + _adc_lut_sum(False))
                        / (F.col("_qn") * F.col("_xn"))
                    ).alias("_adc"),
                )
            )
            shortlist = _double_adc_shortlist(adc)
    else:
        if codebooks is None:
            # trained on the whole corpus, pinned for the three packers
            # (pq_picks= replaces the in-call seeded pick with a
            # shared one — see pq_train)
            codebooks = pq_train(
                base, num_subvectors, codes_per_subvector, id_col=id_col,
                vec_col="vdbl", dim=dim, exact=exact, picks=pq_picks,
            ).localCheckpoint()
        # supplied-codebooks tag/mode refusals ran in inputs, before
        # the eager pin below could run real jobs
        # same double-consumption pin as the residual branch (cand
        # feeds the encode semi-join's id list AND the shortlist pair
        # join), placed after the plan-build refusals; with a
        # precomputed adc_side= the pair join is cand's ONLY
        # consumer, so no pin
        if not cand_supplied and adc_side is None:
            cand = cand.localCheckpoint()
        # forcing the candidate-bounded broadcasts skips two AQE
        # shuffle-stage materializations, but a broadcast hard-caps at
        # Spark's 8 GB / int-max-rows limit while the shuffle it
        # replaces is disk-backed — so the force is gated (r10) on the
        # serve_broadcast kwarg (the ~10⁸-row fused-serving contract).
        # With serve_broadcast=False the same relations join UN-forced
        # and AQE picks the strategy at runtime (a persisted adc_side=
        # remains the big-serve escape hatch that never builds a
        # candidate-filtered side at all).
        fb = F.broadcast if inputs.should_broadcast() else (lambda d: d)
        if adc_side is None:
            # encode/ADC-precompute candidates only (see residual
            # branch). Semi-join right side needs no distinct: LeftSemi
            # is duplicate-agnostic, and the dedup was a fixed-cost
            # exchange + aggregate pair (r9 job audit).
            cand_ids = cand.select(F.col("id_b").alias(id_col))
            if codes is None:
                codes = pq_encode(
                    base.join(fb(cand_ids), id_col, "left_semi"),
                    codebooks, id_col=id_col, vec_col="vdbl", exact=exact,
                )
            else:
                codes = codes.join(fb(cand_ids), id_col, "left_semi")
        queries = _pq_query_luts(
            base.filter(F.col(id_col) < query_ids_max), codebooks, id_col,
            "vdbl", exact=exact,
        )
        if exact:
            # double twin of the LUT, once per query row (pq_topk's
            # prefilter shape); the shortlist is then the shared
            # two-pass exact-decimal rank at k=refine — membership
            # provably identical to an all-exact ADC ranking
            queries = queries.withColumn(
                "_lutd",
                F.transform(F.col("_lut"), lambda x: x.cast("double")),
            )
            # candidate-filtered ADC side broadcasts under the same
            # gated candidate-volume contract as the id list (slim
            # _idx+_xn rows). Probe side then reaches the shortlist
            # window with ZERO pre-window exchanges. A precomputed
            # adc_side= is CORPUS-wide, so it streams instead and the
            # pair list joins into it UN-forced — that path is the
            # big-serve escape hatch, so AQE must stay free to pick a
            # shuffle when the candidate list outgrows the broadcast
            # cap.
            if adc_side is None:
                paired = cand.join(F.broadcast(queries), "id_a").join(
                    fb(_codes_adc_side(codes, codebooks, id_col, exact=True)),
                    "id_b",
                )
            else:
                paired = adc_side.join(cand, "id_b").join(
                    F.broadcast(queries), "id_a"
                )
            shortlist = _exact_adc_topk(paired, queries, refine).select(
                "id_a", "id_b"
            )
        else:
            if adc_side is None:
                adc_rel = fb(
                    _codes_adc_side(codes, codebooks, id_col, exact=False)
                )
                adc = cand.join(F.broadcast(queries), "id_a").join(
                    adc_rel, "id_b"
                )
            else:
                # un-forced pair-list join — the big-serve path (see
                # the exact twin above)
                adc = adc_side.join(cand, "id_b").join(
                    F.broadcast(queries), "id_a"
                )
            adc = adc.select(
                "id_a", "id_b", _adc_pair_cosine(exact=False).alias("_adc")
            )
            shortlist = _double_adc_shortlist(adc)
    if pair_scores is not None:
        # shared re-rank relation (suite hook): the shortlist keys into
        # the already-scored cand pairs — per-pair exact cosine is a
        # pure function of the pair, so joining ≡ recomputing. LEFT
        # join + in-plan raise: a pair_scores that does not cover this
        # call's candidates (scored under a min_cosine, or pinned from
        # a stale cand) would otherwise silently DROP shortlist rows —
        # fewer than k results with plausible scores, the same
        # silent-mis-serve class the codes=/adc_side= guards refuse
        scored = shortlist.join(
            pair_scores, ["id_a", "id_b"], "left"
        ).select(
            "id_a",
            "id_b",
            F.when(
                F.col("cosine").isNull(),
                F.raise_error(
                    "pair_scores= does not cover this call's shortlist: "
                    "score the SAME cand this call serves (no min_cosine "
                    "filter) or drop the hook"
                ).cast("double"),
            )
            .otherwise(F.col("cosine"))
            .alias("cosine"),
        )
        return _rank_topk(scored, k, check_unique=True)
    scored = cosine_for_pairs(
        base, shortlist, exact_norms_in_base=False, id_col=id_col
    )
    return _rank_topk(scored, k)


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
    Σ qv_i·x̃_i and the per-row corpus norm Σ x̃_i² then fold as exact
    decimals with the module's ONE string-hopped double conversion
    each, and shortlist MEMBERSHIP (row_number over score DESC, id_b
    ≤ refine) is bitwise identical in Spark and the DuckDB oracle.
    Reads ONLY (codes, scale, offset) — exactly the persisted
    ``sq8_encode`` store layout, so a parquet-read codes relation
    serves without the source vectors.

    Two-pass (the ``_exact_adc_topk`` discipline): a primitive-double
    pass over the SAME quantized quantities ranks all pairs (|x̃| and
    |qv| are < 2^53, so their double images are exact and the only
    approx→exact gap is m-term summation error, ~1e-14 in cosine
    units); the interpreted decimal folds run only within 1e-6 of each
    query's refine-th approximate score (≥ 10⁷ headroom), and the
    refine-th cut is a SECOND window over the SAME partitioning so the
    pair upstream executes once (the r8 kth-window rule)."""
    sq = (F.col("scale") * F.lit(_SQ8_XSCALE)).cast("long")
    offq = (F.col("offset") * F.lit(_SQ8_XSCALE)).cast("long")
    xt = F.transform("codes", lambda c: offq + sq * c.cast("long"))
    xsq = (
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
    corpus = side.select(F.col(id_col).alias("id_b"), xt.alias("_xt")).select(
        "id_b",
        "_xt",
        F.transform("_xt", lambda x: x.cast("double")).alias("_xtd"),
        _sq8_norm_guard(F.sqrt(xsq), F.col("id_b"), "corpus").alias("_xn"),
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
            "_xn",
            (nd / (F.col("_qn") * F.col("_xn"))).alias("_sd"),
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
    ).select("id_a", "id_b", "_qn", "_xn")
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
    exact = refetch.select(
        "id_a",
        "id_b",
        "_qv",
        "_qn",
        (n_exact / (F.col("_qn") * F.col("_xn"))).alias("_s"),
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
