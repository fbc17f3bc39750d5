"""Inverted-file (IVF) ANN: seeded/Lloyd centroids, cell assignment,
candidate pairing, and the multi-probe query path. Split out of the
single similarity module in r11 (mechanical move, no behavior change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (
    _QSCALE,
    _ensure_ann_base,
    _rank_topk,
    cosine_for_pairs,
    dbl_vector,
    dot_double,
    dot_exact,
    quantized_vector,
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
    arises from at most one shared cell.

    The query side is O(query_ids_max · probes) rows BY CONSTRUCTION —
    the one side of this join that stays small at any corpus size — so
    it takes an explicit broadcast (r15): un-hinted, BOTH sides of the
    cells join shuffled by centroid_id, i.e. the O(corpus) cell index
    moved through an exchange to meet a few dozen query rows."""
    corpus_cells = assignments.filter(F.col("probe_rank") == 1).select(
        F.col(id_col), "centroid_id"
    )
    query_cells = assignments.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col), "centroid_id"
    )
    return (
        F.broadcast(query_cells.select(F.col(id_col).alias("id_a"), "centroid_id"))
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
    serve_broadcast: bool = True,
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
        # exchange). pair_scores is candidate-bounded by contract
        # (scored over exactly cand=), so it takes the family's gated
        # force-broadcast (r15: a pinned relation has no stats, so the
        # un-hinted LEFT join planned as a SortMergeJoin — two
        # exchanges + two sorts; ``serve_broadcast=False`` is the
        # big-serve escape, the ivf_pq_topk contract)
        ps_b = F.broadcast(pair_scores) if serve_broadcast else pair_scores
        scored = cand.join(ps_b, ["id_a", "id_b"], "left").select(
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
            # size-independent shuffle stages, r9 job audit). Query
            # side broadcast: O(queries · probes) by construction
            # (ivf_candidate_pairs' r15 rationale — the corpus-cells
            # index must never shuffle to meet it)
            cand = (
                F.broadcast(
                    query_cells.select(
                        F.col(id_col).alias("id_a"), "centroid_id"
                    )
                )
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


