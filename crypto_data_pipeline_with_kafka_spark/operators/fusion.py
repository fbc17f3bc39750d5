"""Hybrid-retrieval fusion and serving evaluation — the glue an LLM
data pipeline runs ON TOP of its retrieval tiers: Reciprocal Rank
Fusion (public method: Cormack, Clarke & Büttcher 2009, SIGIR — the
standard way to combine a lexical BM25 ranking with a dense ANN
ranking without score calibration) and recall@k (the serving-quality
metric every quantized tier in ``operators/similarity`` is judged by;
SURVEY §2's "measure, don't guess" applied to retrieval itself).

Both operators consume RANKINGS — small per-query top-k relations the
retrieval tiers already emit (``bm25_topk``: (query_id, doc_id, rank);
``brute_force_topk``/``sq8_topk``/``bq_topk``/``mrl_topk``:
(id_a, id_b, rnk)) — so their cost is O(queries · k · sources),
independent of corpus size: fusion is where the pipeline is CHEAP, and
these stay declarative single-exchange plans.

Numeric contract (the module invariant): RRF contributions are
quantized to nano units (``round(1e9 / (k + rank))`` as long — ranks
are integers, so each contribution is an exactly-representable double
correctly rounded to the same integer in any engine) and summed as
integers — order-free under any partitioning, and an independent SQL
engine replays the fused scores bit-for-bit from the same input
ranks. recall@k is pure integer counting with one exact division.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# RRF's smoothing constant: the value the original paper tuned
# (k = 60) and the common default in production hybrid search.
_RRF_K = 60
# nano quantization of 1/(k + rank): contributions are ≤ 1/(k+1) so a
# long overflows only past ~5·10^11 fused sources per doc; nano (not
# the bm25 micro) because no ln() is involved — 1e9/(k+r) is a
# correctly-rounded double of an exact rational, identical across
# engines, and round() can only disagree at an exact .5, which for
# k=60 first occurs at rank 964 (2e9/(k+r) odd ⇔ k+r = 1024·odd) —
# far beyond any top-k fusion depth.
_RRF_SCALE = 1e9


def rrf_fuse(
    rankings: Sequence[tuple[str, DataFrame]],
    k: int = _RRF_K,
    top_k: int | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion over ``rankings`` — a sequence of
    (source_tag, DataFrame) pairs, each frame holding one retrieval
    tier's per-query ranking under ``query_col``/``doc_col``/
    ``rank_col`` (rank 1 = best; extra columns are ignored). Returns
    one row per fused (query, doc):

    (query_id, doc_id, n_sources, rrf_nano, rrf_score, rank)

    with ``rrf_nano`` = Σ_sources round(1e9/(k + rank)) — the exact
    integer to compare across engines — ``rrf_score`` its double
    rendering, ``n_sources`` how many tiers surfaced the doc, and
    ``rank`` the fused per-query position ((rrf_nano DESC, doc_id
    ASC) — deterministic under any partitioning). ``top_k`` truncates
    each fused list; None returns every candidate any tier surfaced.

    Why RRF and not score interpolation: BM25 scores and cosines live
    on incomparable scales, and any linear blend needs per-corpus
    calibration; RRF uses only RANKS, is scale-free, and degrades
    gracefully when one tier misfires (Cormack 2009's result — it
    beat learned fusion on TREC runs). A doc missing from a tier
    simply contributes nothing — no imputation.

    ``weights`` (optional, {tag: w}) scales each source's
    contribution — round(w·1e9/(k + rank)) — the common production
    extension when one tier is trusted more (e.g. dense 2:1 over
    lexical). Weights stay inside the integer-quantization contract
    (one IEEE multiply of exact doubles before the round, identical
    in any engine); tags absent from the dict default to 1.0, and a
    weight for an unknown tag is refused loudly.

    Scale shape: inputs are top-k relations (O(queries·k) rows each);
    the union + groupBy(query, doc) aggregates with map-side combine
    on integer contributions (order-free by quantization), then ONE
    window exchange on query_id ranks the fused lists. Duplicate
    (query, doc) rows WITHIN one tier would double-contribute — tiers
    emitting row_number()-ranked output cannot produce them, and the
    ranking relations are tiny enough that callers composing ad-hoc
    frames should distinct() first (documented rather than guarded:
    an extra count(*) window per tier would cost more than the whole
    fusion)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one (tag, ranking) pair")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    if weights:
        unknown = set(weights) - {tag for tag, _ in rankings}
        if unknown:
            raise ValueError(
                f"rrf_fuse: weights for unknown tags {sorted(unknown)} — "
                "weight keys must match ranking tags"
            )
    contribs = []
    for tag, r in rankings:
        w = (weights or {}).get(tag, 1.0)
        contribs.append(
            r.select(
                F.col(query_col).alias("query_id"),
                F.col(doc_col).alias("doc_id"),
                F.round(
                    F.lit(w * _RRF_SCALE) / (F.lit(k) + F.col(rank_col))
                )
                .cast("long")
                .alias("_c"),
            )
        )
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_sources"),
        F.sum("_c").alias("rrf_nano"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col("doc_id").asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w).cast("int"))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.select(
        "query_id",
        "doc_id",
        "n_sources",
        "rrf_nano",
        (F.col("rrf_nano") / F.lit(_RRF_SCALE)).alias("rrf_score"),
        "rank",
    )


def recall_at_k(
    got: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-query recall of a served ranking against a ground-truth
    ranking: (query_id, hits, truth_n, recall) with ``recall`` =
    |got ∩ truth| / |truth| per query — THE metric the quantized
    serve tiers (SQ8/BQ1/MRL/PQ) are judged by against
    ``brute_force_topk``, computed distributed instead of in a test's
    driver loop. Both inputs are (query, doc) relations (extra
    columns ignored); rows beyond the intended k should be filtered
    by the caller (the tiers' top-k output already is).

    Every query present in ``truth`` gets a row — a tier that served
    NOTHING for a query scores 0.0, not absent (the silent-miss case
    an aggregate-only join would hide). Queries ``got`` invents (not
    in truth) are ignored: recall has no denominator there;
    precision-style metrics would be a different function.

    Exact by construction: integer counts and one division of exact
    longs — no floating accumulation, bitwise identical in any
    engine. Scale shape: two groupBys on (query) over O(queries·k)
    ranking rows, one broadcast-friendly equi-join. The join sides are
    bounded by the MODULE contract (rankings: O(queries·k) rows at any
    corpus size), but callers routinely pass pinned/checkpointed
    relations the planner has no stats for — un-hinted those joins
    planned as SortMergeJoins (two exchanges + two sorts each, r15
    plan audit), so every join in this module broadcasts its bounded
    probe side explicitly. ``broadcast`` gates that force (r16, the
    serve_broadcast discipline from the ivf serve tiers): True, the
    default, asserts the ranking-bounded contract; False streams the
    sides and lets AQE pick the joins — the explicit escape for a
    query LOG large enough that queries·k itself breaches the 8 GB /
    int-max-rows broadcast cap (a mis-forced broadcast fails hard
    where the shuffle it replaced merely degraded)."""
    fb = F.broadcast if broadcast else (lambda d: d)
    t = truth.select(
        F.col(query_col).alias("query_id"), F.col(doc_col).alias("doc_id")
    )
    g = got.select(
        F.col(query_col).alias("query_id"), F.col(doc_col).alias("doc_id")
    )
    truth_n = t.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("truth_n")
    )
    hits = (
        t.join(fb(g), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        truth_n.join(fb(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
            "truth_n",
            (
                F.coalesce(F.col("hits"), F.lit(0).cast("long"))
                / F.col("truth_n")
            ).alias("recall"),
        )
    )


# DCG position discounts quantize to micro units: 1/log2(i+1) ≤ 1, and
# log2() may differ between engines in the last ulp (~1e-16) — that is
# ~1e-10 of a micro quantum, so the rounded integers agree
# engine-to-engine with negligible boundary risk (the bm25_topk micro
# argument, functions/text.py). Long headroom: grade·1e6 per position,
# overflow needs ~9e12 summed grade units per query.
_NDCG_SCALE = 1e6


def ndcg_at_k(
    got: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """NDCG@k of a served ranking against ground truth — the
    order-SENSITIVE companion to :func:`recall_at_k` (recall says the
    right docs came back; NDCG says they came back in the right
    order, the metric hybrid-search evaluations actually report).
    Returns (query_id, dcg_micro, idcg_micro, ndcg) per truth query:

    ``dcg_micro``  = Σ_{i ≤ k} grade(doc_i) · round(1e6 / log2(i+1))
    over the served ranking's positions, ``idcg_micro`` the same sum
    over the ideal ordering (grades descending, doc id tie-break) of
    the truth set truncated to k, ``ndcg`` their exact-long division.

    ``grade_col`` names an INTEGER relevance column on ``truth``
    (graded relevance, e.g. 0-4); None means binary relevance — every
    truth doc grades 1, which reduces NDCG to rank-discounted recall.
    Integer grades keep the whole computation in exact longs; the one
    transcendental (log2 in the position discount) is micro-quantized
    so both engines produce identical integers. Served docs outside
    the truth set contribute 0 (standard); queries only ``got`` knows
    are ignored (no truth, no denominator — the recall_at_k
    convention); a truth query the tier never served scores 0.0.
    ``broadcast=False`` is the big-query-log escape (see recall_at_k).

    Scale shape: one join of the rank-truncated served relation to
    the truth grades, two groupBys on query — O(queries·k) rows
    throughout, corpus-independent. Joins broadcast their bounded
    side explicitly (the recall_at_k rationale: pinned ranking inputs
    have no stats and otherwise plan as SortMergeJoins)."""
    if k < 1:
        raise ValueError(f"ndcg_at_k: k must be >= 1, got {k}")
    fb = F.broadcast if broadcast else (lambda d: d)
    grade = (
        F.col(grade_col).cast("long")
        if grade_col is not None
        else F.lit(1).cast("long")
    )
    t = truth.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        grade.alias("_rel"),
    )
    disc = lambda pos: F.round(  # noqa: E731
        F.lit(_NDCG_SCALE) / F.log2(pos + F.lit(1.0))
    ).cast("long")
    g = got.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).alias("_pos"),
    ).filter(F.col("_pos") <= k)
    dcg = (
        g.join(fb(t), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            (F.coalesce(F.col("_rel"), F.lit(0)) * disc(F.col("_pos"))).alias(
                "_term"
            ),
        )
        .groupBy("query_id")
        .agg(F.sum("_term").cast("long").alias("dcg_micro"))
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("_rel").desc(), F.col("doc_id").asc()
    )
    idcg = (
        t.withColumn("_pos", F.row_number().over(w_ideal))
        .filter(F.col("_pos") <= k)
        .select(
            "query_id", (F.col("_rel") * disc(F.col("_pos"))).alias("_term")
        )
        .groupBy("query_id")
        .agg(F.sum("_term").cast("long").alias("idcg_micro"))
    )
    return (
        idcg.join(fb(dcg), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("dcg_micro"), F.lit(0).cast("long")).alias(
                "dcg_micro"
            ),
            "idcg_micro",
            F.when(
                F.col("idcg_micro") > 0,
                F.coalesce(F.col("dcg_micro"), F.lit(0).cast("long"))
                / F.col("idcg_micro"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def precision_at_k(
    got: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-query precision of a served ranking against ground truth:
    (query_id, hits, served_n, precision) with ``precision`` =
    |got ∩ truth| / |got| — the third member of the eval triple
    (recall: of the right docs, how many came back; NDCG: in what
    order; precision: of what came back, how much was right — THE
    metric when the served list is user-facing and junk costs).

    The denominator conventions mirror :func:`recall_at_k`'s,
    transposed: every query ``got`` served gets a row (a tier serving
    pure junk scores 0.0, not absent); truth queries the tier never
    served are ignored here — they have no served list to measure,
    and recall_at_k is where their 0.0 lives. Exact integer counting
    with one exact-long division; O(queries·k) rows throughout.
    Joins broadcast their bounded side explicitly (the recall_at_k
    rationale); ``broadcast=False`` is the big-query-log escape (see
    recall_at_k)."""
    fb = F.broadcast if broadcast else (lambda d: d)
    g = got.select(
        F.col(query_col).alias("query_id"), F.col(doc_col).alias("doc_id")
    )
    t = truth.select(
        F.col(query_col).alias("query_id"), F.col(doc_col).alias("doc_id")
    )
    served_n = g.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("served_n")
    )
    hits = (
        g.join(fb(t), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        served_n.join(fb(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
            "served_n",
            (
                F.coalesce(F.col("hits"), F.lit(0).cast("long"))
                / F.col("served_n")
            ).alias("precision"),
        )
    )
