"""Semantic deduplication over embeddings (SemDeDup, Abbas et al.
2023, arXiv:2303.09540 — public method): cluster the corpus with
k-means-style cells, find ε-ball duplicate groups WITHIN each cell by
exact cosine, keep ONE representative per group — the paper keeps the
member with the LOWEST cosine to its cluster centroid (pruning toward
diversity: the kept copy is the least prototypical one). This is the
embedding-space member of the dedup family: exact/MinHash/SimHash
catch lexical near-dups, SemDeDup catches SEMANTIC ones (paraphrases,
translations, templated rewrites) that share no shingles.

Also hosts :func:`semantic_decontaminate` — the embedding twin of the
k-gram eval-set decontamination (same broadcast-benchmark,
streaming-corpus shape, exact-decimal emitted cosines).

Built by COMPOSITION of the engine's existing distributed pieces — no
new pair generator, no new clustering: IVF cells are the k-means
clusters (``ivf_assignments``, zero-shuffle in-row assignment against
broadcast centroids, optional Lloyd refinement), within-cell candidate
pairing + exact-cosine verify is ``ivf_ann_pairs`` (candidate-bounded:
only same-cell pairs are ever scored), transitive ε-ball groups are
``connected_components`` (O(log diameter) rounds), and the keep rule is
``select_cluster_survivors`` with centroid-cosine as the quality key.
Every stage's 100-TB story is therefore the one already audited on its
component."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
    connected_components,
    select_cluster_survivors,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
    _ensure_ann_base,
    _seed_centroids,
    dbl_vector,
    dot_double,
    dot_exact,
    ivf_ann_pairs,
    ivf_assignments,
    lloyd_refined_centroids,
    quantized_vector,
    resolve_num_centroids,
)


def semantic_dedup(
    emb: DataFrame,
    num_centroids="auto",
    probes: int = 1,
    threshold: float = 0.95,
    lloyd_rounds: int = 0,
    keep: str = "farthest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    caches: list | None = None,
    exact: bool = False,
) -> DataFrame:
    """SemDeDup over an embeddings relation. Returns ONE row per input
    vector: (id, cluster_id, centroid_cosine, is_duplicate) —
    ``cluster_id`` is the ε-ball duplicate group (NULL for vectors in
    no group), ``is_duplicate`` marks every group member EXCEPT its
    survivor; ``filter(~is_duplicate)`` is the pruned corpus.

    Semantics: two vectors are ε-ball duplicates when they probe a
    common IVF cell AND their exact cosine ≥ ``threshold``; groups are
    the transitive closure. Per group the survivor is the member
    FARTHEST from its primary cell centroid (``keep='farthest'``, the
    SemDeDup paper's diversity-keeping rule; ``'closest'`` keeps the
    most prototypical member instead), ties → lowest id — the
    tie-break that makes the pick deterministic even though
    ``centroid_cosine`` itself is an engine-local double (it never
    leaves the keep rule; emitted PAIR cosines inside the composition
    stay exact-decimal as always).

    Like the paper, recall is bounded by the clustering: a true pair
    split across non-overlapping probe sets is missed — raise
    ``probes`` (the multi-probe recall knob, same trade as
    ``incremental_ivf_update``) or ``lloyd_rounds`` (better cell
    coherence) to close it. Precision is 1.0 by construction: every
    emitted pair was verified by exact cosine.

    ``exact=True`` (the oracle-attested mode, r12): ``centroid_cosine``
    itself is computed on trunc-quantized decimals with the module's
    string-hopped conversion instead of primitive doubles — every
    emitted COLUMN (groups, flags, AND the keep-rule quality key) is
    then bitwise reproducible by an independent SQL engine, since
    probe assignment and pair cosines are already exact. The double
    mode stays the serving default (one primitive fold per row beats
    an interpreted decimal fold corpus-wide, and the keep rule only
    needs an ORDERING).

    Scale shape: centroid assignment is in-row against broadcast
    centroids (zero shuffles), pairing touches same-cell candidates
    only (Σ cell² bounded, num_centroids ∝ √corpus by default),
    components carry one row per PAIRED vector — O(duplicates), far
    below the corpus — and the final flags join back on id. The
    centrality pass reuses the persisted base scan and the O(C)
    broadcast centroid relation.

    Cache lifecycle (the ``chunk_level_dedup`` out-param contract):
    pass ``caches=[]`` to receive EVERY internally persisted frame —
    the prepared base (when ``emb`` was raw), the seeded centroids,
    the ranked assignments, and the centrality relation (each feeds
    two consumers across the eager component jobs and the final
    action; unpersisted they re-ran once per consumer, r12 profile) —
    and ``unpersist()`` them once the returned flags are materialized,
    so a non-bench caller does not need a global
    ``spark.catalog.clearCache()``. An already-prepared (vdbl,
    norm_sq) base passes through untouched and is never appended."""
    if keep not in ("farthest", "closest"):
        raise ValueError(f"keep must be 'farthest' or 'closest', got {keep!r}")
    # An already-prepared base passes through ONLY when the caller
    # addresses it as such (vec_col="vdbl" on a frame carrying the
    # norm); any other vec_col is aliased to the preparation input name
    # (r11 advice: a custom vec_col used to reach _ensure_ann_base
    # under its own name and fail on the hard-coded 'embedding'), and
    # `prepared` is decided by the frame actually handed to
    # _ensure_ann_base — a (vdbl, norm_sq) input re-selected down to a
    # different vector column is NOT prepared, so its internal persist
    # is appended to ``caches`` like any other (the out-param contract
    # would otherwise leak it).
    if vec_col == "vdbl" and "norm_sq" in emb.columns:
        prepared = True
        base = _ensure_ann_base(emb, id_col)
    else:
        prepared = False
        base = _ensure_ann_base(
            emb.select(F.col(id_col), F.col(vec_col).alias("embedding")),
            id_col,
        )
    if caches is not None and not prepared:
        caches.append(base)
    n_cents = resolve_num_centroids(base, num_centroids)
    cents = (
        lloyd_refined_centroids(base, n_cents, lloyd_rounds, id_col, "vdbl")
        if lloyd_rounds > 0
        else _seed_centroids(base, n_cents, id_col)
    ).persist()
    # cents and assignments each feed TWO consumers (the pair stage —
    # materialized eagerly inside connected_components' checkpoint job
    # — and the centrality pass at the final action); unpersisted, the
    # seeded pick and the whole in-row scoring pass re-ran once per
    # consumer (r12 profile: the leg dropped ~6.5 → ~2.5 s at sf0.01).
    # Both ride the caches= out-param like the base.
    assignments = ivf_assignments(
        base, n_cents, probes, id_col, vec_col="vdbl", centroids=cents,
        with_rank=True,
    ).persist()
    if caches is not None:
        caches.extend([cents, assignments])
    pairs = ivf_ann_pairs(
        base,
        assignments=assignments,
        min_cosine=threshold,
        id_col=id_col,
    )
    comps = connected_components(pairs)  # (doc_id, canonical_id)
    # centroid-cosine of every vector against its PRIMARY (rank-1)
    # cell — the keep rule's quality key. Engine-local doubles: the
    # value orders members within a group and is exported for
    # inspection, but membership/flags never depend on its ulps (the
    # id tie-break settles exact ties, and distinct members of a
    # planted group differ by construction).
    if exact:
        vq = quantized_vector(F.col("vdbl"))
        ccq = quantized_vector(F.col("cvec"))
        ccos = dot_exact(vq, ccq) / (
            F.sqrt(dot_exact(vq, vq)) * F.sqrt(dot_exact(ccq, ccq))
        )
    else:
        ccos = dot_double(F.col("vdbl"), F.col("cvec")) / (
            F.sqrt(dot_double(F.col("vdbl"), F.col("vdbl")))
            * F.sqrt(dot_double(F.col("cvec"), F.col("cvec")))
        )
    # centrality feeds the survivor pick AND the flag join in the one
    # final plan — persisted so the (broadcast-join + cosine fold) pass
    # runs once per action, not once per consumer
    centrality = (
        assignments.filter(F.col("probe_rank") == 1)
        .select(F.col(id_col), "centroid_id")
        .join(F.broadcast(cents), "centroid_id")
        .join(base, id_col)
        .select(F.col(id_col), ccos.alias("centroid_cosine"))
    ).persist()
    if caches is not None:
        caches.append(centrality)
    sign = -1.0 if keep == "farthest" else 1.0
    survivors = select_cluster_survivors(
        centrality.withColumnRenamed(id_col, "doc_id"),
        comps,
        quality_col=F.col("centroid_cosine") * F.lit(sign),
        id_col="doc_id",
    ).select(
        F.col("cluster_id").alias("_scl"),
        F.col("survivor_id"),
        F.lit(True).alias("_srv"),
    )
    flagged = centrality.join(
        comps.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumnRenamed("canonical_id", "cluster_id")
    return (
        flagged.join(
            survivors,
            (F.col("cluster_id") == F.col("_scl"))
            & (F.col(id_col) == F.col("survivor_id")),
            "left",
        )
        .select(
            F.col(id_col),
            "cluster_id",
            "centroid_cosine",
            (
                F.col("cluster_id").isNotNull() & F.col("_srv").isNull()
            ).alias("is_duplicate"),
        )
    )


def semantic_decontaminate(
    emb: DataFrame,
    benchmark: DataFrame,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
) -> DataFrame:
    """Embedding-space eval-set decontamination — the semantic twin of
    ``operators.dedup.decontaminate`` (which catches verbatim k-gram
    containment): a corpus document whose embedding sits within
    ``min_cosine`` of ANY benchmark item's embedding is flagged,
    catching paraphrased/translated/reformatted eval leakage that
    shares no n-grams. Returns (id, bench_id, cosine) — one row per
    contaminated (corpus, benchmark) pair at exact cosine ≥ threshold;
    callers drop ``select(id).distinct()``.

    Same numeric contract as every emitted cosine in the similarity
    module: a primitive-double prefilter at ``min_cosine − 1e-6``
    (margin ~7 orders above double/decimal divergence) prunes the
    cross join, then survivors re-score on quantized exact decimals —
    the emitted values are bitwise oracle-reproducible.

    Scale shape: the benchmark side is eval-set-sized BY NATURE (the
    same assumption the n-gram ``decontaminate`` makes when it
    broadcasts benchmark shingles) — it broadcasts with its exact
    norms precomputed once; the corpus STREAMS through one scan with a
    per-row double fold per benchmark item, no shuffle at all before
    the O(flagged) exact re-score. For benchmark sets too large to
    broadcast, run per-benchmark-shard and union — contamination
    flags are independent per benchmark item, so sharding is lossless."""
    def _norm_guard(norm, ident, side):
        # the module's loud zero-norm discipline (_sq8_norm_guard's
        # shape): a zero-norm vector here would NULL its cosines and
        # silently EVADE the contamination gate — worse than the
        # silent mis-rank the serve paths guard against
        return F.when(norm > 0, norm).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"semantic_decontaminate: zero-norm {side} vector "),
                    ident.cast("string"),
                    F.lit(
                        " has no cosine direction — a zero vector would "
                        "silently pass the gate; filter zero vectors "
                        "before decontaminating"
                    ),
                )
            ).cast("double")
        )

    corpus = emb.select(
        F.col(id_col), dbl_vector(vec_col).alias("_cv")
    ).withColumn(
        "_cn",
        _norm_guard(
            F.sqrt(dot_double(F.col("_cv"), F.col("_cv"))),
            F.col(id_col),
            "corpus",
        ),
    )
    bq = quantized_vector(F.col("_bv"))
    bench = (
        benchmark.select(
            F.col(bench_id_col or id_col).alias("bench_id"),
            dbl_vector(bench_vec_col or vec_col).alias("_bv"),
        )
        .withColumn("_bq", bq)
        .withColumn(
            "_bn",
            _norm_guard(
                F.sqrt(dot_double(F.col("_bv"), F.col("_bv"))),
                F.col("bench_id"),
                "benchmark",
            ),
        )
        .withColumn("_bnx", F.sqrt(dot_exact(F.col("_bq"), F.col("_bq"))))
    )
    pairs = corpus.crossJoin(F.broadcast(bench))
    approx = dot_double(F.col("_cv"), F.col("_bv")) / (
        F.col("_cn") * F.col("_bn")
    )
    surv = pairs.filter(approx >= min_cosine - 1e-6)
    cq = quantized_vector(F.col("_cv"))
    exact = surv.select(
        F.col(id_col),
        "bench_id",
        (
            dot_exact(cq, F.col("_bq"))
            / (F.sqrt(dot_exact(cq, cq)) * F.col("_bnx"))
        ).alias("cosine"),
    )
    return exact.filter(F.col("cosine") >= min_cosine)
