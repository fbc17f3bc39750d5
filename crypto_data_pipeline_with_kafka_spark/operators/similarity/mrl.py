"""Matryoshka (MRL) truncated-dimension serving: shortlist on the
cosine of the LEADING ``prefix_dims`` components, exact full-dimension
re-rank of the shortlist only. Public method: Matryoshka
Representation Learning (Kusupati et al. 2022, arXiv:2205.13147)
trains embeddings whose prefixes are themselves valid embeddings, and
the standard serving trick — adopted by the major embedding APIs — is
to scan the corpus at a fraction of the dimensions and spend full
precision only on a shortlist. This is the third member of this
module's quantized-serving family, cutting the DIMENSION axis where
SQ8/BQ1 cut the per-component width; on non-MRL-trained embeddings it
still works as plain truncated-cosine approximation, just with weaker
recall (the tests pin both the contract and that distinction is
honest). New in r11; r12 adds the persisted-prefix serve hook
(``prefix=`` + geometry stamp) and the oracle-attested ``exact`` mode,
completing the family's three-part contract (store round trip, exact
shortlist, exact re-rank) that SQ8 and BQ1 already carry."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (
    _ensure_ann_base,
    _rank_topk,
    cosine_for_pairs,
    dbl_vector,
    dot_double,
    dot_exact,
    quantized_vector,
)


def _sliced_prefix(vec: Column | str, prefix_dims: int) -> Column:
    """First ``prefix_dims`` components, refusing a non-truncating
    prefix in-plan (slicing would silently degrade to plain brute
    force and misreport the family's cost model)."""
    return F.when(
        F.size(vec) > prefix_dims, F.slice(vec, 1, prefix_dims)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"mrl: prefix_dims={prefix_dims} does not truncate "),
                F.lit("a "),
                F.size(vec).cast("string"),
                F.lit(
                    "-dim vector — a non-truncating prefix is plain brute "
                    "force; lower prefix_dims or call brute_force_topk"
                ),
            )
        ).cast("array<double>")
    )


def mrl_prefix_encode(
    emb: DataFrame,
    prefix_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The MRL prefix STORE layout: (id, pvec array<double> of the
    leading ``prefix_dims`` components, pdims int). ``pdims`` is the
    geometry stamp :func:`mrl_topk` cross-checks when serving from a
    persisted relation (the module's positional-codec discipline — a
    store sliced at different dims would rank on a different prefix
    cosine and mis-serve plausibly). Persist to parquet and read back
    so the serve scan touches ``prefix_dims/dims`` of the vector bytes
    and the FULL vectors are fetched only at re-rank — the two-relation
    serve shape ``sq8_topk(codes=)``/``bq_topk(codes=)`` model.

    One in-row projection over the scan — zero shuffles, zero UDFs.
    Accepts a raw embeddings relation, or an already-prepared base
    addressed EXPLICITLY as ``vec_col="vdbl"`` (never sniffed — a
    decoy ``vdbl`` column alongside a different ``vec_col`` must not
    hijack the slice); a non-truncating ``prefix_dims`` raises
    in-plan."""
    if prefix_dims < 1:
        raise ValueError(f"prefix_dims must be >= 1, got {prefix_dims}")
    # a prepared base passes through ONLY when addressed as such
    # (vec_col="vdbl") — the module's explicit-contract rule; a column
    # SNIFF here would silently slice a decoy vdbl column instead of
    # the named vec_col and mis-serve behind a valid-looking pdims
    # stamp (the semantic_dedup r11-advice class of bug)
    vec = F.col("vdbl") if vec_col == "vdbl" else dbl_vector(vec_col)
    return emb.select(
        F.col(id_col),
        _sliced_prefix(vec, prefix_dims).alias("pvec"),
        F.lit(prefix_dims).cast("int").alias("pdims"),
    )


def _mrl_exact_shortlist(
    corpus: DataFrame,
    queries: DataFrame,
    refine: int,
) -> DataFrame:
    """Engine-independent MRL prefix shortlist — the exact-mode twin of
    the double prefix scoring, same convention as
    ``_sq8_exact_shortlist``: prefix components quantize to
    trunc(·1e12) longs (slice commutes with the quantization, so these
    ARE the leading entries of the full quantized vector — exactly
    what the oracle's comp CTE restricted to pos ≤ prefix_dims holds),
    the per-pair prefix dot and both prefix norms fold as exact
    decimals with the module's ONE string-hopped double conversion
    each, and shortlist MEMBERSHIP (row_number over score DESC, id_b ≤
    refine) is bitwise identical in Spark and the DuckDB oracle.

    Two-pass (the ``_exact_adc_topk`` discipline): a primitive-double
    pass over the sliced prefixes ranks all pairs — double summation
    error plus the quantization perturbation, together ≤ ~1e-10 in
    cosine units for prefix norms ≥ 1e-3 (the _QSCALE margin bound at
    the smaller dim) — and the interpreted decimal folds run only
    within 1e-6 of each query's refine-th approximate score, with the
    refine-th cut as a SECOND window over the SAME partitioning (the
    r8 kth-window rule). Zero-norm PREFIXES keep the documented
    NULL-ranks-last contract through try_divide in both passes.

    ``corpus`` carries (id_b, _xv prefix doubles); ``queries`` carries
    (id_a, _qv prefix doubles, _qq quantized prefix, _qnx exact-decimal
    prefix norm) — O(queries) exact folds on the broadcast side."""
    slim = (
        corpus.withColumn(
            "_xnd", F.sqrt(dot_double(F.col("_xv"), F.col("_xv")))
        )
        .crossJoin(
            F.broadcast(
                queries.withColumn(
                    "_qnd", F.sqrt(dot_double(F.col("_qv"), F.col("_qv")))
                ).select("id_a", "_qv", "_qnd")
            )
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.try_divide(
                dot_double(F.col("_qv"), F.col("_xv")),
                F.col("_qnd") * F.col("_xnd"),
            ).alias("_sd"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("_sd").desc_nulls_last(), F.col("id_b")
    )
    ranked = slim.withColumn("_ar", F.row_number().over(w)).withColumn(
        "_rth",
        F.max(F.when(F.col("_ar") == refine, F.col("_sd"))).over(
            Window.partitionBy("id_a")
        ),
    )
    surv = ranked.filter(
        F.col("_rth").isNull()
        | F.col("_sd").isNull()
        | (F.col("_sd") >= F.col("_rth") - 1e-6)
    ).select("id_a", "id_b")
    refetch = (
        corpus.join(F.broadcast(surv), "id_b")
        .join(F.broadcast(queries.select("id_a", "_qq", "_qnx")), "id_a")
        .withColumn("_xq", quantized_vector(F.col("_xv")))
    )
    xn_exact = F.sqrt(dot_exact(F.col("_xq"), F.col("_xq")))
    exact = refetch.select(
        "id_a",
        "id_b",
        F.try_divide(
            dot_exact(F.col("_qq"), F.col("_xq")),
            F.col("_qnx") * xn_exact,
        ).alias("_s"),
    )
    we = Window.partitionBy("id_a").orderBy(
        F.col("_s").desc_nulls_last(), F.col("id_b")
    )
    return (
        exact.withColumn("_er", F.row_number().over(we))
        .filter(F.col("_er") <= refine)
        .select("id_a", "id_b")
    )


def mrl_topk(
    emb: DataFrame,
    prefix_dims: int,
    query_ids_max: int = 20,
    k: int = 5,
    refine: int | None = None,
    id_col: str = "vec_id",
    prefix: DataFrame | None = None,
    exact: bool = False,
) -> DataFrame:
    """Matryoshka top-k — same API and contract as ``sq8_topk`` /
    ``bq_topk`` (queries are corpus rows with id < ``query_ids_max``,
    self excluded, exact-decimal final cosines through the shared
    ``cosine_for_pairs`` + ``_rank_topk`` tail, (cosine DESC, id_b)
    tie-break): both sides slice to their first ``prefix_dims``
    components, the per-query top-``refine`` shortlist ranks on the
    prefix cosine (DESC, id_b tie-break), and only the shortlist
    reaches the full-dimension exact re-rank. With ``refine`` ≥ corpus
    the output is IDENTICAL to ``brute_force_topk`` (pytest-pinned) —
    the truncated scan only prunes who reaches the re-rank, the
    family's standard contract.

    Scale shape: the corpus streams ``prefix_dims``-element folds
    instead of full-width ones (a dims/prefix_dims memory-traffic and
    FLOP cut — 4× at 64→16); queries broadcast; one window exchange
    per query shortlist; exact-decimal folds at O(queries·refine).
    Pass ``prefix`` (an :func:`mrl_prefix_encode` output, e.g. read
    back from parquet) to serve from a PERSISTED prefix store — the
    full vectors are then touched only at re-rank, and the store's
    ``pdims`` geometry stamp is cross-checked in-plan against the
    requested ``prefix_dims`` before any pair is scored (a store
    sliced at different dims would rank on the wrong prefix cosine
    and mis-serve plausibly); None slices on the fly from the one
    base scan.

    ``exact=True`` (the oracle-attested mode, like SQ8's): shortlist
    membership itself goes engine-independent — the prefix cosine is
    recomputed over trunc-quantized prefix components with
    exact-decimal folds under the two-pass margin discipline (see
    :func:`_mrl_exact_shortlist`), so the emitted top-k is bitwise
    reproducible by an independent SQL engine. The double mode ranks
    the raw-double prefix cosine: same semantics, engine-local
    membership at ulp boundaries — the serving default.

    A ``prefix_dims`` ≥ the actual dimension raises in-plan (slicing
    would silently degrade to plain brute force and misreport the
    family's cost model); zero-norm PREFIXES (a vector whose leading
    components are all zero — legal for non-MRL embeddings) rank last
    on a NULL prefix score rather than erroring: unlike SQ8/BQ1's
    all-zero VECTORS this is recoverable — the full-dimension re-rank
    still scores the doc if it makes any shortlist, and the covering-
    refine contract is unaffected."""
    refine = 4 * k if refine is None else refine
    if refine < k:
        raise ValueError(f"refine {refine} < k {k}: shortlist must cover top-k")
    if prefix_dims < 1:
        raise ValueError(f"prefix_dims must be >= 1, got {prefix_dims}")
    base = _ensure_ann_base(emb, id_col)
    if prefix is not None:
        # geometry stamp: the positional-codec discipline every
        # codes=/picks= hook follows — refuse in-plan, loudly
        pv = F.when(
            F.col("pdims") == prefix_dims, F.col("pvec")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("mrl_topk: prefix store sliced at pdims="),
                    F.col("pdims").cast("string"),
                    F.lit(f" cannot serve prefix_dims={prefix_dims}"),
                    F.lit(
                        " queries — the prefix cosine is positional; "
                        "re-encode the store with mrl_prefix_encode over "
                        "the current geometry"
                    ),
                )
            ).cast("array<double>")
        )
        corpus = prefix.select(
            F.col(id_col).alias("id_b"), pv.alias("_xv")
        )
    else:
        corpus = base.select(
            F.col(id_col).alias("id_b"),
            _sliced_prefix("vdbl", prefix_dims).alias("_xv"),
        )
    queries = base.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("id_a"),
        _sliced_prefix("vdbl", prefix_dims).alias("_qv"),
    )
    if exact:
        qx = queries.withColumn(
            "_qq", quantized_vector(F.col("_qv"))
        ).withColumn(
            "_qnx", F.sqrt(dot_exact(F.col("_qq"), F.col("_qq")))
        )
        shortlist = _mrl_exact_shortlist(corpus, qx, refine)
    else:
        pn = F.sqrt(dot_double(F.col("_xv"), F.col("_xv")))
        qn = F.sqrt(dot_double(F.col("_qv"), F.col("_qv")))
        dotp = F.aggregate(
            F.zip_with(F.col("_qv"), F.col("_xv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        pairs = (
            corpus.withColumn("_xn", pn)
            .crossJoin(F.broadcast(queries.withColumn("_qn", qn)))
            .filter(F.col("id_a") != F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                # try_divide, not `/`: a zero-norm PREFIX must yield the
                # documented NULL-ranks-last score, and ANSI mode (the
                # session default) makes plain division THROW on the
                # zero divisor instead
                F.try_divide(dotp, F.col("_qn") * F.col("_xn")).alias("_pc"),
            )
        )
        w = Window.partitionBy("id_a").orderBy(
            F.col("_pc").desc_nulls_last(), F.col("id_b")
        )
        shortlist = (
            pairs.withColumn("_ar", F.row_number().over(w))
            .filter(F.col("_ar") <= refine)
            .select("id_a", "id_b")
        )
    scored = cosine_for_pairs(
        base, shortlist, exact_norms_in_base=False, id_col=id_col
    )
    return _rank_topk(scored, k)
