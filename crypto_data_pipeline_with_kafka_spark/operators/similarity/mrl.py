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
honest). New in r11, pytest-attested."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (
    _ensure_ann_base,
    _rank_topk,
    cosine_for_pairs,
)


def mrl_topk(
    emb: DataFrame,
    prefix_dims: int,
    query_ids_max: int = 20,
    k: int = 5,
    refine: int | None = None,
    id_col: str = "vec_id",
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
    per query shortlist; exact-decimal folds at O(queries·refine). In
    a real deployment the corpus would PERSIST the sliced prefix
    column (or read a prefix-only parquet column slice) so the full
    vectors are touched only at re-rank — the two-relation serve
    shape ``sq8_topk(codes=)`` models; here the slice rides the one
    base scan.

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
    dim_ok = F.when(
        F.size("vdbl") > prefix_dims, F.slice("vdbl", 1, prefix_dims)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"mrl_topk: prefix_dims={prefix_dims} does not truncate "
                ),
                F.lit("a "),
                F.size("vdbl").cast("string"),
                F.lit(
                    "-dim vector — a non-truncating prefix is plain brute "
                    "force; lower prefix_dims or call brute_force_topk"
                ),
            )
        ).cast("array<double>")
    )
    sliced = base.select(F.col(id_col), dim_ok.alias("_pv"))
    pn = F.sqrt(
        F.aggregate(F.col("_pv"), F.lit(0.0), lambda a, x: a + x * x)
    )
    corpus = sliced.select(
        F.col(id_col).alias("id_b"),
        F.col("_pv").alias("_xv"),
        pn.alias("_xn"),
    )
    queries = sliced.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("id_a"),
        F.col("_pv").alias("_qv"),
        pn.alias("_qn"),
    )
    dotp = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_xv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # try_divide, not `/`: a zero-norm PREFIX must yield the
            # documented NULL-ranks-last score, and ANSI mode (the
            # session default) makes plain division THROW on the zero
            # divisor instead
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
