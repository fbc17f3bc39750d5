"""BQ1 one-bit binary quantization: sign-bit encode packed into
integer hamming lanes, symmetric hamming-shortlist serving with the
module's exact-cosine re-rank. The extreme-compression corner of the
quantized serving family — PQ is 32× and lossy, SQ8 is 4× and
near-exact, BQ1 keeps ONE bit per dimension. Public method: the
sign bits are sign-random-projection hashing with IDENTITY planes
(Charikar 2002 — the same SRP family as ``dedup.simhash_bits`` and
``base.lsh_buckets``), so hamming(sign(a), sign(b)) estimates the
angle: E[ham]/dims = θ/π. New in r11, pytest-attested (both WATCH
bench slots are closed to new legs; the next round picks the
attestation slot the way SQ8 rode ``sim_cosine_topk``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (
    _ensure_ann_base,
    _rank_topk,
    cosine_for_pairs,
    dbl_vector,
)

# Bits per packed lane. 32 (not 64) so the MSB-first accumulation
# ``acc*2 + bit`` stays inside a long's positive range — at 64 the
# last doubling would carry into the sign bit, which ANSI mode
# (Spark 4's default) rejects as overflow. The parquet payload is
# 2 longs per 64-dim vector (16 bytes vs 256 for float32 = 16×; a
# bit-packed binary column would reach 32× at the cost of leaving
# ``bit_count`` SQL space).
_BQ_LANE_BITS = 32


def bq_encode(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sign-bit encode: ``bit_i = 1 iff x_i > 0``, packed MSB-first
    into ``ceil(dims/32)`` long lanes (lane w holds dims
    [32w, 32w+32), first dim at the MSB; trailing pad bits are 0 on
    every row, so they never contribute to an XOR). Returns
    (id, words array<long>, dims int) — ``dims`` is the geometry
    stamp :func:`bq_topk` cross-checks when serving from a persisted
    relation, the module's positional-codec discipline (a store
    packed at different dims would otherwise hamming-compare
    misaligned lanes and mis-serve plausibly).

    One in-row projection over the scan — zero shuffles, zero UDFs.

    All-ZERO vectors are refused in-plan at ENCODE time (the codec's
    analogue of ``_sq8_norm_guard``): sign(0⃗) is all-zero bits, which
    is also the legitimate encoding of an all-NEGATIVE vector, so a
    zero vector could not be detected later from codes alone — and
    its cosine is undefined at the exact re-rank. Encode is the last
    point where the distinction is visible."""
    v = dbl_vector(vec_col)
    n = F.size(v)
    n_words = F.ceil(n / F.lit(_BQ_LANE_BITS)).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w: F.aggregate(
            F.sequence(F.lit(0), F.lit(_BQ_LANE_BITS - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc * 2
            + F.when(
                (w * _BQ_LANE_BITS + j < n)
                & (F.get(v, w * _BQ_LANE_BITS + j) > 0),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        ),
    )
    guarded = F.when(F.exists(v, lambda x: x != 0.0), words).otherwise(
        F.raise_error(
            F.concat(
                F.lit("bq_encode: zero-norm vector "),
                F.col(id_col).cast("string"),
                F.lit(
                    " (all-zero embedding) has no sign direction and no "
                    "cosine — filter zero vectors before encoding (the "
                    "module's norm ≥ 1e-3 margin contract, see _QSCALE)"
                ),
            )
        ).cast("array<long>")
    )
    return emb.select(
        F.col(id_col), guarded.alias("words"), n.alias("dims")
    )


def _bq_hamming(qw: Column, xw: Column) -> Column:
    """Σ bit_count(q_lane XOR x_lane) over zipped lanes — the whole
    per-pair cost: ``dims/32`` XOR+popcount ops, no per-dimension
    arithmetic and no decode."""
    return F.aggregate(
        F.zip_with(qw, xw, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def bq_topk(
    emb: DataFrame,
    codes: DataFrame | None = None,
    query_ids_max: int = 20,
    k: int = 5,
    refine: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Binary-quantized top-k — the 1-bit serve sibling of
    :func:`sq8_topk` (same API and contract: queries are corpus rows
    with id < ``query_ids_max``, self excluded, exact-decimal final
    cosines through the shared ``cosine_for_pairs`` + ``_rank_topk``
    tail, (cosine DESC, id_b) tie-break): both sides encode to sign
    bits, the per-query top-``refine`` shortlist ranks on hamming
    distance ASC (id_b tie-break), and only the shortlist reaches the
    exact re-rank. With ``refine`` ≥ corpus the output is IDENTICAL
    to ``brute_force_topk`` (pytest-pinned) — the bit scan only
    prunes who reaches the re-rank, the standard quantized-serving
    contract of this module's PQ/SQ8 paths. Unlike SQ8 (a per-row
    affine codec, near-exact ADC) the hamming score is a coarse
    angle ESTIMATE — recall at the default refine sits below SQ8's
    and above PQ's on the adversarial fixture; its fit is the
    cheapest-possible first pass over a corpus too large for 4×
    codes.

    Scale shape: the corpus STREAMS as ``dims/32``-long lanes (16
    bytes per 64-dim row); queries (O(query_ids_max) rows) broadcast;
    each pair costs dims/32 XOR+popcounts inside whole-stage codegen
    — no decode, no per-dimension multiply, no shuffle before the
    per-query shortlist window; exact-decimal folds run at
    O(queries·refine) only. Pass ``codes`` (a ``bq_encode`` output,
    e.g. read back from parquet) to serve from a persisted store —
    its ``dims`` stamp is cross-checked in-plan against the query
    side's geometry before any pair is scored; None encodes on the
    fly in the same pass. Zero-norm vectors raise at encode (see
    :func:`bq_encode`); a persisted store is zero-free by
    construction of the same guard."""
    refine = 4 * k if refine is None else refine
    if refine < k:
        raise ValueError(f"refine {refine} < k {k}: shortlist must cover top-k")
    base = _ensure_ann_base(emb, id_col)
    side = codes if codes is not None else bq_encode(base, id_col, "vdbl")
    corpus = side.select(
        F.col(id_col).alias("id_b"),
        F.col("words").alias("_xw"),
        F.col("dims").alias("_xd"),
    )
    queries = bq_encode(
        base.filter(F.col(id_col) < query_ids_max), id_col, "vdbl"
    ).select(
        F.col(id_col).alias("id_a"),
        F.col("words").alias("_qw"),
        F.col("dims").alias("_qd"),
    )
    # geometry stamp: a codes relation packed at different dims would
    # XOR misaligned lanes (zip_with NULL-pads the short side) and
    # rank on garbage — refuse in-plan, the positional-codec
    # discipline every PQ hook follows
    ham = F.when(
        F.col("_xd") == F.col("_qd"), _bq_hamming(F.col("_qw"), F.col("_xw"))
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("bq_topk: codes relation packed at dims="),
                F.col("_xd").cast("string"),
                F.lit(" cannot serve dims="),
                F.col("_qd").cast("string"),
                F.lit(
                    " queries — lanes are positional; re-encode the "
                    "store with bq_encode over the current geometry"
                ),
            )
        ).cast("int")
    )
    pairs = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", ham.alias("_h"))
    )
    w = Window.partitionBy("id_a").orderBy(F.col("_h").asc(), F.col("id_b"))
    shortlist = (
        pairs.withColumn("_ar", F.row_number().over(w))
        .filter(F.col("_ar") <= refine)
        .select("id_a", "id_b")
    )
    scored = cosine_for_pairs(
        base, shortlist, exact_norms_in_base=False, id_col=id_col
    )
    return _rank_topk(scored, k)
