"""Hybrid-retrieval fusion (RRF) and serving-recall evaluation: exact
nano-integer fusion vs a sequential Python reference, the paper's
rank-only semantics, and the recall metric's zero-served / exact-
fraction contracts — plus the end-to-end composition over the real
sf0.001 tables (BM25 lexical tier ⊕ dense cosine tier)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
    recall_at_k,
    rrf_fuse,
)


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


def _py_rrf(rankings, k=60):
    """Sequential reference: nano-quantized contributions, integer sum."""
    acc = {}
    for _, rows in rankings:
        for q, d, r in rows:
            key = (q, d)
            n, s = acc.get(key, (0, 0))
            acc[key] = (n + 1, s + round(1e9 / (k + r)))
    return acc


def test_rrf_fuse_matches_sequential_reference(spark):
    """Fused nano scores are EXACTLY the sequential reference's
    integers (order-free by quantization); n_sources counts the tiers
    that surfaced the doc; the fused rank breaks ties on doc_id; and
    the subtle RRF property holds: ranked 1st+3rd beats 2nd+2nd
    (1/61 + 1/63 > 2/62 — convexity of 1/x), the rank-only semantics
    score interpolation would get backwards under a hostile scale."""
    lex_rows = [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1), (1, 21, 2)]
    den_rows = [(0, 12, 1), (0, 11, 2), (0, 13, 3), (1, 21, 1)]
    rankings = [("lex", lex_rows), ("dense", den_rows)]
    fused = rrf_fuse(
        [
            ("lex", _ranking(spark, lex_rows)),
            ("dense", _ranking(spark, den_rows)),
        ]
    )
    got = {
        (r.query_id, r.doc_id): (r.n_sources, r.rrf_nano, r.rank)
        for r in fused.collect()
    }
    want = _py_rrf(rankings)
    assert {k: v[:2] for k, v in got.items()} == want

    # doc 12: ranks (3, 1) = 1/63 + 1/61; doc 11: ranks (2, 2) = 2/62.
    # Convexity: 12 must out-rank 11.
    assert got[(0, 12)][1] > got[(0, 11)][1]
    assert got[(0, 12)][2] < got[(0, 11)][2]
    # single-source docs still fuse (no imputation)
    assert got[(0, 10)][0] == 1 and got[(0, 13)][0] == 1
    # query 1: doc 21 in both tiers beats doc 20 in one
    assert got[(1, 21)][2] == 1 and got[(1, 20)][2] == 2

    # deterministic doc_id tie-break: two docs with identical rank
    # sets get identical nano scores -> lower id first
    tie = rrf_fuse(
        [
            ("a", _ranking(spark, [(5, 100, 1), (5, 101, 2)])),
            ("b", _ranking(spark, [(5, 101, 1), (5, 100, 2)])),
        ]
    ).collect()
    by_id = {r.doc_id: r for r in tie}
    assert by_id[100].rrf_nano == by_id[101].rrf_nano
    assert by_id[100].rank == 1 and by_id[101].rank == 2

    # top_k truncation + guards
    top1 = rrf_fuse(
        [("lex", _ranking(spark, lex_rows))], top_k=1
    ).collect()
    assert sorted((r.query_id, r.doc_id) for r in top1) == [(0, 10), (1, 20)]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([("x", _ranking(spark, lex_rows))], k=0)


def test_recall_at_k_contracts(spark):
    """Exact fractions; a query the tier served NOTHING for scores
    0.0 (present, not absent); queries the tier invents are ignored;
    a perfect tier scores 1.0 everywhere."""
    truth = _ranking(
        spark,
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 7, 1), (1, 8, 2), (2, 9, 1)],
    )
    got = _ranking(
        spark,
        # q0: 2 of 3; q1: nothing; q2: both real and invented; q9:
        # invented query entirely
        [(0, 1, 1), (0, 3, 2), (2, 9, 1), (2, 55, 2), (9, 1, 1)],
    )
    out = {r.query_id: r for r in recall_at_k(got, truth).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0].hits, out[0].truth_n, out[0].recall) == (2, 3, 2 / 3)
    assert (out[1].hits, out[1].recall) == (0, 0.0)
    assert (out[2].hits, out[2].recall) == (1, 1.0)

    perfect = recall_at_k(truth, truth).collect()
    assert all(r.recall == 1.0 for r in perfect)


def test_hybrid_retrieval_end_to_end_real_tables(spark):
    """The composition the module exists for, on the real sf0.001
    tables: BM25 over documents (queries = the first 5 docs' own
    text) ⊕ dense cosine over embeddings (vec i ↔ doc i), fused by
    RRF. Pins: (a) every fused row's nano score equals the sequential
    reference computed from the two tiers' collected ranks; (b) the
    fused candidate set is EXACTLY the union of what the tiers
    surfaced (no imputation, no drops) and every tier's rank-1 pick
    is fused; (c) recall_at_k(bq1-tier, brute-tier) over the same
    corpus reproduces the per-query intersection counts a driver
    loop would compute."""
    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.functions.text import bm25_topk
    from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
        bq_topk,
        brute_force_topk,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")

    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    lex = bm25_topk(docs, queries, k=5)
    dense = brute_force_topk(emb, query_ids_max=5, k=5).select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("doc_id"),
        F.col("rnk").alias("rank"),
    )
    fused = rrf_fuse([("lex", lex), ("dense", dense)])
    got = {
        (r.query_id, r.doc_id): (r.rrf_nano, r.rank) for r in fused.collect()
    }
    ref = _py_rrf(
        [
            (
                "lex",
                [
                    (r.query_id, r.doc_id, r.rank)
                    for r in lex.collect()
                ],
            ),
            (
                "dense",
                [(r.query_id, r.doc_id, r.rank) for r in dense.collect()],
            ),
        ]
    )
    assert {k: v[0] for k, v in got.items()} == {
        k: v[1] for k, v in ref.items()
    }
    # (b) the fused candidate set is exactly the union of what the
    # tiers surfaced (no imputation, no drops), and each tier's
    # rank-1 pick is present per query
    lex_pairs = {(r.query_id, r.doc_id) for r in lex.collect()}
    den_pairs = {(r.query_id, r.doc_id) for r in dense.collect()}
    assert set(got) == lex_pairs | den_pairs
    for r in lex.collect():
        if r.rank == 1:
            assert (r.query_id, r.doc_id) in got

    # (c) distributed recall == driver-loop recall
    truth = brute_force_topk(emb, query_ids_max=5, k=5).select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("doc_id")
    )
    served = bq_topk(emb, query_ids_max=5, k=5, refine=5).select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("doc_id")
    )
    out = {r.query_id: r for r in recall_at_k(served, truth).collect()}
    t_by_q: dict = {}
    for r in truth.collect():
        t_by_q.setdefault(r.query_id, set()).add(r.doc_id)
    s_by_q: dict = {}
    for r in served.collect():
        s_by_q.setdefault(r.query_id, set()).add(r.doc_id)
    for q, ts in t_by_q.items():
        want_hits = len(ts & s_by_q.get(q, set()))
        assert out[q].hits == want_hits, q
        assert out[q].recall == want_hits / len(ts)
    spark.catalog.clearCache()


def test_rrf_weights_and_ndcg(spark):
    """r12 extensions: (a) weighted RRF scales each source's nano
    contribution by round(w·1e9/(k+rank)) — pinned against the
    sequential reference, default weight 1.0 ≡ the unweighted call,
    unknown-tag weights refuse; (b) ndcg_at_k: binary grades reduce to
    rank-discounted recall (perfect ranking ⇒ 1.0, reversed truth
    still 1.0 on the same SET, a miss at the top costs more than a
    miss at the bottom), graded truth uses the ideal ordering, a
    never-served truth query scores 0.0, invented queries are
    ignored, and the micro integers match a sequential reference."""
    import math

    from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
        ndcg_at_k,
    )

    lex_rows = [(0, 10, 1), (0, 11, 2), (1, 20, 1)]
    den_rows = [(0, 11, 1), (0, 12, 2), (1, 20, 1)]
    wts = {"lex": 0.5, "dense": 2.0}
    fused = rrf_fuse(
        [
            ("lex", _ranking(spark, lex_rows)),
            ("dense", _ranking(spark, den_rows)),
        ],
        weights=wts,
    )
    got = {(r.query_id, r.doc_id): r.rrf_nano for r in fused.collect()}
    want = {}
    for tag, rows in (("lex", lex_rows), ("dense", den_rows)):
        for q, d, r in rows:
            want[(q, d)] = want.get((q, d), 0) + round(
                wts[tag] * 1e9 / (60 + r)
            )
    assert got == want
    # default weight 1.0 for omitted tags == the unweighted call
    half = rrf_fuse(
        [
            ("lex", _ranking(spark, lex_rows)),
            ("dense", _ranking(spark, den_rows)),
        ],
        weights={"dense": 1.0},
    )
    base = rrf_fuse(
        [
            ("lex", _ranking(spark, lex_rows)),
            ("dense", _ranking(spark, den_rows)),
        ]
    )
    assert sorted(map(tuple, half.collect())) == sorted(
        map(tuple, base.collect())
    )
    with pytest.raises(ValueError, match="unknown tags"):
        rrf_fuse(
            [("lex", _ranking(spark, lex_rows))], weights={"dens": 1.0}
        )

    # --- ndcg ---
    truth = _ranking(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3), (7, 9, 1)])
    perfect = _ranking(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    out = {r.query_id: r for r in ndcg_at_k(perfect, truth, k=3).collect()}
    assert out[0].ndcg == 1.0
    assert out[7].ndcg == 0.0 and out[7].dcg_micro == 0  # never served
    assert set(out) == {0, 7}
    # binary grades: any permutation of the full truth SET in the top
    # k is still 1.0 (same discounts, same docs)
    perm = _ranking(spark, [(0, 3, 1), (0, 1, 2), (0, 2, 3)])
    assert {
        r.query_id: r.ndcg for r in ndcg_at_k(perm, truth, k=3).collect()
    }[0] == 1.0
    # a miss at rank 1 costs more than a miss at rank 3
    miss_top = _ranking(spark, [(0, 99, 1), (0, 2, 2), (0, 3, 3)])
    miss_bot = _ranking(spark, [(0, 1, 1), (0, 2, 2), (0, 99, 3)])
    nt = {r.query_id: r.ndcg for r in ndcg_at_k(miss_top, truth, 3).collect()}
    nb = {r.query_id: r.ndcg for r in ndcg_at_k(miss_bot, truth, 3).collect()}
    assert nb[0] > nt[0]
    # micro integers vs sequential reference (binary grades)
    d = lambda i: round(1e6 / math.log2(i + 1))  # noqa: E731
    got0 = {r.query_id: r for r in ndcg_at_k(miss_bot, truth, 3).collect()}
    assert got0[0].dcg_micro == d(1) + d(2)
    assert got0[0].idcg_micro == d(1) + d(2) + d(3)

    # graded relevance: ideal ordering is grades desc — serving the
    # low-grade doc first discounts the high grade
    gtruth = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 1)], "query_id long, doc_id long, rel int"
    )
    good = _ranking(spark, [(0, 1, 1), (0, 2, 2)])
    bad = _ranking(spark, [(0, 2, 1), (0, 1, 2)])
    ng = ndcg_at_k(good, gtruth, 2, grade_col="rel").collect()[0]
    nbad = ndcg_at_k(bad, gtruth, 2, grade_col="rel").collect()[0]
    assert ng.ndcg == 1.0 and nbad.ndcg < 1.0
    assert ng.dcg_micro == 3 * d(1) + 1 * d(2)
    assert nbad.dcg_micro == 1 * d(1) + 3 * d(2)
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(good, gtruth, 0)


def test_precision_at_k_contracts(spark):
    """The eval triple's third member: exact fractions; a query that
    served pure junk scores 0.0 (present); truth-only queries are
    absent (recall_at_k owns their 0.0); a perfect tier scores 1.0;
    and on a shared fixture precision/recall disagree exactly when
    the served and truth set SIZES differ."""
    from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
        precision_at_k,
        recall_at_k,
    )

    truth = _ranking(
        spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 7, 1), (9, 5, 1)]
    )
    got = _ranking(
        spark,
        # q0 serves 2, one right; q1 serves junk; q2 is invented
        [(0, 1, 1), (0, 99, 2), (1, 55, 1), (2, 7, 1)],
    )
    out = {r.query_id: r for r in precision_at_k(got, truth).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0].hits, out[0].served_n, out[0].precision) == (1, 2, 0.5)
    assert (out[1].hits, out[1].precision) == (0, 0.0)
    assert (out[2].hits, out[2].precision) == (0, 0.0)  # truth has no q2→7

    perfect = {r.query_id: r.precision
               for r in precision_at_k(truth, truth).collect()}
    assert all(v == 1.0 for v in perfect.values())

    # precision vs recall asymmetry on q0: served 2 of 3 truth docs,
    # one correct → precision 1/2, recall 1/3
    rec = {r.query_id: r for r in recall_at_k(got, truth).collect()}
    assert rec[0].recall == 1 / 3 and out[0].precision == 1 / 2
