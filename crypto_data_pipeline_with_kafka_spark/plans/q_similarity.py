"""Similarity-search queries over ``embeddings`` (array<float>, dim 64):
brute-force cosine top-k (exactness baseline) and the scale paths —
random-hyperplane LSH, inverted-file cells (pair + query flavors), and
product-quantized ADC. Decimal-exact dot products keep both engines
bitwise aligned, so even top-k rank order is oracle-checkable."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
    _packed_codebooks,
    _seed_centroids,
    all_pairs_cosine,
    bq_encode,
    bq_topk,
    brute_force_topk,
    mrl_prefix_encode,
    mrl_topk,
    cosine_for_pairs,
    ivf_ann_pairs,
    ivf_assignments,
    ivf_candidate_pairs,
    ivf_pq_topk,
    ivf_topk,
    lsh_ann_pairs,
    pq_encode,
    pq_pick_ids,
    pq_topk,
    pq_train,
    pq_train_residual,
    sq8_encode,
    sq8_topk,
    with_dbl_and_approx_norm,
    with_dbl_and_norm,
)
from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
    precision_at_k,
    recall_at_k,
    rrf_fuse,
)
from crypto_data_pipeline_with_kafka_spark.operators.semantic import (
    semantic_decontaminate,
    semantic_dedup,
)
from crypto_data_pipeline_with_kafka_spark.plans.registry import register

_DIM = 64
# pq leg geometry: 8 sub-spaces × 16 codes over dim 64 (sub-dim 8) —
# 32× compression of float32; small enough that the oracle's codebook
# relation is 128 entries
_PQ_M = 8
_PQ_K = 16
_PQ_D = _DIM // _PQ_M
# ivfpq leg: ADC top-6 shortlist per query, exact re-rank to top-3 —
# refine is deliberately far below the probed-cell candidate volume so
# the code-level pruning is semantically load-bearing in the checked
# output (a covering refine would collapse the leg to qtopk)
_IPQ_REFINE = 6
# sq8 leg: ADC top-5 shortlist per query, exact re-rank of those same
# five — refine = k, so emitted MEMBERSHIP is the codec's own ranking
# and the SQ8 approximation is value-visible in the checked rows
# (measured: 2 emitted rows at sf0.01 and 1 at sf0.1 differ from the
# brute leg — a shortlist wide enough to always cover the true top-5
# would collapse the leg to 'brute' on this corpus); the exact re-rank
# stays load-bearing for rnk order within the shortlist
_SQ8_REFINE = 5
# bq1 leg (r12): hamming shortlist = k, so emitted MEMBERSHIP is the
# 1-bit codec's own ranking (the sq8-leg discipline) — the sign-bit
# approximation is value-visible in the checked rows; hamming is
# INTEGER, so shortlist membership is engine-independent without an
# exact mode, and only the final cosines need the decimal re-rank
_BQ_REFINE = 3
# mrl leg (r12, rides dedup_embedding_cosine — measured on the ANN
# suite first and declined with numbers, see its doc): serve at the
# leading 16 of 64 dims (4x scan cut) from a PINNED prefix store,
# refine = k (the family's value-visible discipline) in EXACT mode —
# shortlist membership ranks on the trunc-quantized prefix cosine,
# replayed by the oracle as the comp CTE restricted to pos <= prefix
_MRL_PREFIX = 16
_MRL_REFINE = 3

# (vec_id, pos 1-based, v = trunc(x·1e12) quantized integer) + norms —
# the shared oracle base. Quantization by TRUNCATION is tie-free (decimal
# rounding of dyadic float32 values ties, and engines break ties
# differently); sums of quantized products are exact integer decimals;
# the decimal → VARCHAR → DOUBLE hop is correctly rounded in both
# engines (direct wide-decimal→double casts differ by 1 ulp).
_COMP_CTE = f"""
comp AS (
  SELECT vec_id, CAST(i AS INT) AS pos,
         CAST(trunc(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1e12) AS DECIMAL(19,0)) AS v
  FROM embeddings, range(1, {_DIM + 1}) t(i)
),
nrm AS (
  SELECT vec_id, CAST(CAST(sum(v * v) AS VARCHAR) AS DOUBLE) AS norm_sq FROM comp GROUP BY vec_id
)
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "sim_cosine_topk",
    f"""
    WITH {_COMP_CTE},
    dots AS (
      SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
             CAST(CAST(sum(qa.v * qb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM comp qa
      JOIN comp qb ON qa.pos = qb.pos AND qa.vec_id <> qb.vec_id
      WHERE qa.vec_id < 20
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT id_a, id_b, dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
      FROM dots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
    ),
    rk AS (
      SELECT id_a, id_b, cosine,
             CAST(row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS INTEGER) AS rnk
      FROM cos
    ),
    sq8raw AS (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
      FROM embeddings, range(1, {_DIM + 1}) t(i)
    ),
    sq8rng AS (
      SELECT vec_id, min(x) AS mn, max(x) AS mx FROM sq8raw GROUP BY vec_id
    ),
    sq8geo AS (
      SELECT vec_id, mn, mx,
             CAST(trunc((CASE WHEN mx > mn THEN (mx - mn) / 255.0
                               ELSE 1.0 END) * 1e15) AS BIGINT) AS sq,
             CAST(trunc(mn * 1e15) AS BIGINT) AS offq
      FROM sq8rng
    ),
    sq8xt AS (
      SELECT r.vec_id, r.pos,
             g.offq + g.sq * (CASE WHEN g.mx > g.mn
               THEN CAST(round((r.x - g.mn) / ((g.mx - g.mn) / 255.0)) AS INT)
               ELSE 0 END) AS xt
      FROM sq8raw r JOIN sq8geo g USING (vec_id)
    ),
    sq8xn AS (
      SELECT vec_id,
             CAST(CAST(sum(CAST(xt AS HUGEINT) *
                           CAST(xt AS HUGEINT)) AS VARCHAR)
                  AS DOUBLE) AS xsq
      FROM sq8xt GROUP BY vec_id
    ),
    sq8nd AS (
      SELECT q.vec_id AS id_a, x.vec_id AS id_b,
             CAST(CAST(sum(CAST(q.v AS HUGEINT) * CAST(x.xt AS HUGEINT))
                       AS VARCHAR) AS DOUBLE) AS nd
      FROM comp q JOIN sq8xt x ON x.pos = q.pos AND x.vec_id <> q.vec_id
      WHERE q.vec_id < 20
      GROUP BY 1, 2
    ),
    sq8short AS (
      SELECT id_a, id_b FROM (
        SELECT n.id_a, n.id_b,
               row_number() OVER (PARTITION BY n.id_a
                 ORDER BY n.nd / (sqrt(nr.norm_sq) * sqrt(xx.xsq)) DESC,
                          n.id_b) AS ar
        FROM sq8nd n
        JOIN nrm nr ON nr.vec_id = n.id_a
        JOIN sq8xn xx ON xx.vec_id = n.id_b
      ) WHERE ar <= {_SQ8_REFINE}
    ),
    sq8dots AS (
      SELECT s.id_a, s.id_b,
             CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM sq8short s
      JOIN comp ca ON ca.vec_id = s.id_a
      JOIN comp cb ON cb.vec_id = s.id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    sq8topk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT d.id_a, d.id_b,
               d.dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine,
               row_number() OVER (PARTITION BY d.id_a
                 ORDER BY d.dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) DESC,
                          d.id_b) AS rnk
        FROM sq8dots d
        JOIN nrm na ON na.vec_id = d.id_a
        JOIN nrm nb ON nb.vec_id = d.id_b
      ) WHERE rnk <= 5
    )
    SELECT 'brute' AS method, id_a, id_b, cosine, rnk FROM rk WHERE rnk <= 5
    UNION ALL
    SELECT 'sq8' AS method, id_a, id_b, cosine, rnk FROM sq8topk
    """,
    doc="Exact-vs-quantized serve pair over ONE shared corpus scan "
    "(tagged union): 'brute' = brute-force cosine top-5 for 20 query "
    "vectors against the whole corpus — posexplode + pos-join + "
    "decimal-exact dot products, deterministic tie-break on id_b, "
    "O(queries × corpus), the exactness baseline every ANN variant is "
    "judged against; 'sq8' (r11) = the per-vector affine int8 scalar-"
    "quantized serve tier (sq8_encode/sq8_topk exact mode) serving "
    "from a PINNED persisted codes relation: the oracle re-derives the "
    "codec itself (round((x−mn)/((mx−mn)/255)) — DuckDB's half-away-"
    "from-zero round ≡ Spark's HALF_UP on the non-negative encode "
    "domain), re-quantizes (scale, offset) to trunc·1e15 longs so the "
    "reconstructed components are integers, and replays the ADC "
    "top-5 shortlist per query in exact decimals (shortlist "
    "MEMBERSHIP is engine-independent, like the PQ legs) before the "
    "exact-cosine re-rank of those same five — refine = k keeps the "
    "quantization error value-visible in the checked rows (a few "
    "emitted neighbors per SF genuinely differ from the brute leg)",
    tags=("similarity", "sq8"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE (id, vdbl, EXACT norm_sq) base — a single scan of embeddings —
    # serves both legs (brute requires exact norms in its emitted
    # cosine; the sq8 leg's encode and re-rank ride the same cache)
    base = with_dbl_and_norm(_emb(spark, sf_dir)).persist()
    brute = brute_force_topk(
        base, query_ids_max=20, k=5, exact_base=True
    ).select(F.lit("brute").alias("method"), "id_a", "id_b", "cosine", "rnk")
    # the sq8 leg serves from a PINNED codes relation (the parquet
    # store layout, localCheckpoint standing in for the read-back), so
    # the driver attests the store round trip, not just the math —
    # exact mode reads ONLY (codes, scale, offset) from it
    codes = sq8_encode(base, vec_col="vdbl").localCheckpoint()
    sq8 = sq8_topk(
        base, codes=codes, query_ids_max=20, k=5, refine=_SQ8_REFINE,
        exact=True,
    ).select(F.lit("sq8").alias("method"), "id_a", "id_b", "cosine", "rnk")
    return brute.unionByName(sq8)


@register(
    "sim_ann_suite",
    f"""
    WITH {_COMP_CTE},
    planes AS (
      SELECT CAST(p AS INT) AS p, CAST(i AS INT) AS i,
             CASE WHEN instr('02468ace', substr(md5(p || '_' || i), 1, 1)) > 0
                  THEN 1 ELSE -1 END AS sign
      FROM range(0, 16) t(p), range(1, {_DIM + 1}) u(i)
    ),
    proj AS (
      SELECT c.vec_id, pl.p, CAST(sum(c.v * pl.sign) AS DOUBLE) AS proj
      FROM comp c JOIN planes pl ON pl.i = c.pos
      GROUP BY 1, 2
    ),
    buckets AS (
      SELECT vec_id,
             string_agg(CASE WHEN proj > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
      FROM proj GROUP BY vec_id
    ),
    banded AS (
      SELECT vec_id, CAST(b AS INT) AS band_id,
             substr(bucket, 1 + 4 * CAST(b AS INT), 4) AS band_key
      FROM buckets, range(0, 4) t(b)
    ),
    lcand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.vec_id < b.vec_id
    ),
    ldots AS (
      SELECT id_a, id_b, CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM lcand
      JOIN comp ca ON ca.vec_id = id_a
      JOIN comp cb ON cb.vec_id = id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    lsh_out AS (
      SELECT id_a, id_b,
             dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
      FROM ldots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
      WHERE dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) >= 0.4
    ),
    cents AS (
      SELECT CAST(row_number() OVER (
               ORDER BY md5(CAST(cent_vid AS VARCHAR)), cent_vid) AS INT) AS centroid_id,
             cent_vid
      FROM (SELECT vec_id AS cent_vid FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32)
    ),
    cscore AS (
      SELECT q.vec_id, c.centroid_id,
             CAST(CAST(sum(q.v * k.v) AS VARCHAR) AS DOUBLE) / sqrt(n.norm_sq) AS score
      FROM comp q
      JOIN cents c ON TRUE
      JOIN comp k ON k.vec_id = c.cent_vid AND k.pos = q.pos
      JOIN nrm n ON n.vec_id = c.cent_vid
      GROUP BY q.vec_id, c.centroid_id, n.norm_sq
    ),
    probes AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, centroid_id) AS pr
        FROM cscore
      ) WHERE pr <= 3
    ),
    icand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM probes a JOIN probes b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    ),
    idots AS (
      SELECT id_a, id_b, CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM icand
      JOIN comp ca ON ca.vec_id = id_a
      JOIN comp cb ON cb.vec_id = id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    ivf_out AS (
      SELECT id_a, id_b,
             dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
      FROM idots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
      WHERE dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) >= 0.4
    ),
    cell1 AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, centroid_id) AS pr
        FROM cscore
      ) WHERE pr = 1
    ),
    qcand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM probes a JOIN cell1 b
        ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 20
    ),
    qdots AS (
      SELECT id_a, id_b, CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM qcand
      JOIN comp ca ON ca.vec_id = id_a
      JOIN comp cb ON cb.vec_id = id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    qcos AS (
      SELECT id_a, id_b, dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
      FROM qdots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
    ),
    qtopk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT id_a, id_b, cosine,
               row_number() OVER (PARTITION BY id_a
                                  ORDER BY cosine DESC, id_b) AS rnk
        FROM qcos
      ) WHERE rnk <= 3
    ),
    pq_picks AS (
      SELECT j, cb_vid, CAST(rn - 1 AS INT) AS code FROM (
        SELECT CAST(j AS INT) AS j, vec_id AS cb_vid,
               row_number() OVER (PARTITION BY j
                 ORDER BY md5(CAST(j AS VARCHAR) || '|' ||
                              CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM (SELECT DISTINCT vec_id FROM embeddings), range(0, {_PQ_M}) t(j)
      ) WHERE rn <= {_PQ_K}
    ),
    pq_cbent AS (
      SELECT p.j, p.code, CAST(c.pos - p.j*{_PQ_D} AS INT) AS i,
             CAST(c.v AS HUGEINT) AS v
      FROM pq_picks p JOIN comp c ON c.vec_id = p.cb_vid
       AND c.pos > p.j*{_PQ_D} AND c.pos <= (p.j+1)*{_PQ_D}
    ),
    pq_cbnorm AS (
      SELECT j, code, sum(v * v) AS cn FROM pq_cbent GROUP BY 1, 2
    ),
    pq_dist AS (
      SELECT c.vec_id, e.j, e.code,
             sum((CAST(c.v AS HUGEINT) - e.v) *
                 (CAST(c.v AS HUGEINT) - e.v)) AS d2
      FROM comp c JOIN pq_cbent e ON c.pos = e.j*{_PQ_D} + e.i
      GROUP BY 1, 2, 3
    ),
    pq_codes AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, j, code,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, code) AS rn
        FROM pq_dist) WHERE rn = 1
    ),
    pq_lut AS (
      SELECT q.vec_id AS id_a, e.j, e.code,
             sum(CAST(q.v AS HUGEINT) * e.v) AS dotp
      FROM comp q JOIN pq_cbent e ON q.pos = e.j*{_PQ_D} + e.i
      WHERE q.vec_id < 20
      GROUP BY 1, 2, 3
    ),
    pq_xnorm AS (
      SELECT cd.vec_id, CAST(CAST(sum(cn.cn) AS VARCHAR) AS DOUBLE) AS xn
      FROM pq_codes cd JOIN pq_cbnorm cn ON cn.j = cd.j AND cn.code = cd.code
      GROUP BY 1
    ),
    pq_adc AS (
      SELECT l.id_a, cd.vec_id AS id_b,
             CAST(CAST(sum(l.dotp) AS VARCHAR) AS DOUBLE) AS sc
      FROM pq_codes cd JOIN pq_lut l ON l.j = cd.j AND l.code = cd.code
       AND l.id_a <> cd.vec_id
      GROUP BY 1, 2
    ),
    pq_cos AS (
      SELECT a.id_a, a.id_b,
             a.sc / (sqrt(n.norm_sq) * sqrt(x.xn)) AS cosine
      FROM pq_adc a JOIN nrm n ON n.vec_id = a.id_a
      JOIN pq_xnorm x ON x.vec_id = a.id_b
    ),
    pqtopk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT id_a, id_b, cosine,
               row_number() OVER (PARTITION BY id_a
                                  ORDER BY cosine DESC, id_b) AS rnk
        FROM pq_cos) WHERE rnk <= 3
    ),
    ipq_adc AS (
      SELECT qc.id_a, qc.id_b,
             CAST(CAST(sum(l.dotp) AS VARCHAR) AS DOUBLE) AS sc
      FROM qcand qc
      JOIN pq_codes cd ON cd.vec_id = qc.id_b
      JOIN pq_lut l ON l.id_a = qc.id_a AND l.j = cd.j AND l.code = cd.code
      GROUP BY 1, 2
    ),
    ipq_short AS (
      SELECT id_a, id_b FROM (
        SELECT a.id_a, a.id_b,
               row_number() OVER (PARTITION BY a.id_a
                 ORDER BY a.sc / (sqrt(n.norm_sq) * sqrt(x.xn)) DESC,
                          a.id_b) AS ar
        FROM ipq_adc a
        JOIN nrm n ON n.vec_id = a.id_a
        JOIN pq_xnorm x ON x.vec_id = a.id_b
      ) WHERE ar <= {_IPQ_REFINE}
    ),
    ipqtopk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT s.id_a, s.id_b, q.cosine,
               row_number() OVER (PARTITION BY s.id_a
                                  ORDER BY q.cosine DESC, s.id_b) AS rnk
        FROM ipq_short s
        JOIN qcos q ON q.id_a = s.id_a AND q.id_b = s.id_b
      ) WHERE rnk <= 3
    ),
    ccomp AS (
      SELECT c.centroid_id, k.pos, k.v
      FROM cents c JOIN comp k ON k.vec_id = c.cent_vid
    ),
    rescomp AS (
      SELECT x.vec_id, x.pos, x.v - cc.v AS v
      FROM comp x
      JOIN cell1 cl ON cl.vec_id = x.vec_id
      JOIN ccomp cc ON cc.centroid_id = cl.centroid_id AND cc.pos = x.pos
    ),
    rcb_ent AS (
      SELECT p.j, p.code, CAST(r.pos - p.j*{_PQ_D} AS INT) AS i,
             CAST(r.v AS HUGEINT) AS v
      FROM pq_picks p JOIN rescomp r ON r.vec_id = p.cb_vid
       AND r.pos > p.j*{_PQ_D} AND r.pos <= (p.j+1)*{_PQ_D}
    ),
    r_dist AS (
      SELECT r.vec_id, e.j, e.code,
             sum((CAST(r.v AS HUGEINT) - e.v) *
                 (CAST(r.v AS HUGEINT) - e.v)) AS d2
      FROM rescomp r JOIN rcb_ent e ON r.pos = e.j*{_PQ_D} + e.i
      GROUP BY 1, 2, 3
    ),
    r_codes AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, j, code,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, code) AS rn
        FROM r_dist) WHERE rn = 1
    ),
    r_lut AS (
      SELECT q.vec_id AS id_a, e.j, e.code,
             sum(CAST(q.v AS HUGEINT) * e.v) AS dotp
      FROM comp q JOIN rcb_ent e ON q.pos = e.j*{_PQ_D} + e.i
      WHERE q.vec_id < 20
      GROUP BY 1, 2, 3
    ),
    qcdot AS (
      SELECT q.vec_id AS id_a, cc.centroid_id,
             sum(CAST(q.v AS HUGEINT) * CAST(cc.v AS HUGEINT)) AS dotv
      FROM comp q JOIN ccomp cc ON cc.pos = q.pos
      WHERE q.vec_id < 20
      GROUP BY 1, 2
    ),
    rxn AS (
      SELECT cd.vec_id,
             CAST(CAST(sum((CAST(cc.v AS HUGEINT) + e.v) *
                           (CAST(cc.v AS HUGEINT) + e.v)) AS VARCHAR)
                  AS DOUBLE) AS xn
      FROM r_codes cd
      JOIN rcb_ent e ON e.j = cd.j AND e.code = cd.code
      JOIN cell1 cl ON cl.vec_id = cd.vec_id
      JOIN ccomp cc ON cc.centroid_id = cl.centroid_id
       AND cc.pos = cd.j*{_PQ_D} + e.i
      GROUP BY 1
    ),
    radc_lut AS (
      SELECT qc.id_a, qc.id_b, sum(l.dotp) AS lutsum
      FROM qcand qc
      JOIN r_codes cd ON cd.vec_id = qc.id_b
      JOIN r_lut l ON l.id_a = qc.id_a AND l.j = cd.j AND l.code = cd.code
      GROUP BY 1, 2
    ),
    radc AS (
      SELECT a.id_a, a.id_b,
             CAST(CAST(a.lutsum + qd.dotv AS VARCHAR) AS DOUBLE) AS sc
      FROM radc_lut a
      JOIN cell1 cl ON cl.vec_id = a.id_b
      JOIN qcdot qd ON qd.id_a = a.id_a AND qd.centroid_id = cl.centroid_id
    ),
    r_short AS (
      SELECT id_a, id_b FROM (
        SELECT a.id_a, a.id_b,
               row_number() OVER (PARTITION BY a.id_a
                 ORDER BY a.sc / (sqrt(n.norm_sq) * sqrt(x.xn)) DESC,
                          a.id_b) AS ar
        FROM radc a
        JOIN nrm n ON n.vec_id = a.id_a
        JOIN rxn x ON x.vec_id = a.id_b
      ) WHERE ar <= {_IPQ_REFINE}
    ),
    rtopk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT s.id_a, s.id_b, q.cosine,
               row_number() OVER (PARTITION BY s.id_a
                                  ORDER BY q.cosine DESC, s.id_b) AS rnk
        FROM r_short s
        JOIN qcos q ON q.id_a = s.id_a AND q.id_b = s.id_b
      ) WHERE rnk <= 3
    ),
    bqraw AS (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
      FROM embeddings, range(1, {_DIM + 1}) t(i)
    ),
    bqw AS (
      SELECT vec_id, CAST((pos - 1) // 32 AS INT) AS w,
             CAST(sum(CASE WHEN x > 0
               THEN (CAST(1 AS BIGINT) << (31 - ((pos - 1) % 32)))
               ELSE 0 END) AS BIGINT) AS word
      FROM bqraw GROUP BY 1, 2
    ),
    bqh AS (
      SELECT q.vec_id AS id_a, x.vec_id AS id_b,
             CAST(sum(bit_count(xor(q.word, x.word))) AS INT) AS h
      FROM bqw q JOIN bqw x ON x.w = q.w AND x.vec_id <> q.vec_id
      WHERE q.vec_id < 20
      GROUP BY 1, 2
    ),
    bqshort AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               row_number() OVER (PARTITION BY id_a
                                  ORDER BY h, id_b) AS ar
        FROM bqh
      ) WHERE ar <= {_BQ_REFINE}
    ),
    bqdots AS (
      SELECT s.id_a, s.id_b,
             CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM bqshort s
      JOIN comp ca ON ca.vec_id = s.id_a
      JOIN comp cb ON cb.vec_id = s.id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    bqtopk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT d.id_a, d.id_b,
               d.dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine,
               row_number() OVER (PARTITION BY d.id_a
                 ORDER BY d.dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) DESC,
                          d.id_b) AS rnk
        FROM bqdots d
        JOIN nrm na ON na.vec_id = d.id_a
        JOIN nrm nb ON nb.vec_id = d.id_b
      ) WHERE rnk <= 3
    )
    SELECT 'lsh' AS method, id_a, id_b, cosine,
           CAST(NULL AS INTEGER) AS rnk FROM lsh_out
    UNION ALL
    SELECT 'ivf' AS method, id_a, id_b, cosine,
           CAST(NULL AS INTEGER) AS rnk FROM ivf_out
    UNION ALL
    SELECT 'qtopk' AS method, id_a, id_b, cosine, rnk FROM qtopk
    UNION ALL
    SELECT 'pq' AS method, id_a, id_b, cosine, rnk FROM pqtopk
    UNION ALL
    SELECT 'ivfpq' AS method, id_a, id_b, cosine, rnk FROM ipqtopk
    UNION ALL
    SELECT 'rivfpq' AS method, id_a, id_b, cosine, rnk FROM rtopk
    UNION ALL
    SELECT 'bq1' AS method, id_a, id_b, cosine, rnk FROM bqtopk
    """,
    doc="ANN suite, ALL FIVE scale paths in one checked plan (tagged "
    "union, the grouping-suite pattern): 'lsh' = 16 deterministic "
    "random-hyperplane sign bits (md5-derived, oracle-identical) banded "
    "4×4 so vectors sharing any band collide; 'ivf' = inverted-file "
    "cells from a seeded (md5-ordered) centroid sample, top-3 probes "
    "per vector, candidates share a probed cell; 'qtopk' = the QUERY "
    "path (ivf_topk): corpus indexed to its single nearest cell, the "
    "20 query vectors multi-probe their top-3 cells, probed-cell "
    "members exactly re-scored, top-3 per query — per-query cost ~ "
    "probed cells, not the corpus; 'pq' = product quantization "
    "(pq_train/pq_topk exact mode, 8 sub-spaces × 16 codes = 32× "
    "compression): seeded codebook pick, nearest-code encoding, and "
    "per-query ADC over the 8-byte codes, all in exact integer "
    "decimals so codes AND reconstructed-norm cosines check bitwise; "
    "'ivfpq' (r8) = the IVF-PQ serve tier (ivf_pq_topk exact mode): "
    "the qtopk leg's probed-cell candidates scanned as the pq leg's "
    "8-byte codes (one shared exact encode pass serves both legs), "
    "ADC top-6 shortlist per query in exact decimals (shortlist "
    "MEMBERSHIP is engine-independent, not just scores), exact-cosine "
    "re-rank to top-3 — code-level pruning is load-bearing in the "
    "checked output since refine=6 is far below candidate volume; "
    "'rivfpq' (r9) = the residual IVFADC layout (Jégou's full "
    "construction) in the SAME exact mode: residuals x − c(x) taken "
    "in INTEGER space against the shared cell geometry, residual "
    "books seeded by the identical md5 picks, and the decomposed "
    "score dot(q,c) + Σ LUT[code] summed as exact decimals BEFORE the "
    "one double conversion (decimal addition is associative, so the "
    "split numerator cannot diverge engines) with |x̂| = |cq + r̂q| "
    "the decimal reconstructed norm — shortlist membership, scores, "
    "and ranks all hash-checked; "
    "'bq1' (r12) = one-bit binary quantization (bq_encode/bq_topk, "
    "Charikar-sign bits packed MSB-first into 32-bit integer lanes — "
    "16 bytes per 64-dim row) serving from a PINNED persisted codes "
    "relation: the oracle re-derives the sign bits AND the lane "
    "packing in SQL integer arithmetic, replays hamming via "
    "xor+bit_count, takes the per-query hamming top-3 shortlist "
    "(INTEGER scores — engine-independent membership with no margin "
    "pass) and exact-cosine re-ranks those same three; refine = k "
    "keeps the 1-bit approximation value-visible in the checked rows "
    "(the mrl serve tier attests on the non-headline "
    "dedup_embedding_cosine slot — measured here first and declined "
    "with numbers: ~+3 s at sf0.1 would leave <7%% bound headroom). "
    "Exact-decimal scoring everywhere (even probe ASSIGNMENT), so the "
    "whole suite is value-checked. Cost ~ collisions, never corpus²; "
    "measured recall at sf0.1: lsh 0.53, ivf 0.67, precision 1.0 (see "
    "operator docstrings)",
    tags=("similarity", "lsh", "ivf", "pq", "ivfpq", "residual"),
)
def sim_ann_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one (id, vdbl, approx-norm) base — a single scan of embeddings —
    # shared by ALL legs (bucketing, assignments, and every verify /
    # re-score stage); each leg would otherwise persist its own copy
    base = with_dbl_and_approx_norm(_emb(spark, sf_dir)).persist()
    null_rnk = F.lit(None).cast("int").alias("rnk")
    lsh = lsh_ann_pairs(base, num_planes=16, bands=4, min_cosine=0.4).select(
        F.lit("lsh").alias("method"), "id_a", "id_b", "cosine", null_rnk
    )
    # OVERLAPPED eager-pin chains (r11, widened r16): localCheckpoints
    # run jobs at plan-BUILD time, so built inline they serialized ~10
    # small materializations end to end. The chains are split at their
    # true data dependencies and built on a thread pool so the fixed
    # scheduling latency overlaps (Spark job submission is thread-safe;
    # the relations are identical either way) — r11 measured two-way
    # overlap at 8.16 → 7.34 s suite min; r16 moves the rivfpq leg's
    # in-call residual training (res pin + books pin, ~5 serial jobs at
    # plan build) onto the pool too, overlapping it with the
    # pair_scores pin instead of paying it after every other pin has
    # completed.
    def _geometry_pins():
        # ONE ranked corpus-vs-centroids scoring pass serves ALL IVF
        # legs: the pair leg uses all 3 probes, the query leg's corpus
        # index is the probe_rank==1 slice and its query probes the
        # id<20 rows; the cell geometry is materialized explicitly
        # (the same seeded pick ivf_assignments would derive) because
        # the residual leg needs the centroid VECTORS, not just the
        # cell ids — localCheckpoint pins the O(C) rows so its three
        # consumers don't re-run the pick.
        cents = _seed_centroids(base, 32, "vec_id").localCheckpoint()
        assign = ivf_assignments(
            base, num_centroids=32, probes=3, vec_col="vdbl",
            with_rank=True, centroids=cents,
        ).persist()
        return cents, assign

    def _cand_pins(assign):
        # ONE pinned candidate-pair list serves all three query-path
        # legs (qtopk re-ranks it whole, ivfpq/rivfpq shortlist it),
        # and ONE pinned exact-cosine scoring of those pairs serves all
        # three re-ranks (per-pair cosine is a pure function of the
        # pair, so the PQ shortlists joining into it ≡ recomputing it):
        # un-shared, each leg re-derived the same cells join AND re-ran
        # the decimal cosine fold with its own AQE stage
        # materializations (r9 job audit)
        cand = ivf_candidate_pairs(assign, query_ids_max=20).localCheckpoint()
        pair_scores = cosine_for_pairs(
            base, cand, exact_norms_in_base=False
        ).localCheckpoint()
        return cand, pair_scores

    def _picks_pin():
        # ONE ranked pick pass seeds BOTH code spaces (r10): the md5
        # pick rule never reads a vector value, so the raw books and
        # the rivfpq leg's residual books share this pinned O(m·k) id
        # relation — un-shared, each training ran its own two-window
        # ranked pass over the corpus.
        return pq_pick_ids(
            base, num_subvectors=_PQ_M, codes_per_subvector=_PQ_K
        ).localCheckpoint()

    def _pq_pins(picks):
        # pq legs ride the same persisted base (vec_col="vdbl" — the
        # quantization inside exact mode truncates identically from the
        # double components); dim passed explicitly, no inference job.
        # The O(m·k) codebook is localCheckpointed: three downstream
        # stages (encode, query LUTs, corpus ADC side) each pack it,
        # and pinning the 128 rows keeps the picks from re-running once
        # per consumer.
        books = pq_train(
            base, num_subvectors=_PQ_M, codes_per_subvector=_PQ_K,
            vec_col="vdbl", dim=_DIM, exact=True, picks=picks,
        ).localCheckpoint()
        # ONE exact encode pass serves BOTH pq legs (pq_topk would
        # otherwise fuse its own corpus-wide encode and ivf_pq_topk
        # would re-encode its candidates — at full-probe coverage that
        # is the corpus again); localCheckpoint pins the 8-int rows
        codes = pq_encode(
            base, books, vec_col="vdbl", exact=True
        ).localCheckpoint()
        # bq1 (r12) rides this thread too: its sign-bit store (2 longs
        # per row) pins here so the leg serves from a PERSISTED codes
        # relation — the parquet store layout, localCheckpoint standing
        # in for the read-back, exactly the sq8-leg convention
        bq_codes = bq_encode(base, "vec_id", "vdbl").localCheckpoint()
        return books, codes, bq_codes

    def _res_books_pin(cents, assign, picks):
        # r16: the rivfpq leg's residual books, pre-trained HERE so the
        # ~5 pin jobs ivf_pq_topk(residual=True, codebooks=None) ran
        # serially at plan build (res pin + books pin) overlap the
        # pair_scores pin instead. Inputs are bitwise the in-call
        # training's: same primary cells (the suite's ranked pass at
        # probe_rank==1), same centroid vectors, same shared picks —
        # pq_train_residual(exact=True) is the identical
        # quantize-separately/subtract-in-integer-space pipeline and
        # additionally stamps the residual tag the codebooks= hook
        # requires. With books supplied, the serve call's inline
        # residual relation is consumed ONCE (the fused encode side),
        # so it no longer needs its own eager pin — that encode now
        # runs inside the final action, off the serial plan-build path.
        rbooks = pq_train_residual(
            base, cents, num_subvectors=_PQ_M,
            codes_per_subvector=_PQ_K, vec_col="vdbl", dim=_DIM,
            exact=True, picks=picks,
            corpus_cells=assign.filter(F.col("probe_rank") == 1).select(
                "vec_id", "centroid_id"
            ),
        ).localCheckpoint()
        # pre-pack on this thread too (memoized per books object): the
        # main thread's two consumers (query LUTs + ADC side) would
        # otherwise run the one-row pack job at plan build
        _packed_codebooks(rbooks)
        return rbooks

    with ThreadPoolExecutor(max_workers=4) as pool:
        geo_fut = pool.submit(_geometry_pins)
        picks_fut = pool.submit(_picks_pin)
        pq_fut = pool.submit(lambda: _pq_pins(picks_fut.result()))
        cents, assign = geo_fut.result()
        cand_fut = pool.submit(lambda: _cand_pins(assign))
        rbooks_fut = pool.submit(
            lambda: _res_books_pin(cents, assign, picks_fut.result())
        )
        cand, pair_scores = cand_fut.result()
        books, codes, bq_codes = pq_fut.result()
        rbooks = rbooks_fut.result()
    ivf = ivf_ann_pairs(
        base, num_centroids=32, probes=3, min_cosine=0.4, assignments=assign
    ).select(F.lit("ivf").alias("method"), "id_a", "id_b", "cosine", null_rnk)
    # serve_broadcast operating bound (r16, explicit at every serve
    # call below): the three serve legs keep the DEFAULT
    # serve_broadcast=True, which force-broadcasts candidate-bounded
    # relations (cand / pair_scores / the candidate-filtered ADC
    # sides). The contract is candidate volume ≲ 1e8 slim rows (Spark's
    # 8 GB / int-max-rows broadcast cap — see _PQServeInputs): here it
    # holds by construction, |cand| ≤ 20 queries × 3 probed cells ×
    # max cell size ≪ 1e8 at ANY corpus size that keeps √C-scaled
    # cells. A deployment whose probed-cell volume can outgrow that
    # passes serve_broadcast=False (pytest-pinned identical results)
    # or a persisted adc_side=.
    qt = ivf_topk(
        base, query_ids_max=20, k=3, num_centroids=32, probes=3,
        assignments=assign, cand=cand, pair_scores=pair_scores,
    ).select(F.lit("qtopk").alias("method"), "id_a", "id_b", "cosine", "rnk")
    # (r9 note: sharing ONE persisted pq_adc_side relation between the
    # two PQ query paths was measured SLOWER here — the materialization
    # barrier serializes stages the fused per-leg sides overlap; the
    # adc_side= hook remains the right call for a persisted serving
    # deployment, where the relation already exists on disk.)
    pq = pq_topk(
        base, books, codes=codes, query_ids_max=20, k=3, vec_col="vdbl",
        exact=True,
    ).select(
        F.lit("pq").alias("method"), "id_a", "id_b",
        F.col("cosine_pq").alias("cosine"), "rnk",
    )
    # fifth leg (r8): IVF-PQ serving with an EXACT-DECIMAL ADC
    # shortlist — cells/probes shared with the qtopk leg via the same
    # ranked assignments, books/codes shared with the pq leg; the
    # oracle replays candidate generation, code-level shortlist
    # pruning (top-6 by exact ADC), and the exact re-rank bitwise
    ipq = ivf_pq_topk(
        base, query_ids_max=20, k=3, num_centroids=32, probes=3,
        refine=_IPQ_REFINE, assignments=assign, codebooks=books,
        codes=codes, dim=_DIM, exact=True, cand=cand,
        pair_scores=pair_scores,
    ).select(F.lit("ivfpq").alias("method"), "id_a", "id_b", "cosine", "rnk")
    # sixth leg (r9): residual IVFADC in exact mode — same shared
    # cells/probes (assignments) with the pinned centroid VECTORS for
    # the residual subtraction; residual books pre-trained on the pin
    # pool above (r16 — integer-space residuals are a different code
    # space, so the raw legs' books/codes cannot be shared, but the
    # training itself overlaps the other pins), and the decomposed
    # dot(q,c) + LUT score folds as one exact decimal — the oracle
    # replays shortlist membership, scores, and ranks bitwise
    ripq = ivf_pq_topk(
        base, query_ids_max=20, k=3, probes=3, refine=_IPQ_REFINE,
        assignments=assign, centroids=cents, dim=_DIM,
        residual=True, exact=True, cand=cand, pair_scores=pair_scores,
        codebooks=rbooks,
    ).select(F.lit("rivfpq").alias("method"), "id_a", "id_b", "cosine", "rnk")
    # seventh leg (r12): BQ1 one-bit binary quantization serving from
    # the pinned sign-bit store — hamming shortlist at refine = k (the
    # 1-bit ranking itself is value-visible, the sq8-leg discipline),
    # exact-decimal re-rank of those same k; hamming is integer, so
    # the oracle replays shortlist membership without a margin pass
    bq = bq_topk(
        base, codes=bq_codes, query_ids_max=20, k=3, refine=_BQ_REFINE,
    ).select(F.lit("bq1").alias("method"), "id_a", "id_b", "cosine", "rnk")
    return (
        lsh.unionByName(ivf)
        .unionByName(qt)
        .unionByName(pq)
        .unionByName(ipq)
        .unionByName(ripq)
        .unionByName(bq)
    )


# decontam leg: benchmark side = the first _DCT_BENCH ids (an eval set
# is small BY NATURE — it broadcasts), corpus side = the rest; a corpus
# vector within cosine ≥ _DCT_MIN of ANY benchmark vector is a flagged
# contamination pair
_DCT_BENCH = 50
_DCT_MIN = 0.3
# semdedup leg (r12): C ~ sqrt(corpus at sf0.01) seeded cells,
# realistic multi-probe (recall clustering-bounded, deterministic),
# the corpus's 0.4 near-dup band as the e-ball threshold, the paper's
# farthest-from-centroid keep rule — in EXACT mode, so even the
# keep-rule quality key (centroid cosine) replays bitwise in SQL
_SD_CENTS = 22
_SD_PROBES = 3
_SD_MIN = 0.4


@register(
    "dedup_embedding_cosine",
    f"""
    WITH RECURSIVE {_COMP_CTE},
    dots AS (
      SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
             CAST(CAST(sum(qa.v * qb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM comp qa
      JOIN comp qb ON qa.pos = qb.pos AND qa.vec_id < qb.vec_id
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT id_a, id_b, dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
      FROM dots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
    ),
    dcd AS (
      SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
             CAST(CAST(sum(qa.v * qb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM comp qa
      JOIN comp qb ON qa.pos = qb.pos
      WHERE qa.vec_id >= {_DCT_BENCH} AND qb.vec_id < {_DCT_BENCH}
      GROUP BY 1, 2
    ),
    dct AS (
      SELECT id_a, id_b, dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
      FROM dcd
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
    ),
    mrlpn AS (
      SELECT vec_id, CAST(CAST(sum(v * v) AS VARCHAR) AS DOUBLE) AS pn
      FROM comp WHERE pos <= {_MRL_PREFIX} GROUP BY vec_id
    ),
    mrld AS (
      SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
             CAST(CAST(sum(qa.v * qb.v) AS VARCHAR) AS DOUBLE) AS pdot
      FROM comp qa
      JOIN comp qb ON qa.pos = qb.pos AND qb.vec_id <> qa.vec_id
      WHERE qa.vec_id < 20 AND qa.pos <= {_MRL_PREFIX}
      GROUP BY 1, 2
    ),
    mrlshort AS (
      SELECT id_a, id_b FROM (
        SELECT d.id_a, d.id_b,
               row_number() OVER (PARTITION BY d.id_a
                 ORDER BY d.pdot / (sqrt(pa.pn) * sqrt(pb.pn)) DESC,
                          d.id_b) AS ar
        FROM mrld d
        JOIN mrlpn pa ON pa.vec_id = d.id_a
        JOIN mrlpn pb ON pb.vec_id = d.id_b
      ) WHERE ar <= {_MRL_REFINE}
    ),
    mrldots AS (
      SELECT s.id_a, s.id_b,
             CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM mrlshort s
      JOIN comp ca ON ca.vec_id = s.id_a
      JOIN comp cb ON cb.vec_id = s.id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    mrltopk AS (
      SELECT id_a, id_b, cosine, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT d.id_a, d.id_b,
               d.dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine,
               row_number() OVER (PARTITION BY d.id_a
                 ORDER BY d.dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) DESC,
                          d.id_b) AS rnk
        FROM mrldots d
        JOIN nrm na ON na.vec_id = d.id_a
        JOIN nrm nb ON nb.vec_id = d.id_b
      ) WHERE rnk <= {_MRL_REFINE}
    ),
    scents AS (
      SELECT CAST(row_number() OVER (
               ORDER BY md5(CAST(cent_vid AS VARCHAR)), cent_vid) AS INT)
               AS centroid_id,
             cent_vid
      FROM (SELECT vec_id AS cent_vid FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_SD_CENTS})
    ),
    sscore AS (
      SELECT q.vec_id, c.centroid_id,
             CAST(CAST(sum(q.v * k.v) AS VARCHAR) AS DOUBLE)
               / sqrt(n.norm_sq) AS score
      FROM comp q
      JOIN scents c ON TRUE
      JOIN comp k ON k.vec_id = c.cent_vid AND k.pos = q.pos
      JOIN nrm n ON n.vec_id = c.cent_vid
      GROUP BY q.vec_id, c.centroid_id, n.norm_sq
    ),
    sprobes AS (
      SELECT vec_id, centroid_id, pr FROM (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, centroid_id) AS pr
        FROM sscore
      ) WHERE pr <= {_SD_PROBES}
    ),
    sdots AS (
      SELECT id_a, id_b,
             CAST(CAST(sum(ca.v * cb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM sprobes a JOIN sprobes b
              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id)
      JOIN comp ca ON ca.vec_id = id_a
      JOIN comp cb ON cb.vec_id = id_b AND cb.pos = ca.pos
      GROUP BY 1, 2
    ),
    spairs AS (
      SELECT id_a, id_b
      FROM sdots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
      WHERE dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) >= {_SD_MIN}
    ),
    sedge AS (
      SELECT id_a AS a, id_b AS b FROM spairs
      UNION
      SELECT id_b AS a, id_a AS b FROM spairs
    ),
    sreach AS (
      SELECT a AS id, b AS lbl FROM sedge
      UNION
      SELECT e.a AS id, r.lbl FROM sedge e JOIN sreach r ON r.id = e.b
    ),
    scomp AS (SELECT id, min(lbl) AS canonical FROM sreach GROUP BY id),
    sccos AS (
      SELECT q.vec_id,
             CAST(CAST(sum(q.v * k.v) AS VARCHAR) AS DOUBLE)
               / (sqrt(nv.norm_sq) * sqrt(nc.norm_sq)) AS ccos
      FROM sprobes p
      JOIN scents c ON c.centroid_id = p.centroid_id
      JOIN comp q ON q.vec_id = p.vec_id
      JOIN comp k ON k.vec_id = c.cent_vid AND k.pos = q.pos
      JOIN nrm nv ON nv.vec_id = p.vec_id
      JOIN nrm nc ON nc.vec_id = c.cent_vid
      WHERE p.pr = 1
      GROUP BY q.vec_id, nv.norm_sq, nc.norm_sq
    ),
    ssurv AS (
      SELECT canonical AS cluster_id, id AS survivor_id FROM (
        SELECT m.id, m.canonical,
               row_number() OVER (PARTITION BY m.canonical
                 ORDER BY s.ccos ASC, m.id ASC) AS rn
        FROM scomp m JOIN sccos s ON s.vec_id = m.id
      ) WHERE rn = 1
    ),
    exr AS (
      SELECT id_a, id_b, cosine FROM cos WHERE cosine >= 0.4
      UNION ALL
      SELECT id_b AS id_a, id_a AS id_b, cosine
      FROM cos WHERE cosine >= 0.4
    ),
    extop AS (
      SELECT id_a, id_b, rnk FROM (
        SELECT id_a, id_b,
               CAST(row_number() OVER (PARTITION BY id_a
                 ORDER BY cosine DESC, id_b) AS INTEGER) AS rnk
        FROM exr WHERE id_a < 20
      ) WHERE rnk <= 3
    ),
    rrfc AS (
      SELECT id_a, id_b, CAST(round(1e9 / (60 + rnk)) AS BIGINT) AS c
      FROM extop
      UNION ALL
      SELECT id_a, id_b, CAST(round(1e9 / (60 + rnk)) AS BIGINT) AS c
      FROM mrltopk
    ),
    rrfs AS (
      SELECT id_a, id_b, CAST(sum(c) AS BIGINT) AS nano
      FROM rrfc GROUP BY 1, 2
    ),
    rrfrk AS (
      SELECT id_a, id_b, CAST(nano AS DOUBLE) / 1e9 AS cosine,
             CAST(row_number() OVER (PARTITION BY id_a
               ORDER BY nano DESC, id_b) AS INTEGER) AS rnk
      FROM rrfs
    ),
    mrlrec AS (
      SELECT b.id_a,
             CAST(count(s.id_b) AS BIGINT) AS hits,
             CAST(count(*) AS INTEGER) AS truth_n,
             CAST(count(s.id_b) AS BIGINT)
               / CAST(count(*) AS BIGINT) AS recall
      FROM (SELECT id_a, id_b FROM extop) b
      LEFT JOIN (SELECT id_a, id_b FROM mrltopk) s
        ON s.id_a = b.id_a AND s.id_b = b.id_b
      GROUP BY b.id_a
    ),
    mrlprec AS (
      SELECT s.id_a,
             CAST(count(b.id_b) AS BIGINT) AS hits,
             CAST(count(*) AS INTEGER) AS served_n,
             CAST(count(b.id_b) AS BIGINT)
               / CAST(count(*) AS BIGINT) AS prec
      FROM (SELECT id_a, id_b FROM mrltopk) s
      LEFT JOIN (SELECT id_a, id_b FROM extop) b
        ON b.id_a = s.id_a AND b.id_b = s.id_b
      GROUP BY s.id_a
    ),
    semdd AS (
      SELECT s.vec_id AS id_a, m.canonical AS id_b, s.ccos AS cosine,
             CAST(CASE WHEN m.canonical IS NOT NULL
                        AND sv.survivor_id IS NULL
                       THEN 1 ELSE 0 END AS INTEGER) AS rnk
      FROM sccos s
      LEFT JOIN scomp m ON m.id = s.vec_id
      LEFT JOIN ssurv sv ON sv.cluster_id = m.canonical
                        AND sv.survivor_id = s.vec_id
    )
    SELECT 'pairs' AS method, id_a, id_b, cosine,
           CAST(NULL AS INTEGER) AS rnk
    FROM cos WHERE cosine >= 0.4
    UNION ALL
    SELECT 'decontam' AS method, id_a, id_b, cosine,
           CAST(NULL AS INTEGER) AS rnk
    FROM dct WHERE cosine >= {_DCT_MIN}
    UNION ALL
    SELECT 'mrl' AS method, id_a, id_b, cosine, rnk FROM mrltopk
    UNION ALL
    SELECT 'semdedup' AS method, id_a, id_b, cosine, rnk FROM semdd
    UNION ALL
    SELECT 'rrf' AS method, id_a, id_b, cosine, rnk FROM rrfrk
    UNION ALL
    SELECT 'recall' AS method, id_a, hits AS id_b, recall AS cosine,
           truth_n AS rnk
    FROM mrlrec
    UNION ALL
    SELECT 'prec' AS method, id_a, hits AS id_b, prec AS cosine,
           served_n AS rnk
    FROM mrlprec
    """,
    doc="Embedding-space dedup/decontamination pair (tagged union): "
    "'pairs' = exact all-pairs cosine ≥ 0.4 (this synthetic corpus's "
    "near-dup band; real near-dup dedup sets ~0.95) — the embedding "
    "member of the dedup family and the ground truth the ANN variants "
    "are judged against (sim_ann_suite holds the bucketed versions of "
    "the same output); 'decontam' (r12) = semantic eval-set "
    "decontamination (operators/semantic.py::semantic_decontaminate, "
    "the embedding twin of the k-gram decontaminate): benchmark = the "
    "first 50 vectors (eval-set-sized, broadcast with precomputed "
    "exact norms), corpus = the rest streaming through one scan; a "
    "(corpus, benchmark) pair at exact cosine ≥ 0.3 is a flagged "
    "contamination (below the near-dup band so the leg checks a DENSE "
    "pair set — ~180 rows at sf0.01 — not a sparse corner). The double prefilter at threshold − 1e-6 is "
    "membership-invisible (the module's margin proof), so emitted "
    "pairs AND values replay bitwise in the oracle's decimal CTEs. "
    "'prec' (r13) = precision@k (operators/fusion.py::precision_at_k) "
    "of the mrl serve tier against the exact thresholded ranking — "
    "completes the serving-evaluation triple alongside the 'recall' "
    "and rrf legs: same O(queries·k) integer counting, denominators "
    "TRANSPOSED (every SERVED query gets a row, hits/served_n), so "
    "the oracle is the recall CTE with the join sides swapped.",
    tags=("dedup", "similarity", "decontam"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    null_rnk = F.lit(None).cast("int").alias("rnk")
    # the pair relation now feeds its own leg AND the exact per-query
    # ranking the fusion/recall legs consume — persist so the O(n²)
    # verify runs once per action, not once per consumer
    pairs_r = all_pairs_cosine(emb, min_cosine=0.4).persist()
    pairs = pairs_r.select(
        F.lit("pairs").alias("method"), "id_a", "id_b", "cosine", null_rnk
    )
    dec = semantic_decontaminate(
        emb.filter(F.col("vec_id") >= _DCT_BENCH),
        emb.filter(F.col("vec_id") < _DCT_BENCH),
        min_cosine=_DCT_MIN,
    ).select(
        F.lit("decontam").alias("method"),
        F.col("vec_id").alias("id_a"),
        F.col("bench_id").alias("id_b"),
        "cosine",
        null_rnk,
    )
    # mrl serve leg: one prepared+persisted base (caller-owned cache,
    # released below is unnecessary — the driver's per-query process
    # scope reclaims it; bench is not this slot's concern) shared by
    # the prefix store pin and the full-dim re-rank
    base = with_dbl_and_approx_norm(emb).persist()
    store = mrl_prefix_encode(
        base, _MRL_PREFIX, vec_col="vdbl"
    ).localCheckpoint()
    mrl_r = mrl_topk(
        base, prefix_dims=_MRL_PREFIX, query_ids_max=20, k=3,
        refine=_MRL_REFINE, prefix=store, exact=True,
    ).persist()
    mrl = mrl_r.select(
        F.lit("mrl").alias("method"), "id_a", "id_b", "cosine", "rnk"
    )
    # exact thresholded ranking for the fusion/recall legs: symmetrize
    # the already-verified pair relation, rank per query — ground
    # truth AT the 0.4 band, derived with one window, no new folds
    sym = pairs_r.select("id_a", "id_b", "cosine").unionByName(
        pairs_r.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "cosine",
        )
    ).filter(F.col("id_a") < 20)
    w_ex = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b")
    )
    exact_r = (
        sym.withColumn("rnk", F.row_number().over(w_ex).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("id_a", "id_b", "rnk")
        .persist()
    )
    # rrf leg (r12): hybrid fusion of the exact thresholded ranking
    # with the mrl serve tier — O(queries·k) integer arithmetic over
    # rankings already computed in this slot, zero extra corpus scans
    rrf = rrf_fuse(
        [("exact", exact_r), ("mrl", mrl_r)],
        query_col="id_a", doc_col="id_b", rank_col="rnk",
    ).select(
        F.lit("rrf").alias("method"),
        F.col("query_id").alias("id_a"),
        F.col("doc_id").alias("id_b"),
        F.col("rrf_score").alias("cosine"),
        F.col("rank").alias("rnk"),
    )
    # recall leg (r12): the mrl tier scored against the exact
    # thresholded ranking — TRUE per-query recall (id_b=hits,
    # rnk=truth_n, cosine=recall); queries with no ≥0.4 neighbor have
    # no truth rows and are absent by contract
    rec = recall_at_k(
        mrl_r, exact_r, query_col="id_a", doc_col="id_b"
    ).select(
        F.lit("recall").alias("method"),
        F.col("query_id").alias("id_a"),
        F.col("hits").alias("id_b"),
        F.col("recall").alias("cosine"),
        F.col("truth_n").cast("int").alias("rnk"),
    )
    # prec leg (r13): the eval triple's third member — precision@k of
    # the same mrl tier against the same exact truth, the denominator
    # conventions TRANSPOSED (every query the tier SERVED gets a row;
    # truth queries it never served live in the recall leg) — so the
    # oracle is the recall CTE with served/truth sides swapped, and a
    # convention mix-up in either operator breaks the hash match
    prc = precision_at_k(
        mrl_r, exact_r, query_col="id_a", doc_col="id_b"
    ).select(
        F.lit("prec").alias("method"),
        F.col("query_id").alias("id_a"),
        F.col("hits").alias("id_b"),
        F.col("precision").alias("cosine"),
        F.col("served_n").cast("int").alias("rnk"),
    )
    # semdedup leg: the full SemDeDup composition in exact mode over
    # the SAME persisted base (vec_col='vdbl' passthrough)
    sd = semantic_dedup(
        base, num_centroids=_SD_CENTS, probes=_SD_PROBES,
        threshold=_SD_MIN, keep="farthest", vec_col="vdbl", exact=True,
    ).select(
        F.lit("semdedup").alias("method"),
        F.col("vec_id").alias("id_a"),
        F.col("cluster_id").alias("id_b"),
        F.col("centroid_cosine").alias("cosine"),
        F.col("is_duplicate").cast("int").alias("rnk"),
    )
    return (
        pairs.unionByName(dec)
        .unionByName(mrl)
        .unionByName(sd)
        .unionByName(rrf)
        .unionByName(rec)
        .unionByName(prc)
    )


# (sim_lsh_buckets was folded into the ANN suite: every bucket bit feeds
# the band keys whose collisions produce the ANN pairs, and the oracle
# recomputes the identical md5-derived planes — a bucket error would
# change the candidate set and break the hash match. The bucket
# assignment itself stays covered by tests/test_dedup_similarity.py.)
