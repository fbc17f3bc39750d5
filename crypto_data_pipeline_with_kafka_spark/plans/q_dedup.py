"""Deduplication queries over ``documents``: exact, n-gram Jaccard,
MinHash+LSH, SimHash — each VALUE-checked against a DuckDB oracle
(md5-based hashing is identical across engines, so even the LSH
candidate generation is oracle-exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
    chunk_level_dedup,
    connected_components,
    decontaminate,
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_dedup,
    select_cluster_survivors,
    shingle_rows,
    simhash_bits,
    simhash_pairs,
    tokenized_docs,
)
from crypto_data_pipeline_with_kafka_spark.plans.registry import register

# Shared DuckDB CTEs ------------------------------------------------------

_SH_CTE = """
toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, len(ws) - 1)])) AS shingle
  FROM toks WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
"""

_MINHASH_N = 12
_MINHASH_BANDS = 4

_SIG_COLS = ",\n         ".join(
    f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(_MINHASH_N)
)
_BAND_SELECTS = "\n  UNION ALL ".join(
    f"SELECT doc_id, '{b}' AS band_id, h{b * 3} || h{b * 3 + 1} || h{b * 3 + 2} AS band_key FROM sig"
    for b in range(_MINHASH_BANDS)
)


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: content-hash groupBy with canonical (min) id — the "
    "distributed form of the reference's INSERT IGNORE / URL-check "
    "(consumer_prices.py:70-80); map-side combine keeps the shuffle at "
    "one row per distinct hash",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


# Doc-frequency cap for the registered (scale-path) n-gram query: drop
# postings for shingles appearing in more than this many documents
# before pairing. Stop-shingles dominate the candidate count
# quadratically while contributing ~no Jaccard evidence; union sizes
# still count them, so jaccard only UNDER-estimates (found pairs are
# true pairs). The uncapped exact path (max_doc_freq=None) stays
# available and is asserted equal to the capped one on the fixtures in
# tests/test_dedup_similarity.py.
_NGRAM_MAX_DF = 50

# Aligned chunk length for the 'chunk' (sub-document dedup) leg.
_CHUNK_WORDS = 8

# CDC parameters for the 'cdc' leg — MUST match chunk_level_dedup's
# boundaries="content" defaults (operators/dedup.py): boundary after
# token b iff the 52-bit md5 fraction of the _CDC_W-gram ending at b
# ≡ 0 (mod _CDC_DIV); greedy ≥ _CDC_MIN fold; post-split at _CDC_MAX.
_CDC_W = 4
_CDC_DIV = 8
_CDC_MIN = 4
_CDC_MAX = 32

_CAPPED_JACCARD_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, len(ws) - 1)])) AS shingle
  FROM toks WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {_NGRAM_MAX_DF}),
postings AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
bsh AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0),
bsizes AS (SELECT bench_id, count(*) AS n_bench FROM bsh GROUP BY bench_id),
hits AS (
  SELECT c.doc_id, b.bench_id, count(*) AS overlap
  FROM sh c JOIN bsh b USING (shingle)
  GROUP BY 1, 2
),
dec AS (
  SELECT doc_id, bench_id,
         CAST(overlap AS DOUBLE) / n_bench AS containment
  FROM hits JOIN bsizes USING (bench_id)
),
cbase AS (
  SELECT doc_id, ws, CAST(ceil(len(ws) / {_CHUNK_WORDS}.0) AS BIGINT) AS n_total
  FROM toks WHERE ws IS NOT NULL
),
cidx AS (
  SELECT doc_id, ws, n_total, unnest(range(0, n_total)) AS chunk_idx FROM cbase
),
cchunks AS (
  SELECT doc_id, n_total, chunk_idx,
         array_to_string(
           ws[(chunk_idx * {_CHUNK_WORDS} + 1):((chunk_idx + 1) * {_CHUNK_WORDS})],
           ' ') AS chunk
  FROM cidx
),
cfreq AS (
  SELECT md5(chunk) AS ch, count(DISTINCT doc_id) AS nd
  FROM cchunks GROUP BY md5(chunk)
),
creass AS (
  SELECT doc_id,
         string_agg(c.chunk, ' ' ORDER BY c.chunk_idx) AS clean_text,
         count(*) AS n_kept,
         any_value(c.n_total) AS n_total
  FROM cchunks c JOIN cfreq f ON md5(c.chunk) = f.ch
  WHERE f.nd < 2
  GROUP BY doc_id
),
cdcb AS (
  -- content-defined boundaries: candidates (interior positions whose
  -- window-gram hash ≡ 0 mod divisor) folded greedily left-to-right,
  -- keeping those ≥ min_words past the previous accepted boundary.
  -- list_reduce quirk (DuckDB 1.0): CASE WHEN <acc ref> THEN
  -- list_concat(acc,x) ELSE acc END mis-folds — concat with a
  -- conditionally-empty list instead. Seed [0] = start-of-doc.
  SELECT doc_id, ws, len(ws) AS n,
         list_reduce(
           list_prepend([0],
             [[b] for b in range({_CDC_W}, len(ws) + 1)
                  if b < len(ws)
                  AND CAST(('0x' || substr(md5(
                        array_to_string(ws[(b - {_CDC_W} + 1):b], ' ')
                      ), 1, 13)) AS BIGINT) % {_CDC_DIV} = 0]
           ),
           (acc, x) -> list_concat(acc,
             CASE WHEN x[1] - acc[-1] >= {_CDC_MIN} THEN x ELSE [] END)
         ) AS accb
  FROM toks WHERE ws IS NOT NULL
),
cdcseg AS (
  SELECT doc_id, ws, list_append(accb, n) AS allb,
         unnest(range(1, len(accb) + 1)) AS j
  FROM cdcb
),
cdcpieces AS (
  SELECT doc_id, ws, j, allb[j] AS s, allb[j + 1] AS e,
         unnest(range(0, CAST(ceil((allb[j + 1] - allb[j]) / {_CDC_MAX}.0)
                              AS BIGINT))) AS p
  FROM cdcseg
),
cdcchunks AS (
  SELECT doc_id,
         array_to_string(
           ws[(s + p * {_CDC_MAX} + 1):least(s + (p + 1) * {_CDC_MAX}, e)],
           ' ') AS chunk,
         row_number() OVER (PARTITION BY doc_id ORDER BY j, p) - 1
           AS chunk_idx,
         count(*) OVER (PARTITION BY doc_id) AS n_total
  FROM cdcpieces
),
cdcfreq AS (
  SELECT md5(chunk) AS ch, count(DISTINCT doc_id) AS nd
  FROM cdcchunks GROUP BY md5(chunk)
),
cdcreass AS (
  SELECT doc_id,
         string_agg(c.chunk, ' ' ORDER BY c.chunk_idx) AS clean_text,
         count(*) AS n_kept,
         any_value(c.n_total) AS n_total
  FROM cdcchunks c JOIN cdcfreq f ON md5(c.chunk) = f.ch
  WHERE f.nd < 2
  GROUP BY doc_id
)
SELECT 'pairs' AS method, id_a, id_b, jaccard AS score
FROM jac WHERE jaccard >= 0.8
UNION ALL
SELECT 'decontam' AS method, doc_id AS id_a, bench_id AS id_b,
       containment AS score
FROM dec WHERE containment >= 0.5
UNION ALL
SELECT 'chunk' AS method, doc_id AS id_a,
       CAST(('0x' || substr(md5(clean_text), 1, 13)) AS BIGINT) AS id_b,
       CAST(n_kept AS DOUBLE) / n_total AS score
FROM creass
UNION ALL
SELECT 'cdc' AS method, doc_id AS id_a,
       CAST(('0x' || substr(md5(clean_text), 1, 13)) AS BIGINT) AS id_b,
       CAST(n_kept AS DOUBLE) / n_total AS score
FROM cdcreass
"""


@register(
    "dedup_ngram_jaccard",
    _CAPPED_JACCARD_SQL,
    doc="Shingle-overlap suite, tagged union: 'pairs' = n-gram (3-word "
    "shingle) Jaccard near-dup pairs via inverted-index self-join with "
    f"the doc-frequency cap (max_doc_freq={_NGRAM_MAX_DF}) — the 100-TB "
    "path: stop-shingle postings are dropped before pairing so the join "
    "is bounded by rare-shingle collisions, never the corpus square "
    "(the oracle applies the identical cap, so this is value-exact); "
    "'decontam' = benchmark decontamination of the full corpus against "
    "the deterministic doc_id%97==0 eval slice (the corpus CONTAINS the "
    "eval items, as a real crawl does — verbatim copies must flag at "
    "exactly 1.0) — directional k-gram containment (normalized by the "
    "BENCHMARK side, so a whole eval item embedded in a long document "
    "scores 1.0), eval shingles broadcast, flagged at containment ≥ 0.5; "
    "'chunk' (r5) = SUB-document dedup, CCNet/RefinedWeb line-style "
    f"(operators.dedup.chunk_level_dedup): aligned {_CHUNK_WORDS}-word "
    "chunks shared across >= 2 docs are dropped and each doc's surviving "
    "text reassembled in order — the boilerplate remover document-level "
    "dedup cannot express. Leg encoding into the shared schema: id_a = "
    "doc, id_b = 52-bit md5 prefix of the reassembled clean_text (so the "
    "ORDER of surviving chunks is value-checked), score = kept/total "
    "chunk ratio; the rich (clean_text, n_kept, n_total) frame is "
    "pinned directly by the planted-corpus pytest; 'cdc' (r9) = the SAME "
    "sub-document dedup under CONTENT-DEFINED boundaries (LBFS/CDC: "
    f"boundary after token b iff the 52-bit md5 fraction of the {_CDC_W}-"
    f"gram ending at b ≡ 0 mod {_CDC_DIV}, greedy ≥ {_CDC_MIN}-word fold, "
    f"post-split at {_CDC_MAX}) — boundaries anchor to content so an "
    "inserted leading word re-chunks only its own neighborhood and the "
    "shared tail still dedups; the oracle replicates the greedy fold "
    "with DuckDB list_reduce (same md5 bit-rule, so value-exact), same "
    "leg encoding as 'chunk'",
    tags=("dedup",),
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, caches: list | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize pass serves every leg (r10): shingles for
    # pairs/decontam, and both chunk-boundary disciplines — un-shared,
    # the 'chunk' and 'cdc' legs each re-scanned and re-tokenized the
    # corpus (the r9 verdict's slot-headroom finding). Cache lifecycle
    # (r11): pass ``caches`` (a list) to receive every persisted handle
    # this plan creates (toked here, the shingle relation inside
    # jaccard_pairs, the chunk stages) for explicit unpersist — the
    # bench loop instead relies on its documented clearCache() between
    # slots; a long-lived session calling the registered plan directly
    # should use the out-param or clear the catalog itself.
    toked = tokenized_docs(docs).persist()
    if caches is not None:
        caches.append(toked)
    sh = shingle_rows(docs, toks=toked)
    pairs = jaccard_pairs(
        sh, min_jaccard=0.8, max_doc_freq=_NGRAM_MAX_DF, caches=caches
    ).select(
        F.lit("pairs").alias("method"),
        "id_a",
        "id_b",
        F.col("jaccard").alias("score"),
    )
    # the decontam leg reuses the pairs leg's shingle relation
    # (jaccard_pairs persists it) — the corpus is tokenized ONCE; the
    # benchmark side is the %97 slice OF THE SAME CORPUS, so its
    # shingles are a filter over the persisted relation too (r15:
    # shingling is per-row, so filter-then-shingle ≡
    # shingle-then-filter — the re-derive cost two more corpus scans)
    dec = decontaminate(
        docs,
        docs.filter(F.col("doc_id") % 97 == 0),
        k=3,
        min_containment=0.5,
        corpus_shingles=sh,
        benchmark_shingles=sh.filter(F.col("doc_id") % 97 == 0),
    ).select(
        F.lit("decontam").alias("method"),
        F.col("doc_id").alias("id_a"),
        F.col("bench_id").alias("id_b"),
        F.col("containment").alias("score"),
    )
    chunk = chunk_level_dedup(
        docs, words_per_chunk=_CHUNK_WORDS, toks=toked, caches=caches
    ).select(
        F.lit("chunk").alias("method"),
        F.col("doc_id").alias("id_a"),
        F.conv(F.substring(F.md5("clean_text"), 1, 13), 16, 10)
        .cast("long")
        .alias("id_b"),
        (F.col("n_kept").cast("double") / F.col("n_total")).alias("score"),
    )
    # 'cdc' (r9): the content-defined boundary discipline of the SAME
    # operator, driver-attested — edit-shifted boilerplate still dedups
    # because boundaries anchor to content, not offsets.
    cdc = chunk_level_dedup(
        docs,
        boundaries="content",
        cdc_window=_CDC_W,
        cdc_divisor=_CDC_DIV,
        cdc_min_words=_CDC_MIN,
        cdc_max_words=_CDC_MAX,
        toks=toked,
        caches=caches,
    ).select(
        F.lit("cdc").alias("method"),
        F.col("doc_id").alias("id_a"),
        F.conv(F.substring(F.md5("clean_text"), 1, 13), 16, 10)
        .cast("long")
        .alias("id_b"),
        (F.col("n_kept").cast("double") / F.col("n_total")).alias("score"),
    )
    return pairs.unionByName(dec).unionByName(chunk).unionByName(cdc)


@register(
    "dedup_minhash_lsh",
    f"""
    WITH RECURSIVE {_SH_CTE},
    sig AS (
      SELECT doc_id,
         {_SIG_COLS}
      FROM sh GROUP BY doc_id
    ),
    bandl AS (
      {_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandl a
      JOIN bandl b ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    dup_pairs AS (
      SELECT c.id_a, c.id_b, j.jaccard
      FROM cand c JOIN jac j USING (id_a, id_b)
      WHERE j.jaccard >= 0.8
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM dup_pairs
    ),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, min(lab) AS lab FROM reach GROUP BY id),
    surv AS (
      SELECT c.lab AS id_a, c.id AS id_b,
             CAST(length(trim(d.text)) AS DOUBLE) AS quality,
             row_number() OVER (PARTITION BY c.lab
                                ORDER BY length(trim(d.text)) DESC, c.id) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.id
    )
    SELECT 'pair' AS part, id_a, id_b, jaccard AS score FROM dup_pairs
    UNION ALL
    SELECT 'cluster' AS part, id AS id_a, lab AS id_b,
           CAST(NULL AS DOUBLE) AS score
    FROM comp
    UNION ALL
    SELECT 'survivor' AS part, id_a, id_b, quality AS score
    FROM surv WHERE rn = 1
    """,
    doc="MinHash(12)+LSH(4 bands × 3) near-dup dedup, tagged union: "
    "'pair' = shingle → signature (min of md5('i|'||shingle) — "
    "lexicographic min of fixed-width hex) → band-bucket join for "
    "candidates → exact-Jaccard verify on candidates only (cost bounded "
    "by collisions, not corpus²); 'cluster' = duplicate-cluster "
    "resolution over those pairs — connected components via min-label "
    "propagation with pointer jumping (O(log diameter) rounds, one "
    "(id,label) row per node of state), id_b = the component-min "
    "canonical doc every member should dedup to; 'survivor' = quality-"
    "weighted keep-best selection per cluster (select_cluster_survivors "
    "— longest member wins, ties to lowest id; one window exchange on "
    "cluster id), the RefinedWeb/FineWeb keep-best policy as a "
    "first-class operator. The oracle recomputes "
    "components with a recursive CTE, so the iterative DataFrame loop "
    "is value-checked end to end. (The INCREMENTAL twin — arriving "
    "batches vs a persisted band/shingle index — is driver-attested "
    "through the real streaming engine in stream_dedup_distinct's "
    "'incr' leg.)",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs,
        num_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        min_jaccard=0.8,
    ).persist()
    # clusters backs BOTH the 'cluster' and 'survivor' legs; its labels
    # are localCheckpoint leaves, so the reuse re-reads materialized
    # blocks — the component loop never runs twice.
    clusters = connected_components(pairs)
    survivors = select_cluster_survivors(docs, clusters)
    return (
        pairs.select(
            F.lit("pair").alias("part"),
            "id_a",
            "id_b",
            F.col("jaccard").alias("score"),
        )
        .unionByName(
            clusters.select(
                F.lit("cluster").alias("part"),
                F.col("doc_id").alias("id_a"),
                F.col("canonical_id").alias("id_b"),
                F.lit(None).cast("double").alias("score"),
            )
        )
        .unionByName(
            survivors.select(
                F.lit("survivor").alias("part"),
                F.col("cluster_id").alias("id_a"),
                F.col("survivor_id").alias("id_b"),
                F.col("quality").alias("score"),
            )
        )
    )


@register(
    "dedup_simhash",
    """
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    wc AS (
      SELECT doc_id, w, count(*) AS cnt, substr(md5(w), 1, 16) AS h
      FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
      GROUP BY doc_id, w
    ),
    dims AS (
      SELECT doc_id, j,
             sum(cnt * (2 * ((instr('0123456789abcdef', substr(h, (j // 4) + 1, 1)) - 1)
                             >> (3 - (j % 4)) & 1) - 1)) AS s
      FROM wc, range(0, 64) t(j)
      GROUP BY doc_id, j
    ),
    per_doc AS (
      SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
      FROM dims GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, simhash, c, substr(simhash, 1 + 16 * CAST(c AS INT), 16) AS key
      FROM per_doc, range(0, 4) t(c)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM chunks a JOIN chunks b
        ON a.c = b.c AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT id_a, id_b,
             len([i for i in range(1, 65) if substr(sh_a, CAST(i AS INT), 1) <> substr(sh_b, CAST(i AS INT), 1)]) AS hamming
      FROM cand
    )
    SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
    FROM ham WHERE hamming <= 6
    """,
    doc="SimHash near-dup pairs: 64-bit count-weighted simhash from "
    "md5 word hashes, 4×16-bit chunk blocking for candidates, hamming ≤ 6 "
    "verify — all built-ins, oracle-exact",
    tags=("dedup", "simhash"),
)
def dedup_simhash(
    spark: SparkSession, sf_dir: str, caches: list | None = None
) -> DataFrame:
    # cache lifecycle (r16, the dedup_ngram_jaccard convention): pass
    # ``caches`` to receive every persisted handle this plan creates
    # (simhash_bits' word-count relation, simhash_pairs' signature
    # relation) for explicit unpersist after the consuming action — a
    # long-lived session calling the registered plan directly would
    # otherwise accumulate two pinned relations per call; the bench
    # instead relies on its documented clearCache() between samples.
    sims = simhash_bits(load_table(spark, sf_dir, "documents"), caches=caches)
    return simhash_pairs(sims, max_hamming=6, caches=caches)


# (dedup_minhash_signature was folded into dedup_minhash_lsh: the LSH
# query's candidate set is a function of the signatures, and its
# md5-exact oracle CTE recomputes them — a signature error would flip
# band keys and break the hash match. tests/test_dedup_similarity.py
# still value-checks minhash_signatures directly.)
