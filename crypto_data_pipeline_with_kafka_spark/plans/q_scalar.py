"""Scalar function queries (SURVEY §2.8 F1-F12): JSON, date/time,
string, regex, arithmetic — the in-flight message-shaping functions of
the reference's producers/consumers, expressed as JVM-side built-ins
(never row-at-a-time Python).

Registry note (round 2): functions sharing a table are folded into
composite checked queries (one driver CORRECTNESS row each) — e.g.
``fn_scalar_suite`` carries the arithmetic, coalesce/default and
literal-tag surfaces in one plan. Every individual built-in is still
exercised; only the checking granularity changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
    ndcg_at_k,
    rrf_fuse,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
    brute_force_topk,
)
from crypto_data_pipeline_with_kafka_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "fn_json_roundtrip",
    """
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type)) AS payload,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_variant,
           event_type AS vt_type
    FROM events
    """,
    doc="F1+F2 in one checked plan: JSON serialize — the producers' "
    "json.dumps (producer_prices.py:13), engine: to_json(struct(...)) "
    "for Kafka value columns (S3 shape) — and JSON deserialize twice "
    "over: the consumers' json.loads (consumer_prices.py:51) as "
    "get_json_object on the in-flight payload column, AND (r5) the "
    "Spark-4-native VARIANT path — parse_json once, typed "
    "try_variant_get extraction — which at scale parses each JSON "
    "document ONCE into a binary columnar encoding instead of "
    "re-parsing per get_json_object call. Both extractions are "
    "value-checked against DuckDB's independent JSON reader "
    "(k_variant) and against the pre-serialization column itself "
    "(vt_type: serialize → parse_json → variant_get must be the "
    "identity)",
    tags=("json",),
)
def fn_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = F.to_json(F.struct("event_id", "event_type"))
    return _t(spark, sf_dir, "events").select(
        "event_id",
        payload.alias("payload"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k_variant"),
        F.try_variant_get(F.parse_json(payload), "$.event_type", "string").alias(
            "vt_type"
        ),
    )


@register(
    "fn_time_roundtrip",
    """
    WITH s AS (
      SELECT o_orderkey, o_orderdate,
             strftime(o_orderdate, '%d %b %Y %H:%M:%S') || ' +0000' AS rfc
      FROM orders
    )
    SELECT 'ev' AS part, event_id AS id,
           epoch_ms(ts) AS ts_ms,
           make_timestamp(epoch_ms(ts) * 1000) AS ts_from_ms,
           CAST(ts AS VARCHAR) AS iso_str,
           CAST(CAST(ts AS VARCHAR) AS TIMESTAMP) AS parsed,
           CAST(NULL AS INTEGER) AS yr, CAST(NULL AS INTEGER) AS mo,
           CAST(NULL AS INTEGER) AS dy,
           CAST(NULL AS TIMESTAMP) AS month_start,
           CAST(NULL AS VARCHAR) AS rfc,
           CAST(NULL AS TIMESTAMP) AS parsed_rfc
    FROM events
    UNION ALL
    SELECT 'ord' AS part, o_orderkey AS id,
           CAST(NULL AS BIGINT) AS ts_ms,
           CAST(NULL AS TIMESTAMP) AS ts_from_ms,
           CAST(NULL AS VARCHAR) AS iso_str,
           CAST(NULL AS TIMESTAMP) AS parsed,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dy,
           date_trunc('month', o_orderdate) AS month_start,
           rfc,
           strptime(rfc, '%d %b %Y %H:%M:%S %z')::TIMESTAMP AS parsed_rfc
    FROM s
    """,
    doc="F3+F4+F5 plus date-part extraction in one checked plan, tagged "
    "and unioned (registry fold — frees a slot for the stream-stream "
    "join). 'ev' leg: epoch-ms ↔ timestamp — the consumer's "
    "datetime.fromtimestamp(ms/1000) (consumer_prices.py:76-78) with "
    "UTC pinned instead of local-TZ — and the ISO-8601 string round "
    "trip (the producer's datetime.now().isoformat(), "
    "producer_prices.py:58). 'ord' leg: year/month/day extraction + "
    "month truncation (engine-side rollup keys for the reference's "
    "Grafana time axes) and the F4 RFC-822-style date format/parse "
    "round trip (the news pubDate parse, producer_news.py:61; Spark ≥3 "
    "refuses day-NAME parsing, so the engine strips the 'Mon, ' prefix "
    "— see sources/kafka_messages.py — and this leg checks the "
    "remainder)",
    tags=("time", "string"),
)
def fn_time_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.lit("ev").alias("part"),
        F.col("event_id").alias("id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_from_ms"),
        F.col("ts").cast("string").alias("iso_str"),
        F.to_timestamp(F.col("ts").cast("string")).alias("parsed"),
        F.lit(None).cast("int").alias("yr"),
        F.lit(None).cast("int").alias("mo"),
        F.lit(None).cast("int").alias("dy"),
        F.lit(None).cast("timestamp").alias("month_start"),
        F.lit(None).cast("string").alias("rfc"),
        F.lit(None).cast("timestamp").alias("parsed_rfc"),
    )
    rfc = F.concat(
        F.date_format("o_orderdate", "dd MMM yyyy HH:mm:ss"), F.lit(" +0000")
    )
    ords = _t(spark, sf_dir, "orders").select(
        F.lit("ord").alias("part"),
        F.col("o_orderkey").alias("id"),
        F.lit(None).cast("long").alias("ts_ms"),
        F.lit(None).cast("timestamp").alias("ts_from_ms"),
        F.lit(None).cast("string").alias("iso_str"),
        F.lit(None).cast("timestamp").alias("parsed"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        rfc.alias("rfc"),
        F.to_timestamp(rfc, "dd MMM yyyy HH:mm:ss Z").alias("parsed_rfc"),
    )
    return ev.unionByName(ords)


@register(
    "fn_string_suite",
    r"""
    WITH planted AS (
      SELECT doc_id, text, lang, source,
             CASE WHEN doc_id % 13 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com via https://ex.example.com/p/'
                    || CAST(doc_id AS VARCHAR)
                    || ' tel +1 (555) 010-' || CAST(doc_id % 10000 AS VARCHAR)
             ELSE text END AS ptext
      FROM documents
    )
    SELECT doc_id,
           trim(text) AS trimmed,
           upper(source) AS source_uc,
           concat_ws('-', lang, source) AS lang_source,
           CAST(length(text) AS BIGINT) AS text_len,
           substring(text, 1, 10) AS prefix10,
           nullif(regexp_extract(text, 'the ([a-z]+)', 1), '') AS word_after_the,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS novowel_len,
           CAST(len(regexp_extract_all(ptext, 'https?://[^\s]+')) AS BIGINT) AS n_url,
           CAST(len(regexp_extract_all(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(ptext, '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(ptext,
                 'https?://[^\s]+', '[PII]', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
                 '\+?[0-9][0-9()\- ]{6,}[0-9]', '[PII]', 'g')) AS redacted_hash,
           regexp_replace(regexp_replace(text, '[<>&]', '', 'g'),
                 '^\s+|\s+$', '', 'g') || ' tail & end' AS html_paragraphs
    FROM planted
    """,
    doc="F6/F7/F8 in one checked plan: trim / case / concat_ws "
    "key-building (the producer's f-string Kafka key, "
    "producer_prices.py:63), length / substring, regexp_extract / "
    "regexp_replace (the RSS validators & strip-tags approximation, "
    "producer_news.py:29-36; UD2's extraction shape); nullif('') "
    "normalizes no-match between engines. PII leg (training-data "
    "scrubbing): the synthetic corpus is PII-free, so every 13th doc "
    "gets a deterministic planted email + URL + phone built from its "
    "id IN THE QUERY on both engines; per-kind counts (pii_counts) and "
    "the md5 of the redacted text (redact_pii — URL rule first, so "
    "userinfo inside a URL is consumed whole) are then value-checked. "
    "The ipv4 pattern needs lookarounds DuckDB's RE2 cannot compile — "
    "it stays pytest-attested (tests/test_dedup_similarity.py). "
    "HTML leg (UD2, producer_news.py:68-70): article HTML is synthesized "
    "from the sanitized doc text IN THE QUERY (wrapped in <p>, plus a "
    "script block and an entity-bearing second paragraph), run through "
    "html_paragraph_text Spark-side, and value-checked against the "
    "oracle's INDEPENDENT analytic derivation of the expected text — "
    "a stronger check than re-running the same regex chain (RE2 lacks "
    "the backreference the script-strip uses; BeautifulSoup semantics "
    "are pinned per-construct in test_html_paragraph_text_*)",
    tags=("string", "regex", "pii"),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        html_paragraph_text,
        pii_counts,
        redact_pii,
    )

    _RE2_KINDS = ("url", "email", "phone")
    planted = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com via https://ex.example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" tel +1 (555) 010-"),
            (F.col("doc_id") % 10000).cast("string"),
        ),
    ).otherwise(F.col("text"))
    counts = pii_counts(planted, kinds=_RE2_KINDS)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim("text").alias("trimmed"),
        F.upper("source").alias("source_uc"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
        F.length("text").cast("long").alias("text_len"),
        F.substring("text", 1, 10).alias("prefix10"),
        F.nullif(F.regexp_extract("text", r"the ([a-z]+)", 1), F.lit("")).alias(
            "word_after_the"
        ),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).cast("long").alias(
            "novowel_len"
        ),
        counts["url"].alias("n_url"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        F.md5(redact_pii(planted, kinds=_RE2_KINDS)).alias("redacted_hash"),
        html_paragraph_text(
            F.concat(
                F.lit("<div><p> "),
                F.regexp_replace("text", r"[<>&]", ""),
                F.lit(
                    " </p><script>var a='<p>no</p>';</script>"
                    "<p>tail &amp; end</p></div>"
                ),
            )
        ).alias("html_paragraphs"),
    )


@register(
    "fn_scalar_suite",
    """
    SELECT event_id,
           value * 2 - 1 AS scaled,
           value / (value + 1) AS ratio,
           abs(value - 100) AS dist100,
           CAST(floor(value) AS BIGINT) AS flr,
           CAST(ceil(value) AS BIGINT) AS cl,
           greatest(value, 100.0) AS g, least(value, 100.0) AS l,
           coalesce(json_extract_string(props, '$.missing'), '1h') AS with_default,
           coalesce(nullif(event_type, 'error'), 'unknown') AS type_or_unknown,
           'SMA' AS tag_name, 14 AS window_len
    FROM events
    """,
    doc="F9+F10+F11 in one checked plan: column arithmetic/comparison "
    "surface (spark_job_1.py:32-45 — identical IEEE expression trees in "
    "both engines), coalesce/default fallbacks (the consumer's "
    "data.get('interval','1h'), consumer_prices.py:63), and literal tag "
    "columns (the reference's F.lit('SMA') branch tags, spark_job_1.py:29)",
    tags=("scalar",),
)
def fn_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("value")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        (v * 2 - 1).alias("scaled"),
        (v / (v + 1)).alias("ratio"),
        F.abs(v - 100).alias("dist100"),
        F.floor(v).cast("long").alias("flr"),
        F.ceil(v).cast("long").alias("cl"),
        F.greatest(v, F.lit(100.0)).alias("g"),
        F.least(v, F.lit(100.0)).alias("l"),
        F.coalesce(F.get_json_object("props", "$.missing"), F.lit("1h")).alias(
            "with_default"
        ),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown")).alias(
            "type_or_unknown"
        ),
        F.lit("SMA").alias("tag_name"),
        F.lit(14).alias("window_len"),
    )


@register(
    "udtf_explode_tokens",
    """
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    q AS (SELECT doc_id AS query_id, ws[1:4] AS qws FROM toks WHERE doc_id < 3),
    qterms AS (SELECT DISTINCT query_id, unnest(list_distinct(qws)) AS term FROM q),
    stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM toks),
    ctoks AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM toks),
    post AS (
      SELECT c.doc_id, c.term, count(*) AS tf, min(c.dl) AS dl
      FROM ctoks c WHERE c.term IN (SELECT term FROM qterms)
      GROUP BY c.doc_id, c.term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
    idf AS (
      SELECT term, ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf, s.avgdl
      FROM dfreq, stats s
    ),
    contrib AS (
      SELECT qt.query_id, p.doc_id,
             CAST(round(i.idf * (p.tf * 2.2)
                        / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / i.avgdl))
                        * 1e6) AS BIGINT) AS c_micro
      FROM post p JOIN idf i USING (term) JOIN qterms qt USING (term)
    ),
    scoredq AS (
      SELECT query_id, doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro
      FROM contrib GROUP BY 1, 2
    ),
    rankedq AS (
      SELECT query_id, doc_id, score_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id) AS rnk
      FROM scoredq
    ),
    hcomp AS (
      SELECT vec_id, CAST(i AS INT) AS pos2,
             CAST(trunc(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1e12)
                  AS DECIMAL(19,0)) AS v
      FROM embeddings, range(1, 65) t(i)
    ),
    hnrm AS (
      SELECT vec_id, CAST(CAST(sum(v * v) AS VARCHAR) AS DOUBLE) AS norm_sq
      FROM hcomp GROUP BY vec_id
    ),
    hdots AS (
      SELECT qa.vec_id AS query_id, qb.vec_id AS doc_id,
             CAST(CAST(sum(qa.v * qb.v) AS VARCHAR) AS DOUBLE) AS dot
      FROM hcomp qa
      JOIN hcomp qb ON qa.pos2 = qb.pos2 AND qa.vec_id <> qb.vec_id
      WHERE qa.vec_id < 3
      GROUP BY 1, 2
    ),
    hden AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) DESC,
                          doc_id) AS rnk
        FROM hdots
        JOIN hnrm na ON na.vec_id = query_id
        JOIN hnrm nb ON nb.vec_id = doc_id
      ) WHERE rnk <= 10
    ),
    hc AS (
      SELECT query_id, doc_id,
             CAST(round(1e9 / (60 + rnk)) AS BIGINT) AS c
      FROM hden
      UNION ALL
      SELECT query_id, doc_id,
             CAST(round(1e9 / (60 + rnk)) AS BIGINT) AS c
      FROM rankedq WHERE rnk <= 10
    ),
    hfused AS (
      SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS nano
      FROM hc GROUP BY 1, 2
    ),
    hrk AS (
      SELECT query_id, doc_id, nano,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY nano DESC, doc_id) AS INT) AS rnk
      FROM hfused
    ),
    hdcg AS (
      SELECT g.query_id,
             CAST(sum(CASE WHEN t.doc_id IS NOT NULL
               THEN round(1e6 / log2(g.rnk + 1.0)) ELSE 0 END) AS BIGINT)
               AS dcg
      FROM hrk g
      LEFT JOIN (SELECT query_id, doc_id FROM rankedq WHERE rnk <= 10) t
        ON t.query_id = g.query_id AND t.doc_id = g.doc_id
      WHERE g.rnk <= 10
      GROUP BY 1
    ),
    hidcg AS (
      SELECT query_id,
             CAST(sum(round(1e6 / log2(rnk + 1.0))) AS BIGINT) AS idcg
      FROM rankedq WHERE rnk <= 10 GROUP BY 1
    )
    SELECT 'tokens' AS part, doc_id,
           CAST(unnest(range(1, len(ws) + 1)) AS INT) AS pos, unnest(ws) AS token,
           CAST(NULL AS BIGINT) AS n
    FROM toks WHERE doc_id < 50
    UNION ALL
    SELECT 'vocab' AS part, CAST(NULL AS BIGINT) AS doc_id,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS pos, token, n
    FROM (
      SELECT token, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(ws) AS token FROM toks)
      GROUP BY token ORDER BY n DESC, token LIMIT 100
    )
    UNION ALL
    SELECT 'bm25' AS part, doc_id, CAST(rnk AS INT) AS pos,
           'q' || CAST(query_id AS VARCHAR) AS token, score_micro AS n
    FROM rankedq WHERE rnk <= 10
    UNION ALL
    SELECT 'hybrid' AS part, doc_id, rnk AS pos,
           'q' || CAST(query_id AS VARCHAR) AS token, nano AS n
    FROM hrk
    UNION ALL
    SELECT 'ndcg' AS part, CAST(NULL AS BIGINT) AS doc_id,
           CAST(i.idcg AS INT) AS pos,
           'q' || CAST(i.query_id AS VARCHAR) AS token,
           coalesce(d.dcg, 0) AS n
    FROM hidcg i LEFT JOIN hdcg d ON d.query_id = i.query_id
    """,
    doc="UD3 tagged union: 'tokens' = UDTF-shaped one-row → N-rows "
    "explode with ordinality (the RSS-feed → <item> rows expansion, "
    "producer_news.py:54-63) — posexplode over a generated array, no "
    "Python; 'vocab' = corpus vocabulary builder (top-100 tokens by "
    "document-collection frequency — the stop-list / BPE-prep / "
    "df-cap-tuning stat): token groupBy with map-side combine → "
    "distributed top-k (TakeOrderedAndProject), then ranks assigned on "
    "the k-bounded result only — never a global sort of the vocabulary; "
    "'bm25' (r5) = Okapi BM25 ranked retrieval (functions/text.py::"
    "bm25_topk) — query terms broadcast and semi-join the exploded "
    "corpus BEFORE aggregation (shuffles are O(query-term postings), "
    "never O(corpus tokens)), per-term contributions quantized to micro "
    "units and summed order-free, top-10 per query with deterministic "
    "tie-break; pos = rank, token = query tag, n = exact integer score; "
    "'hybrid' (r12) = the flagship HYBRID-SEARCH composition end to "
    "end (operators/fusion.py::rrf_fuse, Cormack 2009): the bm25 leg's "
    "lexical ranking fused with a dense exact-cosine top-10 over "
    "embeddings (vec i <-> doc i) for the same three queries — each "
    "tier's rank feeds a nano-quantized 1/(60+rank) integer "
    "contribution, summed order-free; pos = fused rank, n = the exact "
    "nano score; the oracle replays the dense tier in the similarity "
    "module's decimal CTEs and the fusion in integer arithmetic",
    tags=("udtf", "explode", "text", "bm25", "hybrid"),
)
def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        bm25_topk,
        tokens,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(tokens("text")).alias("pos0", "token"))
        .select(
            F.lit("tokens").alias("part"),
            "doc_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            "token",
            F.lit(None).cast("long").alias("n"),
        )
    )
    top = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(100)
    )
    # rank over the k-bounded (≤100-row) relation only
    w = Window.orderBy(F.col("n").desc(), "token")
    vocab = top.select(
        F.lit("vocab").alias("part"),
        F.lit(None).cast("long").alias("doc_id"),
        F.row_number().over(w).cast("int").alias("pos"),
        "token",
        "n",
    )
    # 'bm25' leg: queries = the first 4 tokens of docs 0-2 (derived from
    # the corpus itself so the oracle can re-derive them)
    qsrc = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens("text"), 1, 4)).alias("query_text"),
    )
    # the lexical ranking feeds its own leg AND the hybrid fusion —
    # persist the ~30-row relation so the whole BM25 pipeline runs
    # once per action, not once per consumer
    bm25_r = bm25_topk(docs, qsrc, k=10).persist()
    bm25 = bm25_r.select(
        F.lit("bm25").alias("part"),
        "doc_id",
        F.col("rank").alias("pos"),
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("token"),
        F.col("score_micro").alias("n"),
    )
    # 'hybrid' leg (r12): BM25 ⊕ dense via RRF — the dense tier is the
    # exact-cosine top-10 over embeddings for the same query ids
    # (vec i ↔ doc i), fused on ranks alone (scale-free, no score
    # calibration), nano-integer contributions summed order-free
    emb = _t(spark, sf_dir, "embeddings")
    dense_r = brute_force_topk(emb, query_ids_max=3, k=10).select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("doc_id"),
        F.col("rnk").alias("rank"),
    )
    fused_r = rrf_fuse([("lex", bm25_r), ("dense", dense_r)]).persist()
    hybrid = fused_r.select(
        F.lit("hybrid").alias("part"),
        "doc_id",
        F.col("rank").alias("pos"),
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("token"),
        F.col("rrf_nano").alias("n"),
    )
    # 'ndcg' leg (r12): order-sensitivity of the fusion, per query —
    # NDCG@10 of the fused ranking against the lexical truth; DCG and
    # IDCG ride the slot as exact micro integers (pos/n), so no
    # floating division reaches the checked surface
    nd = ndcg_at_k(
        fused_r, bm25_r.select("query_id", "doc_id"), k=10,
    ).select(
        F.lit("ndcg").alias("part"),
        F.lit(None).cast("long").alias("doc_id"),
        F.col("idcg_micro").cast("int").alias("pos"),
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("token"),
        F.col("dcg_micro").alias("n"),
    )
    return (
        toks.unionByName(vocab)
        .unionByName(bm25)
        .unionByName(hybrid)
        .unionByName(nd)
    )


@register(
    "ingest_price_roundtrip",
    """
    SELECT event_id,
           'SYM' || CAST(user_id AS VARCHAR) AS symbol,
           CASE WHEN event_type = 'purchase' THEN '4h' ELSE '1h' END AS interval,
           CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(20,10)) AS VARCHAR) AS close_price,
           make_timestamp(epoch_ms(ts) * 1000) AS open_time
    FROM events
    """,
    doc="Entry-point-B message path, end to end IN the engine: typed rows "
    "→ JSON Kafka value (to_json, F1/S3) → from_json with the declared "
    "PRICE_SCHEMA (F2/S4) → explicit decimal casts + epoch-ms timestamps "
    "+ interval default (F12/F3/F11). The oracle states the expected "
    "OUTPUT directly, so the whole encode/decode pipeline is what's "
    "being checked",
    tags=("ingest", "json"),
)
def ingest_price_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    msgs = events.select(
        "event_id",
        F.to_json(
            F.struct(
                F.concat(F.lit("SYM"), F.col("user_id").cast("string")).alias("symbol"),
                F.when(F.col("event_type") == "purchase", F.lit("4h")).alias("interval"),
                F.unix_millis("ts").alias("open_time"),
                F.col("value").cast("string").alias("close"),
            )
        ).alias("value"),
    )
    typed_with_id = msgs.select(
        "event_id", F.col("value").alias("v")
    ).select(
        "event_id",
        F.from_json(
            "v",
            "symbol string, interval string, open_time long, close string",
        ).alias("m"),
    )
    return typed_with_id.select(
        "event_id",
        F.col("m.symbol").alias("symbol"),
        F.coalesce(F.col("m.interval"), F.lit("1h")).alias("interval"),
        F.col("m.close").cast("decimal(20,10)").cast("string").alias("close_price"),
        F.timestamp_millis(F.col("m.open_time")).alias("open_time"),
    )


@register(
    "agg_median_manual",
    """
    WITH ranked AS (
      SELECT user_id, value, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           CAST(sum(CAST(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                              THEN value END AS DECIMAL(18,6))) AS DOUBLE)
             / count(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN 1 END)
             AS median_value
    FROM ranked GROUP BY user_id, n
    """,
    doc="Exact median per key via row_number selection (deterministic "
    "tie-break) — the exact twin of percentile_approx (see "
    "agg_approx_sketches); avg of the one or two middle elements from "
    "exact decimal sums",
    tags=("agg", "percentile"),
)
def agg_median_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    mid = (F.col("rn") == lo) | (F.col("rn") == hi)
    picked = F.when(mid, F.col("value"))
    return ranked.groupBy("user_id", "n").agg(
        (
            F.sum(picked.cast("decimal(18,6)")).cast("double")
            / F.count(F.when(mid, F.lit(1)))
        ).alias("median_value")
    )
