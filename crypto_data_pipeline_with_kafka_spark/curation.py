"""End-to-end corpus curation — the extension families composed into
the one call an LLM data engineer actually runs: exact dedup →
quality/repetition gates → near-dup cluster resolution with keep-best
survivors → deterministic splits → (optional) sharded export with a
verification manifest.

This is COMPOSITION, not new semantics: every stage is one of the
individually oracle- or reference-pinned operators (see COVERAGE.md),
so the pipeline's correctness surface is the sum of its parts; the
integration test pins the cross-stage invariants (no exact dup
survives, ≤ 1 survivor per near-dup cluster, stats add up, the export
verifies).

Scale shape: flags are computed as COLUMNS and the stage statistics
come from ONE final aggregation over the flagged frame — the pipeline
adds no count-probe-per-stage driver round-trips beyond the dedup
machinery's own documented syncs. Ordering matters and is the
standard one: exact dedup first (cheapest, biggest win), gates next
(shrink the near-dup input), MinHash clustering last (the expensive
stage sees only survivors of the cheap ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.functions.text import (
    kgrams_from_tokens,
    normalize_text,
    tokens,
)
from crypto_data_pipeline_with_kafka_spark.functions.urls import canonicalize_url
from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
    chunk_level_dedup,
    connected_components,
    decontaminate,
    minhash_lsh_dedup,
    remove_duplicated_spans,
    select_cluster_survivors,
    shingle_rows,
)
from crypto_data_pipeline_with_kafka_spark.operators.sampling import hash_split
from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
    ivf_ann_pairs,
    with_dbl_and_approx_norm,
)


def curate_corpus(
    spark,
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
    normalize: bool = False,
    unicode_form: str | None = "NFC",
    min_words: int = 20,
    min_distinct_ratio: float = 0.2,
    max_top_bigram_frac: float = 0.2,
    max_dup_trigram_frac: float = 0.3,
    quality_model: tuple | None = None,
    min_quality_prob: float = 0.5,
    minhash_jaccard: float = 0.8,
    winnow: bool = False,
    winnow_k: int = 8,
    winnow_window: int = 4,
    winnow_min_shared: int = 2,
    winnow_max_doc_freq: int | None = 8,
    winnow_store_dir: str | None = None,
    winnow_batch_id: int | None = None,
    benchmark: DataFrame | None = None,
    decontam_k: int = 8,
    decontam_min_containment: float = 0.5,
    benchmark_embeddings: DataFrame | None = None,
    semantic_decontam_min_cosine: float = 0.9,
    embeddings: DataFrame | None = None,
    emb_col: str = "embedding",
    embedding_min_cosine: float | None = 0.95,
    images: DataFrame | None = None,
    payload_col: str = "payload",
    image_max_hamming: int = 6,
    image_store_dir: str | None = None,
    image_batch_id: int = 0,
    audio: DataFrame | None = None,
    audio_max_hamming: int = 6,
    audio_store_dir: str | None = None,
    audio_batch_id: int = 0,
    video: DataFrame | None = None,
    video_max_hamming: int = 6,
    video_every_nth: int = 10,
    video_store_dir: str | None = None,
    video_batch_id: int = 0,
    chunk_dedup: bool = False,
    words_per_chunk: int = 8,
    chunk_min_docs: int = 2,
    chunk_boundaries: str = "fixed",
    cdc_window: int = 4,
    cdc_divisor: int = 8,
    cdc_min_words: int = 4,
    cdc_max_words: int = 32,
    exact_substr: bool = False,
    exact_substr_k: int = 5,
    exact_substr_min_count: int = 2,
    split_weights: dict[str, float] | None = None,
    export_path: str | None = None,
    n_shards: int = 8,
) -> tuple[DataFrame, dict]:
    """Run the full curation pipeline; returns ``(curated, stats)``.

    ``curated`` carries the surviving rows plus a ``split`` column;
    ``stats`` reports input size and per-stage drop counts (one
    aggregation pass). With ``export_path``, the curated frame is also
    shard-exported (JSONL) and manifest-pinned
    (:func:`...sources.sinks.write_export_manifest`).

    Optional stages (each off unless its input is supplied), slotted
    by cost so every expensive stage sees only cheaper stages'
    survivors:

    * ``normalize`` — text canonicalization as stage -1
      (:func:`...functions.text.normalize_text`: ``unicode_form``
      (default NFC; None skips the Arrow hop) → lowercase →
      whitespace collapse → trim), REWRITING ``text_col`` before any
      content verdict so case/spacing/composed-form variants hash as
      one document everywhere downstream. A rewrite, not a gate — no
      stats key.
    * ``url_col`` — URL dedup as stage 0 (stats key
      ``url_dups_dropped``): the reference's raw-url existence check
      (``dags/producer_news.py:45,56``; ``dags/consumer_news.py:
      44-47``) generalized to the canonical form
      (:func:`...functions.urls.canonicalize_url` — tracking params
      stripped, remaining params sorted, scheme/host case and port/
      fragment dropped), keep = min id per canonical URL; docs whose
      URL is NULL or unparseable never URL-dedup. The cheapest
      verdict in the pipeline (one window on a derived string), so it
      runs before everything; the exact-dedup window then ranks
      url-keepers first so each content group's survivor is never a
      url-dropped row. Pair with
      :func:`...functions.urls.registrable_domain` as the ``source``
      column of ``resample_to_mixture`` for domain-mixture resampling
      (composition pytest-pinned).
    * ``winnow`` — PARTIAL-overlap dedup
      (:func:`...operators.dedup.winnowing_fingerprints` /
      ``winnowing_pairs``, the MOSS algorithm) right after the MinHash
      stage: docs sharing ≥ ``winnow_min_shared`` selected fingerprints
      cluster and resolve to quality-weighted survivors exactly like
      stage 3 (stats key ``winnow_dropped``). This is the detector for
      a long copied span embedded in otherwise-different documents —
      whole-doc Jaccard dilutes such a span below any workable
      threshold, winnowing GUARANTEES ≥ 1 shared fingerprint for any
      match of ``winnow_window + winnow_k − 1`` tokens. Because the
      verdict here DROPS documents, the defaults lean precise:
      ``winnow_min_shared=2`` (one shared fingerprint = one span —
      real containment shares many) and ``winnow_max_doc_freq=8``
      (boilerplate fingerprints never pair); loosen toward the
      operator defaults to match MOSS's report-everything posture.
      With ``winnow_store_dir`` — which by ITSELF enables the stage
      (a configured cross-run check must never be silently ignored) —
      it runs through the INCREMENTAL winnowing store instead
      (``incremental_winnowing_dedup``): this run's docs are checked
      for copied spans against every document any earlier run indexed,
      the same cross-run shape as the image/audio store gates; flagged
      docs drop (the earlier copy is the survivor by construction).
      ``winnow_batch_id`` is REQUIRED with the store and must not
      decrease across runs (enforced inside the operator against the
      store's newest batch; re-running the latest id is the redelivery
      contract). The store call is the run's one EAGER stage (it
      writes flags + fingerprints immediately, before the returned
      frame is consumed), so a run that fails in any LATER stage has
      already committed this run's fingerprints — re-run it under the
      SAME ``winnow_batch_id``: the redelivery rewrite is idempotent,
      and a fresh id would double-index the same content.
    * ``quality_model`` — model-based quality gate: a trained
      ``(weights, meta)`` pair from
      :func:`...functions.quality_model.train_quality_classifier`;
      cheap-stage survivors whose ``quality_prob`` falls below
      ``min_quality_prob`` drop (stats key ``model_quality_dropped``)
      before any shuffle-heavy stage runs. The CCNet bootstrap shape:
      train the model on heuristic labels (``gopher_rules``) or a
      trusted-corpus-vs-crawl split, then gate the whole corpus on it
      for the cost of one broadcast join.
    * ``benchmark`` — eval-set decontamination
      (:func:`...operators.dedup.decontaminate`): docs whose k-gram
      containment of any benchmark item reaches
      ``decontam_min_containment`` are dropped after the quality gates
      and before near-dup clustering (stats key ``decontam_dropped``).
      The benchmark side broadcasts; the corpus is shingled once.
    * ``benchmark_embeddings`` — SEMANTIC eval-set decontamination
      (:func:`...operators.semantic.semantic_decontaminate`), the
      embedding twin of the k-gram stage for paraphrased/reformatted
      leakage that shares no n-grams: corpus docs (via their
      ``embeddings`` rows — required together) within
      ``semantic_decontam_min_cosine`` of ANY benchmark item's vector
      drop (stats key ``semantic_decontam_dropped``). The benchmark
      relation is keyed by its own item ids under the same
      ``id_col``/``emb_col`` names and broadcasts; docs the caller
      did not embed pass through. NOTE the coupling: this stage needs
      ``embeddings=``, and supplying ``embeddings`` ALSO activates the
      dense near-dup gate below by default — for decontamination-only
      use pass ``embedding_min_cosine=None`` to switch that gate off.
    * ``embeddings`` — a dense near-dup gate over an (id, vector)
      relation keyed by the SAME ``id_col``: IVF-ANN pairs at cosine ≥
      ``embedding_min_cosine`` (``None`` disables this gate — e.g.
      when ``embeddings`` is supplied only to feed semantic
      decontamination) over the MinHash survivors' vectors,
      clustered and resolved to quality-weighted survivors exactly like
      the lexical stage (stats key ``dense_neardup_dropped``). Docs
      without an embedding row pass through — the gate covers what the
      caller embedded.
    * ``images`` — a mixed-modality near-dup gate over an (id, binary
      payload) relation keyed by the SAME ``id_col``: payloads are
      aHash-hashed (``multimodal.perceptual_hash_images``) and paired
      through the chunk-blocked hamming machinery at distance ≤
      ``image_max_hamming``; each cluster keeps its min-id member
      (stats key ``image_neardup_dropped``). With ``image_store_dir``
      the hashes run through the INCREMENTAL hamming store instead
      (``operators.dedup.incremental_hamming_dedup`` at
      ``image_batch_id``) — this run's images are flagged against every
      image any earlier run indexed, the cross-run operational shape.
      Docs without an image row pass through.
    * ``audio`` — the audio twin of the image gate, over the same
      (id, binary payload) shape: payloads are frame-energy-
      fingerprinted (``multimodal.perceptual_hash_audio``) and run
      through the identical hamming machinery (in-batch, or the
      incremental store via ``audio_store_dir``/``audio_batch_id``) at
      distance ≤ ``audio_max_hamming``; each cluster keeps its min-id
      member (stats key ``audio_neardup_dropped``). Docs without an
      audio row pass through.
    * ``video`` — the video twin (``multimodal.perceptual_hash_video``,
      temporal-majority aHash over every ``video_every_nth``-th frame)
      through the identical machinery at distance ≤
      ``video_max_hamming`` (stats key ``video_neardup_dropped``; store
      variant via ``video_store_dir``/``video_batch_id``). Docs without
      a video row pass through.
    * ``chunk_dedup`` — sub-document boilerplate removal
      (:func:`...operators.dedup.chunk_level_dedup`) as the FINAL
      stage: surviving docs' text is rewritten with cross-doc repeated
      chunks removed; docs reduced to nothing drop (stats keys
      ``chunkdedup_docs_dropped`` and the
      ``chunkdedup_chunks_kept``/``chunkdedup_chunks_total`` ratio over
      the surviving docs). Runs last because it REWRITES text — every
      upstream verdict keeps reading the original bytes.
      ``chunk_boundaries="content"`` (r8) switches the chunking to the
      content-defined (CDC) discipline — boundaries anchor to the
      text, so boilerplate is caught even when a leading edit
      misaligns it against the fixed grid (see
      :func:`...operators.dedup.chunk_level_dedup`). In content mode
      ``words_per_chunk`` is NOT the size knob — expected chunk length
      is ``cdc_min_words + cdc_divisor``, bounded by
      ``cdc_max_words``.
    * ``exact_substr`` (r13) — ExactSubstr substring-level dedup
      (:func:`...operators.dedup.remove_duplicated_spans`, Lee et al.
      2022): maximal token runs whose every ``exact_substr_k``-gram
      appears ≥ ``exact_substr_min_count`` times corpus-wide are CUT
      out of the surviving docs' text; docs reduced to nothing drop
      (stats keys ``exactsubstr_docs_dropped`` and the
      ``exactsubstr_tokens_kept``/``exactsubstr_tokens_total``
      ratio). Runs after ``chunk_dedup`` when both are on — each
      stage rewrites text, and span detection re-derives from the
      rewritten bytes. The quantum: duplicated runs shorter than
      ``exact_substr_k`` tokens are invisible (the paper's length
      threshold maps to k)."""
    # validate the LAST stage's mode FIRST: the chunk stage runs after
    # the whole pipeline has materialized (and after the eager winnow
    # store write has committed this run's fingerprints) — a typo'd
    # mode must not cost hours of upstream compute before erroring
    if chunk_boundaries not in ("fixed", "content"):
        raise ValueError(
            "chunk_boundaries must be 'fixed' or 'content', got "
            f"{chunk_boundaries!r}"
        )
    # same fail-fast rule for the other rewrite stage's knobs: stage
    # 4b runs after hours of upstream compute at scale, so a typo'd
    # quantum/floor must error HERE (the operator re-checks, but only
    # when it finally runs)
    if unicode_form is not None and unicode_form not in (
        "NFC", "NFD", "NFKC", "NFKD",
    ):  # same unconditional fail-fast rule as chunk_boundaries
        raise ValueError(
            f"unicode_form must be NFC/NFD/NFKC/NFKD or None, got "
            f"{unicode_form!r}"
        )
    if exact_substr_k < 1:
        raise ValueError(
            f"exact_substr_k must be >= 1, got {exact_substr_k}"
        )
    if exact_substr_min_count < 2:
        raise ValueError(
            "exact_substr_min_count must be >= 2, got "
            f"{exact_substr_min_count}"
        )

    txt, did = F.col(text_col), F.col(id_col)

    # stage -1 (optional): text canonicalization — rewrite the text
    # column through normalize_text (Unicode form -> lowercase ->
    # whitespace collapse -> trim) BEFORE any content verdict, so
    # 'Café' / 'Café' / 'café  ' hash as one document in the
    # exact stage and shingle identically in every dedup stage (the
    # CCNet/RefinedWeb normalize-before-hash discipline). A rewrite,
    # not a gate: no stats key, and every downstream stage (incl. the
    # exported text) sees the normalized form.
    if normalize:
        docs = docs.withColumn(
            text_col, normalize_text(txt, form=unicode_form)
        )

    # stage 0 (optional): URL dedup — the reference's raw-url existence
    # check (dags/producer_news.py:45,56 sent_urls set;
    # dags/consumer_news.py:44-47 SELECT-before-INSERT) generalized to
    # a CANONICAL form (functions/urls.py: tracking params stripped,
    # params sorted, scheme/host case + port/fragment dropped), so the
    # same article re-shared with ?utm_source=feed dedups. Cheapest
    # verdict in the pipeline (one window on the canonical string), so
    # it runs first; docs with no/unparseable URL never URL-dedup.
    if url_col is not None:
        canon = canonicalize_url(F.col(url_col))
        # NULL-canon rows (no/unparseable URL) never URL-dedup — give
        # each its OWN partition key instead of windowing them as one
        # NULL group: on a web corpus with a large no-URL fraction a
        # shared NULL partition funnels all those rows into a single
        # straggler task just to compute a row_number the keep rule
        # would discard. The \\x00 prefix cannot collide with a real
        # canonical URL (those start with a scheme).
        w_url = Window.partitionBy(
            F.coalesce(
                canon, F.concat(F.lit("\x00nourl:"), did.cast("string"))
            )
        ).orderBy(did)
        flagged = docs.filter(txt.isNotNull()).withColumn(
            "_url_keep", F.row_number().over(w_url) == 1
        )
    else:
        flagged = docs.filter(txt.isNotNull()).withColumn(
            "_url_keep", F.lit(True)
        )

    # stage 1: exact dedup — canonical (min id) per content hash.
    # URL-dropped rows rank BELOW url-keepers inside each content
    # group: the stats only ever consult _exact_keep conjoined with
    # _url_keep, and without this ordering a url-dropped min-id doc
    # would win its group and silently kill the url-kept twin's
    # content. With the url stage off the ordering degenerates to
    # plain min-id (every _url_keep is TRUE).
    w_exact = Window.partitionBy(F.md5(txt)).orderBy(
        F.col("_url_keep").desc(), did
    )
    flagged = flagged.withColumn(
        "_exact_keep", F.row_number().over(w_exact) == 1
    )

    # stage 2: quality + repetition gates (pure column math + one
    # map-side-combined gram count, the text_profile shapes)
    ws = tokens(text_col)
    n = F.size(ws)
    distinct_ratio = F.size(F.array_distinct(ws)).cast("double") / n
    flagged = flagged.withColumn(
        "_quality_ok", (n >= min_words) & (distinct_ratio >= min_distinct_ratio)
    )
    tagged = F.concat(
        F.transform(
            kgrams_from_tokens(ws, 2),
            lambda g: F.struct(F.lit(2).alias("glen"), g.alias("gram")),
        ),
        F.transform(
            kgrams_from_tokens(ws, 3),
            lambda g: F.struct(F.lit(3).alias("glen"), g.alias("gram")),
        ),
    )
    # gram counting only over rows the earlier (cheaper) stages kept —
    # _rep_ok is never consulted except conjoined with them, and on a
    # heavily-duplicated corpus this cuts the dominant stage-2 shuffle
    # by the duplicate/low-quality fraction
    gc = (
        flagged.filter(
            F.col("_url_keep") & F.col("_exact_keep") & F.col("_quality_ok")
        )
        .select(did, F.explode(tagged).alias("g"))
        .select(id_col, "g.glen", "g.gram")
        .groupBy(id_col, "glen", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c2 = F.when(F.col("glen") == 2, F.col("c"))
    c3 = F.when(F.col("glen") == 3, F.col("c"))
    rep = gc.groupBy(id_col).agg(
        (F.max(c2).cast("double") / F.sum(c2).cast("double")).alias("_top2"),
        F.coalesce(F.sum(c2), F.lit(0)).alias("_n2"),
        (
            F.coalesce(
                F.sum(F.when((F.col("glen") == 3) & (F.col("c") >= 2), F.col("c"))),
                F.lit(0),
            ).cast("double")
            / F.sum(c3).cast("double")
        ).alias("_dup3"),
        F.coalesce(F.sum(c3), F.lit(0)).alias("_n3"),
    )
    # each repetition leg condemns INDEPENDENTLY, and only with enough
    # gram evidence (≥ 4 instances): a 2-word doc's single bigram has
    # top-fraction 1.0 by construction — that is absence of evidence,
    # not repetition. NULL legs (no grams at all) can never condemn.
    bad2 = (F.col("_n2") >= 4) & (F.col("_top2") > max_top_bigram_frac)
    bad3 = (F.col("_n3") >= 4) & (F.col("_dup3") > max_dup_trigram_frac)
    flagged = flagged.join(rep, id_col, "left").withColumn(
        "_rep_ok",
        ~F.coalesce(bad2, F.lit(False)) & ~F.coalesce(bad3, F.lit(False)),
    )
    cheap_keep = (
        F.col("_url_keep")
        & F.col("_exact_keep")
        & F.col("_quality_ok")
        & F.col("_rep_ok")
    )

    # stage 2m (optional): model-based quality gate — a trained
    # (weights, meta) NB classifier (functions.quality_model) scores
    # only the cheap-stage survivors (broadcast bucket join + one
    # groupBy(id)); docs below min_quality_prob drop. Sits between the
    # heuristic gates (which it typically generalizes — the CCNet
    # bootstrap) and the shuffle-heavy dedup stages so the model prunes
    # before the expensive work.
    if quality_model is not None:
        from crypto_data_pipeline_with_kafka_spark.functions.quality_model import (
            score_with_quality_classifier,
        )

        low_q = (
            score_with_quality_classifier(
                flagged.filter(cheap_keep).select(did, txt),
                quality_model,
                text_col=text_col,
                id_col=id_col,
            )
            .filter(F.col("quality_prob") < min_quality_prob)
            .select(did, F.lit(True).alias("_mq_bad"))
        )
        flagged = (
            flagged.join(low_q, id_col, "left")
            .withColumn(
                "_model_ok", ~F.coalesce(F.col("_mq_bad"), F.lit(False))
            )
            .drop("_mq_bad")
        )
    else:
        flagged = flagged.withColumn("_model_ok", F.lit(True))
    model_keep = cheap_keep & F.col("_model_ok")

    # stage 2b (optional): eval-set decontamination — the benchmark
    # side is eval-set-sized (broadcast), the corpus is shingled once
    # over the cheap+model-stage survivors only
    if benchmark is not None:
        corpus_sh = shingle_rows(
            flagged.filter(model_keep).select(did, txt),
            text_col,
            id_col,
            decontam_k,
            widen=False,
        )
        contaminated = (
            decontaminate(
                flagged,
                benchmark,
                k=decontam_k,
                min_containment=decontam_min_containment,
                text_col=text_col,
                id_col=id_col,
                corpus_shingles=corpus_sh,
            )
            .select(F.col("doc_id").alias(id_col))
            .distinct()
            .withColumn("_contaminated", F.lit(True))
        )
        flagged = flagged.join(contaminated, id_col, "left").withColumn(
            "_decontam_ok", ~F.coalesce(F.col("_contaminated"), F.lit(False))
        ).drop("_contaminated")
    else:
        flagged = flagged.withColumn("_decontam_ok", F.lit(True))

    # stage 2b2 (optional): SEMANTIC decontamination — the embedding
    # twin of the k-gram stage (paraphrased/reformatted eval leakage
    # shares no n-grams); benchmark embeddings broadcast, the corpus
    # side is the caller-embedded docs still alive after the earlier
    # flags. Docs without an embedding row pass through — the gate
    # covers what the caller embedded (the dense-gate convention).
    if benchmark_embeddings is not None:
        if embeddings is None:
            raise ValueError(
                "benchmark_embeddings without embeddings: semantic "
                "decontamination compares CORPUS vectors against the "
                "benchmark's — pass the corpus (id, vector) relation "
                "via embeddings="
            )
        from crypto_data_pipeline_with_kafka_spark.operators.semantic import (
            semantic_decontaminate,
        )

        alive = flagged.filter(model_keep & F.col("_decontam_ok")).select(did)
        sem_cont = (
            semantic_decontaminate(
                embeddings.join(alive, id_col, "left_semi"),
                benchmark_embeddings,
                min_cosine=semantic_decontam_min_cosine,
                id_col=id_col,
                vec_col=emb_col,
            )
            .select(did)
            .distinct()
            .withColumn("_sem_cont", F.lit(True))
        )
        flagged = (
            flagged.join(sem_cont, id_col, "left")
            .withColumn(
                "_sem_decontam_ok",
                ~F.coalesce(F.col("_sem_cont"), F.lit(False)),
            )
            .drop("_sem_cont")
        )
    else:
        flagged = flagged.withColumn("_sem_decontam_ok", F.lit(True))
    decontam_ok = F.col("_decontam_ok") & F.col("_sem_decontam_ok")

    # stage 3: near-dup clustering on what survived the cheap stages —
    # keep singletons and each cluster's quality-weighted survivor.
    # The survivor side needs stable reuse (the dedup machinery runs
    # eager convergence actions), so persist the gated frame.
    gated = flagged.filter(model_keep & decontam_ok).persist()
    pairs = minhash_lsh_dedup(
        gated,
        text_col=text_col,
        id_col=id_col,
        min_jaccard=minhash_jaccard,
        # widen=False: gated is a join/window-derived (and persisted)
        # plan, not a scan — the widen probe would materialize the
        # earlier curation stages an extra time under AQE
        widen=False,
    ).persist()
    # connected_components emits (doc_id, canonical_id) regardless of
    # the caller's id column; realign before the survivor join, and
    # score quality on the caller's text column
    clusters = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    survivors = select_cluster_survivors(
        gated,
        clusters,
        quality_col=F.length(F.trim(txt)),
        id_col=id_col,
    )
    clustered_ids = clusters.select(id_col)
    survivor_ids = survivors.select(F.col("survivor_id").alias(id_col))
    flagged = flagged.join(
        clustered_ids.withColumn("_in_cluster", F.lit(True)), id_col, "left"
    ).join(
        survivor_ids.withColumn("_is_survivor", F.lit(True)), id_col, "left"
    )
    flagged = flagged.withColumn(
        "_neardup_keep",
        ~F.coalesce(F.col("_in_cluster"), F.lit(False))
        | F.coalesce(F.col("_is_survivor"), F.lit(False)),
    )
    keep_mh = model_keep & decontam_ok & F.col("_neardup_keep")

    # stage 3w (optional): partial-overlap winnowing gate over the
    # MinHash survivors — same cluster/keep-best shape as stage 3;
    # fingerprinting is in-row array math, pairing is the inverted-
    # index join (cost ~ postings collisions under the doc-freq guard)
    winnow_caches: tuple = ()
    if winnow_store_dir is not None:
        # the store dir IMPLIES the stage (winnow= need not also be
        # set): silently ignoring a configured cross-run check would be
        # the worst failure mode — copied spans flowing through while
        # the caller believes they are gated
        from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
            incremental_winnowing_dedup,
        )

        if winnow_batch_id is None:
            raise ValueError(
                "winnow_store_dir without winnow_batch_id: each curation "
                "run needs its own non-decreasing batch id (re-running "
                "the LATEST id is the crash-recovery/redelivery path) — "
                "a default would make every run batch 0, never seeing "
                "earlier runs and overwriting batch 0's fingerprints"
            )
        # the non-decreasing-batch-id refusal (== max is redelivery)
        # lives INSIDE incremental_winnowing_dedup now (r8: moved from
        # this call site so direct callers and the streaming runner get
        # it too — operators.dedup.check_store_batch_monotonic).
        # Persist the staged frame FIRST: the store call is EAGER
        # (writes flags + fps immediately), so without the cache the
        # exact-dedup/quality/minhash plan behind `flagged` would run
        # here AND again for the stats pass (released with the stage
        # caches below)
        flagged = flagged.persist()
        winnow_caches = (flagged,)
        wflags = incremental_winnowing_dedup(
            flagged.filter(keep_mh).select(did, txt),
            winnow_store_dir,
            winnow_batch_id,
            text_col=text_col,
            id_col=id_col,
            k=winnow_k,
            window=winnow_window,
            min_shared=winnow_min_shared,
            max_doc_freq=winnow_max_doc_freq,
            # the "batch" here is a whole curation run over a DERIVED
            # frame: no widen probe (it would re-execute the earlier
            # stages) and no forced broadcast of run-sized postings
            widen=False,
            broadcast_batch=False,
        ).select(did)
        flagged = flagged.join(
            wflags.withColumn("_wn_dup", F.lit(True)), id_col, "left"
        ).withColumn(
            "_winnow_keep", ~F.coalesce(F.col("_wn_dup"), F.lit(False))
        ).drop("_wn_dup")
    elif winnow:
        from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
            winnowing_fingerprints,
            winnowing_pairs,
        )

        wn_surv = (
            flagged.filter(keep_mh)
            .select(did, F.length(F.trim(txt)).alias("_wq"))
            .persist()
        )
        wfps = winnowing_fingerprints(
            flagged.filter(keep_mh).select(did, txt),
            k=winnow_k,
            window=winnow_window,
            text_col=text_col,
            id_col=id_col,
            widen=False,
        )
        wpairs = winnowing_pairs(
            wfps,
            id_col=id_col,
            min_shared=winnow_min_shared,
            max_doc_freq=winnow_max_doc_freq,
        )
        wclusters = connected_components(wpairs).withColumnRenamed(
            "doc_id", id_col
        )
        wsurv = select_cluster_survivors(
            wn_surv, wclusters, quality_col="_wq", id_col=id_col
        )
        flagged = flagged.join(
            wclusters.select(did).withColumn("_in_wcluster", F.lit(True)),
            id_col,
            "left",
        ).join(
            wsurv.select(F.col("survivor_id").alias(id_col)).withColumn(
                "_is_wsurvivor", F.lit(True)
            ),
            id_col,
            "left",
        )
        flagged = flagged.withColumn(
            "_winnow_keep",
            ~F.coalesce(F.col("_in_wcluster"), F.lit(False))
            | F.coalesce(F.col("_is_wsurvivor"), F.lit(False)),
        )
        # winnowing_pairs persists the fingerprint frame it is handed
        # (its postings join reads it twice) — release it with the
        # stage caches
        winnow_caches = (wn_surv, wfps)
    else:
        flagged = flagged.withColumn("_winnow_keep", F.lit(True))
    keep_wn = keep_mh & F.col("_winnow_keep")

    # stage 3b (optional): dense near-dup gate over the MinHash
    # survivors' embeddings — same cluster/keep-best shape as stage 3,
    # candidate generation via IVF cells (never all-pairs). The base is
    # prepared with widen=False (semi-join-derived) and persisted: the
    # component resolution runs eager convergence actions over it.
    dense_caches: tuple = ()
    if embeddings is not None and embedding_min_cosine is not None:
        # persist only what the stage consumes — (id, quality) — not
        # the full-width survivor frame with its text and flag columns
        # (the eager convergence actions would pin the whole surviving
        # corpus in cache otherwise)
        mh_surv = (
            flagged.filter(keep_wn)
            .select(did, F.length(F.trim(txt)).alias("_dq"))
            .persist()
        )
        # the similarity verify stage's column contract is vec_id —
        # alias in, rename back out at the cluster step
        emb_base = with_dbl_and_approx_norm(
            embeddings.join(mh_surv.select(did), id_col, "left_semi").select(
                did.alias("vec_id"), F.col(emb_col)
            ),
            "vec_id",
            emb_col,
            widen=False,
        ).persist()
        dpairs = ivf_ann_pairs(
            emb_base,
            num_centroids="auto",
            probes=3,
            min_cosine=embedding_min_cosine,
            id_col="vec_id",
        ).persist()
        dclusters = connected_components(dpairs).withColumnRenamed(
            "doc_id", id_col
        )
        dsurv = select_cluster_survivors(
            mh_surv,
            dclusters,
            quality_col="_dq",
            id_col=id_col,
        )
        flagged = flagged.join(
            dclusters.select(did).withColumn("_in_dcluster", F.lit(True)),
            id_col,
            "left",
        ).join(
            dsurv.select(F.col("survivor_id").alias(id_col)).withColumn(
                "_is_dsurvivor", F.lit(True)
            ),
            id_col,
            "left",
        )
        flagged = flagged.withColumn(
            "_dense_keep",
            ~F.coalesce(F.col("_in_dcluster"), F.lit(False))
            | F.coalesce(F.col("_is_dsurvivor"), F.lit(False)),
        )
        dense_caches = (mh_surv, emb_base, dpairs)
    else:
        flagged = flagged.withColumn("_dense_keep", F.lit(True))
    keep_dense = keep_wn & F.col("_dense_keep")

    # stages 3c/3d (optional): binary-modality near-dup gates — hash the
    # payloads of still-alive docs with the modality's perceptual hash,
    # pair via the shared hamming machinery (one-shot in-batch, or
    # against the persisted cross-run store), keep each cluster's min id
    def _modality_gate(flagged, alive_expr, rel, hash_fn, max_h,
                       store_dir, batch_id, keep_name, algo):
        from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
            incremental_hamming_dedup,
            simhash_pairs,
        )

        alive = flagged.filter(alive_expr).select(did)
        hashed = hash_fn(
            rel.join(alive, id_col, "left_semi"),
            id_col=id_col,
            payload_col=payload_col,
        )
        # the perceptual hashers emit the id as 'doc_id' regardless of
        # id_col; rename back so the pairing calls below (which receive
        # id_col) resolve under a non-default id column
        if id_col != "doc_id":
            hashed = hashed.withColumnRenamed("doc_id", id_col)
        hashed = hashed.persist()
        if store_dir is not None:
            # algo stamps the hasher era so a bit-rule upgrade (e.g.
            # the r8 audio silence-trim) refuses against a store of
            # old-rule fingerprints instead of silently missing dups
            dups = incremental_hamming_dedup(
                hashed, store_dir, batch_id, id_col=id_col,
                max_hamming=max_h, algo=algo,
            ).select(did)
        else:
            pairs = simhash_pairs(hashed, id_col=id_col, max_hamming=max_h)
            comp = connected_components(pairs)
            dups = comp.filter("doc_id != canonical_id").select(
                F.col("doc_id").alias(id_col)
            )
        flagged = flagged.join(
            dups.withColumn("_bin_dup", F.lit(True)), id_col, "left"
        ).withColumn(
            keep_name, ~F.coalesce(F.col("_bin_dup"), F.lit(False))
        ).drop("_bin_dup")
        return flagged, hashed

    image_caches: tuple = ()
    if images is not None:
        from crypto_data_pipeline_with_kafka_spark.multimodal import (
            IMAGE_AHASH_ALGO,
            perceptual_hash_images,
        )

        flagged, img_hashed = _modality_gate(
            flagged, keep_dense, images, perceptual_hash_images,
            image_max_hamming, image_store_dir, image_batch_id,
            "_image_keep", IMAGE_AHASH_ALGO,
        )
        image_caches = (img_hashed,)
    else:
        flagged = flagged.withColumn("_image_keep", F.lit(True))
    keep_img = keep_dense & F.col("_image_keep")

    audio_caches: tuple = ()
    if audio is not None:
        from crypto_data_pipeline_with_kafka_spark.multimodal import (
            AUDIO_FP_ALGO,
            perceptual_hash_audio,
        )

        flagged, aud_hashed = _modality_gate(
            flagged, keep_img, audio, perceptual_hash_audio,
            audio_max_hamming, audio_store_dir, audio_batch_id,
            "_audio_keep", AUDIO_FP_ALGO,
        )
        audio_caches = (aud_hashed,)
    else:
        flagged = flagged.withColumn("_audio_keep", F.lit(True))
    keep_aud = keep_img & F.col("_audio_keep")

    video_caches: tuple = ()
    if video is not None:
        from crypto_data_pipeline_with_kafka_spark.multimodal import (
            VIDEO_FP_ALGO,
            perceptual_hash_video,
        )

        flagged, vid_hashed = _modality_gate(
            flagged,
            keep_aud,
            video,
            lambda rel, id_col, payload_col: perceptual_hash_video(
                rel, video_every_nth, id_col=id_col, payload_col=payload_col
            ),
            video_max_hamming,
            video_store_dir,
            video_batch_id,
            "_video_keep",
            # every_nth shapes which frames feed the majority fold, so
            # it is part of the fingerprint era
            f"{VIDEO_FP_ALGO}/n={video_every_nth}",
        )
        video_caches = (vid_hashed,)
    else:
        flagged = flagged.withColumn("_video_keep", F.lit(True))

    keep = keep_aud & F.col("_video_keep")
    flagged = flagged.withColumn("_keep", keep).persist()

    # ONE aggregation pass for every stage statistic
    def _n(c):  # zero-row agg returns NULL sums — an empty batch is 0s
        return F.coalesce(F.sum(c.cast("long")), F.lit(0))

    srow = flagged.agg(
        F.count(F.lit(1)).alias("input_rows"),
        _n(~F.col("_url_keep")).alias("url_dups_dropped"),
        _n(F.col("_url_keep") & ~F.col("_exact_keep")).alias(
            "exact_dups_dropped"
        ),
        _n(
            F.col("_url_keep") & F.col("_exact_keep") & ~F.col("_quality_ok")
        ).alias("quality_dropped"),
        _n(
            F.col("_url_keep") & F.col("_exact_keep") & F.col("_quality_ok")
            & ~F.col("_rep_ok")
        ).alias("repetition_dropped"),
        _n(cheap_keep & ~F.col("_model_ok")).alias("model_quality_dropped"),
        _n(model_keep & ~F.col("_decontam_ok")).alias("decontam_dropped"),
        _n(
            model_keep & F.col("_decontam_ok") & ~F.col("_sem_decontam_ok")
        ).alias("semantic_decontam_dropped"),
        _n(
            model_keep & decontam_ok & ~F.col("_neardup_keep")
        ).alias("neardup_dropped"),
        _n(keep_mh & ~F.col("_winnow_keep")).alias("winnow_dropped"),
        _n(keep_wn & ~F.col("_dense_keep")).alias("dense_neardup_dropped"),
        _n(keep_dense & ~F.col("_image_keep")).alias("image_neardup_dropped"),
        _n(keep_img & ~F.col("_audio_keep")).alias("audio_neardup_dropped"),
        _n(keep_aud & ~F.col("_video_keep")).alias("video_neardup_dropped"),
        _n(F.col("_keep")).alias("curated_rows"),
    ).first()
    stats = {k: int(srow[k]) for k in srow.asDict()}

    curated = flagged.filter("_keep").drop(
        "_url_keep", "_exact_keep", "_quality_ok", "_rep_ok", "_model_ok",
        "_decontam_ok",
        "_sem_decontam_ok",
        "_neardup_keep", "_winnow_keep", "_dense_keep", "_image_keep",
        "_audio_keep", "_video_keep", "_keep",
        "_top2", "_n2", "_dup3", "_n3", "_in_cluster",
        "_is_survivor", "_in_wcluster", "_is_wsurvivor",
        "_in_dcluster", "_is_dsurvivor",
    )

    # stage 4 (optional): sub-document boilerplate removal — rewrites
    # the surviving docs' text, so it runs after every content-reading
    # verdict. Chunk accounting is over the surviving docs (a doc whose
    # every chunk was boilerplate drops out of cleaned entirely and is
    # counted in chunkdedup_docs_dropped).
    chunk_caches: list = []
    if chunk_dedup:
        cleaned = chunk_level_dedup(
            curated,
            text_col=text_col,
            id_col=id_col,
            words_per_chunk=words_per_chunk,
            min_docs=chunk_min_docs,
            widen=False,
            caches=chunk_caches,
            boundaries=chunk_boundaries,
            cdc_window=cdc_window,
            cdc_divisor=cdc_divisor,
            cdc_min_words=cdc_min_words,
            cdc_max_words=cdc_max_words,
        ).persist()
        chunk_caches.append(cleaned)
        crow = cleaned.agg(
            F.count(F.lit(1)).alias("docs"),
            F.coalesce(F.sum("n_kept"), F.lit(0)).alias("kept"),
            F.coalesce(F.sum("n_total"), F.lit(0)).alias("total"),
        ).first()
        stats["chunkdedup_docs_dropped"] = stats["curated_rows"] - int(crow["docs"])
        stats["chunkdedup_chunks_kept"] = int(crow["kept"])
        stats["chunkdedup_chunks_total"] = int(crow["total"])
        stats["curated_rows"] = int(crow["docs"])
        curated = curated.drop(text_col).join(
            cleaned.select(did, F.col("clean_text").alias(text_col)), id_col
        )

    # stage 4b (optional, r13): ExactSubstr substring-level dedup —
    # like the chunk stage it REWRITES text, so it runs after every
    # content-reading verdict (and after chunk_dedup when both are
    # on: detection re-derives from the rewritten bytes). Token
    # accounting mirrors the chunk stage's; fully-duplicated docs
    # drop and are counted.
    xsub_caches: list = []
    if exact_substr:
        xcleaned = remove_duplicated_spans(
            curated,
            k=exact_substr_k,
            min_count=exact_substr_min_count,
            text_col=text_col,
            id_col=id_col,
            widen=False,
            caches=xsub_caches,
        ).persist()
        xsub_caches.append(xcleaned)
        xrow = xcleaned.agg(
            F.coalesce(
                F.sum(F.when(F.col("n_kept") > 0, 1).otherwise(0)),
                F.lit(0),
            ).alias("nonempty"),
            F.coalesce(F.sum("n_kept"), F.lit(0)).alias("kept"),
            F.coalesce(F.sum("n_total"), F.lit(0)).alias("total"),
        ).first()
        stats["exactsubstr_docs_dropped"] = stats["curated_rows"] - int(
            xrow["nonempty"]
        )
        stats["exactsubstr_tokens_kept"] = int(xrow["kept"])
        stats["exactsubstr_tokens_total"] = int(xrow["total"])
        stats["curated_rows"] = int(xrow["nonempty"])
        curated = curated.drop(text_col).join(
            xcleaned.filter(F.col("n_kept") > 0).select(
                did, F.col("clean_text").alias(text_col)
            ),
            id_col,
        )

    curated = hash_split(
        curated, split_weights or {"train": 0.9, "val": 0.05, "test": 0.05},
        key_col=id_col,
    )
    # cut the returned frame loose from every stage cache (one eager
    # materialization of the curated rows only), then RELEASE the
    # caches — returning a frame that silently depends on
    # function-local persists would leak them for the session
    curated = curated.localCheckpoint(eager=True)
    if export_path is not None:
        from crypto_data_pipeline_with_kafka_spark.sources.sinks import (
            export_training_shards,
            write_export_manifest,
        )

        export_training_shards(
            curated, export_path, n_shards=n_shards, key_col=id_col
        )
        write_export_manifest(spark, export_path)
    for df in (
        gated, pairs, flagged,
        *winnow_caches, *dense_caches, *image_caches, *audio_caches,
        *video_caches, *chunk_caches, *xsub_caches,
    ):
        df.unpersist()
    return curated, stats
