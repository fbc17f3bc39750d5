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
    tokens,
)
from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
    connected_components,
    minhash_lsh_dedup,
    select_cluster_survivors,
)
from crypto_data_pipeline_with_kafka_spark.operators.sampling import hash_split


def curate_corpus(
    spark,
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    min_distinct_ratio: float = 0.2,
    max_top_bigram_frac: float = 0.2,
    max_dup_trigram_frac: float = 0.3,
    minhash_jaccard: float = 0.8,
    split_weights: dict[str, float] | None = None,
    export_path: str | None = None,
    n_shards: int = 8,
) -> tuple[DataFrame, dict]:
    """Run the full curation pipeline; returns ``(curated, stats)``.

    ``curated`` carries the surviving rows plus a ``split`` column;
    ``stats`` reports input size and per-stage drop counts (one
    aggregation pass). With ``export_path``, the curated frame is also
    shard-exported (JSONL) and manifest-pinned
    (:func:`...sources.sinks.write_export_manifest`)."""
    txt, did = F.col(text_col), F.col(id_col)

    # stage 1: exact dedup — canonical (min id) per content hash
    w_exact = Window.partitionBy(F.md5(txt)).orderBy(did)
    flagged = docs.filter(txt.isNotNull()).withColumn(
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
        flagged.filter(F.col("_exact_keep") & F.col("_quality_ok"))
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

    # stage 3: near-dup clustering on what survived the cheap stages —
    # keep singletons and each cluster's quality-weighted survivor.
    # The survivor side needs stable reuse (the dedup machinery runs
    # eager convergence actions), so persist the gated frame.
    gated = flagged.filter(
        F.col("_exact_keep") & F.col("_quality_ok") & F.col("_rep_ok")
    ).persist()
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
    keep = (
        F.col("_exact_keep")
        & F.col("_quality_ok")
        & F.col("_rep_ok")
        & F.col("_neardup_keep")
    )
    flagged = flagged.withColumn("_keep", keep).persist()

    # ONE aggregation pass for every stage statistic
    def _n(c):  # zero-row agg returns NULL sums — an empty batch is 0s
        return F.coalesce(F.sum(c.cast("long")), F.lit(0))

    srow = flagged.agg(
        F.count(F.lit(1)).alias("input_rows"),
        _n(~F.col("_exact_keep")).alias("exact_dups_dropped"),
        _n(F.col("_exact_keep") & ~F.col("_quality_ok")).alias("quality_dropped"),
        _n(
            F.col("_exact_keep") & F.col("_quality_ok") & ~F.col("_rep_ok")
        ).alias("repetition_dropped"),
        _n(
            F.col("_exact_keep")
            & F.col("_quality_ok")
            & F.col("_rep_ok")
            & ~F.col("_neardup_keep")
        ).alias("neardup_dropped"),
        _n(F.col("_keep")).alias("curated_rows"),
    ).first()
    stats = {k: int(srow[k]) for k in srow.asDict()}

    curated = flagged.filter("_keep").drop(
        "_exact_keep", "_quality_ok", "_rep_ok", "_neardup_keep", "_keep",
        "_top2", "_n2", "_dup3", "_n3", "_in_cluster", "_is_survivor",
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
    for df in (gated, pairs, flagged):
        df.unpersist()
    return curated, stats
