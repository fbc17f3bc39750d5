"""Deterministic sampling/splitting operators: reproducibility,
growth-stability (the 100-TB property), proportion accuracy, and
exact-count stratification."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample_exact,
)

SF = "/root/testdata/sf0.01"


def test_hash_split_partitions_disjoint_and_stable(spark):
    docs = load_table(spark, SF, "documents")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = hash_split(docs, weights)
    n = docs.count()
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # total coverage, no drops/dupes
    # proportions within a loose binomial band (n=500)
    assert 0.7 * n <= counts["train"] <= 0.9 * n
    assert counts["val"] > 0 and counts["test"] > 0
    # determinism: same salt → identical assignment
    again = {r.doc_id: r["split"] for r in hash_split(docs, weights).collect()}
    first = {r.doc_id: r["split"] for r in split.collect()}
    assert first == again
    # growth stability: splitting HALF the corpus assigns those rows
    # exactly as splitting the whole corpus does (no randomSplit-style
    # reshuffle on growth)
    half = hash_split(docs.filter("doc_id % 2 = 0"), weights)
    sub = {r.doc_id: r["split"] for r in half.collect()}
    assert all(first[k] == v for k, v in sub.items())
    # a different salt draws a genuinely different split
    other = {r.doc_id: r["split"] for r in hash_split(docs, weights, salt="v2").collect()}
    assert other != first


def test_hash_sample_subset_and_repeatable(spark):
    docs = load_table(spark, SF, "documents")
    s10 = {r.doc_id for r in hash_sample(docs, 0.1).select("doc_id").collect()}
    s30 = {r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    assert s10 <= s30  # nested thresholds → nested samples
    n = docs.count()
    assert 0.03 * n <= len(s10) <= 0.2 * n
    assert 0.2 * n <= len(s30) <= 0.4 * n
    # growing the corpus cannot eject previously sampled rows
    grown = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 10_000))
    g10 = {r.doc_id for r in hash_sample(grown, 0.1).select("doc_id").collect()}
    assert s10 <= g10


def test_stratified_sample_exact_counts(spark):
    docs = load_table(spark, SF, "documents")
    got = stratified_sample_exact(docs, ["lang"], n_per_stratum=7)
    per = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n_str in sizes.items():
        assert per.get(lang, 0) == min(7, n_str), (lang, per.get(lang), n_str)
    # deterministic draw
    a = {(r.lang, r.doc_id) for r in got.select("lang", "doc_id").collect()}
    b = {
        (r.lang, r.doc_id)
        for r in stratified_sample_exact(docs, ["lang"], 7).select("lang", "doc_id").collect()
    }
    assert a == b


def test_pack_sequences_matches_python_reference(spark):
    """pack_sequences = concat-and-cut packing per md5 shard: every
    doc's (shard, seq, offset) must equal a sequential pure-Python pack
    of the same shard in the same id order — the invariant that a
    training reader consuming shard-by-shard sees a gapless token
    stream cut exactly at the budget."""
    import hashlib

    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        pack_sequences,
    )

    budget, shards = 512, 4
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tok")
    )
    got = {
        r.doc_id: (r.pack_shard, r.pack_seq, r.pack_offset)
        for r in pack_sequences(
            docs, budget, "n_tok", n_shards=shards
        ).collect()
    }

    rows = sorted((r.doc_id, r.n_tok) for r in docs.collect())
    cum = {s: 0 for s in range(shards)}
    for doc_id, n_tok in rows:
        s = int(hashlib.md5(f"pack-v1|{doc_id}".encode()).hexdigest()[:4], 16) % shards
        assert got[doc_id] == (s, cum[s] // budget, cum[s] % budget), doc_id
        cum[s] += n_tok
    # gapless: total tokens per shard == final cumsum
    assert sum(cum.values()) == sum(n for _, n in rows)


def test_resample_to_mixture_proportions_and_determinism(spark):
    """Mixture resampling: achieved per-source counts approximate the
    target weights at the max feasible total (binomial tolerance), the
    scarcest source sets the scale (its keep-rate is 1.0 — every row
    kept), unmentioned sources are dropped, the draw is deterministic,
    and a Python recomputation of the md5 keep-rule selects the exact
    same rows."""
    import hashlib

    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        resample_to_mixture,
    )

    docs = load_table(spark, SF, "documents")
    n_by_src = {r["source"]: r["n"] for r in
                docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    srcs = sorted(n_by_src)
    assert len(srcs) >= 2, srcs
    # two DISTINCT sources (fixture counts are uniform, so min/max by
    # count would collide); the heavier weight binds under equal counts
    lo_w, hi_w = srcs[0], srcs[1]
    mixture = {lo_w: 0.2, hi_w: 0.8}

    out = resample_to_mixture(docs, mixture, salt="mix-test")
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the source whose n/w is smallest binds: kept whole
    t_max = min(n_by_src[lo_w] / 0.2, n_by_src[hi_w] / 0.8)
    rates = {lo_w: t_max * 0.2 / n_by_src[lo_w], hi_w: t_max * 0.8 / n_by_src[hi_w]}
    bind = max(rates, key=rates.get)
    assert rates[bind] == 1.0 and got[bind] == n_by_src[bind]
    # the down-weighted source approximates its share (binomial: 4 sigma)
    other = lo_w if bind == hi_w else hi_w
    exp = t_max * mixture[other] / 1.0
    sigma = (exp * (1 - rates[other])) ** 0.5
    assert abs(got.get(other, 0) - exp) <= 4 * sigma + 1, (got, exp)
    # only mixture sources survive
    assert set(got) <= {lo_w, hi_w}

    # determinism + exact row membership vs a sequential recomputation
    kept_ids = {r.doc_id for r in out.select("doc_id").collect()}
    kept_ids2 = {r.doc_id for r in
                 resample_to_mixture(docs, mixture, salt="mix-test")
                 .select("doc_id").collect()}
    assert kept_ids == kept_ids2
    for r in docs.select("doc_id", "source").collect():
        if r.source not in mixture:
            assert r.doc_id not in kept_ids
            continue
        frac = int(hashlib.md5(f"mix-test|{r.doc_id}".encode())
                   .hexdigest()[:13], 16) / float(16**13)
        assert (frac < rates[r.source]) == (r.doc_id in kept_ids), r


def test_resample_to_mixture_random_weights_invariants(spark):
    """For a sweep of weight vectors: the binding source is always kept
    whole (rate snapped to exactly 1.0), every kept set is a subset of
    the source's rows, non-mixture sources vanish, and achieved counts
    stay within binomial bounds of target shares."""
    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        resample_to_mixture,
    )

    docs = load_table(spark, SF, "documents")
    n_by_src = {r["source"]: r["n"] for r in
                docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    srcs = sorted(n_by_src)[:3]
    for weights in ([0.7, 0.2, 0.1], [1.0, 1.0, 1.0], [0.05, 0.05, 0.9],
                    [3.0, 1.0, 2.0]):
        mixture = dict(zip(srcs, weights))
        wtot = sum(weights)
        out = resample_to_mixture(docs, mixture, salt=f"sweep-{weights}")
        got = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(got) <= set(srcs), got
        bind = min(srcs, key=lambda s: n_by_src[s] / (mixture[s] / wtot))
        assert got.get(bind, 0) == n_by_src[bind], (weights, got)
        t_max = n_by_src[bind] / (mixture[bind] / wtot)
        for s in srcs:
            exp = t_max * mixture[s] / wtot
            rate = min(1.0, exp / n_by_src[s])
            sigma = (exp * (1 - rate)) ** 0.5
            assert abs(got.get(s, 0) - exp) <= 4 * sigma + 1, (weights, s, got)


def test_profile_columns_one_pass_stats(spark):
    """profile_columns: exact nulls/min/max/mean per column from one
    groupless aggregation; complex types profile nulls/distinct only."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.warehouse import profile_columns

    df = spark.createDataFrame(
        [
            (1, 2.0, "a", [1, 2]),
            (2, None, "b", []),
            (3, 6.0, None, None),
            (4, 4.0, "a", [3]),
        ],
        ["k", "v", "s", "arr"],
    )
    prof = {r["column"]: r.asDict() for r in profile_columns(df).collect()}
    assert set(prof) == {"k", "v", "s", "arr"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert (prof["v"]["n_nulls"], prof["v"]["min_str"], prof["v"]["max_str"]) == (
        1, "2.0", "6.0",
    )
    assert prof["v"]["mean"] == (2.0 + 6.0 + 4.0) / 3
    assert prof["v"]["null_frac"] == 0.25
    assert (prof["s"]["min_str"], prof["s"]["max_str"], prof["s"]["mean"]) == (
        "a", "b", None,
    )
    # complex type: null/distinct only
    assert (prof["arr"]["min_str"], prof["arr"]["mean"]) == (None, None)
    assert prof["arr"]["n_nulls"] == 1
    # approx_distinct is within HLL error of truth on tiny inputs
    assert abs(prof["k"]["approx_distinct"] - 4) <= 1
    # hostile column names (quotes/backticks — CSV-header reality) profile fine
    hostile = spark.createDataFrame([(1,)], ["x"]).withColumnRenamed("x", "o'cl`ock")
    hp = {r["column"]: r for r in profile_columns(hostile).collect()}
    assert hp["o'cl`ock"]["n_nulls"] == 0 and hp["o'cl`ock"]["min_str"] == "1"
    # ONE exchange: the plan has a single-row partial+final agg, no extra
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") <= 1, plan


def test_curate_corpus_end_to_end(spark, tmp_path):
    """Full curation pipeline on the fixture corpus + a planted exact
    duplicate: stage invariants (no exact dup survives, each near-dup
    cluster keeps exactly its quality-argmax survivor, stats add up),
    split column present, export verifies."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
        connected_components,
        minhash_lsh_dedup,
    )
    from crypto_data_pipeline_with_kafka_spark.sources.sinks import verify_export

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    planted = docs.filter(F.col("doc_id") == 0).withColumn(
        "doc_id", F.lit(100000).cast("long")
    )
    corpus = docs.unionByName(planted)

    export = str(tmp_path / "curated_export")
    curated, stats = curate_corpus(spark, corpus, export_path=export)
    curated = curated.persist()

    assert stats["input_rows"] == corpus.count()
    assert stats["exact_dups_dropped"] >= 1  # the planted copy
    assert stats["curated_rows"] == curated.count()
    assert stats["input_rows"] == stats["curated_rows"] + sum(
        stats[k] for k in (
            "exact_dups_dropped", "quality_dropped",
            "repetition_dropped", "neardup_dropped",
        )
    )

    # invariant: no two surviving rows share text
    assert (
        curated.groupBy(F.md5("text")).count().filter("count > 1").isEmpty()
    )
    # invariant: re-clustering the curated rows finds no pair >= 0.8
    assert minhash_lsh_dedup(curated).isEmpty()
    # split column assigned
    splits = {r["split"] for r in curated.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # export written and manifest-verified
    assert verify_export(spark, export)

    # content tamper WITHOUT touching keys or counts is still caught
    # (per-row digests cover full content)
    import glob as _glob
    import json as _json

    part = _glob.glob(f"{export}/shard=1/part-*.json")[0]
    lines = [_json.loads(ln) for ln in open(part)]
    # same-LENGTH swap: keys, counts, and file size all unchanged —
    # only the digests can catch it (and no stale-file-length reads)
    lines[0]["text"] = "x" * len(lines[0]["text"])
    with open(part, "w") as fh:
        for ln in lines:
            fh.write(_json.dumps(ln) + "\n")
    # drop Hadoop's local-FS .crc sidecar: a real tamperer rewrites it,
    # and the point here is that the MANIFEST layer catches the edit
    import os as _os

    crc = f"{_os.path.dirname(part)}/.{_os.path.basename(part)}.crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    spark.catalog.refreshByPath(export)
    assert not verify_export(spark, export)

    # empty corpus: zero stats, no crash
    _, empty_stats = curate_corpus(spark, corpus.limit(0))
    assert empty_stats["input_rows"] == 0 == empty_stats["curated_rows"]

    # non-default column names work end to end
    renamed = corpus.withColumnRenamed("doc_id", "item_id").withColumnRenamed(
        "text", "body"
    )
    cur2, st2 = curate_corpus(spark, renamed, text_col="body", id_col="item_id")
    assert st2["curated_rows"] == cur2.count() > 0
    assert st2["curated_rows"] == stats["curated_rows"]
    curated.unpersist()


def test_curate_corpus_optional_stages(spark):
    """The optional curation stages compose with the core pipeline:
    eval decontamination drops the contaminated doc (and the curated
    output contains no benchmark grams), the dense embedding gate keeps
    one quality-weighted survivor per cosine cluster, chunk-level dedup
    strips the cross-doc boilerplate span, and the stats identity holds
    across all stages."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
        decontaminate,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    # three planted docs sharing one chunk-aligned 8-word boilerplate
    boiler = "qqb1 qqb2 qqb3 qqb4 qqb5 qqb6 qqb7 qqb8"
    planted = [
        (
            200001 + i,
            " ".join(f"zq{i}w{j}" for j in range(24)) + " " + boiler,
        )
        for i in range(3)
    ]
    extra = spark.createDataFrame(planted, "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(extra)

    # learn three baseline survivors to target the optional stages at
    base_curated, _ = curate_corpus(spark, docs.select("doc_id", "text"))
    s1, s2, s3 = [
        r.doc_id
        for r in base_curated.filter("doc_id < 200000")
        .orderBy("doc_id")
        .limit(3)
        .collect()
    ]
    s1_text = docs.filter(F.col("doc_id") == s1).first().text

    benchmark = spark.createDataFrame([(0, s1_text)], "doc_id long, text string")
    vec = [float(i) for i in range(1, 9)]
    embeddings = spark.createDataFrame(
        [(s2, vec), (s3, vec)], "doc_id long, embedding array<float>"
    )

    curated, stats = curate_corpus(
        spark,
        corpus,
        benchmark=benchmark,
        embeddings=embeddings,
        chunk_dedup=True,
    )
    curated = curated.persist()
    ids = {r.doc_id for r in curated.select("doc_id").collect()}

    # decontamination: the benchmark-contaminated doc is gone, and the
    # curated corpus shares no flagged k-gram overlap with the eval set
    assert stats["decontam_dropped"] >= 1 and s1 not in ids
    assert decontaminate(curated, benchmark).isEmpty()

    # dense gate: the identical-vector pair keeps exactly its
    # quality-weighted survivor (longer trimmed text, ties to lower id)
    assert stats["dense_neardup_dropped"] == 1
    assert len({s2, s3} & ids) == 1
    q2 = len(docs.filter(F.col("doc_id") == s2).first().text.strip())
    q3 = len(docs.filter(F.col("doc_id") == s3).first().text.strip())
    if q2 != q3:  # keep-best policy: longer trimmed text survives
        assert (s2 if q2 > q3 else s3) in ids

    # chunk dedup: the shared boilerplate chunk is stripped from every
    # planted doc (once per doc), the unique cores survive
    for pid, _ in planted:
        assert pid in ids
    kept_texts = {
        r.doc_id: r.text
        for r in curated.filter("doc_id >= 200000").collect()
    }
    for pid, _ in planted:
        assert "qqb1" not in kept_texts[pid]
        assert kept_texts[pid].split(" ")[0].startswith("zq")
    dropped_chunks = (
        stats["chunkdedup_chunks_total"] - stats["chunkdedup_chunks_kept"]
    )
    assert dropped_chunks >= 3  # one boilerplate chunk per planted doc

    # stats identity across ALL stages
    assert stats["input_rows"] == stats["curated_rows"] + sum(
        stats[k]
        for k in (
            "exact_dups_dropped",
            "quality_dropped",
            "repetition_dropped",
            "decontam_dropped",
            "neardup_dropped",
            "dense_neardup_dropped",
            "chunkdedup_docs_dropped",
        )
    )
    curated.unpersist()


def test_curate_corpus_winnow_stage(spark, tmp_path):
    """The optional winnowing stage catches a planted PARTIAL overlap —
    a 40-word span copied between two otherwise-disjoint documents —
    that the whole-doc MinHash stage provably misses (shared-span
    Jaccard ≈ 0.2 ≪ the 0.8 threshold): without ``winnow=True`` both
    docs survive; with it the cluster resolves to its quality-weighted
    survivor and the stats identity extends across the new stage."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    span = " ".join(f"wns{j}" for j in range(40))
    a_id, b_id = 300001, 300002
    planted = [
        (a_id, " ".join(f"wna{j}" for j in range(70)) + " " + span),
        (b_id, " ".join(f"wnb{j}" for j in range(60)) + " " + span),
    ]
    corpus = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(planted, "doc_id long, text string")
    )

    base, base_stats = curate_corpus(spark, corpus)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    assert {a_id, b_id} <= base_ids  # MinHash alone misses the overlap
    assert "winnow_dropped" in base_stats and base_stats["winnow_dropped"] == 0

    curated, stats = curate_corpus(spark, corpus, winnow=True)
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    # quality-weighted survivor: the longer doc (a_id) survives
    assert a_id in ids and b_id not in ids
    assert stats["winnow_dropped"] == 1
    # the stage only removes the planted overlap — everything else is
    # untouched relative to the base run
    assert ids == base_ids - {b_id}
    assert stats["input_rows"] == stats["curated_rows"] + sum(
        stats[k]
        for k in (
            "exact_dups_dropped",
            "quality_dropped",
            "repetition_dropped",
            "decontam_dropped",
            "neardup_dropped",
            "winnow_dropped",
            "dense_neardup_dropped",
            "image_neardup_dropped",
            "audio_neardup_dropped",
            "video_neardup_dropped",
        )
    )

    # cross-run store variant: run 1 indexes this corpus's surviving
    # fingerprints; run 2's single new doc carries the same span and is
    # flagged against the STORE (no overlap inside its own batch)
    store = str(tmp_path / "wn_store")
    _, st1 = curate_corpus(
        spark, corpus, winnow=True, winnow_store_dir=store, winnow_batch_id=0
    )
    assert st1["winnow_dropped"] >= 1  # the in-batch planted pair
    new_doc = spark.createDataFrame(
        [(310000, " ".join(f"wnz{j}" for j in range(30)) + " " + span)],
        "doc_id long, text string",
    )
    cur2, st2 = curate_corpus(
        spark, new_doc, winnow=True, winnow_store_dir=store, winnow_batch_id=1
    )
    assert st2["winnow_dropped"] == 1 and cur2.isEmpty()

    # the store dir ALONE enables the stage (a configured cross-run
    # check must never be silently skipped)
    new_doc3 = spark.createDataFrame(
        [(310001, " ".join(f"wny{j}" for j in range(30)) + " " + span)],
        "doc_id long, text string",
    )
    cur3, st3 = curate_corpus(
        spark, new_doc3, winnow_store_dir=store, winnow_batch_id=2
    )
    assert st3["winnow_dropped"] == 1 and cur3.isEmpty()

    # misconfigurations refuse: store without a batch id, and a
    # DECREASING batch id (would overwrite an older run's fingerprints)
    import pytest

    with pytest.raises(ValueError, match="winnow_batch_id"):
        curate_corpus(spark, new_doc3, winnow_store_dir=store)
    with pytest.raises(ValueError, match="must not decrease"):
        curate_corpus(
            spark, new_doc3, winnow_store_dir=store, winnow_batch_id=0
        )


def test_curate_corpus_image_gate(spark, tmp_path):
    """Mixed-modality curation: a planted near-dup image pair keeps only
    its min-id member (in-batch aHash pairing), a structurally different
    image passes, and the store-backed variant flags this run's image
    against what an EARLIER curation run indexed."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    w = h = 32

    def pgm(pixels):
        return b"P5\n32 32\n255\n" + bytes(pixels)

    base = [min(255, 4 * (x + y)) for y in range(h) for x in range(w)]
    noisy = list(base)
    for k in range(0, len(noisy), 97):
        noisy[k] = min(255, noisy[k] + 2)
    inverted = [255 - p for p in base]

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    survivors, _ = curate_corpus(spark, docs)
    s1, s2, s3 = [
        r.doc_id for r in survivors.orderBy("doc_id").limit(3).collect()
    ]

    # in-batch: s1/s2 share a near-identical image, s3's is different
    images = spark.createDataFrame(
        [(s1, pgm(base)), (s2, pgm(noisy)), (s3, pgm(inverted))],
        "doc_id long, payload binary",
    )
    curated, stats = curate_corpus(spark, docs, images=images)
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert stats["image_neardup_dropped"] == 1
    assert s1 in ids and s2 not in ids and s3 in ids  # min id survives

    # cross-run store: run 1 indexes s1's image; run 2's single doc
    # carries a near-dup of it and is flagged against the store
    store = str(tmp_path / "img_store")
    curate_corpus(
        spark,
        docs,
        images=spark.createDataFrame(
            [(s1, pgm(base))], "doc_id long, payload binary"
        ),
        image_store_dir=store,
        image_batch_id=0,
    )
    new_doc = spark.createDataFrame(
        [(300000, " ".join(f"imgw{j}" for j in range(25)))],
        "doc_id long, text string",
    )
    cur2, st2 = curate_corpus(
        spark,
        new_doc,
        images=spark.createDataFrame(
            [(300000, pgm(noisy))], "doc_id long, payload binary"
        ),
        image_store_dir=store,
        image_batch_id=1,
    )
    assert st2["image_neardup_dropped"] == 1 and st2["curated_rows"] == 0
    assert cur2.isEmpty()

    # audio twin of the gate: a planted near-dup recording pair keeps
    # its min-id member, the different loudness contour passes
    import struct as _struct

    def wav16(samples, rate=8000):
        data = _struct.pack(f"<{len(samples)}h", *samples)
        fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        body = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"data" + _struct.pack("<I", len(data)) + data)
        return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def tone(loud_set):
        out = []
        for s in range(64):
            amp = 1000 if s in loud_set else 10
            out.extend(amp if i % 2 == 0 else -amp for i in range(128))
        return out

    loud = {s for s in range(64) if s % 3 == 0}
    a_base = tone(loud)
    a_noisy = [v + (1 if k % 97 == 0 else 0) for k, v in enumerate(a_base)]
    a_diff = tone({s for s in range(64) if s % 3 != 0})
    audio = spark.createDataFrame(
        [(s1, wav16(a_base)), (s2, wav16(a_noisy)), (s3, wav16(a_diff))],
        "doc_id long, payload binary",
    )
    cur3, st3 = curate_corpus(spark, docs, audio=audio)
    ids3 = {r.doc_id for r in cur3.select("doc_id").collect()}
    assert st3["audio_neardup_dropped"] == 1
    assert s1 in ids3 and s2 not in ids3 and s3 in ids3

    # video twin: a noisy re-encode keeps its min-id member, different
    # footage passes (temporal-majority aHash over sampled frames)
    def y4m(frames):
        return b"YUV4MPEG2 W32 H32 F25:1 Ip A1:1 Cmono\n" + b"".join(
            b"FRAME\n" + bytes(f) for f in frames
        )

    v_base = [base] * 3
    v_noisy = [noisy] * 3
    v_diff = [inverted] * 3
    video = spark.createDataFrame(
        [(s1, y4m(v_base)), (s2, y4m(v_noisy)), (s3, y4m(v_diff))],
        "doc_id long, payload binary",
    )
    cur4, st4 = curate_corpus(spark, docs, video=video, video_every_nth=1)
    ids4 = {r.doc_id for r in cur4.select("doc_id").collect()}
    assert st4["video_neardup_dropped"] == 1
    assert s1 in ids4 and s2 not in ids4 and s3 in ids4


def test_curate_corpus_all_gates_composed(spark, tmp_path):
    """EVERYTHING ON at once (r8): one corpus through exact dedup,
    quality, repetition, decontamination, MinHash, the winnow STORE
    gate, the dense embedding gate, the image/audio/video hamming
    gates, and chunk-level dedup — with a planted victim for EVERY
    stage and the stats identity pinned to the input count. The
    flag-column staging (keep_mh → keep_wn → dense → modality gates)
    only composes correctly if each gate evaluates over the PREVIOUS
    gate's survivors — exactly where a silent stage-ordering bug
    would hide; the per-stage victims make any mis-ordering visible
    as a wrong drop count or a surviving victim."""
    import struct as _struct

    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # ten baseline survivors to aim the per-stage victims at
    base_curated, _ = curate_corpus(spark, docs)
    surv = [r.doc_id for r in base_curated.orderBy("doc_id").limit(10).collect()]
    s_dec, s_mh, s_d1, s_d2, s_i1, s_i2, s_a1, s_a2, s_v1, s_v2 = surv
    text_of = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id").isin(surv)).collect()
    }

    # planted victims, unique vocab so stages don't cross-couple
    span = " ".join(f"cgs{j}" for j in range(40))
    planted = [
        # exact dup of the decontam target's text (drops at stage 1)
        (900001, text_of[s_dec]),
        # quality: under min_words
        (900002, "too short to keep"),
        # repetition: distinct ratio fine, one bigram over the cap
        (900003, " ".join(f"cgr{j}" for j in range(20)) + " xq yq" * 10),
        # winnow pair: disjoint docs sharing the 40-word span (MinHash
        # misses it; the longer doc survives the winnow cluster)
        (900006, " ".join(f"cgwa{j}" for j in range(70)) + " " + span),
        (900007, " ".join(f"cgwb{j}" for j in range(60)) + " " + span),
        # chunk-dedup trio: one chunk-aligned 8-word boilerplate
        *[
            (
                900011 + i,
                " ".join(f"cgc{i}w{j}" for j in range(24))
                + " cgb1 cgb2 cgb3 cgb4 cgb5 cgb6 cgb7 cgb8",
            )
            for i in range(3)
        ],
    ]
    corpus = docs.unionByName(
        spark.createDataFrame(planted, "doc_id long, text string")
    )

    benchmark = spark.createDataFrame(
        [(0, text_of[s_dec])], "doc_id long, text string"
    )
    # minhash victim: whole-doc near-copy of s_mh (one word appended)
    corpus = corpus.unionByName(
        spark.createDataFrame(
            [(900005, text_of[s_mh] + " cgtail")], "doc_id long, text string"
        )
    )
    vec = [float(i) for i in range(1, 9)]
    embeddings = spark.createDataFrame(
        [(s_d1, vec), (s_d2, vec)], "doc_id long, embedding array<float>"
    )

    w = h = 32
    pix = [min(255, 4 * (x + y)) for y in range(h) for x in range(w)]
    noisy_pix = [
        min(255, p + 2) if k % 97 == 0 else p for k, p in enumerate(pix)
    ]
    pgm = lambda p: b"P5\n32 32\n255\n" + bytes(p)
    images = spark.createDataFrame(
        [(s_i1, pgm(pix)), (s_i2, pgm(noisy_pix))],
        "doc_id long, payload binary",
    )

    def wav16(samples):
        data = _struct.pack(f"<{len(samples)}h", *samples)
        fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"data" + _struct.pack("<I", len(data)) + data)
        return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    tone = []
    for s in range(64):
        amp = 1000 if s % 3 == 0 else 10
        tone.extend(amp if i % 2 == 0 else -amp for i in range(128))
    tone_noisy = [v + (1 if k % 97 == 0 else 0) for k, v in enumerate(tone)]
    audio = spark.createDataFrame(
        [(s_a1, wav16(tone)), (s_a2, wav16(tone_noisy))],
        "doc_id long, payload binary",
    )

    y4m = lambda frames: (
        b"YUV4MPEG2 W32 H32 F25:1 Ip A1:1 Cmono\n"
        + b"".join(b"FRAME\n" + bytes(f) for f in frames)
    )
    video = spark.createDataFrame(
        [(s_v1, y4m([pix] * 3)), (s_v2, y4m([noisy_pix] * 3))],
        "doc_id long, payload binary",
    )

    store = str(tmp_path / "cg_wn_store")
    curated, stats = curate_corpus(
        spark,
        corpus,
        benchmark=benchmark,
        winnow_store_dir=store,
        winnow_batch_id=0,
        embeddings=embeddings,
        images=images,
        audio=audio,
        video=video,
        video_every_nth=1,
        chunk_dedup=True,
    )
    curated = curated.persist()
    ids = {r.doc_id for r in curated.select("doc_id").collect()}

    # per-stage victims landed in THEIR stage's counter
    assert stats["exact_dups_dropped"] >= 1
    assert stats["quality_dropped"] >= 1 and 900002 not in ids
    assert stats["repetition_dropped"] >= 1 and 900003 not in ids
    assert stats["decontam_dropped"] >= 1 and s_dec not in ids
    assert stats["neardup_dropped"] >= 1
    assert len({s_mh, 900005} & ids) == 1  # minhash cluster survivor
    assert stats["winnow_dropped"] == 1
    assert 900006 in ids and 900007 not in ids  # longer doc survives
    assert stats["dense_neardup_dropped"] == 1
    assert len({s_d1, s_d2} & ids) == 1
    assert stats["image_neardup_dropped"] == 1
    assert s_i1 in ids and s_i2 not in ids  # min id survives
    assert stats["audio_neardup_dropped"] == 1
    assert s_a1 in ids and s_a2 not in ids
    assert stats["video_neardup_dropped"] == 1
    assert s_v1 in ids and s_v2 not in ids
    # chunk dedup: the trio survives doc-level, loses its shared chunk
    kept = {
        r.doc_id: r.text for r in curated.filter("doc_id >= 900011").collect()
    }
    assert set(kept) == {900011, 900012, 900013}
    assert all("cgb1" not in t for t in kept.values())

    # stats identity pinned to the input count across ALL stages
    assert stats["input_rows"] == corpus.count()
    assert stats["input_rows"] == stats["curated_rows"] + sum(
        stats[k]
        for k in (
            "exact_dups_dropped",
            "quality_dropped",
            "repetition_dropped",
            "decontam_dropped",
            "neardup_dropped",
            "winnow_dropped",
            "dense_neardup_dropped",
            "image_neardup_dropped",
            "audio_neardup_dropped",
            "video_neardup_dropped",
            "chunkdedup_docs_dropped",
        )
    )
    curated.unpersist()

    # the eager winnow-store write committed THIS run's fingerprints:
    # a second run's doc copying the span flags against the store
    cur2, st2 = curate_corpus(
        spark,
        spark.createDataFrame(
            [(910000, " ".join(f"cgz{j}" for j in range(30)) + " " + span)],
            "doc_id long, text string",
        ),
        winnow_store_dir=store,
        winnow_batch_id=1,
    )
    assert st2["winnow_dropped"] == 1 and cur2.isEmpty()


def test_curate_corpus_optional_stages_empty_inputs(spark, tmp_path):
    """P7 for the optional stages: an empty corpus (and empty
    benchmark/embeddings/images relations) runs the full pipeline with
    every stage on — zero rows, zero stats, no crash."""
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_emb = spark.createDataFrame([], "doc_id long, embedding array<float>")
    empty_img = spark.createDataFrame([], "doc_id long, payload binary")
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )

    curated, stats = curate_corpus(
        spark,
        empty_docs,
        winnow=True,
        benchmark=bench,
        embeddings=empty_emb,
        images=empty_img,
        audio=spark.createDataFrame([], "doc_id long, payload binary"),
        chunk_dedup=True,
    )
    assert curated.isEmpty()
    assert stats["input_rows"] == 0 == stats["curated_rows"]
    assert all(v == 0 for v in stats.values()), stats

    # a non-empty corpus with EMPTY optional relations degrades to the
    # core pipeline (gates pass everything through)
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(5)],
        "doc_id long, text string",
    )
    curated2, stats2 = curate_corpus(
        spark,
        docs,
        benchmark=bench,
        embeddings=empty_emb,
        images=empty_img,
    )
    assert stats2["curated_rows"] == curated2.count() == 5
    assert stats2["decontam_dropped"] == 0
    assert stats2["dense_neardup_dropped"] == 0
    assert stats2["image_neardup_dropped"] == 0


def test_curate_corpus_model_quality_gate(spark):
    """The optional model-based quality stage (r11): a trained NB
    classifier drops low-probability docs that PASS every heuristic
    gate (enough distinct words, no repetition) — the case the model
    stage exists for — while leaving clean docs and the stats identity
    intact; with the stage off the same spam survives."""
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus
    from crypto_data_pipeline_with_kafka_spark.functions.quality_model import (
        train_quality_classifier,
    )

    clean_vocab = (
        "the market closed higher after steady gains while analysts said "
        "results were broadly in line and officials kept rates unchanged "
        "with hiring stable and the outlook for energy prices described "
        "as balanced across most regions this quarter"
    ).split()
    spam_vocab = (
        "click buy cheap pills prize winner free deal offer link now fast "
        "money claim bonus win lottery casino jackpot discount sale promo "
        "code urgent limited exclusive instant guaranteed"
    ).split()

    def doc(vocab, salt, n=26):
        # rotate without repeating: passes min_words/distinct/repetition
        return " ".join(vocab[(salt * 3 + j) % len(vocab)] for j in range(n))

    # training set: DIFFERENT rotations from the same vocabularies
    labeled = spark.createDataFrame(
        [(i, doc(clean_vocab, 50 + i, 30), 1) for i in range(6)]
        + [(10 + i, doc(spam_vocab, 50 + i, 30), 0) for i in range(6)],
        "doc_id long, text string, label int",
    )
    model = train_quality_classifier(labeled, num_buckets=1 << 12)

    corpus = spark.createDataFrame(
        [(i, doc(clean_vocab, i)) for i in range(5)]
        + [(100 + i, doc(spam_vocab, i)) for i in range(3)],
        "doc_id long, text string",
    )

    # stage off: the spam passes every heuristic gate
    base, base_stats = curate_corpus(spark, corpus)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    assert {100, 101, 102} <= base_ids
    assert base_stats["model_quality_dropped"] == 0

    # stage on: exactly the spam drops, clean survivors unchanged
    cur, stats = curate_corpus(spark, corpus, quality_model=model)
    ids = {r.doc_id for r in cur.select("doc_id").collect()}
    assert ids == base_ids - {100, 101, 102}
    assert stats["model_quality_dropped"] == 3
    assert stats["input_rows"] == stats["curated_rows"] + sum(
        stats[k]
        for k in (
            "exact_dups_dropped",
            "quality_dropped",
            "repetition_dropped",
            "model_quality_dropped",
            "decontam_dropped",
            "neardup_dropped",
        )
    )


def test_curate_corpus_semantic_decontam_stage(spark):
    """The optional SEMANTIC decontamination stage (r11): a corpus doc
    whose embedding sits within the cosine threshold of a benchmark
    item drops even though its TEXT shares no n-grams with anything
    (the paraphrase-leakage case the k-gram stage cannot see); docs
    without an embedding row pass through; benchmark_embeddings
    without embeddings refuses; the stats identity holds."""
    import pytest

    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    def words(prefix, n=24):
        return " ".join(f"{prefix}{j}" for j in range(n))

    corpus = spark.createDataFrame(
        [(i, words(f"w{i}x")) for i in range(6)],
        "doc_id long, text string",
    )
    # doc 2 is a semantic twin of benchmark item 0; doc 3 has no
    # embedding row at all (passes through); others are far
    embeddings = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.05, 0.02, 0.99, 0.0]),
            (4, [0.0, 0.0, 0.0, 1.0]),
            (5, [0.5, -0.5, 0.0, 0.0]),
        ],
        "doc_id long, embedding array<float>",
    )
    bench_emb = spark.createDataFrame(
        [(900, [0.0, 0.0, 1.0, 0.0])], "doc_id long, embedding array<float>"
    )

    cur, stats = curate_corpus(
        spark,
        corpus,
        embeddings=embeddings,
        benchmark_embeddings=bench_emb,
        semantic_decontam_min_cosine=0.95,
    )
    ids = {r.doc_id for r in cur.select("doc_id").collect()}
    assert 2 not in ids and stats["semantic_decontam_dropped"] == 1
    assert {0, 1, 3, 4, 5} <= ids  # including the un-embedded doc 3
    assert stats["input_rows"] == stats["curated_rows"] + sum(
        stats[k]
        for k in (
            "exact_dups_dropped",
            "quality_dropped",
            "repetition_dropped",
            "model_quality_dropped",
            "decontam_dropped",
            "semantic_decontam_dropped",
            "neardup_dropped",
            "dense_neardup_dropped",
        )
    )

    with pytest.raises(ValueError, match="embeddings="):
        curate_corpus(spark, corpus, benchmark_embeddings=bench_emb)


def test_curate_corpus_decontam_only_embeddings(spark):
    """embedding_min_cosine=None switches the dense near-dup gate OFF
    (r11 advice: supplying embeddings= only to feed semantic
    decontamination used to silently activate the dense gate too):
    two dense near-dup docs BOTH survive with the gate off while the
    semantic-decontam drop still happens; with the default threshold
    the same corpus loses one of the pair to the dense gate."""
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    def words(prefix, n=24):
        return " ".join(f"{prefix}{j}" for j in range(n))

    corpus = spark.createDataFrame(
        [(i, words(f"w{i}x")) for i in range(4)],
        "doc_id long, text string",
    )
    # docs 0/1 are dense near-identical twins; doc 2 matches the
    # benchmark item; doc 3 is far from everything
    embeddings = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.001]),
            (1, [1.0, 0.0, 0.0, 0.002]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "doc_id long, embedding array<float>",
    )
    bench_emb = spark.createDataFrame(
        [(900, [0.0, 0.0, 1.0, 0.0])], "doc_id long, embedding array<float>"
    )

    cur, stats = curate_corpus(
        spark,
        corpus,
        embeddings=embeddings,
        benchmark_embeddings=bench_emb,
        semantic_decontam_min_cosine=0.95,
        embedding_min_cosine=None,
    )
    ids = {r.doc_id for r in cur.select("doc_id").collect()}
    assert ids == {0, 1, 3}
    assert stats["semantic_decontam_dropped"] == 1
    assert stats["dense_neardup_dropped"] == 0

    cur_on, stats_on = curate_corpus(
        spark,
        corpus,
        embeddings=embeddings,
        benchmark_embeddings=bench_emb,
        semantic_decontam_min_cosine=0.95,
    )
    ids_on = {r.doc_id for r in cur_on.select("doc_id").collect()}
    assert stats_on["dense_neardup_dropped"] == 1
    assert len(ids_on & {0, 1}) == 1 and 3 in ids_on


def test_weighted_sample_exact(spark):
    """Efraimidis-Spirakis weighted sampling (r12): (a) the selected
    SET matches a sequential reference computing the identical
    quantized ln(u)/w keys; (b) determinism across runs and plans as
    TakeOrderedAndProject (partial top-n, no global sort); (c) heavy
    weights dominate: with a 1000:1 weight split, the top half of the
    draw is overwhelmingly heavy rows; (d) per-stratum mode draws n
    within each stratum; (e) n >= rows returns everything; (f) a
    non-positive weight raises in-plan, n < 1 eagerly."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pytest

    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        weighted_sample_exact,
    )

    rows = [
        (i, "heavy" if i % 2 == 0 else "light", 1000.0 if i % 2 == 0 else 1.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")

    def ref_key(i, w):
        h = hashlib.md5(f"wsample-v1|{i}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / float(16**13)
        k = math.log(u) / w
        return Decimal(repr(k)).quantize(Decimal("1e-9"), ROUND_HALF_UP)

    want = {
        i for i, _, w in sorted(
            rows, key=lambda r: (-ref_key(r[0], r[2]), r[0])
        )[:50]
    }
    got = {r.doc_id for r in weighted_sample_exact(df, 50, "w").collect()}
    assert got == want
    got2 = {r.doc_id for r in weighted_sample_exact(df, 50, "w").collect()}
    assert got2 == got

    plan = weighted_sample_exact(df, 50, "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy >= 45, heavy  # 1000:1 weights — light rows are rare draws

    strat = weighted_sample_exact(df, 10, "w", strata_cols=["grp"]).collect()
    by_grp = {}
    for r in strat:
        by_grp.setdefault(r.grp, []).append(r.doc_id)
    assert len(by_grp["heavy"]) == 10 and len(by_grp["light"]) == 10

    assert weighted_sample_exact(df, 1000, "w").count() == 200

    bad = spark.createDataFrame(
        [(0, 1.0), (1, 0.0)], "doc_id long, w double"
    )
    with pytest.raises(Exception, match="non-positive"):
        weighted_sample_exact(bad, 1, "w").collect()
    nan_bad = spark.createDataFrame(
        [(0, 1.0), (1, float("nan"))], "doc_id long, w double"
    )
    # NaN orders greater than every number in Spark, so a bare w > 0
    # guard would silently admit it — the guard must refuse loudly
    with pytest.raises(Exception, match="NaN"):
        weighted_sample_exact(nan_bad, 1, "w").collect()
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample_exact(df, 0, "w")


def test_nbq_leg_null_lang_and_text_alignment(spark, tmp_path):
    """The nbq leg's NULL semantics (r12 review finding): on a corpus
    with NULL lang and NULL text rows, the Spark leg and its DuckDB
    oracle agree — NULL lang is class-0 evidence on BOTH sides
    (eqNullSafe ↔ CASE ELSE; the prior's nn uses IS DISTINCT FROM so
    the doc also counts), and a NULL-text doc surfaces as a row with
    NULL n_feats/logit in both engines instead of vanishing from one."""
    import duckdb

    from crypto_data_pipeline_with_kafka_spark.functions.quality_model import (
        score_with_quality_classifier,
        train_quality_classifier,
    )
    from crypto_data_pipeline_with_kafka_spark.plans.q_text import (
        _NBQ_BUCKETS,
        _NBQ_SQL,
    )
    from pyspark.sql import functions as F
    from tests.oracle_utils import _normalize

    import numpy as np
    import pandas as pd

    rows = [
        (0, "alpha beta gamma", "en", "s0", 16),
        (1, "delta epsilon", "fr", "s0", 13),
        (2, "alpha beta beta", None, "s1", 15),   # NULL lang, even id
        (3, None, "en", "s1", 0),                 # NULL text
        (4, "zeta eta theta", "en", "s0", 14),
        (5, "iota kappa", None, "s1", 10),        # NULL lang, odd id
        (6, "beta beta beta", "de", "s0", 14),
        (7, "alpha gamma", "en", "s0", 11),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pq = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(pq)

    labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", F.col("lang").eqNullSafe(F.lit("en")).cast("int")
    )
    model = train_quality_classifier(labeled, num_buckets=_NBQ_BUCKETS)
    got = (
        score_with_quality_classifier(docs, model)
        .select(
            F.col("doc_id").cast("string").alias("k1"),
            F.col("n_feats").cast("long").alias("n"),
            F.col("quality_logit").alias("v"),
        )
        .toPandas()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = con.execute(
        f"SELECT k1, n, v FROM ({_NBQ_SQL})"
    ).df()
    g, w = _normalize(got), _normalize(want)
    assert len(g) == len(w) == 8
    for c in ("k1", "n"):
        assert (
            (g[c] == w[c]) | (g[c].isna() & w[c].isna())
        ).all(), (c, g, w)
    close = np.isclose(
        g["v"].astype(float).fillna(0), w["v"].astype(float).fillna(0),
        atol=0.0, rtol=0.0,
    )
    assert (
        close & (g["v"].isna() == w["v"].isna()) | (g["v"].isna() & w["v"].isna())
    ).all(), pd.concat([g, w], axis=1)
    # the NULL-text doc surfaces as missing in both engines
    assert g.loc[g.k1 == "3", "v"].isna().all()
    assert w.loc[w.k1 == "3", "v"].isna().all()


def test_url_canonicalize_and_registrable_domain(spark):
    """canonicalize_url: scheme/host lowercased; userinfo, default AND
    non-default ports, fragment dropped; tracking params stripped
    (utm_ prefix + exact names) with survivors SORTED; trailing slash
    stripped (root collapses to bare authority); NULL / scheme-less
    input gives NULL; idempotent. registrable_domain: multi-part-TLD
    heuristic (co.uk keeps three labels), www/subdomains fall away,
    IPv4 hosts returned whole, two-label hosts pass through."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.functions.urls import (
        canonicalize_url,
        registrable_domain,
    )

    cases = [
        (
            "HTTPS://User:pw@WWW.News3.Example.CO.UK:443/articles/42/"
            "?utm_source=feed&id=9&utm_campaign=x&b=2&a=1#frag",
            "https://www.news3.example.co.uk/articles/42?a=1&b=2&id=9",
            "example.co.uk",
        ),
        ("http://example.com/", "http://example.com", "example.com"),
        ("http://example.com", "http://example.com", "example.com"),
        ("https://sub.a.co.jp:8080/p/?gclid=z", "https://sub.a.co.jp/p",
         "a.co.jp"),
        ("https://192.168.0.1/x?a=1", "https://192.168.0.1/x?a=1",
         "192.168.0.1"),
        ("https://h.io/p/?utm_a=1&utm_b=2", "https://h.io/p", "h.io"),
        ("https://localhost/x", "https://localhost/x", "localhost"),
        ("no-scheme.example.com/path", None, None),
        (None, None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = df.select(
        "url",
        canonicalize_url("url").alias("c"),
        registrable_domain("url").alias("d"),
    ).collect()
    by_url = {r.url: (r.c, r.d) for r in got}
    for u, want_c, want_d in cases:
        assert by_url[u] == (want_c, want_d), u
    # idempotence: canonicalizing the canonical form is a no-op
    twice = df.select(canonicalize_url("url").alias("c")).select(
        F.col("c"), canonicalize_url(F.col("c")).alias("c2")
    ).collect()
    assert all(r.c2 == r.c for r in twice)


def test_curate_corpus_url_dedup_stage(spark):
    """url_col threads URL dedup through curate_corpus as stage 0:
    canonical-URL twins dedup to the min id (a tracking-param or
    case/port variant of the same URL counts as a dup), docs with a
    NULL url never URL-dedup, the exact-dedup survivor of a content
    group is never a url-dropped row, url_dups_dropped accounts the
    stage, and the default path (url_col=None) emits 0 unchanged."""
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    def words(tag, n=22):
        return " ".join(f"{tag}{i}" for i in range(n))

    docs = spark.createDataFrame(
        [
            (0, words("a"), "https://ex.com/a?utm_source=x"),
            # same canonical URL as doc 0 (case + default port): url dup
            (1, words("b"), "HTTPS://EX.com:443/a"),
            (2, words("c"), None),
            # same TEXT as doc 2, distinct url: exact dup, min id wins
            (3, words("c"), "https://ex.com/c"),
            # fragment-only variant of doc 0's URL: url dup
            (4, words("d"), "https://ex.com/a#frag"),
            # content-group ordering: doc 5 is a url dup of doc 0 AND
            # shares its text with doc 6 (url-kept) — the content
            # survivor must be doc 6, not the url-dropped doc 5
            (5, words("e"), "https://ex.com/a?utm_campaign=y"),
            (6, words("e"), "https://other.net/e"),
        ],
        ["doc_id", "text", "url"],
    )
    cur, st = curate_corpus(spark, docs, url_col="url")
    kept = sorted(r.doc_id for r in cur.collect())
    assert kept == [0, 2, 6]
    assert st["url_dups_dropped"] == 3  # docs 1, 4, 5
    assert st["exact_dups_dropped"] == 1  # doc 3 (text twin of doc 2)
    assert st["curated_rows"] == 3

    # default path: no url stage, zero accounting, content dedup only
    cur0, st0 = curate_corpus(spark, docs)
    assert st0["url_dups_dropped"] == 0
    assert st0["exact_dups_dropped"] == 2  # docs 3 and 6 (text twins)
    assert sorted(r.doc_id for r in cur0.collect()) == [0, 1, 2, 4, 5]
    spark.catalog.clearCache()


def test_domain_mixture_composition(spark):
    """registrable_domain feeds resample_to_mixture as the source
    column — the domain-rebalancing composition: per-domain counts
    respect the mixture bound and the draw is deterministic."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.functions.urls import (
        registrable_domain,
    )
    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        resample_to_mixture,
    )

    rows = [
        (i, f"https://www.a{i % 3}.ex.com/p/{i}" if i % 4 else
            f"https://cdn.other.co.uk/v/{i}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "url"]).withColumn(
        "source", registrable_domain(F.col("url"))
    )
    doms = {r.source for r in docs.select("source").distinct().collect()}
    assert doms == {"ex.com", "other.co.uk"}
    mix = {"ex.com": 0.5, "other.co.uk": 0.5}
    out1 = resample_to_mixture(docs, mix, source_col="source")
    out2 = resample_to_mixture(docs, mix, source_col="source")
    got1 = sorted(r.doc_id for r in out1.collect())
    assert got1 == sorted(r.doc_id for r in out2.collect())  # deterministic
    by_src = {
        r.source: r.n
        for r in out1.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # 50 other.co.uk docs bound T at 100; each source supplies ~50
    # (binomial around the exact rate, so allow the draw's spread)
    assert set(by_src) == {"ex.com", "other.co.uk"}
    assert by_src["other.co.uk"] == 50  # rate 1.0 side is exact
    assert 30 <= by_src["ex.com"] <= 70


def test_normalize_text_semantics(spark):
    """normalize_text: NFC composes decomposed sequences, lowercase
    and whitespace collapse+trim follow, NULL passes through, the
    form=None path is pure JVM (still lowers/collapses), unknown form
    fails fast, and each step is independently switchable."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        normalize_text,
    )

    rows = [
        ("  CaFÉ du  Parc\t",),  # decomposed accent, mess
        ("Café du Parc",),        # composed twin
        ("ALL  CAPS\n\nhere",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [r.n for r in df.select(normalize_text("t").alias("n")).collect()]
    assert got[0] == got[1] == "café du parc"
    assert got[2] == "all caps here"
    assert got[3] is None
    # form=None skips the Arrow hop but still lowers + collapses
    jvm_only = [
        r.n
        for r in df.select(
            normalize_text("t", form=None).alias("n")
        ).collect()
    ]
    assert jvm_only[0] == "café du parc"  # stays decomposed
    assert jvm_only[2] == "all caps here"
    # switches
    keep_case = df.select(
        normalize_text("t", lowercase=False).alias("n")
    ).collect()[2].n
    assert keep_case == "ALL CAPS here"
    keep_ws = df.select(
        normalize_text("t", collapse_whitespace=False).alias("n")
    ).collect()[0].n
    assert keep_ws == "  café du  parc\t"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown Unicode form"):
        normalize_text("t", form="NFX")


def test_curate_corpus_normalize_stage(spark):
    """normalize=True rewrites text before any verdict: case/spacing/
    composed-form variants of one document exact-dedup to a single
    survivor, downstream stages and the curated output see the
    normalized form, and the unicode_form knob fails fast on typos
    unconditionally (the chunk_boundaries rule)."""
    from crypto_data_pipeline_with_kafka_spark.curation import curate_corpus

    body = " ".join(f"w{i}" for i in range(24))
    docs = spark.createDataFrame(
        [
            (0, f"{body} café terrace"),   # decomposed
            (1, f"{body.upper()}  CAFÉ TERRACE "),  # composed, caps
            (2, f"{body} café terrace"),    # composed, lower
            (3, " ".join(f"z{i}" for i in range(24))),
        ],
        ["doc_id", "text"],
    )
    cur, st = curate_corpus(spark, docs, normalize=True)
    kept = {r.doc_id: r.text for r in cur.collect()}
    assert sorted(kept) == [0, 3]
    assert kept[0] == f"{body} café terrace"  # rewritten form
    assert st["exact_dups_dropped"] == 2
    # without normalization all four texts are distinct
    _, st0 = curate_corpus(spark, docs)
    assert st0["exact_dups_dropped"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unicode_form"):
        curate_corpus(spark, docs, unicode_form="NFX")
    spark.catalog.clearCache()
