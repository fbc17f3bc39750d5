"""Product quantization: codebook training (raw + residual), encode,
ADC serving (pq_topk / ivf_pq_topk) with the exact-decimal two-pass,
and the _PQServeInputs hook-guard constructor. Split out of the single
similarity module in r11 (mechanical move, no behavior change)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (
    _ACC,
    _QDEC,
    _dot_exact_decimal,
    _ensure_ann_base,
    _rank_topk,
    cosine_for_pairs,
    dbl_vector,
    dot_double,
    dot_exact,
    quantized_vector,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.ivf import (
    _seed_centroids,
    ivf_assignments,
    lloyd_refined_centroids,
    resolve_num_centroids,
)

# ----------------------------------------------------- product quantization


def pq_pick_ids(
    emb: DataFrame,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """(sub_id, code, id) of :func:`pq_train`'s seeded pick — the pick
    rule ranks ids by md5(sub_id|id) and never looks at a vector VALUE,
    so ONE pick relation (O(m·k) rows, pin it) seeds every codebook a
    suite trains over the same corpus: raw books from the raw vectors,
    residual books from the residuals (r10 — the rivfpq leg's book
    training re-ran the whole ranked pick pass the raw leg had already
    paid). Value-free also means slimmer: the two pick shuffles move
    (id, sub_id, hash) rows, not m sliced sub-vectors per row. Thread
    through ``pq_train(picks=)`` / ``pq_train_residual(picks=)`` /
    ``ivf_pq_topk(pq_picks=)``; identical picks (and therefore
    identical books) to the in-call pass, pytest-pinned.

    The relation is GEOMETRY-STAMPED (literal ``_pm``/``_pk`` columns
    = this call's num_subvectors/codes_per_subvector): picks are
    positional seeds, and a consumer trained at a different geometry
    would mis-train PLAUSIBLY — a range check alone misses a SMALLER
    pick geometry (an 8×8 picks relation passes every 8×16 range and
    even ``_packed_codebooks``' uniform-dense validation, because the
    pack derives m·k from the book itself) — so ``pq_train`` refuses
    unstamped relations at plan-build and mismatched stamps in-row."""
    exploded = emb.select(F.col(id_col)).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(num_subvectors - 1))
        ).alias("sub_id"),
        F.spark_partition_id().alias("_pid"),
    ).withColumn(
        "_sk",
        F.md5(
            F.concat(
                F.col("sub_id").cast("string"),
                F.lit("|"),
                F.col(id_col).cast("string"),
            )
        ),
    )
    w_local = Window.partitionBy("sub_id", "_pid").orderBy(
        "_sk", F.col(id_col)
    )
    pruned = (
        exploded.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= codes_per_subvector)
    )
    w_glob = Window.partitionBy("sub_id").orderBy("_sk", F.col(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= codes_per_subvector)
        .select(
            F.col("sub_id").cast("int").alias("sub_id"),
            (F.col("_rn") - 1).cast("int").alias("code"),
            F.col(id_col),
            F.lit(num_subvectors).cast("int").alias("_pm"),
            F.lit(codes_per_subvector).cast("int").alias("_pk"),
        )
    )


def pq_train(
    emb: DataFrame,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    lloyd_rounds: int = 0,
    exact: bool = False,
    prequantized: bool = False,
    picks: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011) — the memory
    side of the ANN story: each vector splits into ``num_subvectors``
    sub-vectors and each sub-vector is later replaced by the id of its
    nearest codebook entry, so a 64-dim float32 embedding (256 B)
    serves from ``num_subvectors`` bytes of codes (32× at the defaults;
    a billion-vector store drops from ~256 GB of vectors to ~8 GB of
    codes + a KB-scale codebook). Returns (sub_id, code, cvec
    array<double>, cnorm_sq) — O(m·k) rows, broadcastable by
    construction.

    Deterministic training, like every trainer in this module: the
    codebook for sub-space j is the ``codes_per_subvector`` corpus
    sub-vectors with the smallest md5(j|id) — a per-sub-space seeded
    pseudo-random draw. ``lloyd_rounds > 0`` refines each sub-space's
    codebook with that many deterministic k-means rounds
    (``lloyd_refined_centroids`` over the sub-vector relation) — the
    production polish: random-pick codes are COVERAGE, k-means codes
    are fit, and on a near-orthogonal corpus the refinement is what
    lifts ADC recall (measured in the tests). The seeded pick runs ALL
    sub-spaces in one pass (explode + two-level per-sub-space top-k —
    see the inline note), never a corpus shuffle keyed on m hot values;
    Lloyd refinement trains each sub-space independently as
    ``num_subvectors`` small iterative jobs.

    ``exact=True`` stores trunc-quantized long components and
    exact-decimal ``cnorm_sq`` instead of doubles (module-header
    convention) — the ORACLE-CHECKABLE numeric mode: every downstream
    distance/score is then an exact integer a SQL twin reproduces
    bitwise. Same picks, same plan shape; the double mode stays the
    fast production path. Pass ``dim`` to skip the one-row inference
    job (same threading contract as ``num_centroids``).

    ``prequantized=True`` (exact mode only): ``vec_col`` ALREADY holds
    trunc-quantized longs at the module scale — skip the quantization
    step. This is how residual training stays an exact integer
    pipeline: :func:`pq_train_residual` quantizes x and c separately
    and subtracts in integer space (quantizing the double difference
    instead would re-truncate an already-rounded value, and the
    off-by-one-ulp cases diverge between engines)."""
    if prequantized and not exact:
        raise ValueError(
            "prequantized=True only pairs with exact=True: the double "
            "path consumes raw components directly"
        )
    if exact and lloyd_rounds > 0:
        raise ValueError(
            "exact=True requires lloyd_rounds=0: Lloyd means are "
            "IEEE-double centroids, not oracle-replayable integers"
        )
    if picks is not None and lloyd_rounds > 0:
        raise ValueError(
            "picks= seeds the md5 draw; Lloyd refinement re-derives "
            "its own seeds per sub-space — drop one"
        )
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    if dim % num_subvectors != 0:
        raise ValueError(f"dim {dim} not divisible by {num_subvectors} subvectors")
    d = dim // num_subvectors
    norm_fn = _dot_exact_decimal if exact else dot_double
    if picks is not None:
        # shared seeded pick (see pq_pick_ids): fetch the picked rows'
        # vectors with one broadcast join over the corpus scan and
        # slice in-row — the ranked pick pass ran ONCE for the suite,
        # not once per book. The picks relation is POSITIONAL input
        # like codes=/adc_side=, so mismatches refuse loudly instead
        # of mis-training plausibly (r10 review, twice): the relation
        # must carry pq_pick_ids' geometry STAMP (a bare range check
        # missed a SMALLER pick geometry — an 8×8 picks passes every
        # 8×16 range check AND _packed_codebooks' uniform-dense
        # validation, which derives m·k from the book itself), checked
        # in-row on the cvec column every consumer reads (an in-plan
        # guard only fires in plans that keep its column — a bare
        # .count() prunes everything, the module-wide in-plan-guard
        # caveat). A STALE-corpus picks relation (picked ids no longer
        # in emb, silently dropped by this join) leaves the book short
        # and IS caught by _packed_codebooks downstream.
        if "_pm" not in picks.columns or "_pk" not in picks.columns:
            raise ValueError(
                "picks= must be a pq_pick_ids relation (geometry-"
                "stamped _pm/_pk columns): picks are positional seeds, "
                "and an unstamped relation cannot prove it was built "
                "at this call's num_subvectors/codes_per_subvector"
            )
        if prequantized:
            full = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        else:
            full = quantized_vector(vec_col) if exact else dbl_vector(vec_col)
        geom_ok = (F.col("_pm") == num_subvectors) & (
            F.col("_pk") == codes_per_subvector
        )
        sub = F.slice(F.col("_v"), F.col("sub_id") * d + 1, F.lit(d))
        # the raise's cast type-matches BOTH modes' cvec element type
        cvec_ck = F.when(geom_ok, sub).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pq_train(picks=): picks were built at "),
                    F.col("_pm").cast("string"),
                    F.lit("x"),
                    F.col("_pk").cast("string"),
                    F.lit(
                        f" but this call trains {num_subvectors}x"
                        f"{codes_per_subvector} — a foreign-geometry "
                        "pick mis-addresses sub-spaces while the book "
                        "stays plausible-looking (pq_pick_ids takes "
                        "the same num_subvectors/codes_per_subvector)"
                    ),
                )
            ).cast("array<bigint>" if (exact or prequantized) else "array<double>")
        )
        return (
            emb.select(F.col(id_col), full.alias("_v"))
            .join(F.broadcast(picks), id_col)
            .select(
                F.col("sub_id").cast("int").alias("sub_id"),
                F.col("code").cast("int").alias("code"),
                cvec_ck.alias("cvec"),
                norm_fn(cvec_ck, cvec_ck).alias("cnorm_sq"),
            )
        )
    if lloyd_rounds > 0:
        books = []
        for j in range(num_subvectors):
            sub = F.transform(
                F.slice(vec_col, j * d + 1, d), lambda x: x.cast("double")
            )
            refined = lloyd_refined_centroids(
                emb.select(F.col(id_col), sub.alias("_sub")),
                num_centroids=codes_per_subvector,
                rounds=lloyd_rounds,
                id_col=id_col,
                vec_col="_sub",
            )
            books.append(
                refined.select(
                    F.lit(j).alias("sub_id"),
                    (F.col("centroid_id") - 1).cast("int").alias("code"),
                    "cvec",
                    norm_fn(F.col("cvec"), F.col("cvec")).alias("cnorm_sq"),
                )
            )
        out = books[0]
        for b in books[1:]:
            out = out.unionByName(b)
        return out
    # seeded pick, ALL sub-spaces in ONE pass: each corpus row explodes
    # into its m (sub_id, sub-vector) rows, then a two-level top-k —
    # row_number within (sub_id, input partition) prunes to k rows per
    # group map-sized, the global window per sub_id ranks only the
    # surviving m·k·P rows. Same picks and codes as the former
    # per-sub-space orderBy().limit() loop (top-k by (_sk, id) is
    # order-insensitive to the pruning level), but 3 stages instead of
    # 2·m TakeOrdered jobs — and no single hot key: the first shuffle
    # spreads over m × input-partition-count groups, each bounded by
    # one input partition's rows
    if prequantized:
        full = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    else:
        full = quantized_vector(vec_col) if exact else dbl_vector(vec_col)
    exploded = (
        emb.select(F.col(id_col), full.alias("_v"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.lit(num_subvectors - 1))
            ).alias("sub_id"),
            F.col("_v"),
            F.spark_partition_id().alias("_pid"),
        )
        .select(
            F.col(id_col),
            F.col("sub_id"),
            "_pid",
            F.slice(F.col("_v"), F.col("sub_id") * d + 1, F.lit(d)).alias(
                "cvec"
            ),
            F.md5(
                F.concat(
                    F.col("sub_id").cast("string"),
                    F.lit("|"),
                    F.col(id_col).cast("string"),
                )
            ).alias("_sk"),
        )
    )
    w_local = Window.partitionBy("sub_id", "_pid").orderBy(
        "_sk", F.col(id_col)
    )
    pruned = (
        exploded.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= codes_per_subvector)
    )
    w_glob = Window.partitionBy("sub_id").orderBy("_sk", F.col(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= codes_per_subvector)
        .select(
            F.col("sub_id").cast("int").alias("sub_id"),
            (F.col("_rn") - 1).cast("int").alias("code"),
            "cvec",
            norm_fn(F.col("cvec"), F.col("cvec")).alias("cnorm_sq"),
        )
    )


def pq_train_residual(
    emb: DataFrame,
    centroids: DataFrame,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    lloyd_rounds: int = 0,
    exact: bool = False,
    picks: DataFrame | None = None,
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """PQ codebooks over RESIDUALS x − c(x) against a FIXED cell
    geometry (the IVFADC training step): assign each vector its primary
    cell (broadcast O(C) centroids, in-row — zero shuffles), subtract
    the centroid vector, train :func:`pq_train` over the residual
    relation. The returned books carry a literal ``residual`` boolean
    column — the tag :func:`ivf_pq_topk` / :func:`pq_topk` check so
    residual codes are never silently decoded as raw reconstructions
    (or vice versa): codes are positional references whose MEANING
    depends on what was quantized, and a mismatch mis-scores
    plausibly instead of erroring. Train once over a bootstrap corpus,
    then pass as ``pq_codebooks=`` to :func:`incremental_ivf_update` —
    the store detects the tag, encodes each arriving batch's residuals
    against its assigned cells, and ``retrain_ivf_store`` RE-ENCODES
    the codes against the new geometry in its re-assignment pass
    (residual codes die with their geometry; the retrain pass is
    exactly where the new geometry and every stored vector meet).

    ``exact=True`` (r9): the ORACLE-CHECKABLE residual layout. x and c
    are trunc-quantized to longs SEPARATELY and subtracted in INTEGER
    space — rq_i = trunc(x_i·s) − trunc(c_i·s) — so the residual
    relation is exact integers a SQL twin re-derives (quantizing the
    double difference would re-truncate a rounded value; the
    off-by-one cases diverge). The returned books hold long components
    at the module scale and pass straight to the exact encode / LUT /
    ADC machinery. Exact books are a QUERY-path artifact: the
    incremental store encodes batches in the production double mode
    and refuses exact books loudly at plan-build
    (``_check_codebook_mode`` — pytest-pinned), the same idiom as
    every other mode mismatch in this module.

    ``corpus_cells`` accepts an already-derived (id, centroid_id)
    PRIMARY-cell relation over the SAME geometry (e.g. a suite's ranked
    ``ivf_assignments(with_rank=True)`` filtered to ``probe_rank == 1``)
    so training reuses one corpus-vs-centroids scoring pass instead of
    re-running its own ``probes=1`` assignment — the same hook contract
    as :func:`ivf_pq_topk`'s ``assignments=``: the caller asserts the
    cells came from the ``centroids=`` passed here (r16; the un-hooked
    form cost the suite one extra O(corpus·C) pass per residual
    training)."""
    if exact:
        if lloyd_rounds > 0:
            raise ValueError(
                "exact=True requires lloyd_rounds=0 (see pq_train)"
            )
        base = emb.select(F.col(id_col), dbl_vector(vec_col).alias("_vd"))
        assign = (
            corpus_cells.select(F.col(id_col), "centroid_id")
            if corpus_cells is not None
            else ivf_assignments(
                base, probes=1, id_col=id_col, vec_col="_vd",
                centroids=centroids,
            )
        )
        res = (
            base.join(assign, id_col)
            .join(
                F.broadcast(
                    centroids.select(
                        "centroid_id", F.col("cvec").alias("_cvec")
                    )
                ),
                "centroid_id",
            )
            .select(
                F.col(id_col),
                F.zip_with(
                    quantized_vector("_vd"),
                    quantized_vector("_cvec"),
                    lambda a, b: a - b,
                ).alias("_rvec"),
            )
        )
        return pq_train(
            res, num_subvectors, codes_per_subvector, id_col=id_col,
            vec_col="_rvec", dim=dim, exact=True, prequantized=True,
            picks=picks,
        ).withColumn("residual", F.lit(True))
    base = emb.select(F.col(id_col), dbl_vector(vec_col).alias("_vd"))
    assign = (
        corpus_cells.select(F.col(id_col), "centroid_id")
        if corpus_cells is not None
        else ivf_assignments(
            base, probes=1, id_col=id_col, vec_col="_vd", centroids=centroids
        )
    )
    res = (
        base.join(assign, id_col)
        .join(
            F.broadcast(
                centroids.select("centroid_id", F.col("cvec").alias("_cvec"))
            ),
            "centroid_id",
        )
        .select(
            F.col(id_col),
            F.zip_with("_vd", "_cvec", lambda a, b: a - b).alias("_rvec"),
        )
    )
    return pq_train(
        res, num_subvectors, codes_per_subvector, id_col=id_col,
        vec_col="_rvec", dim=dim, lloyd_rounds=lloyd_rounds, picks=picks,
    ).withColumn("residual", F.lit(True))


def _check_residual_tag(
    codebooks: DataFrame, residual: bool, caller: str
) -> None:
    """Residual codebooks (``pq_train_residual``) carry a literal
    ``residual`` column; raw books don't. A mismatch between the tag
    and the caller's decode mode never errors on its own — raw codes
    decoded as residuals (or residuals as raw) produce plausible
    scores with collapsed recall — so refuse at plan-build from the
    schema, the same idiom as ``_check_codebook_mode``."""
    tagged = "residual" in codebooks.columns
    if tagged and not residual:
        raise ValueError(
            f"{caller}: codebooks carry the residual tag (trained by "
            "pq_train_residual over x − c(x)) but the caller decodes "
            "raw reconstructions — pass residual=True with the cell "
            "geometry the books were trained against"
        )
    if residual and not tagged:
        raise ValueError(
            f"{caller}: residual=True with UNTAGGED codebooks — these "
            "books quantize raw vectors (e.g. a read_ivf_pq_store "
            "raw-layout store), and decoding their codes as residuals "
            "mis-scores silently; train residual books with "
            "pq_train_residual (which tags them) or drop residual=True"
        )


def _check_codebook_mode(codebooks: DataFrame, exact: bool, caller: str) -> None:
    """exact=True pairs with LONG (trunc-quantized, ×1e12-scale)
    codebook components from ``pq_train(exact=True)``; exact=False
    with doubles. A mismatch would not error — it silently mis-scores
    (raw-scale sub-vectors against 1e12-scale entries collapse every
    distance to ~|cvec|², assigning one code corpus-wide) — so refuse
    at plan-build from the schema."""
    dt = dict(codebooks.dtypes).get("cvec", "<missing>")
    want = "array<bigint>" if exact else "array<double>"
    if dt != want:
        raise ValueError(
            f"{caller}: codebook cvec type {dt} does not match "
            f"exact={exact} (expected {want}) — exact mode pairs with "
            "pq_train(exact=True) quantized-long components, the "
            "default double mode with double components"
        )


def _packed_codebooks(codebooks: DataFrame):
    """ONE row holding every codebook entry sorted by (sub_id, code) —
    the broadcastable O(m·k) relation every PQ stage crossJoins.

    Validates the pack: every downstream consumer addresses entry
    (sub_id=j, code=c) by ARRAY POSITION j·(kmax+1)+c+1, which silently
    mis-scores if a caller-supplied codebook has ragged per-sub-space
    entry counts or non-dense codes (``pq_train`` always emits uniform
    dense books; external parquet might not). The sorted pack is valid
    iff entry p (0-based) is exactly (sub_id = p div k, code = p mod k)
    — one in-row forall, raised loudly.

    The pack is MEMOIZED per books relation (Python object identity)
    and PINNED (r11): a serve leg crossJoins this single row from two
    stages (query LUTs + corpus ADC side) and a suite sharing one
    pinned books relation from up to six, and un-memoized every
    consumer re-ran the collect_list aggregation with its own AQE
    stage materializations (r11 job audit: the rivfpq leg alone spent
    ~7 of its 21 fixed jobs re-packing). The eager pin runs the
    validity guard at pack time instead of first consumer execution —
    the same loud failure, one job earlier, once per books object."""
    cached = getattr(codebooks, "_pq_packed_pin", None)
    if cached is not None:
        return cached
    packed = codebooks.agg(
        F.sort_array(
            F.collect_list(F.struct("sub_id", "code", "cvec", "cnorm_sq"))
        ).alias("_cb")
    )
    cb = F.col("_cb")
    k = (
        F.aggregate(cb, F.lit(-1), lambda acc, c: F.greatest(acc, c["code"]))
        + 1
    )
    m = (
        F.aggregate(cb, F.lit(-1), lambda acc, c: F.greatest(acc, c["sub_id"]))
        + 1
    )
    positional = F.transform(
        cb,
        lambda c, p: (c["sub_id"] == F.floor(p / k).cast("int"))
        & (c["code"] == p % k),
    )
    valid = (F.size(cb) == m * k) & F.forall(positional, lambda x: x)
    pinned = packed.select(
        F.when(valid, cb)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "pq codebooks must be uniform and dense: every "
                        "sub_id needs the same entry count with codes "
                        "0..k-1 (positional ADC addressing) — got "
                    ),
                    F.size(cb).cast("string"),
                    F.lit(" entries for "),
                    m.cast("string"),
                    F.lit(" sub-spaces with max code "),
                    (k - 1).cast("string"),
                )
            )
        )
        .alias("_cb")
    ).localCheckpoint()
    codebooks._pq_packed_pin = pinned
    return pinned


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    prequantized: bool = False,
) -> DataFrame:
    """(id, codes array<int>): each sub-vector replaced by its nearest
    codebook entry (squared L2, left-to-right fold — the order a
    sequential reference reproduces bitwise; ties keep the SMALLER
    code). In-row math against the broadcast packed codebooks — zero
    shuffles, the encode pass pipelines into the scan.

    ``exact=True`` pairs with an ``exact`` codebook: distances are
    exact integer decimals over trunc-quantized components, so the
    argmin (ties to the smaller code) is engine-independent and a SQL
    oracle re-derives every code bitwise. ``prequantized=True``:
    ``vec_col`` already holds quantized longs (the exact-residual
    convention — see :func:`pq_train`)."""
    if prequantized and not exact:
        raise ValueError("prequantized=True only pairs with exact=True")
    _check_codebook_mode(codebooks, exact, "pq_encode")
    packed = _packed_codebooks(codebooks)
    return (
        emb.crossJoin(F.broadcast(packed))
        .select(
            F.col(id_col),
            _codes_expr(vec_col, exact, prequantized).alias("codes"),
        )
    )


def _codes_expr(
    vec_col: Column | str, exact: bool, prequantized: bool = False
) -> Column:
    """The nearest-code assignment as an expression over a row holding
    the packed ``_cb`` codebook array — shared by :func:`pq_encode`
    and the fused encode+ADC path in :func:`_codes_adc_side`."""
    m = F.aggregate(
        F.col("_cb"),
        F.lit(-1),
        lambda acc, c: F.greatest(acc, c["sub_id"]),
    ) + 1
    # dim of each sub-space from the first entry's cvec
    d = F.size(F.element_at(F.col("_cb"), 1)["cvec"])
    if exact:
        vq = (
            (F.col(vec_col) if isinstance(vec_col, str) else vec_col)
            if prequantized
            else quantized_vector(vec_col)
        )
    else:
        vq = None

    def best_code(j):
        def dist2(c):
            if exact:
                sub = F.slice(vq, j * d + 1, d)
                diffs = F.zip_with(
                    sub,
                    c["cvec"],
                    lambda a, b: (a - b).cast(_QDEC) * (a - b).cast(_QDEC),
                )
                return F.aggregate(
                    diffs,
                    F.lit(0).cast(_ACC),
                    lambda acc, x: (acc + x).cast(_ACC),
                )
            sub = F.transform(
                F.slice(vec_col, j * d + 1, d), lambda x: x.cast("double")
            )
            return F.aggregate(
                F.zip_with(sub, c["cvec"], lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        entries = F.filter(F.col("_cb"), lambda c: c["sub_id"] == j)
        # bind each entry's distance ONCE (interpreted higher-order
        # functions are not memoized — see module header): transform to
        # (bd, bc) structs first, then fold the min, so the inner
        # squared-L2 loop runs once per entry, not twice
        scored = F.transform(
            entries,
            lambda c: F.struct(dist2(c).alias("bd"), c["code"].alias("bc")),
        )
        # exact mode has no decimal infinity — seed with bc = -1 and
        # adopt the first entry unconditionally (entries are in code
        # order, strict < keeps the smaller code on ties either way)
        init_bd = (
            F.lit(None).cast(_ACC) if exact else F.lit(float("inf"))
        )
        return F.aggregate(
            scored,
            F.struct(init_bd.alias("bd"), F.lit(-1).alias("bc")),
            lambda acc, s: F.when(acc["bc"] == -1, s)
            .when(s["bd"] < acc["bd"], s)
            .otherwise(acc),
        )["bc"]

    return F.transform(F.sequence(F.lit(0), m - 1), best_code)


def _pq_query_luts(
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    exact: bool,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(id_a, _qn, _lut) for a (small) query frame against the
    broadcast packed codebooks — the per-query ADC lookup table: for
    entry (j, c) at array position p, ``_lut[p]`` = dot(q_sub_j, cvec);
    the corpus-side columns (positions, reconstructed norm) live in
    :func:`_codes_adc_side`. ``exact`` switches the kernels between
    primitive doubles (fast path) and the module's exact-decimal
    convention (oracle path).

    ``cents`` (residual decomposition): also emit ``_qcm``, a
    centroid_id → dot(q, c) map over the broadcast cell geometry —
    the per-(query, cell) half of the decomposed IVFADC score, fused
    into this one projection so the serve path needs no separate
    qc relation or join (exact mode: decimal values at the LUT
    scale; double mode: primitive doubles)."""
    _check_codebook_mode(codebooks, exact, "_pq_query_luts")
    packed = _packed_codebooks(codebooks)
    d = F.size(F.element_at(F.col("_cb"), 1)["cvec"])
    if exact:
        qvec = quantized_vector(vec_col)
        qnorm = F.sqrt(dot_exact(F.col("_q"), F.col("_q")))
        lut_entry = lambda c: _dot_exact_decimal(  # noqa: E731
            F.slice(F.col("_q"), c["sub_id"] * d + 1, d), c["cvec"]
        )
        qc_dot = lambda c: _dot_exact_decimal(  # noqa: E731
            F.col("_q"), quantized_vector(c["cvec"])
        )
    else:
        qvec = dbl_vector(vec_col)
        qnorm = F.sqrt(dot_double(F.col("_q"), F.col("_q")))
        lut_entry = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(
                F.slice(F.col("_q"), c["sub_id"] * d + 1, d),
                c["cvec"],
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        qc_dot = lambda c: dot_double(F.col("_q"), c["cvec"])  # noqa: E731
    src = queries.select(
        F.col(id_col).alias("id_a"), qvec.alias("_q")
    ).crossJoin(F.broadcast(packed))
    extra = []
    if cents is not None:
        # ONE row holding the whole O(C) geometry, sorted by id (the
        # struct sort key) — safe for sparse/non-dense centroid ids
        # because the lookup is a MAP, not positional
        cpack = F.broadcast(
            cents.agg(
                F.array_sort(
                    F.collect_list(F.struct("centroid_id", "cvec"))
                ).alias("_ccb")
            )
        )
        src = src.crossJoin(cpack)
        extra.append(
            F.map_from_entries(
                F.transform(
                    F.col("_ccb"),
                    lambda c: F.struct(c["centroid_id"], qc_dot(c)),
                )
            ).alias("_qcm")
        )
    return src.select(
        "id_a",
        qnorm.alias("_qn"),
        F.transform(F.col("_cb"), lut_entry).alias("_lut"),
        *extra,
    )


def _codes_adc_side(
    codes: DataFrame | None,
    codebooks: DataFrame,
    id_col: str,
    exact: bool,
    emb: DataFrame | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """(id_b, _idx, _xn) — the per-CORPUS-ROW half of an ADC scan,
    computed once per row and NEVER per (query, row) pair: ``_idx``
    holds each code's position in the sorted codebook pack
    (j·(kmax+1)+c+1) and ``_xn`` the reconstructed norm |x̂| (sum of
    the selected entries' stored norms). The pair loop downstream is
    then one m-lookup fold plus a division — higher-order functions
    run interpreted, so hoisting the norm fold and position transform
    off the pair cardinality is what keeps the scan ~codes-sized.

    Pass ``codes=None`` with ``emb``/``vec_col`` to FUSE the encode
    into the same packed-codebook pass — one broadcast crossJoin for
    encode + positions + norm instead of two (the on-the-fly serve
    path); a persisted codes relation skips the encode entirely."""
    _check_codebook_mode(codebooks, exact, "_codes_adc_side")
    packed = _packed_codebooks(codebooks)
    if codes is None:
        src = emb.crossJoin(F.broadcast(packed)).select(
            F.col(id_col),
            _codes_expr(vec_col, exact).alias("codes"),
            F.col("_cb"),
        )
    else:
        src = codes.crossJoin(F.broadcast(packed))
    staged = src.select(
        F.col(id_col).alias("id_b"),
        "codes",
        F.transform(F.col("_cb"), lambda c: c["cnorm_sq"]).alias("_cn"),
        _kmax_plus_one().alias("_kk"),
    )
    staged = staged.select(
        "id_b", _adc_positions(F.col("_kk")).alias("_idx"), "_cn"
    )
    if exact:
        # decimal norm sum, ONE string-hopped double conversion (the
        # dot_exact convention)
        xn = F.sqrt(
            F.aggregate(
                F.col("_idx"),
                F.lit(0).cast(_ACC),
                lambda acc, i: (acc + F.element_at("_cn", i)).cast(_ACC),
            ).cast("string").cast("double")
        )
    else:
        xn = F.sqrt(
            F.aggregate(
                F.col("_idx"),
                F.lit(0.0),
                lambda acc, i: acc + F.element_at("_cn", i),
            )
        )
    return staged.select("id_b", "_idx", xn.alias("_xn"))


def pq_adc_side(
    codes: DataFrame | None,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    exact: bool = False,
    emb: DataFrame | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """The per-corpus-row half of an ADC scan — (id_b, _idx, _xn):
    code positions in the packed codebook plus the reconstructed norm
    |x̂| — as a FIRST-CLASS relation. This is the persistable serving
    index of a PQ deployment (codes + norms is exactly what an IVFPQ
    cell store scans); compute it once, persist/localCheckpoint it,
    and pass it to :func:`pq_topk` and :func:`ivf_pq_topk` via
    ``adc_side=`` so a suite running both query paths folds the
    corpus-wide (in exact mode, interpreted-decimal) norm pass ONCE.
    Contract mirrors ``codes=``: the relation is only meaningful with
    the codebooks (and exact mode) that produced it."""
    return _codes_adc_side(codes, codebooks, id_col, exact, emb, vec_col)


def _kmax_plus_one() -> Column:
    """kmax+1 (the positional-addressing stride) from a row's ``_cb``
    pack — BIND this as a column before use: interpreted lambdas are
    not memoized, so referencing the aggregate inside a per-element
    lambda would re-fold the pack once per code."""
    return (
        F.aggregate(
            F.col("_cb"), F.lit(0), lambda acc, c: F.greatest(acc, c["code"])
        )
        + 1
    )


def _adc_positions(kk: Column) -> Column:
    """Each code's position in the sorted codebook pack —
    j·(kk)+c+1, the ONE addressing convention ``_packed_codebooks``
    validates; ``kk`` is a pre-bound :func:`_kmax_plus_one` column."""
    return F.transform(F.col("codes"), lambda c, j: j * kk + c + 1)


def _adc_lut_sum(exact: bool, init: Column | None = None) -> Column:
    """The m-lookup ADC dot over a joined row: sum of the query LUT
    entries selected by the corpus row's precomputed positions.
    ``init`` seeds the fold with an additive term of the SAME kind
    (exact: a decimal; double: a double) — the residual decomposition's
    dot(q, centroid), summed INSIDE the decimal accumulation so the
    one double conversion happens after the full exact sum (exact
    decimal addition is associative, so the combined value is
    engine-independent regardless of term order)."""
    if exact:
        return F.aggregate(
            F.col("_idx"),
            (F.lit(0) if init is None else init).cast(_ACC),
            lambda acc, i: (acc + F.element_at("_lut", i)).cast(_ACC),
        ).cast("string").cast("double")
    return F.aggregate(
        F.col("_idx"),
        F.lit(0.0) if init is None else init,
        lambda acc, i: acc + F.element_at("_lut", i),
    )


def _adc_pair_cosine(exact: bool, init: Column | None = None) -> Column:
    """The asymmetric-distance cosine over a joined row holding a
    query's LUT (``_pq_query_luts``) and a corpus row's precomputed
    ADC columns (``_codes_adc_side``): m table lookups for the dot,
    divided by the query norm × the precomputed reconstructed norm.
    ``init`` threads the residual decomposition's centroid term into
    the numerator fold (see :func:`_adc_lut_sum`)."""
    return _adc_lut_sum(exact, init) / (F.col("_qn") * F.col("_xn"))


def _exact_adc_topk(
    paired: DataFrame,
    queries: DataFrame,
    k: int,
    qc_col: str | None = None,
) -> DataFrame:
    """Two-pass exact-decimal ADC top-k over a pair frame (the
    ``brute_force_topk`` trick, shared by :func:`pq_topk` exact mode
    and :func:`ivf_pq_topk`'s exact shortlist): ``paired`` carries
    (id_a, id_b, _idx, _qn, _xn, _lutd) — a primitive-double ADC pass
    ranks ALL pairs, and the interpreted exact-decimal fold runs only
    on pairs within 1e-6 of each query's k-th approximate score. Both
    passes sum the SAME m entries over the SAME (_qn·_xn) denominator,
    so the approx→exact gap is one decimal→double cast (≤ 1 ulp per
    entry) plus m-term double-summation error — ≤ ~1e-14 in cosine
    units, ≥ 10⁷ inside the margin — hence any excluded pair is
    provably below ≥ k kept pairs in the EXACT score too: emitted
    values, membership, and rank are identical to the all-exact
    computation, with decimal folds at O(queries·k) instead of pair
    cardinality. Returns (id_a, id_b, cosine_pq, rnk ≤ k).

    The k-th approximate score is a SECOND window over the SAME
    partitioning (unbounded frame) — it rides the row_number's
    exchange/sort, so the encode+pair upstream executes ONCE; a
    separate kth frame joined back would re-execute that whole plan a
    second time (measured ~2× the leg's wall at sf0.1).

    ``qc_col`` names an exact-decimal additive term carried on
    ``paired`` (the residual decomposition's per-(query, cell)
    dot(q, c)): the prefilter adds its double cast, the exact fold
    seeds its decimal accumulator with it — one extra correctly-
    rounded addition on each side, absorbed by the same 1e-6 margin."""
    apx = F.aggregate(
        F.col("_idx"),
        F.lit(0.0) if qc_col is None else F.col(qc_col).cast("double"),
        lambda acc, i: acc + F.element_at("_lutd", i),
    ) / (F.col("_qn") * F.col("_xn"))
    # slim the pair frame BEFORE the rank shuffle: _idx (m ints),
    # _qn/_xn scalars and the approx score travel; the decimal LUT is
    # re-joined from the broadcast query frame only for margin
    # survivors
    slim = paired.select(
        "id_a", "id_b", "_idx", "_qn", "_xn", apx.alias("_apx"),
        *([qc_col] if qc_col is not None else []),
    )
    w_apx = Window.partitionBy("id_a").orderBy(
        F.col("_apx").desc(), F.col("id_b")
    )
    ranked = slim.withColumn(
        "_ark", F.row_number().over(w_apx)
    ).withColumn(
        "_kth_apx",
        F.max(F.when(F.col("_ark") == k, F.col("_apx"))).over(
            Window.partitionBy("id_a")
        ),
    )
    cand = ranked.filter(
        F.col("_kth_apx").isNull()
        | (F.col("_apx") >= F.col("_kth_apx") - 1e-6)
    ).join(F.broadcast(queries.select("id_a", "_lut")), "id_a")
    scored = cand.select(
        "id_a",
        "id_b",
        _adc_pair_cosine(
            True, None if qc_col is None else F.col(qc_col)
        ).alias("cosine_pq"),
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine_pq").desc(), F.col("id_b")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine_pq", F.col("rnk").cast("int").alias("rnk"))
    )


def _residual_adc_side(
    codes: DataFrame | None,
    codebooks: DataFrame,
    corpus_cells: DataFrame | None,
    cents: DataFrame | None,
    id_col: str,
    exact: bool = False,
    res: DataFrame | None = None,
) -> DataFrame:
    """(id_b, centroid_id, _idx, _xn) for RESIDUAL codes: like
    :func:`_codes_adc_side`, but the reconstructed vector is
    x̂ = c + r̂ (primary centroid plus the decoded residual), so the
    norm is rebuilt in-row from the broadcast centroid vectors and the
    selected codebook entries — still once per corpus row, never per
    pair, and still query-independent.

    ``exact=True``: the centroid quantizes to longs in-row, x̂ = cq +
    r̂q stays integer (the books already hold quantized residuals),
    and |x̂| is the decimal norm with the module's ONE string-hopped
    double conversion — so the norm, and with it every residual ADC
    score downstream, is engine-independent.

    Pass ``res`` (an (id, centroid_id, _cvec, _rvec) relation — the
    residual derivation already holds all three) to FUSE the encode
    into this same packed-codebook projection: one in-row pass
    computes codes + positions + reconstructed norm with ZERO joins
    (the ``_codes_adc_side`` codes=None fusion, residual flavor).
    ``codes``/``corpus_cells``/``cents`` are the persisted-codes path:
    a stored codes relation re-joins its cells and geometry."""
    packed = _packed_codebooks(codebooks)
    if res is not None:
        staged = res.crossJoin(F.broadcast(packed)).select(
            F.col(id_col).alias("id_b"),
            "centroid_id",
            _codes_expr("_rvec", exact, prequantized=exact).alias("codes"),
            "_cvec",
            F.col("_cb"),
            _kmax_plus_one().alias("_kk"),
        )
    else:
        staged = (
            codes.join(corpus_cells.select(F.col(id_col), "centroid_id"), id_col)
            .join(
                F.broadcast(
                    cents.select("centroid_id", F.col("cvec").alias("_cvec"))
                ),
                "centroid_id",
            )
            .crossJoin(F.broadcast(packed))
            .select(
                F.col(id_col).alias("id_b"),
                "centroid_id",
                "codes",
                "_cvec",
                F.col("_cb"),
                _kmax_plus_one().alias("_kk"),
            )
        )
    staged = staged.select(
        "id_b",
        "centroid_id",
        "_cvec",
        F.col("_cb"),
        _adc_positions(F.col("_kk")).alias("_idx"),
    )
    rhat = F.flatten(
        F.transform(
            F.col("_idx"), lambda i: F.element_at(F.col("_cb"), i)["cvec"]
        )
    )
    cvec = quantized_vector(F.col("_cvec")) if exact else F.col("_cvec")
    staged = staged.select(
        "id_b",
        "centroid_id",
        "_idx",
        F.zip_with(cvec, rhat, lambda a, b: a + b).alias("_xhat"),
    )
    if exact:
        xn = F.sqrt(
            _dot_exact_decimal(F.col("_xhat"), F.col("_xhat"))
            .cast("string")
            .cast("double")
        )
    else:
        xn = F.sqrt(dot_double(F.col("_xhat"), F.col("_xhat")))
    return staged.select("id_b", "centroid_id", "_idx", xn.alias("_xn"))


def pq_topk(
    emb: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame | None = None,
    query_ids_max: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    adc_side: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: queries stay
    full-precision, the corpus is its 8-byte codes. Per query, a
    lookup table of dot(q_subvector, codebook entry) is built in-row
    against the broadcast codebooks (m·k small dots); each corpus
    row's score is then m table lookups — the classic PQ scan that
    reads codes instead of vectors, 32× less memory traffic at the
    defaults. Approximate cosine = LUT-sum / (|q| · |x̂|), with |x̂|²
    the sum of the selected entries' stored norms (exact for the
    RECONSTRUCTED vector; ranking quality is bounded by quantization
    error, measured against ``brute_force_topk`` in the tests).
    Same API shape as the brute/IVF query paths: queries are corpus
    rows with id < ``query_ids_max``, self excluded, (score DESC,
    id_b ASC) deterministic top-k. Pass ``codes`` (a ``pq_encode``
    output, e.g. read back from parquet) to serve from a persisted
    code store; None encodes ``emb`` on the fly.

    ``exact=True`` (with an ``exact`` codebook/codes): the LUT holds
    exact-decimal dots, the m-lookup score and reconstructed norm sum
    as decimals with ONE string-hopped double conversion each, and the
    query norm is the module's exact decimal norm — every emitted
    cosine_pq is then bitwise-reproducible by a SQL oracle (same
    IEEE division tree over identical correctly-rounded doubles).

    Exact mode ranks via the shared two-pass :func:`_exact_adc_topk`
    (primitive-double prefilter, exact-decimal folds only inside the
    k-th score's margin) — output provably identical to the all-exact
    computation, with decimal folds at O(queries·k) instead of pair
    cardinality; the margin/error proof lives on the helper."""
    _check_residual_tag(codebooks, False, "pq_topk")
    queries = _pq_query_luts(
        emb.filter(F.col(id_col) < query_ids_max), codebooks, id_col,
        vec_col, exact,
    )
    if exact:
        # double twin of the LUT, derived once per QUERY row (≤ 20) —
        # the prefilter never feeds an emitted value, so the cast's
        # engine-dependent ulp is irrelevant
        queries = queries.withColumn(
            "_lutd", F.transform(F.col("_lut"), lambda x: x.cast("double"))
        )
    # the query side (with its LUTs) broadcasts explicitly and the
    # codes side STREAMS: each corpus row's positions/norm evaluate
    # once (see _codes_adc_side; with codes=None the encode fuses into
    # the same pass), then fan out across the broadcast queries — a
    # non-equi join the other way round would re-derive the encode
    # expressions at pair cardinality
    side = (
        adc_side
        if adc_side is not None
        else _codes_adc_side(codes, codebooks, id_col, exact, emb, vec_col)
    )
    paired = (
        side.crossJoin(F.broadcast(queries))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    if exact:
        return _exact_adc_topk(paired, queries, k)
    scored = paired.select(
        "id_a", "id_b", _adc_pair_cosine(False).alias("cosine_pq")
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine_pq").desc(), F.col("id_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine_pq", F.col("rnk").cast("int").alias("rnk"))
    )


class _PQServeInputs:
    """ONE construction site for :func:`ivf_pq_topk`'s pinned-relation
    hook surface (r10): the serve tier takes up to eight optional
    relations (centroids / assignments / corpus_cells / codebooks /
    codes / adc_side / cand / pair_scores) whose pairwise contracts
    were scattered refusal blocks across the serve branches — a matrix
    that took three r9 commits to make symmetric. Every PLAN-BUILD
    refusal now runs here, in one ordered block, BEFORE any eager pin
    can materialize a job; the serve body consumes validated fields.
    Adding a hook means adding its guard HERE, next to every guard it
    must compose with.

    Also owns the fused-path broadcast decision (``should_broadcast``):
    the forced broadcast of candidate-bounded relations hard-fails past
    Spark's 8 GB cap where the shuffle it replaces is disk-backed, so
    ``serve_broadcast=False`` is the explicit big-serve escape (r9
    ADVICE). A plan-time AUTO gate was built and REJECTED: a
    localCheckpoint's stats carry the PRE-pin join estimate (measured
    4.6e14 'bytes' for an actual 3712-row pinned cand), so estimate-
    gating silently un-forced every suite serve and cost ~2 s of AQE
    stage materializations per suite run at sf0.1 — an explicit caller
    contract beats a wrong heuristic. Rule of thumb for that contract:
    Spark broadcasts hard-cap at 8 GB / int-max rows, so the force is
    safe up to ~1e8 slim (id_a, id_b) candidate rows at 16 B each (the
    ADC side it bounds is ≤ one slim row per distinct id_b)."""

    def __init__(
        self,
        *,
        k: int,
        refine: int | None,
        residual: bool,
        exact: bool,
        centroids,
        assignments,
        corpus_cells,
        codebooks,
        codes,
        adc_side,
        cand,
        pair_scores,
        pq_picks,
        serve_broadcast: bool,
        caller: str = "ivf_pq_topk",
    ) -> None:
        self.refine = 4 * k if refine is None else refine
        self.serve_broadcast = serve_broadcast
        if self.refine < k:
            raise ValueError(
                f"refine {self.refine} < k {k}: shortlist must cover top-k"
            )
        if adc_side is not None and residual:
            raise ValueError(
                "adc_side= carries raw-layout reconstructed norms — the "
                "residual branch rebuilds x̂ = c + r̂ per cell "
                "and must derive its own side"
            )
        if codes is not None and codebooks is None:
            raise ValueError(
                "codes= without codebooks=: persisted codes are POSITIONAL "
                "references into the codebooks that produced them — freshly "
                "trained books would decode every code against the wrong "
                "entries while scores stay plausible-looking"
            )
        if adc_side is not None and codebooks is None:
            raise ValueError(
                "adc_side= without codebooks=: the side's _idx positions are "
                "POSITIONAL references into the codebooks that produced it — "
                "freshly trained books would build query LUTs whose entries "
                "the side's positions mis-address, collapsing recall while "
                "scores stay plausible-looking (same contract as codes=)"
            )
        if pq_picks is not None and codebooks is not None:
            raise ValueError(
                "pq_picks= with codebooks=: the picks seed in-call TRAINING "
                "and the supplied books are already trained — a silently "
                "ignored hook hides a caller bug, so refuse (drop one)"
            )
        if assignments is None and corpus_cells is not None and centroids is None:
            raise ValueError(
                "corpus_cells without centroids: queries cannot "
                "probe an unknown cell geometry — pass the store's "
                "centroids alongside its cells"
            )
        if residual:
            if assignments is not None and centroids is None:
                raise ValueError(
                    "residual=True cannot run from assignments= alone: "
                    "residuals are taken against the cell geometry's "
                    "centroid VECTORS, which the assignments relation "
                    "does not carry — pass centroids= alongside (the "
                    "relation the assignments were ranked against) or "
                    "drop assignments="
                )
            if (codebooks is not None or codes is not None) and centroids is None:
                # residual codebooks/codes are meaningless against any
                # geometry but the one that produced them; a re-derived
                # seeded pick over a changed corpus would decode
                # residuals of the WRONG centroids — scores stay
                # plausible-looking while recall silently collapses
                raise ValueError(
                    "residual=True with persisted codebooks=/codes= requires "
                    "the centroids= they were trained against — residual "
                    "codes die with their cell geometry (and raw-vector "
                    "codes, e.g. read_ivf_pq_store's, are not residual codes)"
                )
        if codebooks is not None:
            # centroids alone don't prove residual books hold residual
            # entries (a raw-layout store's (books, cents) pair passes
            # the geometry guard above — the tag is what refuses it);
            # and a mode mismatch (double books with exact=True or vice
            # versa) must surface here, at plan-build, not inside the
            # LUT builder after an eager cand pin has run real jobs
            _check_residual_tag(codebooks, residual, caller)
            _check_codebook_mode(codebooks, exact, caller)

    def should_broadcast(self) -> bool:
        """Whether the fused serve path may FORCE-broadcast its
        candidate-bounded relations (skipping two AQE shuffle-stage
        materializations per serve). True (the default) is the fused
        serving contract — candidate volume ≲ 10⁸ rows; False streams
        the same relations and lets AQE pick the joins at runtime
        (which still broadcasts genuinely small sides). No auto mode —
        see the class docstring for why the plan-stats gate was
        rejected."""
        return self.serve_broadcast


def ivf_pq_topk(
    emb: DataFrame,
    query_ids_max: int = 20,
    k: int = 5,
    num_centroids: int = 32,
    probes: int = 3,
    num_subvectors: int = 8,
    codes_per_subvector: int = 16,
    refine: int | None = None,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
    corpus_cells: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
    dim: int | None = None,
    residual: bool = False,
    exact: bool = False,
    adc_side: DataFrame | None = None,
    cand: DataFrame | None = None,
    pair_scores: DataFrame | None = None,
    serve_broadcast: bool = True,
    pq_picks: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with exact re-ranking — the memory-bounded serve tier
    (Jégou et al. 2011, the FAISS IVFPQ layout): ``ivf_topk`` prunes
    WHICH vectors each query examines (probed cells) but re-scores
    every candidate against its FULL vector (256 B at dim 64); here the
    probed cells are scanned as ``num_subvectors``-byte PQ codes via
    the per-query ADC lookup table, only the ADC top-``refine``
    shortlist (default 4k) is fetched at full precision for exact
    re-scoring, and the final top-k ranks on the same exact-decimal
    cosine as every other query path. A billion-vector cell store
    drops 32× in scan traffic at the defaults; full vectors are
    touched for ~refine rows per query, not per-cell volume.

    Recall: candidates are ivf_topk's (same cells, same probes); the
    ADC shortlist is the only extra approximation, and with ``refine``
    ≥ the probed-cell candidate volume the output is IDENTICAL to
    ``ivf_topk`` (pytest-pinned) — ``refine`` buys exactness back at
    full-vector-fetch cost, the standard IVF-PQ knob.

    ``serve_broadcast`` gates the fused path's forced broadcasts of
    candidate-bounded relations (True, the default, forces — the
    caller asserts the ~1e8-row fused-serving contract; False streams
    them and lets AQE pick the joins — the explicit escape when a
    candidate list might breach the 8 GB broadcast cap; there is no
    auto mode — see _PQServeInputs for why plan-stats gating was
    rejected). ``pq_picks`` (a pinned
    :func:`pq_pick_ids` relation) seeds in-call codebook training so
    a suite training raw AND residual books over the same corpus runs
    the ranked pick pass once; only meaningful with ``codebooks=None``
    (the combination is refused). Every hook's pairwise contract is
    validated in ONE place, :class:`_PQServeInputs`, before any eager
    pin runs a job.

    Hooks mirror ``ivf_topk``/``pq_topk``: pass ``assignments`` (a
    ranked ``ivf_assignments`` over the same base) to reuse a suite's
    one corpus-vs-centroids pass, ``centroids`` for a persisted cell
    geometry (with ``corpus_cells`` — an (id, centroid_id) relation,
    e.g. a store's stored primary cells — to skip re-assigning the
    corpus entirely: :func:`read_ivf_pq_store` supplies all four
    store-side pieces), ``codebooks``/``codes`` for a persisted PQ
    layout (an :func:`incremental_ivf_update` store written with
    ``pq_codebooks=``), ``cand`` for a shared candidate-pair list
    (:func:`ivf_candidate_pairs`, ideally pinned — a suite running
    exact/raw-PQ/residual-PQ serve legs then derives the cells join
    once), ``pair_scores`` for the shared exact-cosine scored relation
    over that same cand (the re-rank fold then runs once per suite:
    the shortlist joins into it instead of re-running
    ``cosine_for_pairs``; caller contract — it must COVER this call's
    candidates, i.e. be scored over the same cand), and ``dim`` to
    keep training probe-free.

    Scale shape: queries (with their O(m·k) LUT arrays) broadcast into
    the candidate join; codes join shuffles only the candidate list;
    the full-vector join after the shortlist is O(queries · refine).

    ``residual=True`` is the textbook IVFADC refinement: quantize the
    RESIDUAL x − c(x) against each vector's primary centroid instead
    of the raw vector. Residuals are smaller and better centered than
    raw vectors, so the same code budget spends its resolution where
    the cell already localized the point — on clustered data this is
    what makes 8-byte codes usable at all (pytest measures the recall
    gain on a planted clustered corpus). Scoring decomposes as
    dot(q, x̂) = dot(q, c) + dot(q, r̂): the first term is one
    O(queries·C) broadcastable relation, the second the usual ADC LUT
    over the RESIDUAL codebooks; the reconstructed norm |c + r̂| is
    precomputed per corpus row at index time (query-independent).
    Requires an explicit cell geometry when ``codebooks``/``codes``
    are supplied (codes are only meaningful against the geometry that
    produced the residuals — the same fixed-geometry contract as the
    incremental store's centroids), and the codebooks must carry the
    ``residual`` tag :func:`pq_train_residual` writes — raw books with
    a matching geometry would otherwise decode raw codes as residuals,
    scoring plausibly with collapsed recall. The STORE supports both
    layouts: raw books (untagged) write geometry-independent codes
    that survive retrain untouched; residual-tagged books write IVFADC
    codes that ``retrain_ivf_store`` re-encodes against the new
    geometry inside its re-assignment pass.

    ``exact=True`` (with ``exact`` codebooks/codes): the ADC SHORTLIST
    itself becomes engine-independent — codes, LUTs, and the refine
    ranking run in the module's exact integer decimals (via the shared
    :func:`_exact_adc_topk` two-pass, so the decimal folds stay
    O(queries·refine)), and the final top-k re-ranks on the exact-
    decimal cosine like every other query path. A SQL oracle can then
    replay the ENTIRE pipeline bitwise, shortlist membership included
    (the double-mode shortlist is rank-stable only up to float
    summation order). Composes with ``residual=True`` (r9): residuals
    are taken in INTEGER space (quantize x and c separately, subtract
    — the ``pq_train_residual(exact=True)`` convention), the dot(q,c)
    cell term is an exact decimal at the same scale as the LUT
    entries and sums INTO the shortlist fold's decimal accumulator
    before the one string-hopped double conversion (decimal addition
    is associative, so term order cannot split engines), and |x̂| =
    |cq + r̂q| is the decimal norm — the full IVFADC serve path,
    shortlist membership included, checks bitwise."""
    # the full hook guard matrix runs in ONE place, before anything
    # eager (r10 consolidation — see _PQServeInputs). exact=True with
    # residual=True (r9): the decomposed score is order-stable —
    # dot(q, c) and the residual LUT entries are each exact decimals,
    # and decimal addition is associative, so summing the centroid
    # term INTO the LUT fold before the module's one string-hopped
    # double conversion pins the combined numerator bitwise.
    inputs = _PQServeInputs(
        k=k, refine=refine, residual=residual, exact=exact,
        centroids=centroids, assignments=assignments,
        corpus_cells=corpus_cells, codebooks=codebooks, codes=codes,
        adc_side=adc_side, cand=cand, pair_scores=pair_scores,
        pq_picks=pq_picks, serve_broadcast=serve_broadcast,
    )
    refine = inputs.refine
    base = _ensure_ann_base(emb, id_col)
    # uniqueness of the candidate pairs is structural when WE derive
    # the cells: corpus side is one rank-1 (or probes=1) row per id,
    # query side one row per (id, probed centroid) — each (id_a, id_b)
    # arises from at most one shared cell, so the pair distinct is a
    # pure fixed-cost exchange + aggregate. Only EXTERNAL corpus_cells
    # (no such contract) still dedup.
    cells_external = corpus_cells is not None and assignments is None
    if assignments is not None:
        corpus_cells = assignments.filter(F.col("probe_rank") == 1).select(
            F.col(id_col), "centroid_id"
        )
        query_cells = assignments.filter(F.col(id_col) < query_ids_max).select(
            F.col(id_col), "centroid_id"
        )
    else:
        if centroids is None:
            # corpus_cells-without-centroids already refused by inputs
            num_centroids = resolve_num_centroids(base, num_centroids)
            cents = _seed_centroids(base, num_centroids, id_col)
        else:
            cents = centroids
        if corpus_cells is None:
            corpus_cells = ivf_assignments(
                base, num_centroids, probes=1, id_col=id_col, vec_col="vdbl",
                centroids=cents,
            )
        qbase = base.filter(F.col(id_col) < query_ids_max)
        query_cells = ivf_assignments(
            qbase, num_centroids, probes=probes, id_col=id_col, vec_col="vdbl",
            centroids=cents,
        )
    cand_supplied = cand is not None
    if cand is None:
        # query side broadcast: O(query_ids_max · probes) rows by
        # construction (ivf_candidate_pairs' r15 rationale — the
        # O(corpus) cell index must never shuffle to meet it)
        cand = (
            F.broadcast(
                query_cells.select(F.col(id_col).alias("id_a"), "centroid_id")
            )
            .join(
                corpus_cells.select(F.col(id_col).alias("id_b"), "centroid_id"),
                "centroid_id",
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
        )
        if cells_external:
            cand = cand.distinct()

    def _double_adc_shortlist(adc: DataFrame) -> DataFrame:
        wa = Window.partitionBy("id_a").orderBy(
            F.col("_adc").desc(), F.col("id_b")
        )
        return (
            adc.withColumn("_ar", F.row_number().over(wa))
            .filter(F.col("_ar") <= refine)
            .select("id_a", "id_b")
        )

    if residual:
        if assignments is not None:
            # assignments supply the cells, centroids the vectors (the
            # bare-assignments form is refused by inputs) — the caller
            # asserts they describe the SAME geometry (a suite sharing
            # one ranked corpus-vs-centroids pass)
            cents = centroids
        # the pair list is consumed TWICE (the encode semi-join's id
        # list and the probe side of the shortlist join): un-pinned,
        # each reference re-runs the cells join with its own AQE stage
        # materializations — candidate volume is O(queries · cell), so
        # the pin is small by construction (r9 job audit). A supplied
        # cand= is the caller's to pin. Pinned AFTER every refusal
        # above: the eager checkpoint runs real jobs, and a call that
        # is going to be refused must refuse at plan-build, not after
        # materializing the candidate join.
        if not cand_supplied:
            cand = cand.localCheckpoint()
        # gated candidate-bounded force-broadcasts — the raw branch's
        # twin (r10): serve_broadcast=False is the big-serve escape
        fb = F.broadcast if inputs.should_broadcast() else (lambda d: d)
        cvecs = F.broadcast(
            cents.select("centroid_id", F.col("cvec").alias("_cvec"))
        )
        # exact mode quantizes x and c SEPARATELY and subtracts in
        # integer space (the pq_train_residual convention): the
        # residual relation is then exact longs a SQL twin re-derives
        rsub = (
            F.zip_with(
                quantized_vector("vdbl"),
                quantized_vector("_cvec"),
                lambda a, b: a - b,
            )
            if exact
            else F.zip_with("vdbl", "_cvec", lambda a, b: a - b)
        )
        res = (
            base.join(corpus_cells.select(F.col(id_col), "centroid_id"), id_col)
            .join(cvecs, "centroid_id")
            .select(
                F.col(id_col), "centroid_id", "_cvec", rsub.alias("_rvec")
            )
        )
        if codebooks is None:
            # training sees the WHOLE corpus (codebooks are the
            # geometry). Pin the residual relation FIRST: the seeded
            # pick and the fused encode+norm side each consume it, and
            # un-pinned both would re-run the corpus-wide assignment
            # join + subtraction; then pin the O(m·k) books so the
            # downstream packers don't re-run the picks. (A deployment
            # passes persisted codebooks/codes and never pays either.)
            res = res.localCheckpoint()
            codebooks = pq_train(
                res, num_subvectors, codes_per_subvector, id_col=id_col,
                vec_col="_rvec", dim=dim, exact=exact, prequantized=exact,
                picks=pq_picks,
            ).localCheckpoint()
        # encode/ADC-precompute only rows some query actually probes —
        # the equi-join on id_b would discard the rest anyway, but only
        # AFTER their in-row encode/norm folds had run
        # semi-join right side needs no distinct: LeftSemi is
        # duplicate-agnostic, and the dedup was another fixed-cost
        # exchange + aggregate pair (r9 job audit)
        cand_ids = cand.select(F.col("id_b").alias(id_col))
        if codes is None:
            # FUSED encode + ADC side: res already carries the cell id
            # and centroid vector, so one in-row projection computes
            # codes + positions + reconstructed norm with zero joins —
            # the separate encode pass, its codes↔cells re-join, and
            # the geometry re-join were each an AQE stage
            # materialization of size-independent overhead (r9 job
            # audit: 28 jobs → the fused leg's count)
            rside_rel = _residual_adc_side(
                None, codebooks, None, None, id_col, exact=exact,
                res=res.join(fb(cand_ids), id_col, "left_semi"),
            )
        else:
            rside_rel = _residual_adc_side(
                codes.join(fb(cand_ids), id_col, "left_semi"),
                codebooks, corpus_cells, cents, id_col, exact=exact,
            )
        # the per-(query, cell) dot(q, c) term rides the query LUT
        # projection as a centroid_id → dot MAP (cents= hook): no
        # separate qc relation, no third pair-frame join. Exact mode
        # keeps the values WIDE DECIMALS (the LUT scale) so the
        # shortlist fold sums them into the decimal accumulator before
        # the one double conversion
        queries = _pq_query_luts(
            base.filter(F.col(id_col) < query_ids_max), codebooks, id_col,
            "vdbl", exact=exact, cents=cents,
        )
        rside = fb(rside_rel)
        qc_val = F.element_at(F.col("_qcm"), F.col("centroid_id"))
        if exact:
            # ≤ query_ids_max rows; pinned because the two-pass
            # shortlist broadcasts this frame twice (pair join + margin
            # re-join) and each un-pinned broadcast re-runs the packed/
            # geometry aggregations upstream
            queries = queries.withColumn(
                "_lutd",
                F.transform(F.col("_lut"), lambda x: x.cast("double")),
            ).localCheckpoint()
            paired = (
                cand.join(F.broadcast(queries), "id_a")
                .join(rside, "id_b")
                .withColumn("_qc", qc_val)
            )
            shortlist = _exact_adc_topk(
                paired, queries, refine, qc_col="_qc"
            ).select("id_a", "id_b")
        else:
            adc = (
                cand.join(F.broadcast(queries), "id_a")
                .join(rside, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    (
                        (qc_val + _adc_lut_sum(False))
                        / (F.col("_qn") * F.col("_xn"))
                    ).alias("_adc"),
                )
            )
            shortlist = _double_adc_shortlist(adc)
    else:
        if codebooks is None:
            # trained on the whole corpus, pinned for the three packers
            # (pq_picks= replaces the in-call seeded pick with a
            # shared one — see pq_train)
            codebooks = pq_train(
                base, num_subvectors, codes_per_subvector, id_col=id_col,
                vec_col="vdbl", dim=dim, exact=exact, picks=pq_picks,
            ).localCheckpoint()
        # supplied-codebooks tag/mode refusals ran in inputs, before
        # the eager pin below could run real jobs
        # same double-consumption pin as the residual branch (cand
        # feeds the encode semi-join's id list AND the shortlist pair
        # join), placed after the plan-build refusals; with a
        # precomputed adc_side= the pair join is cand's ONLY
        # consumer, so no pin
        if not cand_supplied and adc_side is None:
            cand = cand.localCheckpoint()
        # forcing the candidate-bounded broadcasts skips two AQE
        # shuffle-stage materializations, but a broadcast hard-caps at
        # Spark's 8 GB / int-max-rows limit while the shuffle it
        # replaces is disk-backed — so the force is gated (r10) on the
        # serve_broadcast kwarg (the ~10⁸-row fused-serving contract).
        # With serve_broadcast=False the same relations join UN-forced
        # and AQE picks the strategy at runtime (a persisted adc_side=
        # remains the big-serve escape hatch that never builds a
        # candidate-filtered side at all).
        fb = F.broadcast if inputs.should_broadcast() else (lambda d: d)
        if adc_side is None:
            # encode/ADC-precompute candidates only (see residual
            # branch). Semi-join right side needs no distinct: LeftSemi
            # is duplicate-agnostic, and the dedup was a fixed-cost
            # exchange + aggregate pair (r9 job audit).
            cand_ids = cand.select(F.col("id_b").alias(id_col))
            if codes is None:
                codes = pq_encode(
                    base.join(fb(cand_ids), id_col, "left_semi"),
                    codebooks, id_col=id_col, vec_col="vdbl", exact=exact,
                )
            else:
                codes = codes.join(fb(cand_ids), id_col, "left_semi")
        queries = _pq_query_luts(
            base.filter(F.col(id_col) < query_ids_max), codebooks, id_col,
            "vdbl", exact=exact,
        )
        if exact:
            # double twin of the LUT, once per query row (pq_topk's
            # prefilter shape); the shortlist is then the shared
            # two-pass exact-decimal rank at k=refine — membership
            # provably identical to an all-exact ADC ranking
            queries = queries.withColumn(
                "_lutd",
                F.transform(F.col("_lut"), lambda x: x.cast("double")),
            )
            # candidate-filtered ADC side broadcasts under the same
            # gated candidate-volume contract as the id list (slim
            # _idx+_xn rows). Probe side then reaches the shortlist
            # window with ZERO pre-window exchanges. A precomputed
            # adc_side= is CORPUS-wide, so it streams instead and the
            # pair list joins into it UN-forced — that path is the
            # big-serve escape hatch, so AQE must stay free to pick a
            # shuffle when the candidate list outgrows the broadcast
            # cap.
            if adc_side is None:
                paired = cand.join(F.broadcast(queries), "id_a").join(
                    fb(_codes_adc_side(codes, codebooks, id_col, exact=True)),
                    "id_b",
                )
            else:
                paired = adc_side.join(cand, "id_b").join(
                    F.broadcast(queries), "id_a"
                )
            shortlist = _exact_adc_topk(paired, queries, refine).select(
                "id_a", "id_b"
            )
        else:
            if adc_side is None:
                adc_rel = fb(
                    _codes_adc_side(codes, codebooks, id_col, exact=False)
                )
                adc = cand.join(F.broadcast(queries), "id_a").join(
                    adc_rel, "id_b"
                )
            else:
                # un-forced pair-list join — the big-serve path (see
                # the exact twin above)
                adc = adc_side.join(cand, "id_b").join(
                    F.broadcast(queries), "id_a"
                )
            adc = adc.select(
                "id_a", "id_b", _adc_pair_cosine(exact=False).alias("_adc")
            )
            shortlist = _double_adc_shortlist(adc)
    if pair_scores is not None:
        # shared re-rank relation (suite hook): the shortlist keys into
        # the already-scored cand pairs — per-pair exact cosine is a
        # pure function of the pair, so joining ≡ recomputing. LEFT
        # join + in-plan raise: a pair_scores that does not cover this
        # call's candidates (scored under a min_cosine, or pinned from
        # a stale cand) would otherwise silently DROP shortlist rows —
        # fewer than k results with plausible scores, the same
        # silent-mis-serve class the codes=/adc_side= guards refuse.
        # The relation is candidate-bounded (scored over exactly this
        # call's cand), so it rides the same gated force-broadcast as
        # the other candidate-bounded sides (r15: a pinned relation
        # has no stats, so the un-hinted LEFT join planned as a
        # SortMergeJoin — two exchanges + two sorts per serve leg)
        ps_b = (
            F.broadcast(pair_scores)
            if inputs.should_broadcast()
            else pair_scores
        )
        scored = shortlist.join(
            ps_b, ["id_a", "id_b"], "left"
        ).select(
            "id_a",
            "id_b",
            F.when(
                F.col("cosine").isNull(),
                F.raise_error(
                    "pair_scores= does not cover this call's shortlist: "
                    "score the SAME cand this call serves (no min_cosine "
                    "filter) or drop the hook"
                ).cast("double"),
            )
            .otherwise(F.col("cosine"))
            .alias("cosine"),
        )
        return _rank_topk(scored, k, check_unique=True)
    scored = cosine_for_pairs(
        base, shortlist, exact_norms_in_base=False, id_col=id_col
    )
    return _rank_topk(scored, k)


