"""Deterministic sampling and dataset splitting (LLM-training-pipeline
operators): hash-based train/val/test splits, fraction sampling, and
exact-count stratified sampling.

The reference has no sampling surface at all; these are extension
operators in the same spirit as the dedup family. Everything is
md5-keyed and salt-parameterized — NO rand()/sample(): a row's
assignment depends only on (salt, key), so results are reproducible
across runs, engines (DuckDB oracle-able), AND corpus growth — adding
new rows never re-assigns existing ones, which is the property that
matters when a 100 TB corpus is split incrementally.

Scale shapes:
* ``hash_split`` / ``hash_sample`` are pure per-row maps — zero
  shuffle, pipelined into the scan; the split column can land in the
  partition layout (``partitionBy('split')``) so downstream training
  readers prune.
* ``stratified_sample_exact`` is one window shuffle on the strata keys
  — the honest exact-count path; use the fraction variant when
  binomial-sized strata are acceptable and no shuffle is wanted.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5's first 15 hex digits as a uniform fraction in [0, 1): 60 bits —
# granular enough that split boundaries land exactly where the weights
# say, and small enough to convert exactly to double (< 2^53 after the
# >> 7 below... instead we keep 13 digits = 52 bits, which IS < 2^53).
_FRAC_HEX_DIGITS = 13
_FRAC_DENOM = float(16**_FRAC_HEX_DIGITS)


def _hash_fraction(key: Column, salt: str) -> Column:
    """Uniform deterministic fraction in [0, 1) from (salt, key): the
    first 13 hex digits of md5 as a 52-bit integer over 16^13. conv()
    returns the value exactly (52 bits < 2^53 double mantissa)."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, _FRAC_HEX_DIGITS), 16, 10).cast("double") / F.lit(
        _FRAC_DENOM
    )


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float],
    key_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a named split ('train'/'val'/'test'/...) by
    hashing its key into [0, 1) and cutting at the cumulative weights
    (insertion order of ``weights``). Pure map — no shuffle, no state;
    per-key assignment is independent of every other row, so growing
    the corpus never moves an existing row between splits (unlike
    ``randomSplit``, which reshuffles everything on every run)."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    frac = _hash_fraction(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        branch = F.when(frac < cum, F.lit(name))
        expr = branch if expr is None else expr.when(frac < cum, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash
    fraction falls under the threshold. Binomial-sized (exact in
    expectation), zero shuffle, reproducible, and REPEATABLE: the same
    (salt, key) always lands on the same side, so a sample drawn today
    is a subset of the same-salt sample drawn after the corpus grows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_sample_flag(fraction, key_col, salt))


def hash_sample_flag(
    fraction: float, key_col: str = "doc_id", salt: str = "sample-v1"
) -> Column:
    """Column form of :func:`hash_sample`: TRUE iff the row's (salt,
    key) hash fraction falls under ``fraction``. Use when the sample
    membership should ride along as metadata (e.g. a profile column)
    instead of filtering rows."""
    return _hash_fraction(F.col(key_col), salt) < fraction


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    token_col: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    salt: str = "pack-v1",
) -> DataFrame:
    """Sequence packing for training export: concatenate documents (in
    ``key_col`` order, within an md5-assigned shard) into fixed-size
    sequences of ``token_budget`` tokens, split-allowed — the
    concat-then-cut packing used to build LLM training batches. Adds:

    * ``pack_shard``  — md5(salt|key) % n_shards (deterministic, and
      DuckDB-recomputable — NOT Spark's murmur ``hash()``);
    * ``pack_seq``    — index of the sequence where this doc STARTS
      (prev-token cumsum // budget, exact integer arithmetic);
    * ``pack_offset`` — the doc's first-token offset inside that
      sequence (cumsum % budget).

    One window shuffle partitioned on shard: each shard packs
    independently, so parallelism = n_shards and NO global ordering is
    ever materialized — at 100 TB raise n_shards until a shard's token
    count fits an executor's window spill budget (packing quality is
    unaffected: sequences never cross shards by construction). Docs
    with 0 tokens get the position of the next doc (width-0 slot)."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    out = df.withColumn("pack_shard", shard)
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0)).cast("long")
    return (
        out.withColumn("_cum_prev", cum_prev)
        .withColumn("pack_seq", F.expr(f"_cum_prev div {int(token_budget)}"))
        .withColumn("pack_offset", F.col("_cum_prev") % token_budget)
        .drop("_cum_prev")
    )


def resample_to_mixture(
    df: DataFrame,
    mixture: Mapping[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Down-sample each source/domain so the surviving corpus matches a
    target mixture — the domain-rebalancing step of a training-data
    pipeline (e.g. web 60% / code 25% / papers 15%). No replication:
    the achieved total is the LARGEST T for which every source can
    supply its share (T = min_s n_s / w_s over positive weights), and
    each source keeps a deterministic md5 fraction r_s = T·w_s / n_s of
    its rows — binomial-sized per source (exact in expectation), rows
    chosen by (salt, key) hash so the draw is reproducible and each
    source's sample is a subset of any larger-rate draw with the same
    salt. Sources missing from ``mixture`` (or weighted 0) are dropped.

    Scale shape: ONE count aggregation over the corpus (map-side
    combined to |sources| rows — the only action, an O(|sources|)
    bounds probe, same class as the incremental pipeline's time-range
    probes), then a pure per-row hash filter pipelined into the scan —
    zero shuffle on the data path. NOT growth-stable, by nature: the
    mixture is a property of the WHOLE corpus, so keep-rates must be
    recomputed as data grows (re-runs stay deterministic for a fixed
    corpus + salt; pin row-level stability across runs by persisting
    the emitted rates and reusing them instead)."""
    weights = {s: float(w) for s, w in mixture.items() if w > 0}
    if not weights:
        raise ValueError("mixture must contain at least one positive weight")
    wtot = sum(weights.values())
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["s"] in weights
    }
    if not counts and df.isEmpty():
        # P7: resampling an EMPTY corpus is an empty corpus — the
        # registered-query empty-ingest guard. A non-empty corpus where
        # the mixture names only absent sources still raises below
        # (that is misconfiguration, not emptiness).
        return df.filter(F.lit(False))
    missing = [s for s in weights if s not in counts]
    if missing:
        raise ValueError(
            f"mixture names sources absent from the corpus: {sorted(missing)}"
        )
    # largest achievable total, then per-source keep rates. The binding
    # source's rate is mathematically 1.0 but the float round trip can
    # land at 1 - 1ulp (e.g. ·0.7 then /0.7), which would drop its
    # max-hash row and break the "scarcest source kept whole" contract
    # — snap it exactly.
    bind = min(weights, key=lambda s: counts[s] / (weights[s] / wtot))
    t_max = counts[bind] / (weights[bind] / wtot)
    rates = {
        s: min(1.0, (t_max * weights[s] / wtot) / counts[s]) for s in weights
    }
    rates[bind] = 1.0
    rate_map = F.create_map(
        *[x for s in sorted(rates) for x in (F.lit(s), F.lit(rates[s]))]
    )
    rate = rate_map[F.col(source_col)]
    return df.filter(
        rate.isNotNull() & (_hash_fraction(F.col(key_col), salt) < rate)
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "strata-v1",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer only when the
    stratum is smaller), chosen by md5 order — a deterministic uniform
    draw without replacement. One window shuffle on the strata keys;
    rank by (hash, key) so the draw is total-ordered and tie-free.

    At 100 TB: the shuffle is on strata (usually low-cardinality, e.g.
    language × quality bucket), and each stratum's rows flow through
    one partition's window — for huge strata with small n, prefer
    ``hash_sample`` per stratum or a two-level pre-filter (hash-sample
    down to ~10·n first, then exact-rank the survivors; the pre-filter
    keeps the window input bounded)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_fraction(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def weighted_sample_exact(
    df: DataFrame,
    n: int,
    weight_col: str,
    strata_cols: Sequence[str] | None = None,
    key_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """EXACTLY ``n`` rows (fewer only when the input is smaller) drawn
    WITHOUT replacement with probability proportional to
    ``weight_col`` — weighted reservoir sampling à la
    Efraimidis-Spirakis (2006, public method): each row gets the key
    u^(1/w) for a uniform u and the top-n keys are the sample. The
    LLM-pipeline use is quality-weighted subsampling — e.g. pass the
    NB classifier's ``quality_prob`` (functions/quality_model.py) or a
    perplexity-derived weight to bias a corpus cut toward quality
    without a hard threshold.

    Deterministic and engine-portable, the module contract: u is the
    md5 fraction of (salt, key) shifted to (0, 1] (the +1 keeps ln()
    off u = 0), and rows rank on CAST(ln(u)/w AS DECIMAL(28,9)) DESC —
    monotone-equivalent to u^(1/w) (no pow(), whose cross-engine ulps
    sit ON the ranking), with the 1e-9 quantization absorbing ln()
    ulps and (key DESC... key ASC) id tie-break making the draw
    total-ordered. Same (salt, key, weight) → same key forever: a row
    joining the corpus later never changes EXISTING rows' keys (though
    exact-n membership is relative by definition — use ``hash_sample``
    when absolute growth-stability of membership matters more than
    weighting).

    ``strata_cols`` draws n PER STRATUM (quality-weighted within each
    language/source bucket) through one window shuffle — the
    ``stratified_sample_exact`` shape and the same huge-stratum advice;
    None draws globally and plans as TakeOrderedAndProject (partial
    top-n per partition, never a global sort).

    A non-positive or NULL weight has no E-S key and raises IN-PLAN
    (the module's loud-guard discipline — silently dropping such rows
    would make a zero-quality doc vanish without trace; filter
    explicitly first)."""
    if n < 1:
        raise ValueError(f"weighted_sample_exact: n must be >= 1, got {n}")
    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    u = (
        F.conv(F.substring(h, 1, _FRAC_HEX_DIGITS), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(_FRAC_DENOM)
    # NaN guard alongside > 0: Spark ORDERS NaN greater than every
    # number, so `w > 0` alone is TRUE for NaN and the key would go
    # NaN — either an opaque ANSI cast error or a silent exclusion,
    # both the exact failure the loud guard exists to prevent
    w_d = F.col(weight_col).cast("double")
    w_ok = F.when(
        (w_d > 0) & ~F.isnan(w_d), w_d
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_sample_exact: non-positive (or NaN/NULL) "),
                F.lit("weight for key "),
                F.col(key_col).cast("string"),
                F.lit(
                    " — Efraimidis-Spirakis needs w > 0; filter "
                    "zero/NaN/NULL-weight rows explicitly before sampling"
                ),
            )
        ).cast("double")
    )
    key = (F.log(u) / w_ok).cast("decimal(28,9)")
    if strata_cols:
        win = Window.partitionBy(*strata_cols).orderBy(
            key.desc(), F.col(key_col)
        )
        return (
            df.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= n)
            .drop("_rk")
        )
    return (
        df.withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(key_col))
        .limit(n)
        .drop("_es_key")
    )
