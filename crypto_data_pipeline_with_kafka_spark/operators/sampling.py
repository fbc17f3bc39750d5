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
