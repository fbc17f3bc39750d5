"""Hashed-feature Naive-Bayes quality classifier — the model-based
document filter of an LLM data pipeline (the role fastText plays in
CCNet/LLaMA-style curation: train a cheap linear text classifier on a
small labeled set — often weak labels from heuristics like
``gopher_rules`` or a trusted-corpus-vs-crawl split — then score every
document in the corpus for pennies). Public method: multinomial Naive
Bayes over feature-hashed unigrams+bigrams (the hashing trick,
Weinberger et al. 2009; fastText's fixed-size bucket table).

Why NB and not logistic regression: NB's MLE is a CLOSED-FORM count
aggregation — the whole training pass is ONE ``groupBy(bucket)`` with
map-side combine, no iterative driver loop, no gradient sync — and on
hashed bag-of-words features it is the textbook high-bias/low-variance
baseline. At 100 TB the training corpus streams through one shuffle
keyed by bucket (cardinality capped at ``num_buckets``), and the model
artifact is a ≤ ``num_buckets``-row table — broadcastable by
CONSTRUCTION, which is exactly the point of the hashing trick.

Numeric contract (the module invariant, same as ``bigram_lm_quality``):
per-bucket log-odds are quantized to decimal(28,9) at train time, so
the per-doc sum is exact integer-decimal addition — order-free under
any partitioning — and a sequential Python reference with the same
quantization reproduces every score to ≤ 1e-9 (pinned in tests).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.functions.text import tokens

# per-feature log-odds quantization: decimal(28,9) keeps 9 fractional
# digits (absorbing JVM-vs-libm log() ulp noise) and 19 integral — a
# doc would need ~1e19 tokens to overflow the per-doc sum
_WDEC = "decimal(28,9)"


def hashed_features(
    text_col: Column | str, num_buckets: int, use_bigrams: bool = True
) -> Column:
    """array<long> of hashed feature ids for a document: whitespace
    unigrams plus (optionally) adjacent bigrams joined with a space —
    tokens never contain whitespace, so the bigram string space is
    collision-free with unigrams. Bucket = the md5-prefix integer
    (the repo's engine-portable hash — ``sampling._hash_fraction``'s
    52-bit idiom) mod ``num_buckets``. Duplicates are KEPT: NB is a
    count model, a token appearing twice contributes its log-odds
    twice. One in-row projection, zero shuffles."""
    ws = tokens(text_col)
    feats = (
        F.concat(
            ws,
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
        if use_bigrams
        else ws
    )
    return F.transform(
        feats,
        lambda t: F.conv(
            F.substring(F.md5(F.concat(F.lit("nbq|"), t)), 1, 13), 16, 10
        ).cast("long")
        % num_buckets,
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_buckets: int = 1 << 18,
    use_bigrams: bool = True,
    alpha: float = 1.0,
) -> tuple[DataFrame, dict]:
    """Train multinomial NB on ``labeled`` (rows with ``label_col``
    ∈ {0, 1}; 1 = keep/high-quality). Returns ``(weights, meta)``:

    * ``weights`` — (bucket long, w decimal(28,9)): the per-bucket
      log-odds REPARAMETERIZED so unseen buckets contribute exactly 0.
      With class token totals T_c and bucket counts n_bc, standard NB
      scores Σ_tokens [log((n_b1+α)/(T_1+αB)) − log((n_b0+α)/(T_0+αB))]
      + log(N_1/N_0). Subtracting the unseen-bucket default
      d = log(T_0+αB) − log(T_1+αB) from every weight gives
      w'_b = log((n_b1+α)/α) − log((n_b0+α)/α) — totals cancel, and a
      doc's score becomes prior + d·n_tokens + Σ w'_b over MATCHED
      buckets only, so scoring joins sparsely and misses cost nothing.
      Persist to parquet and read back to reuse the model.
    * ``meta`` — {num_buckets, use_bigrams, alpha, prior, default_w,
      n_pos, n_neg}: the O(1) scalars of the model. The ONLY driver
      sync in training is this one 2-row totals collect (the module's
      mixture-bounds-probe exception).

    Scale shape: ONE shuffle — ``groupBy(bucket)`` with map-side
    combine, output ≤ num_buckets rows regardless of corpus size (the
    hashing trick's whole point: model size is fixed at train time,
    which is what makes the scoring join broadcastable below)."""
    counts = (
        labeled.select(
            (F.col(label_col) == 1).cast("int").alias("_y"),
            F.explode(
                hashed_features(text_col, num_buckets, use_bigrams)
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("_y").alias("_n1"),
            F.sum(F.lit(1) - F.col("_y")).alias("_n0"),
        )
    )
    doc_tok = labeled.select(
        (F.col(label_col) == 1).cast("int").alias("_y")
    ).agg(
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).alias("n_neg"),
    )
    tot = counts.agg(
        F.sum("_n1").alias("t1"), F.sum("_n0").alias("t0")
    ).collect()[0]
    nd = doc_tok.collect()[0]
    if not nd.n_pos or not nd.n_neg:
        raise ValueError(
            "train_quality_classifier: both classes must be non-empty "
            f"(got n_pos={nd.n_pos}, n_neg={nd.n_neg})"
        )
    t1 = int(tot.t1 or 0)
    t0 = int(tot.t0 or 0)
    ab = alpha * num_buckets
    meta = {
        "num_buckets": num_buckets,
        "use_bigrams": use_bigrams,
        "alpha": alpha,
        "prior": math.log(nd.n_pos / nd.n_neg),
        "default_w": math.log(t0 + ab) - math.log(t1 + ab),
        "n_pos": int(nd.n_pos),
        "n_neg": int(nd.n_neg),
    }
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("_n1") + F.lit(alpha)) / F.lit(alpha))
            - F.log((F.col("_n0") + F.lit(alpha)) / F.lit(alpha))
        )
        .cast(_WDEC)
        .alias("w"),
    )
    return weights, meta


def score_with_quality_classifier(
    docs: DataFrame,
    model: tuple[DataFrame, dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a trained ``(weights, meta)`` model.
    Returns (id, n_feats, quality_logit, quality_prob) with
    ``quality_prob`` = σ(logit), the NB posterior P(keep | doc) — the
    column a curation pipeline thresholds (FineWeb-Edu-style) or uses
    as a sampling weight.

    Scale shape: features explode in-row, join the BROADCAST weights
    table (≤ num_buckets rows by construction — the model cannot
    outgrow its train-time cap), then ONE groupBy(id) with map-side
    combine. Zero-token docs survive via explode_outer and score
    exactly the prior. Per-token weights are the stored decimals, the
    per-doc fold is exact decimal addition (order-free); the O(1)
    prior/default terms attach as doubles at the end.

    NULL text keeps its row with NULL logit/prob (the
    ``sentiment_scores_join`` convention — a missing document must
    surface as missing, not silently score as if it had −1
    features)."""
    weights, meta = model
    feats = docs.select(
        F.col(id_col),
        hashed_features(
            text_col, meta["num_buckets"], meta["use_bigrams"]
        ).alias("_fs"),
    ).select(
        F.col(id_col),
        # size(NULL) is -1, which would silently flow into the
        # default_w·n term — keep NULL NULL so the logit propagates it
        F.when(F.col("_fs").isNotNull(), F.size("_fs")).alias("_nf"),
        F.explode_outer("_fs").alias("bucket"),
    )
    per_doc = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.first("_nf").alias("n_feats"),
            F.sum(F.coalesce(F.col("w"), F.lit(0).cast(_WDEC)))
            .cast("string")
            .cast("double")
            .alias("_sw"),
        )
    )
    logit = (
        F.lit(meta["prior"])
        + F.lit(meta["default_w"]) * F.col("n_feats")
        + F.col("_sw")
    )
    return per_doc.select(
        id_col,
        "n_feats",
        logit.alias("quality_logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("quality_prob"),
    )
