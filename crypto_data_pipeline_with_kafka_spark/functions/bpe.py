"""Distributed byte-pair-encoding (BPE) merge learning — the tokenizer
-training step of an LLM data pipeline (Sennrich et al. 2016,
word-level variant), expressed Spark-first.

Why it belongs in the engine: the vocabulary and pair statistics are
CORPUS-WIDE aggregates (the part that doesn't fit one machine at
100 TB), while each merge application is a per-word array rewrite (the
part Spark parallelizes for free). One driver sync per learned merge is
inherent to the algorithm — each round's argmax pair decides the next
round's rewrite — so the loop shape is: tiny TakeOrdered action per
round over a VOCAB-sized relation (sublinear in the corpus; the corpus
is touched exactly once, by the word-frequency aggregation).

Scale shape per round: one explode of adjacent symbol pairs over the
vocab + one map-side-combined groupBy(pair) + one top-1
(TakeOrderedAndProject) — no corpus pass, no shuffle of text. The
symbol rewrite is a pure JVM higher-order ``aggregate`` lambda (greedy
left-to-right non-overlapping merge, the standard BPE scan). Lineage is
truncated with ``localCheckpoint`` every ``checkpoint_every`` rounds —
the same plan-tree discipline as ``operators/dedup.connected_components``
(a k-round withColumn chain of big lambdas otherwise makes driver
analysis, not execution, the bottleneck).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import widen_if_narrow
from crypto_data_pipeline_with_kafka_spark.functions.text import tokens

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    widen: bool = True,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-wide pass BPE
    needs; everything after operates on this vocab-sized relation.
    ``widen=False`` for derived (non-scan) inputs — see the
    widen_if_narrow caller contract. ``toks``: a pre-tokenized
    (id, ``_ws``) relation (the dedup module's ``tokenized_docs``
    shape, ideally persisted) replaces the scan+tokenize — the r16
    shared-token-relation hook; explode of a NULL token array drops
    the row exactly as tokenizing a NULL text did."""
    exploded = (
        toks.select(F.explode("_ws").alias("word"))
        if toks is not None
        # keyed on the text itself: hash partitioning keeps the widen's
        # layout deterministic under retry (the keyless fallback is
        # round-robin), and the immediate groupBy re-keys anyway
        else (widen_if_narrow(docs, text_col) if widen else docs).select(
            F.explode(tokens(text_col)).alias("word")
        )
    )
    return (
        exploded.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Characters of the word plus the end-of-word marker (word-level
    BPE's word-boundary symbol)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _merge_expr(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    into a+b — the standard BPE rewrite — as one JVM ``aggregate``
    lambda: append each symbol unless the accumulator ends with ``a``
    and the symbol is ``b``, in which case the tail is replaced by the
    merged symbol (which then cannot merge again this round: the scan
    is non-overlapping by construction)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _adjacent_pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): corpus-weighted adjacent-symbol pair frequencies
    from the (word, freq, sym) relation."""
    idx = F.sequence(F.lit(1), F.size("sym") - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("sym", i).alias("a"),
            F.element_at("sym", i + 1).alias("b"),
        ),
    )
    return (
        words.filter(F.size("sym") >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
    merges_per_sync: int = 1,
    stats: dict | None = None,
    widen: bool = True,
    toks: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.
    Returns the ordered rule list [(a, b), ...]; ties broken
    deterministically by (count DESC, a ASC, b ASC) so the learned
    tokenizer is reproducible under any partitioning. Stops early when
    the best remaining pair falls under ``min_pair_freq``.

    ``merges_per_sync`` (default 1 = exact sequential BPE) is the scale
    knob for real tokenizer training, where 30k-50k merges at one
    driver sync each would mean ~10⁵ round-trips over the vocab-sized
    relation: each sync takes the top-``merges_per_sync`` ranked pairs
    and applies the longest PREFIX that is pairwise non-interacting —
    no selected pair shares a symbol (incl. the merged symbol) with an
    earlier selection. Within such a prefix each merge's count and
    applicability are unaffected by the others, and stopping at the
    first interaction (rather than skipping past it) preserves the
    sequential rule ORDER. This is the standard batched-BPE
    approximation: it deviates from exact sequential BPE only when a
    merge-CREATED pair would have outranked a later selected pair —
    rare on natural corpora (new pairs ramp up over rounds), and
    impossible within a sync's prefix itself. The fixture-corpus test
    pins batched ≡ sequential with the measured sync count.

    ``stats`` (optional dict) receives ``sync_rounds`` — the number of
    driver round-trips actually spent — and ``merge_counts``, the
    corpus-weighted pair count of each returned rule AT selection time
    (aligned with the returned list; the number the argmax ranked on,
    so an attestation can value-check the selection, not just the
    winning pair).

    The returned list is O(n_merges) — driver-sized by definition (it
    IS the tokenizer artifact), not a collected data relation.
    ``toks`` threads a pre-tokenized relation into the one corpus pass
    (see :func:`word_frequencies`)."""
    words = (
        word_frequencies(docs, text_col, widen=widen, toks=toks)
        .withColumn("sym", _initial_symbols(F.col("word")))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    merge_counts: list[int] = []
    rounds = 0
    applied = 0
    while len(merges) < n_merges:
        want = min(max(1, merges_per_sync), n_merges - len(merges))
        top = (
            _adjacent_pair_counts(words)
            .filter(F.col("cnt") >= min_pair_freq)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(want)
            .collect()
        )
        rounds += 1
        if not top:
            break
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            syms = {r["a"], r["b"], r["a"] + r["b"]}
            if chosen and (syms & used):
                break  # prefix-stop keeps the sequential rule order
            chosen.append((r["a"], r["b"], r["cnt"]))
            used |= syms
        for a, b, cnt in chosen:
            merges.append((a, b))
            merge_counts.append(int(cnt))
            words = words.withColumn("sym", _merge_expr(F.col("sym"), a, b))
            applied += 1
            if applied % checkpoint_every == 0:
                # truncate the growing lambda-projection chain so
                # per-round analysis stays O(checkpoint_every)
                words = words.localCheckpoint(eager=False)
    if stats is not None:
        stats["sync_rounds"] = rounds
        stats["merge_counts"] = merge_counts
    return merges


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
    widen: bool = True,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id, bpe_tokens array<string>): tokenize the corpus with learned
    merge rules. The rules are applied on the DISTINCT-WORD vocab (the
    same sublinear-side trick as ``operators.dedup.simhash_bits`` —
    per-word work happens once per vocab entry, not once per corpus
    occurrence) and the (word → pieces) map is joined back to the
    exploded corpus (AQE picks broadcast when the vocab is actually
    small), then re-assembled in word order. ``toks``: a pre-tokenized
    (id, ``_ws``) relation replaces the scan+tokenize (see
    :func:`word_frequencies`)."""
    toked = (
        toks.select(F.col(id_col), F.posexplode("_ws").alias("pos", "word"))
        if toks is not None
        else (widen_if_narrow(docs, id_col) if widen else docs).select(
            F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "word")
        )
    )
    vocab = toked.select("word").distinct().withColumn(
        "sym", _initial_symbols(F.col("word"))
    )
    for i, (a, b) in enumerate(merges):
        vocab = vocab.withColumn("sym", _merge_expr(F.col("sym"), a, b))
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    # NO forced broadcast on the vocab: distinct-word counts are
    # unbounded on web-scale corpora (heavy-tailed typos/URLs/numbers
    # push them past broadcast limits, each row carrying a symbol
    # array). AQE broadcasts it at runtime whenever it actually is
    # small (the test-scale case) and degrades to a skew-tolerant
    # shuffle join on `word` instead of an OOM when it is not — the
    # repo-wide rule against forced broadcasts of O(corpus) relations.
    pieces = toked.join(vocab, "word")
    return (
        pieces.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                    lambda s: s["sym"],
                )
            ).alias("bpe_tokens")
        )
    )
