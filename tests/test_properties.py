"""Property-based tests (hypothesis): operator semantics hold on
arbitrary generated inputs, not just the fixtures. Kept to few examples
per property — each example spins Spark jobs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from crypto_data_pipeline_with_kafka_spark.operators.relational import (
    asof_join,
    get_or_create_keys,
    salted_join,
)

_SETTINGS = dict(max_examples=8, deadline=None)


@st.composite
def _series(draw):
    n = draw(st.integers(2, 12))
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=draw(st.integers(0, 500))),
                draw(st.integers(1, 3)),
                draw(st.sampled_from(["purchase", "error"])),
                float(draw(st.integers(1, 1000))) / 4.0,
            )
        )
    return rows


@given(_series())
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    left = df.filter("event_type = 'error'").select("user_id", "event_id", "ts")
    right = df.filter("event_type = 'purchase'").select(
        "user_id", "ts", "value", "event_id"
    )
    got = (
        asof_join(left, right, ("user_id",), "ts", "ts", ("value",), tie_col="event_id")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )

    lp = left.toPandas().sort_values(["ts", "event_id"])
    # dedupe right to max event_id per (user, ts), as tie_col does
    rp = (
        right.toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .groupby(["user_id", "ts"], as_index=False)
        .last()
        .sort_values(["ts"])
    )
    if len(lp) == 0:
        assert len(got) == 0
        return
    want = pd.merge_asof(
        lp, rp[["user_id", "ts", "value"]], on="ts", by="user_id", direction="backward"
    ).sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert g.user_id == w.user_id and g.event_id == w.event_id
        gv = None if pd.isna(g.asof_value) else g.asof_value
        wv = None if pd.isna(w.value) else w.value
        assert gv == wv, (g, w)


@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=20),
    st.lists(st.sampled_from(["a", "b", "x", "y"]), min_size=0, max_size=5, unique=True),
)
@settings(**_SETTINGS)
def test_get_or_create_keys_properties(spark, incoming_names, existing_names):
    existing = spark.createDataFrame(
        [(n, i + 1) for i, n in enumerate(sorted(existing_names))] or [("‐", 0)],
        "type_name string, type_id long",
    )
    if not existing_names:
        existing = existing.filter("type_id > 0")  # empty dim
    incoming = spark.createDataFrame(
        [(n,) for n in incoming_names] or [("‐",)], "type_name string"
    )
    if not incoming_names:
        incoming = incoming.filter("type_name IS NULL")
    out = get_or_create_keys(existing, incoming, "type_name", "type_id").toPandas()
    # ids unique; all names covered; existing ids unchanged
    assert out["type_id"].is_unique
    assert set(out["type_name"]) >= (set(incoming_names) | set(existing_names))
    ex = {n: i + 1 for i, n in enumerate(sorted(existing_names))}
    for _, r in out.iterrows():
        if r["type_name"] in ex:
            assert r["type_id"] == ex[r["type_name"]]


@given(st.integers(2, 16))
@settings(max_examples=4, deadline=None)
def test_salted_join_equals_plain_join(spark, buckets):
    fact = spark.range(0, 200).selectExpr("id AS k", "id * 2 AS v")
    # skew: all but 10 rows share key 0
    fact = fact.selectExpr("CASE WHEN k < 190 THEN 0 ELSE k END AS k", "v")
    dim = spark.createDataFrame(
        [(0, "hot"), (195, "cold")], "k long, label string"
    )
    got = salted_join(fact, dim, "k", salt_buckets=buckets)
    want = fact.join(dim, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_sentiment_udf_equals_builtin(spark):
    """The Arrow Pandas-UDF sentiment (UD1, registered) and the built-in
    JVM composition (the hot path, exercised inside news_pipeline) are
    bitwise-identical — half-point lexicon scores are binary-exact, so
    summation order cannot perturb either side."""
    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        sentiment_builtin,
        sentiment_pandas_udf,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    b = {r.doc_id: r.s for r in docs.select("doc_id", sentiment_builtin("text").alias("s")).collect()}
    u = {r.doc_id: r.s for r in docs.select("doc_id", sentiment_pandas_udf()("text").alias("s")).collect()}
    assert b == u and len(b) > 0


def test_sentiment_join_matches_fold_and_scales_plan(spark):
    """The large-lexicon sentiment path (r5: explode → broadcast-join →
    per-doc decimal mean) on the stand-in lexicon is bitwise-equal to
    the fold twins (half-point scores are binary-exact, and the decimal
    quantization is exact for them); on a synthetic 6k-entry lexicon it
    matches a sequential Python reference exactly while the plan stays
    O(1): NO create_map literal (the documented ~15k-literal planner
    cliff for real VADER) and the lexicon side joins as a
    BroadcastHashJoin."""
    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        sentiment_builtin,
        sentiment_lexicon_df,
        sentiment_scores_join,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    lex_df = sentiment_lexicon_df(spark)  # stand-in lexicon
    j = {
        r.doc_id: r.sentiment
        for r in sentiment_scores_join(docs, lex_df).collect()
    }
    b = {
        r.doc_id: r.s
        for r in docs.select("doc_id", sentiment_builtin("text").alias("s")).collect()
    }
    assert j == b and len(j) > 0

    # synthetic >=5k-entry lexicon on a 2^-1 grid (exact doubles): the
    # deployment-scale shape real VADER needs
    big_lex = {f"tok{i}": (i % 9 - 4) * 0.5 for i in range(6000)}
    rows = [
        (0, "tok0 tok1 tok2 unknown tok5999"),
        (1, "unknown words only here"),
        (2, "tok17 tok17 tok4000"),
        (3, "tok8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    big_df = sentiment_lexicon_df(spark, big_lex)
    out = sentiment_scores_join(df, big_df)
    got = {r.doc_id: r.sentiment for r in out.collect()}
    want = {
        i: sum(big_lex.get(w, 0.0) for w in t.split(" ")) / len(t.split(" "))
        for i, t in rows
    }
    assert got == want

    # NULL text must surface as a NULL-sentiment ROW (explode_outer),
    # matching the fold twins — not silently vanish from the output
    with_null = spark.createDataFrame(
        [(0, "tok0 tok1"), (1, None)], "doc_id long, text string"
    )
    got_n = {
        r.doc_id: r.sentiment
        for r in sentiment_scores_join(with_null, big_df).collect()
    }
    assert set(got_n) == {0, 1} and got_n[1] is None

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "create_map" not in plan, plan
    assert "map_keys" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_vader_lexicon_swap(spark, tmp_path, monkeypatch):
    """The VADER swap-in slot: a lexicon file in the standard
    vader_lexicon.txt format (token<TAB>mean<TAB>stddev<TAB>ratings)
    replaces the stand-in for BOTH sentiment paths via
    SPARK_GRAFT_VADER_LEXICON, and the two paths stay bitwise-equal
    with non-half-point scores (identical left-fold order, see
    sentiment_pandas_udf). The file here is synthetic, VADER-format —
    the real MIT-licensed lexicon drops in unchanged."""
    import crypto_data_pipeline_with_kafka_spark.functions.text as tx

    lex_file = tmp_path / "vader_lexicon.txt"
    lex_file.write_text(
        "# comment line\n"
        "great\t3.1\t0.80623\t[3, 3, 4, 2, 3, 3, 3, 4, 3, 3]\n"
        "terrible\t-2.7\t0.78102\t[-3, -2, -3, -3, -2, -3, -3, -2, -3, -3]\n"
        "meh\t-0.9\t0.53852\t[-1, 0, -1, -1, -1, -1, -1, -1, -1, -1]\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_VADER_LEXICON", str(lex_file))
    # the cache is keyed by path (r5): re-pointing the env re-resolves
    # without poking any private state; the public reset also exists for
    # in-place file edits
    lex = tx.active_sentiment_lexicon()
    assert lex == {"great": 3.1, "terrible": -2.7, "meh": -0.9}
    lex_file.write_text("solo\t1.5\t0.5\t[1, 2]\n")
    assert tx.active_sentiment_lexicon() == lex  # cached parse
    tx.reset_sentiment_lexicon_cache()
    assert tx.active_sentiment_lexicon() == {"solo": 1.5}
    lex_file.write_text(
        "great\t3.1\t0.80623\t[3]\nterrible\t-2.7\t0.78102\t[-3]\n"
        "meh\t-0.9\t0.53852\t[-1]\n"
    )
    tx.reset_sentiment_lexicon_cache()
    rows = [(1, "great great terrible"), (2, "meh and boring stuff")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    b = {r.doc_id: r.s for r in df.select("doc_id", tx.sentiment_builtin("text").alias("s")).collect()}
    u = {r.doc_id: r.s for r in df.select("doc_id", tx.sentiment_pandas_udf()("text").alias("s")).collect()}
    assert b == u
    assert b[1] == (3.1 + 3.1 + -2.7) / 3
    assert b[2] == -0.9 / 4


@given(
    n_tokens=st.integers(0, 400),
    max_tokens=st.integers(2, 120),
    overlap_frac=st.floats(0.0, 0.9),
)
@settings(**_SETTINGS)
def test_chunker_partitions_token_stream(spark, n_tokens, max_tokens, overlap_frac):
    """For ANY (doc length, chunk size, overlap): chunks cover the
    token stream exactly (non-overlap concatenation == original), every
    chunk fits the bound, and consecutive chunks share exactly
    `overlap` tokens (except possibly the final short chunk)."""
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import chunk_documents

    overlap = min(int(max_tokens * overlap_frac), max_tokens - 1)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(
        df, max_tokens=max_tokens, overlap=overlap
    ).orderBy("chunk_id").collect()
    toks = [r.text.split(" ") if r.text else [] for r in rows]
    toks = [[t for t in c if t] for c in toks]
    assert all(len(c) <= max_tokens for c in toks)
    rebuilt = (toks[0] if toks else []) + [
        t for c in toks[1:] for t in c[overlap:]
    ]
    assert rebuilt == [f"t{i}" for i in range(n_tokens)]
    for a, b in zip(toks, toks[1:]):
        shared = min(overlap, len(b))
        assert a[-shared:] == b[:shared] if shared else True


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=10,
    ),
    num_centroids=st.integers(2, 5),
    probes=st.integers(1, 4),
)
@settings(max_examples=6, deadline=None)
def test_ivf_assignment_matches_python_reference(spark, vecs, num_centroids, probes):
    """For ANY small corpus/knobs: the in-row two-pass probe assignment
    equals a transparent pure-Python reference computed with exact
    integer dots and the same string-hopped double conversion — pinning
    the md5 centroid order, the trunc-quantization, the decimal→string
    →double rounding, and the (score desc, centroid asc) tie-break,
    independent of the fixture corpus."""
    import hashlib
    import math

    from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
        ivf_assignments,
    )

    # respect the documented domain bound (vector norms ≥ 1e-3): pin
    # the first component away from zero
    vecs = [[0.5 + 0.1 * i] + v[1:] for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        (r.vec_id, r.centroid_id)
        for r in ivf_assignments(df, num_centroids, probes).collect()
    }

    order = sorted(
        range(len(vecs)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    cents = order[:num_centroids]
    want = set()
    for vid, v in enumerate(vecs):
        vq = [int(x * 1e12) for x in v]  # trunc toward zero, like the cast
        scores = []
        for rank, cvid in enumerate(cents, start=1):
            cq = [int(x * 1e12) for x in vecs[cvid]]
            dot = sum(a * b for a, b in zip(vq, cq))  # exact (python int)
            cnorm = math.sqrt(float(str(sum(q * q for q in cq))))
            scores.append((rank, float(str(dot)) / cnorm))
        top = sorted(scores, key=lambda t: (-t[1], t[0]))[:probes]
        want.update((vid, cid) for cid, _ in top)
    assert got == want


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False),
            min_size=6,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    num_planes=st.integers(2, 20),
)
@settings(max_examples=6, deadline=None)
def test_lsh_buckets_match_python_reference(spark, vecs, num_planes):
    """For ANY vectors/plane count: the one-pass packed-mask bucket
    computation equals a transparent pure-Python reference (md5 plane
    signs, trunc-quantization, exact integer projection, sign bit) —
    pinning the single-fold formulation to the per-plane definition it
    replaced."""
    import hashlib

    from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
        lsh_buckets,
    )

    dim = 6
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: r.bucket
        for r in lsh_buckets(df, num_planes, dim, "vec_id").collect()
    }
    signs = [
        [
            1 if hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0] in "02468ace" else -1
            for i in range(1, dim + 1)
        ]
        for p in range(num_planes)
    ]
    for vid, v in enumerate(vecs):
        vq = [int(x * 1e12) for x in v]  # trunc toward zero, like the cast
        want = "".join(
            "1" if sum(q * s for q, s in zip(vq, row)) > 0 else "0"
            for row in signs
        )
        assert got[vid] == want, (vid, got[vid], want)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    """For ANY small graph (self-loops and duplicate edges included):
    the iterative min-label-propagation operator assigns every node the
    component-min id that a transparent union-find computes."""
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.doc_id: r.canonical_id for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}
    assert got == want


@given(
    w=st.lists(st.floats(0.05, 1.0), min_size=1, max_size=4),
    salt=st.sampled_from(["a", "b"]),
)
@settings(**_SETTINGS)
def test_hash_split_total_and_stable(spark, w, salt):
    """For ANY weights/salt: every row lands in exactly one split, and
    per-row assignment is independent of which other rows are present."""
    from crypto_data_pipeline_with_kafka_spark.operators.sampling import hash_split

    weights = {f"s{i}": x for i, x in enumerate(w)}
    df = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    full = {r.doc_id: r.split for r in hash_split(df, weights, salt=salt).collect()}
    assert len(full) == 60 and all(v in weights for v in full.values())
    sub = {
        r.doc_id: r.split
        for r in hash_split(df.filter("doc_id < 17"), weights, salt=salt).collect()
    }
    assert all(full[k] == v for k, v in sub.items())


@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 5000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 4096),
    st.integers(1, 6),
)
@settings(max_examples=6, deadline=None)
def test_pack_sequences_matches_python_pack(spark, rows, budget, n_shards):
    """On ARBITRARY (id, token-count) corpora — including 0-token docs,
    huge ids, tiny budgets — pack_sequences must equal a sequential
    pure-Python concat-and-cut pack of each md5 shard in id order."""
    import hashlib

    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        pack_sequences,
    )

    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.pack_shard, r.pack_seq, r.pack_offset)
        for r in pack_sequences(df, budget, "n_tok", n_shards=n_shards).collect()
    }
    cum = {s: 0 for s in range(n_shards)}
    for doc_id, n_tok in sorted(rows):
        s = (
            int(hashlib.md5(f"pack-v1|{doc_id}".encode()).hexdigest()[:4], 16)
            % n_shards
        )
        assert got[doc_id] == (s, cum[s] // budget, cum[s] % budget)
        cum[s] += n_tok


def test_connected_components_long_chain_multi_round(spark):
    """A 64-node path graph forces the pointer-jumping loop through its
    EXTRA-round path (the seed labeling converges only for dense
    cliques; a chain needs O(log diameter) rounds, each with its own
    convergence probe) — the branch the dense-clique fixtures and small
    random graphs rarely reach. Every node must still resolve to the
    chain's minimum id."""
    from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
        connected_components,
    )

    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    # a second, disjoint chain with larger ids keeps two components
    edges += [(1000 + i, 1000 + i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.doc_id: r.canonical_id for r in connected_components(df).collect()}
    assert got == {**{i: 0 for i in range(n)},
                   **{1000 + i: 1000 for i in range(n)}}


def test_html_paragraph_text_matches_soup_semantics(spark):
    """html_paragraph_text mirrors the reference crawl's
    BeautifulSoup find_all('p') -> .text.strip() -> ' '.join on
    representative article markup: script/style dropped, inline tags
    concatenated without injected spaces (like .text), comments
    removed, entities decoded once (&amp;lt; stays literal '&lt;'),
    empty paragraphs kept by the join exactly as ' '.join does."""
    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        html_paragraph_text,
    )

    cases = [
        # (html, expected == ' '.join(p.text.strip() for p in soup('p')))
        ("<html><body><p>Hello world</p></body></html>", "Hello world"),
        ("<p>A <b>bold</b>move</p><p>second</p>", "A boldmove second"),
        ("<p>\n  spaced\n</p>", "spaced"),
        ("<P CLASS='lead'>upper tag</P>", "upper tag"),
        ("<p>multi\nline\npara</p>", "multi\nline\npara"),
        ("<p>a</p><script>var x = '<p>no</p>';</script><p>b</p>", "a b"),
        ("<style>p{color:red}</style><p>styled</p>", "styled"),
        ("<p>AT&amp;T &lt;3 &quot;quotes&quot; &#39;q&#39;</p>", "AT&T <3 \"quotes\" 'q'"),
        ("<p>&amp;lt; stays literal</p>", "&lt; stays literal"),
        ("<p><!-- hidden -->shown</p>", "shown"),
        ("<p></p><p>after empty</p>", " after empty"),
        ("no paragraphs here", ""),
        ("<p>first</p>between<p>last</p>", "first last"),
        ("<p>nbsp&nbsp;space</p>", "nbsp space"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_paragraph_text("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_bigram_lm_quality_matches_python_reference(spark):
    """The corpus-trained bigram LM scorer (perplexity filter) must
    reproduce a sequential Python implementation of the same model —
    add-k-smoothed bigram MLE, decimal(28,9)-quantized log-prob sums —
    to within the quantization grain, and planted gibberish must score
    strictly worse (higher perplexity) than text drawn from the
    corpus's own vocabulary."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        bigram_lm_quality,
    )

    sentences = [
        "the cat sat on the mat",
        "the cat ran on the mat",
        "the dog sat on the rug",
        "a dog ran to the rug",
    ]
    # 5 copies each: corpus bigrams need real counts for the self-trained
    # model to separate them from the gibberish doc's singletons
    rows = [(10 * c + s, txt) for s, txt in enumerate(sentences) for c in range(5)]
    rows += [
        (95, "zz qq xx vv kk jj"),  # gibberish: every bigram unseen elsewhere
        (96, "one"),  # < 2 tokens -> no score row
    ]
    normal_ids = [i for i, _ in rows[:-2]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_lm_quality(df).collect()}
    assert 96 not in got

    # ---- sequential reference
    K = 0.5
    toks = {i: t.strip().split(" ") for i, t in rows}
    uni = Counter(w for ws in toks.values() for w in ws)
    big = Counter(
        (ws[j], ws[j + 1]) for ws in toks.values() for j in range(len(ws) - 1)
    )
    V = len(uni)
    want = {}
    for i, ws in toks.items():
        bgs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        if not bgs:
            continue
        q = Decimal(0)
        for b in bgs:
            lp = math.log((big[b] + K) / (uni[b[0]] + K * V))
            q += Decimal(lp).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        want[i] = float(str(q)) / len(bgs)
    assert set(got) == set(want)
    for i, w in want.items():
        assert abs(got[i].avg_logprob - w) <= 1e-9, (i, got[i].avg_logprob, w)
        assert abs(got[i].ppl - math.exp(-got[i].avg_logprob)) < 1e-12
    # gibberish lands in the low-probability tail
    assert got[95].ppl > max(got[i].ppl for i in normal_ids)


def test_bigram_lm_cross_corpus_scoring(spark):
    """The production CCNet shape: train on a clean corpus, score a
    DIFFERENT corpus. Unseen bigrams/head-words take the smoothed floor
    (left join + coalesce — P=(0+k)/(0+k·V)); values match a sequential
    reference, and a fully out-of-vocabulary doc scores the worst
    perplexity."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from crypto_data_pipeline_with_kafka_spark.functions.text import (
        score_with_bigram_lm,
        train_bigram_lm,
    )

    clean = [(i, "the cat sat on the mat") for i in range(3)] + [
        (3, "the dog sat on the rug")
    ]
    crawl = [
        (100, "the cat sat on the rug"),   # all bigrams in-model
        (101, "the cat zz on the mat"),    # novel bigrams, known words
        (102, "qq ww ee rr"),              # fully out-of-vocabulary
    ]
    model = train_bigram_lm(spark.createDataFrame(clean, "doc_id long, text string"))
    got = {
        r.doc_id: r
        for r in score_with_bigram_lm(
            spark.createDataFrame(crawl, "doc_id long, text string"), model
        ).collect()
    }

    K = 0.5
    toks = [t.split(" ") for _, t in clean]
    uni = Counter(w for ws in toks for w in ws)
    big = Counter((ws[j], ws[j + 1]) for ws in toks for j in range(len(ws) - 1))
    V = len(uni)
    for i, txt in crawl:
        ws = txt.split(" ")
        q = Decimal(0)
        bgs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        for b in bgs:
            lp = math.log((big.get(b, 0) + K) / (uni.get(b[0], 0) + K * V))
            q += Decimal(lp).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        want = float(str(q)) / len(bgs)
        assert abs(got[i].avg_logprob - want) <= 1e-9, (i, got[i].avg_logprob, want)
    assert got[102].ppl > got[101].ppl > got[100].ppl


# ------------------------- multimodal parsers (pure Python, no Spark) --


@st.composite
def _wav_params(draw):
    return (
        draw(st.sampled_from([1, 3])),        # PCM / IEEE float
        draw(st.integers(1, 8)),              # channels
        draw(st.sampled_from([8000, 16000, 44100, 48000])),
        draw(st.sampled_from([8, 16, 24, 32])),
        draw(st.integers(0, 500)),            # n_samples
        draw(st.booleans()),                  # extra odd-sized chunk first
    )


@given(_wav_params())
@settings(max_examples=50, deadline=None)
def test_wav_decode_roundtrip_property(params):
    """Any well-formed RIFF/WAVE PCM/float file — including one with an
    odd-sized foreign chunk before fmt/data, exercising the even-byte
    chunk-padding walk — decodes to exactly the planted parameters."""
    import struct

    from crypto_data_pipeline_with_kafka_spark.multimodal import decode_audio_real

    tag, ch, rate, bits, n, extra = params
    frame = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * frame, frame, bits)
    body = b"WAVE"
    if extra:  # 3-byte chunk: walker must pad its size to 4 (even)
        body += b"note" + struct.pack("<I", 3) + b"abc" + b"\x00"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", n * frame) + bytes(n * frame)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    got = decode_audio_real(payload)
    want_fmt = "wav_pcm" if tag == 1 else "wav_float"
    assert got == (want_fmt, rate, ch, bits, n, n / rate)


@st.composite
def _y4m_params(draw):
    return (
        draw(st.integers(1, 16)) * 2,         # even width
        draw(st.integers(1, 12)) * 2,         # even height
        draw(st.integers(0, 6)),              # n_frames
        draw(st.sampled_from([b"420jpeg", b"420", b"422", b"444", b"mono"])),
        draw(st.integers(1, 4)),              # every_nth
    )


@given(_y4m_params())
@settings(max_examples=50, deadline=None)
def test_y4m_parse_roundtrip_property(params):
    """Any well-formed y4m stream parses to the planted geometry and
    frame count; frame offsets slice back rasters of exactly the
    colorspace's size; sampling arithmetic matches ceil(n/k)."""
    import math

    from crypto_data_pipeline_with_kafka_spark.multimodal import parse_video_real

    w, h, n_frames, cs, k = params
    per = {b"mono": w * h, b"422": w * h * 2, b"444": w * h * 3}.get(
        cs, w * h * 3 // 2
    )
    payload = b"YUV4MPEG2 W%d H%d F30:1 C%s\n" % (w, h, cs)
    for i in range(n_frames):
        payload += b"FRAME\n" + bytes([i % 251] * per)

    gw, gh, fps, offsets, fb = parse_video_real(payload)
    assert (gw, gh, fps, fb) == (w, h, 30.0, per)
    assert len(offsets) == n_frames
    for i, off in enumerate(offsets):
        assert payload[off : off + fb] == bytes([i % 251] * per)
    assert len(range(0, n_frames, k)) == math.ceil(n_frames / k) if n_frames else True


def test_chunk_level_dedup_matches_sequential_reference(spark):
    """chunk_level_dedup on a seeded random corpus with planted
    boilerplate equals a sequential pure-Python implementation of the
    same spec (aligned K-word chunks, drop if >= 2 distinct docs share
    the chunk, reassemble in order) — one Spark run, exact compare."""
    import random

    from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
        chunk_level_dedup,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(40)]
    boiler = ["copy right header block"] * 1  # 4-word boilerplate chunk
    docs = []
    for d in range(120):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        if d % 3 == 0:  # plant the shared chunk at an aligned offset
            words = boiler[0].split() + words
        docs.append((d, " ".join(words)))

    K = 4
    # sequential reference
    chunks_by_doc = {}
    freq: dict[str, set] = {}
    for d, text in docs:
        ws = text.strip().split(" ")
        cs = [" ".join(ws[i : i + K]) for i in range(0, len(ws), K)]
        chunks_by_doc[d] = cs
        for c in cs:
            freq.setdefault(c, set()).add(d)
    want = {}
    for d, cs in chunks_by_doc.items():
        kept = [c for c in cs if len(freq[c]) < 2]
        if kept:
            want[d] = (" ".join(kept), len(kept), len(cs))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_total)
        for r in chunk_level_dedup(df, words_per_chunk=K).collect()
    }
    assert got == want


def test_bm25_topk_matches_python_reference(spark):
    """bm25_topk vs an independent sequential BM25 (same k1/b/idf
    definition): identical ranking and micro-quantized scores."""
    import math

    from crypto_data_pipeline_with_kafka_spark.functions.text import bm25_topk

    corpus = {
        1: "spark shuffles the hash join build side",
        2: "broadcast the small build side of the join",
        3: "sort merge join shuffles both sides",
        4: "window functions need one exchange",
        5: "the the the the the repeated stopword document",
    }
    queries = {100: "broadcast join", 200: "the exchange"}
    k1, b = 1.2, 0.75

    docs_df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    q_df = spark.createDataFrame(list(queries.items()), ["query_id", "query_text"])
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in bm25_topk(docs_df, q_df, k=3, k1=k1, b=b).collect()
    }

    # sequential reference
    toks = {d: t.split(" ") for d, t in corpus.items()}
    n_docs = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    expected = {}
    for qid, qtext in queries.items():
        scores = {}
        for term in dict.fromkeys(qtext.split(" ")):
            df_t = sum(1 for ws in toks.values() if term in ws)
            if df_t == 0:
                continue
            idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
            for d, ws in toks.items():
                tf = ws.count(term)
                if tf == 0:
                    continue
                c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
                scores[d] = scores.get(d, 0) + round(c * 1e6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (d, s) in enumerate(ranked, 1):
            expected[(qid, rank)] = (d, s)

    assert got == expected
    # the repeated-stopword doc must NOT win 'the exchange' despite max tf
    # (length normalization + low idf of 'the')
    assert got[(200, 1)][0] == 4


def test_bpe_learning_matches_python_reference(spark):
    """learn_bpe_merges / bpe_tokenize vs a sequential reference BPE
    (Sennrich word-level): identical ordered rule list and identical
    tokenization, including the greedy non-overlapping rewrite on
    repeated symbols ('aaaa')."""
    from crypto_data_pipeline_with_kafka_spark.functions.bpe import (
        END_OF_WORD,
        bpe_tokenize,
        learn_bpe_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "widest wide wider new low",
        "aaaa aa aaaa",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    stats: dict = {}
    got = learn_bpe_merges(docs, n_merges=12, min_pair_freq=2, stats=stats)

    # --- sequential reference ---
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    words = {w: [*w, END_OF_WORD] for w in freqs}

    def merge_seq(sym, a, b):
        out = []
        for s in sym:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    expected = []
    expected_counts = []
    for _ in range(12):
        counts: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            for x, y in zip(sym, sym[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        a, b = best[0]
        expected.append((a, b))
        expected_counts.append(best[1])
        words = {w: merge_seq(sym, a, b) for w, sym in words.items()}

    assert got == expected and len(got) > 3
    # stats out-param: the selection-time pair count of each rule
    # (the number the argmax ranked on — the r13 'bpe' oracle leg's v
    # column) must align with the returned list
    assert stats["merge_counts"] == expected_counts

    # tokenization with the learned rules matches sequential application
    tok = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(docs, got).collect()
    }
    for d, t in enumerate(texts):
        seq = []
        for w in t.split(" "):
            sym = [*w, END_OF_WORD]
            for a, b in got:
                sym = merge_seq(sym, a, b)
            seq.extend(sym)
        assert tok[d] == seq, (d, tok[d], seq)


def test_collocations_match_python_reference(spark):
    """collocations (PMI phrase mining) vs a sequential reference:
    identical pairs, counts, and PMI values; min_count floor applied."""
    import math

    from crypto_data_pipeline_with_kafka_spark.functions.text import collocations

    texts = [
        "new york is big and new york is busy",
        "san francisco and new york",
        "the san francisco fog is busy",
        "is is is and and",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = [
        (r["w1"], r["w2"], r["c12"], round(r["pmi"], 9))
        for r in collocations(docs, min_count=2, top_k=5).collect()
    ]

    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in texts:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    exp = [
        (w1, w2, c12, round(math.log(c12 * n / (uni[w1] * uni[w2])), 9))
        for (w1, w2), c12 in big.items()
        if c12 >= 2
    ]
    exp.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    assert got == exp[:5]
    assert got[0][:2] == ("san", "francisco")  # tightest collocation wins


@given(
    st.lists(  # corpus: 3-7 docs over a tiny vocabulary
        st.lists(st.sampled_from("alpha beta gamma delta eps".split()),
                 min_size=1, max_size=10).map(" ".join),
        min_size=3, max_size=7,
    ),
    st.lists(  # 1-2 queries, 1-3 words, may repeat / miss the corpus
        st.lists(st.sampled_from("alpha beta gamma zeta".split()),
                 min_size=1, max_size=3).map(" ".join),
        min_size=1, max_size=2,
    ),
)
@settings(max_examples=6, deadline=None)
def test_bm25_random_corpora_property(spark, corpus, qtexts):
    """Randomized BM25 ≡ sequential reference: rankings, tie-breaks,
    zero-df query terms, repeated words, out-of-vocab queries."""
    import math

    from crypto_data_pipeline_with_kafka_spark.functions.text import bm25_topk

    k1, b, k = 1.2, 0.75, 3
    docs_df = spark.createDataFrame(
        list(enumerate(corpus)), ["doc_id", "text"]
    )
    q_df = spark.createDataFrame(list(enumerate(qtexts)), ["query_id", "query_text"])
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in bm25_topk(docs_df, q_df, k=k, k1=k1, b=b).collect()
    }

    toks = {d: t.split(" ") for d, t in enumerate(corpus)}
    n_docs = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    expected = {}
    for qid, qtext in enumerate(qtexts):
        scores = {}
        for term in dict.fromkeys(qtext.split(" ")):
            df_t = sum(1 for ws in toks.values() if term in ws)
            if df_t == 0:
                continue
            idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
            for d, ws in toks.items():
                tf = ws.count(term)
                if tf == 0:
                    continue
                c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
                scores[d] = scores.get(d, 0) + round(c * 1e6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, sc) in enumerate(ranked, 1):
            expected[(qid, rank)] = (d, sc)
    assert got == expected


@given(
    st.lists(
        st.lists(st.sampled_from(["ab", "abab", "ba", "aab", "b", "abc"]),
                 min_size=1, max_size=6).map(" ".join),
        min_size=2, max_size=5,
    )
)
@settings(max_examples=4, deadline=None)
def test_bpe_random_corpora_property(spark, corpus):
    """Randomized BPE learning ≡ sequential reference on adversarial
    repeated-symbol words (greedy non-overlap, tie-breaks, early stop)."""
    from crypto_data_pipeline_with_kafka_spark.functions.bpe import (
        END_OF_WORD,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = learn_bpe_merges(docs, n_merges=6, min_pair_freq=2)

    freqs: dict[str, int] = {}
    for t in corpus:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    words = {w: [*w, END_OF_WORD] for w in freqs}

    def merge_seq(sym, a, b):
        out = []
        for sch in sym:
            if out and out[-1] == a and sch == b:
                out[-1] = a + b
            else:
                out.append(sch)
        return out

    expected = []
    for _ in range(6):
        counts: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            for x, y in zip(sym, sym[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        a, b = best[0]
        expected.append((a, b))
        words = {w: merge_seq(sym, a, b) for w, sym in words.items()}
    assert got == expected


def test_bpe_batched_merges_match_sequential(spark):
    """merges_per_sync > 1 learns the SAME ordered rule list as exact
    sequential BPE on the fixture corpus, in measurably fewer driver
    syncs — the scale shape for 30k+-merge tokenizer training. The
    prefix-stop on interacting pairs keeps rule order sequential."""
    from crypto_data_pipeline_with_kafka_spark.functions.bpe import (
        learn_bpe_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "widest wide wider new low",
        "aaaa aa aaaa",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])

    seq_stats: dict = {}
    seq = learn_bpe_merges(
        docs, n_merges=12, min_pair_freq=2, stats=seq_stats
    )
    batched_stats: dict = {}
    batched = learn_bpe_merges(
        docs, n_merges=12, min_pair_freq=2, merges_per_sync=4,
        stats=batched_stats,
    )
    assert batched == seq and len(seq) > 3
    # the batching actually saved driver round-trips
    assert batched_stats["sync_rounds"] < seq_stats["sync_rounds"]


def test_gopher_rules_each_rule_discriminates(spark):
    """gopher_rules against constructed documents: one doc passes every
    rule, and five siblings each violate exactly one rule — so an
    inverted bound or wrong threshold in the conjunction cannot hide
    (the fixture corpus never produces a gopher_ok=true row, so the
    oracle leg alone attests values, not the verdict)."""
    from crypto_data_pipeline_with_kafka_spark.functions.text import gopher_rules

    good_words = ["the", "and"] + [f"word{i:02d}" for i in range(58)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(good_words)),                       # passes all
            (1, "the and " + " ".join(f"w{i}" for i in range(8))),  # too short
            (2, "the and " + " ".join("ab" for _ in range(58))),    # mean len < 3
            (3, " ".join(["the", "and"] + ["1234567"] * 58)),       # alpha frac
            (4, " ".join(["the", "and"] + [f"#tag{i:03d}" for i in range(58)])),  # symbols
            (5, " ".join(f"word{i:02d}" for i in range(60))),       # no stopwords
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in gopher_rules(docs).collect()}

    assert got[0]["gopher_ok"] is True
    for d in range(1, 6):
        assert got[d]["gopher_ok"] is False, (d, got[d])
    # each violator fails for its own reason
    assert got[1]["n_words"] < 50
    assert got[2]["mean_word_len"] < 3
    assert got[3]["frac_alpha_words"] < 0.8
    assert got[4]["symbol_word_ratio"] > 0.1
    assert got[5]["stop_hits"] == 0

    # value spot-check vs a direct computation for the good doc
    n = len(good_words)
    assert got[0]["n_words"] == n
    assert got[0]["mean_word_len"] == sum(map(len, good_words)) / n
    assert got[0]["frac_alpha_words"] == 1.0
    assert got[0]["symbol_word_ratio"] == 0.0
    assert got[0]["stop_hits"] == 2


def test_cdc_chunking_invariants_random_corpus(spark):
    """Content-defined chunking invariants over a seeded random corpus
    (lengths 1..300 tokens, incl. single-word, all-identical-token, and
    messy-whitespace docs), with dropping disabled so chunking itself
    is isolated: every doc reassembles LOSSLESSLY to its normalized
    text, every chunk is non-empty and at most cdc_max_words long,
    chunk counts are consistent, and a second run chunks identically
    (determinism)."""
    import random

    from crypto_data_pipeline_with_kafka_spark.operators.dedup import (
        chunk_level_dedup,
    )

    rng = random.Random(7)
    vocab = [f"cw{i}" for i in range(60)]
    rows = []
    for d in range(80):
        n = rng.randint(1, 300)
        words = [rng.choice(vocab) for _ in range(n)]
        rows.append((d, " ".join(words)))
    rows += [
        (1000, "solo"),                                # below the gram window
        (1001, "same " * 200),                         # degenerate: identical grams
        # runs of spaces round-trip as empty tokens (tokens() splits on
        # single spaces), so reassembly is faithful to the TRIMMED
        # original, not whitespace-collapsed
        (1002, "  messy   spacing \t here  " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    MAXW = 32

    def run():
        caches: list = []
        out = {
            r.doc_id: r
            for r in chunk_level_dedup(
                docs, min_docs=10**6, boundaries="content",
                cdc_max_words=MAXW, caches=caches,
            ).collect()
        }
        for c in caches:
            c.unpersist()
        return out

    got = run()
    assert set(got) == {d for d, _ in rows}
    for d, text in rows:
        norm = text.strip()  # tokens() = split(trim, " "): runs survive
        r = got[d]
        assert r.clean_text == norm, d                  # lossless reassembly
        assert r.n_kept == r.n_total
        # chunk boundaries aren't marked in clean_text, so bound-check
        # the count: at least ceil(n/MAXW) chunks, at most n
        nw = len(norm.split(" "))
        assert r.n_total >= -(-nw // MAXW) and r.n_total <= nw, d
    # determinism: identical chunk counts (and texts) across runs
    again = run()
    assert {d: (r.n_total, r.clean_text) for d, r in got.items()} == {
        d: (r.n_total, r.clean_text) for d, r in again.items()
    }


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0,
                max_value=4.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=16,
            max_size=16,
        ),
        min_size=8,
        max_size=24,
    ),
    st.integers(0, 3),
)
@settings(max_examples=5, deadline=None)
def test_sq8_exactness_contract_random_vectors(spark, vecs, flat_slot):
    """SQ8 serving contract fuzzed (r11): on arbitrary float32 vectors
    (negatives, wide dynamic range, a planted FLAT vector — everything
    except the guarded zero norm), (a) sq8_topk with covering refine
    is IDENTICAL to brute_force_topk in BOTH serve modes, and (b) the
    exact mode's persisted-codes serve ≡ its on-the-fly serve at a
    pruning refine. Complements the fixed adversarial fixture in
    test_dedup_similarity — hypothesis walks the codec's numeric
    boundary cases (components straddling mn/mx, near-flat ranges)."""
    from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
        brute_force_topk,
        sq8_encode,
        sq8_topk,
    )

    rows = []
    for i, v in enumerate(vecs):
        if all(abs(x) < 1e-3 for x in v):
            v = [x + 0.5 for x in v]  # keep norms inside the margin bound
        rows.append((i, v))
    rows[flat_slot] = (flat_slot, [0.625] * 16)  # flat: mx == mn
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n = len(rows)
    ref = sorted(map(tuple, brute_force_topk(
        emb, query_ids_max=4, k=3
    ).collect()))
    for mode in (False, True):
        cov = sorted(map(tuple, sq8_topk(
            emb, query_ids_max=4, k=3, refine=n, exact=mode
        ).collect()))
        assert cov == ref, mode
    codes = sq8_encode(emb).localCheckpoint()
    fly = sorted(map(tuple, sq8_topk(
        emb, query_ids_max=4, k=3, refine=4, exact=True
    ).collect()))
    store = sorted(map(tuple, sq8_topk(
        emb, codes=codes, query_ids_max=4, k=3, refine=4, exact=True
    ).collect()))
    assert store == fly
    # release this example's caches (the operators' caller-owns
    # contract): 5 examples × (2 internal persists + 1 checkpoint)
    # would otherwise outlive the test in the session-scoped Spark —
    # the same stray-state class the ngram census flake traced to
    codes.unpersist()
    spark.catalog.clearCache()


def test_quality_classifier_matches_python_reference(spark):
    """The hashed-feature NB quality classifier must (a) reproduce a
    sequential Python implementation of the same model — md5-bucketed
    unigram+bigram counts, decimal(28,9)-quantized log-odds, the
    w' = w − default reparameterization — to within the quantization
    grain per feature; (b) separate planted spam from clean text on
    held-out docs; (c) serve identically from a persisted weights
    relation; (d) score an empty doc at exactly prior + default·n for
    its n empty-string features; (e) refuse a single-class corpus."""
    import hashlib
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    import pytest

    from crypto_data_pipeline_with_kafka_spark.functions.quality_model import (
        score_with_quality_classifier,
        train_quality_classifier,
    )

    clean = [
        "the market closed higher after steady gains in early trading",
        "investors watched the report with cautious optimism today",
        "analysts said the quarterly results were broadly in line",
        "the committee voted to keep rates unchanged this month",
    ]
    spam = [
        "click here buy now cheap pills best price click here",
        "winner winner free prize claim now click the link now",
        "cheap cheap best deal buy now free shipping click here",
        "free money fast claim your prize now click click click",
    ]
    train_rows = [(i, t, 1) for i, t in enumerate(clean)] + [
        (10 + i, t, 0) for i, t in enumerate(spam)
    ]
    labeled = spark.createDataFrame(
        train_rows, "doc_id long, text string, label int"
    )
    B, ALPHA = 1 << 12, 1.0
    weights, meta = train_quality_classifier(
        labeled, num_buckets=B, alpha=ALPHA
    )

    score_rows = [
        (100, "the report said gains were steady this month"),  # clean-ish
        (101, "buy cheap pills click here free prize now"),  # spam-ish
        (102, ""),  # empty: one ''-token feature
    ]
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in score_with_quality_classifier(docs, (weights, meta)).collect()
    }

    # ---- sequential reference (same hashing, same quantization)
    def buckets(text):
        ws = text.strip().split(" ")
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        return [
            int(hashlib.md5(f"nbq|{t}".encode()).hexdigest()[:13], 16) % B
            for t in feats
        ]

    n1, n0 = Counter(), Counter()
    for _, text, y in train_rows:
        (n1 if y == 1 else n0).update(buckets(text))
    t1, t0 = sum(n1.values()), sum(n0.values())
    prior = math.log(4 / 4)
    default = math.log(t0 + ALPHA * B) - math.log(t1 + ALPHA * B)
    assert abs(meta["prior"] - prior) < 1e-12
    assert abs(meta["default_w"] - default) < 1e-12
    wq = {
        b: Decimal(
            math.log((n1[b] + ALPHA) / ALPHA) - math.log((n0[b] + ALPHA) / ALPHA)
        ).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        for b in set(n1) | set(n0)
    }
    for did, text in score_rows:
        bs = buckets(text)
        want = (
            prior
            + default * len(bs)
            + float(str(sum((wq.get(b, Decimal(0)) for b in bs), Decimal(0))))
        )
        r = got[did]
        assert r.n_feats == len(bs)
        # per-feature quantization grain + 1-ulp log() slack per term
        assert abs(r.quality_logit - want) <= (len(bs) + 2) * 1e-9, (
            did, r.quality_logit, want,
        )
        assert abs(r.quality_prob - 1 / (1 + math.exp(-r.quality_logit))) < 1e-12

    # (b) separation on held-out docs
    assert got[100].quality_logit > 0 > got[101].quality_logit
    assert got[100].quality_prob > 0.5 > got[101].quality_prob

    # (c) persisted weights serve identically
    stored = weights.localCheckpoint()
    via_store = {
        r.doc_id: r.quality_logit
        for r in score_with_quality_classifier(docs, (stored, meta)).collect()
    }
    assert all(via_store[d] == got[d].quality_logit for d in via_store)

    # (e) single-class corpus refuses
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier(
            labeled.filter("label = 1"), num_buckets=B
        )


def test_quality_classifier_weak_supervision_composition(spark):
    """The CCNet/FineWeb bootstrap shape: heuristic rules produce weak
    labels, the NB classifier generalizes them — trained on
    gopher_ok-labeled docs, it must rank held-out clean docs above
    held-out degenerate ones even though NONE of the held-out docs were
    seen in training."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.functions.quality_model import (
        score_with_quality_classifier,
        train_quality_classifier,
    )
    from crypto_data_pipeline_with_kafka_spark.functions.text import gopher_rules

    good_words = (
        "the market closed higher after steady gains and the outlook for "
        "next quarter was described by analysts as broadly stable with "
        "some risk from energy prices and a slower pace of hiring in the "
        "services sector while officials said they would watch the data"
    ).split()
    train_docs = []
    for i in range(8):
        # rotate the clean text so each doc differs but stays in-style
        rot = good_words[i * 5 :] + good_words[: i * 5]
        train_docs.append((i, " ".join(rot)))
    for i in range(8, 16):
        train_docs.append((i, f"### {'#' * (i % 3 + 1)} zz{i} " * 20))
    df = spark.createDataFrame(train_docs, "doc_id long, text string")
    labels = gopher_rules(df, min_words=20).select(
        "doc_id", F.col("gopher_ok").cast("int").alias("label")
    )
    lab = {r.doc_id: r.label for r in labels.collect()}
    assert all(lab[i] == 1 for i in range(8)) and all(
        lab[i] == 0 for i in range(8, 16)
    )
    model = train_quality_classifier(
        df.join(labels, "doc_id"), num_buckets=1 << 12
    )

    held = spark.createDataFrame(
        [
            (100, "officials said hiring was stable and the outlook higher"),
            (101, "### zz99 ### zz98 ### zz97 ### ###"),
        ],
        "doc_id long, text string",
    )
    s = {
        r.doc_id: r.quality_logit
        for r in score_with_quality_classifier(held, model).collect()
    }
    assert s[100] > s[101]


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0,
                max_value=4.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=16,
            max_size=16,
        ),
        min_size=8,
        max_size=24,
    ),
)
@settings(max_examples=5, deadline=None)
def test_bq1_serving_contract_random_vectors(spark, vecs):
    """BQ1 serving contract fuzzed (r11): on arbitrary float32 vectors
    (negatives, exact zeros in individual COMPONENTS — only all-zero
    vectors are guarded), (a) bq_topk with a covering refine is
    IDENTICAL to brute_force_topk, (b) serving from a persisted codes
    relation is identical to encoding on the fly at a pruning refine,
    and (c) the packed words match the sequential sign-bit reference
    on every row. Complements the fixed fixture in
    test_dedup_similarity — hypothesis walks sign boundaries
    (components exactly 0 pack as 0-bits, like negatives)."""
    from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
        bq_encode,
        bq_topk,
        brute_force_topk,
    )

    rows = []
    for i, v in enumerate(vecs):
        if all(abs(x) < 1e-3 for x in v):
            v = [x + 0.5 for x in v]  # keep norms inside the margin bound
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n = len(rows)

    enc = {r.vec_id: r for r in bq_encode(emb).collect()}
    import numpy as np

    for i, v in rows:
        v32 = [float(np.float32(x)) for x in v]
        want = 0
        for x in v32[:16]:
            want = want * 2 + (1 if x > 0 else 0)
        want <<= 16  # 16 dims in a 32-bit lane: low half is padding
        assert enc[i].words == [want], i

    ref = sorted(map(tuple, brute_force_topk(
        emb, query_ids_max=4, k=3
    ).collect()))
    cov = sorted(map(tuple, bq_topk(
        emb, query_ids_max=4, k=3, refine=n
    ).collect()))
    assert cov == ref

    codes = bq_encode(emb).localCheckpoint()
    fly = sorted(map(tuple, bq_topk(
        emb, query_ids_max=4, k=3, refine=4
    ).collect()))
    store = sorted(map(tuple, bq_topk(
        emb, codes=codes, query_ids_max=4, k=3, refine=4
    ).collect()))
    assert store == fly
    codes.unpersist()
    spark.catalog.clearCache()


def test_quality_classifier_null_text_scores_null(spark):
    """NULL text keeps its row with NULL logit/prob (the
    sentiment_scores_join convention) — without the guard, size(NULL)
    = -1 would silently contribute -1 features to the default_w term
    and emit a plausible-looking wrong score."""
    from crypto_data_pipeline_with_kafka_spark.functions.quality_model import (
        score_with_quality_classifier,
        train_quality_classifier,
    )

    labeled = spark.createDataFrame(
        [(0, "good clean text here", 1), (1, "bad spam junk now", 0)],
        "doc_id long, text string, label int",
    )
    model = train_quality_classifier(labeled, num_buckets=1 << 10)
    docs = spark.createDataFrame(
        [(10, "good clean text"), (11, None)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in score_with_quality_classifier(docs, model).collect()
    }
    assert set(got) == {10, 11}
    assert got[10].quality_logit is not None
    assert got[11].n_feats is None
    assert got[11].quality_logit is None and got[11].quality_prob is None


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0,
                max_value=4.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=16,
            max_size=16,
        ),
        min_size=8,
        max_size=24,
    ),
)
@settings(max_examples=5, deadline=None)
def test_mrl_serving_contract_random_vectors(spark, vecs):
    """MRL serving contract fuzzed (r11): on arbitrary float32 vectors
    — including rows whose leading PREFIX is all-zero (NULL prefix
    score, ranks last, recoverable) — mrl_topk with a covering refine
    is IDENTICAL to brute_force_topk at any truncating prefix."""
    from crypto_data_pipeline_with_kafka_spark.operators.similarity import (
        brute_force_topk,
        mrl_topk,
    )

    rows = []
    for i, v in enumerate(vecs):
        if all(abs(x) < 1e-3 for x in v):
            v = [x + 0.5 for x in v]  # keep norms inside the margin bound
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n = len(rows)
    ref = sorted(map(tuple, brute_force_topk(
        emb, query_ids_max=4, k=3
    ).collect()))
    for pd_ in (4, 8):
        cov = sorted(map(tuple, mrl_topk(
            emb, prefix_dims=pd_, query_ids_max=4, k=3, refine=n
        ).collect()))
        assert cov == ref, pd_
    spark.catalog.clearCache()


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # query
            st.integers(0, 30),         # doc
            st.integers(1, 40),         # rank
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 30), st.integers(1, 40)
        ),
        min_size=0,
        max_size=40,
    ),
)
@settings(max_examples=5, deadline=None)
def test_rrf_fusion_fuzzed_vs_reference(spark, rows_a, rows_b):
    """RRF fusion fuzzed (r12): over ARBITRARY rank relations — any
    query/doc/rank triples, overlapping or disjoint tiers, one tier
    possibly empty — the fused nano integers equal the sequential
    reference exactly, n_sources counts contributing rows, and the
    fused rank is the (nano DESC, doc ASC) total order."""
    from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
        rrf_fuse,
    )

    # de-dup (query, doc) within a tier: the documented contract
    # (tiers emit row_number rankings, which cannot repeat a pair)
    def dedup(rows):
        seen, out = set(), []
        for q, d, r in rows:
            if (q, d) not in seen:
                seen.add((q, d))
                out.append((q, d, r))
        return out

    rows_a, rows_b = dedup(rows_a), dedup(rows_b)
    rankings = [("a", rows_a)] + ([("b", rows_b)] if rows_b else [])
    dfs = [
        (
            tag,
            spark.createDataFrame(
                rows, "query_id long, doc_id long, rank int"
            ),
        )
        for tag, rows in rankings
    ]
    got = {
        (r.query_id, r.doc_id): (r.n_sources, r.rrf_nano, r.rank)
        for r in rrf_fuse(dfs).collect()
    }
    ref: dict = {}
    for _, rows in rankings:
        for q, d, r in rows:
            n, s = ref.get((q, d), (0, 0))
            ref[(q, d)] = (n + 1, s + round(1e9 / (60 + r)))
    assert {k: v[:2] for k, v in got.items()} == ref
    by_q: dict = {}
    for (q, d), (_, nano, rank) in got.items():
        by_q.setdefault(q, []).append((nano, d, rank))
    for q, items in by_q.items():
        want_order = sorted(items, key=lambda t: (-t[0], t[1]))
        for pos, (_, _, rank) in enumerate(want_order, 1):
            assert rank == pos, (q, items)
    spark.catalog.clearCache()


@given(
    st.lists(
        st.floats(
            min_value=0.001, max_value=1000.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 10),
)
@settings(max_examples=5, deadline=None)
def test_weighted_sample_fuzzed_vs_reference(spark, weights, n):
    """weighted_sample_exact fuzzed (r12): for ARBITRARY positive
    weights the selected set equals the sequential reference computing
    the identical quantized ln(u)/w keys (rows keyed by index), and
    the draw is deterministic across plans."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from crypto_data_pipeline_with_kafka_spark.operators.sampling import (
        weighted_sample_exact,
    )

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def ref_key(i, w):
        h = hashlib.md5(f"wsample-v1|{i}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / float(16**13)
        return Decimal(repr(math.log(u) / w)).quantize(
            Decimal("1e-9"), ROUND_HALF_UP
        )

    want = {
        i
        for i, w in sorted(rows, key=lambda r: (-ref_key(r[0], r[1]), r[0]))[
            :n
        ]
    }
    got = {r.doc_id for r in weighted_sample_exact(df, n, "w").collect()}
    assert got == want
    spark.catalog.clearCache()


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),           # query
            st.integers(0, 15),          # doc
            st.integers(1, 12),          # served rank
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 2), st.integers(0, 15), st.integers(1, 4)
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 8),
)
@settings(max_examples=5, deadline=None)
def test_ndcg_fuzzed_vs_reference(spark, got_rows, truth_rows, k):
    """ndcg_at_k fuzzed (r12): over arbitrary served/truth relations
    with GRADED integer relevance, the micro-integer DCG and IDCG
    match a sequential reference (identical log2 micro discounts,
    ideal ordering by grade desc / id asc, positions truncated at k),
    truth queries never served score 0.0, and served-only queries are
    absent."""
    import math

    from crypto_data_pipeline_with_kafka_spark.operators.fusion import (
        ndcg_at_k,
    )

    def dedup(rows):
        seen, out = set(), []
        for q, d, x in rows:
            if (q, d) not in seen:
                seen.add((q, d))
                out.append((q, d, x))
        return out

    got_rows, truth_rows = dedup(got_rows), dedup(truth_rows)
    got = spark.createDataFrame(
        got_rows, "query_id long, doc_id long, rank int"
    )
    truth = spark.createDataFrame(
        truth_rows, "query_id long, doc_id long, rel int"
    )
    out = {
        r.query_id: (r.dcg_micro, r.idcg_micro)
        for r in ndcg_at_k(got, truth, k, grade_col="rel").collect()
    }

    disc = lambda i: round(1e6 / math.log2(i + 1))  # noqa: E731
    grades = {(q, d): rel for q, d, rel in truth_rows}
    ref_dcg: dict = {}
    for q, d, pos in got_rows:
        if pos <= k:
            ref_dcg[q] = ref_dcg.get(q, 0) + grades.get((q, d), 0) * disc(pos)
    ref_idcg: dict = {}
    by_q: dict = {}
    for q, d, rel in truth_rows:
        by_q.setdefault(q, []).append((rel, d))
    for q, items in by_q.items():
        ideal = sorted(items, key=lambda t: (-t[0], t[1]))[:k]
        ref_idcg[q] = sum(rel * disc(i) for i, (rel, _) in enumerate(ideal, 1))

    assert set(out) == set(ref_idcg)
    for q in out:
        assert out[q] == (ref_dcg.get(q, 0), ref_idcg[q]), q
    spark.catalog.clearCache()


@given(
    st.lists(
        st.one_of(
            # URL-shaped: random pieces around a plausible skeleton
            st.builds(
                lambda sch, host, port, path, q, frag: (
                    f"{sch}://{host}{port}{path}{q}{frag}"
                ),
                st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
                st.from_regex(
                    r"[A-Za-z0-9.\-]{1,20}", fullmatch=True
                ),
                st.sampled_from(["", ":80", ":443", ":8080"]),
                st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,3}/?",
                              fullmatch=True),
                st.from_regex(
                    r"(\?[A-Za-z0-9_]{1,8}(=[A-Za-z0-9%]{0,6})?"
                    r"(&[A-Za-z0-9_]{1,8}(=[A-Za-z0-9%]{0,6})?){0,3})?",
                    fullmatch=True,
                ),
                st.sampled_from(["", "#f", "#frag/x?y"]),
            ),
            # adversarial: arbitrary printable junk
            st.text(
                alphabet=st.characters(
                    min_codepoint=32, max_codepoint=126
                ),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_canonicalize_url_robustness_properties(spark, urls):
    """canonicalize_url over arbitrary URL-shaped and junk strings
    (the curation url stage sees USER urls, not planted fixtures):
    never crashes, output is NULL or starts with 'scheme://' in
    lowercase with no fragment, and the map is IDEMPOTENT —
    canon(canon(u)) == canon(u) for every input."""
    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.functions.urls import (
        canonicalize_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        canonicalize_url("url").alias("c"),
    ).select(
        "url", "c", canonicalize_url(F.col("c")).alias("c2")
    ).collect()
    import re as _re

    for r in out:
        assert r.c2 == r.c, (r.url, r.c, r.c2)  # idempotent
        if r.c is not None:
            assert _re.match(r"^[a-z][a-z0-9+.\-]*://", r.c), (r.url, r.c)
            assert "#" not in r.c.split("://", 1)[0]
            # fragment dropped entirely unless it was inside the query
            # BEFORE any '#': parse_url REF semantics strip from the
            # first '#', so canonical output never carries one
            assert "#" not in r.c, (r.url, r.c)
    spark.catalog.clearCache()
