"""Semantic tests for the training-corpus packing / census / grid-dedup
operators (corpus.pack_sequences, corpus.token_census,
similarity.embedding_grid_groups)."""

import pytest
from pyspark.sql import functions as F

from stglib_spark.operators import corpus, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e"),          # 5 tokens
        (2, "one two three"),      # 3 tokens
        (3, ""),                   # 0 tokens -> dropped
        (4, "w " * 600),           # 600 tokens -> straddles packs
        (5, "x y"),                # 2 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_spans_are_contiguous_and_disjoint(spark, docs):
    out = corpus.pack_sequences(docs, seq_len=512, n_shards=2).collect()
    assert all(r.doc_id != 3 for r in out)  # zero-token doc dropped
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rows:
            # spans tile the shard's token stream exactly
            assert r.start_offset == offset
            offset += r.n_tokens
            # pack ids match the offsets
            assert r.start_pack == r.start_offset // 512
            assert r.end_pack == (r.start_offset + r.n_tokens - 1) // 512


def test_pack_straddles_boundary(spark, docs):
    out = {
        r.doc_id: r
        for r in corpus.pack_sequences(docs, seq_len=512, n_shards=1).collect()
    }
    # 600-token doc 4 must span at least two packs somewhere in the stream
    r = out[4]
    assert r.n_tokens == 600
    assert r.end_pack > r.start_pack


def test_pack_deterministic_across_runs(spark, docs):
    a = sorted(map(tuple, corpus.pack_sequences(docs).collect()))
    b = sorted(map(tuple, corpus.pack_sequences(docs).collect()))
    assert a == b


def test_token_census_shares_sum_to_one(spark, docs):
    out = corpus.token_census(docs).collect()
    total_share = sum(r.token_share for r in out)
    assert abs(total_share - 1.0) < 1e-4
    assert sum(r.n_docs for r in out) == 5
    assert sum(r.n_tokens for r in out) == 610


def test_embedding_grid_groups_cell_membership(spark):
    rows = [
        (1, [0.05, 0.05]),   # cell (0,0)
        (2, [0.09, 0.01]),   # cell (0,0) -> groups with 1
        (3, [0.15, 0.05]),   # cell (1,0) -> alone
        (4, [-0.01, 0.0]),   # cell (-1,0) -> alone
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.embedding_grid_groups(df, cell=0.1, dims=2).collect()
    assert len(out) == 1
    assert out[0].n_members == 2 and out[0].rep_id == 1
    assert out[0].grid_code == "0,0"


def test_budget_sample_respects_budget_and_determinism(spark, docs):
    out = corpus.budget_sample(docs, token_budget=8, n_shards=2).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        assert sum(r.n_tokens for r in rs) <= 4  # 8 // 2 per shard
        # cum_tokens is the running total in priority order
        assert max(r.cum_tokens for r in rs) <= 4
    again = corpus.budget_sample(docs, token_budget=8, n_shards=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_unigram_logprob_orders_common_above_rare(spark):
    from stglib_spark.operators import text as text_ops

    rows = [
        (1, "the the the the"),        # all top-vocab tokens
        (2, "zzqx wvut zzqx qqq"),     # all OOV -> -20 each
        (3, ""),                       # empty -> 0.0, n_tokens 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = text_ops.unigram_vocab(df, top_k=1)  # just "the"; doc 2 all OOV
    out = {r.doc_id: r for r in text_ops.unigram_logprob_score(df, vocab).collect()}
    assert out[1].mean_logprob > out[2].mean_logprob
    assert out[2].mean_logprob == -20.0
    assert out[3].n_tokens == 0 and out[3].mean_logprob == 0.0


def test_chunk_documents_windows(spark):
    from stglib_spark.operators import text as text_ops

    rows = [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # empty doc: no chunks
    # doc 1: 10 tokens, stride 3 -> windows at 0,3,6 (a 4th window at 9
    # would be a pure duplicate of window 2's tail — not emitted)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert c1[2].chunk_text == "t6 t7 t8 t9" and c1[2].n_chunk_tokens == 4
    # every token is covered despite dropping the redundant window
    covered = {t for r in c1 for t in r.chunk_text.split()}
    assert covered == {f"t{i}" for i in range(10)}
    # doc 2: fits one window
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b"
    with __import__("pytest").raises(ValueError):
        text_ops.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_prioritized_dedup_keeps_best_source(spark):
    from pyspark.sql import functions as F

    from stglib_spark.operators import dedup as dedup_ops

    rows = [
        (1, "Same Content!", 5),
        (2, "same content", 1),   # better priority, higher id than 1? no: id 2 > 1, prio 1 < 5 -> wins
        (3, "same content.", 1),  # ties prio with 2 -> lower id 2 wins
        (4, "unique", 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, prio long")
    out = {r.doc_id: r for r in dedup_ops.prioritized_exact_dedup(
        df, priority=F.col("prio")).collect()}
    assert set(out) == {2, 4}
    assert out[2].dup_count == 3 and out[2].kept_priority == 1
    assert out[4].dup_count == 1 and out[4].kept_priority == 9


def test_boilerplate_removal_strips_frequent_lines(spark):
    from stglib_spark.operators import corpus

    rows = [
        (i, f"BANNER\nunique content {i}\nfooter") for i in range(1, 12)
    ] + [(99, "BANNER\nfooter")]  # all-boilerplate doc -> dropped
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bp = corpus.frequent_lines(df, min_docs=10)
    assert {r.line for r in bp.collect()} == {"BANNER", "footer"}
    out = {r.doc_id: r for r in corpus.remove_boilerplate_lines(df, bp).collect()}
    assert 99 not in out          # nothing left to keep
    assert len(out) == 11
    assert out[3].text_clean == "unique content 3"
    assert out[3].n_lines_kept == 1


def test_boilerplate_removal_preserves_verbatim_content(spark):
    """Kept lines are untouched: indentation, interior blank lines, and
    the trimmed-form-only matching (an indented copy of a boilerplate
    line is still removed; content is reassembled verbatim)."""
    from stglib_spark.operators import corpus

    rows = [
        (i, f"BANNER\ncontent {i}") for i in range(1, 11)
    ] + [(50, "  BANNER  \ndef f():\n    return 1\n\nnext paragraph")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bp = corpus.frequent_lines(df, min_docs=10)
    assert {r.line for r in bp.collect()} == {"BANNER"}
    out = {r.doc_id: r for r in corpus.remove_boilerplate_lines(df, bp).collect()}
    # the indented BANNER copy matched via its trimmed key; everything
    # else — indentation and the blank line — survives byte-for-byte
    assert out[50].text_clean == "def f():\n    return 1\n\nnext paragraph"
    assert out[50].n_lines_kept == 3  # blank line kept but not counted


def test_build_packed_sequences_exact_tiling(spark, docs):
    out = corpus.build_packed_sequences(docs, seq_len=7, n_shards=2).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    total = 0
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.pack_id)
        # consecutive pack ids from 0; every pack full except the last
        assert [r.pack_id for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r.n_tokens == 7
        assert 1 <= rs[-1].n_tokens <= 7
        for r in rs:
            assert len(r.pack_text.split()) == r.n_tokens
        total += sum(r.n_tokens for r in rs)
    assert total == 610  # every non-empty doc token lands in exactly one pack


def test_remove_duplicate_spans_canonical_survives(spark):
    """Duplicate-span removal keeps the minimum-doc occurrence intact,
    excises the covered tokens elsewhere (partial overlap leaves the
    unshared tokens), removes an exact-duplicate doc entirely, and
    leaves unique docs untouched."""
    from stglib_spark.operators.corpus import remove_duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x a b c d e y"),   # shares span "a b c d e" with doc 1
            (3, "p q r s t"),       # unique
            (4, "a b c d e f"),     # exact duplicate of doc 1
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_spans(df, ngram=5, min_docs=2).collect()
    }
    assert got == {
        1: (6, 0, "a b c d e f"),
        2: (7, 5, "x y"),
        3: (5, 0, "p q r s t"),
        4: (6, 6, ""),
    }


def test_remove_duplicate_spans_short_docs_passthrough(spark):
    """Docs shorter than the span length have no n-grams and pass
    through verbatim, including the single-token edge case."""
    from stglib_spark.operators.corpus import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "z")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_spans(df, ngram=5, min_docs=2).collect()
    }
    assert got == {1: (2, 0, "one two"), 2: (2, 0, "one two"), 3: (1, 0, "z")}


def test_remove_duplicate_spans_matches_python_gold_model(spark):
    """Randomized (seeded) small-vocabulary corpus — high collision rate
    by construction — compared against an exact Python replay of the
    semantics: a token is removed iff some ngram-window covering it
    occurs in >= min_docs distinct documents and this document is not
    that window's minimum-doc_id canonical. (Note: an overlapping span
    with an EARLIER canonical can excise tokens inside another span's
    canonical occurrence — the gold model captures that interaction.)"""
    import random
    from collections import defaultdict

    from stglib_spark.operators.corpus import remove_duplicate_spans

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    N = 3
    where = defaultdict(set)
    for did, t in docs:
        toks = t.split(" ")
        for i in range(len(toks) - N + 1):
            where[" ".join(toks[i : i + N])].add(did)
    gold = {}
    for did, t in docs:
        toks = t.split(" ")
        masked = set()
        for i in range(len(toks) - N + 1):
            g = " ".join(toks[i : i + N])
            if len(where[g]) >= 2 and min(where[g]) != did:
                masked.update(range(i, i + N))
        kept = [tok for i, tok in enumerate(toks) if i not in masked]
        gold[did] = (len(toks), len(masked), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_spans(df, ngram=N, min_docs=2).collect()
    }
    assert got == gold


def test_bigram_logprob_hand_computed(spark):
    """Bigram LM on a controlled corpus, all three scoring branches
    hand-checked: seen bigram (smoothed count), unseen bigram with
    in-vocab w1 (backoff), and OOV w1 (fixed penalty via vocab cap)."""
    import math

    from stglib_spark.operators.text import bigram_logprob_score, bigram_model

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c a")],
        "doc_id long, text string",
    )
    # top-2 vocab: a(4), b(3) — c(2) is cut => OOV
    vocab, bigrams = bigram_model(df, top_k_vocab=2, top_k_bigrams=10)
    assert vocab == [("a", 4), ("b", 3)]
    got = {
        r["doc_id"]: (r["n_pairs"], r["mean_logprob"])
        for r in bigram_logprob_score(df, vocab, bigrams).collect()
    }
    V = 2.0
    # pair counts: (a,b)=3, (b,a)=1, (b,c)=1, (c,a)=1
    ab = math.log((3 + 1) / (4 + V))
    ba = math.log((1 + 1) / (3 + V))
    bc = math.log((1 + 1) / (3 + V))
    d1 = round((ab + ba + ab) / 3, 6)
    d2 = round((ab + bc) / 2, 6)
    d3 = round(-20.0 / 1, 6)  # w1 = c is OOV
    assert got == {1: (3, d1), 2: (2, d2), 3: (1, d3)}


def test_html_to_text_known_page(spark):
    """Script subtree (including a '<' inside code), comment, tags, and
    double-encoded entities: &amp;lt; decodes one level to &lt;, never
    two; &nbsp; becomes a plain space; whitespace collapses."""
    from pyspark.sql import functions as F

    from stglib_spark.operators.text import html_to_text

    page = (
        "<html><head><script>if (a<b) {}</script></head><body>"
        '<p>Hello &amp;lt;world&amp;gt; &quot;x&quot;&nbsp;y</p>'
        "<!-- c --></body></html>"
    )
    df = spark.createDataFrame([(1, page)], "id long, h string")
    got = df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"]
    assert got == 'Hello &lt;world&gt; "x" y'


def test_excise_char_spans_edges(spark):
    """Char-range excision edge cases: overlapping ranges merge,
    adjacent ranges merge, a range covering the whole document empties
    it, docs with no ranges pass through byte-identical, and the
    rebuild is exact (compare against a straightforward per-char
    reference)."""
    from stglib_spark.operators.corpus import excise_char_spans

    docs = [
        (1, "abcdefghij"),          # two overlapping ranges
        (2, "0123456789"),          # adjacent ranges -> one cut
        (3, "wipe me out"),         # full-doc range
        (4, "untouched text"),      # no spans at all
        (5, "edge at the very end"),
    ]
    spans = [
        (1, 2, 5), (1, 4, 7),       # merge to [2,7] -> keep "a" + "hij"
        (2, 3, 4), (2, 5, 6),       # adjacent -> [3,6] -> "01" + "789" + "2"? no: keep 1-2 and 7-10
        (3, 1, 11),                 # whole doc
        (5, 17, 20),                # tail cut
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sp = spark.createDataFrame(spans, "doc_id long, start int, end int")
    got = {
        r.doc_id: (r.n_chars, r.n_removed, r.cleaned_text)
        for r in excise_char_spans(df, sp).collect()
    }

    def ref(text, ranges):
        drop = set()
        for s, e in ranges:
            drop.update(range(s, e + 1))
        return "".join(c for i, c in enumerate(text, 1) if i not in drop)

    by_doc: dict = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    for d, text in docs:
        want = ref(text, by_doc.get(d, []))
        n_chars, n_removed, cleaned = got[d]
        assert n_chars == len(text), d
        assert cleaned == want, (d, cleaned, want)
        assert n_removed == len(text) - len(want), d
    assert got[3][2] == ""              # emptied
    assert got[4] == (14, 0, "untouched text")


def test_dsir_logratio_ranks_target_like_docs(spark):
    """DSIR importance weights must rank a raw document written in the
    target domain's vocabulary above raw documents that are not — the
    Xie et al. 2023 selection property — and both-OOV tokens must
    contribute exactly zero (a doc of tokens unknown to both LMs
    scores 0)."""
    from stglib_spark.operators.text import (
        dsir_logratio_score,
        unigram_vocab,
    )

    target = "waves tide buoy swell pressure sensor ocean current salinity"
    market = "stock bond yield equity dividend portfolio hedge margin call"
    rows = [
        # target-domain slice (builds the target LM)
        *[(i, target) for i in range(4)],
        # raw pool: one target-like doc, several market docs
        (10, "ocean swell pressure waves tide"),
        (11, market),
        (12, market),
        (13, "zzz qqq xxx"),  # OOV of both LMs (excluded from rv below)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tv = unigram_vocab(df.filter("doc_id < 10"), top_k=50)
    rv = unigram_vocab(df.filter("doc_id BETWEEN 10 AND 12"), top_k=50)
    got = {
        r.doc_id: r.log_ratio
        for r in dsir_logratio_score(df, tv, rv).collect()
    }
    assert got[10] > got[11] == got[12], got
    assert got[13] == 0.0, got  # both-OOV tokens cancel to zero
