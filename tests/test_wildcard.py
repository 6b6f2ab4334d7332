"""Wildcard term-match queries (`te*m`, `ind?x`, `*fix`) — the Lucene
WildcardQuery / pg_trgm-accelerated LIKE surface, generalizing the
autocomplete prefix expansion beyond `lit*`.

Contract: every `[a-z0-9*?]+` query token is a pattern; each expands to
the first 64 matching vocabulary terms term-ASC; a doc must match EVERY
pattern; score = distinct-union-term BM25 (the shared prefix evaluator);
identical answers on the index path, the DataFrame path, the sharded
fan-out (global expansion + stats), and the live merged view
(alive-filtered expansion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.analysis import (
    parse_wildcard_query,
    wildcard_literal_prefix,
    wildcard_regex,
    wildcard_to_like,
)
from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.docids import assign_doc_ids
from discogsography_spark.query.engine import LocalSearcher


def test_parse_and_translate():
    assert parse_wildcard_query("Spa*k IND?X spa*k") == ["ind?x", "spa*k"]
    assert wildcard_to_like("spa*k?") == "spa%k_"
    assert wildcard_literal_prefix("spa*k") == "spa"
    assert wildcard_literal_prefix("*fix") == ""
    assert wildcard_literal_prefix("plain") == "plain"
    rx = wildcard_regex("t?b*")
    assert rx.fullmatch("table") and rx.fullmatch("tab")
    assert not rx.fullmatch("tb") and not rx.fullmatch("atab")
    with pytest.raises(ValueError):
        parse_wildcard_query("spark **")


@pytest.fixture(scope="module")
def wild_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("wild")
    tdf = make_transcripts(n_conversations=220, mean_turns=6, vocab_size=500)
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    IndexBuilder(
        idx, num_segments=4, head_df_threshold=100, with_positions=True
    ).build(spark.read.parquet(p))
    docs = assign_doc_ids(spark.read.parquet(p)).select("doc_id", "text")
    return {"idx": idx, "docs": docs, "tdf": tdf, "dir": str(d)}


PATTERNS = ["sp*k", "t?e", "*ndex", "in*", "spark", "me*e *rge"]


def test_index_matches_dataframe(wild_setup):
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_wildcard_topk_dataframe,
    )

    s = LocalSearcher(wild_setup["idx"])
    checked = 0
    for q in PATTERNS + ["sp*k t?e", "zz*qq"]:
        got = s.topk_wildcard(q, 12)
        want = [
            (r["doc_id"], r["score"])
            for r in bm25_wildcard_topk_dataframe(
                wild_setup["docs"], q, k=12
            ).collect()
        ]
        assert got == want, q
        checked += len(got)
    assert checked > 20


def test_prefix_pattern_equals_topk_prefix(wild_setup):
    s = LocalSearcher(wild_setup["idx"])
    # `lit*` is exactly the prefix surface
    assert s.topk_wildcard("sp* in*", 10) == s.topk_prefix("sp in", 10)
    # exact pattern (no wildcard) expands to just itself
    assert s.expand_wildcard("spark") in ([], ["spark"])


def test_expansion_cap_is_term_asc(wild_setup):
    s = LocalSearcher(wild_setup["idx"])
    exp_all = s.expand_wildcard("*e", max_expansions=10**9)
    exp_cap = s.expand_wildcard("*e", max_expansions=5)
    assert exp_cap == sorted(exp_all)[:5]
    assert all(t.endswith("e") for t in exp_all)


def test_sharded_matches_single(spark, wild_setup, tmp_path):
    from discogsography_spark.query.sharded import ShardedSearcher

    tdf = wild_setup["tdf"]
    convs = sorted(tdf["conv_id"].unique())
    mid = convs[len(convs) // 2]
    dirs = []
    for i, part in enumerate(
        [tdf[tdf["conv_id"] < mid], tdf[tdf["conv_id"] >= mid]]
    ):
        p = str(tmp_path / f"part{i}.parquet")
        part.reset_index(drop=True).to_parquet(p, index=False)
        idx = str(tmp_path / f"shard{i}")
        IndexBuilder(idx, num_segments=4, head_df_threshold=100).build(
            spark.read.parquet(p)
        )
        dirs.append(idx)
    sh = ShardedSearcher(dirs, parallel=False)
    s = LocalSearcher(wild_setup["idx"])
    try:
        for q in PATTERNS + ["sp*k t?e"]:
            assert sh.topk_wildcard(q, 12) == s.topk_wildcard(q, 12), q
    finally:
        sh.close()


def test_merged_live_view_matches_alive_rebuild(spark, tmp_path):
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        MergedSearcher,
    )

    tdf = make_transcripts(n_conversations=120, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:90])].reset_index(drop=True)
    extra = tdf[tdf["conv_id"].isin(convs[90:])].reset_index(drop=True)
    bp = str(tmp_path / "base.parquet")
    base.to_parquet(bp, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=4, head_df_threshold=100).build(
        spark.read.parquet(bp)
    )
    w = DeltaIndexWriter(idx)
    ep = str(tmp_path / "extra.parquet")
    extra.to_parquet(ep, index=False)
    w.write_batch(spark.read.parquet(ep), 0)
    dead = convs[:5]
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": dead})), 1
    )

    alive = tdf[~tdf["conv_id"].isin(dead)].reset_index(drop=True)
    ap = str(tmp_path / "alive.parquet")
    alive.to_parquet(ap, index=False)
    ref_idx = str(tmp_path / "ref")
    IndexBuilder(ref_idx, num_segments=4, head_df_threshold=100).build(
        spark.read.parquet(ap)
    )

    def keyed(res, index_dir):
        import os

        from discogsography_spark.streaming.incremental import list_deltas

        parts = [os.path.join(index_dir, "docs")]
        for dd in list_deltas(index_dir):
            p = os.path.join(dd, "docs")
            if os.path.isdir(p):
                parts.append(p)
        dm = pd.concat(
            [pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"])
             for p in parts],
            ignore_index=True,
        )
        m = dict(zip(dm["doc_id"], zip(dm["conv_id"], dm["turn_idx"])))
        return [(m[d], round(s, 5)) for d, s in res]

    ms = MergedSearcher(idx)
    ref = LocalSearcher(ref_idx)
    for q in PATTERNS + ["sp*k t?e"]:
        got = keyed(ms.topk_wildcard(q, 15), idx)
        want = keyed(ref.topk_wildcard(q, 15), ref_idx)
        assert got == want, q
    # alive-filtered expansion: dead-only vocabulary must not occupy slots
    for pat in ["sp*k", "*e"]:
        assert ms.expand_wildcard(pat, 8) == ref.expand_wildcard(pat, 8), pat


BOOL_WILD = [
    "sp*k AND NOT t?e",
    '"spark index" OR *rge',
    "sp*k AND (in* OR me*e)",
    "ind?x",
    "t*e <2> t*e OR spark",  # parser must reject wild proximity operands
]


def test_bool_wild_nodes_all_paths(spark, wild_setup, tmp_path):
    from discogsography_spark.query.boolquery import BoolQueryError
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_bool_topk_dataframe,
    )
    from discogsography_spark.query.sharded import ShardedSearcher

    s = LocalSearcher(wild_setup["idx"])
    tdf = wild_setup["tdf"]
    convs = sorted(tdf["conv_id"].unique())
    mid = convs[len(convs) // 2]
    dirs = []
    for i, part in enumerate(
        [tdf[tdf["conv_id"] < mid], tdf[tdf["conv_id"] >= mid]]
    ):
        p = str(tmp_path / f"bp{i}.parquet")
        part.reset_index(drop=True).to_parquet(p, index=False)
        idx = str(tmp_path / f"bshard{i}")
        IndexBuilder(
            idx, num_segments=4, head_df_threshold=100, with_positions=True
        ).build(spark.read.parquet(p))
        dirs.append(idx)
    sh = ShardedSearcher(dirs, parallel=False)
    try:
        for q in BOOL_WILD[:4]:
            got = s.topk_bool(q, 15)
            want = [
                (r["doc_id"], round(r["score"], 5))
                for r in bm25_bool_topk_dataframe(
                    wild_setup["docs"], q, k=15
                ).collect()
            ]
            assert [(d, round(x, 5)) for d, x in got] == want, q
            assert sh.topk_bool(q, 15) == got, q
        with pytest.raises(BoolQueryError):
            s.topk_bool(BOOL_WILD[4], 5)
        with pytest.raises(BoolQueryError):
            s.topk_bool("** AND spark", 5)
    finally:
        sh.close()


def test_bool_wild_fuzzy_leaves_patterns_alone(wild_setup):
    # wild nodes are exact-expansion requests: the did-you-mean rewrite
    # must not touch them even when no vocabulary term matches
    s = LocalSearcher(wild_setup["idx"])
    res, rewrites = s.topk_fuzzy("zzq*x AND spark", 5, mode="bool")
    assert res == []
    assert "zzq*x" not in rewrites


def test_wildcard_regex_matches_fnmatch_property():
    """Property: wildcard_regex's match set over any [a-z0-9] vocabulary
    equals fnmatch's (the * / ? rule is the public fnmatch contract
    restricted to the analyzer alphabet)."""
    import fnmatch

    from hypothesis import given, settings
    from hypothesis import strategies as st

    alpha = "abc01"
    word = st.text(alphabet=alpha, min_size=0, max_size=6)
    pat = st.text(alphabet=alpha + "*?", min_size=1, max_size=6).filter(
        lambda p: any(c not in "*?" for c in p)
    )

    @settings(max_examples=200, deadline=None)
    @given(pat, st.lists(word, min_size=0, max_size=30))
    def check(p, vocab):
        rx = wildcard_regex(p)
        got = sorted({w for w in vocab if rx.fullmatch(w)})
        want = sorted(set(fnmatch.filter(vocab, p)))
        assert got == want, (p, vocab)

    check()


def test_rounded_and_topk_tie_boundaries():
    """The singleton-expansion delegation must reproduce round-then-rank
    exactly: docs whose raw scores differ only below 5dp tie and resolve
    doc-ASC, including docs the raw ranking puts beyond k."""
    from discogsography_spark.query.engine import _rounded_and_topk

    # raw ranking: doc 9 (highest raw) .. then a 5dp-tie plateau where
    # LOWER doc ids carry (barely) lower raw scores — raw rank order is
    # the reverse of the rounded contract's doc-ASC order
    raws = [(9, 0.500004), (8, 0.500003), (7, 0.500002), (3, 0.500001),
            (1, 0.5000005), (2, 0.4)]

    def fake_and(terms, k, idfs=None, avgdl=None):
        return raws[:k]

    got = _rounded_and_topk(fake_and, ["t"], 3, None, None)
    assert got == [(1, 0.5), (3, 0.5), (7, 0.5)]
    got = _rounded_and_topk(fake_and, ["t"], 5, None, None)
    assert got == [(1, 0.5), (3, 0.5), (7, 0.5), (8, 0.5), (9, 0.5)]
    got = _rounded_and_topk(fake_and, ["t"], 6, None, None)
    assert got == [(1, 0.5), (3, 0.5), (7, 0.5), (8, 0.5), (9, 0.5), (2, 0.4)]
    # plateau larger than the oversampling bound → None (general path)
    big = [(i, 0.5 + 1e-9 * (10_000 - i)) for i in range(10_000)]

    def fake_big(terms, k, idfs=None, avgdl=None):
        return big[:k]

    assert _rounded_and_topk(fake_big, ["t"], 4, None, None) is None


def test_like_trigrams_and_probe():
    from discogsography_spark.query.fuzzy import (
        TrigramVocabIndex,
        like_trigrams,
    )

    assert like_trigrams("*tion") == {"tio", "ion", "on "}
    assert like_trigrams("ab?cd*") == {"  a", " ab"}
    assert like_trigrams("*ab*") == set()          # no 3-window
    assert like_trigrams("qu*") == {"  q", " qu"}  # anchored start
    vocab = ["action", "motion", "quark", "quabc", "nation", "ab", "onion"]
    tgx = TrigramVocabIndex(vocab)
    got = sorted(tgx.terms[i] for i in tgx.probe_all(like_trigrams("*tion")))
    assert got == ["action", "motion", "nation"]
    assert tgx.probe_all({"zzz"}).size == 0


def test_leading_wildcard_probe_equals_scan_property():
    """pg_trgm-probe candidates, regex-verified, must equal the brute
    dictionary scan for any leading-wildcard pattern with a probeable
    literal run — random vocab, random patterns."""
    import fnmatch

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from discogsography_spark.query.fuzzy import (
        TrigramVocabIndex,
        like_trigrams,
    )

    alpha = "abco1"
    word = st.text(alphabet=alpha, min_size=1, max_size=8)
    run = st.text(alphabet=alpha, min_size=3, max_size=5)

    @settings(max_examples=120, deadline=None)
    @given(run, st.lists(word, min_size=0, max_size=40), st.booleans())
    def check(r, vocab, trailing):
        pattern = "*" + r + ("*" if trailing else "")
        tgx = TrigramVocabIndex(vocab)
        rx = wildcard_regex(pattern)
        req = like_trigrams(pattern)
        assert req
        got = sorted(
            {tgx.terms[i] for i in tgx.probe_all(req).tolist()
             if rx.fullmatch(tgx.terms[i])}
        )
        want = sorted(set(fnmatch.filter(set(vocab), pattern)))
        assert got == want, (pattern, vocab)

    check()


def test_engine_leading_wildcard_uses_probe(wild_setup):
    s = LocalSearcher(wild_setup["idx"])
    # probeable leading pattern: result must equal the brute filter of the
    # full vocabulary (computed via the unprobeable path on a huge cap)
    got = s.expand_wildcard("*ndex", 64)
    brute = [t for t in s.expand_wildcard("*e", 10**9)
             if t.endswith("ndex")]  # '*e' falls back to the full scan
    want = sorted({t for t in s._vocab_trigram_index().terms
                   if t.endswith("ndex")})[:64]
    assert got == want
    assert s._trigram_index is not None  # the probe built the map


def test_wild_token_literal_runs_are_analyzed():
    """Wildcard-free runs inside a wildcard token go through the analyzer
    like plain tokens (stemming + stopword removal), not raw term leaves;
    the python oracle expands wild leaves with the wildcard rule."""
    from discogsography_spark.analysis import get_analyzer
    from discogsography_spark.query.boolquery import parse_bool_query

    en = get_analyzer("english")
    ast = parse_bool_query("running.sp*k", en.analyze_query,
                           tokenize=en.tokenize_py)
    assert ast == ("and", (("term", "run"), ("wild", "sp*k")))
    # a stopword literal run vanishes instead of becoming a dead term
    ast = parse_bool_query("the.sp*k", en.analyze_query,
                           tokenize=en.tokenize_py)
    assert ast == ("wild", "sp*k")


def test_python_oracle_expands_wild_leaves(wild_setup, tmp_path):
    from discogsography_spark.oracle import bm25_topk_bool, build_oracle_index

    tdf = wild_setup["tdf"]
    oidx = build_oracle_index(
        list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"]))
    )
    s = LocalSearcher(wild_setup["idx"])
    for q in ["sp*k AND NOT t?e", "ind?x", "sp*k AND (in* OR me*e)"]:
        got = s.topk_bool(q, 15)
        want = bm25_topk_bool(oidx, q, 15)
        assert [(d, round(x, 5)) for d, x in got] == [
            (d, round(x, 5)) for d, x in want
        ], q
    assert bm25_topk_bool(oidx, "sp*k", 5)  # non-empty


def test_random_wildcard_bool_queries_match_python_oracle(wild_setup):
    """Randomized end-to-end pin: 200 random boolean queries mixing plain
    terms, prefixes (`lit*`), wildcard patterns (`l*t`, `l?t`, `*lit`),
    AND/OR/NOT and grouping — the engine and the brute-force python
    oracle must agree on ranked (doc, score) lists. The analog of the
    simplify property suite, over the full wildcard surface."""
    import random

    from discogsography_spark.oracle import bm25_topk_bool, build_oracle_index

    tdf = wild_setup["tdf"]
    oidx = build_oracle_index(
        list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"]))
    )
    vocab = sorted(oidx.postings)
    rng = random.Random(99)

    def leaf():
        w = rng.choice(vocab)
        r = rng.random()
        if r < 0.3:
            return w  # plain term
        if r < 0.5 and len(w) >= 2:
            return w[: rng.randint(1, len(w) - 1)] + "*"  # prefix
        if r < 0.7 and len(w) >= 3:
            i = rng.randint(1, len(w) - 2)
            return w[:i] + "*" + w[i + 1 :]  # mid-star
        if r < 0.85 and len(w) >= 3:
            i = rng.randint(0, len(w) - 1)
            return w[:i] + "?" + w[i + 1 :]  # one-char hole
        return "*" + w[rng.randint(1, max(1, len(w) // 2)) :]  # leading star

    def gen(depth: int) -> str:
        if depth <= 0 or rng.random() < 0.4:
            t = leaf()
            return f"NOT {t}" if rng.random() < 0.15 else t
        op = rng.choice([" AND ", " OR "])
        return "(" + op.join(gen(depth - 1) for _ in range(rng.randint(2, 3))) + ")"

    s = LocalSearcher(wild_setup["idx"])
    checked = 0
    for _ in range(200):
        q = gen(2)
        try:
            want = bm25_topk_bool(oidx, q, 15)
        except Exception:
            continue  # parser-rejected shape (pure negation etc.)
        got = s.topk_bool(q, 15)
        assert [(d, round(x, 5)) for d, x in got] == [
            (d, round(x, 5)) for d, x in want
        ], q
        checked += 1
    assert checked > 120
