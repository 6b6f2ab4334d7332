"""Boolean AND/OR/NOT queries: parser semantics, index-path rank identity
vs the brute-force Python oracle, and DataFrame-path identity at the shared
5-dp rounding."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.analysis import get_analyzer
from discogsography_spark.oracle import bm25_topk_bool
from discogsography_spark.query.boolquery import (
    BoolQueryError,
    eval_predicate,
    parse_bool_query,
    polarity_terms,
)
from discogsography_spark.query.engine import LocalSearcher

_AN = get_analyzer("simple").analyze_query


# ---------------- parser ----------------

def test_parser_precedence_and_parens():
    # OR binds looser than (implicit) AND
    ast = parse_bool_query("a b OR c", _AN)
    assert ast == ("or", (("and", (("term", "a"), ("term", "b"))), ("term", "c")))
    ast2 = parse_bool_query("a AND (b OR c)", _AN)
    assert ast2 == ("and", (("term", "a"), ("or", (("term", "b"), ("term", "c")))))


def test_parser_not_and_keywords_case_insensitive():
    ast = parse_bool_query("a not b", _AN)
    assert ast == ("and", (("term", "a"), ("not", ("term", "b"))))
    assert parse_bool_query("A Or B", _AN) == ("or", (("term", "a"), ("term", "b")))


def test_parser_rejects_pure_negation_and_unbalanced():
    with pytest.raises(BoolQueryError):
        parse_bool_query("NOT a", _AN)
    with pytest.raises(BoolQueryError):
        parse_bool_query("a OR NOT b", _AN)  # satisfiable by the empty doc
    with pytest.raises(BoolQueryError):
        parse_bool_query("(a OR b", _AN)
    assert parse_bool_query("", _AN) is None


def test_parser_stopword_handling_english():
    an = get_analyzer("english").analyze_query
    # 'the' analyzes to nothing: vanishes from AND, drops its OR arm
    assert parse_bool_query("the running", an) == ("term", "run")
    assert parse_bool_query("running OR the", an) == ("term", "run")
    assert parse_bool_query("running AND NOT the", an) == ("term", "run")


def test_eval_predicate_matches_polarity_contract():
    ast = parse_bool_query("a AND (b OR c) AND NOT d", _AN)
    pos, neg = polarity_terms(ast)
    assert pos == ["a", "b", "c"] and neg == ["d"]
    assert eval_predicate(ast, lambda t: t in {"a", "b"})
    assert not eval_predicate(ast, lambda t: t in {"a", "b", "d"})
    assert not eval_predicate(ast, lambda t: t in {"b", "c"})


# ---------------- index path vs python oracle ----------------

def _head_terms(oracle_index, n=6):
    return [
        t
        for t, p in sorted(
            oracle_index.postings.items(), key=lambda tp: (-len(tp[1]), tp[0])
        )[:n]
    ]


def test_topk_bool_rank_identity(built_index, oracle_index):
    s = LocalSearcher(built_index)
    a, b, c, d, e, f = _head_terms(oracle_index)
    queries = [
        f"{a} AND ({b} OR {c})",
        f"{a} AND ({b} OR {c}) AND NOT {d}",
        f"({a} OR {b}) AND NOT ({c} OR {d})",
        f"{e} {f} OR {a} AND NOT {b}",
        f"{a} OR {b} OR {c}",
        f"{a} AND NOT zz-absent",
        f"zz-absent OR {b}",
    ]
    for q in queries:
        expected = bm25_topk_bool(oracle_index, q, 15)
        got = s.topk_bool(q, 15, use_result_cache=False)
        assert [x[0] for x in got] == [x[0] for x in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == es, f"{q}: doc {gd} score {gs!r} != {es!r}"


def test_topk_bool_equals_and_or_modes(built_index, oracle_index):
    """Pure-AND and pure-OR boolean queries must equal the dedicated modes."""
    s = LocalSearcher(built_index)
    a, b, c, *_ = _head_terms(oracle_index)
    q = f"{a} {b} {c}"
    assert s.topk_bool(q, 10, use_result_cache=False) == s.topk(
        q, 10, use_result_cache=False
    )
    q_or = f"{a} OR {b} OR {c}"
    assert s.topk_bool(q_or, 10, use_result_cache=False) == s.topk(
        f"{a} {b} {c}", 10, mode="or", use_result_cache=False
    )


def test_topk_bool_not_excludes(built_index, oracle_index):
    s = LocalSearcher(built_index)
    a, b, *_ = _head_terms(oracle_index)
    big = oracle_index.n_docs + 1  # no truncation — set-level comparison
    base = {d for d, _ in s.topk_bool(f"{a}", big, use_result_cache=False)}
    restricted = {
        d for d, _ in s.topk_bool(f"{a} AND NOT {b}", big, use_result_cache=False)
    }
    b_docs = set(oracle_index.postings[b].keys())
    assert restricted == base - b_docs and restricted


# ---------------- DataFrame path ----------------

def test_bool_dataframe_matches_python_oracle(spark, corpus_dir, oracle_index):
    from discogsography_spark.query.dataframe_bm25 import bm25_bool_topk_dataframe

    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    ordered = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(ordered)), "text": ordered["text"]})
    )
    a, b, c, d, *_ = _head_terms(oracle_index)
    for q in (f"{a} AND ({b} OR {c}) AND NOT {d}", f"({a} OR {b}) AND NOT {c}"):
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_bool_topk_dataframe(docs, q, k=12).collect()
        ]
        wide = bm25_topk_bool(oracle_index, q, 300)
        expected = sorted(
            ((dd, round(s, 5)) for dd, s in wide), key=lambda x: (-x[1], x[0])
        )[:12]
        assert got == expected, q


# ---------------- property-based: parser/eval roundtrip ----------------

def test_boolquery_property_roundtrip():
    """Random ASTs → rendered query string → parse → identical predicate on
    random term subsets (hypothesis-style; seeded exhaustive sweep)."""
    import itertools
    import random

    rng = random.Random(42)
    TERMS = ["a", "b", "c", "d", "e"]

    def gen(depth):
        if depth == 0 or rng.random() < 0.4:
            return ("term", rng.choice(TERMS))
        kind = rng.choice(["and", "or", "not"])
        if kind == "not":
            return ("not", gen(depth - 1))
        return (kind, tuple(gen(depth - 1) for _ in range(rng.randint(2, 3))))

    def render(n):
        k = n[0]
        if k == "term":
            return n[1]
        if k == "not":
            return f"NOT ({render(n[1])})"
        op = " AND " if k == "and" else " OR "
        return "(" + op.join(render(c) for c in n[1]) + ")"

    checked = 0
    for _ in range(200):
        ast0 = gen(3)
        text = render(ast0)
        try:
            ast = parse_bool_query(text, _AN)
        except BoolQueryError:
            # pure-negation rejection: verify the all-absent doc really
            # would match (the rejection is semantic, not syntactic)
            assert eval_predicate(ast0, lambda t: False)
            continue
        assert ast is not None
        for r in range(len(TERMS) + 1):
            for subset in itertools.combinations(TERMS, r):
                has = set(subset).__contains__
                assert eval_predicate(ast, has) == eval_predicate(ast0, has), text
        checked += 1
    assert checked > 50  # the sweep must exercise plenty of accepted shapes


def test_parser_quoted_phrases():
    ast = parse_bool_query('"spark index" OR merge', _AN)
    assert ast == ("or", (("phrase", ("spark", "index")), ("term", "merge")))
    # single-word quote collapses to a term; empty quote vanishes
    assert parse_bool_query('"spark" AND x', _AN) == (
        "and", (("term", "spark"), ("term", "x"))
    )
    assert parse_bool_query('"" OR x', _AN) == ("term", "x")
    with pytest.raises(BoolQueryError):
        parse_bool_query('NOT "a b"', _AN)  # pure negation still rejected


def test_parser_phrase_with_english_analyzer():
    an = get_analyzer("english")
    ast = parse_bool_query(
        '"the running fast" AND spark', an.analyze_query, tokenize=an.tokenize_py
    )
    # stopword dropped INSIDE the phrase, stems applied, order kept
    assert ast == ("and", (("phrase", ("run", "fast")), ("term", "spark")))


# ---------------- prefix terms in boolean queries ----------------

def test_parser_prefix_nodes_and_expansion():
    from discogsography_spark.query.boolquery import expand_prefix_nodes

    ast = parse_bool_query("spa* AND NOT merge", _AN)
    assert ast == ("and", (("prefix", "spa"), ("not", ("term", "merge"))))
    got = expand_prefix_nodes(ast, lambda p: ["spark", "spat"])
    assert got == (
        "and",
        (("or", (("term", "spark"), ("term", "spat"))), ("not", ("term", "merge"))),
    )
    # unmatched prefix: OR arm vanishes, AND conjunct annihilates
    assert expand_prefix_nodes(parse_bool_query("zz* OR merge", _AN), lambda p: []) == ("term", "merge")
    assert expand_prefix_nodes(parse_bool_query("zz* AND merge", _AN), lambda p: []) is None
    assert expand_prefix_nodes(parse_bool_query("merge AND NOT zz*", _AN), lambda p: []) == ("term", "merge")
    with pytest.raises(BoolQueryError):
        parse_bool_query("NOT spa*", _AN)  # pure negation still rejected


def test_topk_bool_prefix_rank_identity(built_index, oracle_index):
    from discogsography_spark.oracle import bm25_topk_bool

    s = LocalSearcher(built_index)
    a, b, *_ = _head_terms(oracle_index)
    pre = a[:3]
    for q in (
        f"{pre}* AND NOT {b}",
        f"{pre}* OR {b}",
        f"({pre}* OR {b}) AND NOT zz-absent",
        "zzqq* OR " + b,
        f"zzqq* AND {b}",
    ):
        got = s.topk_bool(q, 12, use_result_cache=False)
        want = bm25_topk_bool(oracle_index, q, 12)
        assert [x[0] for x in got] == [x[0] for x in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == ws, f"{q}: {gs!r} != {ws!r}"


def test_bool_prefix_dataframe_identity(spark, corpus_dir, oracle_index):
    from discogsography_spark.oracle import bm25_topk_bool
    from discogsography_spark.query.dataframe_bm25 import bm25_bool_topk_dataframe

    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    ordered = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(ordered)), "text": ordered["text"]})
    )
    a, b, *_ = _head_terms(oracle_index)
    q = f"{a[:3]}* AND NOT {b}"
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_bool_topk_dataframe(docs, q, k=10).collect()
    ]
    wide = bm25_topk_bool(oracle_index, q, 400)
    want = sorted(
        ((d, round(x, 5)) for d, x in wide), key=lambda y: (-y[1], y[0])
    )[:10]
    assert got == want, q


def test_parser_within_nodes():
    """`a <N> b` (and websearch `<->` = <1>) parse to ('within', (t1, t2),
    N) nodes composing with AND/OR/NOT; operands must be plain terms."""
    from discogsography_spark.analysis import analyze_query

    from discogsography_spark.query.boolquery import (
        BoolQueryError,
        has_positional_nodes,
        has_within_nodes,
        parse_bool_query,
        polarity_terms,
    )

    ast = parse_bool_query("spark <3> index AND NOT merge", analyze_query)
    assert ast == (
        "and",
        (("within", ("spark", "index"), (3,)), ("not", ("term", "merge"))),
    )
    assert has_within_nodes(ast) and has_positional_nodes(ast)
    assert polarity_terms(ast) == (["index", "spark"], ["merge"])
    assert parse_bool_query("a <-> b OR c", analyze_query) == (
        "or", (("within", ("a", "b"), (1,)), ("term", "c"))
    )
    for bad in ("<3> b", "a <3>", '"x y" <2> b',
                "a <0> b", "spa* <2> b", "(a OR b) <2> c"):
        with pytest.raises(BoolQueryError):
            parse_bool_query(bad, analyze_query)


def test_eval_predicate_within():
    from discogsography_spark.analysis import analyze_query

    from discogsography_spark.query.boolquery import (
        eval_predicate,
        parse_bool_query,
    )

    ast = parse_bool_query("a <2> b AND NOT c", analyze_query)
    toks = ["x", "a", "y", "b", "z"]

    def has_within(pair, ws):
        t1, t2 = pair
        (w,) = ws
        p1 = [i for i, t in enumerate(toks) if t == t1]
        p2 = [i for i, t in enumerate(toks) if t == t2]
        return any(i != j and abs(i - j) <= w for i in p1 for j in p2)

    assert eval_predicate(
        ast, lambda t: t in toks, has_within=has_within
    )
    toks = ["a", "x", "y", "z", "b"]  # distance 4 > 2
    assert not eval_predicate(
        ast, lambda t: t in toks, has_within=has_within
    )


def test_rewrite_fuzzy_terms_ast():
    from discogsography_spark.analysis import analyze_query

    from discogsography_spark.query.boolquery import (
        parse_bool_query,
        rewrite_fuzzy_terms,
    )

    ast = parse_bool_query('sparc AND ("exact phrase" OR indx*)', analyze_query)
    vocab = {"spark", "exact", "phrase"}
    fixed, rw = rewrite_fuzzy_terms(
        ast, known=vocab.__contains__, suggest=lambda t: "spark" if t == "sparc" else None
    )
    assert rw == {"sparc": "spark"}
    # phrase and prefix nodes untouched; only the plain term leaf rewrote
    assert fixed == parse_bool_query('spark AND ("exact phrase" OR indx*)', analyze_query)


def test_simplify_absent_preserves_phrase_scoring_terms():
    """Regression: simplifying `"spark zzqq" OR merge` (zzqq absent) must
    NOT drop the phrase node — its PRESENT term 'spark' belongs to the
    positive-polarity scoring set even though the phrase can't match.
    Only an all-absent phrase (no scoring impact) may vanish."""
    from discogsography_spark.analysis import analyze_query

    from discogsography_spark.query.boolquery import (
        parse_bool_query,
        polarity_terms,
        simplify_absent,
    )

    vocab = {"spark", "merge", "index"}
    ast = parse_bool_query('"spark zzqq" OR merge', analyze_query)
    simp = simplify_absent(ast, vocab.__contains__)
    assert simp == ast  # phrase kept: one operand is present
    assert "spark" in polarity_terms(simp)[0]

    # all-absent phrase vanishes from the OR; absent term leaf vanishes;
    # NOT-absent collapses its AND wrapper
    ast2 = parse_bool_query('"zza zzb" OR merge', analyze_query)
    assert simplify_absent(ast2, vocab.__contains__) == ("term", "merge")
    ast3 = parse_bool_query("spark AND NOT zzq", analyze_query)
    assert simplify_absent(ast3, vocab.__contains__) == ("term", "spark")
    ast4 = parse_bool_query("zza AND spark", analyze_query)
    assert simplify_absent(ast4, vocab.__contains__) is None


def test_simplify_absent_property_equivalence():
    """Property pin for the vocabulary simplification the engine actually
    evaluates (simplify_for_eval): over random parser-valid ASTs, random
    vocabularies, and random per-doc term sets, the output evaluates to the
    IDENTICAL matched set and keeps the identical PRESENT positive-polarity
    scoring terms — the guard falls back to the original AST when a present
    term sits in a dead branch (this suite found that case)."""
    import random

    import numpy as np

    from discogsography_spark.query.boolquery import (
        _satisfiable_empty,
        eval_docsets,
        polarity_terms,
        simplify_for_eval,
    )

    alphabet = [f"t{i}" for i in range(6)]
    rng = random.Random(1234)

    def gen(depth: int):
        r = rng.random()
        if depth <= 0 or r < 0.45:
            return ("term", rng.choice(alphabet))
        if r < 0.6:
            return ("not", gen(depth - 1))
        kids = tuple(gen(depth - 1) for _ in range(rng.randint(2, 3)))
        return (("and", kids) if r < 0.8 else ("or", kids))

    checked = 0
    for _ in range(400):
        ast = gen(3)
        if _satisfiable_empty(ast):
            continue  # the parser rejects these shapes
        vocab = {t for t in alphabet if rng.random() < 0.6}
        # random corpus: 12 docs, term membership via docID arrays
        docs_of = {}
        for t in alphabet:
            if t not in vocab:
                docs_of[t] = np.empty(0, dtype=np.int64)
            else:
                docs_of[t] = np.array(
                    sorted(d for d in range(12) if rng.random() < 0.4),
                    dtype=np.int64,
                )
        want = eval_docsets(ast, lambda t: docs_of[t])
        simp = simplify_for_eval(ast, vocab.__contains__)
        if simp is None:
            got = np.empty(0, dtype=np.int64)
        else:
            assert simp != ("true",)  # parser invariant survives
            got = eval_docsets(simp, lambda t: docs_of[t])
        assert got.tolist() == want.tolist(), (ast, sorted(vocab))
        # scoring parity: PRESENT positive terms unchanged
        pos_before = [t for t in polarity_terms(ast)[0] if t in vocab]
        pos_after = (
            [t for t in polarity_terms(simp)[0] if t in vocab]
            if simp is not None
            else []
        )
        if simp is not None:
            assert pos_after == pos_before, (ast, sorted(vocab))
        checked += 1
    assert checked > 150


def test_within_stopword_operand_raises():
    """A stopword immediately before/after `<N>` must raise, not silently
    rebind the operator to an earlier term."""
    from discogsography_spark.query.boolquery import (
        BoolQueryError,
        parse_bool_query,
    )

    def an(w):  # english-style: 'the' analyzes to nothing
        return [] if w.lower() == "the" else [w.lower()]

    with pytest.raises(BoolQueryError, match="analyzed to nothing"):
        parse_bool_query("spark the <2> batch", an)
    with pytest.raises(BoolQueryError):
        parse_bool_query("spark <2> the batch", an)
    # sanity: without the stopword it parses normally
    assert parse_bool_query("spark <2> batch", an) == (
        "within", ("spark", "batch"), (2,)
    )


def test_parse_within_chain():
    """r5: `a <N1> b <N2> c` parses into one n-ary within node with
    per-link windows; composition with AND/OR/NOT and the 2-term form
    are unchanged."""
    from discogsography_spark.analysis import analyze_query
    from discogsography_spark.query.boolquery import (
        BoolQueryError,
        parse_bool_query,
    )

    assert parse_bool_query("a <1> b <2> c", analyze_query) == (
        "within", ("a", "b", "c"), (1, 2)
    )
    assert parse_bool_query("a <-> b <3> c <1> d", analyze_query) == (
        "within", ("a", "b", "c", "d"), (1, 3, 1)
    )
    assert parse_bool_query("a <2> b <2> c AND NOT x", analyze_query) == (
        "and",
        (("within", ("a", "b", "c"), (2, 2)), ("not", ("term", "x"))),
    )
    # same-term chain (adjacent links need distinct occurrences)
    assert parse_bool_query("a <2> a <2> a", analyze_query) == (
        "within", ("a", "a", "a"), (2, 2)
    )
    with pytest.raises(BoolQueryError):
        parse_bool_query('a <1> "x y" <2> c', analyze_query)
    with pytest.raises(BoolQueryError):
        parse_bool_query("a <1> b <0> c", analyze_query)
