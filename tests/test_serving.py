"""SearchService: the index-path search response (results + facets over the
matched set + headlines) must agree exactly with the DataFrame path — the
reference's single-request search contract (search_queries.py:274-354,:144)
without a per-query corpus scan."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.serving import SearchService


@pytest.fixture(scope="module")
def served(spark, corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("servedidx") / "idx")
    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    IndexBuilder(idx, num_segments=4, store_text=True).build(transcripts)
    svc = SearchService(
        idx,
        facet_defs={
            "role": "role",
            "tool": "tool",
            "turn_bucket": lambda pdf: ((pdf["turn_idx"] // 5) * 5).astype(str),
        },
    )
    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    tdf = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tdf["doc_id"] = range(len(tdf))
    return svc, tdf


def _matched_pdf(tdf: pd.DataFrame, terms: list[str], mode: str = "and") -> pd.DataFrame:
    from discogsography_spark.analysis import tokenize_py

    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    if mode == "and":
        m = toks.map(lambda s: all(t in s for t in terms))
    else:
        m = toks.map(lambda s: any(t in s for t in terms))
    return tdf[m]


@pytest.mark.parametrize("query,mode", [("spark index", "and"), ("spark index", "or"), ("merge", "and")])
def test_matched_set_and_facets_match_scan(served, query, mode):
    svc, tdf = served
    terms = sorted(set(query.split()))
    expected = _matched_pdf(tdf, terms, mode)
    matched = svc.matched_docs(query, mode=mode)
    assert sorted(matched.tolist()) == sorted(expected["doc_id"].tolist())

    resp = svc.search(query, k=10, mode=mode, facets=["role", "tool", "turn_bucket"])
    assert resp.total_matched == len(expected)
    # facet counts == pandas groupby over the matched scan
    want_role = expected.groupby("role").size().to_dict()
    got_role = dict(resp.facets["role"])
    assert got_role == {str(k): v for k, v in want_role.items()}
    tool_labels = expected["tool"].astype("string").fillna("(none)")
    assert dict(resp.facets["tool"]) == tool_labels.groupby(tool_labels).size().to_dict()
    tb = ((expected["turn_idx"] // 5) * 5).astype(str)
    assert dict(resp.facets["turn_bucket"]) == tb.groupby(tb).size().to_dict()


def test_headlines_match_dataframe_regexp(served):
    svc, tdf = served
    resp = svc.search("spark", k=5, highlight=True)
    assert resp.results and len(resp.headlines) == len(resp.results)
    import re

    for doc_id, _ in resp.results:
        raw = tdf.loc[tdf["doc_id"] == doc_id, "text"].iloc[0]
        assert resp.headlines[doc_id] == re.sub("(spark)", r"<<\1>>", raw)
        assert "<<spark>>" in resp.headlines[doc_id]


def test_results_identical_to_local_searcher(served):
    svc, _ = served
    assert svc.search("spark index", k=10).results == svc.searcher.topk(
        "spark index", 10
    )


def test_highlight_requires_text(spark, corpus_dir, tmp_path):
    idx = str(tmp_path / "idx")
    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    IndexBuilder(idx, num_segments=2).build(transcripts)  # no store_text
    svc = SearchService(idx)
    with pytest.raises(ValueError, match="store_text"):
        svc.search("spark", k=3, highlight=True)
    # but a user-supplied lookup works (the source-table pattern at scale)
    svc2 = SearchService(idx, text_lookup=lambda d: "spark spark")
    resp = svc2.search("spark", k=3, highlight=True)
    for h in resp.headlines.values():
        assert h == "<<spark>> <<spark>>"


def test_served_entries_match_dataframe_entries(spark):
    """The graded contract: fts_facets_served / fts_highlight_served equal
    their DataFrame-path twins at sf0.001."""
    import __spark_entry__ as m

    q = m.queries()
    sf = "/root/testdata/sf0.001"
    a = (
        q["fts_facets_served"](spark, sf)
        .toPandas()
        .sort_values(["facet", "value"])
        .reset_index(drop=True)
    )
    b = (
        q["fts_facets_multi"](spark, sf)
        .toPandas()
        .sort_values(["facet", "value"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    h = q["fts_highlight_served"](spark, sf).toPandas()
    h2 = q["fts_highlight"](spark, sf).toPandas()
    pd.testing.assert_frame_equal(h, h2)


def test_empty_query_and_absent_term(served):
    svc, _ = served
    assert svc.matched_docs("").size == 0
    resp = svc.search("zzqqnotaterm", k=5, facets=["role"])
    assert resp.results == [] and resp.total_matched == 0
    assert resp.facets["role"] == []


@pytest.fixture(scope="module")
def sharded_served(spark, tmp_path_factory):
    """Two conv-range shards + the equivalent whole-corpus index, all with
    store_text, role/tool facets."""
    from discogsography_spark.corpus import make_transcripts

    d = tmp_path_factory.mktemp("shsrv")
    tdf = make_transcripts(n_conversations=100, mean_turns=6, vocab_size=400)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=4, store_text=True).build(
        spark.read.parquet(full_p)
    )
    shard_dirs = []
    mid = convs[len(convs) // 2]
    for i, m in enumerate([tdf["conv_id"] < mid, tdf["conv_id"] >= mid]):
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2, store_text=True).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)
    return full_idx, shard_dirs


@pytest.mark.parametrize("mode", ["and", "or"])
def test_sharded_response_equals_single_index(sharded_served, mode):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ["spark index", "merge", "window shuffle"]:
        a = single.search(q, k=10, mode=mode, facets=["role", "tool"], highlight=True)
        b = sharded.search(q, k=10, mode=mode, facets=["role", "tool"], highlight=True)
        assert a.results == b.results, q
        assert a.total_matched == b.total_matched, q
        assert a.facets == b.facets, q
        assert a.headlines == b.headlines, q


def test_bool_mode_full_response(served):
    """mode='bool': matched set from the AND/OR/NOT predicate, results from
    topk_bool, facets over the boolean matched set, headlines wrap only
    positive-polarity terms."""
    from discogsography_spark.analysis import tokenize_py
    from discogsography_spark.query.boolquery import eval_predicate, parse_bool_query

    svc, tdf = served
    q = "(spark OR index) AND NOT merge"
    ast = parse_bool_query(q, lambda w: sorted(set(tokenize_py(w))))
    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    expected = tdf[toks.map(lambda s: eval_predicate(ast, s.__contains__))]

    matched = svc.matched_docs(q, mode="bool")
    assert sorted(matched.tolist()) == sorted(expected["doc_id"].tolist())

    resp = svc.search(q, 10, mode="bool", facets=["role"], highlight=True)
    assert resp.results == svc.searcher.topk_bool(q, 10)
    assert resp.total_matched == len(expected)
    want_role = sorted(expected.groupby("role").size().items())
    assert resp.facets["role"] == [(v, int(n)) for v, n in want_role]
    for d, text in resp.headlines.items():
        assert "<<merge>>" not in text  # negated terms never highlighted
    # a positive term is actually wrapped somewhere in the top-k
    assert any("<<spark>>" in t or "<<index>>" in t for t in resp.headlines.values())


def test_sharded_bool_response_equals_single_index(sharded_served):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    q = "(spark OR index) AND NOT merge"
    a = single.search(q, 10, mode="bool", highlight=True)
    b = sharded.search(q, 10, mode="bool", highlight=True)
    assert a.results == b.results
    assert a.total_matched == b.total_matched
    assert a.facets == b.facets
    assert a.headlines == b.headlines


def test_fuzzy_rewrite_in_served_response(served):
    svc, tdf = served
    clean = svc.search("spark index", 8)
    fz = svc.search("sparkz index", 8, fuzzy=True)
    assert fz.rewrites == {"sparkz": "spark"}
    assert fz.results == clean.results
    assert fz.total_matched == clean.total_matched
    # without fuzzy, the misspelled AND returns nothing
    assert svc.search("sparkz index", 8).results == []


def test_faceted_drilldown_filter(served):
    """filter={field: value}: results + total_matched + facets restricted to
    the drill-down subset, scores identical to an unfiltered scan of that
    subset."""
    svc, tdf = served
    q = "spark index"
    base = _matched_pdf(tdf, sorted(set(q.split())), "and")
    sub = base[base["role"] == "assistant"]
    resp = svc.search(q, 10, filter={"role": "assistant"}, facets=["tool"])
    assert resp.total_matched == len(sub)
    assert {d for d, _ in resp.results} <= set(sub["doc_id"])
    # scores equal the unfiltered ranking's scores for the same docs
    full_scores = dict(svc.searcher.topk(q, svc.meta.n_docs, use_result_cache=False))
    for d, x in resp.results:
        assert x == full_scores[d]
    # ranking = unfiltered order restricted to the subset
    want_order = [d for d, _ in sorted(
        ((d, full_scores[d]) for d in sub["doc_id"]),
        key=lambda y: (-y[1], y[0]),
    )][:10]
    assert [d for d, _ in resp.results] == want_order
    # facet counts over the filtered subset
    tool_labels = sub["tool"].astype("string").fillna("(none)")
    assert dict(resp.facets["tool"]) == tool_labels.groupby(tool_labels).size().to_dict()
    # unknown value → empty, unknown field → error
    assert svc.search(q, 5, filter={"role": "nope"}).total_matched == 0
    with pytest.raises(ValueError):
        svc.search(q, 5, filter={"bogus": "x"})


def test_sharded_drilldown_equals_single_index(sharded_served):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ("spark index", "merge"):
        a = single.search(q, 10, filter={"role": "assistant"}, facets=["tool"])
        b = sharded.search(q, 10, filter={"role": "assistant"}, facets=["tool"])
        assert a.results == b.results, q
        assert a.total_matched == b.total_matched, q
        assert a.facets == b.facets, q


def test_drilldown_bool_mode(served):
    svc, tdf = served
    from discogsography_spark.analysis import tokenize_py
    from discogsography_spark.query.boolquery import eval_predicate, parse_bool_query

    q = "(spark OR index) AND NOT merge"
    ast = parse_bool_query(q, lambda w: sorted(set(tokenize_py(w))))
    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    base = tdf[toks.map(lambda s: eval_predicate(ast, s.__contains__))]
    sub = base[base["role"] == "user"]
    resp = svc.search(q, 10, mode="bool", filter={"role": "user"})
    assert resp.total_matched == len(sub)
    assert {d for d, _ in resp.results} <= set(sub["doc_id"])
    # scores equal the unfiltered boolean ranking for the same docs
    full = dict(svc.searcher.topk_bool(q, svc.meta.n_docs, use_result_cache=False))
    for d, x in resp.results:
        assert x == full[d]


def test_sharded_fuzzy_rewrite_equals_single(sharded_served):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    a = single.search("sparkz index", 8, fuzzy=True)
    b = sharded.search("sparkz index", 8, fuzzy=True)
    assert a.rewrites == b.rewrites == {"sparkz": "spark"}
    assert a.results == b.results
    assert a.total_matched == b.total_matched


def test_sharded_bool_prefix_drilldown_equals_single(sharded_served):
    """Regression: sharded bool+filter with a PREFIX node used to KeyError —
    _rank_matched scored prefix-expanded terms absent from the idfs map.
    The global expansion must now be injected into idf derivation, ranking,
    matched-set counting, and facets, so the full response equals the
    single-index one."""
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ("spa* AND index", "w* AND spark"):
        a = single.search(q, 10, mode="bool", filter={"role": "assistant"},
                          facets=["tool"], highlight=True)
        b = sharded.search(q, 10, mode="bool", filter={"role": "assistant"},
                           facets=["tool"], highlight=True)
        assert a.results == b.results, q
        assert a.total_matched == b.total_matched, q
        assert a.facets == b.facets, q
        assert a.headlines == b.headlines, q


def test_sharded_bool_prefix_counts_use_global_expansion(sharded_served):
    """Regression: non-filter bool mode with a >cap prefix ('w*' expands to
    hundreds of terms, shard vocabularies differ) — counts/facets must
    evaluate the SAME capped global rewrite the ranked results use, which
    equals the single-index local expansion."""
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    q = "w* AND spark"
    a = single.search(q, 10, mode="bool", facets=["role"])
    b = sharded.search(q, 10, mode="bool", facets=["role"])
    assert a.results == b.results
    assert a.total_matched == b.total_matched
    assert a.facets == b.facets


def test_fuzzy_rewrite_nonidempotent_stem(spark, tmp_path):
    """Regression: the did-you-mean rewrite must thread the fixed ANALYZED
    term list, not a re-joined query string. With the english analyzer,
    'universities' indexes as 'univers', and re-analyzing 'univers' stems
    it AGAIN to 'univ' (Porter is not idempotent) — the old string-rejoin
    path searched a vocabulary-absent term and returned nothing."""
    import pandas as pd

    rows = []
    for i, txt in enumerate(
        ["universities of spark", "universities everywhere", "spark shuffle"]
    ):
        rows.append({"conv_id": f"c-{i:04d}", "turn_idx": 0, "role": "user",
                     "text": txt, "tool": None})
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "t.parquet")
    pdf.to_parquet(src, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True, analyzer="english").build(
        spark.read.parquet(src)
    )
    svc = SearchService(idx)
    an = svc._an
    assert an.analyze_query("universities") == ["univers"]
    assert an.analyze_query("univers") == ["univ"]  # the trap this guards

    resp = svc.search("universitiez", 5, fuzzy=True)
    assert resp.rewrites == {"universitiez": "univers"}
    assert resp.results == svc.searcher._topk_and(["univers"], 5)
    assert len(resp.results) == 2 and resp.total_matched == 2
    # and identical to the LocalSearcher fuzzy path (which always threaded
    # the term list)
    res2, rw2 = svc.searcher.topk_fuzzy("universitiez", 5)
    assert resp.results == res2 and resp.rewrites == rw2


def test_fuzzy_bool_served_response(served):
    """fuzzy=True with mode='bool': vocabulary-absent plain term leaves
    rewrite via trigram suggestion; results/matched/facets all evaluate the
    rewritten AST."""
    svc, tdf = served
    clean = svc.search("spark AND index", 8, mode="bool", facets=["role"])
    fz = svc.search("sparkz AND index", 8, mode="bool", fuzzy=True, facets=["role"])
    assert fz.rewrites == {"sparkz": "spark"}
    assert fz.results == clean.results
    assert fz.total_matched == clean.total_matched
    assert fz.facets == clean.facets
    # without fuzzy, the misspelled conjunct matches nothing
    assert svc.search("sparkz AND index", 8, mode="bool").results == []


def test_sharded_fuzzy_bool_equals_single(sharded_served):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ("sparkz AND index", "sparkz OR (index AND NOT merge)"):
        a = single.search(q, 10, mode="bool", fuzzy=True, facets=["role"])
        b = sharded.search(q, 10, mode="bool", fuzzy=True, facets=["role"])
        assert a.rewrites == b.rewrites == {"sparkz": "spark"}, q
        assert a.results == b.results, q
        assert a.total_matched == b.total_matched, q
        assert a.facets == b.facets, q


@pytest.fixture(scope="module")
def merged_served(spark, tmp_path_factory):
    """Positional store_text base + two IN-ORDER deltas, plus the fresh
    whole-corpus index — merged docIDs equal the fresh build's."""
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("mrgsrv")
    tdf = make_transcripts(n_conversations=90, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base_p = str(d / "base.parquet")
    tdf[tdf["conv_id"].isin(convs[:30])].to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(
        idx, num_segments=2, store_text=True, with_positions=True
    ).build(spark.read.parquet(base_p))
    writer = DeltaIndexWriter(idx)
    for i, cs in enumerate([convs[30:60], convs[60:]]):  # IN order
        p = str(d / f"c{i}.parquet")
        tdf[tdf["conv_id"].isin(cs)].to_parquet(p, index=False)
        writer.write_batch(spark.read.parquet(p), i)
    fresh_p = str(d / "union.parquet")
    tdf.to_parquet(fresh_p, index=False)
    fresh = str(d / "fresh")
    IndexBuilder(
        fresh, num_segments=2, store_text=True, with_positions=True
    ).build(spark.read.parquet(fresh_p))
    return {"idx": idx, "fresh": fresh, "tdf": tdf, "dir": str(d)}


def test_merged_service_equals_fresh_index_service(merged_served):
    """The live merged view serves the FULL response shape (results,
    total_matched, facets, headlines) identically to a fresh whole-corpus
    index — streaming deployments lose nothing between compactions."""
    from discogsography_spark.query.serving import MergedSearchService

    defs = {"role": "role", "tool": "tool"}
    fresh = SearchService(merged_served["fresh"], facet_defs=defs)
    live = MergedSearchService(merged_served["idx"], facet_defs=defs)
    assert live.n_docs == fresh.meta.n_docs
    for q, mode in [
        ("spark index", "and"), ("merge", "and"), ("spark index", "or"),
        ("(spark OR index) AND NOT merge", "bool"),
        ("spa* AND NOT merge", "bool"),
        ('"spark index" OR merge', "bool"),
        ("spark <3> index AND NOT merge", "bool"),
    ]:
        a = fresh.search(q, 10, mode=mode, facets=["role", "tool"], highlight=True)
        b = live.search(q, 10, mode=mode, facets=["role", "tool"], highlight=True)
        assert a.results == b.results, (q, mode)
        assert a.total_matched == b.total_matched, (q, mode)
        assert a.facets == b.facets, (q, mode)
        assert a.headlines == b.headlines, (q, mode)


def test_merged_service_drilldown_live_view(merged_served):
    """filter= narrows results/counts/facets on the LIVE view; scores equal
    the unfiltered merged ranking for the same docs."""
    from discogsography_spark.query.serving import MergedSearchService

    defs = {"role": "role", "tool": "tool"}
    live = MergedSearchService(merged_served["idx"], facet_defs=defs)
    q = "spark index"
    full_resp = live.search(q, 10**6)
    full_scores = dict(full_resp.results)
    resp = live.search(q, 10, filter={"role": "assistant"}, facets=["tool"])
    assert 0 < resp.total_matched < full_resp.total_matched
    for doc, score in resp.results:
        assert score == full_scores[doc]
    # subset restriction matches the facet count for the filter value
    base_facets = live.search(q, 5, facets=["role"]).facets["role"]
    assert resp.total_matched == dict(base_facets)["assistant"]
    assert live.search(q, 5, filter={"role": "nope"}).total_matched == 0
    with pytest.raises(ValueError):
        live.search(q, 5, filter={"bogus": "x"})


def test_merged_service_after_compact_equals_single(spark, merged_served):
    """compact() then MergedSearchService (no deltas left) == SearchService
    over the same directory — the service works across the whole lifecycle."""
    import shutil

    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import compact

    work = os.path.join(merged_served["dir"], "compact_copy")
    if os.path.isdir(work):
        shutil.rmtree(work)
    shutil.copytree(merged_served["idx"], work)
    assert compact(spark, work) == 2
    defs = {"role": "role"}
    a = SearchService(work, facet_defs=defs).search(
        "spark index", 10, facets=["role"], highlight=True
    )
    b = MergedSearchService(work, facet_defs=defs).search(
        "spark index", 10, facets=["role"], highlight=True
    )
    assert a.results == b.results
    assert a.total_matched == b.total_matched
    assert a.facets == b.facets
    assert a.headlines == b.headlines


def test_fragment_headlines_served(served):
    """highlight_fragments=N returns windowed snippets per the documented
    contract (first-occurrence fixed-length windows, sorted present terms
    capped at N, ' ... ' joins, in-window wrapping) — verified against an
    independent in-test reimplementation, on single-index, and the
    whole-text mode stays unchanged."""
    import re as _re

    svc, tdf = served
    q = "spark index"
    resp = svc.search(q, 8, highlight_fragments=2)
    assert resp.results and len(resp.headlines) == len(resp.results)
    terms = sorted(set(q.split()))
    R = 30
    for doc_id, _ in resp.results:
        raw = tdf.loc[tdf["doc_id"] == doc_id, "text"].iloc[0]
        frags = []
        for t in [t for t in terms if t in raw][:2]:
            s = raw.index(t)
            start = max(0, s - R)
            fr = raw[start : start + len(t) + 2 * R]
            for tt in terms:
                fr = _re.sub(f"({tt})", r"<<\1>>", fr)
            frags.append(fr)
        assert resp.headlines[doc_id] == " ... ".join(frags)
        assert "<<" in resp.headlines[doc_id]
    # whole-text mode unchanged
    whole = svc.search(q, 8, highlight=True)
    for doc_id, _ in whole.results:
        raw = tdf.loc[tdf["doc_id"] == doc_id, "text"].iloc[0]
        want = raw
        for t in terms:
            want = _re.sub(f"({t})", r"<<\1>>", want)
        assert whole.headlines[doc_id] == want


def test_fragment_headlines_sharded_and_merged(sharded_served, merged_served):
    from discogsography_spark.query.serving import (
        MergedSearchService,
        ShardedSearchService,
    )

    full_idx, shard_dirs = sharded_served
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    a = single.search("spark index", 8, highlight_fragments=1)
    b = sharded.search("spark index", 8, highlight_fragments=1)
    assert a.headlines == b.headlines and a.headlines

    fresh = SearchService(merged_served["fresh"])
    live = MergedSearchService(merged_served["idx"])
    c = fresh.search("spark index", 8, highlight_fragments=1)
    d = live.search("spark index", 8, highlight_fragments=1)
    assert c.headlines == d.headlines and c.headlines


def test_merged_service_or_mode_and_fuzzy(merged_served):
    """OR-mode ranking on the merged service must be genuinely disjunctive
    (regression: it silently ranked with AND semantics), and fuzzy=True
    works on the live view in every mode, equal to a fresh index."""
    from discogsography_spark.query.serving import MergedSearchService

    fresh = SearchService(merged_served["fresh"])
    live = MergedSearchService(merged_served["idx"])
    tdf = merged_served["tdf"]
    # a rare token appearing without 'spark' somewhere → OR != AND
    from collections import Counter

    from discogsography_spark.analysis import tokenize_py

    cnt = Counter(t for text in tdf["text"] for t in set(tokenize_py(text)))
    rare = next(t for t, c in sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))
                if t != "spark" and c >= 2)
    q = f"{rare} spark"
    a_or = fresh.search(q, 10, mode="or")
    b_or = live.search(q, 10, mode="or")
    assert a_or.results == b_or.results
    assert a_or.total_matched == b_or.total_matched
    a_and = live.search(q, 10, mode="and")
    assert a_or.total_matched > a_and.total_matched  # genuinely disjunctive

    for q2, mode in [
        ("sparkz index", "and"),
        ("sparkz index", "or"),
        ("sparkz AND index", "bool"),
        ("sparkz OR (index AND NOT merge)", "bool"),
    ]:
        a = fresh.search(q2, 10, mode=mode, fuzzy=True)
        b = live.search(q2, 10, mode=mode, fuzzy=True)
        assert a.rewrites == b.rewrites == {"sparkz": "spark"}, (q2, mode)
        assert a.results == b.results, (q2, mode)
        assert a.total_matched == b.total_matched, (q2, mode)
    # merged topk_fuzzy surface directly
    res, rw = live.searcher.topk_fuzzy("sparkz index", 10)
    assert rw == {"sparkz": "spark"}
    assert res == live.searcher.topk("spark index", 10)


def test_sharded_fuzzy_bool_with_filter_equals_single(sharded_served):
    """The full combination: fuzzy rewrite + boolean mode + faceted
    drill-down on the sharded tier must equal the single index — the
    rewritten AST threads through filtering, global-idf derivation,
    ranking, counting, and facets together."""
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    q = "sparkz AND (index OR merge)"
    a = single.search(q, 10, mode="bool", fuzzy=True,
                      filter={"role": "user"}, facets=["tool"])
    b = sharded.search(q, 10, mode="bool", fuzzy=True,
                       filter={"role": "user"}, facets=["tool"])
    assert a.rewrites == b.rewrites == {"sparkz": "spark"}
    assert a.results == b.results
    assert a.total_matched == b.total_matched
    assert a.facets == b.facets


def test_offset_pagination_single(served):
    """offset= pages the ranked results (reference search API: ORDER BY
    rank DESC, id LIMIT k OFFSET n — api/queries/search_queries.py:230):
    consecutive pages tile the deep top-k exactly, never overlapping or
    skipping, for every query mode; headlines follow the page."""
    svc, _tdf = served
    for q, mode in [
        ("spark index", "and"),
        ("spark index merge", "or"),
        ("(spark OR index) AND NOT merge", "bool"),
    ]:
        deep = svc.search(q, k=40, mode=mode)
        beyond = deep.total_matched + 3  # off the end of every ranking
        for off, k in [(0, 10), (3, 5), (10, 10), (25, 10), (beyond, 5)]:
            page = svc.search(q, k=k, mode=mode, offset=off, highlight=True)
            assert page.results == deep.results[off:off + k], (q, off)
            assert page.total_matched == deep.total_matched
            assert set(page.headlines) == {d for d, _ in page.results}
        # three consecutive pages == the first 30
        tiles = [
            svc.search(q, k=10, mode=mode, offset=o).results
            for o in (0, 10, 20)
        ]
        assert [r for t in tiles for r in t] == deep.results[:30]
    with pytest.raises(ValueError, match="offset"):
        svc.search("spark", 5, offset=-1)


def test_offset_pagination_drilldown_and_fuzzy(served):
    """offset composes with faceted drill-down and did-you-mean rewrite —
    the page is a slice of the same filtered/rewritten ranking."""
    svc, _tdf = served
    deep = svc.search("spark index", k=25, filter={"role": "user"})
    page = svc.search("spark index", k=10, filter={"role": "user"}, offset=5)
    assert page.results == deep.results[5:15]
    assert page.total_matched == deep.total_matched
    deepf = svc.search("sparkz index", k=20, fuzzy=True)
    pagef = svc.search("sparkz index", k=8, fuzzy=True, offset=4)
    assert pagef.results == deepf.results[4:12]
    assert pagef.rewrites == deepf.rewrites


def test_offset_pagination_sharded_equals_single(sharded_served):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    for q, mode in [("spark index", "and"), ("merge OR window", "bool")]:
        for off in (0, 4, 11):
            a = single.search(q, k=7, mode=mode, offset=off)
            b = sharded.search(q, k=7, mode=mode, offset=off)
            assert a.results == b.results, (q, off)
            assert a.total_matched == b.total_matched


def test_offset_pagination_merged_equals_fresh(merged_served):
    from discogsography_spark.query.serving import MergedSearchService

    fresh = SearchService(merged_served["fresh"])
    merged = MergedSearchService(merged_served["idx"])
    for q in ("spark index", "merge"):
        for off in (0, 5, 12):
            a = fresh.search(q, k=6, offset=off)
            b = merged.search(q, k=6, offset=off)
            assert a.results == b.results, (q, off)
            assert a.total_matched == b.total_matched


def _brute_cover_fragments(
    text: str, terms: list[str], max_fragments: int, max_words: int
) -> str:
    """Independent naive re-derivation of the cover_fragments contract:
    occurrence scans recomputed per end position (O(n^2)), full candidate
    sort, greedy non-overlap, padded render."""
    import re as _re

    ordered = sorted({t for t in terms if t})
    words = text.split(" ")
    n = len(words)
    occ = {t: [p for p in range(1, n + 1) if t in words[p - 1]] for t in ordered}
    present = [t for t in ordered if occ[t]]
    if not present:
        return ""
    covers = []
    for e in range(1, n + 1):
        if not any(e in occ[t] for t in present):
            continue
        lasts = []
        for t in present:
            before = [p for p in occ[t] if p <= e]
            if not before:
                lasts = None
                break
            lasts.append(before[-1])
        if lasts is None:
            continue
        s = min(lasts)
        covers.append((e - s + 1, s, e))
    chosen = []
    for _w, s, e in sorted(covers):
        if len(chosen) >= max_fragments:
            break
        if all(e < cs or s > ce for cs, ce in chosen):
            chosen.append((s, e))
    frags = []
    for s, e in sorted(chosen):
        width = e - s + 1
        target = max(width, max_words)
        s2 = max(1, s - (target - width) // 2)
        e2 = min(n, s2 + target - 1)
        fr = " ".join(words[s2 - 1 : e2])
        for t in ordered:
            fr = _re.sub(f"({_re.escape(t)})", r"<<\1>>", fr)
        frags.append(fr)
    return " ... ".join(frags)


def test_cover_fragments_randomized_brute():
    """cover_fragments == the naive O(n^2) re-derivation over seeded random
    texts sweeping term counts, fragment counts, window sizes, and the
    degenerate edges (no terms present, single word, adjacent/overlapping
    occurrences, double spaces)."""
    import random

    from discogsography_spark.query.serving import cover_fragments

    rng = random.Random(7)
    vocab = ["alpha", "beta", "tab", "table", "value", "val", "x", "yy", ""]
    for trial in range(300):
        nw = rng.randint(1, 40)
        text = " ".join(rng.choice(vocab) for _ in range(nw))
        terms = rng.sample(["table", "value", "beta", "zzz"], rng.randint(1, 3))
        mf = rng.randint(1, 3)
        mw = rng.choice([1, 4, 8, 12])
        got = cover_fragments(text, terms, max_fragments=mf, max_words=mw)
        want = _brute_cover_fragments(text, terms, mf, mw)
        assert got == want, (trial, text, terms, mf, mw, got, want)
    assert cover_fragments("", ["table"]) == ""
    assert cover_fragments("table value", []) == ""


def test_cover_fragment_headlines_all_services(
    served, sharded_served, merged_served
):
    """fragment_mode='cover' answers identically on single-index, sharded,
    and live merged services, and matches cover_fragments applied to the
    raw text (analyzed query terms)."""
    from discogsography_spark.query.serving import (
        MergedSearchService,
        ShardedSearchService,
        cover_fragments,
    )

    svc, tdf = served
    q = "spark index"
    resp = svc.search(q, 8, highlight_fragments=2, fragment_mode="cover")
    assert resp.results and len(resp.headlines) == len(resp.results)
    terms = sorted(set(q.split()))
    for doc_id, _ in resp.results:
        raw = tdf.loc[tdf["doc_id"] == doc_id, "text"].iloc[0]
        assert resp.headlines[doc_id] == cover_fragments(
            raw, terms, max_fragments=2, max_words=12
        )

    full_idx, shard_dirs = sharded_served
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    a = single.search(q, 8, highlight_fragments=2, fragment_mode="cover")
    b = sharded.search(q, 8, highlight_fragments=2, fragment_mode="cover")
    assert a.headlines == b.headlines and a.headlines

    fresh = SearchService(merged_served["fresh"])
    live = MergedSearchService(merged_served["idx"])
    c = fresh.search(q, 8, highlight_fragments=2, fragment_mode="cover")
    d = live.search(q, 8, highlight_fragments=2, fragment_mode="cover")
    assert c.headlines == d.headlines and c.headlines


def test_sharded_wildcard_bool_response_equals_single_index(sharded_served):
    """Wild nodes (mid/leading wildcards) through the FULL served response:
    the sharded service must compute ONE global expansion (prefix + wild
    leaves in the same expand_patterns round) and answer byte-identically
    to the single-index service — results, counts, facets, headlines."""
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_served
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ["sp*k AND NOT m?rge", "*ndex OR sh*le", "w*dow AND s*ff*"]:
        a = single.search(q, k=10, mode="bool", facets=["role", "tool"],
                          highlight=True)
        b = sharded.search(q, k=10, mode="bool", facets=["role", "tool"],
                           highlight=True)
        assert a.results == b.results, q
        assert a.total_matched == b.total_matched, q
        assert a.facets == b.facets, q
        assert a.headlines == b.headlines, q
    # expanded positive terms get highlighted, not the raw pattern
    resp = single.search("sp*k", k=5, mode="bool", highlight=True)
    assert resp.results == single.searcher.topk_bool("sp*k", 5)
    assert any("<<spark>>" in t for t in resp.headlines.values())
