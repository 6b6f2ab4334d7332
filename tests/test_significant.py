"""Matched-set aggregations: metric stats (search(stats_fields=)) and
significant-terms (JLH) — served paths vs brute-force pandas, identical
across the single, sharded, and live merged services."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.serving import SearchService, _jlh_rows


@pytest.fixture(scope="module")
def served(spark, corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sigidx") / "idx")
    transcripts = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    )
    IndexBuilder(idx, num_segments=4, store_text=True).build(transcripts)
    svc = SearchService(idx, facet_defs={"role": "role"})
    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    tdf = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tdf["doc_id"] = range(len(tdf))
    return svc, tdf


def _matched(tdf, terms, mode="and"):
    from discogsography_spark.analysis import tokenize_py

    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    pred = all if mode == "and" else any
    return tdf[toks.map(lambda s: pred(t in s for t in terms))]


def test_field_stats_matches_pandas(served):
    svc, tdf = served
    resp = svc.search("spark index", k=5, stats_fields=["turn_idx"])
    exp = _matched(tdf, ["index", "spark"])["turn_idx"].astype(float)
    st = resp.stats["turn_idx"]
    assert st["count"] == len(exp)
    assert st["min"] == exp.min() and st["max"] == exp.max()
    assert st["sum"] == pytest.approx(exp.sum(), rel=1e-12)
    assert st["avg"] == pytest.approx(exp.mean(), rel=1e-12)


def test_field_stats_empty_and_drilldown(served):
    svc, tdf = served
    resp = svc.search("zzqqneverseen", k=5, stats_fields=["turn_idx"])
    assert resp.stats["turn_idx"] == {
        "count": 0, "min": None, "max": None, "sum": 0.0, "avg": None
    }
    filt = svc.search(
        "spark index", k=5, filter={"role": "user"},
        stats_fields=["turn_idx"],
    )
    exp = _matched(tdf, ["index", "spark"])
    exp = exp[exp["role"] == "user"]["turn_idx"].astype(float)
    assert filt.stats["turn_idx"]["count"] == len(exp)
    assert filt.stats["turn_idx"]["sum"] == pytest.approx(exp.sum())


def test_field_stats_synonym_branch(served):
    svc, tdf = served
    syn = {"spark": ["stream"]}
    resp = svc.search(
        "turn spark", k=5, synonyms=syn, stats_fields=["turn_idx"]
    )
    from discogsography_spark.analysis import tokenize_py

    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    m = toks.map(lambda s: bool(s & {"turn"}) and bool(s & {"spark", "stream"}))
    exp = tdf[m]["turn_idx"].astype(float)
    assert resp.stats["turn_idx"]["count"] == len(exp)
    assert resp.stats["turn_idx"]["avg"] == pytest.approx(exp.mean())


def _brute_significant(tdf, terms, k, min_doc_count=3, mode="and"):
    from discogsography_spark.analysis import tokenize_py

    doc_sets = tdf["text"].map(lambda t: set(tokenize_py(t)))
    pred = all if mode == "and" else any
    m = doc_sets.map(lambda s: pred(t in s for t in terms))
    fg_sets, n_matched, n_docs = doc_sets[m], int(m.sum()), len(tdf)
    fg: dict[str, int] = {}
    for s in fg_sets:
        for t in s:
            fg[t] = fg.get(t, 0) + 1
    bg: dict[str, int] = {}
    for s in doc_sets:
        for t in s:
            bg[t] = bg.get(t, 0) + 1
    return _jlh_rows(fg, bg, n_matched, n_docs, set(terms), min_doc_count, k)


def test_significant_terms_matches_brute(served):
    svc, tdf = served
    got = svc.significant_terms("spark index", k=10, sample=None)
    want = _brute_significant(tdf, ["index", "spark"], 10)
    assert got and [
        (t, fg, bgc) for t, fg, bgc, _ in got
    ] == [(t, fg, bgc) for t, fg, bgc, _ in want]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_significant_terms_sampling_keeps_stats_exact(served):
    """Sampling bounds candidate DISCOVERY only — every reported fg/bg is
    still the exact count, so sampled results are a subset-ranking of the
    exhaustive ones with identical per-term numbers."""
    svc, tdf = served
    full = {t: (fg, bgc, s) for t, fg, bgc, s in
            svc.significant_terms("spark index", k=10**6, sample=None)}
    sampled = svc.significant_terms("spark index", k=10**6, sample=5)
    assert sampled
    for t, fg, bgc, s in sampled:
        assert full[t] == (fg, bgc, s)


def test_significant_terms_empty_query(served):
    svc, _ = served
    assert svc.significant_terms("zzqqneverseen", k=5) == []


@pytest.fixture(scope="module")
def sharded_pair(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts

    d = tmp_path_factory.mktemp("sigsh")
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


def test_sharded_stats_and_significant_equal_single(sharded_pair):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_pair
    defs = {"role": "role"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ["spark index", "merge"]:
        a = single.search(q, k=5, stats_fields=["turn_idx"])
        b = sharded.search(q, k=5, stats_fields=["turn_idx"])
        sa, sb = a.stats["turn_idx"], b.stats["turn_idx"]
        assert sa["count"] == sb["count"]
        assert sa["min"] == sb["min"] and sa["max"] == sb["max"]
        assert sb["sum"] == pytest.approx(sa["sum"], rel=1e-12)
        assert sb["avg"] == pytest.approx(sa["avg"], rel=1e-12)
        ga = single.significant_terms(q, k=10, sample=None)
        gb = sharded.significant_terms(q, k=10, sample_per_shard=None)
        assert [(t, fg, bgc) for t, fg, bgc, _ in ga] == [
            (t, fg, bgc) for t, fg, bgc, _ in gb
        ], q
        for (_, _, _, x), (_, _, _, y) in zip(ga, gb):
            assert y == pytest.approx(x, rel=1e-12)


def test_merged_stats_and_significant_equal_fresh(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("sigmrg")
    tdf = make_transcripts(n_conversations=80, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base_p = str(d / "base.parquet")
    tdf[tdf["conv_id"].isin(convs[:40])].to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    p = str(d / "c0.parquet")
    tdf[tdf["conv_id"].isin(convs[40:])].to_parquet(p, index=False)
    w.write_batch(spark.read.parquet(p), 0)
    fresh_p = str(d / "union.parquet")
    tdf.to_parquet(fresh_p, index=False)
    fresh_idx = str(d / "fresh")
    IndexBuilder(fresh_idx, num_segments=2, store_text=True).build(
        spark.read.parquet(fresh_p)
    )
    fresh = SearchService(fresh_idx, facet_defs={"role": "role"})
    live = MergedSearchService(idx, facet_defs={"role": "role"})
    for q in ["spark index", "merge"]:
        a = fresh.search(q, k=5, stats_fields=["turn_idx"])
        b = live.search(q, k=5, stats_fields=["turn_idx"])
        assert a.stats["turn_idx"]["count"] == b.stats["turn_idx"]["count"]
        assert b.stats["turn_idx"]["sum"] == pytest.approx(
            a.stats["turn_idx"]["sum"], rel=1e-12
        )
        ga = fresh.significant_terms(q, k=10, sample=None)
        gb = live.significant_terms(q, k=10, sample=None)
        assert [(t, fg, bgc) for t, fg, bgc, _ in ga] == [
            (t, fg, bgc) for t, fg, bgc, _ in gb
        ], q


def test_numeric_histogram_matches_pandas(served):
    svc, tdf = served
    matched = svc.matched_docs("spark index")
    got = svc.numeric_histogram(matched, "turn_idx", 5.0)
    exp = _matched(tdf, ["index", "spark"])["turn_idx"].astype(float)
    want = (
        (np.floor(exp / 5.0) * 5.0).groupby(np.floor(exp / 5.0) * 5.0)
        .size().to_dict()
    )
    assert dict(got) == want
    assert [b for b, _ in got] == sorted(b for b, _ in got)
    with pytest.raises(ValueError):
        svc.numeric_histogram(matched, "turn_idx", 0)
    assert svc.numeric_histogram(matched[:0], "turn_idx", 5.0) == []


def test_numeric_histogram_sharded_and_merged(sharded_pair):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_pair
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    for q in ["spark index", "merge"]:
        m = single.matched_docs(q)
        want = single.numeric_histogram(m, "turn_idx", 4.0)
        per = [svc.matched_docs(q) for svc in sharded.services]
        got = sharded.numeric_histogram(per, "turn_idx", 4.0)
        assert got == want, q


def test_percentiles_and_cardinality_match_pandas(served):
    svc, tdf = served
    matched = svc.matched_docs("spark index")
    got = svc.field_percentiles(matched, "turn_idx")
    exp = _matched(tdf, ["index", "spark"])["turn_idx"].astype(float)
    for q in (25.0, 50.0, 75.0, 95.0):
        assert got[q] == pytest.approx(np.percentile(exp, q), rel=1e-12)
    assert svc.field_cardinality(matched, "turn_idx") == exp.nunique()
    assert svc.field_percentiles(matched[:0], "turn_idx") == {}
    assert svc.field_cardinality(matched[:0], "turn_idx") == 0


def test_percentiles_cardinality_sharded_equal_single(sharded_pair):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_pair
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    for q in ["spark index", "merge"]:
        m = single.matched_docs(q)
        per = [svc.matched_docs(q) for svc in sharded.services]
        want = single.field_percentiles(m, "turn_idx")
        got = sharded.field_percentiles(per, "turn_idx")
        assert set(got) == set(want)
        for k_ in want:
            assert got[k_] == pytest.approx(want[k_], rel=1e-12), q
        assert sharded.field_cardinality(per, "turn_idx") == (
            single.field_cardinality(m, "turn_idx")
        ), q


def test_significant_terms_budget(served):
    from discogsography_spark.query.engine import QueryBudgetExceeded

    svc, _ = served
    with pytest.raises(QueryBudgetExceeded):
        svc.significant_terms("spark index", k=10, budget_ms=0.0)
    # default unlimited unchanged
    assert svc.significant_terms("spark index", k=5)


def test_grouped_topk_matches_pandas(served):
    svc, tdf = served
    rows = svc.grouped_topk("spark index", "role", 10)
    assert rows
    # group membership + counts from the brute matched scan
    exp = _matched(tdf, ["index", "spark"])
    want_counts = exp.groupby("role").size().to_dict()
    assert {r[0]: r[4] for r in rows} == want_counts
    # aggregates agree with aggregating the service's own full ranking
    full = dict(svc.search("spark index", k=10**6).results)
    by_group: dict[str, list[float]] = {}
    for _, doc in exp.iterrows():
        by_group.setdefault(doc["role"], []).append(full[doc["doc_id"]])
    for label, s_, avg, mx, n in rows:
        vals = by_group[label]
        assert s_ == pytest.approx(sum(vals), rel=1e-9)
        assert avg == pytest.approx(sum(vals) / len(vals), rel=1e-9)
        assert mx == pytest.approx(max(vals), rel=1e-12)
        assert n == len(vals)
    # ordering: (sum DESC, label ASC)
    sums = [r[1] for r in rows]
    assert sums == sorted(sums, reverse=True)


def test_grouped_topk_sharded_equal_single(sharded_pair):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_pair
    single = SearchService(full_idx)
    sharded = ShardedSearchService(shard_dirs)
    for q in ["spark index", "merge"]:
        a = single.grouped_topk(q, "conv_id", 15)
        b = sharded.grouped_topk(q, "conv_id", 15)
        assert [(r[0], r[4]) for r in a] == [(r[0], r[4]) for r in b], q
        for ra, rb in zip(a, b):
            for i in (1, 2, 3):
                assert rb[i] == pytest.approx(ra[i], rel=1e-9), q


def test_grouped_topk_merged_equals_fresh(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("grpmrg")
    tdf = make_transcripts(n_conversations=60, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base_p = str(d / "base.parquet")
    tdf[tdf["conv_id"].isin(convs[:30])].to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    p = str(d / "c0.parquet")
    tdf[tdf["conv_id"].isin(convs[30:])].to_parquet(p, index=False)
    w.write_batch(spark.read.parquet(p), 0)
    fresh_p = str(d / "union.parquet")
    tdf.to_parquet(fresh_p, index=False)
    fresh_idx = str(d / "fresh")
    IndexBuilder(fresh_idx, num_segments=2, store_text=True).build(
        spark.read.parquet(fresh_p)
    )
    fresh = SearchService(fresh_idx)
    live = MergedSearchService(idx)
    for q in ["spark index", "merge"]:
        a = fresh.grouped_topk(q, "role", 10)
        b = live.grouped_topk(q, "role", 10)
        assert [(r[0], r[4]) for r in a] == [(r[0], r[4]) for r in b], q
        for ra, rb in zip(a, b):
            for i in (1, 2, 3):
                assert rb[i] == pytest.approx(ra[i], rel=1e-9), q


def test_range_filter_drilldown(served):
    svc, tdf = served
    full = svc.search("spark index", k=10**6)
    full_scores = dict(full.results)
    resp = svc.search("spark index", k=10,
                      filter={"turn_idx": (2.0, 6.0)}, facets=["role"])
    exp = _matched(tdf, ["index", "spark"])
    exp = exp[(exp["turn_idx"] >= 2) & (exp["turn_idx"] <= 6)]
    assert resp.total_matched == len(exp) > 0
    for doc, score in resp.results:  # drill-down never changes scores
        assert score == full_scores[doc]
    assert dict(resp.facets["role"]) == exp.groupby("role").size().to_dict()
    # open bounds + combined categorical+range filters
    lo_only = svc.search("spark index", k=5, filter={"turn_idx": (4.0, None)})
    assert lo_only.total_matched == len(
        _matched(tdf, ["index", "spark"]).query("turn_idx >= 4")
    )
    both = svc.search("spark index", k=5,
                      filter={"role": "user", "turn_idx": (2.0, 6.0)})
    assert both.total_matched == len(exp[exp["role"] == "user"])


def test_range_filter_sharded_and_synonym(sharded_pair):
    from discogsography_spark.query.serving import ShardedSearchService

    full_idx, shard_dirs = sharded_pair
    defs = {"role": "role"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    for q in ["spark index", "merge"]:
        a = single.search(q, k=10, filter={"turn_idx": (1.0, 7.0)})
        b = sharded.search(q, k=10, filter={"turn_idx": (1.0, 7.0)})
        assert a.results == b.results, q
        assert a.total_matched == b.total_matched, q
        sa = single.search(q, k=10, synonyms={"merge": ["join"]},
                           filter={"turn_idx": (1.0, 7.0)})
        sb = sharded.search(q, k=10, synonyms={"merge": ["join"]},
                            filter={"turn_idx": (1.0, 7.0)})
        assert sa.results == sb.results, q
        assert sa.total_matched == sb.total_matched, q
