"""Request-body API (query/dsl.py): one JSON-able dict drives the whole
served surface; every branch must agree exactly with the direct calls."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.dsl import run_request
from discogsography_spark.query.serving import SearchService


@pytest.fixture(scope="module")
def served(spark, corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dslidx") / "idx")
    transcripts = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    )
    IndexBuilder(idx, num_segments=4, store_text=True).build(transcripts)
    return SearchService(idx, facet_defs={"role": "role", "tool": "tool"})


def test_basic_request_matches_direct(served):
    out = run_request(served, {"query": "spark index", "k": 5})
    want = served.search("spark index", 5)
    assert [(h["doc_id"], h["score"]) for h in out["hits"]] == want.results
    assert out["total"] == want.total_matched
    assert out["next_after"] == list(want.next_after)
    assert out["took_ms"] >= 0


def test_filter_highlight_pagination(served):
    body = {
        "query": "spark index", "k": 3, "offset": 2,
        "filter": {"role": "user", "turn_idx": {"gte": 1, "lte": 8}},
        "highlight": {"fragments": 2, "mode": "cover"},
    }
    out = run_request(served, body)
    want = served.search(
        "spark index", 3, offset=2,
        filter={"role": "user", "turn_idx": (1, 8)},
        highlight_fragments=2, fragment_mode="cover",
    )
    assert [(h["doc_id"], h["score"]) for h in out["hits"]] == want.results
    assert out["total"] == want.total_matched
    assert out["headlines"] == {str(d): h for d, h in want.headlines.items()}
    # cursor page equals the direct search_after call
    p1 = run_request(served, {"query": "spark index", "k": 3})
    p2 = run_request(
        served, {"query": "spark index", "k": 3,
                 "search_after": p1["next_after"]}
    )
    want2 = served.search(
        "spark index", 3, search_after=tuple(p1["next_after"])
    )
    assert [(h["doc_id"], h["score"]) for h in p2["hits"]] == want2.results


def test_synonyms_and_fuzzy(served):
    out = run_request(
        served,
        {"query": "turn spark", "k": 5, "synonyms": {"spark": ["stream"]}},
    )
    want = served.search("turn spark", 5, synonyms={"spark": ["stream"]})
    assert [(h["doc_id"], h["score"]) for h in out["hits"]] == want.results
    assert out["total"] == want.total_matched
    fz = run_request(served, {"query": "sparkz index", "k": 5, "fuzzy": True})
    wz = served.search("sparkz index", 5, fuzzy=True)
    assert fz.get("rewrites", {}) == wz.rewrites


def test_aggregations_match_direct(served):
    body = {
        "query": "spark index",
        "k": 3,
        "aggs": {
            "roles": {"terms": {"field": "role"}},
            "len": {"stats": {"field": "turn_idx"}},
            "hist": {"histogram": {"field": "turn_idx", "interval": 5}},
            "pct": {"percentiles": {"field": "turn_idx"}},
            "card": {"cardinality": {"field": "turn_idx"}},
            "sig": {"significant_terms": {"k": 5, "sample": None}},
            "by_role": {"grouped": {"field": "role", "k": 5}},
        },
    }
    out = run_request(served, body)
    m = served.matched_docs("spark index")
    ag = out["aggregations"]
    assert ag["roles"] == served.facet_counts(m, ["role"])["role"]
    assert ag["len"] == served.field_stats(m, ["turn_idx"])["turn_idx"]
    assert ag["hist"] == served.numeric_histogram(m, "turn_idx", 5.0)
    assert ag["pct"] == {
        str(q): v for q, v in served.field_percentiles(m, "turn_idx").items()
    }
    assert ag["card"] == served.field_cardinality(m, "turn_idx")
    assert [r["term"] for r in ag["sig"]] == [
        t for t, *_ in served.significant_terms("spark index", k=5, sample=None)
    ]
    assert [(r["group"], r["n_matched"]) for r in ag["by_role"]] == [
        (g, n) for g, _s, _a, _x, n in served.grouped_topk(
            "spark index", "role", 5
        )
    ]


def test_boosted_request(served):
    out = run_request(served, {"query": "turn spark^2", "k": 5})
    want = served.searcher.topk_boosted("turn spark^2", 5)
    assert [(h["doc_id"], h["score"]) for h in out["hits"]] == want
    assert out["total"] == served.search("turn spark", 5).total_matched
    # boosted + range drill-down: exact filtered page, scores unchanged
    fb = run_request(
        served,
        {"query": "turn spark^2", "k": 5,
         "filter": {"turn_idx": {"gte": 2, "lte": 6}}},
    )
    full = dict(served.searcher.topk_boosted("turn spark^2", 2**31))
    for h in fb["hits"]:
        assert h["score"] == full[h["doc_id"]]
    with pytest.raises(ValueError):
        run_request(served, {"query": "spark^2", "mode": "bool"})


def test_unknown_keys_raise(served):
    with pytest.raises(ValueError):
        run_request(served, {"query": "x", "quury": 1})
    with pytest.raises(ValueError):
        run_request(
            served, {"query": "x", "aggs": {"a": {"nope": {}}}}
        )
    with pytest.raises(ValueError):
        run_request(
            served,
            {"query": "x", "filter": {"turn_idx": {"gte": 1, "max": 2}}},
        )


def test_sharded_request_matches_single(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.query.serving import ShardedSearchService

    d = tmp_path_factory.mktemp("dslsh")
    tdf = make_transcripts(n_conversations=80, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=2, store_text=True).build(
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
    single = SearchService(full_idx, facet_defs={"role": "role"})
    sharded = ShardedSearchService(shard_dirs, facet_defs={"role": "role"})
    try:
        body = {
            "query": "spark index", "k": 5,
            "aggs": {
                "roles": {"terms": {"field": "role"}},
                "len": {"stats": {"field": "turn_idx"}},
                "hist": {"histogram": {"field": "turn_idx", "interval": 4}},
                "card": {"cardinality": {"field": "turn_idx"}},
            },
        }
        a = run_request(single, body)
        b = run_request(sharded, body)
        assert a["hits"] == b["hits"]
        assert a["total"] == b["total"]
        assert a["aggregations"]["roles"] == b["aggregations"]["roles"]
        assert a["aggregations"]["hist"] == b["aggregations"]["hist"]
        assert a["aggregations"]["card"] == b["aggregations"]["card"]
        sa, sb = a["aggregations"]["len"], b["aggregations"]["len"]
        assert sa["count"] == sb["count"]
        assert sb["sum"] == pytest.approx(sa["sum"], rel=1e-12)
        # boosted through the fan-out
        ba = run_request(single, {"query": "spark^3 index", "k": 5})
        bb = run_request(sharded, {"query": "spark^3 index", "k": 5})
        assert ba["hits"] == bb["hits"] and ba["total"] == bb["total"]
    finally:
        sharded.close()


def test_cli_request_roundtrip(spark, corpus_dir, tmp_path_factory):
    import json as _json
    import subprocess
    import sys as _sys

    idx = str(tmp_path_factory.mktemp("dslcli") / "idx")
    transcripts = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    )
    IndexBuilder(idx, num_segments=2, store_text=True).build(transcripts)
    body = _json.dumps({
        "query": "spark index", "k": 3,
        "aggs": {"roles": {"terms": {"field": "role"}}},
    })
    out = subprocess.run(
        [_sys.executable, "-m", "discogsography_spark.cli",
         "request", idx, body, "--facets", "role"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    got = _json.loads(out.stdout)
    svc = SearchService(idx, facet_defs={"role": "role"})
    want = run_request(svc, _json.loads(body))
    assert got["hits"] == want["hits"]
    assert got["total"] == want["total"]
    assert [tuple(x) for x in got["aggregations"]["roles"]] == [
        tuple(x) for x in want["aggregations"]["roles"]
    ]


def test_synonym_aggs_use_group_matched_set(served):
    body = {
        "query": "turn spark", "k": 3,
        "synonyms": {"spark": ["stream"]},
        "aggs": {"roles": {"terms": {"field": "role"}},
                 "len": {"stats": {"field": "turn_idx"}}},
    }
    out = run_request(served, body)
    from discogsography_spark.query.serving import _synonym_groups

    groups = _synonym_groups(
        served._an, "turn spark", {"spark": ["stream"]}
    )
    m = served.matched_docs_synonym(groups)
    assert out["total"] == int(m.size)
    assert out["aggregations"]["roles"] == (
        served.facet_counts(m, ["role"])["role"]
    )
    assert out["aggregations"]["len"] == (
        served.field_stats(m, ["turn_idx"])["turn_idx"]
    )


def test_top_hits_agg(served):
    out = run_request(
        served,
        {"query": "spark index", "k": 2,
         "aggs": {"best": {"top_hits": {"field": "role", "k": 3}}}},
    )
    want = served.collapse("spark index", "role", 3)
    assert out["aggregations"]["best"] == [
        {"group": g, "doc_id": int(d), "score": float(s),
         "group_matched": int(c)}
        for g, d, s, c in want
    ]


def test_merged_request_matches_fresh(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("dslmrg")
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
    body = {
        "query": "spark index", "k": 5,
        "aggs": {"roles": {"terms": {"field": "role"}},
                 "hist": {"histogram": {"field": "turn_idx", "interval": 4}},
                 "best": {"top_hits": {"field": "role", "k": 2}}},
    }
    a = run_request(
        SearchService(fresh_idx, facet_defs={"role": "role"}), body
    )
    b = run_request(
        MergedSearchService(idx, facet_defs={"role": "role"}), body
    )
    assert a["hits"] == b["hits"] and a["total"] == b["total"]
    assert a["aggregations"] == b["aggregations"]
