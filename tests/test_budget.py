"""Per-query time budget (statement_timeout) on the serving paths.

The reference caps every heavy query at 120 s
(api/queries/rarity_queries.py:199-204) and sets per-endpoint p95 targets
(tests/perftest/config.yaml:67-74). The engine's analog: a `budget_ms=`
knob on LocalSearcher/MergedSearcher topk* evaluators, the sharded
fan-out (the budget rides the worker RPC as a reserved kwarg), and the
three search services. Contract: exceeded → raise QueryBudgetExceeded
(never a silently truncated page); default None keeps every identity
suite untouched; checks fire at evaluator-entry / block / term / tier
boundaries, so an expired budget aborts within one bounded unit of work.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher, QueryBudgetExceeded

TINY = 1e-7  # expires immediately — every evaluator must notice and raise


@pytest.fixture(scope="module")
def budget_idx(spark, corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("bidx") / "idx")
    IndexBuilder(idx, num_segments=2, with_positions=True).build(
        spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    )
    return idx


def test_local_budget_raises_and_unlimited_is_identical(budget_idx):
    s = LocalSearcher(budget_idx)
    want = {
        "and": s.topk("spark index", 10),
        "or": s.topk("spark index", 10, mode="or"),
        "bool": s.topk_bool("(spark OR index) AND NOT merge", 10),
        "phrase": s.topk_phrase("spark index", 10),
        "within": s.topk_within("spark", "index", 3, 10),
        "prefix": s.topk_prefix("spa ind", 10),
        "wild": s.topk_wildcard("sp*k", 10),
    }
    # a generous budget changes nothing (bit-identical results)
    s2 = LocalSearcher(budget_idx)
    assert s2.topk("spark index", 10, budget_ms=60_000) == want["and"]
    assert (
        s2.topk_bool(
            "(spark OR index) AND NOT merge", 10, budget_ms=60_000
        )
        == want["bool"]
    )
    assert s2.topk_phrase("spark index", 10, budget_ms=60_000) == want["phrase"]
    assert (
        s2.topk_within("spark", "index", 3, 10, budget_ms=60_000)
        == want["within"]
    )
    assert s2.topk_wildcard("sp*k", 10, budget_ms=60_000) == want["wild"]
    # an already-expired budget raises from every mode (cold searcher so
    # no result-memo short-circuit)
    s3 = LocalSearcher(budget_idx)
    for call in (
        lambda: s3.topk("spark index", 10, budget_ms=TINY),
        lambda: s3.topk("spark index", 10, mode="or", budget_ms=TINY),
        lambda: s3.topk_bool(
            "(spark OR index) AND NOT merge", 10, budget_ms=TINY
        ),
        lambda: s3.topk_phrase("spark index", 10, budget_ms=TINY),
        lambda: s3.topk_within("spark", "index", 3, 10, budget_ms=TINY),
        lambda: s3.topk_prefix("spa ind", 10, budget_ms=TINY),
        lambda: s3.topk_wildcard("sp*k", 10, budget_ms=TINY),
    ):
        with pytest.raises(QueryBudgetExceeded):
            call()


def test_budget_failure_never_caches_partial(budget_idx):
    s = LocalSearcher(budget_idx)
    with pytest.raises(QueryBudgetExceeded):
        s.topk("spark index", 10, budget_ms=TINY)
    # the failed query must not have poisoned the result memo
    ref = LocalSearcher(budget_idx).topk("spark index", 10)
    assert s.topk("spark index", 10) == ref


def test_deadline_context_restores(budget_idx):
    s = LocalSearcher(budget_idx)
    with pytest.raises(QueryBudgetExceeded):
        with s.deadline(TINY):
            s.topk("spark index", 10, use_result_cache=False)
    assert s._deadline is None
    assert s.topk("spark index", 5)  # unlimited again


def test_merged_budget(spark, corpus_dir, tmp_path_factory, budget_idx):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        MergedSearcher,
    )

    d = tmp_path_factory.mktemp("bmerged")
    extra = make_transcripts(n_conversations=10, mean_turns=4, vocab_size=100)
    p = str(d / "extra.parquet")
    extra.to_parquet(p, index=False)
    idx = str(d / "idx")
    import shutil

    shutil.copytree(budget_idx, idx)
    DeltaIndexWriter(idx).write_batch(spark.read.parquet(p), 0, upsert=True)
    ms = MergedSearcher(idx)
    want_and = ms.topk("spark index", 10)
    want_bool = ms.topk_bool("(spark OR index) AND NOT merge", 10)
    ms2 = MergedSearcher(idx)
    assert ms2.topk("spark index", 10, budget_ms=60_000) == want_and
    assert (
        ms2.topk_bool("(spark OR index) AND NOT merge", 10, budget_ms=60_000)
        == want_bool
    )
    ms3 = MergedSearcher(idx)
    for call in (
        lambda: ms3.topk("spark index", 10, budget_ms=TINY),
        lambda: ms3.topk_bool("spark OR index", 10, budget_ms=TINY),
        lambda: ms3.topk_phrase("spark index", 10, budget_ms=TINY),
        lambda: ms3.topk_within("spark", "index", 3, 10, budget_ms=TINY),
    ):
        with pytest.raises(QueryBudgetExceeded):
            call()
    assert ms3._deadline is None and ms3.base._deadline is None


def test_sharded_budget_worker_pool(spark, tmp_path_factory):
    """The budget rides the worker-pool RPC; a shard-side expiry comes
    back as QueryBudgetExceeded (not a generic RuntimeError)."""
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.query.sharded import ShardedSearcher

    d = tmp_path_factory.mktemp("bshard")
    tdf = make_transcripts(n_conversations=60, mean_turns=5, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    mid = convs[len(convs) // 2]
    dirs = []
    for i, m in enumerate([tdf["conv_id"] < mid, tdf["conv_id"] >= mid]):
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2, with_positions=True).build(
            spark.read.parquet(p)
        )
        dirs.append(idx)
    for parallel in (False, True):
        sh = ShardedSearcher(dirs, parallel=parallel)
        try:
            want = sh.topk("spark index", 10)
            assert sh.topk("spark index", 10, budget_ms=60_000) == want
            wantb = sh.topk_bool("spark OR index", 10)
            assert (
                sh.topk_bool("spark OR index", 10, budget_ms=60_000) == wantb
            )
            with pytest.raises(QueryBudgetExceeded):
                sh.topk("spark index", 10, budget_ms=TINY)
            with pytest.raises(QueryBudgetExceeded):
                sh.topk_bool("spark OR index", 10, budget_ms=TINY)
            with pytest.raises(QueryBudgetExceeded):
                sh.topk_wildcard("sp*k", 10, budget_ms=TINY)
            # the pool survives a budget abort and serves the next query
            assert sh.topk("spark index", 10) == want
        finally:
            sh.close()


def test_service_budget(budget_idx):
    from discogsography_spark.query.serving import SearchService

    svc = SearchService(budget_idx, facet_defs={"role": "role"})
    ref = svc.search("spark index", 5, facets=["role"])
    got = svc.search("spark index", 5, facets=["role"], budget_ms=60_000)
    assert got.results == ref.results and got.facets == ref.facets
    with pytest.raises(QueryBudgetExceeded):
        svc.search("merge", 5, facets=["role"], budget_ms=TINY)
    # searcher usable after the abort
    assert svc.search("spark index", 5).results == ref.results


def test_grouped_and_significant_budget(budget_idx):
    """Round-7: grouped_topk gained the budget_ms knob and
    significant_terms keeps it through the array path — both follow the
    module contract: exceeded -> QueryBudgetExceeded, never a silently
    truncated aggregate; default None identical to unlimited."""
    from discogsography_spark.query.serving import SearchService

    svc = SearchService(budget_idx, facet_defs={"role": "role"})
    ref_g = svc.grouped_topk("spark index", "role", 5)
    assert svc.grouped_topk("spark index", "role", 5, budget_ms=60_000) == ref_g
    with pytest.raises(QueryBudgetExceeded):
        svc.grouped_topk("merge", "role", 5, budget_ms=TINY)
    ref_s = svc.significant_terms("spark index", k=5, sample=200)
    assert (
        svc.significant_terms("spark index", k=5, sample=200, budget_ms=60_000)
        == ref_s
    )
    with pytest.raises(QueryBudgetExceeded):
        svc.significant_terms("merge", k=5, sample=None, budget_ms=TINY)
    # service usable after the aborts
    assert svc.grouped_topk("spark index", "role", 5) == ref_g
