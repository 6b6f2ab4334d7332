"""Synonym-aware BM25 (Lucene SynonymQuery / PG synonym-dictionary
semantics): engine vs pure-Python oracle vs DataFrame mirror."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.oracle import bm25_topk, bm25_topk_synonym
from discogsography_spark.query.engine import LocalSearcher

CASES = [
    ("turn spark", {"spark": ["stream", "batch"]}),
    ("merge", {"merge": ["join"]}),
    ("index query", {"index": ["table"], "query": ["scan", "filter"]}),
    # overlapping member across two groups
    ("spark stream", {"spark": ["batch"], "stream": ["batch"]}),
    # synonym absent from the vocabulary — group falls back to the term
    ("merge", {"merge": ["zzzqqqxxx"]}),
]


@pytest.mark.parametrize("qtext,syn", CASES)
def test_engine_matches_oracle(built_index, oracle_index, qtext, syn):
    s = LocalSearcher(built_index)
    got = s.topk_synonym(qtext, 10, syn)
    want = bm25_topk_synonym(oracle_index, qtext, 10, syn)
    assert got == want  # bit-identical scores, identical ranking


def test_no_synonyms_equals_plain_topk(built_index, oracle_index):
    s = LocalSearcher(built_index)
    for q in ["merge", "turn spark", "index query"]:
        assert s.topk_synonym(q, 10, {}) == s.topk(q, 10)
        assert bm25_topk_synonym(oracle_index, q, 10, {}) == bm25_topk(
            oracle_index, q, 10
        )


def test_absent_group_is_empty(built_index):
    s = LocalSearcher(built_index)
    assert s.topk_synonym("zzqqxx merge", 10, {}) == []
    assert s.topk_synonym("zzqqxx merge", 10, {"zzqqxx": ["yyzzqq"]}) == []
    # ...but a synonym can rescue an absent term (the dictionary's point)
    rescued = s.topk_synonym("zzqqxx merge", 10, {"zzqqxx": ["spark"]})
    assert rescued == s.topk_synonym("spark merge", 10, {})


def test_synonym_group_df_is_max_not_union(built_index, oracle_index):
    # union-df would lower idf below every member idf; max keeps it at the
    # most common member's level — verify scores differ from a union-df
    # computation by checking against the oracle (which implements max).
    s = LocalSearcher(built_index)
    got = s.topk_synonym("turn", 5, {"turn": ["spark", "merge"]})
    want = bm25_topk_synonym(
        oracle_index, "turn", 5, {"turn": ["spark", "merge"]}
    )
    assert got == want and got


def test_dataframe_mirror_identity(spark, built_index, oracle_index, corpus_dir):
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_synonym_topk_dataframe,
    )

    docs = (
        spark.read.parquet(os.path.join(built_index, "docs"))
        .select("doc_id", "conv_id", "turn_idx")
        .join(
            spark.read.parquet(
                os.path.join(corpus_dir, "transcripts.parquet")
            ),
            ["conv_id", "turn_idx"],
        )
        .select("doc_id", "text")
    )
    syn = {"spark": ["stream"], "turn": ["merge"]}
    rows = bm25_synonym_topk_dataframe(docs, "turn spark", syn, k=10).collect()
    want = bm25_topk_synonym(oracle_index, "turn spark", 10, syn)
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (d, round(sc, 5)) for d, sc in want
    ]


def test_budget_applies(built_index):
    from discogsography_spark.query.engine import QueryBudgetExceeded

    s = LocalSearcher(built_index)
    with pytest.raises(QueryBudgetExceeded):
        s.topk_synonym(
            "turn spark", 10, {"spark": ["stream"]}, budget_ms=0.0
        )


def test_sharded_synonym_bit_identical(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.query.sharded import ShardedSearcher

    d = tmp_path_factory.mktemp("syn_sharded")
    tdf = make_transcripts(n_conversations=120, mean_turns=6, vocab_size=400)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=4, head_df_threshold=300).build(
        spark.read.parquet(full_p)
    )
    shard_dirs = []
    bounds = [convs[i * len(convs) // 3] for i in range(1, 3)]
    for i, (lo, hi) in enumerate(zip([None, *bounds], [*bounds, None])):
        m = tdf["conv_id"].map(
            lambda c: (lo is None or c >= lo) and (hi is None or c < hi)
        )
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)

    full = LocalSearcher(full_idx)
    sharded = ShardedSearcher(shard_dirs, parallel=False)
    cases = [
        ("turn spark", {"spark": ["stream", "batch"]}),
        ("merge", {"merge": ["join", "zzqqneverseen"]}),
        ("index query", {"index": ["table"], "query": ["scan", "filter"]}),
        ("zzqqxx merge", {"zzqqxx": ["spark"]}),   # synonym rescue
        ("zzqqxx merge", {}),                       # absent group → []
    ]
    n_nonempty = 0
    for q, syn in cases:
        want = full.topk_synonym(q, 10, syn)
        got = sharded.topk_synonym(q, 10, syn)
        assert [x[0] for x in got] == [x[0] for x in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == ws, f"{q}: {gs!r} != {ws!r} (bit-identical)"
        n_nonempty += bool(got)
    assert n_nonempty >= 3


def test_merged_live_synonym_matches_alive_rebuild(spark, tmp_path_factory):
    """Live view (upserts + tombstones) topk_synonym ≡ a fresh rebuild of
    the alive corpus — key-set AND score equality (same (conv, turn) docs,
    same BM25 numbers under alive stats)."""
    import pandas as pd

    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        MergedSearcher,
    )

    d = tmp_path_factory.mktemp("syn_live")
    tdf = make_transcripts(n_conversations=80, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:60])].reset_index(drop=True)
    batch = tdf[tdf["conv_id"].isin(convs[60:75])].reset_index(drop=True)
    dead = convs[:5]

    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=4, head_df_threshold=10**9).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    b_p = str(d / "b.parquet")
    batch.to_parquet(b_p, index=False)
    w.write_batch(spark.read.parquet(b_p), 0, upsert=True)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": dead})), 1
    )

    alive = pd.concat(
        [base[~base["conv_id"].isin(dead)], batch], ignore_index=True
    )
    ref_p = str(d / "alive.parquet")
    alive.to_parquet(ref_p, index=False)
    ref_idx = str(d / "ref_idx")
    IndexBuilder(ref_idx, num_segments=4, head_df_threshold=10**9).build(
        spark.read.parquet(ref_p)
    )

    ms = MergedSearcher(idx)
    ref = LocalSearcher(ref_idx)

    from discogsography_spark.streaming.incremental import list_deltas

    def keymap(index_dir):
        parts = [os.path.join(index_dir, "docs")]
        for dd in list_deltas(index_dir):
            p = os.path.join(dd, "docs")
            if os.path.isdir(p):
                parts.append(p)
        t = pd.concat(
            [
                pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"])
                for p in parts
            ],
            ignore_index=True,
        )
        return dict(
            zip(t["doc_id"], zip(t["conv_id"], t["turn_idx"].astype(int)))
        )

    ref_keys = keymap(ref_idx)
    live_keys = keymap(idx)

    cases = [
        ("turn spark", {"spark": ["stream", "batch"]}),
        ("merge", {"merge": ["join"]}),
        ("index query", {"index": ["table"], "query": ["scan"]}),
    ]
    n_nonempty = 0
    for q, syn in cases:
        got = ms.topk_synonym(q, 200, syn)
        want = ref.topk_synonym(q, 200, syn, use_result_cache=False)
        assert {(live_keys[did], round(s, 9)) for did, s in got} == {
            (ref_keys[did], round(s, 9)) for did, s in want
        }, q
        n_nonempty += bool(got)
    assert n_nonempty >= 2
