"""Trigram fuzzy matching (pg_trgm analog): trigram rule, GIN-index
suggestions vs brute force, serving path, DataFrame path."""

from __future__ import annotations

import pytest

from discogsography_spark.query.fuzzy import (
    TrigramVocabIndex,
    char_trigrams,
    fuzzy_term_matches,
    trigram_similarity,
)


def test_trigram_rule_pg_trgm():
    assert char_trigrams("cat") == sorted({"  c", " ca", "cat", "at "})
    assert char_trigrams("") == []
    assert char_trigrams("A") == sorted({"  a", " a "})


def test_similarity_symmetry_and_identity():
    assert trigram_similarity("table", "table") == 1.0
    assert trigram_similarity("table", "tabel") == trigram_similarity(
        "tabel", "table"
    )
    assert trigram_similarity("table", "zzzzz") == 0.0


def _brute(vocab, word, k, min_sim):
    scored = [
        (t, trigram_similarity(word, t))
        for t in sorted(set(vocab))
        if trigram_similarity(word, t) >= min_sim
    ]
    scored.sort(key=lambda ts: (-ts[1], ts[0]))
    return scored[:k]


VOCAB = [
    "table", "tables", "tablet", "tabular", "cable", "label", "stable",
    "spark", "sparse", "sparkle", "parquet", "query", "queries", "quest",
    "merge", "merged", "w00123", "w00124",
]


def test_gin_index_equals_brute_force():
    idx = TrigramVocabIndex(VOCAB)
    for w in ("tabel", "table", "sprak", "querry", "w00125", "zzz"):
        got = idx.suggest(w, k=8, min_sim=0.2)
        want = _brute(VOCAB, w, 8, 0.2)
        assert [(t, round(s, 9)) for t, s in got] == [
            (t, round(s, 9)) for t, s in want
        ], w


def test_searcher_suggest_terms(built_index, oracle_index):
    from discogsography_spark.query.engine import LocalSearcher

    s = LocalSearcher(built_index)
    vocab = list(oracle_index.postings.keys())
    got = s.suggest_terms("spark", k=5, min_sim=0.2)
    want = _brute(vocab, "spark", 5, 0.2)
    assert [(t, round(x, 9)) for t, x in got] == [
        (t, round(x, 9)) for t, x in want
    ]
    assert got and got[0][0] == "spark" and got[0][1] == 1.0


def test_fuzzy_dataframe_matches_brute(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(VOCAB[i::3])) for i in range(3)],
        "doc_id long, text string",
    )
    got = [
        (r["term"], r["similarity"])
        for r in fuzzy_term_matches(docs, "tabel", k=8, min_sim=0.2).collect()
    ]
    want = [(t, round(s, 6)) for t, s in _brute(VOCAB, "tabel", 8, 0.2)]
    assert got == want


def test_sharded_suggest_equals_single(spark, tmp_path_factory):
    import os

    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.query.engine import LocalSearcher
    from discogsography_spark.query.sharded import ShardedSearcher

    d = tmp_path_factory.mktemp("fz")
    tdf = make_transcripts(n_conversations=60, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=2).build(spark.read.parquet(full_p))
    mid = convs[len(convs) // 2]
    shards = []
    for i, m in enumerate([tdf["conv_id"] < mid, tdf["conv_id"] >= mid]):
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
        shards.append(idx)
    single = LocalSearcher(full_idx)
    sharded = ShardedSearcher(shards)
    for w in ("spark", "sprak", "indx", "w0001"):
        assert sharded.suggest_terms(w, k=8, min_sim=0.2) == single.suggest_terms(
            w, k=8, min_sim=0.2
        ), w


def test_topk_fuzzy_rewrites_misspellings(built_index, oracle_index):
    from discogsography_spark.query.engine import LocalSearcher

    s = LocalSearcher(built_index)
    vocab = set(oracle_index.postings.keys())
    assert "spark" in vocab and "sparkz" not in vocab
    want = s.topk("spark index", 10, use_result_cache=False)
    got, rewrites = s.topk_fuzzy("sparkz index", 10)
    assert rewrites == {"sparkz": "spark"}
    assert got == want
    # hopeless garble: no suggestion → AND stays empty, rewrite map empty
    got2, rw2 = s.topk_fuzzy("qqqqxxxx index", 10)
    assert got2 == [] and rw2 == {}
    # clean query passes through untouched
    got3, rw3 = s.topk_fuzzy("spark index", 10)
    assert rw3 == {} and got3 == want
