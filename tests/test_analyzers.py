"""Pluggable analyzer: the 'english' analyzer (snowball stopwords + Porter
stemming) must keep the full rank-identity contract — index build, serving
path, and pure-Python oracle all share the analyzer by name, recorded in the
index manifest. Closes the to_tsvector('english') semantics gap
(/root/reference/schema-init/postgres_schema.py:66-83)."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.analysis import get_analyzer, porter_stem
from discogsography_spark.corpus import make_queries, make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import bm25_topk, build_oracle_index
from discogsography_spark.query.engine import LocalSearcher


def test_english_analyzer_semantics():
    a = get_analyzer("english")
    # plainto_tsquery('english', 'running shoes') matches "run shoe"
    assert a.analyze_query("running shoes") == ["run", "shoe"]
    assert a.analyze_query("The and of") == []  # stopwords drop out
    assert a.tokenize_py("Relational databases are amazing!") == [
        "relat",
        "databas",
        "amaz",
    ]
    # simple analyzer unchanged
    assert get_analyzer("simple").analyze_query("running shoes") == [
        "running",
        "shoes",
    ]


def test_porter_idempotent_on_analyzer_alphabet():
    # digits and short words pass through
    assert porter_stem("42") == "42"
    assert porter_stem("ab") == "ab"
    assert porter_stem("w00123") == "w00123"


@pytest.fixture(scope="module")
def english_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("english_corpus")
    tdf = make_transcripts(n_conversations=150, mean_turns=6, vocab_size=600)
    p = str(d / "transcripts.parquet")
    tdf.to_parquet(p, index=False)
    return {"tdf": tdf, "path": p, "dir": str(d)}


def test_rank_identity_under_english_analyzer(spark, english_corpus):
    idx_dir = os.path.join(english_corpus["dir"], "idx_en")
    builder = IndexBuilder(
        idx_dir, num_segments=4, head_df_threshold=10**9, analyzer="english"
    )
    builder.build(spark.read.parquet(english_corpus["path"]))

    searcher = LocalSearcher(idx_dir)
    assert searcher.meta.analyzer == "english"

    tdf = english_corpus["tdf"]
    oracle = build_oracle_index(
        list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"])), analyzer="english"
    )
    queries = make_queries(tdf, n_queries=20)
    n_nonempty = 0
    for _, q in queries.iterrows():
        expected = bm25_topk(oracle, q["query_text"], int(q["k"]))
        got = searcher.topk(q["query_text"], int(q["k"]))
        assert [d for d, _ in got] == [d for d, _ in expected], q["query_text"]
        for (_, gs), (_, es) in zip(got, expected):
            assert gs == es
        n_nonempty += bool(got)
    assert n_nonempty > 5

    # stemmed retrieval: morphological variants hit the same postings
    base = searcher.topk("merge", 5)
    assert searcher.topk("merged", 5) == base
    assert searcher.topk("merging", 5) == base
