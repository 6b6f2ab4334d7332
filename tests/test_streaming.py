"""Structured Streaming incremental indexing: base build + streamed deltas
must answer queries rank-identically to an oracle over the FULL corpus, and
compaction must fold deltas losslessly."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.corpus import make_queries, make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import bm25_topk, build_oracle_index
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    MergedSearcher,
    compact,
    list_deltas,
)


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_corpus")
    tdf = make_transcripts(n_conversations=200, mean_turns=6, vocab_size=500)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:120])]
    stream = tdf[tdf["conv_id"].isin(convs[120:])]
    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    stream_dir = str(d / "stream_in")
    os.makedirs(stream_dir)
    # three files → three micro-batches (maxFilesPerTrigger=1)
    chunks = [convs[120:150], convs[150:175], convs[175:]]
    for i, cs in enumerate(chunks):
        stream[stream["conv_id"].isin(cs)].to_parquet(
            os.path.join(stream_dir, f"part-{i}.parquet"), index=False
        )
    return {"all": tdf, "base_path": base_p, "stream_dir": stream_dir, "dir": str(d)}


@pytest.fixture(scope="module")
def streamed_index(spark, split_corpus):
    idx_dir = os.path.join(split_corpus["dir"], "idx")
    base_df = spark.read.parquet(split_corpus["base_path"])
    IndexBuilder(idx_dir, num_segments=4, head_df_threshold=10**9).build(base_df)

    writer = DeltaIndexWriter(idx_dir)
    stream = (
        spark.readStream.schema(base_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_corpus["stream_dir"])
    )
    q = (
        stream.writeStream.foreachBatch(writer.write_batch)
        .option(
            "checkpointLocation", os.path.join(split_corpus["dir"], "chk")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return idx_dir


def test_stream_produces_deltas(streamed_index):
    deltas = list_deltas(streamed_index)
    assert len(deltas) == 3


def test_merged_search_rank_identity_vs_full_oracle(streamed_index, split_corpus):
    tdf = split_corpus["all"]
    oracle = build_oracle_index(list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"])))
    queries = make_queries(tdf, n_queries=25)
    searcher = MergedSearcher(streamed_index)
    assert searcher.n_docs == len(tdf)
    for _, q in queries.iterrows():
        expected = bm25_topk(oracle, q["query_text"], int(q["k"]))
        got = searcher.topk(q["query_text"], int(q["k"]))
        assert [d for d, _ in got] == [d for d, _ in expected], q["query_text"]
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == es, f"{q['query_text']}: score {gs!r} != {es!r}"


def test_merged_bool_rank_identity_vs_full_oracle(streamed_index, split_corpus):
    """Boolean AND/OR/NOT over the live base+delta view must equal the
    brute-force oracle over the FULL corpus (pre-compaction)."""
    from collections import Counter

    from discogsography_spark.analysis import get_analyzer
    from discogsography_spark.oracle import bm25_topk_bool

    tdf = split_corpus["all"]
    oracle = build_oracle_index(list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"])))
    an = get_analyzer("simple")
    cnt = Counter(t for text in tdf["text"] for t in set(an.tokenize_py(text)))
    a, b, c, d = [t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]
    searcher = MergedSearcher(streamed_index)
    for q in (
        f"{a} AND ({b} OR {c}) AND NOT {d}",
        f"({a} OR {b}) AND NOT ({c} OR {d})",
        f"{a} OR {c}",
        f"{b} {c} OR {d}",
    ):
        expected = bm25_topk_bool(oracle, q, 12)
        got = searcher.topk_bool(q, 12)
        assert [x[0] for x in got] == [x[0] for x in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == es, f"{q}: score {gs!r} != {es!r}"


def test_batch_idempotence(spark, streamed_index, split_corpus):
    """Re-delivering an already-committed batch_id is a no-op (exactly-once)."""
    writer = DeltaIndexWriter(streamed_index)
    before = len(list_deltas(streamed_index))
    dup = spark.read.parquet(split_corpus["stream_dir"])
    writer.write_batch(dup, 0)  # batch 0 already committed
    assert len(list_deltas(streamed_index)) == before


def test_compact_then_identical_results(spark, streamed_index, split_corpus):
    tdf = split_corpus["all"]
    oracle = build_oracle_index(list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"])))
    queries = make_queries(tdf, n_queries=15)
    n = compact(spark, streamed_index)
    assert n == 3
    assert list_deltas(streamed_index) == []
    searcher = LocalSearcher(streamed_index)  # plain base searcher post-compact
    assert searcher.meta.n_docs == len(tdf)
    for _, q in queries.iterrows():
        expected = bm25_topk(oracle, q["query_text"], int(q["k"]))
        got = searcher.topk(q["query_text"], int(q["k"]))
        assert [d for d, _ in got] == [d for d, _ in expected], q["query_text"]
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == es
    # docmap covers the whole corpus
    docs = spark.read.parquet(os.path.join(streamed_index, "docs"))
    assert docs.count() == len(tdf)


def test_merged_fast_topk_equals_exact_reference(streamed_index, split_corpus):
    """topk() (pruned base leg + exact delta leg, merged) must equal
    topk_exact() (single exact pass over merged lists) bit-for-bit —
    including terms that live ONLY in the base, ONLY in a delta, head
    terms, absent terms, and k larger than the match count."""
    from discogsography_spark.analysis import get_analyzer

    searcher = MergedSearcher(streamed_index)
    tdf = split_corpus["all"]
    an = get_analyzer("simple")

    all_rows = split_corpus["all"]
    base_convs = set(
        pd.read_parquet(split_corpus["base_path"])["conv_id"].unique()
    )
    base_rows = all_rows[all_rows["conv_id"].isin(base_convs)]
    stream_rows = all_rows[~all_rows["conv_id"].isin(base_convs)]
    base_terms = {
        t for text in base_rows["text"] for t in an.tokenize_py(text)
    }
    delta_terms = {
        t for text in stream_rows["text"] for t in an.tokenize_py(text)
    }
    only_base = sorted(base_terms - delta_terms)
    only_delta = sorted(delta_terms - base_terms)
    both = sorted(base_terms & delta_terms)

    queries = [both[0], f"{both[0]} {both[len(both) // 2]}", " ".join(both[:3])]
    if only_base:
        queries += [only_base[0], f"{only_base[0]} {both[0]}"]
    if only_delta:
        queries += [only_delta[0], f"{only_delta[0]} {both[0]}"]
    if only_base and only_delta:
        # conjunction satisfiable on NEITHER side alone → empty (disjoint
        # doc ranges can't host both terms)
        queries.append(f"{only_base[0]} {only_delta[0]}")
    queries += ["zzqqxxnotaterm", f"zzqqxxnotaterm {both[0]}"]

    for q in queries:
        for k in (1, 5, 10**6):
            fast = searcher.topk(q, k)
            ref = searcher.topk_exact(q, k)
            assert fast == ref, (q, k, fast[:3], ref[:3])
