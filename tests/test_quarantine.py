"""Build-path quarantine (DLQ): rows violating the docID contract are
diverted to quarantine/ with a reason instead of poisoning the build, and
the surviving index is identical to a build over only the clean rows."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.corpus import make_queries, make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import bm25_topk, build_oracle_index
from discogsography_spark.query.engine import LocalSearcher


@pytest.fixture(scope="module")
def dirty_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    tdf = make_transcripts(n_conversations=80, mean_turns=5, vocab_size=300)
    bad = pd.DataFrame(
        {
            "conv_id": [None, "conv-x", tdf["conv_id"].iloc[0], tdf["conv_id"].iloc[0]],
            "turn_idx": pd.array([3, None, 9000, 9000], dtype="Int32"),
            "role": ["user"] * 4,
            "text": ["null conv", "null turn", "dup a", "dup b"],
            "tool": [None] * 4,
            "ts": [tdf["ts"].iloc[0]] * 4,
        }
    )
    dirty = pd.concat([tdf, bad], ignore_index=True)
    dirty["ts"] = dirty["ts"].astype("datetime64[us]")  # Spark can't read NANOS
    dirty["turn_idx"] = dirty["turn_idx"].astype("Int32")
    p = str(d / "transcripts.parquet")
    dirty.to_parquet(p, index=False)
    return {"clean": tdf, "path": p, "dir": str(d)}


def test_quarantine_diverts_and_index_matches_clean_build(spark, dirty_corpus):
    idx_dir = os.path.join(dirty_corpus["dir"], "idx")
    builder = IndexBuilder(idx_dir, num_segments=4, head_df_threshold=10**9)
    res = builder.build(spark.read.parquet(dirty_corpus["path"]))

    clean = dirty_corpus["clean"]
    assert res.n_docs == len(clean)
    stats = LocalSearcher(idx_dir).meta.stats
    assert stats["n_quarantined_null_key"] == 2
    assert stats["n_quarantined_dup_key"] == 2

    q = pd.read_parquet(os.path.join(idx_dir, "quarantine"))
    assert sorted(q["_quarantine_reason"].tolist()) == [
        "dup_key",
        "dup_key",
        "null_key",
        "null_key",
    ]
    dup_rows = q[q["_quarantine_reason"] == "dup_key"]
    assert set(dup_rows["turn_idx"].astype(int)) == {9000}
    assert (q["doc_id"] == -1).all()

    # surviving index ranks identically to an oracle over only the clean rows
    oracle = build_oracle_index(
        list(zip(clean["conv_id"], clean["turn_idx"], clean["text"]))
    )
    searcher = LocalSearcher(idx_dir)
    for _, qq in make_queries(clean, n_queries=10).iterrows():
        expected = bm25_topk(oracle, qq["query_text"], int(qq["k"]))
        got = searcher.topk(qq["query_text"], int(qq["k"]))
        assert [d for d, _ in got] == [d for d, _ in expected]
        for (_, gs), (_, es) in zip(got, expected):
            assert gs == es


def test_quarantine_empty_on_clean_corpus(spark, dirty_corpus, tmp_path):
    idx_dir = str(tmp_path / "idx_clean")
    clean = dirty_corpus["clean"]
    p = str(tmp_path / "clean.parquet")
    clean.to_parquet(p, index=False)
    builder = IndexBuilder(idx_dir, num_segments=4, head_df_threshold=10**9)
    builder.build(spark.read.parquet(p))
    stats = LocalSearcher(idx_dir).meta.stats
    assert stats["n_quarantined_null_key"] == 0
    assert stats["n_quarantined_dup_key"] == 0
