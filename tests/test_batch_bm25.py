"""Batched multi-query BM25 (one shared plan) must match the pure-Python
oracle per query — same ranks, scores equal at the shared 5-dp rounding."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.oracle import bm25_topk
from discogsography_spark.query.dataframe_bm25 import bm25_batch_dataframe


def test_batch_matches_oracle(spark, corpus_dir, oracle_index):
    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    ordered = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs_pdf = pd.DataFrame(
        {"doc_id": range(len(ordered)), "text": ordered["text"]}
    )
    docs = spark.createDataFrame(docs_pdf)

    queries = [
        ("q0", "spark"),
        ("q1", "spark index"),
        ("q2", "index query table"),
        ("q3", "zz-absent"),
        ("q4", "SPARK!!, Index."),
    ]
    got = (
        bm25_batch_dataframe(docs, queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))

    for qid, qtext in queries:
        # the batch plan orders by ROUNDED score (cross-engine parity rule);
        # re-rank the oracle's candidates the same way before comparing
        wide = bm25_topk(oracle_index, qtext, 200)
        rounded = sorted(
            ((d, round(s, 5)) for d, s in wide), key=lambda x: (-x[1], x[0])
        )[:10]
        assert by_q.get(qid, []) == rounded, f"{qid}: {qtext}"


def test_or_dataframe_matches_python_oracle(spark, corpus_dir, built_index):
    """bm25_or_topk_dataframe ranks identically to the pure-Python OR oracle
    (5dp-rounded scores)."""
    import os

    from discogsography_spark.index.docids import assign_doc_ids
    from discogsography_spark.oracle import bm25_topk_or, build_oracle_index
    from discogsography_spark.query.dataframe_bm25 import bm25_or_topk_dataframe

    import pandas as pd

    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    oracle = build_oracle_index(list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"])))
    docs = assign_doc_ids(
        spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    ).select("doc_id", "text")
    for q in ["spark index", "merge zzqqabsent", "w00001 token turn"]:
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in bm25_or_topk_dataframe(docs, q, k=12).collect()
        ]
        want = [(d, round(s, 5)) for d, s in bm25_topk_or(oracle, q, 12)]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, q


def test_phrase_semantics(spark):
    """Phrase match requires CONSECUTIVE analyzed tokens in order."""
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_phrase_topk_dataframe,
        phrase_match_col,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),       # phrase present
            (1, "beta alpha"),              # wrong order
            (2, "alpha x beta"),            # gap
            (3, "ALPHA, beta!"),            # analyzer normalizes → present
            (4, "alpha"),                   # incomplete
            (5, "x alpha beta"),            # present mid-doc
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in docs.filter(phrase_match_col(["alpha", "beta"])).collect()
    )
    assert got == [0, 3, 5]
    top = bm25_phrase_topk_dataframe(docs, "alpha beta", k=10).collect()
    assert sorted(r["doc_id"] for r in top) == [0, 3, 5]
    # corpus-global stats: doc 1/2/4 terms still count toward df
    assert all(r["score"] > 0 for r in top)
