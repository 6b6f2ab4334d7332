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
