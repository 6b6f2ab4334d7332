"""Adversarial tie stress for the champion-seeded block-max AND path: when
hundreds of docs share EXACTLY the kth score, pruning must keep every tie
candidate (skip only on strict ub < θ) and the (score DESC, doc_id ASC)
tiebreak must match the exhaustive oracle at every k across the boundary."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import bm25_topk, bm25_topk_or, build_oracle_index
from discogsography_spark.query.engine import LocalSearcher


@pytest.fixture(scope="module")
def tie_index(spark, tmp_path_factory):
    """300 byte-identical two-term docs (exact score ties), 150 single-term
    docs, plus filler docs of assorted lengths — ties dominate the top-k
    boundary for 'alpha beta' at any k ≤ 300."""
    d = tmp_path_factory.mktemp("ties")
    rows = []
    ts = pd.Timestamp("2024-01-01")
    for i in range(300):
        rows.append((f"conv-{i:05d}", 0, "user", "alpha beta", None, ts))
    for i in range(300, 450):
        rows.append((f"conv-{i:05d}", 0, "user", "alpha only here", None, ts))
    rng = np.random.default_rng(3)
    for i in range(450, 700):
        filler = " ".join(f"w{int(x):03d}" for x in rng.integers(0, 50, rng.integers(2, 30)))
        rows.append((f"conv-{i:05d}", 0, "user", f"alpha beta {filler}", None, ts))
    tdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    tdf["ts"] = tdf["ts"].astype("datetime64[us]")
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    # tiny block size multiplies the number of block-boundary decisions
    IndexBuilder(idx, num_segments=4, block_size=16, head_df_threshold=10**9).build(
        spark.read.parquet(p)
    )
    oracle = build_oracle_index(list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"])))
    return {"idx": idx, "oracle": oracle}


def test_and_exact_across_tie_boundary(tie_index):
    s = LocalSearcher(tie_index["idx"])
    for k in [1, 5, 99, 100, 101, 250, 299, 300, 301, 500, 10_000]:
        want = bm25_topk(tie_index["oracle"], "alpha beta", k)
        got = s.topk("alpha beta", k, use_result_cache=False)
        assert [d for d, _ in got] == [d for d, _ in want], k
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == ws, k


def test_or_exact_across_tie_boundary(tie_index):
    s = LocalSearcher(tie_index["idx"])
    for k in [1, 100, 300, 301, 449, 450, 451, 699, 700, 701]:
        want = bm25_topk_or(tie_index["oracle"], "alpha beta", k)
        got = s.topk("alpha beta", k, mode="or", use_result_cache=False)
        assert [d for d, _ in got] == [d for d, _ in want], k
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == ws, k


def test_single_term_champion_boundary(tie_index):
    """k straddling the champion-list length must agree with the oracle on
    both sides (champion fast path vs general path)."""
    s = LocalSearcher(tie_index["idx"])
    for k in [1, 511, 512, 513, 700]:
        want = bm25_topk(tie_index["oracle"], "alpha", k)
        got = s.topk("alpha", k, use_result_cache=False)
        assert [d for d, _ in got] == [d for d, _ in want], k
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == ws, k


def test_randomized_corpora_rank_identity(spark, tmp_path):
    """Property sweep: three fresh corpora (different seeds/shapes), every
    engine result bit-identical to the exhaustive oracle — guards the pruned
    paths against distribution-specific assumptions."""
    from discogsography_spark.corpus import make_queries, make_transcripts

    for seed, vocab, zipf in [(7, 120, 1.1), (21, 2000, 1.6), (99, 400, 1.3)]:
        tdf = make_transcripts(
            n_conversations=120, mean_turns=5, vocab_size=vocab, zipf_a=zipf, seed=seed
        )
        p = str(tmp_path / f"c{seed}.parquet")
        tdf.to_parquet(p, index=False)
        idx = str(tmp_path / f"i{seed}")
        IndexBuilder(idx, num_segments=4, head_df_threshold=150, head_salts=2).build(
            spark.read.parquet(p)
        )
        oracle = build_oracle_index(
            list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"]))
        )
        s = LocalSearcher(idx)
        for _, q in make_queries(tdf, n_queries=15, seed=seed).iterrows():
            want = bm25_topk(oracle, q["query_text"], int(q["k"]))
            got = s.topk(q["query_text"], int(q["k"]), use_result_cache=False)
            assert [d for d, _ in got] == [d for d, _ in want], (seed, q["query_text"])
            for (_, gs), (_, ws) in zip(got, want):
                assert gs == ws, (seed, q["query_text"])
