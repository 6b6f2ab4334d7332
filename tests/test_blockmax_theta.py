"""Regression: _topk_and's θ refinement must be a DISTINCT-score statistic.

Champion-seeded docs used to be re-scored in their phase-0 home blocks, so the
pool held duplicates; the k-th largest of the multiset could exceed the true
k-th distinct score and wrongly prune phase-1 blocks. The two-phase split only
engages above 1024 driving-term blocks (df > ~131k), which the session-scope
corpus fixture never reaches — so this suite builds a 132k-doc flat index
where every doc matches the AND and verifies rank identity at several k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import build_oracle_index, bm25_topk
from discogsography_spark.query.engine import LocalSearcher

# > 1024 blocks of 128 for the driving term → engages the phase split
N_DOCS = 132_200
FILLERS = [f"fil{j}" for j in range(40)]


def _texts() -> list[str]:
    rng = np.random.default_rng(7)
    tf_a = rng.integers(1, 5, N_DOCS)
    tf_b = rng.integers(1, 4, N_DOCS)
    n_fill = rng.integers(0, 8, N_DOCS)
    fill_pick = rng.integers(0, len(FILLERS), int(n_fill.sum()))
    out: list[str] = []
    off = 0
    for i in range(N_DOCS):
        k = int(n_fill[i])
        parts = ["aa"] * int(tf_a[i]) + ["bb"] * int(tf_b[i])
        parts += [FILLERS[p] for p in fill_pick[off : off + k]]
        off += k
        out.append(" ".join(parts))
    return out


@pytest.fixture(scope="module")
def flat_corpus() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"c{i:07d}" for i in range(N_DOCS)],
            "turn_idx": np.zeros(N_DOCS, dtype=np.int32),
            "role": "user",
            "text": _texts(),
            "tool": None,
            "ts": pd.Timestamp("2026-01-01").as_unit("us"),
        }
    )


@pytest.fixture(scope="module")
def flat_index(spark, flat_corpus, tmp_path_factory) -> str:
    idx_dir = str(tmp_path_factory.mktemp("flatidx") / "idx")
    builder = IndexBuilder(idx_dir, num_segments=4)
    builder.build(spark.createDataFrame(flat_corpus))
    return idx_dir


@pytest.fixture(scope="module")
def flat_oracle(flat_corpus):
    rows = list(zip(flat_corpus["conv_id"], flat_corpus["turn_idx"], flat_corpus["text"]))
    return build_oracle_index(rows)


def test_phase_split_engaged(flat_index):
    s = LocalSearcher(flat_index)
    tp = s.lookup_terms(["aa"])["aa"]
    assert tp.df == N_DOCS
    assert len(tp.block_last_doc) > 1024, "fixture must exceed the phase-1 split"


@pytest.mark.parametrize("k", [10, 20, 100])
def test_and_theta_distinct_scores(flat_index, flat_oracle, k):
    s = LocalSearcher(flat_index)
    got = s.topk("aa bb", k, use_result_cache=False)
    expected = bm25_topk(flat_oracle, "aa bb", k)
    assert len(got) == len(expected) == k
    for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expected)):
        assert gd == ed, f"k={k} rank {i}: docID {gd} != {ed}"
        assert gs == es, f"k={k} rank {i}: score {gs!r} != {es!r}"
