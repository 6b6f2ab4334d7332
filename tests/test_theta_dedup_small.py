"""Engineered regression for the θ-over-duplicates bug in _topk_and.

Pre-fix, champion-seeded docs were re-scored in their phase-0 home blocks, so
the θ refinement ran over a MULTISET: the k-th largest with duplicates can
exceed the true k-th distinct score, wrongly pruning phase-1 blocks that hold
true top-k docs. This corpus makes that concrete with four doc classes:

- T (6 docs)   : graded top scorers, in champ_aa, homes in phase-0 blocks
                 → duplicated pre-fix (seed + block scoring).
- Y (72 docs)  : high-bb docs, in champ_bb, also in phase-0 blocks
                 → duplicated pre-fix at a mid score.
- V (10 docs)  : the victims — true ranks 7..16, NOT in any champion list,
                 homes in phase-1 blocks whose upper bound sits between the
                 true k-th distinct score and the inflated multiset θ.
- C_A/C_B      : single-term champion fillers that pin the champion cutoff
                 above V's tfnorm (they never match the AND).

With k=10 the true answer is 6 T + 4 V; pre-fix the inflated θ (≈ the 2nd-
lowest T score, from 12 duplicated T entries) pruned every V block and
returned Y docs instead. block_size=8 plus a shrunken _PHASE0_BLOCKS engages
the phase split at 2.7k docs (production needs df > 131k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import discogsography_spark.query.engine as engine_mod
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import build_oracle_index, bm25_topk
from discogsography_spark.query.engine import LocalSearcher

PAD = [f"p{j}" for j in range(8)]
N_P0_GROUPS = 73  # aa-blocks fully inside the decoy/champion region


def _corpus() -> tuple[pd.DataFrame, dict[str, list[int]]]:
    texts: list[str] = []
    roles: dict[str, list[int]] = {"T": [], "Y": [], "V": [], "CA": [], "CB": [], "BG": []}

    def add(kind: str, text: str) -> None:
        roles[kind].append(len(texts))
        texts.append(text)

    t_iter = iter(range(10, 16))
    # P0: 73 groups of 8 aa-postings — slot 0 an anchor (T for the first 6
    # groups, Y after), slots 1..7 champion fillers, last 5 groups trade one
    # filler for an extra Y so #C_A lands exactly on 506 (= 512 - #T).
    for g in range(N_P0_GROUPS):
        if g < 6:
            tf = next(t_iter)
            add("T", " ".join(["aa"] * tf + ["bb"] * tf))
        else:
            add("Y", " ".join(["bb"] * 8 + ["aa"]))
        n_ca = 6 if g >= N_P0_GROUPS - 5 else 7
        for _ in range(n_ca):
            add("CA", " ".join(["aa"] * 8 + [PAD[0]]))
        if n_ca == 6:
            add("Y", " ".join(["bb"] * 8 + ["aa"]))
    # P1: 1600 background docs with 10 victims, each victim alone in its
    # aa-block (spaced 160 docs = 20 blocks apart)
    for i in range(1610):
        if i % 160 == 0 and i // 160 < 10:
            add("V", "aa aa bb bb")
        else:
            add("BG", " ".join(["aa", "bb"] + PAD[:6]))
    # tail: bb-only champion fillers (no aa postings, far from V spans)
    for _ in range(506):
        add("CB", " ".join(["bb"] * 8 + [PAD[0]]))

    assert len(roles["CA"]) == 506 and len(roles["Y"]) == 72
    pdf = pd.DataFrame(
        {
            "conv_id": [f"d{i:05d}" for i in range(len(texts))],
            "turn_idx": np.zeros(len(texts), dtype=np.int32),
            "role": "user",
            "text": texts,
            "tool": None,
            "ts": pd.Timestamp("2026-01-01").as_unit("us"),
        }
    )
    return pdf, roles


@pytest.fixture(scope="module")
def theta_corpus():
    return _corpus()


@pytest.fixture(scope="module")
def theta_index(spark, theta_corpus, tmp_path_factory) -> str:
    idx_dir = str(tmp_path_factory.mktemp("thetaidx") / "idx")
    IndexBuilder(idx_dir, num_segments=2, block_size=8).build(
        spark.createDataFrame(theta_corpus[0])
    )
    return idx_dir


def test_structure_preconditions(theta_index, theta_corpus):
    """The fixture only regresses the bug if these structural facts hold —
    assert them so future corpus/param drift fails loudly instead of
    silently passing."""
    _, roles = theta_corpus
    s = LocalSearcher(theta_index)
    rows = s.lookup_terms(["aa", "bb"])
    assert rows["aa"].df == rows["bb"].df  # 'aa' drives via the name tiebreak
    assert len(rows["aa"].block_last_doc) > N_P0_GROUPS + 10
    champs = set(rows["aa"].champ_doc.tolist()) | set(rows["bb"].champ_doc.tolist())
    assert set(roles["T"]) <= set(rows["aa"].champ_doc.tolist())
    assert set(roles["Y"]) <= set(rows["bb"].champ_doc.tolist())
    assert not (set(roles["V"]) & champs), "victims must not be champion-seeded"


def test_theta_not_inflated_by_duplicates(theta_index, theta_corpus, monkeypatch):
    pdf, roles = theta_corpus
    monkeypatch.setattr(engine_mod, "_PHASE0_BLOCKS", N_P0_GROUPS)
    s = LocalSearcher(theta_index)
    got = s.topk("aa bb", 10, use_result_cache=False)

    oracle = build_oracle_index(list(zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"])))
    expected = bm25_topk(oracle, "aa bb", 10)
    exp_docs = [d for d, _ in expected]
    assert set(roles["T"]) <= set(exp_docs)
    assert len(set(roles["V"]) & set(exp_docs)) == 4, "victims must be in true top-10"
    assert got == expected, f"got {got[:12]} expected {expected[:12]}"
