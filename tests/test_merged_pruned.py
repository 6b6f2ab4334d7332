"""Pruned live-view boolean / phrase / within evaluation (r6).

Round-5 verdict named the live merged view's boolean mode the one
remaining O(corpus) serving-path evaluator: MergedSearcher.topk_bool
materialized FULL merged posting relations and ran exact set algebra per
query. The r6 rewrite evaluates per leg — the base and every PROMOTED
consolidated delta ride LocalSearcher.topk_bool (vocabulary
simplification, flat AND/OR delegation to the champion / max-score
evaluators, dense-bitmap head-term algebra) with the COMBINED alive
idfs/avgdl injected; only the small unpromoted delta tail evaluates
exactly. topk_phrase/topk_within get the same union-of-legs treatment
(the consolidated leg's positional block directories now prune, closing
round-5 item #2).

Soundness argument under test: every doc lives in exactly ONE leg and
carries all its postings/positions there, so the predicate evaluates
exactly per leg, per-doc BM25 probes only terms the doc contains (absent
terms contribute exactly nothing either way), and the union of leg
top-k's contains the true top-k — the sharded fan-out argument. Under
tombstones each leg oversample-filter-retries (at most |dead| dead docs
occupy any result prefix).

Contract: bit-identical to the retained exact reference evaluators
(_topk_bool_exactmerge / _topk_phrase_exactmerge /
_topk_within_exactmerge) AND to a fresh rebuild of the alive corpus,
across base-only / small-delta / promoted-leg / tombstoned views.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from discogsography_spark.analysis import get_analyzer
from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.boolquery import parse_bool_query
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    MergedSearcher,
    consolidate_deltas,
    list_deltas,
)

BIGK = 400  # deep pages so ties and leg boundaries are exercised


@pytest.fixture(scope="module")
def pruned_setup(spark, tmp_path_factory):
    """One corpus, four live views of increasing structure:
    - 'plain':        base + 3 small deltas
    - 'promoted':     base + consolidated (promoted) delta + 2 small deltas
    - 'tombstoned':   promoted view + upsert edits + deletes
    """
    d = str(tmp_path_factory.mktemp("pruned"))
    tdf = make_transcripts(n_conversations=160, mean_turns=5, vocab_size=250)
    convs = sorted(tdf["conv_id"].unique())

    def build(name: str, n_base: int) -> str:
        base = tdf[tdf["conv_id"].isin(convs[:n_base])]
        bp = os.path.join(d, f"{name}_base.parquet")
        base.to_parquet(bp, index=False)
        idx = os.path.join(d, f"{name}_idx")
        IndexBuilder(
            idx, num_segments=4, with_positions=True, store_text=True
        ).build(spark.read.parquet(bp))
        return idx

    def batch(idx: str, lo: int, hi: int, bid: int, edit: str | None = None):
        b = tdf[tdf["conv_id"].isin(convs[lo:hi])].copy()
        if edit:
            b["text"] = b["text"] + " " + edit
        p = os.path.join(d, f"b_{os.path.basename(idx)}_{bid}.parquet")
        b.to_parquet(p, index=False)
        DeltaIndexWriter(idx).write_batch(
            spark.read.parquet(p), bid, upsert=True
        )

    # plain: base(0:100) + small deltas covering 100:130
    plain = build("plain", 100)
    for i, (lo, hi) in enumerate([(100, 110), (110, 120), (120, 130)]):
        batch(plain, lo, hi, i)

    # promoted: same data, first three batches consolidated, two more small
    promoted = build("promoted", 100)
    for i, (lo, hi) in enumerate([(100, 110), (110, 120), (120, 130)]):
        batch(promoted, lo, hi, i)
    assert consolidate_deltas(spark, promoted) == 3
    batch(promoted, 130, 140, 3)
    batch(promoted, 140, 150, 4)

    # tombstoned: promoted layout + an upsert editing BASE and DELTA
    # conversations (tombstones in both id ranges) + whole-conv deletes
    tomb = build("tomb", 100)
    for i, (lo, hi) in enumerate([(100, 110), (110, 120), (120, 130)]):
        batch(tomb, lo, hi, i)
    assert consolidate_deltas(spark, tomb) == 3
    batch(tomb, 130, 140, 3)
    w = DeltaIndexWriter(tomb)
    edit = tdf[tdf["conv_id"].isin(convs[5:8] + convs[102:104])].copy()
    edit["text"] = edit["text"] + " editprune"
    ep = os.path.join(d, "tomb_edit.parquet")
    edit.to_parquet(ep, index=False)
    w.write_batch(spark.read.parquet(ep), 4, upsert=True)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": convs[20:24]})), 5
    )

    # fresh-rebuild reference for the tombstoned view: alive latest corpus
    base_alive = set(convs[:100]) - set(convs[5:8]) - set(convs[20:24])
    delta_alive = set(convs[100:140]) - set(convs[102:104])
    alive = pd.concat(
        [
            tdf[tdf["conv_id"].isin(sorted(base_alive | delta_alive))],
            edit,
        ],
        ignore_index=True,
    )
    ap = os.path.join(d, "tomb_alive.parquet")
    alive.to_parquet(ap, index=False)
    ref_idx = os.path.join(d, "tomb_ref_idx")
    IndexBuilder(
        ref_idx, num_segments=4, with_positions=True, store_text=True
    ).build(spark.read.parquet(ap))

    return {
        "plain": plain,
        "promoted": promoted,
        "tomb": tomb,
        "tomb_ref": ref_idx,
        "tdf": tdf,
    }


def _vocab(tdf) -> list[str]:
    an = get_analyzer("simple")
    seen: dict[str, int] = {}
    for text in tdf["text"].head(400):
        for t in an.analyze_query(text):
            seen[t] = seen.get(t, 0) + 1
    ranked = sorted(seen, key=lambda t: (-seen[t], t))
    return ranked


def _rand_queries(vocab: list[str], n: int, seed: int) -> list[str]:
    """Random boolean query strings mixing head/tail terms, absent terms,
    NOT, parens, phrase and proximity nodes — the shapes the grammar
    admits (pure negation is parse-rejected and not generated)."""
    rng = random.Random(seed)
    head, tail = vocab[:12], vocab[-40:]
    absent = ["zzqx", "qqzz", "xxqv"]
    out = []
    for _ in range(n):
        def term():
            r = rng.random()
            if r < 0.45:
                return rng.choice(head)
            if r < 0.85:
                return rng.choice(tail)
            return rng.choice(absent)

        shape = rng.random()
        if shape < 0.25:
            out.append(f"{term()} AND {term()}")
        elif shape < 0.45:
            out.append(f"{term()} OR {term()} OR {term()}")
        elif shape < 0.6:
            out.append(f"{term()} AND NOT {term()}")
        elif shape < 0.72:
            out.append(f"({term()} OR {term()}) AND NOT {term()}")
        elif shape < 0.82:
            out.append(f'"{term()} {term()}" OR {term()}')
        elif shape < 0.92:
            out.append(f"{term()} <3> {term()} OR {term()}")
        else:
            out.append(f"({term()} AND {term()}) OR ({term()} AND NOT {term()})")
    return out


@pytest.mark.parametrize("view", ["plain", "promoted", "tomb"])
def test_bool_pruned_equals_exactmerge(pruned_setup, view):
    ms = MergedSearcher(pruned_setup[view])
    an = get_analyzer(ms.base.meta.analyzer)
    if view == "promoted":
        assert ms._promoted_dirs and ms._small_dirs
    if view == "tomb":
        assert ms._dead.size and ms._promoted_dirs
    vocab = _vocab(pruned_setup["tdf"])
    for q in _rand_queries(vocab, 60, seed=hash(view) % 10**6):
        ast = parse_bool_query(q, an.analyze_query, tokenize=an.tokenize_py)
        if ast is None:
            continue
        got = ms.topk_bool(q, BIGK)
        want = ms._topk_bool_exactmerge(ast, BIGK)
        assert got == want, (view, q)


@pytest.mark.parametrize("view", ["plain", "promoted", "tomb"])
def test_phrase_within_pruned_equals_exactmerge(pruned_setup, view):
    ms = MergedSearcher(pruned_setup[view])
    vocab = _vocab(pruned_setup["tdf"])
    rng = random.Random(1000 + hash(view) % 997)
    pairs = [
        (rng.choice(vocab[:10]), rng.choice(vocab[:30])) for _ in range(15)
    ] + [(vocab[0], vocab[0]), ("editprune", vocab[0]), ("zzqx", vocab[1])]
    for a, b in pairs:
        got = ms.topk_phrase(f"{a} {b}", BIGK)
        want = ms._topk_phrase_exactmerge(f"{a} {b}", BIGK)
        assert got == want, ("phrase", view, a, b)
        for w in (1, 3, 7):
            got = ms.topk_within(a, b, w, BIGK)
            want = ms._topk_within_exactmerge(a, b, w, BIGK)
            assert got == want, ("within", view, a, b, w)


def test_tombstoned_view_matches_fresh_rebuild(pruned_setup):
    """Pruned evaluators on the live tombstoned view ≡ fresh alive-corpus
    rebuild, compared on (conv_id, turn_idx, score) keys — the strongest
    end-to-end contract (docIDs differ between the views)."""
    from discogsography_spark.query.engine import LocalSearcher

    ms = MergedSearcher(pruned_setup["tomb"])
    ref = LocalSearcher(pruned_setup["tomb_ref"])
    live_keys = _docmap_keys(pruned_setup["tomb"])
    ref_keys = _docmap_keys(pruned_setup["tomb_ref"])
    FULLK = 10**6  # full-relation compare: tiebreak docID order differs
    # between the live view (arrival ids) and the rebuild (dense ids)
    an = get_analyzer(ms.base.meta.analyzer)
    vocab = _vocab(pruned_setup["tdf"])
    queries = _rand_queries(vocab, 40, seed=77) + [
        "editprune OR " + vocab[0],
        f'"{vocab[0]} {vocab[1]}" AND NOT zzqx',
        f"{vocab[0]} <4> {vocab[2]} OR editprune",
    ]
    for q in queries:
        ast = parse_bool_query(q, an.analyze_query, tokenize=an.tokenize_py)
        if ast is None:
            continue
        got = {
            (live_keys[doc], round(s, 5)) for doc, s in ms.topk_bool(q, FULLK)
        }
        want = {
            (ref_keys[doc], round(s, 5))
            for doc, s in ref.topk_bool(q, FULLK, use_result_cache=False)
        }
        assert got == want, q
    # phrase / within against the rebuild
    for a, b in [(vocab[0], vocab[1]), (vocab[2], vocab[0])]:
        got = {(live_keys[d], s) for d, s in ms.topk_phrase(f"{a} {b}", FULLK)}
        want = {
            (ref_keys[d], s) for d, s in ref.topk_phrase(f"{a} {b}", FULLK)
        }
        assert got == want, ("phrase", a, b)
        got = {(live_keys[d], s) for d, s in ms.topk_within(a, b, 3, FULLK)}
        want = {(ref_keys[d], s) for d, s in ref.topk_within(a, b, 3, FULLK)}
        assert got == want, ("within", a, b)


def _docmap_keys(idx: str) -> dict[int, tuple]:
    """docID → (conv_id, turn_idx) over base + deltas."""
    parts = [os.path.join(idx, "docs")]
    for dd in list_deltas(idx):
        p = os.path.join(dd, "docs")
        if os.path.isdir(p):
            parts.append(p)
    dm = pd.concat(
        [
            pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"])
            for p in parts
        ],
        ignore_index=True,
    )
    return {
        int(r.doc_id): (r.conv_id, int(r.turn_idx))
        for r in dm.itertuples(index=False)
    }


def test_bool_pruned_takes_leg_fast_paths(pruned_setup, monkeypatch):
    """Structural guarantee: the pruned path must NOT materialize full
    merged relations — _merged_rows is the exact path's workhorse and
    stays untouched by topk_bool on a promoted view (stats come from
    dictionary rows + small alive lists; legs decode through their own
    block-granular machinery)."""
    ms = MergedSearcher(pruned_setup["promoted"])
    called = []
    orig = ms._merged_rows
    monkeypatch.setattr(
        ms,
        "_merged_rows",
        lambda terms: called.append(list(terms)) or orig(terms),
    )
    vocab = _vocab(pruned_setup["tdf"])
    hits = ms.topk_bool(f"({vocab[0]} OR {vocab[5]}) AND NOT {vocab[9]}", 10)
    assert hits  # sanity: the query matches
    assert called == [], "pruned topk_bool touched _merged_rows"
    hits = ms.topk_phrase(f"{vocab[0]} {vocab[1]}", 10)
    assert called == [], "pruned topk_phrase touched _merged_rows"
    ms.topk_within(vocab[0], vocab[2], 3, 10)
    assert called == [], "pruned topk_within touched _merged_rows"
