"""Deletes/upserts on the live merged view via delta tombstones.

The reference mutates documents in place: its batch processors upsert rows
by key (conditional hash-gated upsert) and purge stale rows after full
re-imports (SURVEY §2.1 rows 5-8). The Spark-native index restates that as
an LSM-style tombstone layer: a delta may carry `tombstones.parquet` naming
prior document versions killed by that batch; the merged view serves the
ALIVE corpus only (stats, df, matched sets, positions), and `compact()`
physically drops dead docs and re-densifies the id space.

Contract under test: MergedSearcher/MergedSearchService over
base + deltas + tombstones answers every mode EXACTLY like a fresh
rebuild over the latest-version alive corpus (scores bit-identical —
combined alive stats equal rebuild stats); after compact() the folded
index is bit-identical to the fresh rebuild INCLUDING docIDs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    MergedSearcher,
    compact,
    list_deltas,
)


@pytest.fixture(scope="module")
def tomb_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tombs")
    tdf = make_transcripts(n_conversations=150, mean_turns=5, vocab_size=400)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:100])].reset_index(drop=True)

    # batch 0 (upsert): 20 brand-new conversations + REPLACEMENTS of every
    # turn of 10 existing base conversations, with edited text
    replaced_convs = convs[:10]
    new_rows = tdf[tdf["conv_id"].isin(convs[100:120])]
    repl = base[base["conv_id"].isin(replaced_convs)].copy()
    repl["text"] = repl["text"] + " editmarker"
    batch0 = pd.concat([new_rows, repl], ignore_index=True)

    # batch 1 (delete): whole conversations convs[10:15] + one single turn
    deleted_convs = convs[10:15]
    single_del = base[~base["conv_id"].isin(replaced_convs + deleted_convs)].iloc[[0]]
    del_keys = pd.concat(
        [
            pd.DataFrame({"conv_id": deleted_convs, "turn_idx": [None] * 5}),
        ]
    )

    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(
        idx, num_segments=4, head_df_threshold=10**9, with_positions=True
    ).build(spark.read.parquet(base_p))

    writer = DeltaIndexWriter(idx)
    # parquet-roundtrip the batch so its column types match the base
    # docmap's exactly (createDataFrame from pandas yields TIMESTAMP_NTZ
    # for ts; compact()'s mergeSchema union needs one timestamp flavor)
    b0_p = str(d / "batch0.parquet")
    batch0.to_parquet(b0_p, index=False)
    writer.write_batch(spark.read.parquet(b0_p), 0, upsert=True)
    conv_keys = spark.createDataFrame(
        pd.DataFrame({"conv_id": deleted_convs})
    )
    n1 = writer.write_deletes(conv_keys, 1)
    turn_keys = spark.createDataFrame(
        single_del[["conv_id", "turn_idx"]]
    )
    n2 = writer.write_deletes(turn_keys, 2)

    # the alive latest-version corpus (what a fresh rebuild indexes)
    latest = pd.concat([base[~base["conv_id"].isin(replaced_convs)], batch0],
                       ignore_index=True)
    alive = latest[~latest["conv_id"].isin(deleted_convs)]
    sk = set(zip(single_del["conv_id"], single_del["turn_idx"]))
    alive = alive[
        ~alive.apply(lambda r: (r["conv_id"], r["turn_idx"]) in sk, axis=1)
    ].reset_index(drop=True)

    ref_p = str(d / "alive.parquet")
    alive.to_parquet(ref_p, index=False)
    ref_idx = str(d / "ref_idx")
    IndexBuilder(
        ref_idx, num_segments=4, head_df_threshold=10**9, with_positions=True
    ).build(spark.read.parquet(ref_p))

    return {
        "idx": idx,
        "ref_idx": ref_idx,
        "alive": alive,
        "base": base,
        "batch0": batch0,
        "deleted_convs": deleted_convs,
        "replaced_convs": replaced_convs,
        "n_deleted": (n1, n2),
        "dir": str(d),
    }


def _keyed(searcher_dir_or_obj, docs_pdf):
    """doc_id → (conv_id, turn_idx) map from an index's docmap."""
    return {
        int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
        for _, r in docs_pdf.iterrows()
    }


def _docmap(index_dir):
    parts = [os.path.join(index_dir, "docs")]
    for dd in list_deltas(index_dir):
        p = os.path.join(dd, "docs")
        if os.path.isdir(p):
            parts.append(p)
    return pd.concat(
        [pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"]) for p in parts],
        ignore_index=True,
    )


def _as_keyset(results, keymap):
    return sorted((keymap[d], round(s, 5)) for d, s in results)


BIGK = 10**6  # full-ranking compares: tiebreak order differs between the
# live view (arrival-order ids) and the rebuild (dense rank ids), so
# compare the full (key, score) relation instead of a truncated page


def test_stats_reflect_alive_corpus(tomb_setup):
    ms = MergedSearcher(tomb_setup["idx"])
    alive = tomb_setup["alive"]
    assert ms.n_docs == len(alive)
    ref = LocalSearcher(tomb_setup["ref_idx"])
    assert abs(ms.avgdl - ref.meta.avgdl) < 1e-9
    assert ms.id_space > ms.n_docs  # holes exist pre-compact
    n1, n2 = tomb_setup["n_deleted"]
    assert n2 == 1 and n1 > 0


def test_live_view_matches_alive_rebuild_all_modes(tomb_setup):
    ms = MergedSearcher(tomb_setup["idx"])
    ref = LocalSearcher(tomb_setup["ref_idx"])
    live_keys = _keyed(ms, _docmap(tomb_setup["idx"]))
    ref_keys = _keyed(ref, _docmap(tomb_setup["ref_idx"]))

    alive = tomb_setup["alive"]
    from discogsography_spark.analysis import get_analyzer

    an = get_analyzer("simple")
    toks = [t for text in alive["text"].head(50) for t in an.tokenize_py(text)]
    t_head, t_mid = toks[0], toks[len(toks) // 2]

    queries_and = [t_head, f"{t_head} {t_mid}", "editmarker",
                   f"editmarker {t_head}"]
    for q in queries_and:
        got = _as_keyset(ms.topk(q, BIGK), live_keys)
        want = _as_keyset(ref.topk(q, BIGK, use_result_cache=False), ref_keys)
        assert got == want, q
        # fast and exact legs agree under tombstones too
        assert ms.topk(q, BIGK) == ms.topk_exact(q, BIGK), q

    for q in [f"{t_head} OR editmarker", f"{t_head} AND NOT {t_mid}",
              f'"{t_head} {t_mid}" OR editmarker']:
        got = _as_keyset(ms.topk_bool(q, BIGK), live_keys)
        want = _as_keyset(ref.topk_bool(q, BIGK, use_result_cache=False), ref_keys)
        assert got == want, q

    got = _as_keyset(ms.topk_phrase(f"{t_head} {t_mid}", BIGK), live_keys)
    want = _as_keyset(ref.topk_phrase(f"{t_head} {t_mid}", BIGK), ref_keys)
    assert got == want

    got = _as_keyset(ms.topk_within(t_head, t_mid, 3, BIGK), live_keys)
    want = _as_keyset(ref.topk_within(t_head, t_mid, 3, BIGK), ref_keys)
    assert got == want


def test_deleted_and_replaced_versions_invisible(tomb_setup):
    ms = MergedSearcher(tomb_setup["idx"])
    live_keys = _keyed(ms, _docmap(tomb_setup["idx"]))
    deleted = set(tomb_setup["deleted_convs"])
    replaced = set(tomb_setup["replaced_convs"])
    from discogsography_spark.analysis import get_analyzer

    an = get_analyzer("simple")
    # every turn of a deleted conversation: query its own tokens, assert
    # the (conv, turn) key never surfaces
    probe_rows = tomb_setup["base"][
        tomb_setup["base"]["conv_id"].isin(list(deleted)[:2])
    ].head(5)
    for _, r in probe_rows.iterrows():
        ts = an.tokenize_py(r["text"])[:2]
        if not ts:
            continue
        for d, _s in ms.topk(" ".join(ts), BIGK):
            assert live_keys[d][0] not in deleted
    # replaced conversations answer with their NEW docIDs only: the
    # edited text matches, and every editmarker hit is a replaced key
    hits = ms.topk("editmarker", BIGK)
    assert hits, "edited versions must be indexed"
    for d, _s in hits:
        assert live_keys[d][0] in replaced


def test_facets_counts_and_highlight_served(spark, tomb_setup):
    from discogsography_spark.query.serving import (
        MergedSearchService,
        SearchService,
    )

    texts = dict(
        zip(
            zip(tomb_setup["alive"]["conv_id"], tomb_setup["alive"]["turn_idx"]),
            tomb_setup["alive"]["text"],
        )
    )
    live_keys = _keyed(None, _docmap(tomb_setup["idx"]))
    ref_keys = _keyed(None, _docmap(tomb_setup["ref_idx"]))
    svc = MergedSearchService(
        tomb_setup["idx"],
        facet_defs={"role": "role"},
        text_lookup=lambda d: texts[live_keys[d]],
    )
    ref = SearchService(
        tomb_setup["ref_idx"],
        facet_defs={"role": "role"},
        text_lookup=lambda d: texts[ref_keys[d]],
    )
    got = svc.search("editmarker", 5, facets=["role"], highlight=True)
    want = ref.search("editmarker", 5, facets=["role"], highlight=True)
    assert got.total_matched == want.total_matched
    assert got.facets == want.facets
    # identical keys and scores page-for-page (no score ties among top-5
    # here — scores are distinct, so order matches too)
    assert [(live_keys[d], round(s, 5)) for d, s in got.results] == [
        (ref_keys[d], round(s, 5)) for d, s in want.results
    ]
    got_heads = {live_keys[d]: h for d, h in got.headlines.items()}
    want_heads = {ref_keys[d]: h for d, h in want.headlines.items()}
    assert got_heads == want_heads
    for h in got_heads.values():
        assert "<<editmarker>>" in h


def test_delete_idempotent_and_noop_keys(spark, tomb_setup):
    writer = DeltaIndexWriter(tomb_setup["idx"])
    # re-delivering batch 1 is a no-op (stats.json exists)
    conv_keys = spark.createDataFrame(
        pd.DataFrame({"conv_id": tomb_setup["deleted_convs"]})
    )
    assert writer.write_deletes(conv_keys, 1) == 0
    # deleting a key that never existed tombstones nothing
    ghost = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["conv-99999999"], "turn_idx": [0]})
    )
    n = writer.write_deletes(ghost, 7)
    assert n == 0
    ms = MergedSearcher(tomb_setup["idx"])
    assert ms.n_docs == len(tomb_setup["alive"])


def test_compact_physically_drops_and_matches_rebuild(spark, tomb_setup):
    import shutil

    idx2 = os.path.join(tomb_setup["dir"], "idx_for_compact")
    if os.path.isdir(idx2):
        shutil.rmtree(idx2)
    shutil.copytree(tomb_setup["idx"], idx2)
    n_folded = compact(spark, idx2)
    assert n_folded >= 3
    assert list_deltas(idx2) == []

    s = LocalSearcher(idx2)
    ref = LocalSearcher(tomb_setup["ref_idx"])
    assert s.meta.n_docs == ref.meta.n_docs == len(tomb_setup["alive"])
    assert abs(s.meta.avgdl - ref.meta.avgdl) < 1e-9
    # docIDs are BOTH the dense (conv_id, turn_idx) rank over the alive
    # corpus now → bit-identical results, ids included
    from discogsography_spark.analysis import get_analyzer

    an = get_analyzer("simple")
    toks = [
        t
        for text in tomb_setup["alive"]["text"].head(30)
        for t in an.tokenize_py(text)
    ]
    for q in [toks[0], f"{toks[0]} {toks[5]}", "editmarker"]:
        assert s.topk(q, 50, use_result_cache=False) == ref.topk(
            q, 50, use_result_cache=False
        ), q
    assert s.topk_phrase(f"{toks[0]} {toks[5]}", 50) == ref.topk_phrase(
        f"{toks[0]} {toks[5]}", 50
    )
    # reopened merged view over the compacted base: no tombstones left
    ms = MergedSearcher(idx2)
    assert ms._dead.size == 0 and ms.n_docs == ms.id_space


def test_second_upsert_of_same_key(spark, tomb_setup):
    """Upserting an already-upserted key twice leaves exactly the newest
    version visible; double-tombstoned originals dedupe in the stats."""
    import shutil

    idx3 = os.path.join(tomb_setup["dir"], "idx_upsert2")
    if os.path.isdir(idx3):
        shutil.rmtree(idx3)
    shutil.copytree(tomb_setup["idx"], idx3)
    writer = DeltaIndexWriter(idx3)
    again = tomb_setup["batch0"][
        tomb_setup["batch0"]["conv_id"].isin(tomb_setup["replaced_convs"][:3])
    ].copy()
    again["text"] = again["text"].str.replace(" editmarker", "") + " thirdrev"
    b3_p = os.path.join(tomb_setup["dir"], "batch3.parquet")
    again.to_parquet(b3_p, index=False)
    writer.write_batch(spark.read.parquet(b3_p), 3, upsert=True)

    ms = MergedSearcher(idx3)
    live_keys = _keyed(ms, _docmap(idx3))
    hits3 = {live_keys[d][0] for d, _ in ms.topk("thirdrev", BIGK)}
    assert hits3 == set(tomb_setup["replaced_convs"][:3])
    hits_edit = {live_keys[d][0] for d, _ in ms.topk("editmarker", BIGK)}
    assert hits_edit == set(tomb_setup["replaced_convs"][3:])
    # alive count: same as before (replacement is 1:1)
    assert ms.n_docs == len(tomb_setup["alive"])


def test_tomb_fast_path_retry_when_top_ranks_are_dead(spark, tmp_path):
    """Force the tombstone fast path's guaranteed-depth retry: 220 docs
    carry the probe term with descending tf, the 150 best-ranked are
    deleted, so the first oversampled base page (k + 64) is mostly dead
    and the alive page must come from the retry at k + |dead|. Fast AND /
    OR legs must equal the exact evaluators and a fresh alive rebuild."""
    rows = []
    for i in range(220):
        tf = 220 - i  # rank order = doc order
        rows.append(
            {
                "conv_id": f"conv-{i:04d}",
                "turn_idx": 0,
                "role": "user",
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
                "text": "zzprobe " * tf + "yyfill",
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base_p = str(tmp_path / "base.parquet")
    pdf.to_parquet(base_p, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    dead_convs = [f"conv-{i:04d}" for i in range(150)]
    n = w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": dead_convs})), 0
    )
    assert n == 150

    alive_pdf = pdf.iloc[150:].reset_index(drop=True)
    ref_p = str(tmp_path / "alive.parquet")
    alive_pdf.to_parquet(ref_p, index=False)
    ref_idx = str(tmp_path / "ref")
    IndexBuilder(ref_idx, num_segments=2, head_df_threshold=10**9).build(
        spark.read.parquet(ref_p)
    )

    ms = MergedSearcher(idx)
    ref = LocalSearcher(ref_idx)
    live_keys = _keyed(ms, _docmap(idx))
    ref_keys = _keyed(ref, _docmap(ref_idx))
    assert ms._dead.size == 150  # pad = max(64, k) < |dead| → retry armed

    for k in (5, 10, 80):
        fast = ms.topk("zzprobe", k)
        assert fast == ms.topk_exact("zzprobe", k), k
        assert _as_keyset(fast, live_keys) == _as_keyset(
            ref.topk("zzprobe", k, use_result_cache=False), ref_keys
        ), k
        got_or = ms._topk_or(["zzprobe", "absentterm"], k)
        want_or = ref.topk(
            "zzprobe absentterm", k, mode="or", use_result_cache=False
        )
        assert _as_keyset(got_or, live_keys) == _as_keyset(
            want_or, ref_keys
        ), k


def test_suggest_never_returns_dead_only_vocabulary(spark, tmp_path):
    """A term whose every occurrence is tombstoned must vanish from
    did-you-mean: a fresh alive rebuild has no such vocabulary entry, and
    a rewrite to it would rank zero hits."""
    tdf = make_transcripts(n_conversations=30, mean_turns=3, vocab_size=200)
    special = tdf.iloc[[0]].copy()
    special["conv_id"] = "zzspecial-0001"
    special["turn_idx"] = 0
    special["text"] = "qqzebra marker text"
    pdf = pd.concat([tdf, special], ignore_index=True)
    base_p = str(tmp_path / "base.parquet")
    pdf.to_parquet(base_p, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
        spark.read.parquet(base_p)
    )

    ms0 = MergedSearcher(idx)
    assert any(
        t == "qqzebra" for t, _ in ms0.suggest_terms("qqzebrb", k=5)
    )

    w = DeltaIndexWriter(idx)
    n = w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": ["zzspecial-0001"]})),
        0,
    )
    assert n == 1
    ms = MergedSearcher(idx)
    got = ms.suggest_terms("qqzebrb", k=5)
    assert all(t != "qqzebra" for t, _ in got), got
    # fuzzy rewrite no longer resurrects the dead term
    hits, rewrites = ms.topk_fuzzy("qqzebrb", 5)
    assert rewrites.get("qqzebrb") != "qqzebra"


def test_live_docs_df_matches_alive_corpus(spark, tomb_setup):
    """live_docs_df — the DataFrame bridge to the mutating corpus — must
    return exactly the alive latest-version rows (replaced versions and
    deleted keys invisible, delta payload columns present)."""
    from discogsography_spark.streaming.incremental import live_docs_df

    df = live_docs_df(spark, tomb_setup["idx"], columns=["conv_id", "turn_idx"])
    got = sorted((r["conv_id"], int(r["turn_idx"])) for r in df.collect())
    alive = tomb_setup["alive"]
    want = sorted(zip(alive["conv_id"], alive["turn_idx"].astype(int)))
    assert got == want


def test_prefix_expansion_cap_ignores_dead_only_vocabulary(spark, tmp_path):
    """A dead-only term sorting inside the first max_expansions must not
    displace a real term at the cap boundary — the fresh alive rebuild
    expands to the real term, and the live view must match its rewrite."""
    rows = []
    # 5 shared-prefix terms, one per doc: ppaaa (to be killed), ppbbb..ppeee
    terms = ["ppaaa", "ppbbb", "ppccc", "ppddd", "ppeee"]
    for i, t in enumerate(terms):
        rows.append(
            {
                "conv_id": f"conv-{i:04d}",
                "turn_idx": 0,
                "role": "user",
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
                "text": f"{t} filler common",
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base_p = str(tmp_path / "base.parquet")
    pdf.to_parquet(base_p, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    assert (
        w.write_deletes(
            spark.createDataFrame(pd.DataFrame({"conv_id": ["conv-0000"]})), 0
        )
        == 1
    )
    ms = MergedSearcher(idx)
    # cap = 4: the rebuild's expansion is the 4 alive terms; a naive
    # combined-vocab expansion would be [ppaaa..ppddd] and lose ppeee
    assert ms.expand_prefix("pp", max_expansions=4) == [
        "ppbbb", "ppccc", "ppddd", "ppeee",
    ]
    # bool prefix rewrite ranks the alive docs (ppeee included)
    hits = ms.topk_bool("pp* AND common", 10)
    live_keys = _keyed(ms, _docmap(idx))
    assert {live_keys[d][0] for d, _ in hits} == {
        f"conv-{i:04d}" for i in range(1, 5)
    }


def test_merged_lazy_tier_verification_identity(tomb_setup):
    """Merged phrase/within verify positions lazily in score-tier order
    (the engine's _lazy_verified_topk kernel). Forcing tiny tiers must
    answer identically to verify-all (huge first tier) — scores included —
    over the tombstone-bearing live view, for two-term and chained bool
    shapes."""
    import discogsography_spark.query.engine as eng
    from discogsography_spark.analysis import get_analyzer

    alive = tomb_setup["alive"]
    an = get_analyzer("simple")
    toks = [t for text in alive["text"].head(50) for t in an.tokenize_py(text)]
    t_head, t_mid = toks[0], toks[len(toks) // 2]

    old = eng._FIRST_TIER
    try:
        eng._FIRST_TIER = 10**9  # verify-all reference
        ms_all = MergedSearcher(tomb_setup["idx"])
        want_p = ms_all.topk_phrase(f"{t_head} {t_mid}", 25)
        want_w = ms_all.topk_within(t_head, t_mid, 3, 25)
        want_b = ms_all.topk_bool(f"{t_head} <4> {t_mid} OR editmarker", 25)

        eng._FIRST_TIER = 2  # force many tiers
        ms = MergedSearcher(tomb_setup["idx"])
        assert ms.topk_phrase(f"{t_head} {t_mid}", 25) == want_p
        assert ms.topk_within(t_head, t_mid, 3, 25) == want_w
        assert ms.topk_bool(f"{t_head} <4> {t_mid} OR editmarker", 25) == want_b
        # absent term / empty candidate edges
        assert ms.topk_phrase(f"{t_head} zzqqxx", 5) == []
        assert ms.topk_within("zzqqxx", t_mid, 2, 5) == []
    finally:
        eng._FIRST_TIER = old


def test_merged_service_wildcard_bool_under_tombstones(spark, tomb_setup):
    """Wild nodes through the MERGED served bool path (alive-filtered
    expansions, counts, facets) must answer like the alive-rebuild
    service — the tombstone analog of the sharded wild parity test."""
    from discogsography_spark.query.serving import (
        MergedSearchService,
        SearchService,
    )

    texts = dict(
        zip(
            zip(tomb_setup["alive"]["conv_id"], tomb_setup["alive"]["turn_idx"]),
            tomb_setup["alive"]["text"],
        )
    )
    live_keys = _keyed(None, _docmap(tomb_setup["idx"]))
    ref_keys = _keyed(None, _docmap(tomb_setup["ref_idx"]))
    svc = MergedSearchService(
        tomb_setup["idx"],
        facet_defs={"role": "role"},
        text_lookup=lambda d: texts[live_keys[d]],
    )
    ref = SearchService(
        tomb_setup["ref_idx"],
        facet_defs={"role": "role"},
        text_lookup=lambda d: texts[ref_keys[d]],
    )
    for q in ["edit*rker OR zzq", "e?itmarker", "*marker AND NOT zzq"]:
        got = svc.search(q, 8, mode="bool", facets=["role"])
        want = ref.search(q, 8, mode="bool", facets=["role"])
        assert got.total_matched == want.total_matched, q
        assert got.facets == want.facets, q
        assert sorted(
            (live_keys[d], round(s, 5)) for d, s in got.results
        ) == sorted((ref_keys[d], round(s, 5)) for d, s in want.results), q
