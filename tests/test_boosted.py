"""Per-term boosted BM25 (Lucene `clause^boost` syntax): engine vs
pure-Python oracle vs DataFrame mirror, every deployment shape."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.analysis import parse_boosted_query
from discogsography_spark.oracle import bm25_topk, bm25_topk_boosted, bm25_topk_or
from discogsography_spark.query.engine import LocalSearcher

CASES = [
    "turn^2 spark",
    "turn spark^0.5",
    "index^3 query^0.25",
    "merge^1.5",
    "turn^2 turn^3 spark",  # duplicate clause — boosts sum (5x)
]


def test_parse_boosted_query():
    terms, boosts = parse_boosted_query("spark^2 index^0.5 merge")
    assert terms == sorted(terms)
    assert boosts["spark"] == 2.0 and boosts["index"] == 0.5
    assert boosts["merge"] == 1.0
    t2, b2 = parse_boosted_query("turn^2 turn^3")
    assert t2 == ["turn"] and b2["turn"] == 5.0
    assert parse_boosted_query("") == ([], {})


@pytest.mark.parametrize("qtext", CASES)
@pytest.mark.parametrize("mode", ["and", "or"])
def test_engine_matches_oracle(built_index, oracle_index, qtext, mode):
    s = LocalSearcher(built_index)
    got = s.topk_boosted(qtext, 10, mode=mode)
    want = bm25_topk_boosted(oracle_index, qtext, 10, mode=mode)
    assert got == want  # bit-identical scores, identical ranking


def test_unit_boosts_equal_plain_topk(built_index, oracle_index):
    s = LocalSearcher(built_index)
    for q in ["merge", "turn spark", "index query"]:
        assert s.topk_boosted(q, 10) == s.topk(q, 10)
        assert s.topk_boosted(q, 10, mode="or") == s.topk(q, 10, mode="or")
        assert bm25_topk_boosted(oracle_index, q, 10) == bm25_topk(
            oracle_index, q, 10
        )
        assert bm25_topk_boosted(
            oracle_index, q, 10, mode="or"
        ) == bm25_topk_or(oracle_index, q, 10)


def test_boost_scales_single_term_scores(built_index):
    s = LocalSearcher(built_index)
    base = s.topk_boosted("merge", 10)
    doubled = s.topk_boosted("merge^2", 10)
    assert [d for d, _ in doubled] == [d for d, _ in base]
    for (d1, s1), (d2, s2) in zip(base, doubled):
        assert s2 == pytest.approx(2.0 * s1, rel=1e-12)


def test_boost_reorders_multi_term_ranking(built_index, oracle_index):
    """A large enough boost on one term must be able to change the
    ranking (otherwise the feature is a no-op)."""
    s = LocalSearcher(built_index)
    plain = [d for d, _ in s.topk_boosted("turn spark", 10**6)]
    boosted = [d for d, _ in s.topk_boosted("turn spark^20", 10**6)]
    assert set(plain) == set(boosted)  # same AND matched set
    assert plain != boosted
    assert boosted == [
        d
        for d, _ in bm25_topk_boosted(
            oracle_index, "turn spark^20", 10**6
        )
    ]


def test_absent_term_semantics(built_index):
    s = LocalSearcher(built_index)
    assert s.topk_boosted("zzqqxx^2 merge", 10) == []
    got = s.topk_boosted("zzqqxx^2 merge", 10, mode="or")
    assert got == s.topk_boosted("merge", 10, mode="or")


def test_after_cursor_and_budget(built_index):
    from discogsography_spark.query.engine import QueryBudgetExceeded

    s = LocalSearcher(built_index)
    full = s.topk_boosted("turn spark^2", 20)
    assert len(full) >= 6
    p1 = s.topk_boosted("turn spark^2", 3)
    p2 = s.topk_boosted(
        "turn spark^2", 3, after=(p1[-1][1], p1[-1][0])
    )
    assert p1 + p2 == full[:6]
    with pytest.raises(QueryBudgetExceeded):
        s.topk_boosted("turn spark^2", 10, budget_ms=0.0)


def test_dataframe_mirror_identity(spark, built_index, oracle_index, corpus_dir):
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_boosted_topk_dataframe,
    )

    docs = (
        spark.read.parquet(os.path.join(built_index, "docs"))
        .select("doc_id", "conv_id", "turn_idx")
        .join(
            spark.read.parquet(
                os.path.join(corpus_dir, "transcripts.parquet")
            ),
            ["conv_id", "turn_idx"],
        )
        .select("doc_id", "text")
    )
    for q, mode in [("turn^2 spark", "and"), ("index^3 query^0.25", "or")]:
        rows = bm25_boosted_topk_dataframe(docs, q, k=10, mode=mode).collect()
        want = bm25_topk_boosted(oracle_index, q, 10, mode=mode)
        assert [(r["doc_id"], r["score"]) for r in rows] == [
            (d, round(sc, 5)) for d, sc in want
        ], (q, mode)


def test_sharded_boosted_bit_identical(spark, tmp_path_factory):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.query.sharded import ShardedSearcher

    d = tmp_path_factory.mktemp("boost_sharded")
    tdf = make_transcripts(n_conversations=120, mean_turns=6, vocab_size=400)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=4, head_df_threshold=300).build(
        spark.read.parquet(full_p)
    )
    shard_dirs = []
    bounds = [convs[i * len(convs) // 3] for i in range(1, 3)]
    for i, (lo, hi) in enumerate(zip([None, *bounds], [*bounds, None])):
        m = tdf["conv_id"].map(
            lambda c: (lo is None or c >= lo) and (hi is None or c < hi)
        )
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)

    full = LocalSearcher(full_idx)
    sharded = ShardedSearcher(shard_dirs, parallel=False)
    n_nonempty = 0
    for q in ["turn^2 spark", "merge^0.5 join", "index^3 query",
              "zzqq^2 merge"]:
        for mode in ("and", "or"):
            want = full.topk_boosted(q, 10, mode=mode)
            got = sharded.topk_boosted(q, 10, mode=mode)
            assert [x[0] for x in got] == [x[0] for x in want], (q, mode)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gs == ws, f"{q}/{mode}: {gs!r} != {ws!r}"
            n_nonempty += bool(got)
    assert n_nonempty >= 5


def test_merged_live_boosted_matches_alive_rebuild(spark, tmp_path_factory):
    """Live view (upserts + tombstones) topk_boosted ≡ a fresh rebuild of
    the alive corpus — key-set AND score equality."""
    import pandas as pd

    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        MergedSearcher,
        list_deltas,
    )

    d = tmp_path_factory.mktemp("boost_live")
    tdf = make_transcripts(n_conversations=80, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:60])].reset_index(drop=True)
    batch = tdf[tdf["conv_id"].isin(convs[60:75])].reset_index(drop=True)
    dead = convs[:5]

    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=4, head_df_threshold=10**9).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    b_p = str(d / "b.parquet")
    batch.to_parquet(b_p, index=False)
    w.write_batch(spark.read.parquet(b_p), 0, upsert=True)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": dead})), 1
    )

    alive = pd.concat(
        [base[~base["conv_id"].isin(dead)], batch], ignore_index=True
    )
    ref_p = str(d / "alive.parquet")
    alive.to_parquet(ref_p, index=False)
    ref_idx = str(d / "ref_idx")
    IndexBuilder(ref_idx, num_segments=4, head_df_threshold=10**9).build(
        spark.read.parquet(ref_p)
    )

    ms = MergedSearcher(idx)
    ref = LocalSearcher(ref_idx)

    def keymap(index_dir):
        parts = [os.path.join(index_dir, "docs")]
        for dd in list_deltas(index_dir):
            p = os.path.join(dd, "docs")
            if os.path.isdir(p):
                parts.append(p)
        t = pd.concat(
            [
                pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"])
                for p in parts
            ],
            ignore_index=True,
        )
        return dict(
            zip(t["doc_id"], zip(t["conv_id"], t["turn_idx"].astype(int)))
        )

    ref_keys = keymap(ref_idx)
    live_keys = keymap(idx)
    n_nonempty = 0
    for q in ["turn^2 spark", "merge^0.5", "index^3 query"]:
        for mode in ("and", "or"):
            got = ms.topk_boosted(q, 200, mode=mode)
            want = ref.topk_boosted(
                q, 200, mode=mode, use_result_cache=False
            )
            assert {(live_keys[did], round(s, 9)) for did, s in got} == {
                (ref_keys[did], round(s, 9)) for did, s in want
            }, (q, mode)
            n_nonempty += bool(got)
    assert n_nonempty >= 4
