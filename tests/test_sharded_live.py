"""LIVE sharded serving: ShardedSearcher over per-shard MergedSearchers.

The 10^12 architecture meets the LSM mutation layer: each doc-range shard
carries its own streaming delta tail (upserts tombstoning prior versions,
deletes) and the coordinator fans out with GLOBAL ALIVE stats — n_docs /
total_tokens summed over per-shard alive counts, per-term df from the
merged alive lists. Contract: every query mode over the live sharded view
answers EXACTLY like a fresh single-index rebuild over the global
latest-version alive corpus (full (key, score) relations — docID spaces
differ), across sequential, worker-process, and thread fan-out.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.analysis import get_analyzer
from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.query.sharded import ShardedSearcher
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    list_deltas,
)

BIGK = 10**6


def _build(spark, path: str, pdf: pd.DataFrame) -> None:
    p = path + ".parquet"
    pdf.to_parquet(p, index=False)
    IndexBuilder(
        path,
        num_segments=4,
        head_df_threshold=10**9,
        with_positions=True,
        store_text=True,
    ).build(spark.read.parquet(p))


@pytest.fixture(scope="module")
def live_shards(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("live_shards"))
    tdf = make_transcripts(n_conversations=150, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    # three doc-range shards; the third stays static (no deltas) — a live
    # deployment mid-rollout has mixed shards and must still answer exactly
    ranges = [convs[:45], convs[45:90], convs[90:120]]
    extra_convs = convs[120:]

    latest: dict[str, pd.DataFrame] = {}
    shard_dirs: list[str] = []
    for i, cs in enumerate(ranges):
        base = tdf[tdf["conv_id"].isin(cs)].reset_index(drop=True)
        sd = os.path.join(d, f"shard{i}")
        _build(spark, sd, base)
        for c in cs:
            latest[c] = tdf[tdf["conv_id"] == c]
        if i < 2:  # shards 0/1 mutate; shard 2 is static
            w = DeltaIndexWriter(sd)
            repl = base[base["conv_id"].isin(cs[:5])].copy()
            repl["text"] = repl["text"] + " editz"
            newc = extra_convs[i * 10 : (i + 1) * 10]
            b0 = pd.concat(
                [tdf[tdf["conv_id"].isin(newc)], repl], ignore_index=True
            )
            p0 = os.path.join(d, f"b0_{i}.parquet")
            b0.to_parquet(p0, index=False)
            w.write_batch(spark.read.parquet(p0), 0, upsert=True)
            w.write_deletes(
                spark.createDataFrame(pd.DataFrame({"conv_id": cs[5:8]})), 1
            )
            for c in cs[:5]:
                t = tdf[tdf["conv_id"] == c].copy()
                t["text"] = t["text"] + " editz"
                latest[c] = t
            for c in newc:
                latest[c] = tdf[tdf["conv_id"] == c]
            for c in cs[5:8]:
                del latest[c]
        shard_dirs.append(sd)

    alive = pd.concat(latest.values(), ignore_index=True)
    ref_dir = os.path.join(d, "ref")
    _build(spark, ref_dir, alive)
    return {
        "shard_dirs": shard_dirs,
        "ref_dir": ref_dir,
        "alive": alive,
        "dir": d,
    }


def _ref_keymap(ref_dir: str) -> dict:
    dm = pd.read_parquet(
        os.path.join(ref_dir, "docs"), columns=["doc_id", "conv_id", "turn_idx"]
    )
    return {
        int(r.doc_id): (r.conv_id, int(r.turn_idx)) for r in dm.itertuples()
    }


def _shard_keymap(sh: ShardedSearcher, shard_dirs: list[str]) -> dict:
    km = {}
    for i, sd in enumerate(shard_dirs):
        parts = [os.path.join(sd, "docs")] + [
            os.path.join(dd, "docs")
            for dd in list_deltas(sd)
            if os.path.isdir(os.path.join(dd, "docs"))
        ]
        dm = pd.concat(
            [
                pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"])
                for p in parts
            ],
            ignore_index=True,
        )
        off = int(sh.offsets[i])
        for r in dm.itertuples():
            if pd.notna(r.doc_id):
                km[off + int(r.doc_id)] = (r.conv_id, int(r.turn_idx))
    return km


def _rel(results, keymap):
    return sorted((keymap[d], round(s, 5)) for d, s in results)


def _probe_terms(alive: pd.DataFrame) -> tuple[str, str]:
    an = get_analyzer("simple")
    toks = [t for text in alive["text"].head(40) for t in an.tokenize_py(text)]
    return toks[0], toks[len(toks) // 2]


@pytest.mark.parametrize("par", [False, True, "thread"])
def test_live_sharded_matches_alive_rebuild_all_modes(live_shards, par):
    sh = ShardedSearcher(live_shards["shard_dirs"], parallel=par)
    try:
        assert sh.live  # auto-detected from committed deltas
        ref = LocalSearcher(live_shards["ref_dir"])
        alive = live_shards["alive"]
        assert sh.n_docs == len(alive)
        assert abs(sh.avgdl - ref.meta.avgdl) < 1e-9
        skeys = _shard_keymap(sh, live_shards["shard_dirs"])
        rkeys = _ref_keymap(live_shards["ref_dir"])
        th, tm = _probe_terms(alive)

        for q in [th, f"{th} {tm}", "editz", f"editz {th}"]:
            got = _rel(sh.topk(q, BIGK), skeys)
            want = _rel(ref.topk(q, BIGK, use_result_cache=False), rkeys)
            assert got == want, ("and", q)
            got = _rel(sh.topk(q, BIGK, mode="or"), skeys)
            want = _rel(
                ref.topk(q, BIGK, mode="or", use_result_cache=False), rkeys
            )
            assert got == want, ("or", q)

        got = _rel(sh.topk_phrase(f"{th} {tm}", BIGK), skeys)
        assert got == _rel(ref.topk_phrase(f"{th} {tm}", BIGK), rkeys)
        got = _rel(sh.topk_within(th, tm, 3, BIGK), skeys)
        assert got == _rel(ref.topk_within(th, tm, 3, BIGK), rkeys)

        for q in [
            f"{th} OR editz",
            f"editz AND NOT {tm}",
            f'"{th} {tm}" OR editz',
            f"edi* AND {th}",
            f"ed?t* AND {th}",  # wild node: live-sharded global expansion
            f"{th} <3> {tm}",
        ]:
            got = _rel(sh.topk_bool(q, BIGK), skeys)
            want = _rel(ref.topk_bool(q, BIGK, use_result_cache=False), rkeys)
            assert got == want, ("bool", q)

        got = _rel(sh.topk_prefix("edi", BIGK), skeys)
        assert got == _rel(
            ref._topk_prefix_uncached(["edi"], BIGK, 64), rkeys
        )
        got = _rel(sh.topk_wildcard("ed*t", BIGK), skeys)
        assert got == _rel(ref.topk_wildcard("ed*t", BIGK), rkeys)
        # fuzzy suggestions over the combined live vocabulary
        assert sh.suggest_terms("editx", k=3) == ref.suggest_terms(
            "editx", k=3
        )
    finally:
        sh.close()


def test_live_false_override_serves_stale_base(live_shards):
    """live=False pins the static view: edits/deletes invisible (the
    pre-r5 behavior, still the right mode for compacted-only layouts)."""
    sh = ShardedSearcher(
        live_shards["shard_dirs"], parallel=False, live=False
    )
    try:
        assert not sh.live
        assert sh.topk("editz", 10) == []  # delta-only term unseen
    finally:
        sh.close()


def test_static_shards_autodetect_stays_nonlive(spark, tmp_path):
    tdf = make_transcripts(n_conversations=20, mean_turns=4, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    dirs = []
    for i, cs in enumerate([convs[:10], convs[10:]]):
        sd = str(tmp_path / f"s{i}")
        _build(spark, sd, tdf[tdf["conv_id"].isin(cs)].reset_index(drop=True))
        dirs.append(sd)
    sh = ShardedSearcher(dirs, parallel=False)
    try:
        assert not sh.live  # no deltas anywhere → static LocalSearcher path
        an = get_analyzer("simple")
        t = an.tokenize_py(tdf["text"].iloc[0])[0]
        assert sh.topk(t, 5)
    finally:
        sh.close()


def test_live_sharded_service_full_response(live_shards):
    """ShardedSearchService auto-detects live shards and serves the full
    response (results + total_matched + facets + headlines + pagination +
    drill-down) exactly like a single SearchService over the alive
    rebuild — keyed compare, since docID spaces differ."""
    from discogsography_spark.query.serving import (
        SearchService,
        ShardedSearchService,
    )

    facet_defs = {"role": "role", "tool": "tool"}
    svc = ShardedSearchService(
        live_shards["shard_dirs"], facet_defs=facet_defs, parallel=False
    )
    ref = SearchService(live_shards["ref_dir"], facet_defs=facet_defs)
    try:
        assert svc.sharded.live
        skeys = _shard_keymap(svc.sharded, live_shards["shard_dirs"])
        rkeys = _ref_keymap(live_shards["ref_dir"])
        th, tm = _probe_terms(live_shards["alive"])

        for q, mode in [
            (f"{th} {tm}", "and"),
            ("editz", "and"),
            (f"{th} OR editz", "bool"),
            (f"edi* AND {th}", "bool"),
        ]:
            got = svc.search(q, BIGK, mode=mode, facets=["role", "tool"],
                             highlight=True)
            want = ref.search(q, BIGK, mode=mode, facets=["role", "tool"],
                              highlight=True)
            assert _rel(got.results, skeys) == _rel(want.results, rkeys), (
                q, mode)
            assert got.total_matched == want.total_matched, (q, mode)
            assert got.facets == want.facets, (q, mode)
            gh = {skeys[d]: h for d, h in got.headlines.items()}
            wh = {rkeys[d]: h for d, h in want.headlines.items()}
            assert gh == wh, (q, mode)

        # pagination: page == deep ranking slice, keyed-identical to single
        deep = svc.search(th, 30, mode="and").results
        page = svc.search(th, 10, mode="and", offset=10).results
        assert _rel(page, skeys) == _rel(deep[10:20], skeys)
        rp = ref.search(th, 10, mode="and", offset=10).results
        assert _rel(page, skeys) == _rel(rp, rkeys)

        # drill-down filter re-ranks with global alive stats
        got = svc.search("editz", BIGK, mode="and", filter={"role": "user"})
        want = ref.search("editz", BIGK, mode="and", filter={"role": "user"})
        assert _rel(got.results, skeys) == _rel(want.results, rkeys)
        assert got.total_matched == want.total_matched

        # did-you-mean over the combined live vocabulary
        got = svc.search(f"editzz {th}", 10, mode="and", fuzzy=True)
        want = ref.search(f"editzz {th}", 10, mode="and", fuzzy=True)
        assert got.rewrites == want.rewrites
        assert _rel(got.results, skeys) == _rel(want.results, rkeys)

        # round-5 surfaces on the LIVE sharded tier, keyed-identical to
        # the single alive rebuild:
        # field-collapsed top-k (conv labels are global — compare rows)
        gc = svc.collapse(f"{th} {tm}", "conv_id", 8)
        wc = ref.collapse(f"{th} {tm}", "conv_id", 8)
        assert [(g, round(s, 5), c) for g, _d, s, c in gc] == [
            (g, round(s, 5), c) for g, _d, s, c in wc
        ]
        # conversation context around a live hit (alive-only windows)
        ghit = svc.search("editz", 3, mode="and").results
        whit = ref.search("editz", 3, mode="and").results
        for (gd, _gs), (wd, _ws) in zip(ghit, whit):
            grows = [(c, t) for _d, c, t in svc.context(gd, 2)]
            wrows = [(c, t) for _d, c, t in ref.context(wd, 2)]
            assert grows == wrows
        # more-like-this from the same source turn (keyed compare)
        inv_s = {v: k for k, v in skeys.items()}
        inv_r = {v: k for k, v in rkeys.items()}
        src_key = skeys[ghit[0][0]]
        gm = svc.more_like_this(inv_s[src_key], 10)
        wm = ref.more_like_this(inv_r[src_key], 10)
        assert [(skeys[d], round(s, 5)) for d, s in gm] == [
            (rkeys[d], round(s, 5)) for d, s in wm
        ]
    finally:
        svc.close()


def test_rolling_consolidation_behind_fanout(live_shards, spark):
    """Per-shard MINOR compaction (consolidate_deltas) behind the live
    fan-out: consolidating ONE shard's delta tail — including through the
    worker-process pool, which rebuilds its MergedSearcher and must
    detect the promoted leg in-worker — leaves every mode bit-identical
    on the global view."""
    from discogsography_spark.streaming.incremental import (
        consolidate_deltas,
        list_deltas,
    )

    dirs = live_shards["shard_dirs"]
    th, tm = _probe_terms(live_shards["alive"])
    probes = [
        (f"{th} {tm}", "topk"),
        (f"{th} OR editz", "topk_bool"),
        (f"{th} {tm}", "topk_phrase"),  # positional stream of the
        # consolidated delta through the fan-out
    ]
    pre: dict = {}
    for par in (False, True):
        sh = ShardedSearcher(dirs, parallel=par)
        try:
            pre[par] = {
                (q, m): getattr(sh, m)(q, 25) for q, m in probes
            }
        finally:
            sh.close()
    assert pre[False] == pre[True]
    # consolidate shard 0's tail (shard 1 keeps raw deltas, shard 2 is
    # static — the mid-roll mixed layout)
    assert consolidate_deltas(spark, dirs[0]) >= 2
    assert len(list_deltas(dirs[0])) == 1
    for par in (False, True):
        sh2 = ShardedSearcher(dirs, parallel=par)
        try:
            for (q, m), want in pre[par].items():
                assert getattr(sh2, m)(q, 25) == want, (q, m, par)
        finally:
            sh2.close()


def test_streamed_router_and_rolling_compaction(spark, tmp_path):
    """Ingestion half + lifecycle: Structured Streaming micro-batches run
    through ShardedDeltaRouter (one delta per TOUCHED shard only), deletes
    route to the owning shard, the live sharded view equals a rebuild over
    the alive latest corpus, and shards compact one at a time — the mixed
    mid-roll layout answers exactly at every step (rolling compaction,
    never a global pause)."""
    import time as _time

    from discogsography_spark.query.serving import SearchService
    from discogsography_spark.streaming.incremental import (
        ShardedDeltaRouter,
        compact,
    )

    d = str(tmp_path)
    tdf = make_transcripts(n_conversations=90, mean_turns=4, vocab_size=250)
    convs = sorted(tdf["conv_id"].unique())
    bounds = [
        (None, convs[30]),
        (convs[30], convs[60]),
        (convs[60], None),
    ]
    shard_dirs = []
    for i, (lo, hi) in enumerate(bounds):
        part = tdf[
            ((lo is None) | (tdf["conv_id"] >= (lo or "")))
            & ((hi is None) | (tdf["conv_id"] < (hi or "￿")))
        ].reset_index(drop=True)
        sd = os.path.join(d, f"shard{i}")
        _build(spark, sd, part)
        shard_dirs.append(sd)

    fresh = make_transcripts(n_conversations=6, mean_turns=4, vocab_size=250,
                             seed=99)
    fresh["conv_id"] = "zzz-" + fresh["conv_id"]  # sorts into shard 2

    def _edit(cs, marker):
        t = tdf[tdf["conv_id"].isin(cs)].copy()
        t["text"] = t["text"] + f" {marker}"
        return t

    f0 = pd.concat(
        [_edit(convs[0:3], "rvtwo"), _edit(convs[31:33], "rvtwo")],
        ignore_index=True,
    )  # touches shards 0 and 1 ONLY
    f1 = fresh  # shard 2 only
    f2 = _edit(convs[61:64], "rvthree")  # shard 2 only

    stream_dir = os.path.join(d, "stream_in")
    os.makedirs(stream_dir)
    for i, f in enumerate((f0, f1, f2)):
        p = os.path.join(stream_dir, f"part-{i}.parquet")
        f.to_parquet(p, index=False)
        t = _time.time() - 300 + i * 60
        os.utime(p, (t, t))

    router = ShardedDeltaRouter(shard_dirs, bounds)
    schema = spark.read.parquet(
        os.path.join(d, "shard0.parquet")
    ).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .writeStream.foreachBatch(
            lambda df, bid: router.write_batch(df, bid, upsert=True)
        )
        .option("checkpointLocation", os.path.join(d, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # untouched shards got NO delta for batches that skipped them
    assert not os.path.isdir(
        os.path.join(shard_dirs[2], "deltas", "delta-000000")
    )
    assert not os.path.isdir(
        os.path.join(shard_dirs[0], "deltas", "delta-000001")
    )
    assert os.path.isdir(
        os.path.join(shard_dirs[2], "deltas", "delta-000002")
    )

    # routed deletes: one conv in shard 0, one streamed-in conv in shard 2
    del_keys = pd.DataFrame(
        {"conv_id": [convs[4], fresh["conv_id"].iloc[0]]}
    )
    n = router.write_deletes(spark.createDataFrame(del_keys), 3)
    assert n == int(
        (tdf["conv_id"] == convs[4]).sum()
        + (fresh["conv_id"] == fresh["conv_id"].iloc[0]).sum()
    )
    assert not os.path.isdir(
        os.path.join(shard_dirs[1], "deltas", "delta-000003")
    )

    # alive latest-version corpus
    latest = {c: tdf[tdf["conv_id"] == c] for c in convs}
    for cs, m in [(convs[0:3], "rvtwo"), (convs[31:33], "rvtwo"),
                  (convs[61:64], "rvthree")]:
        for c in cs:
            latest[c] = _edit([c], m)
    for c in fresh["conv_id"].unique():
        latest[c] = fresh[fresh["conv_id"] == c]
    for c in del_keys["conv_id"]:
        del latest[c]
    alive = pd.concat(latest.values(), ignore_index=True)
    ref_dir = os.path.join(d, "ref")
    _build(spark, ref_dir, alive)
    ref = LocalSearcher(ref_dir)
    rkeys = _ref_keymap(ref_dir)
    th, tm = _probe_terms(alive)
    probes_and = [th, f"{th} {tm}", "rvtwo", "rvthree"]
    probes_bool = [f"rvtwo OR rvthree", f"{th} AND NOT rvtwo"]

    def check():
        sh = ShardedSearcher(shard_dirs, parallel=False)
        try:
            assert sh.n_docs == len(alive)
            skeys = _shard_keymap(sh, shard_dirs)
            for qq in probes_and:
                assert _rel(sh.topk(qq, BIGK), skeys) == _rel(
                    ref.topk(qq, BIGK, use_result_cache=False), rkeys
                ), qq
            for qq in probes_bool:
                assert _rel(sh.topk_bool(qq, BIGK), skeys) == _rel(
                    ref.topk_bool(qq, BIGK, use_result_cache=False), rkeys
                ), qq
            assert _rel(sh.topk_phrase(f"{th} {tm}", BIGK), skeys) == _rel(
                ref.topk_phrase(f"{th} {tm}", BIGK), rkeys
            )
            return sh.live
        finally:
            sh.close()

    assert check() is True  # live view before any compaction
    # rolling compaction: one shard at a time, exact at every mid-step
    for sd in shard_dirs:
        compact(spark, sd)
        check()
    sh_final = ShardedSearcher(shard_dirs, parallel=False)
    try:
        assert sh_final.live is False  # fully compacted → static fast path
    finally:
        sh_final.close()


@pytest.mark.parametrize("par", [False, True])
def test_live_sharded_synonym_matches_alive_rebuild(live_shards, par):
    """topk_synonym across live shards (deltas + tombstones + one static
    shard) ≡ a fresh alive rebuild — the same net every other mode has."""
    sh = ShardedSearcher(live_shards["shard_dirs"], parallel=par)
    try:
        assert sh.live
        ref = LocalSearcher(live_shards["ref_dir"])
        skeys = _shard_keymap(sh, live_shards["shard_dirs"])
        rkeys = _ref_keymap(live_shards["ref_dir"])
        th, tm = _probe_terms(live_shards["alive"])
        cases = [
            (f"{th} {tm}", {th: ["editz"]}),
            ("editz", {"editz": [th, "zzqqneverseen"]}),
            (th, {th: [tm]}),
        ]
        n_nonempty = 0
        for q, syn in cases:
            got = _rel(sh.topk_synonym(q, BIGK, syn), skeys)
            want = _rel(ref.topk_synonym(q, BIGK, syn, use_result_cache=False), rkeys)
            assert got == want, ("synonym", q)
            n_nonempty += bool(got)
        assert n_nonempty >= 2
    finally:
        sh.close()


def test_live_sharded_aggregations_match_alive_rebuild(live_shards):
    """Round-6 aggregation surfaces on the LIVE sharded tier (mixed
    live/static shards) ≡ a fresh single index over the alive corpus:
    stats_fields, significant_terms (worker RPC routes to the
    MergedSearcher sig_fg_counts on live shards), grouped relevance, and
    numeric-range drill-down."""
    import pytest as _pytest

    from discogsography_spark.query.serving import (
        SearchService,
        ShardedSearchService,
    )

    svc = ShardedSearchService(live_shards["shard_dirs"], parallel=False)
    ref = SearchService(live_shards["ref_dir"])
    try:
        assert svc.sharded.live
        th, tm = _probe_terms(live_shards["alive"])
        q = f"{th} {tm}"

        a = ref.search(q, 5, stats_fields=["turn_idx"])
        b = svc.search(q, 5, stats_fields=["turn_idx"])
        assert a.stats["turn_idx"]["count"] == b.stats["turn_idx"]["count"]
        assert b.stats["turn_idx"]["sum"] == _pytest.approx(
            a.stats["turn_idx"]["sum"], rel=1e-12
        )

        ga = ref.significant_terms(q, k=10, sample=None)
        gb = svc.significant_terms(q, k=10, sample_per_shard=None)
        assert [(t, fg, bg) for t, fg, bg, _ in ga] == [
            (t, fg, bg) for t, fg, bg, _ in gb
        ]

        ra = ref.grouped_topk(q, "role", 10)
        rb = svc.grouped_topk(q, "role", 10)
        assert [(r[0], r[4]) for r in ra] == [(r[0], r[4]) for r in rb]
        for x, y in zip(ra, rb):
            for i in (1, 2, 3):
                assert y[i] == _pytest.approx(x[i], rel=1e-9)

        fa = ref.search(q, 5, filter={"turn_idx": (1.0, 3.0)})
        fb = svc.search(q, 5, filter={"turn_idx": (1.0, 3.0)})
        assert fa.total_matched == fb.total_matched
    finally:
        svc.close()
