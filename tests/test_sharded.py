"""Sharded serving: four conv-range shard indexes queried through
ShardedSearcher with global statistics must be BIT-IDENTICAL to a single
index built over the whole corpus — docIDs, scores, and tiebreaks."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.corpus import make_queries, make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.query.sharded import ShardedSearcher


@pytest.fixture(scope="module")
def sharded_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded")
    tdf = make_transcripts(n_conversations=160, mean_turns=6, vocab_size=500)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)

    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=4, head_df_threshold=300).build(
        spark.read.parquet(full_p)
    )

    shard_dirs = []
    bounds = [convs[i * len(convs) // 4] for i in range(1, 4)]
    ranges = list(zip([None, *bounds], [*bounds, None]))
    for i, (lo, hi) in enumerate(ranges):
        m = tdf["conv_id"].map(lambda c: (lo is None or c >= lo) and (hi is None or c < hi))
        p = str(d / f"shard{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"shard{i}_idx")
        # different per-shard settings on purpose: sharding must not depend
        # on segment counts or head thresholds
        IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)
    return {"full_idx": full_idx, "shards": shard_dirs, "tdf": tdf}


def test_sharded_bit_identical_to_full_index(sharded_setup):
    full = LocalSearcher(sharded_setup["full_idx"])
    sharded = ShardedSearcher(sharded_setup["shards"])
    assert sharded.n_docs == full.meta.n_docs
    assert sharded.total_tokens == full.meta.total_tokens

    queries = make_queries(sharded_setup["tdf"], n_queries=25)
    n_nonempty = 0
    for _, q in queries.iterrows():
        want = full.topk(q["query_text"], int(q["k"]))
        got = sharded.topk(q["query_text"], int(q["k"]))
        assert [d for d, _ in got] == [d for d, _ in want], q["query_text"]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == ws, f"{q['query_text']}: {gs!r} != {ws!r}"
        n_nonempty += bool(got)
    assert n_nonempty > 10


def test_sharded_handles_term_missing_in_some_shards(sharded_setup):
    full = LocalSearcher(sharded_setup["full_idx"])
    sharded = ShardedSearcher(sharded_setup["shards"])
    # conv-specific tail words live in exactly one shard; conjunctions with
    # a head word must still match the full index
    tdf = sharded_setup["tdf"]
    sample_text = tdf.iloc[5]["text"]
    from discogsography_spark.analysis import tokenize_py

    toks = tokenize_py(sample_text)
    rare = next((t for t in toks if t.startswith("w0")), toks[0])
    q = f"{rare} spark"
    assert sharded.topk(q, 10) == full.topk(q, 10)
    assert sharded.topk("zzqqxx spark", 10) == []


@pytest.fixture(scope="module")
def pos_sharded_setup(spark, tmp_path_factory):
    """Positional builds of the same corpus, whole vs 3 conv-range shards."""
    from discogsography_spark.corpus import make_transcripts

    d = tmp_path_factory.mktemp("pos_sharded")
    tdf = make_transcripts(n_conversations=120, mean_turns=6, vocab_size=400, seed=5)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(
        full_idx, num_segments=4, head_df_threshold=250, with_positions=True
    ).build(spark.read.parquet(full_p))
    shard_dirs = []
    bounds = [convs[40], convs[80]]
    for i, (lo, hi) in enumerate(zip([None, *bounds], [*bounds, None])):
        m = tdf["conv_id"].map(
            lambda c: (lo is None or c >= lo) and (hi is None or c < hi)
        )
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(
            idx, num_segments=2, head_df_threshold=10**9, with_positions=True
        ).build(spark.read.parquet(p))
        shard_dirs.append(idx)
    return {"full": full_idx, "shards": shard_dirs, "tdf": tdf}


def test_sharded_or_prefix_phrase_bit_identical(pos_sharded_setup):
    full = LocalSearcher(pos_sharded_setup["full"])
    sharded = ShardedSearcher(pos_sharded_setup["shards"])
    n_nonempty = 0
    for q, k in [("spark index", 10), ("merge batch turn", 15), ("w0 spark", 8)]:
        got = sharded.topk(q, k, mode="or")
        want = full.topk(q, k, mode="or", use_result_cache=False)
        assert got == want, ("or", q)
        n_nonempty += bool(got)
    for q, k in [("sp", 10), ("sp to", 10), ("w00 turn", 8), ("zzqq", 5)]:
        got = sharded.topk_prefix(q, k)
        want = full.topk_prefix(q, k)
        assert got == want, ("prefix", q)
        n_nonempty += bool(got)
    for q, k in [("spark index", 10), ("index spark", 10), ("turn turn", 8)]:
        got = sharded.topk_phrase(q, k)
        want = full.topk_phrase(q, k)
        assert got == want, ("phrase", q)
        n_nonempty += bool(got)
    assert n_nonempty >= 6


def test_sharded_bool_bit_identical(sharded_setup):
    full = LocalSearcher(sharded_setup["full_idx"])
    sharded = ShardedSearcher(sharded_setup["shards"])
    tdf = sharded_setup["tdf"]
    # head terms of the corpus, deterministically
    from collections import Counter

    from discogsography_spark.analysis import get_analyzer

    an = get_analyzer("simple")
    cnt = Counter(t for text in tdf["text"] for t in set(an.tokenize_py(text)))
    a, b, c, d = [t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]
    for q in (
        f"{a} AND ({b} OR {c}) AND NOT {d}",
        f"({a} OR {b}) AND NOT ({c} OR {d})",
        f"{a} {b} OR {c}",
    ):
        want = full.topk_bool(q, 12, use_result_cache=False)
        got = sharded.topk_bool(q, 12)
        assert got == want, q


def test_sharded_bool_prefix_bit_identical(sharded_setup):
    """Prefix-in-boolean across shards uses the GLOBAL capped expansion —
    must equal the whole-corpus index exactly."""
    full = LocalSearcher(sharded_setup["full_idx"])
    sharded = ShardedSearcher(sharded_setup["shards"])
    tdf = sharded_setup["tdf"]
    from collections import Counter

    from discogsography_spark.analysis import get_analyzer

    an = get_analyzer("simple")
    cnt = Counter(t for text in tdf["text"] for t in set(an.tokenize_py(text)))
    a, b = [t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]]
    for q in (f"{a[:2]}* AND NOT {b}", f"w000* OR {a}"):
        got = sharded.topk_bool(q, 12)
        want = full.topk_bool(q, 12, use_result_cache=False)
        assert got == want, q


def test_parallel_fanout_identical_to_sequential(sharded_setup):
    """All three fan-out modes — worker processes (default), thread pool,
    sequential loop — must be bit-identical in every query mode: an
    order-preserving dispatch with no shared mutable state."""
    proc = ShardedSearcher(sharded_setup["shards"], parallel=True)
    thr = ShardedSearcher(sharded_setup["shards"], parallel="thread")
    seq = ShardedSearcher(sharded_setup["shards"], parallel=False)
    assert proc._procs is not None and proc._pool is None
    assert thr._pool is not None and thr._procs is None
    assert seq._pool is None and seq._procs is None
    queries = make_queries(sharded_setup["tdf"], n_queries=10)
    for _, q in queries.iterrows():
        qt, k = q["query_text"], int(q["k"])
        want = seq.topk(qt, k)
        assert proc.topk(qt, k) == want and thr.topk(qt, k) == want
        want_or = seq.topk(qt, k, mode="or")
        assert proc.topk(qt, k, mode="or") == want_or
        assert thr.topk(qt, k, mode="or") == want_or
    for q in ("(spark OR index) AND NOT merge", "w* AND spark"):
        want = seq.topk_bool(q, 10)
        assert proc.topk_bool(q, 10) == want and thr.topk_bool(q, 10) == want
    assert proc.topk_prefix("spa", 10) == seq.topk_prefix("spa", 10)
    assert proc.suggest_terms("sparkz", k=5) == seq.suggest_terms("sparkz", k=5)
    proc.close()
    thr.close()


def test_sharded_within_bit_identical(pos_sharded_setup):
    """Proximity (`a <N> b`) across positional shards must equal the
    whole-corpus positional index — the last query mode joining the
    sharded parity matrix."""
    full = LocalSearcher(pos_sharded_setup["full"])
    sharded = ShardedSearcher(pos_sharded_setup["shards"])
    n_nonempty = 0
    for w1, w2, win, k in [
        ("spark", "index", 3, 10),
        ("index", "spark", 3, 10),   # symmetric — either order
        ("spark", "index", 1, 10),
        ("turn", "turn", 2, 8),      # same-term proximity
        ("merge", "window", 5, 10),
        ("spark", "zzqqabsent", 3, 5),
    ]:
        got = sharded.topk_within(w1, w2, win, k)
        want = full.topk_within(w1, w2, win, k)
        assert got == want, (w1, w2, win)
        n_nonempty += bool(got)
    assert n_nonempty >= 3


def test_worker_pool_respawns_dead_shard(sharded_setup):
    """Killing a shard worker mid-serving must not take the searcher down:
    the pool respawns the worker from its shard directory and the query
    retries transparently, results unchanged."""
    import os
    import signal
    import time

    s = ShardedSearcher(sharded_setup["shards"], parallel=True)
    want = s.topk("spark index", 10)
    victim = s._procs._procs[1]
    os.kill(victim.pid, signal.SIGKILL)
    victim.join(timeout=5)
    time.sleep(0.1)
    got = s.topk("spark index", 10)
    assert got == want
    assert s._procs._procs[1].pid != victim.pid  # genuinely respawned
    s.close()


def test_worker_pool_survives_worker_side_error(sharded_setup):
    """A worker-side exception must (a) re-raise with its ORIGINAL type
    (sequential/parallel error-contract parity) and (b) leave the pipe
    protocol clean — the next query on the same pool returns correct
    results, not the failed query's leftovers."""
    s = ShardedSearcher(sharded_setup["shards"], parallel=True)
    want = s.topk("spark index", 10)
    # phrase query on non-positional shards → ValueError in every worker
    with pytest.raises(ValueError, match="with_positions"):
        s.topk_phrase("spark index", 5)
    # pool still in sync: same query, same results
    assert s.topk("spark index", 10) == want
    assert s.topk("merge", 5) == ShardedSearcher(
        sharded_setup["shards"], parallel=False
    ).topk("merge", 5)
    s.close()


def test_start_method_picker_and_spawn_parity(sharded_setup):
    """ADVICE r4: forking a multithreaded parent (live PySpark driver) is
    unsafe. The picker must choose spawn when threads exist and __main__ is
    a real file (pytest qualifies), and a spawn pool must answer
    bit-identically to fork/sequential."""
    import threading

    from discogsography_spark.query.shardpool import (
        ShardWorkerPool,
        _pick_start_method,
    )

    # pytest under a built Spark fixture has JVM/py4j threads alive
    assert threading.active_count() > 1
    assert _pick_start_method() == "spawn"

    # the real serving path: parallel=True builds a ShardWorkerPool, whose
    # picker chooses spawn here — must stay bit-identical to sequential
    seq = ShardedSearcher(sharded_setup["shards"], parallel=False)
    par = ShardedSearcher(sharded_setup["shards"], parallel=True)
    try:
        assert par._procs is not None
        assert par._procs._ctx.get_start_method() == "spawn"
        for q in ("spark index", "merge window"):
            assert par.topk(q, 10) == seq.topk(q, 10)
        assert par.topk_bool("spark AND NOT merge", 10) == seq.topk_bool(
            "spark AND NOT merge", 10
        )
    finally:
        par.close()

    # explicit start_method= still overrides the picker
    pool = ShardWorkerPool(sharded_setup["shards"][:1], start_method="fork")
    try:
        assert pool._ctx.get_start_method() == "fork"
    finally:
        pool.close()


def test_worker_exits_on_interrupt(sharded_setup):
    """ADVICE r4: a KeyboardInterrupt delivered to a worker must terminate
    it (exit, pipe EOF) — not be swallowed and reported as a shard query
    failure."""
    import signal
    import time

    from discogsography_spark.query.shardpool import ShardWorkerPool

    pool = ShardWorkerPool(sharded_setup["shards"][:1], start_method="fork")
    try:
        out = pool.call("topk", [{"query_text": "spark", "k": 3}])
        assert out[0] is not None
        victim = pool._procs[0]
        os.kill(victim.pid, signal.SIGINT)
        victim.join(timeout=5)
        # worker must be DEAD (interrupt not caught-and-replied); the pool's
        # respawn policy then serves the retry from a fresh worker
        deadline = time.time() + 5
        while victim.is_alive() and time.time() < deadline:
            time.sleep(0.05)
        assert not victim.is_alive()
        out2 = pool.call("topk", [{"query_text": "spark", "k": 3}])
        assert out2 == out
    finally:
        pool.close()


@pytest.fixture(scope="module")
def skewed_avgdl_setup(spark, tmp_path_factory):
    """Shards with DELIBERATELY different avgdl (short-doc shard vs
    long-doc shard): the worst case for injected-global-stat pruning,
    where each shard's stored tfnorm bounds (baked with LOCAL avgdl)
    underestimate true contributions under the larger global avgdl."""
    d = tmp_path_factory.mktemp("skewshard")
    short = make_transcripts(n_conversations=60, mean_turns=4, vocab_size=300)
    short["text"] = short["text"].str.split().str[:6].str.join(" ")
    long = make_transcripts(n_conversations=60, mean_turns=4, vocab_size=300)
    long["conv_id"] = "z" + long["conv_id"]
    long["text"] = (long["text"] + " ") * 6 + long["text"]
    import pandas as pd

    tdf = pd.concat([short, long], ignore_index=True)
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=2).build(spark.read.parquet(full_p))
    shard_dirs = []
    for i, part in enumerate([short, long]):
        p = str(d / f"s{i}.parquet")
        part.to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
        shard_dirs.append(idx)
    return {"full_idx": full_idx, "shards": shard_dirs, "tdf": tdf}


def test_sharded_exact_under_skewed_avgdl(skewed_avgdl_setup):
    """Regression (r5): per-shard champion order and block-max bounds bake
    in the shard-LOCAL avgdl; with global stats injected, the single-term
    champion fast path returned champion-order (not score-order) results
    and block-max/essential-list pruning could drop true top-k docs. The
    sweep over k makes the set monotone property load-bearing."""
    full = LocalSearcher(skewed_avgdl_setup["full_idx"])
    sharded = ShardedSearcher(skewed_avgdl_setup["shards"], parallel=False)
    # shard avgdls genuinely differ — the fixture's whole point
    avgdls = [LocalSearcher(s).meta.avgdl for s in skewed_avgdl_setup["shards"]]
    assert max(avgdls) > 2 * min(avgdls)
    tdf = skewed_avgdl_setup["tdf"]
    from collections import Counter

    from discogsography_spark.analysis import get_analyzer

    an = get_analyzer(sharded.analyzer)
    cnt = Counter(
        t for text in tdf["text"] for t in set(an.tokenize_py(text))
    )
    common = [t for t, _ in cnt.most_common(4)]
    a, b = common[0], common[1]
    queries = [
        (a, "and"), (a, "or"),                      # single-term champion path
        (f"{a} {b}", "and"), (f"{a} {b}", "or"),    # AND block-max / OR essential
        (f"{a} OR zzqqabsent", "bool"),             # single-present OR delegation
        (f"{a} OR {b}", "bool"),
        (f"{a} AND NOT {b}", "bool"),
    ]
    for q, mode in queries:
        for k in (1, 3, 7, 11, 25, 50):
            if mode == "bool":
                want = full.topk_bool(q, k, use_result_cache=False)
                got = sharded.topk_bool(q, k)
            else:
                want = full.topk(q, k, mode=mode, use_result_cache=False)
                got = sharded.topk(q, k, mode=mode)
            assert got == want, (q, mode, k)
