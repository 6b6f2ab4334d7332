"""Recommendation operators vs independent naive Python implementations.

The naive references below re-implement the reference's scoring directly
(compute_similar_artists, recommend_queries.py:215-268, and
merge_recommendation_candidates, :281-330) over plain dicts — no Spark, no
shared code with operators/recommend.py — so agreement is a real check.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from discogsography_spark.operators.recommend import (
    merge_signal_candidates,
    profile_cosine_topk,
)


def _naive_cosine(a: dict, b: dict) -> float:
    shared = set(a) & set(b)
    dot = sum(a[k] * b[k] for k in shared)
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    if na == 0 or nb == 0:
        return 0.0
    return dot / (na * nb)


def _naive_similar(rows, target, weights, k, candidate_dim, min_shared, cap):
    """rows: [(entity, dim, value, cnt)] -> ranked [(entity, sim)]."""
    prof: dict = {}
    for e, d, v, c in rows:
        prof.setdefault(e, {}).setdefault(d, {})[v] = (
            prof.get(e, {}).get(d, {}).get(v, 0) + c
        )
    tgt = prof.get(target, {})
    tseed = tgt.get(candidate_dim, {})
    cands = []
    for e, dims in prof.items():
        if e == target:
            continue
        shared = sum(
            c for v, c in dims.get(candidate_dim, {}).items() if v in tseed
        )
        if shared >= min_shared:
            cands.append((e, shared))
    cands.sort(key=lambda x: (-x[1], x[0]))
    cands = cands[:cap]
    out = []
    for e, shared in cands:
        score = 0.0
        for d, w in weights:
            score += w * _naive_cosine(tgt.get(d, {}), prof[e].get(d, {}))
        if score > 0.0:
            out.append((e, round(score, 6), shared))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_profile_cosine_topk_matches_naive(spark, seed):
    rng = random.Random(seed)
    dims = ["genre", "style", "label"]
    vals = {d: [f"{d}{i}" for i in range(6)] for d in dims}
    rows = []
    for e in range(1, 25):
        for d in dims:
            for v in rng.sample(vals[d], rng.randint(1, 4)):
                rows.append((e, d, v, rng.randint(1, 9)))
    weights = [("genre", 0.5), ("style", 0.3), ("label", 0.2)]
    df = spark.createDataFrame(rows, "entity long, dim string, value string, cnt long")
    got = profile_cosine_topk(
        df, 1, weights, k=10, candidate_dim="genre", min_shared=2,
        candidate_cap=15,
    ).collect()
    want = _naive_similar(rows, 1, weights, 10, "genre", 2, 15)
    assert [(r["entity"], r["similarity"], r["shared_count"]) for r in got] == want
    # per-dim breakdown spot check against naive cosine on the top row
    if got:
        prof: dict = {}
        for e, d, v, c in rows:
            prof.setdefault(e, {}).setdefault(d, {})[v] = (
                prof.get(e, {}).get(d, {}).get(v, 0) + c
            )
        top = got[0]
        for d, _w in weights:
            naive = round(
                _naive_cosine(prof[1].get(d, {}), prof[top["entity"]].get(d, {})), 4
            )
            assert top[f"sim_{d}"] == pytest.approx(naive, abs=1e-9)


def _naive_merge(signals, collectors, ow, k):
    """signals: [(name, weight, [(id, score)])] — direct port of
    merge_recommendation_candidates semantics."""
    merged: dict = {}
    for name, w, cand in signals:
        mx = max((s for _i, s in cand), default=0.0)
        for i, s in cand:
            ns = s / mx if mx > 0 else s
            ent = merged.setdefault(i, {"score": 0.0, "reasons": []})
            ent["score"] += ns * w
            ent["reasons"].append(name)
    if collectors is not None and merged:
        known = {i: collectors[i] for i in merged if i in collectors}
        mxc = max(known.values()) if known else 0
        for i, ent in merged.items():
            c = collectors.get(i, mxc)
            obsc = 1.0 - (c / mxc) if mxc > 0 else 0.0
            ent["score"] += obsc * ow
    out = [
        (i, round(e["score"], 6), ",".join(sorted(e["reasons"])))
        for i, e in merged.items()
    ]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("seed", [0, 3])
def test_merge_signal_candidates_matches_naive(spark, seed):
    rng = random.Random(seed)
    ids = list(range(100, 140))
    signals = []
    for name, w in [("a", 0.35), ("b", 0.25), ("c", 0.25)]:
        cand = [(i, float(rng.randint(1, 20))) for i in rng.sample(ids, 12)]
        signals.append((name, w, cand))
    collectors = {i: rng.randint(1, 30) for i in rng.sample(ids, 30)}
    sdfs = [
        (n, w, spark.createDataFrame(c, "id long, score double"))
        for n, w, c in signals
    ]
    cdf = spark.createDataFrame(
        list(collectors.items()), "id long, collectors long"
    )
    got = merge_signal_candidates(
        sdfs, collectors=cdf, obscurity_weight=0.15, k=15
    ).collect()
    want = _naive_merge(signals, collectors, 0.15, 15)
    assert [(r["id"], r["score"], r["reasons"]) for r in got] == [
        (i, pytest.approx(s, abs=1e-9), r) for i, s, r in want
    ]


def test_merge_without_collectors(spark):
    a = spark.createDataFrame([(1, 10.0), (2, 5.0)], "id long, score double")
    b = spark.createDataFrame([(2, 4.0), (3, 2.0)], "id long, score double")
    got = merge_signal_candidates(
        [("x", 0.6, a), ("y", 0.4, b)], collectors=None, k=10
    ).collect()
    # id 2: 0.6*0.5 + 0.4*1.0 = 0.7 ; id 1: 0.6 ; id 3: 0.4*0.5 = 0.2
    assert [(r["id"], r["score"], r["reasons"]) for r in got] == [
        (2, 0.7, "x,y"),
        (1, 0.6, "x"),
        (3, 0.2, "y"),
    ]


def test_profile_cosine_plan_no_cartesian(spark):
    rows = [(e, "g", f"v{e % 3}", 2) for e in range(1, 12)]
    df = spark.createDataFrame(rows, "entity long, dim string, value string, cnt long")
    out = profile_cosine_topk(df, 1, [("g", 1.0)], k=5, min_shared=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_hot_value_cap_drops_mega_values(spark):
    # every entity shares value "hot"; capping fan-out removes it from all
    # profiles so the only signal left is the rare values.
    rows = [(e, "g", "hot", 5) for e in range(1, 11)]
    rows += [(1, "g", "rare", 3), (2, "g", "rare", 3)]
    df = spark.createDataFrame(rows, "entity long, dim string, value string, cnt long")
    got = profile_cosine_topk(
        df, 1, [("g", 1.0)], k=5, min_shared=1, hot_value_cap=5
    ).collect()
    assert [r["entity"] for r in got] == [2]
    assert got[0]["similarity"] == 1.0
