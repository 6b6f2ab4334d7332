"""Sharded scale-pin for the round-6 session-3 surfaces — served synonym
search, boosted BM25, matched-set stats, significant terms — through the
8-shard deployment shape at sf1.0 (12M turns), fresh process, no builder
JVM nearby (bench.py's honest-latency discipline).

    python scripts/r6_session3_scale.py [sf] [n_queries]

Requires scripts/scale_proof.py artifacts (shard-00* under
/tmp/spark_graft_bench/scaleproof_sf{sf}). One JSON line: init costs +
per-surface p50/p95. Single-node sf0.1 context (BENCH/BASELINE.md r6s3):
synonym served p95 53.5 ms, boosted 13.0 ms, stats 17.5 ms, significant
terms 104 ms — the sharded numbers here are the 10x-corpus design point.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd


def _pcts(ms: list[float]) -> tuple[float, float]:
    a = np.array(ms)
    return (
        round(float(np.percentile(a, 50)), 2),
        round(float(np.percentile(a, 95)), 2),
    )


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    root = f"/tmp/spark_graft_bench/scaleproof_sf{sf}"
    corpus = f"/tmp/spark_graft_bench/corpus_sf{sf}"
    shard_dirs = sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("shard-")
    )
    if not shard_dirs:
        raise SystemExit(f"run scripts/scale_proof.py {sf} first")

    from discogsography_spark.query.serving import ShardedSearchService

    out: dict = {"sf": sf, "n_shards": len(shard_dirs), "n_queries": nq}
    t0 = time.time()
    svc = ShardedSearchService(
        shard_dirs, facet_defs={"role": "role", "tool": "tool"}
    )
    out["open_s"] = round(time.time() - t0, 2)
    qdf = pd.read_parquet(os.path.join(corpus, "queries.parquet")).head(nq)
    cases = []
    for _, row in qdf.iterrows():
        ts = row["query_text"].split()
        cases.append(
            (row["query_text"], {ts[0]: [ts[-1]]}, int(row["k"]))
        )

    # ---- served synonym (facets + totals + group ranking) ----
    for q, sy, kk in cases:  # warm decode/bitmap caches
        svc.search(q, kk, synonyms=sy, facets=["role", "tool"])
    syn_ms = []
    for q, sy, kk in cases:
        t0 = time.time()
        svc.search(q, kk, synonyms=sy, facets=["role", "tool"])
        syn_ms.append((time.time() - t0) * 1000.0)
    out["synonym_served_p50_ms"], out["synonym_served_p95_ms"] = _pcts(syn_ms)

    # ---- boosted fan-out (idf-injection, no response assembly) ----
    bq = [
        (" ".join([f"{q.split()[0]}^2"] + q.split()[1:]), kk)
        for q, _sy, kk in cases
    ]
    for q, kk in bq:
        svc.sharded.topk_boosted(q, kk)
    bo_ms = []
    for q, kk in bq:
        t0 = time.time()
        svc.sharded.topk_boosted(q, kk)
        bo_ms.append((time.time() - t0) * 1000.0)
    out["boosted_p50_ms"], out["boosted_p95_ms"] = _pcts(bo_ms)

    # ---- stats_fields metric aggregation ----
    for q, _sy, kk in cases[:10]:
        svc.search(q, kk, stats_fields=["turn_idx"])
    st_ms = []
    for q, _sy, kk in cases:
        t0 = time.time()
        svc.search(q, kk, stats_fields=["turn_idx"])
        st_ms.append((time.time() - t0) * 1000.0)
    out["stats_agg_p50_ms"], out["stats_agg_p95_ms"] = _pcts(st_ms)

    # ---- significant terms (sampled discovery, exact stats) ----
    # cold = first sight of each query's candidate set (worker decode
    # I/O); steady = the serving amortization across a query stream —
    # the same cold/steady split bench.py applies to BM25
    sig_qs = [q for q, _sy, _kk in cases][:20]
    sg_cold = []
    for q in sig_qs:
        t0 = time.time()
        svc.significant_terms(q, k=10, sample_per_shard=200)
        sg_cold.append((time.time() - t0) * 1000.0)
    sg_ms = []
    for q in sig_qs:
        t0 = time.time()
        svc.significant_terms(q, k=10, sample_per_shard=200)
        sg_ms.append((time.time() - t0) * 1000.0)
    out["significant_cold_p50_ms"], out["significant_cold_p95_ms"] = _pcts(
        sg_cold
    )
    out["significant_p50_ms"], out["significant_p95_ms"] = _pcts(sg_ms)

    svc.close()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
