"""Sharded scale-pin for the round-5 result surfaces — collapse /
conversation context / more-like-this through the 8-shard WORKER-POOL
deployment shape at sf1.0 (12M turns), in this process with no builder
JVM nearby (the honest-latency discipline from bench.py).

    python scripts/r6_sharded_surfaces.py [sf] [n_queries]

Requires scripts/scale_proof.py artifacts (shard-00* under
/tmp/spark_graft_bench/scaleproof_sf{sf}). Reports one JSON line with
init costs (docmap/code-array loads are one-time) and per-query p50/p95
per surface. Single-node context: the round-5 single-index numbers were
collapse p95 1.58 s (exact group counts = facet-tier cost) and MLT p95
273 ms at 12M docs — the sharded pool is the design point the VERDICT
asked to pin (expectation: collapse p95 well under 100 ms)."""

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
    svc = ShardedSearchService(shard_dirs)
    out["open_s"] = round(time.time() - t0, 2)
    qdf = pd.read_parquet(os.path.join(corpus, "queries.parquet")).head(nq)

    t0 = time.time()
    svc.services[0]._collapse_codes("conv_id")  # triggers per-shard loads
    for s in svc.services[1:]:
        s._collapse_codes("conv_id")
    out["collapse_codes_init_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    for sv in svc.services:  # context index is per-shard and lazy
        sv.context(0, 1)
    out["context_index_init_s"] = round(time.time() - t0, 2)

    for _, row in qdf.iterrows():  # warm the pool's decoded caches
        svc.sharded.topk(row["query_text"], int(row["k"]))

    col_ms, colnc_ms, ctx_ms, mlt_ms = [], [], [], []
    top_docs: list[int] = []
    for _, row in qdf.iterrows():
        q, kk = row["query_text"], int(row["k"])
        t0 = time.time()
        rows = svc.collapse(q, "conv_id", kk)
        col_ms.append((time.time() - t0) * 1000.0)
        top_docs.extend(d for _g, d, _s, _c in rows[:2])
    for _, row in qdf.iterrows():
        q, kk = row["query_text"], int(row["k"])
        t0 = time.time()
        svc.collapse(q, "conv_id", kk, counts=False)
        colnc_ms.append((time.time() - t0) * 1000.0)
    # steady-state exact-counts pass: term decodes are warm (a serving
    # node amortizes them across the query stream) — the first pass above
    # is the cold tier
    col_steady_ms = []
    for _, row in qdf.iterrows():
        q, kk = row["query_text"], int(row["k"])
        t0 = time.time()
        svc.collapse(q, "conv_id", kk)
        col_steady_ms.append((time.time() - t0) * 1000.0)
    for d in top_docs[: nq]:
        t0 = time.time()
        svc.context(int(d), 2)
        ctx_ms.append((time.time() - t0) * 1000.0)
    stride = max(1, svc.sharded.n_docs // nq)
    for i in range(nq):
        t0 = time.time()
        svc.more_like_this(i * stride, 10)
        mlt_ms.append((time.time() - t0) * 1000.0)
    svc.close()

    out["collapse_cold_p50_ms"], out["collapse_cold_p95_ms"] = _pcts(col_ms)
    out["collapse_steady_p50_ms"], out["collapse_steady_p95_ms"] = _pcts(
        col_steady_ms
    )
    out["collapse_nocounts_p50_ms"], out["collapse_nocounts_p95_ms"] = _pcts(
        colnc_ms
    )
    out["context_p50_ms"], out["context_p95_ms"] = _pcts(ctx_ms)
    out["mlt_p50_ms"], out["mlt_p95_ms"] = _pcts(mlt_ms)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
