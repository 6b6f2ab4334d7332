"""Scale-proof the round-5 serving surfaces (collapse / context / MLT) on
the 12M-doc sf1.0 scale-proof index, in a fresh process (the honest-latency
discipline from bench.py: no live builder JVM nearby).

    python scripts/r5_surfaces_scale.py [sf] [n_queries]

Reports init costs (one-time docmap loads) and per-query p50/p95 for:
- collapse by conv_id (best turn per conversation) over the query set;
- context windows (±2 turns) for the top-5 hits of each query;
- more_like_this over a deterministic stride of source docs.
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


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    root = f"/tmp/spark_graft_bench/scaleproof_sf{sf}"
    idx = sys.argv[3] if len(sys.argv) > 3 else os.path.join(root, "idx")
    corpus = f"/tmp/spark_graft_bench/corpus_sf{sf}"
    if not os.path.isdir(idx):
        raise SystemExit(f"run scripts/scale_proof.py {sf} first ({idx} missing)")

    from discogsography_spark.query.serving import SearchService

    out: dict = {"sf": sf, "index": idx}
    svc = SearchService(idx)
    qdf = pd.read_parquet(os.path.join(corpus, "queries.parquet")).head(nq)

    # one-time loads, measured separately from per-query latency
    t0 = time.time()
    codes, cats = svc._collapse_codes("conv_id")
    out["collapse_codes_init_s"] = round(time.time() - t0, 2)
    out["n_groups"] = int(len(cats))
    t0 = time.time()
    svc.context(0, 1)
    out["context_index_init_s"] = round(time.time() - t0, 2)

    for _, row in qdf.iterrows():  # warm decoded-postings caches
        svc.searcher.topk(row["query_text"], int(row["k"]))

    col_ms = []
    for _, row in qdf.iterrows():
        t0 = time.time()
        svc.collapse(row["query_text"], "conv_id", int(row["k"]))
        col_ms.append((time.time() - t0) * 1000.0)
    ctx_ms = []
    for _, row in qdf.iterrows():
        hits = svc.searcher.topk(row["query_text"], 5)
        t0 = time.time()
        for d, _s in hits:
            svc.context(d, 2)
        ctx_ms.append((time.time() - t0) * 1000.0)
    n = svc.meta.n_docs
    mlt_docs = list(range(0, n, max(1, n // nq)))[:nq]
    for d in mlt_docs:
        svc.more_like_this(d, 10)
    mlt_ms = []
    for d in mlt_docs:
        t0 = time.time()
        svc.more_like_this(d, 10)
        mlt_ms.append((time.time() - t0) * 1000.0)

    for name, arr in [("collapse", col_ms), ("context5", ctx_ms), ("mlt", mlt_ms)]:
        a = np.array(arr)
        out[f"{name}_p50_ms"] = round(float(np.percentile(a, 50)), 2)
        out[f"{name}_p95_ms"] = round(float(np.percentile(a, 95)), 2)
        out[f"{name}_max_ms"] = round(float(a.max()), 2)
    out["n_docs"] = n
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
