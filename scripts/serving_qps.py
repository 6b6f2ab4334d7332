"""Per-node serving throughput: aggregate QPS and per-query latency under
K concurrent worker processes, each owning a LocalSearcher over the SAME
index directory (the share-nothing replica model a serving tier runs —
one process per core, OS page cache shares the mmapped parquet bytes).

    python scripts/serving_qps.py [sf] [duration_sec] [concurrency ...]

Each worker loops the 40-query set round-robin (result memo OFF — every
hit is a real evaluation) for `duration_sec`, reporting its query count
and latencies; the parent reports, per concurrency level: aggregate QPS,
p50/p95 latency, and scaling efficiency vs 1 worker. Workers spawn fresh
(no forked JVM state) and warm for 2 s before the timed window.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _worker(idx_dir: str, qpath: str, dur: float, out_q) -> None:
    import pandas as pd

    sys.path.insert(0, REPO)
    from discogsography_spark.query.engine import LocalSearcher

    qdf = pd.read_parquet(qpath)
    queries = [(r["query_text"], int(r["k"])) for _, r in qdf.iterrows()]
    s = LocalSearcher(idx_dir)
    t_end = time.time() + 2.0
    i = 0
    while time.time() < t_end:  # warm: decoded-postings caches, page cache
        q, k = queries[i % len(queries)]
        s.topk(q, k, use_result_cache=False)
        i += 1
    lat = []
    t_end = time.time() + dur
    i = 0
    while time.time() < t_end:
        q, k = queries[i % len(queries)]
        t0 = time.time()
        s.topk(q, k, use_result_cache=False)
        lat.append(time.time() - t0)
        i += 1
    out_q.put(lat)


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    levels = [int(x) for x in sys.argv[3:]] or [1, 4, 8, 16]
    from bench import ensure_corpus

    corpus = ensure_corpus(sf)
    idx_dir = f"/tmp/spark_graft_bench/index_sf{sf}_32"
    if not os.path.isdir(idx_dir):
        raise SystemExit(f"run bench.py first ({idx_dir} missing)")
    qpath = os.path.join(corpus, "queries.parquet")

    ctx = mp.get_context("spawn")
    out: dict = {"sf": sf, "duration_s": dur, "levels": []}
    base_qps = None
    for k in levels:
        q: mp.Queue = ctx.Queue()
        procs = [
            ctx.Process(target=_worker, args=(idx_dir, qpath, dur, q))
            for _ in range(k)
        ]
        t0 = time.time()
        for p in procs:
            p.start()
        lats: list[float] = []
        for _ in procs:
            lats.extend(q.get())
        for p in procs:
            p.join()
        a = np.array(lats) * 1000.0
        qps = len(lats) / dur
        row = {
            "workers": k,
            "qps": round(qps, 1),
            "p50_ms": round(float(np.percentile(a, 50)), 3),
            "p95_ms": round(float(np.percentile(a, 95)), 2),
            "wall_s": round(time.time() - t0, 1),
        }
        if base_qps is None:
            base_qps = qps
        row["scaling_vs_1"] = round(qps / (base_qps * k), 3)
        out["levels"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
