"""Scale-proof run: build + serve the engine at sf1.0 (~12M turns, 10x the
per-round benched corpus) — the closest in-sandbox analog of the 100x
mandate. One exclusive run at local[8] (this VM's stable region):

1. full index build via spark-submit --py-files (the cluster launch path),
   per-stage timing split + on-disk bytes,
2. a positional-variant build (phrase/proximity index),
3. the full query sweep in a FRESH process (cold / steady / memoized /
   boolean / phrase / within / served facets+highlight tiers) — any
   O(corpus) driver state or cache-budget blowup surfaces here,
4. an 8-shard conv-range variant served through the ShardWorkerPool
   (per-shard worker processes, global-stats fan-out).

Usage: python scripts/scale_proof.py [sf=1.0] [cpus=8]
Prints one JSON line; record the numbers in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def du_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def spark_submit_build(
    corpus: str, idx: str, cpus: int, segments: int, positional: bool
) -> dict:
    from scripts.scaling_bench import make_pyfiles_zip

    zip_path = make_pyfiles_zip()
    if os.path.isdir(idx):
        shutil.rmtree(idx)
    args = [
        "spark-submit",
        "--master",
        f"local[{cpus}]",
        "--conf",
        "spark.local.dir=/dev/shm/spark-local",
        "--conf",
        f"spark.sql.shuffle.partitions={cpus * 2}",
        "--conf",
        "spark.driver.memory=48g",
        "--py-files",
        zip_path,
        os.path.join(REPO, "scripts", "build_job.py"),
        os.path.join(corpus, "transcripts.parquet"),
        idx,
        str(segments),
    ]
    if positional:
        args.append("positions")
    proc = subprocess.run(args, capture_output=True, text=True)
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    out["index_bytes"] = du_bytes(idx)
    return out


SERVE_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pandas as pd
import numpy as np
from discogsography_spark.query.engine import LocalSearcher
qdf = pd.read_parquet({queries!r})
res = {{}}

def pct(xs):
    a = np.array(xs)
    return [round(float(np.percentile(a, 50)), 2),
            round(float(np.percentile(a, 95)), 2),
            round(float(a.max()), 2)]

s = LocalSearcher({pos_idx!r})

def sweep(use_cache):
    lat = []
    for _, row in qdf.iterrows():
        t0 = time.time()
        s.topk(row["query_text"], int(row["k"]), use_result_cache=use_cache)
        lat.append((time.time() - t0) * 1000.0)
    return lat

res["cold_p50_p95_max_ms"] = pct(sweep(False))
res["steady_p50_p95_max_ms"] = pct(sweep(False))
sweep(True)
res["memo_p50_p95_max_ms"] = pct(sweep(True))

bool_qs, phrase_qs, within_qs = [], [], []
for _, row in qdf.iterrows():
    ts = row["query_text"].split()
    if len(ts) >= 2:
        bool_qs.append("(%s OR %s) AND NOT %s" % (ts[0], ts[1], ts[0][:1]))
        bool_qs.append("%s AND NOT %s" % (ts[0], ts[1]))
        phrase_qs.append('"%s %s"' % (ts[0], ts[1]))
        within_qs.append((ts[0], ts[1]))
for q in bool_qs:
    s.topk_bool(q, 10, use_result_cache=False)
lat = []
for q in bool_qs:
    t0 = time.time(); s.topk_bool(q, 10, use_result_cache=False)
    lat.append((time.time() - t0) * 1000.0)
res["bool_p50_p95_max_ms"] = pct(lat)
for q in phrase_qs:
    s.topk_phrase(q.strip('"'), 10)
lat = []
for q in phrase_qs:
    t0 = time.time(); s.topk_phrase(q.strip('"'), 10)
    lat.append((time.time() - t0) * 1000.0)
res["phrase_p50_p95_max_ms"] = pct(lat)
lat = []
for a, b in within_qs:
    t0 = time.time(); s.topk_within(a, b, 3, 10)
    lat.append((time.time() - t0) * 1000.0)
res["within_p50_p95_max_ms"] = pct(lat)

from discogsography_spark.query.serving import SearchService
t0 = time.time()
svc = SearchService({pos_idx!r}, facet_defs={{"role": "role", "tool": "tool"}})
res["facet_init_ms"] = round((time.time() - t0) * 1000.0, 1)
for _, row in qdf.iterrows():
    svc.search(row["query_text"], int(row["k"]), facets=["role", "tool"])
lat = []
for _, row in qdf.iterrows():
    t0 = time.time()
    svc.search(row["query_text"], int(row["k"]), facets=["role", "tool"],
               offset=5)
    lat.append((time.time() - t0) * 1000.0)
res["served_facets_offset_p50_p95_max_ms"] = pct(lat)

import resource
res["serving_peak_rss_mb"] = round(
    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
print(json.dumps(res))
"""


SHARDED_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pandas as pd
import numpy as np
from discogsography_spark.query.sharded import ShardedSearcher
qdf = pd.read_parquet({queries!r})
sh = ShardedSearcher({shards!r}, parallel=True)
for _, row in qdf.iterrows():
    sh.topk(row["query_text"], int(row["k"]))
lat = []
for _ in range(3):
    for _, row in qdf.iterrows():
        t0 = time.time()
        sh.topk(row["query_text"], int(row["k"]))
        lat.append((time.time() - t0) * 1000.0)
a = np.array(lat)
print(json.dumps({{
    "sharded_pool_p50_p95_max_ms": [round(float(np.percentile(a, 50)), 2),
                                     round(float(np.percentile(a, 95)), 2),
                                     round(float(a.max()), 2)],
    "n_shards": len({shards!r}),
}}))
sh.close()
"""


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.makedirs("/dev/shm/spark-local", exist_ok=True)

    from bench import ensure_corpus

    out: dict = {"sf": sf, "cpus": cpus}
    t0 = time.time()
    corpus = ensure_corpus(sf)
    out["corpus_ensure_sec"] = round(time.time() - t0, 1)
    import pyarrow.parquet as pq

    out["n_turns"] = pq.read_metadata(
        os.path.join(corpus, "transcripts.parquet")
    ).num_rows

    root = f"/tmp/spark_graft_bench/scaleproof_sf{sf}"
    os.makedirs(root, exist_ok=True)

    # 1. full build (non-positional), spark-submit launch path
    out["build"] = spark_submit_build(
        corpus, f"{root}/idx", cpus, segments=16, positional=False
    )
    # 2. positional variant
    out["build_positional"] = spark_submit_build(
        corpus, f"{root}/pos_idx", cpus, segments=16, positional=True
    )

    # 3. fresh-process serving sweep on the positional index (answers every
    # tier; the non-positional index serves the same AND/OR plans)
    script = SERVE_SCRIPT.format(
        repo=REPO,
        queries=os.path.join(corpus, "queries.parquet"),
        pos_idx=f"{root}/pos_idx",
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True
    )
    out["serving"] = json.loads(proc.stdout.strip().splitlines()[-1])

    # 4. 8-shard conv-range variant through the worker pool
    t0 = time.time()
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.session import get_spark

    spark = get_spark(
        "scaleproof-shards", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    from pyspark.sql import functions as F

    convs = [
        r["conv_id"]
        for r in t.select("conv_id").distinct().orderBy("conv_id").collect()
    ]
    n_shards = 8
    bounds = [
        convs[i * len(convs) // n_shards] for i in range(1, n_shards)
    ]
    shard_dirs = []
    for i, (lo, hi) in enumerate(
        zip([None, *bounds], [*bounds, None])
    ):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("conv_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("conv_id") < hi)
        idx = f"{root}/shard-{i:03d}"
        if os.path.isdir(idx):
            shutil.rmtree(idx)
        IndexBuilder(idx, num_segments=4).build(t.filter(cond))
        shard_dirs.append(idx)
    spark.stop()
    out["shard_build_total_sec"] = round(time.time() - t0, 1)

    script = SHARDED_SCRIPT.format(
        repo=REPO,
        queries=os.path.join(corpus, "queries.parquet"),
        shards=shard_dirs,
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True
    )
    out["sharded"] = json.loads(proc.stdout.strip().splitlines()[-1])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
