"""Sharded serving fan-out bench: p95 at S shards: process pool vs thread pool vs sequential.

Measures the serving-latency term that scales with shard count — the design
point for a 10^12-doc corpus served as bounded-memory shards. A sequential
probe loop is linear in S by construction; the concurrent fan-out
(query/sharded.py) should hold p95 roughly flat as S grows (per-shard work
shrinks with 1/S while the pool covers the shards).

Usage:  python scripts/sharded_bench.py [sf] [shard_counts...]
        python scripts/sharded_bench.py 0.1 8 16

Prints one JSON line:
  {"sf": .., "counts": {"8": {"proc_p50_ms":..,"proc_p95_ms":..,
                              "thread_p50_ms":..,"thread_p95_ms":..,
                              "seq_p50_ms":..,"seq_p95_ms":..}, ...}}

Methodology (BENCH/BASELINE.md): shards are conv-range splits of the bench
corpus — the same layout scripts/executor_scaling.py builds. Latencies are
measured in a FRESH process after the builder session stops (this VM
inflates fault-bound serving 3-10x next to a live JVM); warm pass first,
then a timed pass per query; ShardedSearcher has no result memo, so the
steady tier is honest.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/spark_graft_bench"


def build_shards(spark, corpus: str, sf: float, n_shards: int) -> list[str]:
    from pyspark.sql import functions as F

    from discogsography_spark.index.builder import IndexBuilder

    root = os.path.join(CACHE, f"shards_sf{sf}_{n_shards}")
    marker = os.path.join(root, "_DONE")
    dirs = [os.path.join(root, f"shard-{i:03d}") for i in range(n_shards)]
    if os.path.exists(marker):
        return dirs
    if os.path.isdir(root):
        shutil.rmtree(root)
    t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    convs = [r["conv_id"] for r in t.select("conv_id").distinct().orderBy("conv_id").collect()]
    bounds = [convs[i * len(convs) // n_shards] for i in range(1, n_shards)]
    ranges = list(zip([None, *bounds], [*bounds, None]))
    for d, (lo, hi) in zip(dirs, ranges):
        part = t
        if lo is not None:
            part = part.filter(F.col("conv_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("conv_id") < hi)
        IndexBuilder(d, num_segments=4).build(part)
    with open(marker, "w") as f:
        f.write("ok")
    return dirs


_SERVE = """
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import pandas as pd
from discogsography_spark.query.sharded import ShardedSearcher
from discogsography_spark.query.serving import ShardedSearchService
qdf = pd.read_parquet({queries!r})
out = {{}}
for par in (True, "thread", False):
    s = ShardedSearcher({dirs!r}, parallel=par)
    for _, row in qdf.iterrows():
        s.topk(row["query_text"], int(row["k"]))  # warm decode caches
    lat = []
    for _, row in qdf.iterrows():
        t0 = time.time()
        s.topk(row["query_text"], int(row["k"]))
        lat.append((time.time() - t0) * 1000.0)
    key = {{True: "proc", "thread": "thread", False: "seq"}}[par]
    out[key + "_p50_ms"] = round(float(np.percentile(lat, 50)), 3)
    out[key + "_p95_ms"] = round(float(np.percentile(lat, 95)), 3)
    s.close()
# full-response service tier (results + facets + counts per request)
svc = ShardedSearchService({dirs!r}, facet_defs={{"role": "role", "tool": "tool"}})
for _ in range(2):
    for _, row in qdf.iterrows():
        svc.search(row["query_text"], int(row["k"]), facets=["role", "tool"])
lat = []
for _, row in qdf.iterrows():
    t0 = time.time()
    svc.search(row["query_text"], int(row["k"]), facets=["role", "tool"])
    lat.append((time.time() - t0) * 1000.0)
out["service_p50_ms"] = round(float(np.percentile(lat, 50)), 3)
out["service_p95_ms"] = round(float(np.percentile(lat, 95)), 3)
svc.sharded.close()
print(json.dumps(out))
"""


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    counts = [int(x) for x in sys.argv[2:]] or [8, 16]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from bench import ensure_corpus

    from discogsography_spark.session import get_spark

    corpus = ensure_corpus(sf)
    spark = get_spark("sharded-bench", master="local[8]", shuffle_partitions=16)
    layouts = {s: build_shards(spark, corpus, sf, s) for s in counts}
    spark.stop()

    result: dict[str, dict] = {}
    queries = os.path.join(corpus, "queries.parquet")
    for s, dirs in layouts.items():
        script = _SERVE.format(repo=repo, queries=queries, dirs=dirs)
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
        result[str(s)] = json.loads(proc.stdout.strip().splitlines()[-1])
    print(json.dumps({"sf": sf, "counts": result}))


if __name__ == "__main__":
    main()
