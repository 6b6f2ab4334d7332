"""Positional sharded serving at sf1.0 — the sharded answer to the
single-node positional tails measured by scale_proof.py (phrase p95
1.6 s / within p95 4.2 s at 12M turns on ONE node).

Builds 8 conv-range POSITIONAL shards over the same corpus, then in a
FRESH process sweeps AND / boolean / phrase / within through
ShardedSearcher's worker-pool fan-out (global-stats injection, so results
are bit-identical to a whole-corpus positional index — tested in
tests/test_sharded.py / test_phrase_index.py).

Usage: python scripts/sharded_positional_proof.py [sf=1.0] [cpus=8] [shards=8]
Prints one JSON line; record in BENCH/BASELINE.md.
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

SWEEP = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import pandas as pd
from discogsography_spark.query.sharded import ShardedSearcher

qdf = pd.read_parquet({queries!r})
sh = ShardedSearcher({shards!r}, parallel=True)

pairs = []
for _, row in qdf.iterrows():
    ts = row["query_text"].split()
    if len(ts) >= 2:
        pairs.append((ts[0], ts[1]))

def pct(xs):
    a = np.array(xs)
    return [round(float(np.percentile(a, 50)), 2),
            round(float(np.percentile(a, 95)), 2),
            round(float(a.max()), 2)]

res = {{}}

def tier(name, calls):
    for c in calls:  # warm
        c()
    lat = []
    for _ in range(3):
        for c in calls:
            t0 = time.time(); c(); lat.append((time.time() - t0) * 1000.0)
    res[name] = pct(lat)

tier("sharded_and_p50_p95_max_ms",
     [lambda r=row: sh.topk(r["query_text"], int(r["k"]))
      for _, row in qdf.iterrows()])
tier("sharded_bool_p50_p95_max_ms",
     [lambda a=a, b=b: sh.topk_bool("(%s OR %s) AND NOT %s" % (a, b, a[:1]), 10)
      for a, b in pairs] +
     [lambda a=a, b=b: sh.topk_bool("%s AND NOT %s" % (a, b), 10)
      for a, b in pairs])
tier("sharded_phrase_p50_p95_max_ms",
     [lambda a=a, b=b: sh.topk_phrase("%s %s" % (a, b), 10) for a, b in pairs])
tier("sharded_within_p50_p95_max_ms",
     [lambda a=a, b=b: sh.topk_within(a, b, 3, 10) for a, b in pairs])

res["n_shards"] = len({shards!r})
print(json.dumps(res))
sh.close()
"""


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from bench import ensure_corpus
    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.session import get_spark
    from pyspark.sql import functions as F

    corpus = ensure_corpus(sf)
    root = f"/tmp/spark_graft_bench/shardpos_sf{sf}"
    os.makedirs(root, exist_ok=True)

    out: dict = {"sf": sf, "cpus": cpus}
    t0 = time.time()
    spark = get_spark(
        "shardpos", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    convs = [
        r["conv_id"]
        for r in t.select("conv_id").distinct().orderBy("conv_id").collect()
    ]
    bounds = [convs[i * len(convs) // n_shards] for i in range(1, n_shards)]
    shard_dirs = []
    for i, (lo, hi) in enumerate(zip([None, *bounds], [*bounds, None])):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("conv_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("conv_id") < hi)
        idx = f"{root}/shard-{i:03d}"
        if os.path.isdir(idx):
            shutil.rmtree(idx)
        IndexBuilder(idx, num_segments=4, with_positions=True).build(
            t.filter(cond)
        )
        shard_dirs.append(idx)
    spark.stop()
    out["positional_shard_build_total_sec"] = round(time.time() - t0, 1)

    script = SWEEP.format(
        repo=REPO,
        queries=os.path.join(corpus, "queries.parquet"),
        shards=shard_dirs,
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(proc.returncode)
    out.update(json.loads(proc.stdout.strip().splitlines()[-1]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
