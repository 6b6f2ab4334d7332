"""Live sharded fan-out bench: static shards vs shards carrying LSM delta
tails (upserts + delete tombstones) through the SAME worker-pool fan-out.

The question a 10^12-doc live deployment asks: what does the delta tail
cost at serve time? Each shard gets one upsert delta (~1% of its convs
re-sent with edited text, plus a slice of brand-new convs) and one delete
delta (~0.5% of its convs), then the coordinator p50/p95 is measured in a
FRESH process (this VM inflates fault-bound latencies 3-10x next to a
live JVM) — warm pass first, ShardedSearcher has no result memo.

Usage:  python scripts/live_sharded_bench.py [sf] [n_shards]
        python scripts/live_sharded_bench.py 0.1 8

Prints one JSON line:
  {"sf": .., "n_shards": .., "static": {...}, "live": {...},
   "delta_turns": .., "n_tombstoned": ..}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/spark_graft_bench"

_SERVE = """
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import pandas as pd
from discogsography_spark.query.sharded import ShardedSearcher
from discogsography_spark.query.serving import ShardedSearchService
qdf = pd.read_parquet({queries!r})
s = ShardedSearcher({dirs!r})
assert s.live == {live!r}
for _, row in qdf.iterrows():
    s.topk(row["query_text"], int(row["k"]))  # warm decode caches
lat = []
for _, row in qdf.iterrows():
    t0 = time.time()
    s.topk(row["query_text"], int(row["k"]))
    lat.append((time.time() - t0) * 1000.0)
out = {{"proc_p50_ms": round(float(np.percentile(lat, 50)), 3),
        "proc_p95_ms": round(float(np.percentile(lat, 95)), 3),
        "n_docs": s.n_docs}}
s.close()
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
svc.close()
print(json.dumps(out))
"""


def make_live_copy(spark, static_dirs: list[str], sf: float) -> tuple[list[str], int, int]:
    """Copy the static shard layout and write one upsert + one delete
    delta into every shard. Returns (dirs, delta_turns, n_tombstoned)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    root = os.path.join(CACHE, f"live_shards_sf{sf}_{len(static_dirs)}")
    marker = os.path.join(root, "_DONE")
    dirs = [
        os.path.join(root, os.path.basename(d)) for d in static_dirs
    ]
    if os.path.exists(marker):
        with open(os.path.join(root, "_STATS")) as fh:
            st = json.load(fh)
        return dirs, st["delta_turns"], st["n_tombstoned"]
    if os.path.isdir(root):
        shutil.rmtree(root)
    os.makedirs(root)
    delta_turns = 0
    n_tomb = 0
    for i, (src, dst) in enumerate(zip(static_dirs, dirs)):
        shutil.copytree(src, dst)
        docs = spark.read.parquet(os.path.join(dst, "docs"))
        convs = [
            r["conv_id"]
            for r in docs.select("conv_id").distinct().orderBy("conv_id").limit(200).collect()
        ]
        edit_convs = convs[: max(1, len(convs) // 2)]  # ~100 convs ≈ 1%
        # edited re-sends: full turns of the edited convs with a marker
        full = spark.read.parquet(
            os.path.join(CACHE, f"corpus_sf{sf}", "transcripts.parquet")
        )
        repl = full.where(F.col("conv_id").isin(edit_convs)).withColumn(
            "text", F.concat(F.col("text"), F.lit(" liveedit"))
        )
        fresh = make_transcripts(
            n_conversations=20, mean_turns=10, vocab_size=20_000, seed=7700 + i
        )
        fresh["conv_id"] = f"zlive{i}-" + fresh["conv_id"]
        batch = repl.unionByName(
            spark.createDataFrame(fresh).withColumn(
                "ts", F.col("ts").cast("timestamp")
            ),
            allowMissingColumns=False,
        )
        w = DeltaIndexWriter(dst)
        w.write_batch(batch, 0, upsert=True)
        delta_turns += batch.count()
        del_convs = convs[100:150]  # next 50 convs ≈ 0.5%
        n_tomb += w.write_deletes(
            spark.createDataFrame(pd.DataFrame({"conv_id": del_convs})), 1
        )
    with open(os.path.join(root, "_STATS"), "w") as fh:
        json.dump({"delta_turns": delta_turns, "n_tombstoned": n_tomb}, fh)
    with open(marker, "w") as fh:
        fh.write("ok")
    return dirs, delta_turns, n_tomb


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from bench import ensure_corpus
    from sharded_bench import build_shards

    from discogsography_spark.session import get_spark

    corpus = ensure_corpus(sf)
    spark = get_spark("live-sharded-bench", master="local[8]", shuffle_partitions=16)
    static_dirs = build_shards(spark, corpus, sf, n_shards)
    live_dirs, delta_turns, n_tomb = make_live_copy(spark, static_dirs, sf)
    spark.stop()

    queries = os.path.join(corpus, "queries.parquet")
    result: dict[str, object] = {
        "sf": sf,
        "n_shards": n_shards,
        "delta_turns": delta_turns,
        "n_tombstoned": n_tomb,
    }
    for key, dirs, live in (
        ("static", static_dirs, False),
        ("live", live_dirs, True),
    ):
        script = _SERVE.format(repo=repo, queries=queries, dirs=dirs, live=live)
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
        result[key] = json.loads(proc.stdout.strip().splitlines()[-1])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
