"""Merged live-view positional A/B at scale: phrase/within over a
MergedSearcher whose base is the sf1.0 directory-bearing positional index
plus two ingested deltas and a tombstone batch (the bench.py live-view
recipe). Two modes:

  setup <sf>   copy the scale-proof positional index, write 2 deltas
               (~1% of corpus, disjoint conv ids) + a tombstone delta
               (~0.5% of base convs + a slice of delta-0's)
  sweep <sf>   FRESH-process measurement: 48 head-pair queries, warm +
               3 reps of topk_within(a,b,3,10) and topk_phrase, printing
               p50/p95/max + per-pair answers (for old-vs-new identity)

The A/B protocol: `setup` once, then `sweep` under the pre-change tree
(git stash) and under the new tree — answers must match pair-by-pair.
Records in BENCH/BASELINE.md. EXCLUSIVE run (VM fault-path gotchas).
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def root_for(sf: float) -> str:
    return f"/tmp/spark_graft_bench/merged_posbench_sf{sf}"


def setup(sf: float) -> None:
    import pandas as pd
    from pyspark.sql import SparkSession

    from bench import CONVS_PER_SF, ensure_corpus
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    src = f"/tmp/spark_graft_bench/scaleproof_sf{sf}/pos_idx_blkdir"
    if not os.path.isdir(src):
        raise SystemExit(f"{src} missing — run positional_block_proof.py first")
    ensure_corpus(sf)
    root = root_for(sf)
    idx = os.path.join(root, "idx")
    if os.path.isdir(root):
        shutil.rmtree(root)
    os.makedirs(root)
    t0 = time.time()
    shutil.copytree(src, idx)
    out = {"copy_sec": round(time.time() - t0, 1)}

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    writer = DeltaIndexWriter(idx)
    n_delta_conv = max(50, int(CONVS_PER_SF * sf) // 100)
    t0 = time.time()
    for i in range(2):
        batch = make_transcripts(
            n_conversations=n_delta_conv, mean_turns=10,
            vocab_size=20_000, seed=9100 + i,
        )
        batch["conv_id"] = f"zdelta{i}-" + batch["conv_id"]
        writer.write_batch(spark.createDataFrame(batch), i)
    out["delta_write_sec"] = round(time.time() - t0, 1)
    out["delta_turns"] = int(2 * n_delta_conv * 10)

    n_conv = max(100, int(CONVS_PER_SF * sf))
    del_keys = [f"conv-{i:08d}" for i in range(0, n_conv, 200)] + [
        f"zdelta0-conv-{i:08d}" for i in range(0, n_delta_conv, 25)
    ]
    t0 = time.time()
    out["n_tombstoned"] = int(
        writer.write_deletes(
            spark.createDataFrame(pd.DataFrame({"conv_id": del_keys})), 2
        )
    )
    out["tombstone_write_sec"] = round(time.time() - t0, 1)
    spark.stop()
    print(json.dumps(out))


def sweep(sf: float) -> None:
    import pandas as pd

    from discogsography_spark.streaming.incremental import MergedSearcher

    idx = os.path.join(root_for(sf), "idx")
    queries = f"/tmp/spark_graft_bench/corpus_sf{sf}/queries.parquet"
    qdf = pd.read_parquet(queries)
    pairs = []
    for _, row in qdf.iterrows():
        ts = row["query_text"].split()
        if len(ts) >= 2:
            pairs.append((ts[0], ts[1]))

    s = MergedSearcher(idx)
    init_t0 = time.time()
    answers = {}
    for a, b in pairs:  # warm pass (postings + delta memos)
        answers[f"w:{a}:{b}"] = s.topk_within(a, b, 3, 10)
        answers[f"p:{a}:{b}"] = s.topk_phrase(f"{a} {b}", 10)
    warm_sec = time.time() - init_t0

    def pct(xs):
        arr = np.array(xs)
        return [round(float(np.percentile(arr, 50)), 2),
                round(float(np.percentile(arr, 95)), 2),
                round(float(arr.max()), 2)]

    lat_w, lat_p = [], []
    for _ in range(3):
        for a, b in pairs:
            t0 = time.time()
            r = s.topk_within(a, b, 3, 10)
            lat_w.append((time.time() - t0) * 1000.0)
            assert r == answers[f"w:{a}:{b}"]
            t0 = time.time()
            r = s.topk_phrase(f"{a} {b}", 10)
            lat_p.append((time.time() - t0) * 1000.0)
            assert r == answers[f"p:{a}:{b}"]
    res = {
        "pairs": len(pairs),
        "warm_pass_sec": round(warm_sec, 1),
        "within_p50_p95_max_ms": pct(lat_w),
        "phrase_p50_p95_max_ms": pct(lat_p),
        "peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
        ),
        "answers": {k: [[int(d), round(float(x), 5)] for d, x in v]
                    for k, v in answers.items()},
    }
    print(json.dumps(res))


if __name__ == "__main__":
    mode = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    if mode == "setup":
        setup(sf)
    elif mode == "sweep":
        sweep(sf)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
