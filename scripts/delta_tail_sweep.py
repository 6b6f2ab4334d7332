"""LSM delta-tail serving-degradation curve: merged-view latency as the
uncompacted delta tail grows, and what compact() buys back.

A streaming deployment must decide WHEN to compact: each committed delta
adds per-term lookup work (one more segment set to probe + merge) and
tombstone masking to every query. This sweep quantifies the curve on one
corpus:

    python scripts/delta_tail_sweep.py [sf] [n_deltas]

- build a base index over ~70% of the corpus (store_text off — serving
  only), positional ON (the r6 curve tracks phrase/within tiers too);
- ingest the remaining conversations as `n_deltas` equal micro-batches
  (every 4th batch an upsert of earlier convs + a small tombstone batch,
  so the tail carries live edits and deletes, not just appends);
- at tail depths 1/2/4/8/N, measure merged AND + bool p50/p95 over the
  corpus query set in a FRESH subprocess (cold per-tail caches, no
  builder JVM nearby — the honest-latency discipline);
- compact, re-measure on the compacted single index.

Output: one JSON line with the per-tail-depth latency curve.
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


_TIERS_SCRIPT = """
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np, pandas as pd
from discogsography_spark.streaming.incremental import MergedSearcher
qdf = pd.read_parquet({qpath!r}).head(30)
t0 = time.time()
ms = MergedSearcher({idx!r})
init_s = time.time() - t0
for _, row in qdf.iterrows():
    ms.topk(row["query_text"], int(row["k"]))
out = {{"init_s": round(init_s, 2)}}
for name in ("and", "bool", "boolmix", "phrase", "within"):
    lat = []
    for _, row in qdf.iterrows():
        q, k = row["query_text"], int(row["k"])
        ws = q.split()
        w0 = ws[0]
        w1 = ws[1] if len(ws) > 1 else ws[0]
        w2 = ws[2] if len(ws) > 2 else w0
        t0 = time.time()
        if name == "and":
            ms.topk(q, k)
        elif name == "bool":
            ms.topk_bool(w0 + " AND NOT zzqx", k)
        elif name == "boolmix":
            # mixed algebra with a PRESENT negation — cannot collapse to a
            # flat mode, exercises the general per-leg boolean path
            ms.topk_bool(
                "(" + w0 + " OR " + w1 + ") AND NOT " + w2, k
            )
        elif name == "phrase":
            ms.topk_phrase(w0 + " " + w1, k)
        else:
            ms.topk_within(w0, w1, 3, k)
        lat.append((time.time() - t0) * 1000.0)
    a = np.array(lat)
    out[name + "_p50_ms"] = round(float(np.percentile(a, 50)), 2)
    out[name + "_p95_ms"] = round(float(np.percentile(a, 95)), 2)
print(json.dumps(out))
"""


def _tiers(idx: str, qpath: str) -> dict:
    """Measure merged-view tiers in a FRESH process: any latency measured
    next to a live builder JVM inflates 3-10x (BENCH/BASELINE.md)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-c",
         _TIERS_SCRIPT.format(repo=REPO, qpath=qpath, idx=idx)],
        capture_output=True, text=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    n_deltas = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    append_only = len(sys.argv) > 3 and sys.argv[3] == "append"
    from bench import ensure_corpus

    corpus = ensure_corpus(sf)
    work = f"/tmp/spark_graft_bench/delta_tail_sf{sf}"
    idx = os.path.join(work, "idx")
    import shutil

    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work)

    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.session import get_spark
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        compact,
    )

    spark = get_spark(
        app_name="delta_tail", master="local[8]", shuffle_partitions=16
    )
    tdf = pd.read_parquet(os.path.join(corpus, "transcripts.parquet"))
    qpath = os.path.join(corpus, "queries.parquet")
    convs = sorted(tdf["conv_id"].unique())
    cut = int(len(convs) * 0.7)
    base_convs, rest = convs[:cut], convs[cut:]
    base_p = os.path.join(work, "base.parquet")
    tdf[tdf["conv_id"].isin(base_convs)].to_parquet(base_p, index=False)
    t0 = time.time()
    IndexBuilder(
        idx, num_segments=16, head_df_threshold=100_000, with_positions=True
    ).build(spark.read.parquet(base_p))
    out: dict = {
        "sf": sf,
        "n_deltas": n_deltas,
        "base_build_s": round(time.time() - t0, 1),
        "curve": [],
        "append_only": append_only,
    }

    w = DeltaIndexWriter(idx)
    per = max(1, len(rest) // n_deltas)
    bid = 0
    ingest_s = []
    for i in range(n_deltas):
        batch_convs = rest[i * per : (i + 1) * per]
        if not batch_convs:
            break
        b = tdf[tdf["conv_id"].isin(batch_convs)]
        if not append_only and i % 4 == 3:
            # live edits: re-deliver an earlier batch's convs with edited
            # text (tombstones prior versions) + delete a few base convs
            edit = tdf[tdf["conv_id"].isin(rest[(i - 1) * per : (i - 1) * per + 3])].copy()
            edit["text"] = edit["text"] + " tailedit"
            b = pd.concat([b, edit], ignore_index=True)
        p = os.path.join(work, f"b{i}.parquet")
        b.to_parquet(p, index=False)
        t0 = time.time()
        w.write_batch(spark.read.parquet(p), bid, upsert=True)
        bid += 1
        if not append_only and i % 4 == 3:
            dele = pd.DataFrame({"conv_id": base_convs[i * 2 : i * 2 + 2]})
            w.write_deletes(spark.createDataFrame(dele), bid)
            bid += 1
        ingest_s.append(round(time.time() - t0, 2))
        if (i + 1) in (1, 2, 4, 8, n_deltas):
            row = {"tail_depth": i + 1, **_tiers(idx, qpath)}
            out["curve"].append(row)
    out["ingest_s"] = ingest_s

    # MINOR compaction first: fold the 16-deep tail into one delta
    # (base untouched), then the full compact on top
    from discogsography_spark.streaming.incremental import consolidate_deltas

    t0 = time.time()
    out["consolidated"] = consolidate_deltas(spark, idx)
    out["consolidate_s"] = round(time.time() - t0, 1)
    out["post_consolidate"] = _tiers(idx, qpath)

    t0 = time.time()
    compact(spark, idx)
    out["compact_s"] = round(time.time() - t0, 1)
    spark.stop()

    out["post_compact"] = _tiers(idx, qpath)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
