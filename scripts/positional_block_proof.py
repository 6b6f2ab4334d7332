"""Positional block directory A/B at sf1.0 (~12M turns): the same
phrase/within sweep on (a) the session-2 scale-proof positional index —
built BEFORE block_pos_off existed, so it measures the full-stream decode
fallback exactly — and (b) a fresh rebuild carrying the directory.
Both sweeps run in fresh processes (VM gotcha: serving next to a live JVM
inflates 3-10x); results are asserted bit-identical pair-by-pair.

Usage: python scripts/positional_block_proof.py [sf=1.0] [cpus=8]
EXCLUSIVE run. Prints one JSON line; record in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEP = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pandas as pd
import numpy as np
from discogsography_spark.query.engine import LocalSearcher

qdf = pd.read_parquet({queries!r})
pairs = []
for _, row in qdf.iterrows():
    ts = row["query_text"].split()
    if len(ts) >= 2:
        pairs.append((ts[0], ts[1]))

s = LocalSearcher({idx!r})
res = {{}}

def pct(xs):
    a = np.array(xs)
    return [round(float(np.percentile(a, 50)), 2),
            round(float(np.percentile(a, 95)), 2),
            round(float(a.max()), 2)]

# warm pass (terms dictionary + postings cache), then 3 timed reps —
# the protocol of the r5s3 sweeps this A/Bs against
answers = {{}}
for a, b in pairs:
    answers[f"w:{{a}}:{{b}}"] = s.topk_within(a, b, 3, 10)
    answers[f"p:{{a}}:{{b}}"] = s.topk_phrase(f"{{a}} {{b}}", 10)
lat_w, lat_p = [], []
for _ in range(3):
    for a, b in pairs:
        t0 = time.time(); r = s.topk_within(a, b, 3, 10)
        lat_w.append((time.time() - t0) * 1000.0)
        assert r == answers[f"w:{{a}}:{{b}}"]
        t0 = time.time(); r = s.topk_phrase(f"{{a}} {{b}}", 10)
        lat_p.append((time.time() - t0) * 1000.0)
        assert r == answers[f"p:{{a}}:{{b}}"]
res["within_p50_p95_max_ms"] = pct(lat_w)
res["phrase_p50_p95_max_ms"] = pct(lat_p)
res["answers"] = {{k: [[int(d), round(float(x), 5)] for d, x in v]
                  for k, v in answers.items()}}
import resource
res["peak_rss_mb"] = round(
    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
print(json.dumps(res))
"""


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.makedirs("/dev/shm/spark-local", exist_ok=True)

    from bench import ensure_corpus
    from scripts.scale_proof import spark_submit_build

    corpus = ensure_corpus(sf)
    queries = os.path.join(corpus, "queries.parquet")
    root = f"/tmp/spark_graft_bench/scaleproof_sf{sf}"
    old_idx = f"{root}/pos_idx"
    new_idx = f"{root}/pos_idx_blkdir"
    out: dict = {"sf": sf, "cpus": cpus}

    if not os.path.isdir(old_idx):
        raise SystemExit(
            f"{old_idx} missing — run scripts/scale_proof.py first (the A/B "
            "baseline is the pre-directory index it built)"
        )

    t0 = time.time()
    out["build_blkdir"] = spark_submit_build(
        corpus, new_idx, cpus, segments=16, positional=True
    )
    out["build_blkdir_wall_sec"] = round(time.time() - t0, 1)

    results = {}
    for label, idx in (("fallback_fullstream", old_idx), ("block_directory", new_idx)):
        proc = subprocess.run(
            [sys.executable, "-c", SWEEP.format(repo=REPO, queries=queries, idx=idx)],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            raise SystemExit(f"{label} sweep failed:\n{proc.stderr[-3000:]}")
        results[label] = json.loads(proc.stdout.strip().splitlines()[-1])

    # identity: both indexes must answer every pair identically
    a = results["fallback_fullstream"].pop("answers")
    b = results["block_directory"].pop("answers")
    assert a.keys() == b.keys()
    mismatch = [k for k in a if a[k] != b[k]]
    out["identity_pairs_checked"] = len(a)
    out["identity_mismatches"] = mismatch
    assert not mismatch, mismatch
    out["sweeps"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
