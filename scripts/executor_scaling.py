"""Cluster-size scaling evidence, executor-process analog.

The north rule requires throughput scaling efficiency ≥ 0.8 between N and 4N
EXECUTORS. A single local-mode JVM cannot emulate executors faithfully —
threads share one GC, one shuffle service, and one memory bus, which caps
thread-scaling near 0.55–0.7 on this VM regardless of the job (see
BENCH/BASELINE.md "thread scaling"). Real executors are separate processes;
this harness measures exactly that:

- N = 1 executor:  one `spark-submit --master local[2]` building one corpus
  shard (conv_id-range doc shard — the standard doc-sharded index layout);
- 4N = 4 executors: four CONCURRENT identical processes building the four
  disjoint shards (same code, same per-executor resources);
- efficiency = (aggregate turns/s at 4 executors) / (4 × turns/s at 1).

Shards are conv_id ranges, so per-shard docID spaces are disjoint and
deterministic — the same sharding a cluster driver would use.

    python scripts/executor_scaling.py [sf] [executor_cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_bench import SHM, make_pyfiles_zip  # noqa: E402


def make_shards(sf: float, n_shards: int = 4) -> list[str]:
    import pandas as pd

    from bench import ensure_corpus

    corpus = ensure_corpus(sf)
    out_dir = os.path.join(os.path.dirname(corpus), f"shards_sf{sf}")
    paths = [os.path.join(out_dir, f"shard{i}.parquet") for i in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    tdf = pd.read_parquet(os.path.join(corpus, "transcripts.parquet"))
    convs = sorted(tdf["conv_id"].unique())
    cuts = [convs[i * len(convs) // n_shards] for i in range(1, n_shards)]
    bounds = [None, *cuts, None]
    for i in range(n_shards):
        lo, hi = bounds[i], bounds[i + 1]
        m = pd.Series(True, index=tdf.index)
        if lo is not None:
            m &= tdf["conv_id"] >= lo
        if hi is not None:
            m &= tdf["conv_id"] < hi
        tdf[m].to_parquet(paths[i], index=False)
    return paths


def run_build(shard_path: str, index_dir: str, cores: int, zpath: str, out: dict, key) -> None:
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=12g",
        *(
            # Optional sensitivity config (SPARK_GRAFT_PRETOUCH=1):
            # AlwaysPreTouch + fixed heap faults the JVM heap at STARTUP
            # instead of on demand during the build. On this VM (globally
            # serialized first-touch faults) it equalizes concurrent
            # per-process build times (efficiency 1.02-1.18) but SLOWS the
            # solo baseline ~20%, so it is NOT the default — a ratio
            # flattered by a slower denominator is not evidence. It remains
            # useful as the experiment that pins the contention on
            # first-touch faults (see BENCH/BASELINE.md round-3 scaling).
            [
                "--conf",
                "spark.driver.extraJavaOptions=-XX:+AlwaysPreTouch -Xms12g",
            ]
            if os.environ.get("SPARK_GRAFT_PRETOUCH") == "1"
            else []
        ),
        "--conf", f"spark.local.dir={os.path.join(SHM, 'local')}",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "build_job.py"), shard_path, index_dir, "16",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in res.stdout.splitlines():
        if line.strip().startswith("{"):
            out[key] = json.loads(line)
            return
    out[key] = {"error": res.stderr[-400:], "n_turns": 0}


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    zpath = make_pyfiles_zip()
    shards = make_shards(sf)

    # Throughput is measured from each job's internal build_sec (the steady
    #-state build phase), not the subprocess wall time: JVM/session startup
    # (~20-30 s fixed) amortizes to nothing over a real 10^12-turn build but
    # would dominate a sandbox-sized shard and understate scaling. Aggregate
    # 4-executor throughput = sum of per-process throughputs while all four
    # run concurrently (starts are simultaneous; build phases overlap).

    # N = 1 executor
    solo: dict = {}
    t0 = time.time()
    run_build(shards[0], os.path.join(SHM, "exec_solo"), cores, zpath, solo, 0)
    t_solo = time.time() - t0
    tps1 = solo[0]["n_turns"] / solo[0]["build_sec"]

    # 4N = 4 concurrent executors
    quad: dict = {}
    threads = [
        threading.Thread(
            target=run_build,
            args=(shards[i], os.path.join(SHM, f"exec_q{i}"), cores, zpath, quad, i),
        )
        for i in range(4)
    ]
    t0 = time.time()
    [t.start() for t in threads]
    [t.join() for t in threads]
    t_quad = time.time() - t0
    total = sum(quad[i].get("n_turns", 0) for i in range(4))
    tps4 = sum(
        quad[i]["n_turns"] / quad[i]["build_sec"]
        for i in range(4)
        if quad[i].get("n_turns")
    )

    summary = {
        "executor_cores": cores,
        "sf": sf,
        "tps_1_executor": round(tps1, 1),
        "wall_1_executor_sec": round(t_solo, 1),
        "build_sec_1_executor": solo[0]["build_sec"],
        "tps_4_executors_aggregate": round(tps4, 1),
        "wall_4_executors_sec": round(t_quad, 1),
        "build_sec_4_executors": [quad[i].get("build_sec") for i in range(4)],
        "n_turns_total_4": total,
        "scaling_efficiency": round((tps4 / tps1) / 4, 3),
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n## Executor-process scaling run (sf={sf}, {cores} cores/executor)\n\n"
            f"| cluster size | wall s | turns/s |\n|---|---|---|\n"
            f"| 1 executor (local[{cores}]) | {summary['wall_1_executor_sec']} | {summary['tps_1_executor']} |\n"
            f"| 4 executors (4 × local[{cores}], concurrent, disjoint shards) | "
            f"{summary['wall_4_executors_sec']} | {summary['tps_4_executors_aggregate']} |\n\n"
            f"**scaling efficiency {summary['scaling_efficiency']}**\n"
        )


if __name__ == "__main__":
    main()
