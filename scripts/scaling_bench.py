"""Scaling-efficiency evidence for the north rule: the same index-build job
via `spark-submit --py-files` at N and 4N cores on identical input, reporting
throughput at both and efficiency = (tps_4N / tps_N) / 4.

Methodology notes (validated in round 1, see BENCH/BASELINE.md):
- shuffle partitions FIXED (64) across both runs — the real-cluster analog is
  "same job, more executors", never "different plan per cluster size";
- shuffle/local dirs on tmpfs — local mode funnels all shuffle through one
  device, which otherwise serializes multi-core runs (a sandbox artifact a
  real cluster's per-executor disks don't have);
- this VM saturates shared memory bandwidth above ~8 concurrent heavy tasks
  (measured: raw CPU scales to 32 procs, but Arrow/shuffle-heavy Spark tasks
  slow ~2-4x per task at 32 threads), so the honest linear-region pair on
  this machine is N=2 vs 4N=8; pass other sizes explicitly to reproduce the
  saturation measurements.

    python scripts/scaling_bench.py [n_small] [n_large] [sf]

Writes results into BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm/spark-graft-scaling"


def make_pyfiles_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "discogsography_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "discogsography_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_build(cores: int, zpath: str, transcripts: str, index_dir: str) -> dict:
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(os.path.join(SHM, "local"), exist_ok=True)
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--conf",
        "spark.sql.shuffle.partitions=64",
        "--conf",
        "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.ui.enabled=false",
        "--conf",
        "spark.driver.memory=48g",
        "--conf",
        f"spark.local.dir={os.path.join(SHM, 'local')}",
        "--py-files",
        zpath,
        os.path.join(REPO, "scripts", "build_job.py"),
        transcripts,
        index_dir,
        "16",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from spark-submit: {out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

    from bench import ensure_corpus

    corpus = ensure_corpus(sf)
    transcripts = os.path.join(corpus, "transcripts.parquet")
    zpath = make_pyfiles_zip()

    results = {}
    for cores in (n_small, n_large):
        results[cores] = run_build(
            cores, zpath, transcripts, os.path.join(SHM, f"idx_{cores}")
        )

    tp_small = results[n_small]["turns_per_sec"]
    tp_large = results[n_large]["turns_per_sec"]
    ratio = n_large / n_small
    efficiency = (tp_large / tp_small) / ratio
    summary = {
        "n_small_cores": n_small,
        "n_large_cores": n_large,
        "sf": sf,
        "n_turns": results[n_small]["n_turns"],
        "throughput_small_tps": tp_small,
        "throughput_large_tps": tp_large,
        "speedup": round(tp_large / tp_small, 3),
        "scaling_efficiency": round(efficiency, 3),
        "timings_small": results[n_small].get("timings"),
        "timings_large": results[n_large].get("timings"),
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    block = (
        f"\n## Scaling run: local[{n_small}] vs local[{n_large}] "
        f"(spark-submit --py-files, identical input, fixed 64 shuffle partitions)\n\n"
        f"| cores | turns | build_sec | turns/sec | stage timings |\n|---|---|---|---|---|\n"
        f"| local[{n_small}] | {results[n_small]['n_turns']} | "
        f"{results[n_small]['build_sec']} | {tp_small} | {results[n_small].get('timings')} |\n"
        f"| local[{n_large}] | {results[n_large]['n_turns']} | "
        f"{results[n_large]['build_sec']} | {tp_large} | {results[n_large].get('timings')} |\n\n"
        f"speedup {summary['speedup']}x over {ratio:.0f}x cores → "
        f"**scaling efficiency {summary['scaling_efficiency']}** (target ≥ 0.8).\n"
    )
    mode = "a" if os.path.exists(md) else "w"
    with open(md, mode) as f:
        if mode == "w":
            f.write("# BENCH/BASELINE — measured engine numbers\n")
        f.write(block)


if __name__ == "__main__":
    main()
