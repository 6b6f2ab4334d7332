"""Scaling-efficiency evidence for the north rule: the same index-build job
via `spark-submit --py-files` at N and 4N cores on identical input, reporting
throughput at both and efficiency = (T_N / T_4N) / 4.

(The sandbox has no multi-node cluster; two parallelism levels on one machine
are the sanctioned stand-in — see BASELINE.md "Our engine's targets".)

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
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--conf",
        f"spark.sql.shuffle.partitions={max(cores, 8)}",
        "--conf",
        "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.ui.enabled=false",
        "--conf",
        "spark.driver.memory=24g",
        "--py-files",
        zpath,
        os.path.join(REPO, "scripts", "build_job.py"),
        transcripts,
        index_dir,
        str(max(cores, 8)),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1

    from bench import ensure_corpus

    corpus = ensure_corpus(sf)
    transcripts = os.path.join(corpus, "transcripts.parquet")
    zpath = make_pyfiles_zip()

    results = {}
    for cores in (n_small, n_large):
        r = run_build(
            cores, zpath, transcripts, f"/tmp/spark_graft_bench/scale_idx_{cores}"
        )
        results[cores] = r

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
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    block = (
        f"\n## Scaling run (spark-submit --py-files, identical input)\n\n"
        f"| cores | turns | build_sec | turns/sec |\n|---|---|---|---|\n"
        f"| local[{n_small}] | {results[n_small]['n_turns']} | "
        f"{results[n_small]['build_sec']} | {tp_small} |\n"
        f"| local[{n_large}] | {results[n_large]['n_turns']} | "
        f"{results[n_large]['build_sec']} | {tp_large} |\n\n"
        f"speedup {summary['speedup']}x over {ratio:.0f}x cores → "
        f"**scaling efficiency {summary['scaling_efficiency']}** "
        f"(target ≥ 0.8 of ideal would be efficiency ≥ 0.8; note local-mode\n"
        f"shares one JVM + one disk, so this is a conservative lower bound for\n"
        f"a real multi-executor cluster).\n"
    )
    mode = "a" if os.path.exists(md) else "w"
    with open(md, mode) as f:
        if mode == "w":
            f.write("# BENCH/BASELINE — measured engine numbers\n")
        f.write(block)


if __name__ == "__main__":
    main()
