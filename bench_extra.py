"""Round-7 side benchmarks (bench.py is FROZEN — extra measurements live
here). Times individual queries() entries with bench.py's methodology
(construct + collect inside the timed region, one untimed warmup query
first), optionally repeated; prints one JSON line.

Usage: python bench_extra.py [-n REPEATS] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_ENTRIES = [
    "fts_bm25_topk",
    "fts_autocomplete_prefix",
    "fts_wildcard_topk",
    "fts_phrase_topk",
    "fts_term_stats",
    "fts_bool_topk",
    "fts_bool_within_topk",
    "fts_bool_within_chain",
    "fts_collapse_topk",
    "fts_context_window",
    "fts_more_like_this",
    "sample_mix_sources",
    "sample_pack_sequences",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "graph_2hop_exclusion",
    "window_top1_per_group",
    "entropy_user_event_types",
]


def main() -> None:
    args = sys.argv[1:]
    repeats = 1
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    names = args or DEFAULT_ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from discogsography_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["fts_term_stats"](spark, sf_dir).collect()  # untimed warmup
    out: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            out[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "times": out,
                      "min": {n: min(v) for n, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
