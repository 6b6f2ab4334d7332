"""Capture .explain('formatted') output for queries() entries into
plans/r07/<name>_<tag>.txt — the optimization-round before/after evidence.

Usage: python scripts/r07_capture_plans.py <tag> [entry ...]
       (default entries: the 19 bench-timed ones)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from discogsography_spark.session import get_spark

BENCH_ENTRIES = [
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
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r07_plans", master="local[4]", shuffle_partitions=4)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
