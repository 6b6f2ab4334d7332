"""Physical-plan audit over every driver entry: build each queries()
DataFrame at sf0.001 and inspect its executed plan WITHOUT running it.

Asserted invariants (the anti-patterns a 100-TB deployment cannot carry):
- no `CartesianProduct` anywhere (a broadcast 1-row stats join shows up
  as BroadcastNestedLoopJoin, which is allowed and counted separately);
- no `BatchEvalPython` (row-at-a-time Python UDF) — Python stages must be
  Arrow-batched (`ArrowEvalPython` / `MapInPandas` / `FlatMapGroupsInPandas`),
  which are counted but allowed.

Usage: python scripts/plan_audit.py [sf_dir] [entry ...]
Prints one JSON line; exit 1 if any invariant fails.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from discogsography_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=4)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sorted(only or qs)
    cartesian: list[str] = []
    row_udf: list[str] = []
    arrow_entries: list[str] = []
    bnlj_entries: list[str] = []
    failed: dict[str, str] = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # entry could not even plan
            failed[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            row_udf.append(name)
        if re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan):
            arrow_entries.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj_entries.append(name)
    out = {
        "entries_audited": len(names) - len(failed),
        "cartesian_product": cartesian,
        "row_at_a_time_python_udf": row_udf,
        "arrow_batched_python_entries": len(arrow_entries),
        "broadcast_nested_loop_entries": len(bnlj_entries),
        "plan_failures": failed,
    }
    print(json.dumps(out))
    spark.stop()
    return 1 if (cartesian or row_udf or failed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
