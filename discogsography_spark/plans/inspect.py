"""Physical-plan inspection helpers — the engine's analog of the reference's
PROFILE/EXPLAIN debug hooks (/root/reference/api/queries/helpers.py:90-110,
/root/reference/common/query_debug.py), used by tests to enforce the scale
contracts: filters pushed to parquet, small sides broadcast, codegen spans
present, no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_report(df: DataFrame) -> dict[str, bool | int]:
    s = explain_str(df)
    simple = explain_str(df, "simple")  # codegen spans marked `*(n)`
    return {
        "has_pushed_filters": "PushedFilters: [" in s
        and "PushedFilters: []" not in s,
        "has_broadcast_join": "BroadcastHashJoin" in s,
        "has_sort_merge_join": "SortMergeJoin" in s,
        "has_cartesian": "CartesianProduct" in s,
        "wholestage_codegen_spans": len(set(__import__("re").findall(r"\*\((\d+)\)", simple))),
        "scans": s.count("Scan parquet"),
        "exchanges": s.count("Exchange"),
    }


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    s = explain_str(df)
    assert "PushedFilters" in s, "no parquet scan with pushdown in plan"
    assert fragment in s, f"expected pushed filter containing {fragment!r}:\n{s}"
