from discogsography_spark.plans.inspect import (
    assert_pushed_filters,
    explain_str,
    plan_report,
)

__all__ = ["explain_str", "assert_pushed_filters", "plan_report"]
