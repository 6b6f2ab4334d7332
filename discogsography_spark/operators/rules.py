"""Declarative data-quality rules compiled to native Column predicates —
the Spark restatement of the reference's rule engine
(/root/reference/extractor/src/rules.rs:79-126,248-353): Range / Required /
Regex / Length / Enum checks, record-level skip
(`should_skip_record`, rules.rs:365-379) and mutating filters
(`RemoveMatching` on array elements, `NullifyWhen` on out-of-range values,
rules.rs:404-511).

Rules compile ONCE to Catalyst expressions (the reference compiles regexes
once at startup); evaluation is whole-stage-codegen, zero Python per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One predicate over one column. kind ∈ {required, range, regex,
    length, enum}. A row VIOLATES the rule when the predicate fails
    (nulls pass non-required rules — the reference's null-tolerant
    semantics, /root/reference/api/queries/search_queries.py:65-84)."""

    column: str
    kind: str
    min: float | None = None
    max: float | None = None
    pattern: str | None = None
    values: Sequence[str] = field(default_factory=tuple)

    def predicate(self) -> Column:
        c = F.col(self.column)
        if self.kind == "required":
            return c.isNotNull() & (c.cast("string") != "")
        if self.kind == "range":
            p = F.lit(True)
            if self.min is not None:
                p = p & (c >= F.lit(self.min))
            if self.max is not None:
                p = p & (c <= F.lit(self.max))
            return c.isNull() | p
        if self.kind == "regex":
            return c.isNull() | c.cast("string").rlike(self.pattern)
        if self.kind == "length":
            ln = F.length(c.cast("string"))
            p = F.lit(True)
            if self.min is not None:
                p = p & (ln >= int(self.min))
            if self.max is not None:
                p = p & (ln <= int(self.max))
            return c.isNull() | p
        if self.kind == "enum":
            return c.isNull() | c.cast("string").isin(list(self.values))
        raise ValueError(f"unknown rule kind {self.kind!r}")


@dataclass
class RuleSet:
    skip_rules: list[Rule] = field(default_factory=list)
    nullify_rules: list[Rule] = field(default_factory=list)
    # (array_column, regex) pairs: drop matching elements (RemoveMatching)
    remove_matching: list[tuple[str, str]] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        """skip → nullify → element filters, mirroring the reference's
        should_skip_record → apply_filters order (rules.rs:365-511)."""
        out = df
        for r in self.skip_rules:
            out = out.filter(r.predicate())
        for r in self.nullify_rules:
            out = out.withColumn(
                r.column, F.when(r.predicate(), F.col(r.column)).otherwise(F.lit(None))
            )
        for col, pattern in self.remove_matching:
            out = out.withColumn(
                col, F.filter(F.col(col), lambda x: ~x.rlike(pattern))
            )
        return out

    def violations(self, df: DataFrame) -> DataFrame:
        """Per-rule violation counts in ONE scan (the filtered-multi-agg
        pattern, /root/reference/api/queries/insights_pg_queries.py:33-47)."""
        aggs = [
            F.count(F.when(~r.predicate(), 1)).alias(f"{r.column}_{r.kind}")
            for r in self.skip_rules + self.nullify_rules
        ]
        return df.agg(*aggs)


def year_plausibility(col: str, low: int = 1860) -> Column:
    """Year gate (/root/reference/common/data_normalizer.py:21-59): parse,
    clamp [low, now+1], else NULL."""
    y = F.col(col).try_cast("int")  # ANSI-safe: malformed → NULL, not error
    hi = F.year(F.current_date()) + 1
    return F.when(y.between(F.lit(low), hi), y).otherwise(F.lit(None))
