"""Declarative data-quality validation — the reference's own named
roadmap gap ("Add more comprehensive data validation and
error-handling", reference README.md:50), as a Spark-native
expectation engine.

A rule set compiles to ONE conditional-aggregation pass over the
table (deequ/dbt-test shape): every rule becomes a
``sum(case when violated then 1 else 0)`` column, so validating N
rules costs one scan + one 1-row aggregate regardless of N — no
per-rule jobs, no collect of failing rows. ``violations`` returns the
long-form report; ``failing_rows`` materializes offending rows for a
chosen rule when a human needs examples (separate, filter-pushed
scan).

Uniqueness is the one rule a row-local CASE cannot express; it
compiles to a groupBy on the key with a HAVING count>1, aggregated to
a single number — still one shuffle, map-side partial.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # predicate marking a VIOLATING row (null-safe: must yield bool)
    violated: Column | None = None
    # set for uniqueness rules instead of `violated`
    unique_keys: tuple[str, ...] | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(f"in_range_{col}", c.isNotNull() & ~c.between(lo, hi))


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"accepted_values_{col}", c.isNotNull() & ~c.isin(values))


def matches(col: str, regex: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches_{col}", c.isNotNull() & ~c.rlike(regex))


def unique(*keys: str) -> Rule:
    return Rule("unique_" + "_".join(keys), unique_keys=tuple(keys))


def violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Long-form report: one row per rule with total rows checked and
    violation count. Row-local rules share a single scan+aggregate;
    each uniqueness rule adds one keyed aggregate."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.violated is not None]
    parts: list[DataFrame] = []
    if row_rules:
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.when(r.violated, 1).otherwise(0)).alias(r.name)
                for r in row_rules
            ],
        )
        stacked = agg.select(
            F.stack(
                F.lit(len(row_rules)),
                *[
                    x
                    for r in row_rules
                    for x in (F.lit(r.name), F.col(r.name).cast("long"))
                ],
            ).alias("rule", "n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        parts.append(stacked.select("rule", "n_rows", "n_violations"))
    for r in rules:
        if r.unique_keys is not None:
            dup = (
                df.groupBy(*r.unique_keys)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(
                    F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias(
                        "n_violations"
                    )
                )
                .crossJoin(
                    F.broadcast(df.agg(F.count(F.lit(1)).cast("long").alias("n_rows")))
                )
                .select(F.lit(r.name).alias("rule"), "n_rows", "n_violations")
            )
            parts.append(dup)
    if not parts:
        return spark.createDataFrame(
            [], "rule string, n_rows long, n_violations long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def failing_rows(df: DataFrame, rule: Rule, limit: int = 100) -> DataFrame:
    """Example offending rows for one row-local rule (filter-pushed
    scan; bounded output)."""
    if rule.violated is None:
        raise ValueError("failing_rows needs a row-local rule")
    return df.filter(rule.violated).limit(limit)
