"""Declarative data-quality constraint checking (ingest validation).

The reference trusts Postgres constraints (PK uniqueness, NOT NULL
DDL — db_loader.py:23-36) to reject bad rows at insert; a lake engine
has no enforcing store, so constraints become a *query*: run the rule
set against a batch, get back one row per rule with its violation
count (plus an optional per-row violations frame for quarantine — the
P10 error-side-channel generalized).

Rules are plain Column predicates ("the row is GOOD"), so the checker
stays declarative and Catalyst folds all rules into ONE scan — no
per-rule passes. Uniqueness is the exception (needs a shuffle); it is
expressed as a groupBy-count internally.

Scale: single scan + one shuffle per uniqueness rule; the summary is
a handful of rows. Violation extraction filters the same scan —
nothing is ever collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` (name → good-row predicate) and optional
    ``unique_keys`` (name → key columns) against ``df``.

    Returns (rule, n_violations, n_rows) — one row per rule, stable
    output for alerting thresholds. NULL predicate results count as
    violations (a NULL in a checked column is a failure, matching SQL
    CHECK semantics under `NOT coalesce(p, FALSE)`).
    """
    n_rows = F.count(F.lit(1))
    aggs = [
        F.sum(
            F.when(~F.coalesce(pred, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
        ).alias(name)
        for name, pred in rules.items()
    ]
    summary = df.agg(n_rows.alias("__n"), *aggs)
    long = summary.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(name).cast("long").alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r"),
        F.col("__n").cast("long").alias("n_rows"),
    ).select("r.rule", "r.n_violations", "n_rows")

    for name, keys in (unique_keys or {}).items():
        dup_rows = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(
                F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_violations")
            )
        )
        total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        long = long.unionByName(
            dup_rows.crossJoin(total).select(
                F.lit(name).alias("rule"), "n_violations", "n_rows"
            )
        )
    return long


def extract_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-row quarantine frame: rows failing ANY rule, with the list
    of failed rule names attached (the P10 side-channel shape)."""
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("failed_rules", failed).filter(
        F.size("failed_rules") > 0
    )
