"""Declarative data-quality expectations — the audit in write-AUDIT-publish.

A staged batch (TableStore.stage) should be validated BEFORE the
pointer flip makes it visible; at 100 TB that validation must be ONE
scan, not one query per rule. ``check_expectations`` evaluates a rule
list as conditional aggregates inside a single aggregation pass
(plus one pass for uniqueness rules, which need distinct counts) and
returns a verdict table — the same surface Deequ/Great Expectations
style suites provide, expressed as plain Catalyst aggregates.

Rule kinds:
- ``not_null(col)``        — NULL values are violations;
- ``min(col, v)``          — values < v (NULLs ignored);
- ``max(col, v)``          — values > v (NULLs ignored);
- ``in_set(col, values)``  — non-NULL values outside the set;
- ``matches(col, regex)``  — non-NULL values not matching;
- ``predicate(sql)``       — rows where the SQL predicate is FALSE or
  NULL (arbitrary row-level invariants: cross-column comparisons,
  arithmetic identities);
- ``unique(col)``          — duplicated values (count - distinct).

Usage with WAP::

    v = store.stage(batch)
    report = check_expectations(store.read(version=v), RULES)
    if report.where("NOT passed").count() == 0:
        store.publish(v)
    else:
        store.discard(v)   # and route the report to quarantine
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str | None = None
    value: object = None
    values: tuple = field(default=())


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null_{col}", "not_null", col)


def min_value(col: str, v, name: str | None = None) -> Rule:
    return Rule(name or f"min_{col}", "min", col, value=v)


def max_value(col: str, v, name: str | None = None) -> Rule:
    return Rule(name or f"max_{col}", "max", col, value=v)


def in_set(col: str, values, name: str | None = None) -> Rule:
    return Rule(name or f"in_set_{col}", "in_set", col, values=tuple(values))


def matches(col: str, regex: str, name: str | None = None) -> Rule:
    return Rule(name or f"matches_{col}", "matches", col, value=regex)


def predicate(sql: str, name: str) -> Rule:
    return Rule(name, "predicate", value=sql)


def unique(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"unique_{col}", "unique", col)


def _violation_expr(r: Rule) -> Column:
    c = F.col(r.col) if r.col else None
    if r.kind == "not_null":
        cond = c.isNull()
    elif r.kind == "min":
        cond = c < F.lit(r.value)
    elif r.kind == "max":
        cond = c > F.lit(r.value)
    elif r.kind == "in_set":
        cond = c.isNotNull() & ~c.isin(*r.values)
    elif r.kind == "matches":
        cond = c.isNotNull() & ~c.rlike(r.value)
    elif r.kind == "predicate":
        cond = ~F.coalesce(F.expr(str(r.value)), F.lit(False))
    else:
        raise ValueError(f"unknown rule kind {r.kind!r}")
    return F.sum(cond.cast("long")).alias(r.name)


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in (at most) two aggregation passes over
    ``df`` — one shared conditional-aggregate scan for row-level
    rules, one for ``unique`` rules (distinct counts) — and return
    ``(rule, n_rows, n_violations, passed)`` sorted by rule name.
    An empty frame passes every rule (0 violations of anything)."""
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    aggs += [_violation_expr(r) for r in row_rules]
    for r in uniq_rules:
        aggs.append(
            (F.count(F.col(r.col)) - F.countDistinct(F.col(r.col)))
            .cast("long")
            .alias(r.name)
        )
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.coalesce(F.col(r.name), F.lit(0)).cast("long").alias("n_violations"),
            )
            for r in rules
        ]
    )
    return (
        wide.select(F.col("__n"), F.explode(entries).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col("e.n_violations").alias("n_violations"),
            (F.col("e.n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def schema_drift(expected, actual) -> list[dict]:
    """Schema-drift report between an expected StructType (or a
    DataFrame carrying one) and an incoming frame — the ingestion
    guard that catches an upstream producer silently adding,
    dropping, retyping, or re-nullifying a column before the data
    lands anywhere:

    Returns a list of dicts ``{column, kind, expected, actual}`` with
    ``kind in ('missing', 'added', 'type_changed',
    'nullability_tightened')`` — empty when schemas agree.
    Pure driver-side metadata (no job runs); nullability is only
    flagged in the DANGEROUS direction (expected non-null arriving
    nullable); extra nullability on the expected side is fine.
    Pairs with check_expectations: drift gates the schema, the
    expectation suite gates the values."""
    exp_schema = expected.schema if hasattr(expected, "schema") else expected
    act_schema = actual.schema if hasattr(actual, "schema") else actual
    exp = {f.name: f for f in exp_schema.fields}
    act = {f.name: f for f in act_schema.fields}
    report: list[dict] = []
    for name, f in exp.items():
        if name not in act:
            report.append(
                {"column": name, "kind": "missing",
                 "expected": f.dataType.simpleString(), "actual": None}
            )
            continue
        a = act[name]
        if a.dataType != f.dataType:
            report.append(
                {"column": name, "kind": "type_changed",
                 "expected": f.dataType.simpleString(),
                 "actual": a.dataType.simpleString()}
            )
        if (not f.nullable) and a.nullable:
            report.append(
                {"column": name, "kind": "nullability_tightened",
                 "expected": "NOT NULL", "actual": "nullable"}
            )
    for name, a in act.items():
        if name not in exp:
            report.append(
                {"column": name, "kind": "added",
                 "expected": None, "actual": a.dataType.simpleString()}
            )
    return report
