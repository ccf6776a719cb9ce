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


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a [0, 10000]-basis-point classifier
    score against binary labels — the audit every score-based corpus
    filter needs before its threshold means anything: a quality
    classifier that says 0.9 must be right ~90% of the time, or the
    threshold is cutting different mass than intended.

    Per equal-width score bin: ``(bin, n, mean_score_bp,
    pos_rate_bp, gap_bp)`` where ``gap_bp = |mean score - observed
    positive rate|`` — the per-bin calibration error whose
    n-weighted average is ECE (:func:`calibration_ece`). All integer
    arithmetic (scores are basis points; rates integer-divide), one
    groupBy on the bin — a single corpus scan, hash-exact. Rows with
    NULL score or label are excluded."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    binc = F.least(
        F.expr(f"CAST({score_col} AS BIGINT) * {n_bins} div 10000"),
        F.lit(n_bins - 1),
    ).cast("long")
    src = df.where(s.isNotNull() & y.isNotNull())
    agg = src.groupBy(binc.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"sum(CAST({score_col} AS BIGINT)) div count(1)")
        .cast("long")
        .alias("mean_score_bp"),
        F.expr(f"(sum(CAST({label_col} AS BIGINT)) * 10000) div count(1)")
        .cast("long")
        .alias("pos_rate_bp"),
    )
    return agg.withColumn(
        "gap_bp", F.abs(F.col("mean_score_bp") - F.col("pos_rate_bp")).cast("long")
    )


def calibration_ece(report: DataFrame) -> DataFrame:
    """Expected calibration error from a :func:`calibration_report`
    frame: the n-weighted mean of per-bin gaps, in basis points —
    ``SUM(n * gap_bp) div SUM(n)``. One row ``(n_total, ece_bp)``."""
    return report.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.expr("sum(n * gap_bp) div sum(n)").cast("long").alias("ece_bp"),
    )


def auc_report(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC by the Mann-Whitney rank-sum identity —
    discrimination, the complement of calibration (a filter can be
    perfectly calibrated yet useless at separating good from bad, and
    vice versa):

        AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)

    with AVERAGE ranks on ties, computed tie-exactly in integers:
    scores aggregate to (score, n, n_pos) rows, a cumulative window
    over the DISTINCT-score table assigns each tie group its doubled
    average rank ``2r̄ = (first + last)``, and
    ``auc_bp = (2R_pos - n_pos(n_pos+1)) * 10000 div (2 n_pos n_neg)``.
    One groupBy on the score + one window over score cardinality
    (bounded by the score's resolution, not the corpus). Returns
    ``(n_pos, n_neg, auc_bp)``; degenerate single-class inputs yield
    NULL auc_bp."""
    from pyspark.sql import Window

    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    per_score = (
        df.where(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).cast("long").alias("n_pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_score.withColumn("cum", F.sum("n").over(w).cast("long")).withColumn(
        # doubled average rank of the tie group [cum-n+1 .. cum]
        "avg2", (2 * F.col("cum") - F.col("n") + 1).cast("long")
    )
    return ranked.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("n_pos")).cast("long").alias("n_neg"),
        F.expr(
            "CASE WHEN sum(n_pos) > 0 AND sum(n) - sum(n_pos) > 0 THEN"
            " ((sum(n_pos * avg2) - sum(n_pos) * (sum(n_pos) + 1)) * 10000)"
            " div (2 * sum(n_pos) * (sum(n) - sum(n_pos))) END"
        ).cast("long").alias("auc_bp"),
    )


def brier_score(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Brier score — the proper scoring rule that completes the
    filter-audit triple (calibration_report: reliability; auc_report:
    discrimination; Brier: both at once, decomposable into them):
    mean squared error between the basis-point score and the binary
    outcome, scaled by 1e8 (0 = perfect, 25_000_000 = the
    always-say-5000 baseline, 1e8 = perfectly wrong).

        brier_e8 = SUM((score_bp - 10000*y)^2) div n

    Pure int64 (each term <= 1e8); one aggregate; NULLs excluded.
    Returns ``(n, brier_e8)``."""
    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    src = df.where(s.isNotNull() & y.isNotNull())
    d = (s - 10000 * y).alias("__d")
    return src.select(d).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("sum(__d * __d) div count(1)").cast("long").alias("brier_e8"),
    )
