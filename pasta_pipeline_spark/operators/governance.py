"""Data-governance audits: re-identification risk and outcome parity.

Two screens a dataset clears before it ships:

- ``k_anonymity_report`` — the classic privacy audit (Sweeney 2002):
  group the table by its quasi-identifier columns and profile the
  equivalence-class size distribution. A row in a class smaller than
  ``k`` is re-identifiable by linking the QI tuple to an external
  source; the report shows exactly how much of the table sits below
  the threshold.
- ``four_fifths_disparity`` — the EEOC four-fifths rule applied to a
  pass/fail gate: a group whose selection rate is below 4/5 of the
  best group's rate is flagged. Applied to a quality filter over
  document sources, this is the curation-bias screen (does the gate
  disproportionately drop one source/language?).

Exactness: class sizes, pass counts, and the four-fifths test are
pure int64 (the flag compares ``5·pass·ref_n < 4·ref_pass·n`` —
cross-multiplied, no division anywhere near the decision); the
rendered rates/ratios are fixed double trees floored to 1e-6.

Scale shape: both audits are one conditional-aggregate scan plus
bounded-domain frames (distinct class sizes; the group dimension).
The disparity reference is a 1-row broadcast scalar handoff (the
audited crossJoin pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(df: DataFrame, qi_cols: list[str], k: int = 5) -> DataFrame:
    """Equivalence-class size histogram over the quasi-identifiers.

    Returns one row per distinct class size, ordered: class_size,
    n_classes, n_rows (= size · classes), at_risk (size < k),
    row_share_sc (share of all rows in classes of this size). The
    at-risk mass — the number a privacy review actually reads — is
    ``sum(n_rows) where at_risk``.
    """
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    hist = classes.groupBy("class_size").agg(F.count(F.lit(1)).alias("n_classes"))
    w = Window.partitionBy()  # bounded: |distinct class sizes| rows
    return (
        hist.withColumn("n_rows", F.col("class_size") * F.col("n_classes"))
        .withColumn("__total", F.sum("n_rows").over(w))
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            (F.col("class_size") < k).alias("at_risk"),
            F.floor(
                F.col("n_rows").cast("double")
                / F.col("__total").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("row_share_sc"),
        )
        .orderBy("class_size")
    )


def k_anonymity_oracle_sql(table: str, qi_sql: list[str], k: int = 5) -> str:
    """DuckDB twin of :func:`k_anonymity_report`."""
    qi = ", ".join(qi_sql)
    return f"""
    WITH classes AS (
      SELECT {qi}, COUNT(*) AS class_size FROM {table} GROUP BY {qi}
    ), hist AS (
      SELECT class_size, COUNT(*) AS n_classes FROM classes GROUP BY class_size
    )
    SELECT class_size, n_classes,
           CAST(class_size * n_classes AS BIGINT) AS n_rows,
           class_size < {k} AS at_risk,
           CAST(FLOOR(CAST(class_size * n_classes AS DOUBLE)
             / CAST(SUM(class_size * n_classes) OVER () AS DOUBLE)
             * 1000000) AS BIGINT) AS row_share_sc
    FROM hist ORDER BY class_size
    """


def four_fifths_disparity(
    df: DataFrame, group_col: str, pass_pred: Column
) -> DataFrame:
    """Per-group selection rates with the four-fifths adverse-impact
    flag against the best-rate group (ties broken by larger n_pass,
    then larger n — deterministic).

    Returns per group: n, n_pass, rate_sc, ratio_sc (rate / reference
    rate), four_fifths_flag. The flag is the exact integer test
    ``5·n_pass·ref_n < 4·ref_pass·n``; the reference group itself
    carries ratio 1 and no flag.
    """
    rates = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pass_pred.cast("long")).alias("n_pass"),
    )
    # exact best-rate pick: order by the cross-multiplication-free
    # double rate only for ORDERING (ties then integer columns);
    # the flag math below never uses the double
    ref = (
        rates.orderBy(
            F.desc(F.col("n_pass").cast("double") / F.col("n").cast("double")),
            F.desc("n_pass"),
            F.desc("n"),
        )
        .limit(1)
        .select(
            F.col("n_pass").alias("ref_pass"), F.col("n").alias("ref_n")
        )
    )
    joined = rates.crossJoin(F.broadcast(ref))
    rate = F.col("n_pass").cast("double") / F.col("n").cast("double")
    ratio = (F.col("n_pass") * F.col("ref_n")).cast("double") / (
        F.col("n") * F.col("ref_pass")
    ).cast("double")
    flag = (
        F.lit(5) * F.col("n_pass") * F.col("ref_n")
        < F.lit(4) * F.col("ref_pass") * F.col("n")
    )
    return joined.select(
        "grp",
        "n",
        "n_pass",
        F.floor(rate * 1000000).cast("long").alias("rate_sc"),
        F.floor(ratio * 1000000).cast("long").alias("ratio_sc"),
        flag.alias("four_fifths_flag"),
    ).orderBy("grp")


def four_fifths_oracle_sql(table: str, group_sql: str, pass_sql: str) -> str:
    """DuckDB twin of :func:`four_fifths_disparity`."""
    return f"""
    WITH rates AS (
      SELECT {group_sql} AS grp, COUNT(*) AS n,
             CAST(SUM(CASE WHEN {pass_sql} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM {table} GROUP BY 1
    ), ref AS (
      SELECT n_pass AS ref_pass, n AS ref_n FROM rates
      ORDER BY CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) DESC,
               n_pass DESC, n DESC
      LIMIT 1
    )
    SELECT grp, n, n_pass,
      CAST(FLOOR(CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS rate_sc,
      CAST(FLOOR(CAST(n_pass * ref_n AS DOUBLE) / CAST(n * ref_pass AS DOUBLE)
        * 1000000) AS BIGINT) AS ratio_sc,
      5 * n_pass * ref_n < 4 * ref_pass * n AS four_fifths_flag
    FROM rates CROSS JOIN ref ORDER BY grp
    """
