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


def l_diversity_report(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the screen
    k-anonymity misses: a class can be large (k-safe) yet carry ONE
    sensitive value, so membership alone discloses it (the homogeneity
    attack). Group by the quasi-identifiers, count distinct sensitive
    values per class, and profile the class distribution by that
    diversity level.

    Returns one row per distinct diversity level, ordered: l_distinct,
    n_classes, n_rows, at_risk (l_distinct < l), row_share_sc. The
    disclosure mass a review reads is ``sum(n_rows) where at_risk``.

    Scale shape: one groupBy(QI) with two aggregates, then a bounded
    distinct-level frame (|levels| <= |sensitive domain|) — same shape
    as :func:`k_anonymity_report` at any corpus size.
    """
    classes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("l_distinct"),
    )
    hist = classes.groupBy("l_distinct").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
    )
    w = Window.partitionBy()  # bounded: |distinct diversity levels| rows
    return (
        hist.withColumn("__total", F.sum("n_rows").over(w))
        .select(
            "l_distinct",
            "n_classes",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("l_distinct") < l).alias("at_risk"),
            F.floor(
                F.col("n_rows").cast("double")
                / F.col("__total").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("row_share_sc"),
        )
        .orderBy("l_distinct")
    )


def l_diversity_oracle_sql(
    table: str, qi_sql: list[str], sensitive_sql: str, l: int = 2
) -> str:
    """DuckDB twin of :func:`l_diversity_report`."""
    qi = ", ".join(qi_sql)
    return f"""
    WITH classes AS (
      SELECT {qi}, COUNT(*) AS class_size,
             COUNT(DISTINCT {sensitive_sql}) AS l_distinct
      FROM {table} GROUP BY {qi}
    ), hist AS (
      SELECT l_distinct, COUNT(*) AS n_classes,
             SUM(class_size) AS n_rows
      FROM classes GROUP BY l_distinct
    )
    SELECT l_distinct, n_classes, CAST(n_rows AS BIGINT) AS n_rows,
           l_distinct < {l} AS at_risk,
           CAST(FLOOR(CAST(n_rows AS DOUBLE)
             / CAST(SUM(n_rows) OVER () AS DOUBLE) * 1000000) AS BIGINT)
             AS row_share_sc
    FROM hist ORDER BY l_distinct
    """


def randomized_response_counts(
    df: DataFrame,
    id_col: str,
    group_col: str,
    num: int = 7500,
    den: int = 10000,
) -> DataFrame:
    """Warner-style randomized response (Warner 1965, direct-encoding
    k-ary variant) over a categorical column, with the unbiased
    debiasing estimator — the local-privacy mechanism audit: each row
    reports its TRUE group with probability p = num/den, otherwise one
    of the other k-1 groups uniformly; the per-group noisy counts are
    then debiased via n_hat = (c*den*(k-1) - (den-num)*n) / (num*(k-1)
    - (den-num)).

    Determinism: the coin and the replacement pick both derive from
    md5 of the row id (``sample_bucket``) — reruns and engines agree
    bit-for-bit, so the whole mechanism (noise included) is
    oracle-checkable. The debiased estimate is a FLOOR over one double
    division of int64 numerator/denominator (exact in double below
    ~2^53: n*den*(k-1) <= 9e15 holds through ~1e10 rows at den=1e4,
    k<=10; beyond that widen to decimal).

    Returns one row per group (zero-reported groups keep their row —
    spine completeness): group, true_n, reported_n, est_n, abs_err.
    Requires k >= 2 groups (the replacement draw is mod k-1).

    Scale shape: one broadcast equi-join of the fact table to the
    bounded group spine, one groupBy, bounded-domain windows only.
    """
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    types = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("true_n"))
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy().orderBy("grp")) - 1,
        )
        .withColumn("k", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn("n", F.sum("true_n").over(Window.partitionBy()))
    )  # bounded: |groups| rows
    rows = df.select(
        F.col(id_col).alias("__id"), F.col(group_col).alias("grp")
    ).join(F.broadcast(types.select("grp", "idx", "k")), "grp")
    u = sample_bucket(F.col("__id"), den)
    # sample_bucket fixes its modulus at call time; the replacement draw
    # needs the data-dependent modulus k-1, so take the raw 60-bit hash
    # of a salted id and mod it per-row.
    h_alt = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("__id").cast("string"), F.lit(":alt")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    v = h_alt % (F.col("k") - 1)
    reported_idx = F.when(u < num, F.col("idx")).otherwise(
        F.when(v >= F.col("idx"), v + 1).otherwise(v)
    )
    reported = rows.select(reported_idx.alias("ridx")).groupBy("ridx").agg(
        F.count(F.lit(1)).alias("reported_n")
    )
    spine = types.join(
        reported, types["idx"] == reported["ridx"], "left"
    ).select(
        "grp",
        "true_n",
        F.coalesce("reported_n", F.lit(0)).alias("reported_n"),
        "k",
        "n",
    )
    numer = (
        F.col("reported_n") * den * (F.col("k") - 1)
        - (den - num) * F.col("n")
    ).cast("double")
    denom = (num * (F.col("k") - 1) - (den - num)).cast("double")
    est = F.floor(numer / denom).cast("long")
    return spine.select(
        "grp",
        "true_n",
        "reported_n",
        est.alias("est_n"),
        F.abs(est - F.col("true_n")).alias("abs_err"),
    ).orderBy("grp")


def randomized_response_oracle_sql(
    table: str,
    id_sql: str,
    group_sql: str,
    num: int = 7500,
    den: int = 10000,
) -> str:
    """DuckDB twin of :func:`randomized_response_counts`."""
    return f"""
    WITH types AS (
      SELECT {group_sql} AS grp, COUNT(*) AS true_n,
             ROW_NUMBER() OVER (ORDER BY {group_sql}) - 1 AS idx,
             COUNT(*) OVER () AS k,
             SUM(COUNT(*)) OVER () AS n
      FROM {table} GROUP BY 1
    ), rows_idx AS (
      SELECT t.idx, t.k,
        ('0x' || substr(md5(CAST(e.{id_sql} AS VARCHAR)), 1, 15))::BIGINT
          % {den} AS u,
        ('0x' || substr(md5(CAST(e.{id_sql} AS VARCHAR) || ':alt'), 1, 15))::BIGINT
          % (t.k - 1) AS v
      FROM {table} e JOIN types t ON {group_sql} = t.grp
    ), reported AS (
      SELECT CASE WHEN u < {num} THEN idx
                  WHEN v >= idx THEN v + 1 ELSE v END AS ridx,
             COUNT(*) AS reported_n
      FROM rows_idx GROUP BY 1
    )
    SELECT t.grp, CAST(t.true_n AS BIGINT) AS true_n,
           CAST(COALESCE(r.reported_n, 0) AS BIGINT) AS reported_n,
           CAST(FLOOR(
             CAST(COALESCE(r.reported_n, 0) * {den} * (t.k - 1)
                  - {den - num} * t.n AS DOUBLE)
             / CAST({num} * (t.k - 1) - {den - num} AS DOUBLE)
           ) AS BIGINT) AS est_n,
           ABS(CAST(FLOOR(
             CAST(COALESCE(r.reported_n, 0) * {den} * (t.k - 1)
                  - {den - num} * t.n AS DOUBLE)
             / CAST({num} * (t.k - 1) - {den - num} AS DOUBLE)
           ) AS BIGINT) - t.true_n) AS abs_err
    FROM types t LEFT JOIN reported r ON r.ridx = t.idx
    ORDER BY t.grp
    """
