"""Classical hypothesis tests and moment statistics, cross-engine exact.

Completes the inferential toolbox started by ``divergence.py`` (KS,
CUSUM, JS) and the ``proportion_ztest`` catalog entry:

- Mann-Whitney U (rank-sum) over a BOUNDED integer domain — the
  nonparametric two-sample location test, built scale-safe: the fact
  table collapses to per-value conditional counts (|domain| rows), the
  rank arithmetic runs over that metadata-scale frame, and the final z
  uses the normal approximation with the exact tie correction.
- Benford first-digit test — fraud/anomaly screening on an amount
  column; the nine expected proportions are hard literal constants
  (log10(1+1/d) precomputed) so no engine's ``log`` is in the loop.
- Day-of-week seasonality (chi-square uniformity) — the calendar
  profile + test in one scan.
- Pearson correlation matrix over integer-bridged measures — exact
  decimal(38,0) co-moments per pair, combined into r by a fixed
  double tree.

Every double in every output derives from exact integer counts through
a fixed expression tree (divisions, one sqrt) — bit-identical across
engines — then floors to fixed-point only for rendering. Each
statistic is one conditional-aggregate scan: at 100 TB these cost
exactly what a count costs (map-side combine, one-row or |domain|-row
shuffles).

Exactness bounds (documented, same discipline as proportion_ztest):
the corr-matrix co-moments accumulate in decimal(38,0) (no int64
ceiling at any realistic scale; both engines round the same exact
integer to the same nearest double past 2^53). The rank/count sums in
the other tests are int64 over counts, exact through sf1000 and
beyond (a count-shaped sum wraps only past ~9e18 rows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column

#: floor(log10(1+1/d) · 1e15)/1e15 rendered exactly — literal Benford
#: proportions shared by the Spark plan and the generated SQL twin, so
#: neither engine's transcendental library participates.
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def mann_whitney_u(
    df: DataFrame,
    value_col: str | Column,
    group1: Column,
    group2: Column,
) -> DataFrame:
    """Mann-Whitney U test between two row predicates over an integer
    value column with a bounded domain.

    Midranks are computed from cumulative per-value counts — doubled
    (``2·rank``) so ties' half-ranks stay in int64 — then
    U1 = R1 − n1(n1+1)/2, μ = n1·n2/2 and the tie-corrected
    σ² = n1·n2/12 · ((n+1) − Σ(t³−t)/(n(n−1))).

    Returns one row: n1, n2, u1_x2 (2·U1, exact int64), z_sc
    (floor(z·1e6)).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    per_value = (
        df.select(
            v.cast("long").alias("val"),
            group1.cast("long").alias("g1"),
            group2.cast("long").alias("g2"),
        )
        .where((F.col("g1") == 1) | (F.col("g2") == 1))
        .groupBy("val")
        .agg(F.sum("g1").alias("c1"), F.sum("g2").alias("c2"))
    )
    # metadata-scale frame (|domain| rows) — the unpartitioned window
    # is bounded by construction
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_value.withColumn("t", F.col("c1") + F.col("c2")).withColumn(
        "cum_before", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    # doubled midrank of every observation tied at this value:
    # 2·(cum_before + (t+1)/2) = 2·cum_before + t + 1
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_before") + F.col("t") + 1)).alias(
            "r1_x2"
        ),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1_x2 = F.col("r1_x2") - n1 * (n1 + 1)
    mu_x2 = (n1 * n2).cast("double")
    sigma2 = (n1 * n2).cast("double") / 12.0 * (
        (n + 1).cast("double")
        - F.col("tie3").cast("double") / (n * (n - 1)).cast("double")
    )
    denom = 2.0 * F.sqrt(sigma2)
    # all-tied degenerate case: sigma = 0 -> z undefined (NULL), and
    # ANSI mode would otherwise raise on the division
    z = F.when(denom > 0, (u1_x2.cast("double") - mu_x2) / denom)
    return agg.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        F.floor(z * 1000000).cast("long").alias("z_sc"),
    )


def mann_whitney_oracle_sql(
    table: str, value_sql: str, group1_sql: str, group2_sql: str
) -> str:
    """DuckDB twin of :func:`mann_whitney_u`."""
    return f"""
    WITH pv AS (
      SELECT CAST({value_sql} AS BIGINT) AS val,
             SUM(CASE WHEN {group1_sql} THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN {group2_sql} THEN 1 ELSE 0 END) AS c2
      FROM {table}
      WHERE ({group1_sql}) OR ({group2_sql})
      GROUP BY 1
    ), rk AS (
      SELECT c1, c2, c1 + c2 AS t,
             COALESCE(SUM(c1 + c2) OVER (
               ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM pv
    ), agg AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (2 * cum_before + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie3
      FROM rk
    )
    SELECT n1, n2,
      r1_x2 - n1 * (n1 + 1) AS u1_x2,
      CASE WHEN 2.0 * sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
            * (CAST(n1 + n2 + 1 AS DOUBLE)
               - CAST(tie3 AS DOUBLE)
                 / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))) > 0
      THEN CAST(FLOOR(
        (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
        / (2.0 * sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
            * (CAST(n1 + n2 + 1 AS DOUBLE)
               - CAST(tie3 AS DOUBLE)
                 / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))))
        * 1000000) AS BIGINT) END AS z_sc
    FROM agg
    """


def benford_digit_test(df: DataFrame, amount_col: str) -> DataFrame:
    """Benford's-law first-significant-digit screen.

    The leading digit comes from the decimal STRING rendering of the
    floored amount (portable — no ``log10`` on data), counts roll up in
    one scan, and each digit's chi-square contribution
    (obs − n·p_d)²/(n·p_d) uses the literal Benford constants. The
    9-row frame carries a total chi2_sc via a bounded window.

    The observed counts are left-joined onto a literal 1..9 digit
    spine (a 9-row broadcast), so a digit with ZERO observations still
    contributes its full expected mass n·p_d to chi2 — exactly the
    case where the data is most anomalous and the statistic must not
    be understated.

    Returns 9 rows always: digit, observed, expected_sc, contrib_sc,
    chi2_sc.
    """
    digit = F.substring(
        F.floor(F.col(amount_col)).cast("long").cast("string"), 1, 1
    ).cast("int")
    observed = (
        df.where(F.col(amount_col) >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(observed, "digit", "left").select(
        "digit", F.coalesce("observed", F.lit(0)).alias("observed")
    )
    n = Window.partitionBy()
    with_n = counts.withColumn("__n", F.sum("observed").over(n))
    expected = F.col("__n").cast("double") * _benford_p_expr()
    # n = 0 (empty input after the >= 1 gate) leaves expected = 0;
    # guard the division so ANSI mode can't raise and both engines
    # render NULL identically
    contrib = F.when(
        F.col("__n") > 0,
        (F.col("observed").cast("double") - expected)
        * (F.col("observed").cast("double") - expected)
        / expected,
    )
    scored = with_n.select(
        "digit",
        "observed",
        F.floor(expected * 1000000).cast("long").alias("expected_sc"),
        F.floor(contrib * 1000000).cast("long").alias("contrib_sc"),
    )
    return scored.withColumn(
        "chi2_sc", F.sum("contrib_sc").over(Window.partitionBy())
    ).orderBy("digit")


def _benford_p_expr() -> Column:
    expr = F.lit(None).cast("double")
    c = None
    for d, prob in BENFORD_P.items():
        if c is None:
            c = F.when(F.col("digit") == d, F.lit(prob))
        else:
            c = c.when(F.col("digit") == d, F.lit(prob))
    return c


def benford_oracle_sql(table: str, amount_sql: str) -> str:
    """DuckDB twin of :func:`benford_digit_test` — shares the literal
    Benford constants (full ``repr`` rendering) with the Spark plan."""
    cases = " ".join(
        f"WHEN {d} THEN {prob!r}" for d, prob in BENFORD_P.items()
    )
    return f"""
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(FLOOR({amount_sql}) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS observed
      FROM {table} WHERE {amount_sql} >= 1
      GROUP BY 1
    ), c AS (
      SELECT spine.digit, COALESCE(obs.observed, 0) AS observed
      FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) AS spine(digit)
      LEFT JOIN obs ON obs.digit = spine.digit
    ), w AS (
      SELECT digit, observed, SUM(observed) OVER () AS n FROM c
    ), s AS (
      SELECT digit, observed,
        CAST(FLOOR(CAST(n AS DOUBLE) * (CASE digit {cases} END) * 1000000) AS BIGINT) AS expected_sc,
        CASE WHEN n > 0 THEN CAST(FLOOR(
          (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * (CASE digit {cases} END))
          * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * (CASE digit {cases} END))
          / (CAST(n AS DOUBLE) * (CASE digit {cases} END)) * 1000000) AS BIGINT) END AS contrib_sc
      FROM w
    )
    SELECT digit, observed, expected_sc, contrib_sc,
           CAST(SUM(contrib_sc) OVER () AS BIGINT) AS chi2_sc
    FROM s ORDER BY digit
    """


def dow_seasonality(df: DataFrame, ts_col: str, amount_col: str) -> DataFrame:
    """Day-of-week profile with a chi-square uniformity test.

    One conditional-agg scan → 7 rows: dow (1=Sunday … 7=Saturday,
    Spark ``dayofweek`` convention), n_rows, amount_cents (exact int64
    cents), share_sc, contrib_sc (chi-square vs the uniform n/7), and
    the total chi2_sc on every row (bounded 7-row window).
    """
    counts = (
        df.select(
            F.dayofweek(F.col(ts_col)).alias("dow"),
            F.round(F.col(amount_col) * 100).cast("long").alias("__cents"),
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__cents").alias("amount_cents"),
        )
    )
    w = Window.partitionBy()
    with_n = counts.withColumn("__n", F.sum("n_rows").over(w))
    expected = F.col("__n").cast("double") / 7.0
    diff = F.col("n_rows").cast("double") - expected
    contrib = diff * diff / expected
    share = F.col("n_rows").cast("double") / F.col("__n").cast("double")
    out = with_n.select(
        "dow",
        "n_rows",
        "amount_cents",
        F.floor(share * 1000000).cast("long").alias("share_sc"),
        F.floor(contrib * 1000000).cast("long").alias("contrib_sc"),
    )
    return out.withColumn("chi2_sc", F.sum("contrib_sc").over(w)).orderBy("dow")


def dow_oracle_sql(table: str, ts_col: str, amount_col: str) -> str:
    """DuckDB twin — ``dayofweek`` is 0=Sunday there, shifted to match
    Spark's 1=Sunday."""
    return f"""
    WITH c AS (
      SELECT dayofweek({ts_col}) + 1 AS dow,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(ROUND({amount_col} * 100) AS BIGINT)) AS BIGINT) AS amount_cents
      FROM {table} GROUP BY 1
    ), w AS (
      SELECT *, SUM(n_rows) OVER () AS n FROM c
    )
    SELECT dow, n_rows, amount_cents,
      CAST(FLOOR(CAST(n_rows AS DOUBLE) / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS share_sc,
      CAST(FLOOR(
        (CAST(n_rows AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
        * (CAST(n_rows AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
        / (CAST(n AS DOUBLE) / 7.0) * 1000000) AS BIGINT) AS contrib_sc,
      CAST(SUM(CAST(FLOOR(
        (CAST(n_rows AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
        * (CAST(n_rows AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
        / (CAST(n AS DOUBLE) / 7.0) * 1000000) AS BIGINT)) OVER () AS BIGINT) AS chi2_sc
    FROM w ORDER BY dow
    """


def pearson_corr_matrix(df: DataFrame, int_exprs: dict[str, Column]) -> DataFrame:
    """Pairwise Pearson correlations over integer-bridged measures.

    ``int_exprs`` maps variable name → an int64 expression (callers
    floor/scale doubles into the bridge first). One aggregate scan
    collects every sum / sum-of-squares / cross-product exactly: the
    per-row product is int64 (exact while each operand < ~3e9, far
    above any price/qty bridge) and the ACCUMULATOR is decimal(38,0)
    (same discipline as seasonal.py's residual moments), so the sums
    never wrap regardless of row count — the ~8e8-row int64 ceiling
    the long accumulator had is gone. r for each pair combines them
    with the textbook (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) tree
    in DOUBLE; both engines round the same exact integer co-moments
    to the same nearest double, so the result stays bit-identical
    (beyond 2^53 the DOUBLE conversion rounds — identically — on
    both sides).

    Returns one row: n plus ``corr_{a}_{b}_sc`` (floor(r·1e6)) per
    unordered pair.
    """
    names = list(int_exprs)
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in names:
        aggs.append(F.sum(int_exprs[a].cast(dec)).alias(f"s_{a}"))
        aggs.append(
            F.sum((int_exprs[a] * int_exprs[a]).cast(dec)).alias(f"ss_{a}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum((int_exprs[a] * int_exprs[b]).cast(dec)).alias(
                    f"sp_{a}_{b}"
                )
            )
    g = df.agg(*aggs)
    out = [F.col("n")]
    nd = F.col("n").cast("double")
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            cov = nd * F.col(f"sp_{a}_{b}").cast("double") - F.col(
                f"s_{a}"
            ).cast("double") * F.col(f"s_{b}").cast("double")
            va = nd * F.col(f"ss_{a}").cast("double") - F.col(f"s_{a}").cast(
                "double"
            ) * F.col(f"s_{a}").cast("double")
            vb = nd * F.col(f"ss_{b}").cast("double") - F.col(f"s_{b}").cast(
                "double"
            ) * F.col(f"s_{b}").cast("double")
            r = cov / F.sqrt(va * vb)
            out.append(F.floor(r * 1000000).cast("long").alias(f"corr_{a}_{b}_sc"))
    return g.select(*out)


def corr_matrix_oracle_sql(table: str, int_sql: dict[str, str]) -> str:
    """DuckDB twin of :func:`pearson_corr_matrix` — the co-moment CTE
    keeps DECIMAL(38,0) (DuckDB SUM(BIGINT) is HUGEINT internally;
    never narrowed to BIGINT, matching the Spark side's decimal(38,0)
    accumulators), and only the DOUBLE-derived corr columns reach the
    output."""
    names = list(int_sql)
    sels = ["COUNT(*) AS n"]
    for a in names:
        sels.append(f"CAST(SUM({int_sql[a]}) AS DECIMAL(38,0)) AS s_{a}")
        sels.append(
            f"CAST(SUM(({int_sql[a]}) * ({int_sql[a]})) AS DECIMAL(38,0)) AS ss_{a}"
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            sels.append(
                f"CAST(SUM(({int_sql[a]}) * ({int_sql[b]})) AS DECIMAL(38,0)) AS sp_{a}_{b}"
            )
    outs = ["n"]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            outs.append(
                f"CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
                f" / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
                f" * 1000000) AS BIGINT) AS corr_{a}_{b}_sc"
            )
    return (
        "WITH m AS (SELECT "
        + ", ".join(sels)
        + f" FROM {table}) SELECT "
        + ", ".join(outs)
        + " FROM m"
    )


def cuped_report(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    boundary: str = "2024-01-16",
    value_scale: int = 100,
) -> DataFrame:
    """CUPED variance reduction for an A/B readout (Deng, Xu, Kohavi &
    Walker 2013): per user, X = pre-period value sum (covariate) and
    Y = post-period value sum (metric); theta = cov(X,Y)/var(X) from
    pooled moments; the adjusted metric Y* = Y − theta·(X − mean X)
    keeps each arm's expectation but strips the pre-period component
    of the variance — the standard trick that makes small experiment
    effects detectable.

    Treatment assignment is the md5 user bucket (parity-established) —
    arm = hash(user) mod 2 — so the whole readout is deterministic and
    oracle-checkable.

    Returns ONE row: n_users, n_treat, theta_sc, var_reduction_sc
    (var(Y*)/var(Y) — well below 1e6 when the covariate helps),
    diff_raw_fp (treat−control mean Y), diff_adj_fp (same on Y*).
    Identities used: mean Y*_a = (sy_a − θ·sx_a)/n_a + θ·mx;
    var(Y*) = var(Y) − 2θ·cov + θ²·var(X) — everything from one
    user-level aggregate and one moment row (int64 sums, decimal(38,0)
    second moments, fixed double tree; θ guarded NULL-free: var(X)<=0
    degenerates to θ=0, i.e. no adjustment).

    Scale shape: groupBy(user) over the fact scan (map-side combined),
    then a 1-row moment aggregate — a count's cost at any scale.
    """
    return cuped_from_user_stats(
        cuped_user_stats(events, user_col, ts_col, value_col, boundary, value_scale)
    )


def cuped_user_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    boundary: str = "2024-01-16",
    value_scale: int = 100,
) -> DataFrame:
    """The CUPED readout's SUFFICIENT STATISTICS: per-user int64
    (x = pre-period sum, y = post-period sum) — ADDITIVE on the user
    key, so the streaming twin (streaming/sink.py
    incremental_cuped_sink) maintains exactly this frame."""
    import datetime as _dt

    # epoch-micros comparison (NOTES #39): engines disagree on naive
    # timestamp casts but agree on exact epoch integers
    b_us = int(
        _dt.datetime.fromisoformat(boundary)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    pre = F.unix_micros(F.col(ts_col)) < b_us
    return events.groupBy(F.col(user_col).alias("__u")).agg(
        F.sum(
            F.when(pre, F.floor(F.col(value_col) * value_scale)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(~pre, F.floor(F.col(value_col) * value_scale)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("y"),
    )


def cuped_from_user_stats(per_user: DataFrame) -> DataFrame:
    """The 1-row CUPED report from a ``(__u, x, y)`` frame — shared by
    the batch operator and the streaming report, so maintained ==
    batch is structural."""
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    per_user = per_user.withColumn(
        "arm", (sample_bucket(F.col("__u"), 2)).cast("long")
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum(F.col("arm")).alias("n1"),
        F.sum(F.col("arm") * F.col("x")).alias("sx1"),
        F.sum(F.col("arm") * F.col("y")).alias("sy1"),
    )
    n_d = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n_d
    my = F.col("sy").cast("double") / n_d
    var_x = F.col("sxx").cast("double") / n_d - mx * mx
    var_y = F.col("syy").cast("double") / n_d - my * my
    cov = (
        F.col("sxy").cast("double") / n_d - mx * my
    )
    theta = F.when(var_x > 0.0, cov / var_x).otherwise(F.lit(0.0))
    n1_d = F.col("n1").cast("double")
    n0_d = n_d - n1_d
    my1 = F.col("sy1").cast("double") / n1_d
    my0 = (F.col("sy") - F.col("sy1")).cast("double") / n0_d
    mx1 = F.col("sx1").cast("double") / n1_d
    mx0 = (F.col("sx") - F.col("sx1")).cast("double") / n0_d
    adj1 = my1 - theta * (mx1 - mx)
    adj0 = my0 - theta * (mx0 - mx)
    var_adj = var_y - 2.0 * theta * cov + theta * theta * var_x
    reduction = F.when(var_y > 0.0, var_adj / var_y)
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("n1").cast("long").alias("n_treat"),
        F.floor(theta * 1000000).cast("long").alias("theta_sc"),
        F.floor(reduction * 1000000).cast("long").alias("var_reduction_sc"),
        F.floor(my1 - my0).cast("long").alias("diff_raw_fp"),
        F.floor(adj1 - adj0).cast("long").alias("diff_adj_fp"),
    )


def cuped_oracle_sql(
    table: str = "events",
    boundary: str = "2024-01-16",
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`cuped_report`."""
    import datetime as _dt

    b_us = int(
        _dt.datetime.fromisoformat(boundary)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    return f"""
    WITH per_user AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN epoch_us(ts) < {b_us}
          THEN CAST(FLOOR(value * {value_scale}) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS x,
        CAST(SUM(CASE WHEN epoch_us(ts) >= {b_us}
          THEN CAST(FLOOR(value * {value_scale}) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS y,
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
          AS arm
      FROM {table} GROUP BY user_id
    ), m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy,
             SUM(arm) AS n1, SUM(arm * x) AS sx1, SUM(arm * y) AS sy1
      FROM per_user
    ), d AS (
      SELECT n, n1, sx, sy, sx1, sy1,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS var_x,
        CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS var_y,
        CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov
      FROM m
    ), t AS (
      SELECT *, CASE WHEN var_x > 0 THEN cov / var_x ELSE 0 END AS theta
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n_users, CAST(n1 AS BIGINT) AS n_treat,
      CAST(FLOOR(theta * 1000000) AS BIGINT) AS theta_sc,
      CASE WHEN var_y > 0 THEN
        CAST(FLOOR((var_y - 2.0 * theta * cov + theta * theta * var_x)
          / var_y * 1000000) AS BIGINT) END AS var_reduction_sc,
      CAST(FLOOR(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        - CAST(sy - sy1 AS DOUBLE) / CAST(n - n1 AS DOUBLE)) AS BIGINT)
        AS diff_raw_fp,
      CAST(FLOOR(
        (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - theta * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - mx))
        - (CAST(sy - sy1 AS DOUBLE) / CAST(n - n1 AS DOUBLE)
          - theta * (CAST(sx - sx1 AS DOUBLE) / CAST(n - n1 AS DOUBLE) - mx))
      ) AS BIGINT) AS diff_adj_fp
    FROM t
    """


def did_report(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    boundary: str = "2024-01-16",
    value_scale: int = 100,
) -> DataFrame:
    """Difference-in-differences readout (Card & Krueger 1994 design)
    over the 2x2 (md5-bucket arm x pre/post period) cell grid:
    DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre), with the
    large-sample standard error sqrt(Σ var_cell / n_cell) and the z
    statistic — the panel-free causal companion to ``cuped_report``
    (CUPED shrinks variance with the pre-period; DiD differences it
    out entirely).

    One conditional-aggregate scan: per cell n, Σv, Σv² (decimal(38,0))
    → means/variances as fixed double trees (sqrt is IEEE-exact).
    Value bridge: FLOOR(value·scale) int64. Returns ONE row:
    n_{tp,tr,cp,cr}, mean_sc per cell, did_sc, se_sc, z_sc (NULL when
    any cell is empty or se is 0 — fail closed, both engines).
    """
    import datetime as _dt

    from pasta_pipeline_spark.operators.sampling import sample_bucket

    b_us = int(
        _dt.datetime.fromisoformat(boundary)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    v = F.floor(F.col(value_col) * value_scale).cast("long")
    arm = sample_bucket(F.col(user_col), 2)
    post = (F.unix_micros(F.col(ts_col)) >= b_us).cast("long")
    base = events.select(
        arm.alias("__arm"), post.alias("__post"), v.alias("__v")
    )
    cells = {}
    aggs = []
    for a in (0, 1):
        for p in (0, 1):
            tag = f"{a}{p}"
            cond = (F.col("__arm") == a) & (F.col("__post") == p)
            aggs.append(F.sum(cond.cast("long")).alias(f"n_{tag}"))
            aggs.append(
                F.sum(F.when(cond, F.col("__v")).otherwise(0)).alias(f"s_{tag}")
            )
            aggs.append(
                F.sum(
                    F.when(cond, (F.col("__v") * F.col("__v")).cast("decimal(38,0)"))
                    .otherwise(F.lit(0).cast("decimal(38,0)"))
                ).alias(f"q_{tag}")
            )
            cells[tag] = None
    m = base.agg(*aggs)
    mean = {}
    var = {}
    for tag in cells:
        n_d = F.col(f"n_{tag}").cast("double")
        # NULL (not /0) on an empty cell: the guards downstream read
        # these, so the division itself must be ANSI-safe
        mean[tag] = F.when(
            F.col(f"n_{tag}") > 0, F.col(f"s_{tag}").cast("double") / n_d
        )
        var[tag] = F.when(
            F.col(f"n_{tag}") > 0,
            F.col(f"q_{tag}").cast("double") / n_d - mean[tag] * mean[tag],
        )
    did = (mean["11"] - mean["10"]) - (mean["01"] - mean["00"])
    se = F.sqrt(
        var["11"] / F.col("n_11").cast("double")
        + var["10"] / F.col("n_10").cast("double")
        + var["01"] / F.col("n_01").cast("double")
        + var["00"] / F.col("n_00").cast("double")
    )
    nonempty = (
        (F.col("n_00") > 0)
        & (F.col("n_01") > 0)
        & (F.col("n_10") > 0)
        & (F.col("n_11") > 0)
    )
    return m.select(
        F.col("n_10").alias("n_treat_pre"),
        F.col("n_11").alias("n_treat_post"),
        F.col("n_00").alias("n_ctrl_pre"),
        F.col("n_01").alias("n_ctrl_post"),
        F.floor(F.when(nonempty, mean["10"]) * 10000).cast("long").alias("mean_tp_sc"),
        F.floor(F.when(nonempty, mean["11"]) * 10000).cast("long").alias("mean_tq_sc"),
        F.floor(F.when(nonempty, mean["00"]) * 10000).cast("long").alias("mean_cp_sc"),
        F.floor(F.when(nonempty, mean["01"]) * 10000).cast("long").alias("mean_cq_sc"),
        F.floor(F.when(nonempty, did) * 10000).cast("long").alias("did_sc"),
        F.floor(F.when(nonempty, se) * 10000).cast("long").alias("se_sc"),
        F.floor(F.when(nonempty & (se > 0.0), did / se) * 1000000)
        .cast("long")
        .alias("z_sc"),
    )


def did_oracle_sql(
    table: str = "events",
    boundary: str = "2024-01-16",
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`did_report`."""
    import datetime as _dt

    b_us = int(
        _dt.datetime.fromisoformat(boundary)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    cell = lambda a, p: f"(arm = {a} AND post = {p})"  # noqa: E731
    sums = []
    for a in (0, 1):
        for p in (0, 1):
            t = f"{a}{p}"
            sums.append(
                f"CAST(SUM(CASE WHEN {cell(a, p)} THEN 1 ELSE 0 END) AS BIGINT) AS n_{t},"
                f" CAST(SUM(CASE WHEN {cell(a, p)} THEN v ELSE 0 END) AS BIGINT) AS s_{t},"
                f" SUM(CASE WHEN {cell(a, p)} THEN v * v ELSE 0 END) AS q_{t}"
            )
    agg = ",\n             ".join(sums)
    mean = {
        f"{a}{p}": f"(CASE WHEN n_{a}{p} > 0 THEN CAST(s_{a}{p} AS DOUBLE)"
        f" / CAST(n_{a}{p} AS DOUBLE) END)"
        for a in (0, 1)
        for p in (0, 1)
    }
    var = {
        t: f"(CASE WHEN n_{t} > 0 THEN CAST(q_{t} AS DOUBLE)"
        f" / CAST(n_{t} AS DOUBLE) - {mean[t]} * {mean[t]} END)"
        for t in mean
    }
    did = f"(({mean['11']} - {mean['10']}) - ({mean['01']} - {mean['00']}))"
    se = (
        "sqrt("
        + " + ".join(
            f"{var[t]} / CAST(n_{t} AS DOUBLE)" for t in ("11", "10", "01", "00")
        )
        + ")"
    )
    ok = "n_00 > 0 AND n_01 > 0 AND n_10 > 0 AND n_11 > 0"
    return f"""
    WITH base AS (
      SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
             CASE WHEN epoch_us(ts) >= {b_us} THEN 1 ELSE 0 END AS post,
             CAST(FLOOR(value * {value_scale}) AS BIGINT) AS v
      FROM {table}
    ), m AS (
      SELECT {agg}
      FROM base
    )
    SELECT n_10 AS n_treat_pre, n_11 AS n_treat_post,
           n_00 AS n_ctrl_pre, n_01 AS n_ctrl_post,
      CASE WHEN {ok} THEN CAST(FLOOR({mean['10']} * 10000) AS BIGINT) END AS mean_tp_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({mean['11']} * 10000) AS BIGINT) END AS mean_tq_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({mean['00']} * 10000) AS BIGINT) END AS mean_cp_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({mean['01']} * 10000) AS BIGINT) END AS mean_cq_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({did} * 10000) AS BIGINT) END AS did_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({se} * 10000) AS BIGINT) END AS se_sc,
      CASE WHEN {ok} AND {se} > 0 THEN CAST(FLOOR({did} / {se} * 1000000) AS BIGINT) END AS z_sc
    FROM m
    """


def ratio_metric_delta(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 100,
) -> DataFrame:
    """Delta-method readout for a RATIO metric (Deng, Knoblich & Lu
    2018; the value-per-event shape): per user X = Σ value, Y = event
    count; the metric is R = ΣX/ΣY (= mean x̄/ȳ over users), whose
    variance a naive per-user mean gets WRONG because users are the
    randomization unit, not events. Per arm (md5 user bucket):

        var(R) ≈ (1/n·ȳ²)·(s_xx − 2R·s_xy + R²·s_yy)

    with s_** the user-level (co)variances — the first-order Taylor
    (delta-method) expansion. Reports both arms' ratios, the
    difference, its SE (sqrt of summed arm variances), and z.

    One groupBy(user) + one conditional-moment scan (decimal(38,0)
    second moments); all statistics fixed double trees (sqrt is
    IEEE-exact). Degenerate arms (empty, or zero event mass) fail
    closed to NULL.

    Returns ONE row: n_ctrl, n_treat, ratio0_sc, ratio1_sc, diff_sc,
    se_sc, z_sc (scale 1e6 for ratios/diff/se, 1e6 for z).
    """
    return ratio_delta_from_user_stats(
        ratio_user_stats(events, user_col, value_col, value_scale)
    )


def ratio_user_stats(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    value_scale: int = 100,
) -> DataFrame:
    """The ratio metric's SUFFICIENT STATISTICS: per-user int64
    (x = value sum, y = event count) — additive on the user key (the
    streaming twin's state; streaming/sink.py
    incremental_ratio_delta_sink)."""
    v = F.floor(F.col(value_col) * value_scale).cast("long")
    return events.groupBy(F.col(user_col).alias("__u")).agg(
        F.sum(v).cast("long").alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )


def ratio_delta_from_user_stats(per_user: DataFrame) -> DataFrame:
    """The 1-row delta-method report from a ``(__u, x, y)`` frame —
    shared by batch and streaming (maintained == batch structural)."""
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    per_user = per_user.withColumn(
        "arm", sample_bucket(F.col("__u"), 2).cast("long")
    )
    aggs = []
    for a in (0, 1):
        c = F.col("arm") == a
        aggs += [
            F.sum(c.cast("long")).alias(f"n{a}"),
            F.sum(F.when(c, F.col("x")).otherwise(0)).alias(f"sx{a}"),
            F.sum(F.when(c, F.col("y")).otherwise(0)).alias(f"sy{a}"),
            F.sum(
                F.when(c, (F.col("x") * F.col("x")).cast("decimal(38,0)"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"qxx{a}"),
            F.sum(
                F.when(c, (F.col("x") * F.col("y")).cast("decimal(38,0)"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"qxy{a}"),
            F.sum(
                F.when(c, (F.col("y") * F.col("y")).cast("decimal(38,0)"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"qyy{a}"),
        ]
    m = per_user.agg(*aggs)

    def arm_stats(a: int):
        n = F.col(f"n{a}").cast("double")
        ok = (F.col(f"n{a}") > 1) & (F.col(f"sy{a}") > 0)
        mx = F.col(f"sx{a}").cast("double") / n
        my = F.col(f"sy{a}").cast("double") / n
        sxx = F.col(f"qxx{a}").cast("double") / n - mx * mx
        sxy = F.col(f"qxy{a}").cast("double") / n - mx * my
        syy = F.col(f"qyy{a}").cast("double") / n - my * my
        r = F.when(ok, mx / my)
        var_r = F.when(
            ok,
            (sxx - 2.0 * r * sxy + r * r * syy) / (n * my * my),
        )
        return r, var_r, ok

    r0, v0, ok0 = arm_stats(0)
    r1, v1, ok1 = arm_stats(1)
    ok = ok0 & ok1
    diff = r1 - r0
    se = F.sqrt(v0 + v1)
    return m.select(
        F.col("n0").cast("long").alias("n_ctrl"),
        F.col("n1").cast("long").alias("n_treat"),
        F.floor(F.when(ok, r0) * 1000000).cast("long").alias("ratio0_sc"),
        F.floor(F.when(ok, r1) * 1000000).cast("long").alias("ratio1_sc"),
        F.floor(F.when(ok, diff) * 1000000).cast("long").alias("diff_sc"),
        F.floor(F.when(ok, se) * 1000000).cast("long").alias("se_sc"),
        F.floor(F.when(ok & (se > 0.0), diff / se) * 1000000)
        .cast("long")
        .alias("z_sc"),
    )


def ratio_delta_oracle_sql(
    table: str = "events", value_scale: int = 100
) -> str:
    """DuckDB twin of :func:`ratio_metric_delta`."""
    arm = ("(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
           " % 2)")
    aggs = []
    for a in (0, 1):
        c = f"arm = {a}"
        aggs.append(
            f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS n{a},"
            f" CAST(SUM(CASE WHEN {c} THEN x ELSE 0 END) AS BIGINT) AS sx{a},"
            f" CAST(SUM(CASE WHEN {c} THEN y ELSE 0 END) AS BIGINT) AS sy{a},"
            f" SUM(CASE WHEN {c} THEN x * x ELSE 0 END) AS qxx{a},"
            f" SUM(CASE WHEN {c} THEN x * y ELSE 0 END) AS qxy{a},"
            f" SUM(CASE WHEN {c} THEN y * y ELSE 0 END) AS qyy{a}"
        )
    agg = ",\n             ".join(aggs)

    def stats(a: int):
        n = f"CAST(n{a} AS DOUBLE)"
        mx = f"(CAST(sx{a} AS DOUBLE) / {n})"
        my = f"(CAST(sy{a} AS DOUBLE) / {n})"
        sxx = f"(CAST(qxx{a} AS DOUBLE) / {n} - {mx} * {mx})"
        sxy = f"(CAST(qxy{a} AS DOUBLE) / {n} - {mx} * {my})"
        syy = f"(CAST(qyy{a} AS DOUBLE) / {n} - {my} * {my})"
        r = f"({mx} / {my})"
        var = (
            f"(({sxx} - 2.0 * {r} * {sxy} + {r} * {r} * {syy})"
            f" / ({n} * {my} * {my}))"
        )
        return r, var

    r0, v0 = stats(0)
    r1, v1 = stats(1)
    ok = "n0 > 1 AND n1 > 1 AND sy0 > 0 AND sy1 > 0"
    se = f"sqrt({v0} + {v1})"
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(FLOOR(value * {value_scale}) AS BIGINT)) AS BIGINT) AS x,
             COUNT(*) AS y,
             {arm} AS arm
      FROM {table} GROUP BY user_id
    ), m AS (
      SELECT {agg}
      FROM per_user
    )
    SELECT n0 AS n_ctrl, n1 AS n_treat,
      CASE WHEN {ok} THEN CAST(FLOOR({r0} * 1000000) AS BIGINT) END AS ratio0_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({r1} * 1000000) AS BIGINT) END AS ratio1_sc,
      CASE WHEN {ok} THEN CAST(FLOOR(({r1} - {r0}) * 1000000) AS BIGINT) END AS diff_sc,
      CASE WHEN {ok} THEN CAST(FLOOR({se} * 1000000) AS BIGINT) END AS se_sc,
      CASE WHEN {ok} AND {se} > 0 THEN
        CAST(FLOOR(({r1} - {r0}) / {se} * 1000000) AS BIGINT) END AS z_sc
    FROM m
    """
