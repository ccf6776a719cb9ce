"""A/B testing tier II — the experiment-practice checks around the
r8 causal estimators (CUPED / DiD / delta-method): sample-ratio
mismatch (global and per-segment), quantile treatment effects,
post-stratification, the power-planning grid, the trimmed-mean
(whale-robust) effect, and group-sequential early stopping
(O'Brien-Fleming boundaries).

All of them follow the tier's determinism playbook: arms come from the
md5 user bucket (``sampling.sample_bucket`` — a pure function of the
id, so "random" assignment is cross-engine exact), values ride the
FLOOR(v·scale) int64 bridge, second moments accumulate in
decimal(38,0), and the only doubles are fixed expression trees whose
sqrt/± operations are IEEE-exact (NOTES #45) — every report is
full-hash oracle-checkable, including the z constants (rational
literals, not a normal-quantile function call).

Scale shapes: every operator is one groupBy(user) over the fact scan
followed by bounded-domain work (1-row moments, a |strata|-row frame,
or the quantile tier's range-partition ranks) — a count's cost at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point z constants (·1e6): two-sided alpha = 0.05 and
#: power = 0.80 — the planning defaults every experimentation platform
#: uses. Literals (not Phi^-1 calls) so both engines compute the same
#: integers; swap via parameters for other designs.
Z_ALPHA_SC = 1_959_964   # Phi^-1(0.975)
Z_BETA_SC = 841_621      # Phi^-1(0.80)

#: chi-square df=1 critical value at 5% (·1e6) for the SRM flag.
CHI2_CRIT_SC = 3_841_459


def _per_user(events: DataFrame, user_col: str, value_col: str, value_scale: int):
    """(__u, arm, y): per-user int64 value sum + md5 arm."""
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    v = F.floor(F.col(value_col) * value_scale).cast("long")
    per_user = events.groupBy(F.col(user_col).alias("__u")).agg(
        # coalesce: an all-NULL user must sum to 0, not NULL — engines
        # order NULLs differently, so a NULL y would break QTE ranks
        F.coalesce(F.sum(v), F.lit(0)).cast("long").alias("y")
    )
    return per_user.withColumn("arm", sample_bucket(F.col("__u"), 2).cast("long"))


def srm_check(
    events: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Sample-ratio mismatch — the first sanity gate of any experiment
    readout (Fabijan et al. 2019 catalog it as the most common and
    most damaging A/B bug): with a 50/50 design, the chi-square
    statistic for the observed user split is ``(n0 − n1)² / n``; a
    value past the df=1 critical point means assignment, logging, or
    filtering is broken and every downstream estimate is suspect.

    Returns ONE row: n_users, n_ctrl, n_treat, chi2_sc (·1e6), and
    srm_flag (chi2 above the 5% critical value). The statistic is one
    double division of exact int64s — hash-stable; no p-value function
    is needed because the decision constant is fixed.
    """
    return srm_from_users(events.select(F.col(user_col).alias("__u")).distinct())


def srm_from_users(users: DataFrame) -> DataFrame:
    """SRM readout from a distinct-user frame (``__u``) — the shared
    core of :func:`srm_check` and the streaming twin
    (``streaming/sink.py incremental_srm_sink``): live == batch by
    construction because both derive from the same user set and the
    md5 arm is a pure function of the id."""
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    m = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sample_bucket(F.col("__u"), 2)).alias("n1"),
    )
    n_d = F.col("n").cast("double")
    n1_d = F.col("n1").cast("double")
    diff = n_d - 2.0 * n1_d  # n0 - n1
    chi2 = F.when(F.col("n") > 0, diff * diff / n_d)
    chi2_sc = F.floor(chi2 * 1_000_000).cast("long")
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        (F.col("n") - F.col("n1")).cast("long").alias("n_ctrl"),
        F.col("n1").cast("long").alias("n_treat"),
        chi2_sc.alias("chi2_sc"),
        (chi2_sc > CHI2_CRIT_SC).alias("srm_flag"),
    )


def srm_oracle_sql(table: str = "events", user_sql: str = "user_id") -> str:
    """DuckDB twin of :func:`srm_check`."""
    return f"""
    WITH users AS (
      SELECT DISTINCT {user_sql} AS u FROM {table}
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2)
               AS BIGINT) AS n1
      FROM users
    )
    SELECT n AS n_users, n - n1 AS n_ctrl, n1 AS n_treat,
      CAST(FLOOR(
        (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        * (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS chi2_sc,
      CAST(FLOOR(
        (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        * (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        / CAST(n AS DOUBLE) * 1000000) AS BIGINT) > {CHI2_CRIT_SC} AS srm_flag
    FROM m"""


def quantile_treatment_effect(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    grid: tuple = None,
    value_scale: int = 100,
) -> DataFrame:
    """Quantile treatment effects — the distributional readout a mean
    difference hides (heavy-tailed revenue metrics move in the tail
    long before the mean is significant): per grid point p, the
    difference of the two arms' Type-7 quantiles of the per-user
    metric. Reuses the exact_quantiles machinery per arm (rank via
    range partitioning — no global sort), joined on p.

    Returns one row per grid point, ordered: p_sc, n_ctrl, n_treat,
    q_ctrl_sc, q_treat_sc, qte_sc (treat − ctrl).
    """
    return qte_from_per_user(
        _per_user(events, user_col, value_col, value_scale), grid=grid
    )


def qte_from_per_user(per_user: DataFrame, grid: tuple = None) -> DataFrame:
    """QTE readout from a per-user frame (``__u``, ``arm``, ``y``) —
    the shared core of :func:`quantile_treatment_effect` and the
    streaming twin (``incremental_qte_sink``): the per-user int64 sums
    ARE the sufficient state, so a live readout over maintained state
    equals the batch readout over all events ever ingested."""
    from pasta_pipeline_spark.operators.exact_quantiles import (
        DEFAULT_GRID,
        interpolated_quantiles,
    )

    if grid is None:
        grid = DEFAULT_GRID
    # the quantile operator applies its own FLOOR(v·scale) bridge —
    # feed back the already-exact integer sum at scale 1
    arm = {
        a: interpolated_quantiles(
            per_user.where(F.col("arm") == a).select("__u", "y"),
            "y",
            "__u",
            grid=grid,
            value_scale=1,
        )
        for a in (0, 1)
    }
    c = arm[0].select(
        F.col("p_sc"),
        F.col("n").alias("n_ctrl"),
        F.col("q_sc").alias("q_ctrl_sc"),
    )
    t = arm[1].select(
        F.col("p_sc").alias("p_sc_t"),
        F.col("n").alias("n_treat"),
        F.col("q_sc").alias("q_treat_sc"),
    )
    return (
        c.join(F.broadcast(t), c["p_sc"] == t["p_sc_t"])
        .select(
            "p_sc",
            "n_ctrl",
            "n_treat",
            "q_ctrl_sc",
            "q_treat_sc",
            (F.col("q_treat_sc") - F.col("q_ctrl_sc")).alias("qte_sc"),
        )
        .orderBy("p_sc")
    )


def qte_oracle_sql(
    table: str = "events",
    user_sql: str = "user_id",
    value_sql: str = "value",
    grid: tuple = None,
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`quantile_treatment_effect` — the
    exact_quantiles rank/target recipe, once per arm."""
    from pasta_pipeline_spark.operators.exact_quantiles import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    grid_rows = ", ".join(f"({num}, {den})" for num, den in grid)
    arms = []
    for a in (0, 1):
        arms.append(f""", ranked{a} AS (
      SELECT y AS v, ROW_NUMBER() OVER (ORDER BY y, u) AS rnk
      FROM per_user WHERE arm = {a}
    ), n{a} AS (SELECT COUNT(*) AS n FROM per_user WHERE arm = {a}),
    targets{a} AS (
      SELECT num, den, n,
             ((n - 1) * num) // den + 1 AS lo,
             CASE WHEN ((n - 1) * num) % den = 0
               THEN ((n - 1) * num) // den + 1
               ELSE ((n - 1) * num) // den + 2 END AS hi
      FROM grid CROSS JOIN n{a}
    ), q{a} AS (
      SELECT CAST((t.num * 1000000) // t.den AS BIGINT) AS p_sc,
        CAST(t.n AS BIGINT) AS n,
        CAST(FLOOR((CAST(rl.v AS DOUBLE)
          + (CAST(((t.n - 1) * t.num) % t.den AS DOUBLE)
             / CAST(t.den AS DOUBLE))
            * CAST(rh.v - rl.v AS DOUBLE)) * 10000) AS BIGINT) AS q_sc
      FROM targets{a} t
      JOIN ranked{a} rl ON rl.rnk = t.lo
      JOIN ranked{a} rh ON rh.rnk = t.hi
    )""")
    return f"""
    WITH per_user AS (
      SELECT u, y,
             ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
      FROM (
        SELECT {user_sql} AS u,
               CAST(COALESCE(SUM(CAST(FLOOR({value_sql} * {value_scale})
                 AS BIGINT)), 0) AS BIGINT) AS y
        FROM {table} GROUP BY 1
      )
    ), grid(num, den) AS (VALUES {grid_rows}){"".join(arms)}
    SELECT q0.p_sc, q0.n AS n_ctrl, q1.n AS n_treat,
           q0.q_sc AS q_ctrl_sc, q1.q_sc AS q_treat_sc,
           q1.q_sc - q0.q_sc AS qte_sc
    FROM q0 JOIN q1 USING (p_sc)
    ORDER BY p_sc"""


def post_stratified_effect(
    events: DataFrame,
    user_col: str = "user_id",
    strata_col: str = "stratum",
    value_col: str = "value",
    value_scale: int = 100,
) -> DataFrame:
    """Post-stratification — the free variance reduction when a
    categorical covariate (country, platform, signup cohort) explains
    outcome variance: estimate the effect within each stratum and
    combine with POOLED stratum weights w_s = n_s/n, so imbalanced
    stratum mixes across arms stop polluting the estimate
    (Miratrix, Sekhon & Yu 2013). SE² = Σ w_s²(var_s1/n_s1 +
    var_s0/n_s0); any stratum with an empty arm cell fails the whole
    readout closed to NULL — enforced by an explicit bad-stratum
    count gating diff_ps/se_ps/z (SUM alone would silently DROP the
    NULL per-stratum terms while n_users still counts those users,
    deflating the estimate — the r9 advisor finding), mirrored in the
    DuckDB twin (both engines).

    A user's stratum is its MINIMUM observed value (deterministic when
    events disagree). Returns ONE row: n_strata, n_users, diff_raw_sc
    (unstratified mean diff), diff_ps_sc, se_ps_sc, z_ps_sc (·1e6, on
    the value scale).
    """
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    v = F.floor(F.col(value_col) * value_scale).cast("long")
    per_user = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.col(strata_col)).alias("s"),
        F.coalesce(F.sum(v), F.lit(0)).cast("long").alias("y"),
    )
    per_user = per_user.withColumn(
        "arm", sample_bucket(F.col("__u"), 2).cast("long")
    )
    return post_strat_from_per_user(per_user)


def post_strat_from_per_user(per_user: DataFrame) -> DataFrame:
    """Post-stratified readout from a per-user frame (``__u``, ``s``,
    ``y``, ``arm``) — the shared core of :func:`post_stratified_effect`
    and the streaming twin (``incremental_post_strat_sink``); the
    (user, stratum)-keyed int64 sums are the sufficient state."""
    cells = per_user.groupBy("s", "arm").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum("y").alias("cs"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("cq"),
    )
    cn_d = F.col("cn").cast("double")
    mean_c = F.when(F.col("cn") > 0, F.col("cs").cast("double") / cn_d)
    var_c = F.when(
        F.col("cn") > 0, F.col("cq").cast("double") / cn_d - mean_c * mean_c
    )
    by_s = (
        cells.groupBy("s")
        .agg(
            F.sum("cn").alias("ns"),
            F.min(F.when(F.col("arm") == 0, F.col("cn"))).alias("n0"),
            F.min(F.when(F.col("arm") == 1, F.col("cn"))).alias("n1"),
            F.min(F.when(F.col("arm") == 0, mean_c)).alias("m0"),
            F.min(F.when(F.col("arm") == 1, mean_c)).alias("m1"),
            F.min(F.when(F.col("arm") == 0, var_c)).alias("v0"),
            F.min(F.when(F.col("arm") == 1, var_c)).alias("v1"),
        )
    )  # bounded: |strata| rows
    ns_d = F.col("ns").cast("double")
    m = by_s.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("ns").cast("long").alias("n_users"),
        F.sum(ns_d * (F.col("m1") - F.col("m0"))).alias("wdiff_n"),
        F.sum(
            ns_d
            * ns_d
            * (
                F.col("v1") / F.col("n1").cast("double")
                + F.col("v0") / F.col("n0").cast("double")
            )
        ).alias("wvar_nn"),
        # strata where an arm cell is empty: SUM skips their NULL
        # terms, so the estimate must fail closed when any exist
        F.sum(
            F.when(F.col("n0").isNull() | F.col("n1").isNull(), 1).otherwise(0)
        ).alias("bad_strata"),
    )
    # wdiff_n / n and sqrt(wvar_nn) / n: the 1/n weights factored out
    # of the sums so both engines fold the same double tree
    n_d = F.col("n_users").cast("double")
    ok = F.col("bad_strata") == 0
    diff_ps = F.when(ok, F.col("wdiff_n") / n_d)
    se_ps = F.when(ok, F.sqrt(F.col("wvar_nn")) / n_d)
    raw = per_user.agg(
        F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, 1)).alias("k1"),
        F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, 1)).alias("k0"),
    ).select(
        (
            F.col("s1").cast("double") / F.col("k1").cast("double")
            - F.col("s0").cast("double") / F.col("k0").cast("double")
        ).alias("raw_diff")
    )
    return m.crossJoin(F.broadcast(raw)).select(
        "n_strata",
        "n_users",
        F.floor(F.col("raw_diff") * 10000).cast("long").alias("diff_raw_sc"),
        F.floor(diff_ps * 10000).cast("long").alias("diff_ps_sc"),
        F.floor(se_ps * 10000).cast("long").alias("se_ps_sc"),
        F.floor(F.when(se_ps > 0.0, diff_ps / se_ps) * 1_000_000)
        .cast("long")
        .alias("z_ps_sc"),
    )


def post_stratified_oracle_sql(
    table: str = "events",
    user_sql: str = "user_id",
    strata_sql: str = "stratum",
    value_sql: str = "value",
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`post_stratified_effect`."""
    return f"""
    WITH per_user AS (
      SELECT u, s, y,
             ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
      FROM (
        SELECT {user_sql} AS u, MIN({strata_sql}) AS s,
               CAST(COALESCE(SUM(CAST(FLOOR({value_sql} * {value_scale})
                 AS BIGINT)), 0) AS BIGINT) AS y
        FROM {table} GROUP BY 1
      )
    ), cells AS (
      SELECT s, arm, CAST(COUNT(*) AS BIGINT) AS cn,
             CAST(SUM(y) AS BIGINT) AS cs,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS cq
      FROM per_user GROUP BY 1, 2
    ), by_s AS (
      SELECT s, SUM(cn) AS ns,
        MIN(CASE WHEN arm = 0 THEN cn END) AS n0,
        MIN(CASE WHEN arm = 1 THEN cn END) AS n1,
        MIN(CASE WHEN arm = 0 AND cn > 0
            THEN CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) END) AS m0,
        MIN(CASE WHEN arm = 1 AND cn > 0
            THEN CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) END) AS m1,
        MIN(CASE WHEN arm = 0 AND cn > 0
            THEN CAST(cq AS DOUBLE) / CAST(cn AS DOUBLE)
               - (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE))
                 * (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)) END) AS v0,
        MIN(CASE WHEN arm = 1 AND cn > 0
            THEN CAST(cq AS DOUBLE) / CAST(cn AS DOUBLE)
               - (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE))
                 * (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)) END) AS v1
      FROM cells GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(ns) AS BIGINT) AS n_users,
             SUM(CAST(ns AS DOUBLE) * (m1 - m0)) AS wdiff_n,
             SUM(CAST(ns AS DOUBLE) * CAST(ns AS DOUBLE)
                 * (v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)))
               AS wvar_nn,
             SUM(CASE WHEN n0 IS NULL OR n1 IS NULL THEN 1 ELSE 0 END)
               AS bad_strata
      FROM by_s
    ), raw AS (
      SELECT SUM(CASE WHEN arm = 1 THEN CAST(y AS DOUBLE) END)
               / SUM(CASE WHEN arm = 1 THEN 1.0 END)
           - SUM(CASE WHEN arm = 0 THEN CAST(y AS DOUBLE) END)
               / SUM(CASE WHEN arm = 0 THEN 1.0 END) AS raw_diff
      FROM per_user
    )
    SELECT n_strata, n_users,
      CAST(FLOOR(raw_diff * 10000) AS BIGINT) AS diff_raw_sc,
      CAST(FLOOR(CASE WHEN bad_strata = 0
        THEN wdiff_n / CAST(n_users AS DOUBLE) END * 10000) AS BIGINT)
        AS diff_ps_sc,
      CAST(FLOOR(CASE WHEN bad_strata = 0
        THEN sqrt(wvar_nn) / CAST(n_users AS DOUBLE) END * 10000) AS BIGINT)
        AS se_ps_sc,
      CAST(FLOOR(CASE WHEN bad_strata = 0
          AND sqrt(wvar_nn) / CAST(n_users AS DOUBLE) > 0.0
        THEN (wdiff_n / CAST(n_users AS DOUBLE))
             / (sqrt(wvar_nn) / CAST(n_users AS DOUBLE)) END * 1000000)
        AS BIGINT) AS z_ps_sc
    FROM m CROSS JOIN raw"""


DEFAULT_MDE_GRID_SC = (10_000, 20_000, 50_000, 100_000)  # 1/2/5/10% (·1e6)


def ab_power_grid(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    mde_grid_sc: tuple = DEFAULT_MDE_GRID_SC,
    value_scale: int = 100,
    z_alpha_sc: int = Z_ALPHA_SC,
    z_beta_sc: int = Z_BETA_SC,
) -> DataFrame:
    """Power planning off the live metric moments: for each relative
    MDE, the classical two-sample required n per arm,

        n = 2 σ² (z_{α/2} + z_β)² / δ²,   δ = mde · mean,

    with σ²/mean the pooled per-user moments of the CURRENT population
    — the "how long must this test run" table, derivable from one
    scan. The z constants are fixed-point literals (no Φ⁻¹ call), so
    the whole grid is hash-stable.

    Returns one row per MDE, ordered: mde_sc, mean_sc, delta_sc,
    required_n_per_arm, current_n_per_arm, powered.
    """
    per_user = _per_user(events, user_col, value_col, value_scale)
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("qy"),
        F.sum("arm").alias("n1"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / n_d
    var = F.col("qy").cast("double") / n_d - mean * mean
    z = (z_alpha_sc + z_beta_sc) / 1_000_000.0
    rows = m.select(
        "n",
        "n1",
        mean.alias("mean"),
        var.alias("var"),
        F.explode(
            F.array(*[F.lit(g).cast("long") for g in mde_grid_sc])
        ).alias("mde_sc"),
    )
    delta = F.col("mean") * F.col("mde_sc").cast("double") / 1_000_000.0
    req = F.when(
        (delta > 0.0) & (F.col("var") > 0.0),
        F.ceil(2.0 * F.col("var") * F.lit(z * z) / (delta * delta)),
    ).cast("long")
    cur = F.least(F.col("n1"), F.col("n") - F.col("n1")).cast("long")
    return rows.select(
        "mde_sc",
        F.floor(F.col("mean") * 10000).cast("long").alias("mean_sc"),
        F.floor(delta * 10000).cast("long").alias("delta_sc"),
        req.alias("required_n_per_arm"),
        cur.alias("current_n_per_arm"),
        (cur >= req).alias("powered"),
    ).orderBy("mde_sc")


def power_grid_oracle_sql(
    table: str = "events",
    user_sql: str = "user_id",
    value_sql: str = "value",
    mde_grid_sc: tuple = DEFAULT_MDE_GRID_SC,
    value_scale: int = 100,
    z_alpha_sc: int = Z_ALPHA_SC,
    z_beta_sc: int = Z_BETA_SC,
) -> str:
    """DuckDB twin of :func:`ab_power_grid`."""
    grid = ", ".join(f"({g})" for g in mde_grid_sc)
    z = (z_alpha_sc + z_beta_sc) / 1_000_000.0
    return f"""
    WITH per_user AS (
      SELECT u, y,
             ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
      FROM (
        SELECT {user_sql} AS u,
               CAST(COALESCE(SUM(CAST(FLOOR({value_sql} * {value_scale})
                 AS BIGINT)), 0) AS BIGINT) AS y
        FROM {table} GROUP BY 1
      )
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS qy,
             CAST(SUM(arm) AS BIGINT) AS n1
      FROM per_user
    ), grid(mde_sc) AS (VALUES {grid}),
    rows_ AS (
      SELECT CAST(mde_sc AS BIGINT) AS mde_sc, n, n1,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(qy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS var,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
               * CAST(mde_sc AS DOUBLE) / 1000000.0 AS delta
      FROM m CROSS JOIN grid
    )
    SELECT mde_sc,
      CAST(FLOOR(mean * 10000) AS BIGINT) AS mean_sc,
      CAST(FLOOR(delta * 10000) AS BIGINT) AS delta_sc,
      CAST(CASE WHEN delta > 0.0 AND var > 0.0
        THEN CEIL(2.0 * var * {z * z!r} / (delta * delta)) END AS BIGINT)
        AS required_n_per_arm,
      CAST(LEAST(n1, n - n1) AS BIGINT) AS current_n_per_arm,
      CAST(LEAST(n1, n - n1) AS BIGINT) >=
        CAST(CASE WHEN delta > 0.0 AND var > 0.0
          THEN CEIL(2.0 * var * {z * z!r} / (delta * delta)) END AS BIGINT)
        AS powered
    FROM rows_
    ORDER BY mde_sc"""


def srm_by_segment(
    events: DataFrame,
    user_col: str = "user_id",
    segment_col: str = "event_type",
) -> DataFrame:
    """Segment-level SRM — the check that catches assignment bugs a
    global SRM passes (Fabijan et al. 2019: segment-scoped logging or
    filter defects skew ONE platform/country/page while the overall
    split stays 50/50): per segment, the distinct-user arm split, its
    chi-square against the design, and the flag.

    A user active in several segments counts in each (the audit is of
    the users EXPOSED within the segment — exactly the population a
    segment-scoped readout would use). Returns one row per segment,
    ordered: segment, n_users, n_ctrl, n_treat, chi2_sc (·1e6),
    srm_flag. One distinct + one groupBy; no joins at any scale.
    """
    users = events.select(
        F.col(segment_col).alias("segment"), F.col(user_col).alias("__u")
    ).distinct()
    return srm_by_segment_from_users(users)


def srm_by_segment_from_users(users: DataFrame) -> DataFrame:
    """Per-segment SRM readout from a distinct (``segment``, ``__u``)
    exposure frame — the shared core of :func:`srm_by_segment` and the
    live readout over the segment-exposure sink's maintained state
    (``streaming/sink.py srm_by_segment_report_from_state``), extracted
    so live == batch holds by construction, matching the
    srm_from_users / qte_from_per_user / post_strat_from_per_user
    pattern (r10 advisor).

    Ordering: ``asc_nulls_last`` on segment — a NULL segment (kept by
    the distinct as its own exposure population) must sort the same
    way in both engines, and DuckDB's ASC default is NULLS LAST while
    Spark's is NULLS FIRST (r10 advisor).
    """
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    m = users.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sample_bucket(F.col("__u"), 2)).alias("n1"),
    )
    n_d = F.col("n").cast("double")
    diff = n_d - 2.0 * F.col("n1").cast("double")
    chi2_sc = F.floor(
        F.when(F.col("n") > 0, diff * diff / n_d) * 1_000_000
    ).cast("long")
    return m.select(
        "segment",
        F.col("n").cast("long").alias("n_users"),
        (F.col("n") - F.col("n1")).cast("long").alias("n_ctrl"),
        F.col("n1").cast("long").alias("n_treat"),
        chi2_sc.alias("chi2_sc"),
        (chi2_sc > CHI2_CRIT_SC).alias("srm_flag"),
    ).orderBy(F.asc_nulls_last("segment"))


def srm_by_segment_oracle_sql(
    table: str = "events",
    user_sql: str = "user_id",
    segment_sql: str = "event_type",
) -> str:
    """DuckDB twin of :func:`srm_by_segment` — ORDER BY segment NULLS
    LAST, explicit, to match the Spark side's asc_nulls_last (DuckDB's
    ASC default is already NULLS LAST; Spark's is NULLS FIRST)."""
    return f"""
    WITH users AS (
      SELECT DISTINCT {segment_sql} AS segment, {user_sql} AS u FROM {table}
    ), m AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2)
               AS BIGINT) AS n1
      FROM users GROUP BY segment
    )
    SELECT segment, n AS n_users, n - n1 AS n_ctrl, n1 AS n_treat,
      CAST(FLOOR(CASE WHEN n > 0 THEN
        (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        * (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        / CAST(n AS DOUBLE) END * 1000000) AS BIGINT) AS chi2_sc,
      CAST(FLOOR(CASE WHEN n > 0 THEN
        (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        * (CAST(n AS DOUBLE) - 2.0 * CAST(n1 AS DOUBLE))
        / CAST(n AS DOUBLE) END * 1000000) AS BIGINT) > {CHI2_CRIT_SC}
        AS srm_flag
    FROM m ORDER BY segment NULLS LAST"""


def trimmed_mean_effect(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    trim_num: int = 5,
    trim_den: int = 100,
    value_scale: int = 100,
) -> DataFrame:
    """Trimmed-mean treatment effect — the heavy-tail-robust readout
    (revenue metrics: one whale user moves a mean difference more than
    a thousand typical users; trimming g = floor(n·trim) users from
    EACH end of each arm's per-user distribution bounds any single
    user's influence).

    No per-user sort: the trimmed sum comes from the exact per-arm
    VALUE HISTOGRAM (the exact_quantiles state shape) — for each
    distinct value, the trim takes min(cnt, remaining-g) from the
    bottom cumulative side and symmetrically from the top, so the
    windows run over |distinct (arm, value)| rows, never fact rows.
    Everything is int64 until the final mean division; arms with
    n − 2g <= 0 fail closed to NULL.

    Returns ONE row: n_ctrl, n_treat, g_ctrl, g_treat,
    tmean_ctrl_sc, tmean_treat_sc, tdiff_sc (·1e4 on the value scale).
    """
    return trimmed_mean_from_per_user(
        _per_user(events, user_col, value_col, value_scale),
        trim_num=trim_num,
        trim_den=trim_den,
    )


def trimmed_mean_from_per_user(
    per_user: DataFrame,
    trim_num: int = 5,
    trim_den: int = 100,
) -> DataFrame:
    """Trimmed-mean readout from a per-user frame (``__u``, ``arm``,
    ``y``) — the shared core of :func:`trimmed_mean_effect` and the
    live readout over the QTE sink's maintained state
    (``streaming/sink.py trimmed_mean_report_from_state``): the
    per-user int64 sums are the SAME sufficient state QTE keeps, so
    one sink serves both distributional readouts."""
    hist = per_user.groupBy("arm", "y").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("arm")
        .orderBy("y")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_arm = W.partitionBy("arm")
    h = (
        hist.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .withColumn("n", F.sum("cnt").over(w_arm))
        .withColumn("g", F.expr(f"(n * {trim_num}) div {trim_den}"))
        .withColumn("cum_after", F.col("n") - F.col("cum_before") - F.col("cnt"))
        .withColumn(
            "take_bot",
            F.greatest(
                F.lit(0), F.least(F.col("cnt"), F.col("g") - F.col("cum_before"))
            ),
        )
        .withColumn(
            "take_top",
            F.greatest(
                F.lit(0), F.least(F.col("cnt"), F.col("g") - F.col("cum_after"))
            ),
        )
    )
    arms = h.groupBy("arm").agg(
        F.min("n").alias("n"),
        F.min("g").alias("g"),
        F.sum(F.col("y") * F.col("cnt")).cast("long").alias("s_all"),
        F.sum(F.col("y") * F.col("take_bot")).cast("long").alias("s_bot"),
        F.sum(F.col("y") * F.col("take_top")).cast("long").alias("s_top"),
    )
    kept = F.col("n") - 2 * F.col("g")
    tmean = F.when(
        kept > 0,
        (F.col("s_all") - F.col("s_bot") - F.col("s_top")).cast("double")
        / kept.cast("double"),
    )
    a = arms.select(
        "arm",
        F.col("n").cast("long").alias("n"),
        F.col("g").cast("long").alias("g"),
        tmean.alias("tm"),
    )
    c = a.where(F.col("arm") == 0).select(
        F.col("n").alias("n_ctrl"),
        F.col("g").alias("g_ctrl"),
        F.col("tm").alias("tm0"),
    )
    t = a.where(F.col("arm") == 1).select(
        F.col("n").alias("n_treat"),
        F.col("g").alias("g_treat"),
        F.col("tm").alias("tm1"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "n_ctrl",
        "n_treat",
        "g_ctrl",
        "g_treat",
        F.floor(F.col("tm0") * 10000).cast("long").alias("tmean_ctrl_sc"),
        F.floor(F.col("tm1") * 10000).cast("long").alias("tmean_treat_sc"),
        F.floor((F.col("tm1") - F.col("tm0")) * 10000).cast("long").alias(
            "tdiff_sc"
        ),
    )


def trimmed_mean_oracle_sql(
    table: str = "events",
    user_sql: str = "user_id",
    value_sql: str = "value",
    trim_num: int = 5,
    trim_den: int = 100,
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`trimmed_mean_effect`."""
    return f"""
    WITH per_user AS (
      SELECT u, y,
             ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
      FROM (
        SELECT {user_sql} AS u,
               CAST(COALESCE(SUM(CAST(FLOOR({value_sql} * {value_scale})
                 AS BIGINT)), 0) AS BIGINT) AS y
        FROM {table} GROUP BY 1
      )
    ), hist AS (
      SELECT arm, y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM per_user GROUP BY arm, y
    ), h AS (
      SELECT arm, y, cnt,
        COALESCE(SUM(cnt) OVER (PARTITION BY arm ORDER BY y
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        SUM(cnt) OVER (PARTITION BY arm) AS n
      FROM hist
    ), h2 AS (
      SELECT *, (n * {trim_num}) // {trim_den} AS g,
             n - cum_before - cnt AS cum_after
      FROM h
    ), arms AS (
      SELECT arm, MIN(n) AS n, MIN(g) AS g,
        CAST(SUM(y * cnt) AS BIGINT) AS s_all,
        CAST(SUM(y * GREATEST(0, LEAST(cnt, g - cum_before))) AS BIGINT) AS s_bot,
        CAST(SUM(y * GREATEST(0, LEAST(cnt, g - cum_after))) AS BIGINT) AS s_top
      FROM h2 GROUP BY arm
    ), rep AS (
      SELECT arm, n, g,
        CASE WHEN n - 2 * g > 0 THEN
          CAST(s_all - s_bot - s_top AS DOUBLE) / CAST(n - 2 * g AS DOUBLE)
        END AS tm
      FROM arms
    )
    SELECT CAST(c.n AS BIGINT) AS n_ctrl, CAST(t.n AS BIGINT) AS n_treat,
           CAST(c.g AS BIGINT) AS g_ctrl, CAST(t.g AS BIGINT) AS g_treat,
           CAST(FLOOR(c.tm * 10000) AS BIGINT) AS tmean_ctrl_sc,
           CAST(FLOOR(t.tm * 10000) AS BIGINT) AS tmean_treat_sc,
           CAST(FLOOR((t.tm - c.tm) * 10000) AS BIGINT) AS tdiff_sc
    FROM (SELECT * FROM rep WHERE arm = 0) c
    CROSS JOIN (SELECT * FROM rep WHERE arm = 1) t"""


def obf_boundaries_sc(n_looks: int = 4, c_sc: int = 2_024_000) -> list[int]:
    """O'Brien-Fleming group-sequential z boundaries (·1e6) for
    ``n_looks`` equally-spaced analyses: z_k = C·sqrt(K/k) with the
    two-sided alpha=0.05 constant C = 2.024 for K = 4 (O'Brien &
    Fleming 1979; Jennison & Turnbull's standard tables). Computed
    once in Python and inlined as identical integer literals into BOTH
    engines — no boundary arithmetic crosses the engine boundary."""
    import math

    return [
        int(math.floor(c_sc * math.sqrt(n_looks / k))) for k in range(1, n_looks + 1)
    ]


def group_sequential_check(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_looks: int = 4,
    value_scale: int = 100,
) -> DataFrame:
    """Group-sequential early-stopping readout — the peeking problem
    solved the pre-registered way (O'Brien-Fleming boundaries): the
    experiment's time range splits into ``n_looks`` equally-spaced
    interim analyses; at look k the z statistic of the cumulative
    per-user sums compares against the OBF boundary C·sqrt(K/k),
    which spends almost no alpha early (boundary ~4 at the first
    look) and converges to ~the fixed-horizon z at the last. A
    dashboard reading THIS table may stop the experiment at any
    crossed look without inflating false positives — unlike reading
    the plain z every day.

    Returns one row per look, ordered: look, n_users, n_ctrl,
    n_treat, diff_sc (·1e4), z_sc (·1e6), boundary_sc (·1e6),
    crossed. Determinism: look thresholds are integer epoch-micro
    arithmetic off the 1-row (min, max) scalar (NOTES #39); moments
    ride int64/decimal(38,0); z is the IEEE-exact sqrt/± tree; the
    boundary constants are Python-computed integer literals identical
    in both engines. Scale shape: each event lands in its suffix of
    looks (≤ K× row expansion), then one groupBy(look, user) and a
    |looks×arms|-row combine.
    """
    v = F.floor(F.col(value_col) * value_scale).cast("long")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.coalesce(v, F.lit(0)).alias("yv"),
    )
    return group_sequential_from_events(ev, n_looks=n_looks)


def group_sequential_from_events(ev: DataFrame, n_looks: int = 4) -> DataFrame:
    """Group-sequential readout from an event frame (``__u``,
    ``ts_us``, ``yv``) — the shared core of
    :func:`group_sequential_check` and the live readout over the
    (user, ts) value-sum state of
    ``streaming/sink.py incremental_group_sequential_sink``, so live
    == batch by construction (the tier-II twin pattern). The (u, ts)
    granularity is the SUFFICIENT state for this readout: look
    boundaries derive from the global (min, max) timestamp and MOVE as
    new data extends the range, so any coarser pre-assignment of
    events to looks could not be replayed; summing ``yv`` per (u, ts)
    first is exact because each event lands in a suffix of looks
    purely by its timestamp."""
    from pasta_pipeline_spark.operators.sampling import sample_bucket

    bounds = ev.agg(
        F.min(F.col("ts_us")).alias("minv"),
        F.max(F.col("ts_us")).alias("maxv"),
    )
    base = ev.crossJoin(F.broadcast(bounds))
    thr = F.when(F.col("look") == n_looks, F.col("maxv")).otherwise(
        F.col("minv")
        + F.col("look") * F.expr(f"(maxv - minv) div {n_looks}")
    )
    looked = (
        base.withColumn("look", F.explode(F.sequence(F.lit(1), F.lit(n_looks))))
        .where(F.col("ts_us") <= thr)
    )
    per_user = looked.groupBy("look", "__u").agg(
        F.sum("yv").cast("long").alias("y")
    )
    per_user = per_user.withColumn("arm", sample_bucket(F.col("__u"), 2))
    cells = per_user.groupBy("look", "arm").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum("y").cast("long").alias("cs"),
        # widen BEFORE multiplying (r10 advisor): y*y in int64 would
        # overflow for per-user |y| > ~3.0e9 scaled units while the
        # DuckDB twin multiplies in HUGEINT and stays exact — the
        # decimal cast on each factor keeps both engines exact for
        # whale users
        F.sum(
            F.col("y").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")
        ).alias("cq"),
    )
    cn_d = F.col("cn").cast("double")
    mean_c = F.when(F.col("cn") > 0, F.col("cs").cast("double") / cn_d)
    var_c = F.when(
        F.col("cn") > 0, F.col("cq").cast("double") / cn_d - mean_c * mean_c
    )
    by_look = cells.groupBy("look").agg(
        F.sum("cn").cast("long").alias("n_users"),
        F.min(F.when(F.col("arm") == 0, F.col("cn"))).cast("long").alias("n0"),
        F.min(F.when(F.col("arm") == 1, F.col("cn"))).cast("long").alias("n1"),
        F.min(F.when(F.col("arm") == 0, mean_c)).alias("m0"),
        F.min(F.when(F.col("arm") == 1, mean_c)).alias("m1"),
        F.min(F.when(F.col("arm") == 0, var_c)).alias("v0"),
        F.min(F.when(F.col("arm") == 1, var_c)).alias("v1"),
    )
    bnd = obf_boundaries_sc(n_looks)
    boundary = F.element_at(
        F.array(*[F.lit(b).cast("long") for b in bnd]), F.col("look").cast("int")
    )
    ok = F.col("n0").isNotNull() & F.col("n1").isNotNull()
    diff = F.when(ok, F.col("m1") - F.col("m0"))
    se = F.when(
        ok,
        F.sqrt(
            F.col("v1") / F.col("n1").cast("double")
            + F.col("v0") / F.col("n0").cast("double")
        ),
    )
    z_sc = F.floor(F.when(se > 0.0, diff / se) * 1_000_000).cast("long")
    return by_look.select(
        F.col("look").cast("long").alias("look"),
        "n_users",
        F.coalesce(F.col("n0"), F.lit(0)).alias("n_ctrl"),
        F.coalesce(F.col("n1"), F.lit(0)).alias("n_treat"),
        F.floor(diff * 10000).cast("long").alias("diff_sc"),
        z_sc.alias("z_sc"),
        boundary.alias("boundary_sc"),
        (F.abs(z_sc) > boundary).alias("crossed"),
    ).orderBy("look")


def group_sequential_oracle_sql(
    table: str = "events",
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    value_sql: str = "value",
    n_looks: int = 4,
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`group_sequential_check`."""
    bnd = obf_boundaries_sc(n_looks)
    bnd_rows = ", ".join(f"({k + 1}, {b})" for k, b in enumerate(bnd))
    return f"""
    WITH bounds AS (
      SELECT MIN(CAST(epoch_us({ts_sql}) AS BIGINT)) AS minv,
             MAX(CAST(epoch_us({ts_sql}) AS BIGINT)) AS maxv
      FROM {table}
    ), base AS (
      SELECT {user_sql} AS u, CAST(epoch_us({ts_sql}) AS BIGINT) AS ts_us,
             COALESCE(CAST(FLOOR({value_sql} * {value_scale}) AS BIGINT), 0) AS yv
      FROM {table}
    ), looked AS (
      SELECT l.look, b.u, b.yv
      FROM base b
      CROSS JOIN bounds
      CROSS JOIN (SELECT unnest(generate_series(1, {n_looks})) AS look) l
      WHERE b.ts_us <= CASE WHEN l.look = {n_looks} THEN bounds.maxv
        ELSE bounds.minv + l.look * ((bounds.maxv - bounds.minv) // {n_looks}) END
    ), per_user AS (
      SELECT look, u, CAST(SUM(yv) AS BIGINT) AS y,
             ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
      FROM looked GROUP BY look, u
    ), cells AS (
      SELECT look, arm, CAST(COUNT(*) AS BIGINT) AS cn,
             CAST(SUM(y) AS BIGINT) AS cs,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS cq
      FROM per_user GROUP BY look, arm
    ), by_look AS (
      SELECT look, CAST(SUM(cn) AS BIGINT) AS n_users,
        MIN(CASE WHEN arm = 0 THEN cn END) AS n0,
        MIN(CASE WHEN arm = 1 THEN cn END) AS n1,
        MIN(CASE WHEN arm = 0 AND cn > 0
            THEN CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) END) AS m0,
        MIN(CASE WHEN arm = 1 AND cn > 0
            THEN CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) END) AS m1,
        MIN(CASE WHEN arm = 0 AND cn > 0
            THEN CAST(cq AS DOUBLE) / CAST(cn AS DOUBLE)
               - (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE))
                 * (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)) END) AS v0,
        MIN(CASE WHEN arm = 1 AND cn > 0
            THEN CAST(cq AS DOUBLE) / CAST(cn AS DOUBLE)
               - (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE))
                 * (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)) END) AS v1
      FROM cells GROUP BY look
    ), bnd(look, boundary_sc) AS (VALUES {bnd_rows})
    SELECT CAST(b.look AS BIGINT) AS look, n_users,
      CAST(COALESCE(n0, 0) AS BIGINT) AS n_ctrl,
      CAST(COALESCE(n1, 0) AS BIGINT) AS n_treat,
      CAST(FLOOR(CASE WHEN n0 IS NOT NULL AND n1 IS NOT NULL
        THEN m1 - m0 END * 10000) AS BIGINT) AS diff_sc,
      CAST(FLOOR(CASE WHEN n0 IS NOT NULL AND n1 IS NOT NULL
          AND sqrt(v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)) > 0.0
        THEN (m1 - m0)
          / sqrt(v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)) END
        * 1000000) AS BIGINT) AS z_sc,
      CAST(bd.boundary_sc AS BIGINT) AS boundary_sc,
      ABS(CAST(FLOOR(CASE WHEN n0 IS NOT NULL AND n1 IS NOT NULL
          AND sqrt(v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)) > 0.0
        THEN (m1 - m0)
          / sqrt(v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)) END
        * 1000000) AS BIGINT)) > bd.boundary_sc AS crossed
    FROM by_look b JOIN bnd bd ON b.look = bd.look
    ORDER BY b.look"""
