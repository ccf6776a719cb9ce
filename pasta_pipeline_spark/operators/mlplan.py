"""In-plan model training — distributed gradient descent as unrolled
DataFrame aggregates.

Trains a quasi-logistic classifier (softsign link) entirely inside
the query plan: one moments pass standardizes the features, then each
gradient step is ONE full-scan aggregate whose 1-row result is
broadcast back for the next step — the classic full-batch GD data
flow (compute is where the data is; only the d+1-scalar gradient
crosses the network). The same shape as the in-plan PCA power
iteration in ``operators/similarity.py``, without the Python stage:
everything here is native Column expressions.

Why softsign instead of exp-sigmoid: the engine's oracle discipline
bans libm transcendentals (exp/log differ in the last ulp across
runtimes — see trending_decay / weekly_seasonality), so the link is
the rational squash s(z) = 1/2 + z / (2·(1+|z|)) evaluated in int64
fixed point. It is a proper sigmoid (monotone, s(0)=1/2, saturating),
its GD behaves like logistic regression with a bounded surrogate
gradient, and every step is bit-identical across engines,
partitionings, and reruns — the training run itself is
oracle-checkable, which exp-logistic can never be. ``sqrt`` in the
standardizer is fine: IEEE 754 requires correct rounding for sqrt
(unlike exp/log), so Spark and DuckDB agree bit-for-bit.

Determinism/overflow contract: standardized features are fixed-point
int64 at scale FEAT_SCALE (=1e3, i.e. milli-sigmas) clipped to
±CLIP_SIGMA_FP; weights and probabilities at scale 1e6; residuals in
[-1e6, 1e6]; per-row gradient terms are <= 4e9 and accumulate in
decimal(38,0) (NOTES #40). Integer division is truncate-toward-zero
in BOTH Spark ``div`` and DuckDB ``//`` (verified on negatives), so
signed updates agree exactly.

Scale shape: 1 moments scan + ``steps`` sequential full scans
(unavoidable for full-batch GD; each step's scan emits BOTH the
gradient and the previous weights' training accuracy) + 1 final
accuracy scan — steps+2 scans total. The feature frame is persisted
once; the 1-row per-step state is localCheckpointed (the PageRank
precedent) so union branches never re-execute earlier aggregates.
All joins are 1-row broadcast scalar handoffs (the audited crossJoin
pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: standardized-feature fixed-point scale: 1000 = one sigma
FEAT_SCALE = 1_000
#: clip standardized features to ±4 sigma (fixed-point)
CLIP_SIGMA_FP = 4_000
#: weight / probability fixed-point scale
W_SCALE = 1_000_000


def doc_gate_features(
    df: DataFrame,
    text_col: str = "text",
    gate_chars: int = 300,
) -> DataFrame:
    """Raw integer feature frame from the documents table: f1 =
    whitespace-token count, f2 = avg chars-per-token (integer div);
    label y = (char length >= gate_chars) — the cheap-classifier
    distillation setup (train a 2-feature model to imitate a gate,
    fastText-quality-classifier style). Zero-token docs excluded
    (fail closed). Pure expressions, one projection scan."""
    from pasta_pipeline_spark.functions.text import tokenize_ws

    n_tok = F.size(tokenize_ws(F.col(text_col))).cast("long")
    return (
        df.select(
            n_tok.alias("f1"),
            F.length(F.col(text_col)).cast("long").alias("__ch"),
        )
        .where(F.col("f1") > 0)
        .select(
            "f1",
            F.expr("__ch div f1").alias("f2"),
            (F.col("__ch") >= gate_chars).cast("long").alias("y"),
        )
    )


def standardize_features(
    feats: DataFrame, cols: list[str]
) -> DataFrame:
    """Z-score each int64 column into clipped fixed-point milli-sigmas
    plus a constant bias channel: one moments scan (int64/decimal
    sums), one 1-row broadcast handoff, then per-row
    ``clip(floor((x - mean)/std * FEAT_SCALE))``. Deterministic: the
    mean/std doubles come from exact integer sums through a pinned
    expression tree, and IEEE sqrt is correctly rounded everywhere.

    Returns (x0 = FEAT_SCALE bias, x1..xd standardized, y)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"__s1_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,0)")).alias(
                f"__s2_{c}"
            )
        )
    moments = feats.agg(*aggs)
    j = feats.crossJoin(F.broadcast(moments))
    out_cols = [F.lit(FEAT_SCALE).cast("long").alias("x0")]
    for i, c in enumerate(cols, start=1):
        n_d = F.col("__n").cast("double")
        m = F.col(f"__s1_{c}").cast("double") / n_d
        var = F.col(f"__s2_{c}").cast("double") / n_d - m * m
        std = F.sqrt(var)
        z = F.floor(
            (F.col(c).cast("double") - m) / std * FEAT_SCALE
        ).cast("long")
        clipped = (
            # a zero-variance column carries no signal: standardize to
            # 0 instead of dividing by std = 0 (ANSI-safe, both engines)
            F.when(var <= 0.0, F.lit(0))
            .when(z > CLIP_SIGMA_FP, F.lit(CLIP_SIGMA_FP))
            .when(z < -CLIP_SIGMA_FP, F.lit(-CLIP_SIGMA_FP))
            .otherwise(z)
            .cast("long")
        )
        out_cols.append(clipped.alias(f"x{i}"))
    out_cols.append(F.col("y"))
    return j.select(*out_cols)


_SOFTSIGN = (
    f"{W_SCALE // 2} + (__z * {W_SCALE // 2}) div ({W_SCALE} + abs(__z))"
)


def logistic_gd_report(
    feats: DataFrame,
    steps: int = 5,
    lr_num: int = 2,
    lr_den: int = 1,
) -> DataFrame:
    """Full-batch GD on ``feats(x0, x1, x2, y)`` (x_j int64 fixed
    point at FEAT_SCALE, x0 the constant-FEAT_SCALE bias channel, y in
    {0,1}). Returns one row per step 0..steps: (step, w0_fp, w1_fp,
    w2_fp, acc_sc) — the weight trajectory and the training accuracy
    of THOSE weights, i.e. the learning curve a training run logs.

    Update rule (all int64/decimal ops): r = y·W_SCALE − s(z);
    w_j += (lr_num · Σ r·x_j) div (n · FEAT_SCALE · lr_den).
    """
    if steps < 1:
        raise ValueError("steps must be >= 1")
    import math

    spark = feats.sparkSession
    # the feature frame is scanned steps+1 times (per-step gradient +
    # final accuracy); persist it once so the standardization lineage
    # (moments scan included) is not replayed per step
    feats = feats.persist()

    def tdiv(a: int, b: int) -> int:
        # truncate-toward-zero division — Spark `div` / DuckDB `//`
        # semantics (Python's // floors, which differs on negatives)
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    def scored_under(w: list[int]) -> DataFrame:
        # the step state rides as LITERALS instead of a broadcast-join
        # of a localCheckpointed 1-row frame: full-batch GD's data flow
        # is "one d+1-scalar gradient crosses per step" (module
        # docstring), and the r13 driver bench showed the per-step
        # eager-localCheckpoint + rebroadcast round trips dominating
        # this query's wall (26 jobs for a 7-row output; worst bench
        # regression 0.54x, anti-scaling 0.59). One collect per step is
        # strictly less driver traffic than the checkpoint it replaces;
        # the arithmetic tree below is unchanged (same div/softsign
        # fixed-point ops, same decimal(38,0) order-free accumulators),
        # so the trajectory is bit-identical and the DuckDB twin
        # (unrolled CTE chain) still matches hash-exact.
        j = feats.withColumn(
            "__z",
            F.expr(
                f"({w[0]} * x0 + {w[1]} * x1 + {w[2]} * x2)"
                f" div {FEAT_SCALE}"
            ),
        )
        return j.withColumn("__s", F.expr(_SOFTSIGN))

    def correct_col() -> Column:
        return ((F.col("__s") >= W_SCALE // 2) == (F.col("y") == 1)).cast(
            "long"
        )

    def acc_sc(ok: int, n: int) -> int:
        # mirrors F.floor(ok.cast(double) / n.cast(double) * W_SCALE):
        # both engines (and Python) do the same correctly-rounded IEEE
        # double divide/multiply on <2^53 integers
        return int(math.floor(ok / n * W_SCALE))

    w = [0, 0, 0]
    rows: list[tuple[int, int, int, int, int]] = []
    for k in range(1, steps + 1):
        # one scan per step: the gradient of w_{k-1} AND its training
        # accuracy ride the same aggregate (the scan already evaluates
        # s(z) under w_{k-1}); only the FINAL weights need the extra
        # accuracy pass below — steps+1 scans total
        scored = scored_under(w).withColumn(
            "__r", F.lit(W_SCALE) * F.col("y") - F.col("__s")
        )
        agg = scored.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(correct_col()).alias("__ok"),
            F.sum((F.col("__r") * F.col("x0")).cast("decimal(38,0)")).alias("__g0"),
            F.sum((F.col("__r") * F.col("x1")).cast("decimal(38,0)")).alias("__g1"),
            F.sum((F.col("__r") * F.col("x2")).cast("decimal(38,0)")).alias("__g2"),
        ).collect()[0]
        n, ok = int(agg["__n"]), int(agg["__ok"])
        rows.append((k - 1, w[0], w[1], w[2], acc_sc(ok, n)))
        w = [
            w[j] + tdiv(lr_num * int(agg[f"__g{j}"]), n * FEAT_SCALE * lr_den)
            for j in range(3)
        ]
    fin = (
        scored_under(w)
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(correct_col()).alias("__ok"))
        .collect()[0]
    )
    rows.append((steps, w[0], w[1], w[2], acc_sc(int(fin["__ok"]), int(fin["__n"]))))
    feats.unpersist()
    return spark.createDataFrame(
        rows, "step long, w0_fp long, w1_fp long, w2_fp long, acc_sc long"
    ).orderBy("step")


def logistic_gd_oracle_sql(
    table: str = "documents",
    gate_chars: int = 300,
    steps: int = 5,
    lr_num: int = 2,
    lr_den: int = 1,
) -> str:
    """DuckDB twin of doc_gate_features + standardize_features +
    logistic_gd_report: the same unrolled GD as chained CTEs (HUGEINT
    accumulate, ``//`` truncating division — matches Spark's decimal
    sum + ``div``; identical double trees for the moments)."""
    fs, ws, clip = FEAT_SCALE, W_SCALE, CLIP_SIGMA_FP
    half = ws // 2
    sql = [
        f"""
    WITH raw AS (
      SELECT f1, chars // f1 AS f2,
             CASE WHEN chars >= {gate_chars} THEN 1 ELSE 0 END AS y
      FROM (
        SELECT CAST(len(list_filter(regexp_split_to_array(lower(text),
                 '\\s+'), z -> z <> '')) AS BIGINT) AS f1,
               CAST(length(text) AS BIGINT) AS chars
        FROM {table}
      ) WHERE f1 > 0
    ), moments AS (
      SELECT COUNT(*) AS n,
             SUM(f1) AS s1_f1, SUM(f1 * f1) AS s2_f1,
             SUM(f2) AS s1_f2, SUM(f2 * f2) AS s2_f2
      FROM raw
    ), feats AS (
      SELECT CAST({fs} AS BIGINT) AS x0,
        CASE WHEN CAST(s2_f1 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s1_f1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1_f1 AS DOUBLE) / CAST(n AS DOUBLE)) <= 0
          THEN CAST(0 AS BIGINT) ELSE
        GREATEST(CAST(-{clip} AS BIGINT), LEAST(CAST({clip} AS BIGINT),
          CAST(FLOOR((CAST(f1 AS DOUBLE) - CAST(s1_f1 AS DOUBLE)
            / CAST(n AS DOUBLE))
            / sqrt(CAST(s2_f1 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s1_f1 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s1_f1 AS DOUBLE) / CAST(n AS DOUBLE)))
            * {fs}) AS BIGINT))) END AS x1,
        CASE WHEN CAST(s2_f2 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s1_f2 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1_f2 AS DOUBLE) / CAST(n AS DOUBLE)) <= 0
          THEN CAST(0 AS BIGINT) ELSE
        GREATEST(CAST(-{clip} AS BIGINT), LEAST(CAST({clip} AS BIGINT),
          CAST(FLOOR((CAST(f2 AS DOUBLE) - CAST(s1_f2 AS DOUBLE)
            / CAST(n AS DOUBLE))
            / sqrt(CAST(s2_f2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s1_f2 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s1_f2 AS DOUBLE) / CAST(n AS DOUBLE)))
            * {fs}) AS BIGINT))) END AS x2,
        y
      FROM raw CROSS JOIN moments
    ), w0 AS (
      SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
             CAST(0 AS BIGINT) AS w2
    )"""
    ]
    for k in range(1, steps + 1):
        prev = f"w{k - 1}"
        sql.append(
            f""", s{k} AS (
      SELECT COUNT(*) AS n,
             SUM(r * x0) AS g0, SUM(r * x1) AS g1, SUM(r * x2) AS g2
      FROM (
        SELECT x0, x1, x2,
               y * {ws} - ({half} + (z * {half}) // ({ws} + abs(z))) AS r
        FROM (
          SELECT f.*, (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // {fs} AS z
          FROM feats f CROSS JOIN {prev} w
        )
      )
    ), w{k} AS (
      SELECT CAST(w.w0 + ({lr_num} * s.g0) // (s.n * {fs} * {lr_den}) AS BIGINT) AS w0,
             CAST(w.w1 + ({lr_num} * s.g1) // (s.n * {fs} * {lr_den}) AS BIGINT) AS w1,
             CAST(w.w2 + ({lr_num} * s.g2) // (s.n * {fs} * {lr_den}) AS BIGINT) AS w2
      FROM s{k} s CROSS JOIN {prev} w
    )"""
        )
    accs = []
    for k in range(0, steps + 1):
        accs.append(
            f"""
    SELECT CAST({k} AS BIGINT) AS step, w.w0 AS w0_fp, w.w1 AS w1_fp,
           w.w2 AS w2_fp,
           CAST(FLOOR(CAST(SUM(CASE WHEN
             (({half} + (((w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // {fs})
               * {half}) // ({ws} + abs((w.w0 * f.x0 + w.w1 * f.x1
               + w.w2 * f.x2) // {fs}))) >= {half}) = (f.y = 1)
             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             * {ws}) AS BIGINT) AS acc_sc
    FROM feats f CROSS JOIN w{k} w GROUP BY w.w0, w.w1, w.w2"""
        )
    sql.append("\n    UNION ALL".join(accs))
    sql.append("\n    ORDER BY step")
    return "".join(sql)
