"""Time-series regularization — gap-fill / resample with LOCF.

The reference's stream is irregular (Telegram messages arrive when
they arrive); any per-channel rate dashboard or training-data
temporal-mix report needs the regularized form: one row per (key,
time slot) on a fixed grid, empty slots present with a gap marker and
the last observation carried forward.

Spark-first shape: per-key bounds (one agg) → ``sequence()`` +
``explode`` manufactures each key's grid *from two values*, never by
joining against a materialized calendar table — the grid costs
O(slots) rows but O(keys) shuffle; the per-slot aggregate is the usual
partial-agg groupBy; LOCF is one window pass
(``last(ignorenulls=True)``). Three shuffles total, all on the key,
so AQE coalesces them; no UDF, no driver loop.

Skew note (100 TB): a key spanning years at minute granularity
explodes to ~500k grid rows — still one task's worth of window scan.
If a single key's grid outgrows a task, slice the grid generation by
(key, year) and run LOCF per slice with a boundary-carry join — same
trick as every other mega-key window in SCALING.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_fold(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    num: int = 9,
    den: int = 10,
    scale: int = 10000,
) -> DataFrame:
    """Exact integer EWMA per key: ``ewma_t = (num*ewma_{t-1} +
    (den-num)*v_t) DIV den`` over fixed-point values, seeded with the
    first observation.

    EWMA is inherently a sequential fold — no algebraic regrouping
    exists for integer division — so the per-key series is folded with
    one ``aggregate`` HOF over the key's sorted event array: one
    shuffle (groupBy key), zero Python. All arithmetic is int64 with
    truncating division, which Spark ``DIV`` and DuckDB ``//`` share
    (values are floored nonnegative fixed-point, so truncate == floor),
    making the whole series bit-exact cross-engine — the same
    determinism trick as the fixed-point PageRank.

    Scale: state per key is its event array — fine for per-entity
    series (the reference's per-channel rates); a mega-key that cannot
    hold its history in one task must be range-chunked with a
    boundary-carry join, same as the LOCF note above. The in-fold
    append is O(n) copy per step; bounded keys keep that irrelevant,
    and the chunked path bounds n by the chunk.
    """
    e = events.select(
        F.col(key_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tiebreak_col).alias("tb"),
            F.floor(F.col(value_col) * F.lit(scale)).cast("long").alias("v"),
        ).alias("__e"),
    )
    grouped = e.groupBy(key_col).agg(F.array_sort(F.collect_list("__e")).alias("__es"))
    folded = grouped.withColumn(
        "__ew",
        F.expr(
            f"""
            aggregate(
              __es,
              cast(array() as array<bigint>),
              (acc, x) -> CASE WHEN size(acc) = 0 THEN array(x.v)
                          ELSE concat(acc, array((element_at(acc, -1) * {num}
                                                  + x.v * {den - num}) div {den}))
                          END
            )
            """
        ),
    )
    z = folded.select(
        F.col(key_col),
        F.posexplode(F.arrays_zip("__es", "__ew")).alias("__pos", "__z"),
    )
    return z.select(
        F.col(key_col),
        (F.col("__pos") + 1).cast("long").alias("seq"),
        F.col("__z.__es.tb").alias(tiebreak_col),
        F.unix_timestamp("__z.__es.ts").cast("long").alias("ts_sec"),
        F.col("__z.__es.v").alias("value_fp"),
        F.col("__z.__ew").alias("ewma_fp"),
    )


def resample_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_fp_agg,
    slot: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Regularize ``events`` onto a per-key ``slot``-spaced grid
    spanning that key's [min, max] observation range.

    ``value_fp_agg`` is an aggregate Column over the events of one slot
    (use the fixed-point bridge for doubles). Output per (key, slot):
    ``n_events`` (0 for gaps), ``is_gap``, the slot aggregate
    (NULL in gaps), and ``<agg>_locf`` — the last non-gap aggregate at
    or before the slot (NULL until the key's first observation, which
    cannot occur inside the grid since it starts at the first
    observation).
    """
    slotted = events.withColumn("__slot", F.date_trunc(trunc_unit, F.col(ts_col)))

    bounds = slotted.groupBy(key_col).agg(
        F.min("__slot").alias("__h0"), F.max("__slot").alias("__h1")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__h0"), F.col("__h1"), F.expr(f"INTERVAL {slot}"))
        ).alias("__slot"),
    )

    agg = slotted.groupBy(key_col, "__slot").agg(
        F.count(F.lit(1)).alias("n_events"), value_fp_agg.alias("__v")
    )

    out = grid.join(agg, [key_col, "__slot"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        F.col(key_col),
        F.col("__slot").alias("slot"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
        F.col("__v").alias("slot_value"),
        F.last("__v", ignorenulls=True).over(w).alias("slot_value_locf"),
    )


def status_intervals(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    status_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a per-key event stream into SCD-Type-2-style validity
    intervals: one row per maximal run of consecutive equal
    ``status_col`` values, with ``valid_from`` / ``valid_to`` epoch
    seconds (``valid_to`` NULL for the current run) — the
    gaps-and-islands shape every temporal dimension build needs.

    Plan: one shuffle on the key, then two ordered passes over each
    partition — (1) lag to flag changes + running sum to number runs,
    (2) per-run aggregate + lead to chain each run's end to the next
    run's start. No self-join against the run table: ``lead`` over the
    aggregated runs replaces the usual correlated subquery.

    Determinism: runs are keyed by (ts, tiebreak) total order; interval
    bounds are epoch-second BIGINTs (timezone-proof, playbook #2).
    """
    w_row = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    flagged = events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.col(status_col),
        F.when(
            F.lag(status_col).over(w_row).isNull()
            | (F.lag(status_col).over(w_row) != F.col(status_col)),
            1,
        )
        .otherwise(0)
        .alias("__chg"),
    ).withColumn(
        "__run",
        F.sum("__chg").over(
            w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(key_col, "__run").agg(
        F.min(status_col).alias(status_col),  # constant within the run
        F.min(ts_col).alias("__from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_run = Window.partitionBy(key_col).orderBy("__run")
    return runs.select(
        F.col(key_col),
        F.col("__run").cast("long").alias("run_seq"),
        F.col(status_col),
        F.unix_timestamp("__from").cast("long").alias("valid_from_sec"),
        F.unix_timestamp(F.lead("__from").over(w_run)).cast("long").alias("valid_to_sec"),
        "n_events",
    )


def rolling_range_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    scale: int = 10000,
) -> DataFrame:
    """Time-based rolling aggregate: for every event, count/sum/mean of
    the key's events in the trailing ``window_sec`` seconds *including*
    the current row — a RANGE window frame over epoch-microsecond
    ordering (a ROWS frame would be wrong on irregular event spacing;
    RANGE peers are defined by time distance, so simultaneous events
    aggregate symmetrically in both engines).

    One shuffle on the key; the frame is evaluated in a single sorted
    pass per partition (Spark's sliding window frame), no self-join.
    The mean is exact integer fixed-point (sum of FLOOR(value*scale)
    div count) so results hash-match cross-engine.
    """
    us = F.unix_micros(F.col(ts_col))
    val_x = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-window_sec * 1_000_000, 0)
    )
    return df.select(
        F.col(key_col),
        us.alias("ts_us"),
        F.col(value_col),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(val_x).over(w).alias("sum_x"),
    ).withColumn("avg_x", F.expr("sum_x div n_win"))


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Maximum simultaneous intervals per group — the capacity
    question every interval table eventually gets asked (peak
    concurrent sessions, downloads, active crawl connections): the
    classic ±1 boundary sweep. Half-open ``[start, end)`` semantics:
    +1 at start and -1 at end aggregate PER TIMESTAMP before the
    running sum, so an interval ending exactly when another starts
    never double-counts.

    Returns ``(group?, peak, at_ts)`` — the peak count and the
    EARLIEST timestamp it is reached (min_by tiebreak,
    deterministic). Cost: one groupBy on (group, boundary) + one
    running-sum window per group over BOUNDARY cardinality (distinct
    timestamps, not interval mass) + one aggregate — the same
    delta-encode idiom as the pair-TTL report. NULL or inverted
    intervals are excluded."""
    from pyspark.sql import Window

    gs = [group_col] if group_col else []
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    src = intervals.where(s.isNotNull() & e.isNotNull() & (e > s))
    deltas = src.select(*gs, s.alias("t"), F.lit(1).alias("d")).unionByName(
        src.select(*gs, e.alias("t"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy(*gs, "t").agg(F.sum("d").cast("long").alias("d"))
    w = Window.partitionBy(*gs).orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_t.withColumn("c", F.sum("d").over(w).cast("long"))
    return cum.groupBy(*gs).agg(
        F.max("c").cast("long").alias("peak"),
        F.min_by(F.col("t"), F.struct((-F.col("c")).alias("nc"), F.col("t")))
        .cast("long")
        .alias("at_ts"),
    )


def daily_autocorrelation(
    df: DataFrame,
    ts_col: str,
    amount_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of the daily revenue series at calendar
    lags 1..``max_lag`` (r8) — the periodicity detector that tells you
    WHICH seasonality to model (a weekly cycle shows as a lag-7 peak)
    before ``seasonal.weekly_seasonal_decomposition`` decomposes it.

    Definition (cross-engine exact): for each lag L, the Pearson
    correlation over the pairs (day d, day d−L) that BOTH exist — the
    pairwise-complete ACF. Joins are calendar-exact (``date_sub``
    equi-join), so gaps pair nothing silently; co-moments accumulate
    int64-cents products in decimal(38,0) (the corr-matrix
    discipline), and r is the textbook fixed double tree. A lag with
    < 3 pairs or zero variance yields NULL r.

    Scale shape: one |days|-row rollup, then one equi-join of that
    metadata-scale frame against itself per the exploded lag spine —
    |days|·max_lag rows through a hash join, no windows at all.

    Returns (lag, n_pairs, r_sc) ordered by lag.
    """
    daily = (
        df.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(amount_col) * 100).cast("long").alias("__cents"),
        )
        .groupBy("day")
        .agg(F.sum("__cents").alias("cents"))
    )
    lags = F.explode(
        F.array(*[F.lit(i) for i in range(1, max_lag + 1)])
    ).alias("lag")
    a = daily.select(F.col("day"), F.col("cents").alias("x"), lags)
    b = daily.select(F.col("day").alias("bday"), F.col("cents").alias("y"))
    pairs = a.join(b, F.col("bday") == F.date_sub(F.col("day"), F.col("lag")))
    dec = "decimal(38,0)"
    g = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    nd = F.col("n_pairs").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    r = F.when(
        (F.col("n_pairs") >= 3) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )
    return g.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.floor(r * 1000000).cast("long").alias("r_sc"),
    ).orderBy("lag")


def daily_acf_oracle_sql(
    table: str, ts_sql: str, amount_sql: str, max_lag: int = 7
) -> str:
    """DuckDB twin of :func:`daily_autocorrelation`."""
    return f"""
    WITH daily AS (
      SELECT CAST({ts_sql} AS DATE) AS day,
             CAST(SUM(CAST(ROUND({amount_sql} * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM {table} GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series(1, {max_lag})) AS lag
    ), pairs AS (
      SELECT s.lag, a.cents AS x, b.cents AS y
      FROM daily a CROSS JOIN spine s
      JOIN daily b ON b.day = a.day - CAST(s.lag AS INT)
    ), g AS (
      SELECT lag, COUNT(*) AS n_pairs,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
      CASE WHEN n_pairs >= 3
            AND CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      THEN CAST(FLOOR(
        (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        * 1000000) AS BIGINT) END AS r_sc
    FROM g ORDER BY lag
    """


def holt_linear_fold(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "y_fp",
    a_num: int = 3,
    a_den: int = 10,
    b_num: int = 1,
    b_den: int = 10,
    tail: int = 30,
) -> DataFrame:
    """Holt's double exponential smoothing (level + linear trend,
    Holt 1957) over a daily series, as one exact-integer fold — the
    trend-aware upgrade of ``ewma_fold`` and the forecasting
    counterpart of ``weekly_seasonality``'s decomposition:

        pred_t  = l_{t-1} + b_{t-1}
        l_t     = (a_num·y_t + (a_den−a_num)·pred_t) div a_den
        b_t     = (b_num·(l_t − l_{t-1}) + (b_den−b_num)·b_{t-1}) div b_den

    seeded l_1 = y_1, b_1 = 0. Negative trends are fine: truncating
    division agrees between Spark ``div`` and DuckDB ``//`` on signed
    operands (both toward zero), so the run is bit-identical
    cross-engine. Gaps in the calendar are treated as consecutive
    observations (document the cadence upstream or resample first —
    ``resample_locf`` is the companion).

    The recurrence cannot regroup, so it folds the collected
    per-day array — BOUNDED by the calendar span (metadata-scale, the
    empty-OVER/day-domain precedent), after a fact-scale map-side
    groupBy(day). Returns the LAST ``tail`` days: day_ed (epoch-day
    BIGINT — the timezone-proof date bridge), y_fp, level_fp,
    trend_fp, onestep_err_fp (y_t − pred_t; NULL for the seed row).
    """
    arr = daily.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(day_col).alias("d"), F.col(value_col).alias("y")))
        ).alias("__a")
    )
    an, ad, bn, bd = a_num, a_den, b_num, b_den
    folded = arr.select(
        F.expr(
            f"""
            aggregate(
              __a,
              struct(
                CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
                CAST(0 AS BIGINT) AS k,
                CAST(array() AS
                  ARRAY<STRUCT<d: DATE, y: BIGINT, l: BIGINT,
                               b: BIGINT, e: BIGINT>>) AS out
              ),
              (acc, x) -> CASE WHEN acc.k = 0 THEN struct(
                  x.y AS l, CAST(0 AS BIGINT) AS b, CAST(1 AS BIGINT) AS k,
                  array_append(acc.out, struct(
                    x.d AS d, x.y AS y, x.y AS l, CAST(0 AS BIGINT) AS b,
                    CAST(NULL AS BIGINT) AS e)) AS out)
                ELSE struct(
                  ({an} * x.y + {ad - an} * (acc.l + acc.b)) div {ad} AS l,
                  ({bn} * (({an} * x.y + {ad - an} * (acc.l + acc.b)) div {ad}
                    - acc.l) + {bd - bn} * acc.b) div {bd} AS b,
                  acc.k + 1 AS k,
                  array_append(acc.out, struct(
                    x.d AS d, x.y AS y,
                    ({an} * x.y + {ad - an} * (acc.l + acc.b)) div {ad} AS l,
                    ({bn} * (({an} * x.y + {ad - an} * (acc.l + acc.b)) div {ad}
                      - acc.l) + {bd - bn} * acc.b) div {bd} AS b,
                    x.y - (acc.l + acc.b) AS e)) AS out)
                END,
              acc -> acc.out
            ) AS __rows
            """
        )
    )
    return (
        folded.select(F.explode("__rows").alias("r"))
        .select(
            # epoch-day BIGINT, the engine's timezone-proof date bridge
            F.unix_date(F.col("r.d")).cast("long").alias("day_ed"),
            F.col("r.y").alias("y_fp"),
            F.col("r.l").alias("level_fp"),
            F.col("r.b").alias("trend_fp"),
            F.col("r.e").alias("onestep_err_fp"),
        )
        .orderBy(F.desc("day_ed"))
        .limit(tail)
        .orderBy("day_ed")
    )


def daily_revenue_frame(orders: DataFrame) -> DataFrame:
    """Daily order revenue in exact cents — the input frame for
    :func:`holt_linear_fold`: groupBy(o_orderdate) over the fact scan
    (map-side combined), day-domain output."""
    return orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("y_fp")
    )


def holt_revenue_oracle_sql(
    a_num: int = 3,
    a_den: int = 10,
    b_num: int = 1,
    b_den: int = 10,
    tail: int = 30,
) -> str:
    """DuckDB twin of daily_revenue_frame + holt_linear_fold: the same
    integer recurrence as a recursive CTE over the day domain."""
    an, ad, bn, bd = a_num, a_den, b_num, b_den
    return f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderdate::DATE AS day,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ord AS (
      SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS seq FROM daily
    ), holt AS (
      SELECT seq, day, y, y AS l, CAST(0 AS BIGINT) AS b,
             CAST(NULL AS BIGINT) AS e
      FROM ord WHERE seq = 1
      UNION ALL
      SELECT o.seq, o.day, o.y,
        CAST(({an} * o.y + {ad - an} * (h.l + h.b)) // {ad} AS BIGINT),
        CAST(({bn} * (({an} * o.y + {ad - an} * (h.l + h.b)) // {ad} - h.l)
          + {bd - bn} * h.b) // {bd} AS BIGINT),
        o.y - (h.l + h.b)
      FROM holt h JOIN ord o ON o.seq = h.seq + 1
    )
    SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS day_ed,
           y AS y_fp, l AS level_fp, b AS trend_fp,
           e AS onestep_err_fp
    FROM (SELECT * FROM holt ORDER BY day DESC LIMIT {tail})
    ORDER BY day_ed
    """
