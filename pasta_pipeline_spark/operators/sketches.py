"""Approximate sketches — the 100 TB stats path.

Every exact aggregate in the catalog (countDistinct, percentile,
top-k) has a sketch twin that trades bounded error for one-pass,
mergeable, fixed-memory execution — the form you actually run over
100 TB when a 2% error band is acceptable:

- ``approx_count_distinct`` — HyperLogLog++ (relative error ~ rsd),
- ``approx_percentile`` — quantile sketch with a tunable accuracy
  knob (1/accuracy relative rank error),
- frequent items via a two-level count-and-prune (exact counts over a
  hashed candidate space — the groupBy stays bounded by pruning low
  counts early at the partial-aggregation level).

These are deliberately NOT in the DuckDB oracle gate: the two engines'
sketch implementations differ by design, so cross-engine hash equality
is the wrong contract. The contract here is the error bound, enforced
by differential pytest against the exact aggregates on the driver
testdata (tests/test_extensions2.py) — approximate operators are
verified by tolerance, exact operators by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, col: str, group_by: list[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct count (per group). Fixed memory per
    group (~1.5KB at 2% rsd) vs the exact countDistinct's
    shuffle-every-value cost — the difference between a metadata query
    and a full re-shuffle at 100 TB."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_by: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass mergeable percentile sketch (error <= 1/accuracy in
    rank). The exact `percentile` is a full sort per group — O(n log n)
    shuffle at 100 TB; this is O(n) with constant state."""
    probs = "array(" + ", ".join(str(p) for p in probabilities) + ")"
    agg = F.expr(f"approx_percentile({col}, {probs}, {accuracy})").alias("quantiles")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def frequent_items(
    df: DataFrame,
    col: str,
    min_count: int,
    k: int | None = None,
) -> DataFrame:
    """Heavy hitters: all values of ``col`` appearing >= ``min_count``
    times (optionally capped to the top ``k``). The groupBy's partial
    (map-side) aggregation means each executor emits at most its local
    distinct set — the post-shuffle count table is then pruned by the
    threshold, so the full value histogram never sits in one place.
    Deterministic (count DESC, value ASC) ordering."""
    counts = (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), F.asc("value"))
    )
    return counts.limit(k) if k else counts


def _partition_truncated_counts(
    df: DataFrame, ks: list[str], item_col: str, cap: int
) -> DataFrame:
    """Arrow-batched per-partition counting with bounded emission: for
    each input partition and key, exact local counts truncated to the
    top ``cap`` items (count DESC, item ASC) plus one NULL-item row
    carrying the truncated local mass. Emission per partition per key
    is <= cap + 1 rows regardless of the partition's distinct-item
    count, so the downstream shuffle is bounded by (cap+1) * P * keys
    — the SpaceSaving role, with exact local counts because a
    partition's distinct set is the same working set Spark's own
    map-side hash aggregation holds.

    Caveat: KEY columns must be non-null on this path (pandas NA
    grouping coerces numeric NULL keys to NaN); the default
    partition_cap=None path groups NULL keys with standard SQL
    semantics."""
    import pandas as pd

    from pyspark.sql import types as T

    fields = [df.schema[k] for k in ks]
    item_field = df.schema[item_col]
    out_schema = T.StructType(
        fields + [T.StructField("item", item_field.dataType, True),
                  T.StructField("n", T.LongType(), False)]
    )
    cols = ks + [item_col]

    def count_partition(batches):
        from collections import Counter

        counter: Counter = Counter()
        for pdf in batches:
            grouped = pdf.groupby(cols, dropna=False, sort=False).size()
            for key_tuple, n in grouped.items():
                if not isinstance(key_tuple, tuple):
                    key_tuple = (key_tuple,)
                counter[key_tuple] += int(n)
        if not counter:
            return
        per_key: dict = {}
        for key_tuple, n in counter.items():
            group, item = key_tuple[:-1], key_tuple[-1]
            per_key.setdefault(group, []).append((item, n))
        rows = []
        for group, pairs in per_key.items():
            pairs.sort(key=lambda p: (-p[1], p[0]))
            for item, n in pairs[:cap]:
                rows.append(group + (item, n))
            dropped = sum(n for _, n in pairs[cap:])
            if dropped:
                rows.append(group + (None, dropped))
        yield pd.DataFrame(rows, columns=cols[:-1] + ["item", "n"])

    return df.select(*cols).mapInPandas(count_partition, schema=out_schema)


def partial_heavy_hitters(
    df: DataFrame,
    keys: list[str] | str,
    item_col: str,
    m: int = 64,
    partition_cap: int | None | str = "auto",
) -> DataFrame:
    """Mergeable truncated-counter heavy-hitter state (SpaceSaving's
    role): per key, the ``m`` most frequent items with exact counts,
    plus the TRACKED mass of everything truncated away
    (``__dropped``). The error contract every merge preserves: a
    merged count underestimates the true count by at most the sum of
    the dropped masses folded in — the bound travels WITH the state
    instead of being a paper theorem, so downstream can decide whether
    an answer is trustworthy (`count + dropped` upper-bounds truth).

    State per key = m rows + one dropped-mass row (item NULL). One
    groupBy with partial aggregation, one bounded window for the
    truncation.

    NULL values of ``item_col`` are EXCLUDED from counting (the same
    convention as ``count(col)``): the NULL item row is reserved as
    the dropped-mass sentinel, so a genuine NULL item would otherwise
    be indistinguishable from the bound and corrupt merges.

    ``partition_cap``: the bounded-shuffle knob. The DEFAULT
    (``"auto"`` = ``4 * m``) runs an Arrow-batched per-partition
    truncation stage (SpaceSaving's role) BEFORE the exact groupBy, so
    the shuffle carries at most ``(partition_cap + 1)`` rows per
    (input partition, key) instead of the full distinct (key, item)
    set — at 100 TB that difference is the whole game, so the bounded
    path is the default and exact-shuffle is the opt-in. Per-partition
    dropped mass folds into the same travelling bound, so
    `count + dropped` still upper-bounds truth; kept counts may
    additionally underestimate by mass truncated in other partitions —
    which that bound already covers. ``partition_cap >= 4 * m`` keeps
    the extra error small (hence the auto value). Pass an explicit
    ``partition_cap=None`` for the EXACT mode: full distinct-set
    shuffle, results identical to a plain groupBy count + truncate —
    the mode to use when the state feeds a hash-compared oracle. Rows
    whose KEY columns contain NULL bypass the Arrow pre-truncation
    (pandas NA grouping would corrupt them) and are counted exactly,
    then merged into the same state.
    """
    from pyspark.sql import Window

    ks = [keys] if isinstance(keys, str) else list(keys)
    src = df.filter(F.col(item_col).isNotNull())
    if partition_cap == "auto":
        partition_cap = 4 * m
    if partition_cap is not None:
        null_key = None
        for k in ks:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        clean = src.filter(~null_key)
        # NULL-key rows skip the pandas stage: counted exactly (1 row
        # per occurrence pre-shuffle — fine, NULL-key mass is edge-case
        # scale) and folded into the same downstream groupBy.
        nullkey_rows = src.filter(null_key).select(
            *ks, F.col(item_col).alias("item"), F.lit(1).cast("long").alias("n")
        )
        pre = _partition_truncated_counts(clean, ks, item_col, partition_cap)
        counts = (
            pre.unionByName(nullkey_rows)
            .groupBy(*ks, "item")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        items = counts.filter(F.col("item").isNotNull())
        pre_dropped = counts.filter(F.col("item").isNull())
        w = Window.partitionBy(*ks).orderBy(F.desc("n"), F.asc("item"))
        ranked = items.withColumn("__rk", F.row_number().over(w))
        kept = ranked.filter(F.col("__rk") <= m).select(*ks, "item", "n")
        item_type = kept.schema["item"].dataType
        dropped = (
            ranked.filter(F.col("__rk") > m)
            .select(*ks, F.lit(None).cast(item_type).alias("item"), "n")
            .unionByName(pre_dropped.select(*ks, "item", "n"))
            .groupBy(*ks)
            .agg(F.sum("n").cast("long").alias("n"))
            .select(*ks, F.lit(None).cast(item_type).alias("item"), "n")
        )
        return kept.unionByName(dropped)
    counts = src.groupBy(*ks, F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(*ks).orderBy(F.desc("n"), F.asc("item"))
    ranked = counts.withColumn("__rk", F.row_number().over(w))
    kept = ranked.filter(F.col("__rk") <= m).select(*ks, "item", "n")
    dropped = (
        ranked.filter(F.col("__rk") > m)
        .groupBy(*ks)
        .agg(F.sum("n").cast("long").alias("n"))
        .select(*ks, F.lit(None).cast(kept.schema["item"].dataType).alias("item"), "n")
    )
    return kept.unionByName(dropped)


def merge_heavy_hitters(
    a: DataFrame, b: DataFrame, keys: list[str] | str, m: int = 64
) -> DataFrame:
    """Merge two heavy-hitter states: counts add per item, the merged
    table re-truncates to ``m``, and everything truncated NOW joins
    the dropped mass (which also adds). Associative up to the shared
    truncation rule; the error bound (dropped mass) only grows when
    truncation actually discards counts."""
    from pyspark.sql import Window

    ks = [keys] if isinstance(keys, str) else list(keys)
    merged = (
        a.unionByName(b)
        .groupBy(*ks, "item")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    items = merged.filter(F.col("item").isNotNull())
    base_dropped = merged.filter(F.col("item").isNull())
    w = Window.partitionBy(*ks).orderBy(F.desc("n"), F.asc("item"))
    ranked = items.withColumn("__rk", F.row_number().over(w))
    kept = ranked.filter(F.col("__rk") <= m).select(*ks, "item", "n")
    newly_dropped = (
        ranked.filter(F.col("__rk") > m).select(*ks, F.lit(None).cast(kept.schema["item"].dataType).alias("item"), "n")
    )
    dropped = (
        base_dropped.select(*ks, "item", "n")
        .unionByName(newly_dropped)
        .groupBy(*ks)
        .agg(F.sum("n").cast("long").alias("n"))
        .select(*ks, F.lit(None).cast(kept.schema["item"].dataType).alias("item"), "n")
    )
    return kept.unionByName(dropped)


def _cms_bucket(col: Column, row_idx: int, width: int) -> Column:
    """Row-``row_idx`` bucket of an item: md5-based 60-bit hash of
    ``"<row>:<item>"`` mod width — the same cross-engine-exact hash
    recipe as every oracle-checkable operator here (DuckDB twin:
    ``('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || item), 1,
    15))::BIGINT % width``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row_idx}:"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch state (Cormode & Muthukrishnan, 2005): item
    counts folded into ``depth`` independent hash rows of ``width``
    buckets — ``depth*width`` int64 cells REGARDLESS of the distinct
    item count, the fixed-memory complement to the truncated-counter
    heavy hitters (those keep exact counts for the head; CMS answers
    point queries about EVERYTHING, with one-sided error ≤ total/width
    per row, min across rows).

    State rows ``(row_idx, bucket, cnt)`` merge by addition
    (:func:`merge_cms`) — the same mergeable-int64 contract as the
    summary/histogram/heavy-hitter tier, so batch and streaming
    maintenance are the same groupBy-sum. NULL items are ignored
    (``count(col)`` convention). Every hash is the package's
    md5-based recipe, so sketch construction AND estimation replay
    exactly in SQL."""
    src = df.where(F.col(item_col).isNotNull())
    rows = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row_idx").alias("row_idx"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query estimates for ``probes``: per item, the MIN of its
    ``depth`` bucket counters (absent buckets count 0). Never
    underestimates the true count; overestimate bounded by collisions.
    One broadcast of the (depth·width-row) sketch + a projection —
    the probe side never shuffles."""
    per_row = probes.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(
        "item", F.col("rb.row_idx").alias("row_idx"), F.col("rb.bucket").alias("bucket")
    )
    joined = per_row.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
    return (
        joined.groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS states built with the same (width, depth): cell
    counts add — associative, commutative, and EXACTLY equal to the
    sketch of the concatenated input (counter addition distributes),
    so batch boundaries never change estimates."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog with an oracle-replayable register recipe
# ---------------------------------------------------------------------------
#
# Spark's own approx_count_distinct (HLL++) is engine-internal state —
# the right production default, but not cross-engine checkable. This
# family rebuilds classic HyperLogLog (Flajolet et al., AofA 2007) from
# the package's md5 hash recipe so that REGISTER CONSTRUCTION, MERGE,
# AND ESTIMATION all replay exactly in SQL: every step is int64 except
# the single ln() of an integer ratio in the linear-counting branch
# (bit-identical JVM vs DuckDB), floored once. State is (key, bucket,
# r) rows — at most m rows per key regardless of cardinality — and
# merges by MAX, the idempotent/commutative/associative form that makes
# batch boundaries and re-delivery invisible (strictly stronger than
# the additive CMS/moments contract: HLL merge is also IDEMPOTENT, so
# at-least-once replay cannot corrupt it).

#: Fixed-point (1e4) alpha_m bias constants (Flajolet et al. Fig. 3).
_HLL_ALPHA_FP = {16: 6730, 32: 6970, 64: 7090}


def _hll_alpha_fp(m: int) -> int:
    if m in _HLL_ALPHA_FP:
        return _HLL_ALPHA_FP[m]
    return int(0.7213 / (1 + 1.079 / m) * 10000)


def hll_rho_case_sql(w_expr: str, cap: int) -> str:
    """Engine-neutral CASE computing rho(w) = 1 + (trailing zeros of
    w), capped at ``cap`` (w == 0 also maps to cap). tz(w) = k iff
    w % 2^(k+1) == 2^k — pure integer arithmetic, identical in Spark
    SQL and DuckDB, generated from the same constants as the oracle."""
    branches = "\n".join(
        f"WHEN ({w_expr}) % {1 << (k + 1)} = {1 << k} THEN {k + 1}"
        for k in range(cap - 1)
    )
    return f"CASE {branches} ELSE {cap} END"


def hll_pow2_case_sql(r_expr: str, cap: int) -> str:
    """Engine-neutral CASE mapping a register value r in [1, cap] to
    the int64 literal 2^(cap - r) — the 2^-r term of the harmonic mean
    scaled by 2^cap so the whole denominator stays integer."""
    branches = "\n".join(
        f"WHEN ({r_expr}) = {r} THEN {1 << (cap - r)}" for r in range(1, cap + 1)
    )
    return f"CASE {branches} END"


def hll_state(
    df: DataFrame,
    item_col: str,
    keys: list[str] | str | None = None,
    m: int = 64,
    rho_cap: int = 36,
) -> DataFrame:
    """HyperLogLog register state: per key, up to ``m`` rows
    ``(bucket, r)`` where bucket = h % m and r = max over items of
    rho(h div m) (h = the package's 60-bit md5 hash). Fixed memory per
    key at ANY cardinality — the distinct-count complement to CMS
    (point frequencies) and truncated counters (top items): at 100 TB
    a per-key distinct count never shuffles the distinct set, only
    <= m register rows per key, and the map-side partial MAX means
    each executor emits registers, not values.

    ``m`` must be a power of two <= 128 (the estimate numerator
    alpha_fp * m^2 * 2^rho_cap must stay inside int64). NULL items are
    ignored (count(col) convention). Relative error ~ 1.04/sqrt(m)
    (~13% at m=64) — use :func:`approx_distinct` when engine-internal
    HLL++ state is acceptable and tighter error is needed."""
    if m & (m - 1) or not 16 <= m <= 128:
        raise ValueError("m must be a power of two in [16, 128]")
    ks = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    src = df.where(F.col(item_col).isNotNull()).select(
        *ks, (h % m).alias("bucket"), F.expr(
            hll_rho_case_sql(
                f"CAST(conv(substr(md5(CAST({item_col} AS STRING)), 1, 15), 16, 10)"
                f" AS BIGINT) div {m}",
                rho_cap,
            )
        ).cast("int").alias("rho"),
    )
    return src.groupBy(*ks, "bucket").agg(F.max("rho").alias("r"))


def merge_hll(a: DataFrame, b: DataFrame, keys: list[str] | str | None = None) -> DataFrame:
    """Merge two HLL states (same m, rho_cap): register-wise MAX.
    Idempotent, commutative, associative — merge(sketch(A), sketch(B))
    == sketch(A ∪ B) exactly, including when A and B overlap."""
    ks = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    return (
        a.unionByName(b).groupBy(*ks, "bucket").agg(F.max("r").alias("r"))
    )


def hll_estimate(
    state: DataFrame,
    keys: list[str] | str | None = None,
    m: int = 64,
    rho_cap: int = 36,
) -> DataFrame:
    """Cardinality estimates from HLL register state. Per key:

        S   = SUM(2^(rho_cap - r)) + (m - filled) * 2^rho_cap   (int64)
        raw = (alpha_fp * m^2 * 2^rho_cap) div (10000 * S)      (int64)
        est = linear counting m*ln(m/V) when V = m - filled > 0
              and 2*raw <= 5*m (the standard small-range correction),
              else raw.

    Every quantity is int64 except ln(m/V) — a double ratio of int64s
    (IEEE-identical cross-engine) through a bit-identical ln, floored
    once — so the whole estimator hash-replays in SQL. Returns
    (keys..., filled_buckets, est_raw, est)."""
    ks = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    num = _hll_alpha_fp(m) * m * m * (1 << rho_cap)
    assert num < (1 << 63), "alpha_fp * m^2 * 2^rho_cap must fit int64"
    pow2 = F.expr(hll_pow2_case_sql("r", rho_cap)).cast("long")
    agg = state.groupBy(*ks).agg(
        F.count(F.lit(1)).cast("long").alias("filled_buckets"),
        F.sum(pow2).cast("long").alias("sum_pow"),
    )
    s_col = F.col("sum_pow") + (F.lit(m) - F.col("filled_buckets")) * F.lit(
        1 << rho_cap
    ).cast("long")
    v_col = F.lit(m).cast("long") - F.col("filled_buckets")
    withs = agg.withColumn("s", s_col).withColumn(
        "est_raw", F.expr(f"{num} div (10000 * s)").cast("long")
    )
    linear = F.floor(
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_col.cast("double"))
    ).cast("long")
    est = F.when(
        (v_col > 0) & (F.col("est_raw") * 2 <= 5 * m), linear
    ).otherwise(F.col("est_raw"))
    return withs.select(*ks, "filled_buckets", "est_raw", est.alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter — broadcast membership for decontamination prefilters
# ---------------------------------------------------------------------------
#
# The contamination scans (operators/text_analysis.py) join corpus
# shingles against the benchmark's — correct, but the corpus side
# shuffles its distinct shingles even when NOTHING is contaminated.
# A Bloom filter over the SMALL side (the benchmark) inverts that:
# kilobytes of bit-words broadcast to every executor, each corpus row
# probed with pure expressions, and only the (rare) bloom hits
# proceed to the exact verification join. One-sided error: no false
# negatives ever (a contaminated row cannot slip through), false
# positives bounded by (1 - e^{-kn/m})^k and resolved by the exact
# stage. Words use 63 bits (bit 63 untouched) so every mask stays a
# positive int64 in BOTH engines — DuckDB range-checks `<< 63`.

#: Bits per filter word (sign bit unused for cross-engine safety).
_BLOOM_WORD_BITS = 63


def _bloom_slot(col: Column, i: int, n_words: int):
    """(word_idx, mask) of hash i for an item: the package's md5
    60-bit recipe on "<i>:<item>", mod the filter's bit count."""
    bit = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % (n_words * _BLOOM_WORD_BITS)
    )
    # integer division / modulo on a computed positive long
    widx = F.floor(bit / F.lit(_BLOOM_WORD_BITS)).cast("int")
    # 2^pos for pos <= 62: every power of two up to 2^62 is exactly
    # representable in double, so pow->long is bit-exact (shiftleft's
    # Python API wants a literal shift amount, not a column)
    mask = F.pow(F.lit(2.0), (bit % _BLOOM_WORD_BITS).cast("double")).cast("long")
    return widx, mask


def bloom_build(
    df: DataFrame, item_col: str, n_words: int = 256, k: int = 4
) -> DataFrame:
    """Build Bloom-filter state ``(word_idx, word)`` over the distinct
    non-NULL values of ``item_col`` — at most ``n_words`` rows (int64
    each) regardless of input size. State merges with
    :func:`merge_bloom` (bitwise OR — idempotent like HLL, so
    at-least-once construction is safe). The md5 slot recipe makes
    construction AND probing replay exactly in SQL."""
    src = df.where(F.col(item_col).isNotNull())
    slots = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        _bloom_slot(F.col(item_col), i, n_words)[0].alias("word_idx"),
                        _bloom_slot(F.col(item_col), i, n_words)[1].alias("mask"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("s")
    )
    return (
        slots.groupBy(F.col("s.word_idx").alias("word_idx"))
        .agg(F.bit_or(F.col("s.mask")).cast("long").alias("word"))
    )


def merge_bloom(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two Bloom filters of the same (n_words, k):
    idempotent, commutative; merge == build-over-union exactly."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("word").cast("long").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    item_col: str,
    bloom: DataFrame,
    n_words: int = 256,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe every row's ``item_col`` against a built filter: ``k``
    broadcast left joins on word index (the filter is <= n_words rows
    — kilobytes), bit-tests as pure expressions, no explode and no
    shuffle of the probe side. ``out_col`` is TRUE iff all k bits are
    set: guaranteed TRUE for every item the filter was built over
    (no false negatives), occasionally TRUE for absent items (false
    positives — send hits to the exact join). NULL items probe
    FALSE."""
    out = df
    tests = []
    for i in range(k):
        widx, mask = _bloom_slot(F.col(item_col), i, n_words)
        w_alias = f"__bw{i}"
        bl = bloom.select(
            F.col("word_idx").alias(f"__bi{i}"), F.col("word").alias(w_alias)
        )
        out = out.withColumn(f"__bx{i}", widx).join(
            F.broadcast(bl), F.col(f"__bx{i}") == F.col(f"__bi{i}"), "left"
        )
        tests.append(
            F.col(w_alias).isNotNull()
            & (F.col(w_alias).bitwiseAND(mask) == mask)
        )
    member = tests[0]
    for t in tests[1:]:
        member = member & t
    member = F.when(F.col(item_col).isNull(), F.lit(False)).otherwise(member)
    drop = [c for i in range(k) for c in (f"__bx{i}", f"__bi{i}", f"__bw{i}")]
    return out.withColumn(out_col, member).drop(*drop)


def hll_overlap_audit(
    df: DataFrame,
    item_col: str,
    pred_a: Column,
    pred_b: Column,
    m: int = 64,
    rho_cap: int = 36,
) -> DataFrame:
    """Sketch-algebra audience overlap: |A∩B| by inclusion-exclusion
    over three HLL estimates (|A| + |B| − |A∪B|, the union sketch
    being the register-wise MAX merge — the one set operation HLL
    supports exactly), audited against the exact overlap from one
    groupBy(item). The planning question this answers at 100 TB:
    intersections of sketched audiences are NOISY (the subtraction
    amplifies relative error), and this report measures exactly how
    noisy — per the standard caveat on HLL set algebra.

    Returns ONE row: est_a, est_b, est_union, est_inter (clamped at
    0), exact_a, exact_b, exact_inter, err_inter_sc
    (|est−exact|/exact, NULL when the exact overlap is 0 — fail
    closed). All sketch arithmetic is the deterministic int64 HLL of
    ``hll_state``/``hll_estimate`` — the audit itself hash-replays in
    SQL.

    Scale shape: two filtered register builds + a register-wise MAX
    merge (≤ m rows each), one exact groupBy(item) with two
    conditional flags, then 1-row scalar handoffs.
    """
    a_state = hll_state(df.where(pred_a), item_col, m=m, rho_cap=rho_cap)
    b_state = hll_state(df.where(pred_b), item_col, m=m, rho_cap=rho_cap)
    u_state = merge_hll(a_state, b_state)
    ea = hll_estimate(a_state, m=m, rho_cap=rho_cap).select(
        F.col("est").alias("est_a")
    )
    eb = hll_estimate(b_state, m=m, rho_cap=rho_cap).select(
        F.col("est").alias("est_b")
    )
    eu = hll_estimate(u_state, m=m, rho_cap=rho_cap).select(
        F.col("est").alias("est_union")
    )
    per_item = df.groupBy(F.col(item_col).alias("__it")).agg(
        F.max(pred_a.cast("long")).alias("__a"),
        F.max(pred_b.cast("long")).alias("__b"),
    )
    exact = per_item.agg(
        F.sum("__a").cast("long").alias("exact_a"),
        F.sum("__b").cast("long").alias("exact_b"),
        F.sum((F.col("__a") * F.col("__b"))).cast("long").alias("exact_inter"),
    )
    row = (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(exact))
    )
    est_inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
    )
    err = F.when(
        F.col("exact_inter") > 0,
        F.floor(
            F.abs(est_inter - F.col("exact_inter")).cast("double")
            / F.col("exact_inter").cast("double")
            * 1000000
        ).cast("long"),
    )
    return row.select(
        "est_a",
        "est_b",
        "est_union",
        est_inter.cast("long").alias("est_inter"),
        "exact_a",
        "exact_b",
        "exact_inter",
        err.alias("err_inter_sc"),
    )


def hll_overlap_oracle_sql(
    table: str,
    item_sql: str,
    pred_a_sql: str,
    pred_b_sql: str,
    m: int = 64,
    rho_cap: int = 36,
) -> str:
    """DuckDB twin of :func:`hll_overlap_audit` — three sketch chains
    generated from the SAME CASE builders as the Spark operator."""
    num = _hll_alpha_fp(m) * m * m * (1 << rho_cap)
    rho = hll_rho_case_sql(f"h // {m}", rho_cap)
    pow2 = hll_pow2_case_sql("r", rho_cap)

    def chain(tag: str, pred: str) -> str:
        return f"""h_{tag} AS (
      SELECT ('0x' || substr(md5(CAST({item_sql} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table} WHERE {item_sql} IS NOT NULL AND ({pred})
    ), st_{tag} AS (
      SELECT h % {m} AS bucket, MAX({rho}) AS r FROM h_{tag} GROUP BY 1
    ), es_{tag} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS filled,
             CAST(SUM({pow2}) AS BIGINT) AS sum_pow
      FROM st_{tag}
    ), e_{tag} AS (
      SELECT CASE WHEN ({m} - filled) > 0
          AND 2 * ({num} // (10000 * (sum_pow + ({m} - filled) * {1 << rho_cap})))
              <= {5 * m}
        THEN CAST(FLOOR({m}.0 * ln({m}.0 / ({m} - filled))) AS BIGINT)
        ELSE CAST({num} // (10000 * (sum_pow + ({m} - filled) * {1 << rho_cap}))
          AS BIGINT) END AS est
      FROM es_{tag}
    )"""

    return f"""
    WITH {chain("a", pred_a_sql)},
    {chain("b", pred_b_sql)},
    {chain("u", f"({pred_a_sql}) OR ({pred_b_sql})")},
    exact AS (
      SELECT CAST(SUM(ia) AS BIGINT) AS exact_a,
             CAST(SUM(ib) AS BIGINT) AS exact_b,
             CAST(SUM(ia * ib) AS BIGINT) AS exact_inter
      FROM (
        SELECT {item_sql} AS it,
               MAX(CASE WHEN {pred_a_sql} THEN 1 ELSE 0 END) AS ia,
               MAX(CASE WHEN {pred_b_sql} THEN 1 ELSE 0 END) AS ib
        FROM {table} GROUP BY 1
      )
    )
    SELECT a.est AS est_a, b.est AS est_b, u.est AS est_union,
      GREATEST(a.est + b.est - u.est, 0) AS est_inter,
      exact_a, exact_b, exact_inter,
      CASE WHEN exact_inter > 0 THEN
        CAST(FLOOR(CAST(ABS(GREATEST(a.est + b.est - u.est, 0)
          - exact_inter) AS DOUBLE) / CAST(exact_inter AS DOUBLE)
          * 1000000) AS BIGINT) END AS err_inter_sc
    FROM e_a a CROSS JOIN e_b b CROSS JOIN e_u u CROSS JOIN exact
    """
