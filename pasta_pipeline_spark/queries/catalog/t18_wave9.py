"""Catalog tier: wave 9: association mining, inferential stats, readability, denoising.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, register

# ---------------------------------------------------------------------------
# Wave 9: association mining, inferential stats, readability, denoising
# examples, MDM survivorship, attribution, RFM segmentation
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.basket import basket_pair_lift_oracle_sql
from pasta_pipeline_spark.operators.stat_tests import (
    benford_oracle_sql,
    corr_matrix_oracle_sql,
    dow_oracle_sql,
    mann_whitney_oracle_sql,
)
from pasta_pipeline_spark.operators.readability import flesch_oracle_sql
from pasta_pipeline_spark.operators.denoising import span_corruption_oracle_sql
from pasta_pipeline_spark.operators.golden import golden_part_oracle_sql
from pasta_pipeline_spark.operators.attribution import last_touch_events_oracle_sql
from pasta_pipeline_spark.operators.rfm import rfm_oracle_sql


@register(
    "basket_lift",
    basket_pair_lift_oracle_sql("lineitem", "l_orderkey", "l_partkey"),
    doc="Market-basket association mining (operators/basket.py): top item "
    "pairs by lift over distinct (order, part) memberships. Pair "
    "generation is a self EQUI-join on the basket key bounded by basket "
    "size (never a cartesian); per-item counts are dimension-scale "
    "broadcasts and the basket total a 1-row scalar handoff. Lift is one "
    "exact double division of int64 products; deterministic "
    "(lift, pair) TakeOrdered top-k.",
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.basket import basket_pair_lift

    return basket_pair_lift(_t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey")


@register(
    "mann_whitney_qty",
    mann_whitney_oracle_sql(
        "lineitem", "l_quantity", "l_linestatus = 'O'", "l_linestatus = 'F'"
    ),
    doc="Mann-Whitney U rank-sum test (operators/stat_tests.py) between "
    "open and finished lineitems over the BOUNDED l_quantity domain: the "
    "fact table collapses to per-value conditional counts (<=50 rows), "
    "midranks come from cumulative counts DOUBLED so ties stay int64, "
    "and the tie-corrected normal z is a fixed double tree over exact "
    "counts. The nonparametric sibling of proportion_ztest — no "
    "fact-scale sort, no global rank window.",
)
def q_mann_whitney_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf_dir, "lineitem"),
        "l_quantity",
        F.col("l_linestatus") == "O",
        F.col("l_linestatus") == "F",
    )


@register(
    "benford_digit_test",
    benford_oracle_sql("orders", "o_totalprice"),
    doc="Benford first-significant-digit screen on order totals "
    "(operators/stat_tests.py): the fraud/anomaly test. Leading digit "
    "via decimal STRING rendering (no log10 on data); the nine expected "
    "proportions are shared literal constants so neither engine's "
    "transcendental library participates; chi-square contributions ride "
    "the fixed-point bridge and total over a bounded 9-row window. One "
    "conditional-agg scan at any scale.",
)
def q_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import benford_digit_test

    return benford_digit_test(_t(spark, sf_dir, "orders"), "o_totalprice")


@register(
    "dow_seasonality",
    dow_oracle_sql("orders", "o_orderdate", "o_totalprice"),
    doc="Day-of-week seasonality profile + chi-square uniformity test "
    "(operators/stat_tests.py): calendar heatmap row counts, exact cents "
    "revenue, share and chi-square contribution per weekday in ONE scan "
    "(7-row output, bounded window for the total). Oracle aligns "
    "DuckDB's 0-based dayofweek to Spark's 1=Sunday convention.",
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import dow_seasonality

    return dow_seasonality(_t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice")


@register(
    "corr_matrix",
    corr_matrix_oracle_sql(
        "lineitem",
        {
            "qty": "CAST(l_quantity AS BIGINT)",
            "price": "CAST(FLOOR(l_extendedprice) AS BIGINT)",
            "disc": "CAST(ROUND(l_discount * 100) AS BIGINT)",
            "tax": "CAST(ROUND(l_tax * 100) AS BIGINT)",
        },
    ),
    doc="Pairwise Pearson correlation matrix over integer-bridged "
    "lineitem measures (operators/stat_tests.py): ONE aggregate scan "
    "collects every sum/sum-sq/cross-product as exact int64 (the "
    "qty_price_regression moment discipline generalized to all 6 pairs), "
    "then each r is a fixed double tree — products taken in double so no "
    "int64 overflow at any n. Map-side combine only; a 100 TB corr "
    "matrix costs one count.",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import pearson_corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    return pearson_corr_matrix(
        li,
        {
            "qty": F.col("l_quantity").cast("long"),
            "price": F.floor(F.col("l_extendedprice")).cast("long"),
            "disc": F.round(F.col("l_discount") * 100).cast("long"),
            "tax": F.round(F.col("l_tax") * 100).cast("long"),
        },
    )


@register(
    "readability_flesch",
    flesch_oracle_sql(),
    doc="Flesch reading-ease readability tiers per language "
    "(operators/readability.py): the FineWeb-Edu-shaped difficulty "
    "signal the quality ladder lacked — deterministic regex counting "
    "(\\S+ words, [.!?]+ sentences, vowel-group syllables), the classic "
    "206.835 formula as a fixed double tree over int64 counts, "
    "easy/standard/hard tier counts + fixed-point mean per lang. Pure "
    "map-side expressions, one |langs|-row shuffle.",
)
def q_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.readability import flesch_by_lang

    return flesch_by_lang(_tp(spark, sf_dir, "documents"))


@register(
    "span_corruption",
    span_corruption_oracle_sql(),
    doc="T5/UL2 span-corruption training examples "
    "(operators/denoising.py; Raffel et al. 1910.10683 §3.1.4): ~15% of "
    "token positions masked by the md5-deterministic uniform (sampling's "
    "idiom — regenerable bit-identically on any cluster layout), "
    "adjacent masks merged to spans via gaps-and-islands (pos − rank, no "
    "self-join), sentinel <extra_id_k> rewriting for input and target. "
    "All windows/groups are doc_id-partitioned (millions of small "
    "groups); three reusable doc_id shuffles. The oracle replays mask "
    "choice, span merge, and both reassembled strings.",
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.denoising import span_corruption_examples

    return span_corruption_examples(_tp(spark, sf_dir, "documents"))


_ER_PAIRS_SQL = """
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key
      FROM (SELECT p_partkey, split_part(p_name, ' ', 1) AS adj,
                   split_part(p_name, ' ', 2) AS noun, p_brand, p_size,
                   p_retailprice FROM part) a
      JOIN (SELECT p_partkey, split_part(p_name, ' ', 1) AS adj,
                   split_part(p_name, ' ', 2) AS noun, p_brand, p_size,
                   p_retailprice FROM part) b
        ON a.noun = b.noun AND a.p_brand = b.p_brand
       AND a.p_partkey < b.p_partkey
      WHERE (CASE WHEN levenshtein(a.adj, b.adj) <= 3 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_size - b.p_size) <= 2 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_retailprice - b.p_retailprice) <= 5.0 THEN 3 ELSE 0 END) >= 5
"""


@register(
    "golden_records",
    golden_part_oracle_sql(_ER_PAIRS_SQL),
    doc="MDM golden-record survivorship (operators/golden.py): closes "
    "entity_resolution's matched pairs into clusters via the hardened "
    "min-label-propagation CC (text_dedup.duplicate_clusters), then "
    "elects canonical field values by (count DESC, value ASC) mode rank "
    "— match, cluster, survive. Clusters are blocking-key-bounded so "
    "every survivorship window is a handful of rows; the oracle replays "
    "the closure with the recursive-CTE CC pattern plus per-field mode "
    "election.",
)
def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.golden import golden_part_records

    return golden_part_records(_t(spark, sf_dir, "part"))


@register(
    "attribution_last_touch",
    last_touch_events_oracle_sql(),
    doc="Last-touch marketing attribution (operators/attribution.py): "
    "each purchase event credits the user's latest non-purchase touch "
    "at-or-before it via the audited as-of join (union+window form, one "
    "user-key shuffle), '(none)' bucket keeps totals reconcilable, "
    "revenue rides the exact cents bridge and shares a 1-row scalar "
    "handoff. DuckDB ASOF LEFT JOIN is the oracle.",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.attribution import last_touch_attribution

    ev = _t(spark, sf_dir, "events")
    convs = ev.where(F.col("event_type") == "purchase")
    touches = ev.where(F.col("event_type") != "purchase")
    return last_touch_attribution(
        convs,
        touches,
        conv_user_col="user_id",
        conv_ts_col="ts",
        amount_col="value",
    )


@register(
    "rfm_segments",
    rfm_oracle_sql(),
    doc="RFM customer segmentation (operators/rfm.py): recency/frequency/"
    "monetary quintile scores concatenated to the classic 555-is-best "
    "segment code, rolled up with exact cents sums. The three quintile "
    "assignments reuse the range-partition + driver-prefix-sum rank "
    "machinery (ids.assign_sequential_ids) with the equidepth closed-form "
    "tile quotient in pure int64 `div` — NO empty-partition ntile window "
    "anywhere, so a 100 TB customer dimension never funnels through one "
    "task. Oracle uses plain ntile(5) over identical total orders.",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.rfm import rfm_segments

    return rfm_segments(_t(spark, sf_dir, "orders"))


