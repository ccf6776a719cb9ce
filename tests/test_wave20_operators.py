"""Wave-20 operator unit tests: HLL overlap, interpolated quantiles."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hll_overlap_exact_at_small_cardinality(spark):
    from pasta_pipeline_spark.operators.sketches import hll_overlap_audit

    # disjoint audiences: A = users 1..20 (type a), B = 21..50 (type b)
    rows = [(u, "a") for u in range(1, 21)] + [(u, "b") for u in range(21, 51)]
    df = spark.createDataFrame(rows, "user_id long, t string")
    r = hll_overlap_audit(
        df, "user_id", F.col("t") == "a", F.col("t") == "b"
    ).collect()[0]
    assert (r["exact_a"], r["exact_b"], r["exact_inter"]) == (20, 30, 0)
    # intersection estimate never negative (clamped)
    assert r["est_inter"] >= 0
    # m=64 sketch noise: union estimate within the ~1.04/sqrt(m) band
    assert abs(r["est_union"] - 50) <= 15
    assert r["err_inter_sc"] is None  # exact overlap 0 -> fail closed


def test_hll_overlap_detects_full_containment(spark):
    from pasta_pipeline_spark.operators.sketches import hll_overlap_audit

    # B subset of A: union == A, inclusion-exclusion ~ |B|
    rows = [(u, "a") for u in range(1, 41)] + [(u, "b") for u in range(1, 11)]
    df = spark.createDataFrame(rows, "user_id long, t string")
    r = hll_overlap_audit(
        df, "user_id", F.col("t") == "a", F.col("t") == "b"
    ).collect()[0]
    assert r["exact_inter"] == 10
    assert r["est_union"] == r["est_a"]  # registers of A dominate
    assert abs(r["est_inter"] - 10) <= 4


def test_interpolated_quantiles_textbook_values(spark):
    from pasta_pipeline_spark.operators.exact_quantiles import (
        interpolated_quantiles,
    )

    # values 1..5 at scale 100: type-7 q25 = 2.0, q50 = 3.0, q75 = 4.0
    df = spark.createDataFrame(
        [(float(v), v) for v in range(1, 6)], "v double, id long"
    )
    out = {
        r["p_sc"]: r
        for r in interpolated_quantiles(
            df, "v", "id", grid=((1, 4), (1, 2), (3, 4))
        ).collect()
    }
    assert out[500000]["q_sc"] == 300 * 10000
    assert out[250000]["q_sc"] == 200 * 10000
    # integral h: lo == hi
    assert out[500000]["lo_rank"] == out[500000]["hi_rank"] == 3


def test_interpolated_quantiles_interpolates(spark):
    from pasta_pipeline_spark.operators.exact_quantiles import (
        interpolated_quantiles,
    )

    # values 1..4: h(0.5) = 1.5 -> q50 = 2.5 (between ranks 2 and 3)
    df = spark.createDataFrame(
        [(float(v), v) for v in range(1, 5)], "v double, id long"
    )
    out = {
        r["p_sc"]: r
        for r in interpolated_quantiles(df, "v", "id", grid=((1, 2),)).collect()
    }
    r = out[500000]
    assert (r["lo_rank"], r["hi_rank"]) == (2, 3)
    assert r["q_sc"] == 250 * 10000
