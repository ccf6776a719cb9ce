"""Wave-21 operator unit tests: isotonic calibration (PAVA)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _fit(spark, bin_rates):
    from pasta_pipeline_spark.operators.isotonic import isotonic_calibration

    rows = []
    for b, (pos, n) in enumerate(bin_rates):
        rows += [(b, 1)] * pos + [(b, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "b long, y long")
    return isotonic_calibration(df, F.col("b"), F.col("y") == 1).collect()


def test_pava_pools_violators(spark):
    # rates [0.8, 0.2, 0.6]: PAVA pools bins 0,1 -> [0.5, 0.5, 0.6]
    out = _fit(spark, [(8, 10), (2, 10), (6, 10)])
    assert [r["iso_sc"] for r in out] == [500000, 500000, 600000]
    assert [r["pooled"] for r in out] == [True, True, False]


def test_pava_identity_on_monotone_input(spark):
    out = _fit(spark, [(1, 10), (4, 10), (9, 10)])
    assert [r["iso_sc"] for r in out] == [r["rate_sc"] for r in out]
    assert not any(r["pooled"] for r in out)


def test_pava_cascading_pool_weighted(spark):
    # rates [0.9, 0.5, 0.1] all decreasing with unequal weights:
    # everything pools into the single weighted mean
    out = _fit(spark, [(9, 10), (10, 20), (1, 10)])
    total_pos = 9 + 10 + 1
    expected = int(total_pos / 40 * 1_000_000)
    assert [r["iso_sc"] for r in out] == [expected] * 3


def test_pava_output_is_monotone_and_mean_preserving(spark):
    # pseudo-random wiggle: the fit must be monotone, bounded by the
    # raw range, and preserve the weighted mean (PAVA invariants)
    import hashlib

    rates = []
    for b in range(12):
        h = int(hashlib.md5(f"bin{b}".encode()).hexdigest()[:4], 16)
        rates.append((h % 10, 10))
    out = _fit(spark, rates)
    iso = [r["iso_sc"] for r in out]
    assert iso == sorted(iso)
    raw = [r["rate_sc"] for r in out]
    assert min(raw) <= iso[0] and iso[-1] <= max(raw)
    # weighted mean preserved (equal weights here): floor noise <= 1/bin
    assert abs(sum(iso) - sum(raw)) <= len(raw)
