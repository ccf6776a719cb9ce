"""Wave-19 operator unit tests: Poisson bootstrap, BPE compression."""

from __future__ import annotations

import pytest


def test_poisson_weights_are_calibrated(spark):
    import pyspark.sql.functions as F

    from pasta_pipeline_spark.operators.bootstrap import poisson1_weight

    df = spark.range(1, 20001)
    w = df.select(poisson1_weight(F.col("id"), 0).alias("w"))
    stats = w.agg(
        F.avg("w").alias("mean"), F.sum((F.col("w") == 0).cast("long")).alias("z")
    ).collect()[0]
    # Poisson(1): mean 1, P(0) = 1/e ~ 0.368
    assert 0.97 <= stats["mean"] <= 1.03
    assert 0.35 <= stats["z"] / 20000 <= 0.385


def test_bootstrap_ci_covers_mean_and_shrinks(spark):
    from pasta_pipeline_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    small = spark.range(1, 201).selectExpr(
        "id AS k", "CAST(100 + (id % 37) AS DOUBLE) AS v"
    )
    big = spark.range(1, 20001).selectExpr(
        "id AS k", "CAST(100 + (id % 37) AS DOUBLE) AS v"
    )
    rs = poisson_bootstrap_mean_ci(small, "k", "v").collect()[0]
    rb = poisson_bootstrap_mean_ci(big, "k", "v").collect()[0]
    # the interval brackets the point estimate
    assert rs["ci_lo_sc"] <= rs["mean_sc"] <= rs["ci_hi_sc"]
    assert rb["ci_lo_sc"] <= rb["mean_sc"] <= rb["ci_hi_sc"]
    # 100x more data -> materially narrower interval (~10x in theory)
    assert rb["width_sc"] < rs["width_sc"] / 3
    # determinism
    again = poisson_bootstrap_mean_ci(small, "k", "v").collect()[0]
    assert tuple(rs) == tuple(again)


def test_bootstrap_rejects_tiny_b(spark):
    from pasta_pipeline_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    df = spark.range(1, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(df, "k", "v", b=2)


def test_bpe_compression_monotone_and_exact(spark):
    from pasta_pipeline_spark.operators.bpe import (
        bpe_compression_report,
        word_freq_frame,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = bpe_compression_report(word_freq_frame(df), k=3).collect()
    # step 0 baseline: total chars = 5*3 + 2*5 + 6*6 + 3*6 = 79
    assert (out[0]["step"], out[0]["total_tokens"]) == (0, 79)
    # each merge strictly reduces total tokens (every elected pair has
    # positive count)
    totals = [r["total_tokens"] for r in out]
    assert all(a > b for a, b in zip(totals, totals[1:]))
    # step 1 merges (e,s) with count 9 -> exactly 9 fewer tokens
    assert totals[0] - totals[1] == 9
    assert out[0]["vocab_words"] == 4
