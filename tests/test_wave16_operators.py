"""Wave-16 operator unit tests: in-plan GD, Kaplan-Meier, Holt."""

from __future__ import annotations

import pytest


def test_standardize_features_moments_and_clip(spark):
    from pasta_pipeline_spark.operators.mlplan import (
        CLIP_SIGMA_FP,
        FEAT_SCALE,
        standardize_features,
    )

    rows = [(i, 1, i % 2) for i in range(1, 101)] + [(100000, 1, 0)]
    df = spark.createDataFrame(rows, "f1 long, f2 long, y long")
    out = standardize_features(df, ["f1", "f2"]).collect()
    # bias channel is constant FEAT_SCALE
    assert all(r["x0"] == FEAT_SCALE for r in out)
    # the 100000 outlier clips at +CLIP_SIGMA_FP
    assert max(r["x1"] for r in out) == CLIP_SIGMA_FP
    # a zero-variance column carries no signal: standardized to 0
    assert all(r["x2"] == 0 for r in out)
    # floored z-scores are near-centered
    s = sum(r["x1"] for r in out)
    assert abs(s) <= len(out) * FEAT_SCALE


def test_logistic_gd_learns_separable_gate(spark):
    from pasta_pipeline_spark.operators.mlplan import (
        logistic_gd_report,
        standardize_features,
    )

    # y = (f1 >= 50): linearly separable on one feature
    rows = [(i % 100 + 1, (i * 7) % 13 + 1, 1 if (i % 100 + 1) >= 50 else 0)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "f1 long, f2 long, y long")
    feats = standardize_features(df, ["f1", "f2"])
    out = logistic_gd_report(feats, steps=5, lr_num=2).collect()
    assert [r["step"] for r in out] == [0, 1, 2, 3, 4, 5]
    # step 0: all-positive prediction -> accuracy == positive share
    pos_share = sum(1 for r in rows if r[2]) / len(rows)
    assert out[0]["acc_sc"] == int(pos_share * 1_000_000)
    # learning curve ends well above majority baseline
    maj = max(pos_share, 1 - pos_share)
    assert out[-1]["acc_sc"] >= (maj + 0.02) * 1_000_000
    # monotone-ish improvement: final >= step-1 accuracy
    assert out[-1]["acc_sc"] >= out[1]["acc_sc"]


def test_logistic_gd_rejects_bad_steps(spark):
    from pasta_pipeline_spark.operators.mlplan import logistic_gd_report

    df = spark.createDataFrame([(1000, 0, 0, 1)], "x0 long, x1 long, x2 long, y long")
    with pytest.raises(ValueError):
        logistic_gd_report(df, steps=0)


def test_kaplan_meier_hand_example(spark):
    from pasta_pipeline_spark.operators.survival import kaplan_meier

    # durations 1, 2, 3 with cutoff 2: t=1 (n=3, d=1) -> 666666;
    # t=2 (n=2, d=1, c=1 censored from dur 3) -> 333333
    df = spark.createDataFrame([(1,), (2,), (3,)], "dur long")
    out = kaplan_meier(df, cutoff=2).collect()
    assert [(r["t_day"], r["n_risk"], r["d_events"], r["c_censored"], r["surv_sc"])
            for r in out] == [(1, 3, 1, 0, 666666), (2, 2, 1, 1, 333333)]


def test_kaplan_meier_excludes_negative_durations(spark):
    from pasta_pipeline_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame([(-5,), (1,), (1,)], "dur long")
    out = kaplan_meier(df, cutoff=10).collect()
    assert len(out) == 1
    assert out[0]["n_risk"] == 2 and out[0]["surv_sc"] == 0


def test_kaplan_meier_no_censoring_matches_empirical(spark):
    from pasta_pipeline_spark.operators.survival import kaplan_meier

    # without censoring, KM == empirical survival function
    df = spark.createDataFrame([(d,) for d in [1, 1, 2, 4]], "dur long")
    out = {r["t_day"]: r["surv_sc"] for r in kaplan_meier(df, cutoff=10).collect()}
    assert out[1] == 500000      # 2/4 survive past 1
    assert out[2] == 250000      # 1/4 past 2
    assert out[4] == 0


def test_holt_constant_series_flat(spark):
    import datetime as dt

    from pasta_pipeline_spark.operators.timeseries import holt_linear_fold

    rows = [(dt.date(2020, 1, 1) + dt.timedelta(days=i), 1000) for i in range(10)]
    df = spark.createDataFrame(rows, "day date, y_fp long")
    out = holt_linear_fold(df, tail=10).collect()
    assert all(r["level_fp"] == 1000 for r in out)
    assert all(r["trend_fp"] == 0 for r in out)
    assert out[0]["onestep_err_fp"] is None
    assert all(r["onestep_err_fp"] == 0 for r in out[1:])
    # epoch-day bridge: first day is 2020-01-01
    assert out[0]["day_ed"] == (dt.date(2020, 1, 1) - dt.date(1970, 1, 1)).days


def test_holt_tracks_linear_ramp(spark):
    import datetime as dt

    from pasta_pipeline_spark.operators.timeseries import holt_linear_fold

    rows = [(dt.date(2020, 1, 1) + dt.timedelta(days=i), 1000 + 100 * i)
            for i in range(60)]
    df = spark.createDataFrame(rows, "day date, y_fp long")
    out = holt_linear_fold(df, tail=5).collect()
    # on a pure ramp the trend converges toward the slope and the
    # one-step error shrinks toward zero
    assert 60 <= out[-1]["trend_fp"] <= 100
    assert abs(out[-1]["onestep_err_fp"]) < abs(out[0]["onestep_err_fp"]) + 200
    assert out[-1]["onestep_err_fp"] >= 0
