"""Wave-17 operator unit tests: shuffle audit, CUPED, vocab coverage."""

from __future__ import annotations


def test_epoch_shuffle_runs_counts_are_consistent(spark):
    from pasta_pipeline_spark.operators.shuffle_audit import epoch_shuffle_runs

    rows = [(i, "a" if i % 3 else "b") for i in range(1, 121)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in epoch_shuffle_runs(df).collect()}
    # mass conservation and run-length sanity
    assert out["a"]["n_rows"] + out["b"]["n_rows"] == 120
    for r in out.values():
        assert 1 <= r["n_runs"] <= r["n_rows"]
        assert r["max_run"] >= 1
        # mean_run_sc == n_rows/n_runs exactly (floored)
        assert r["mean_run_sc"] == int(r["n_rows"] / r["n_runs"] * 1_000_000)
    # expected run length for the 2/3-share source is 3x the 1/3 one
    assert out["a"]["expected_run_sc"] == 3_000_000  # 120/(120-80)
    assert out["b"]["expected_run_sc"] == 1_500_000  # 120/(120-40)


def test_epoch_shuffle_deterministic_across_epochs(spark):
    from pasta_pipeline_spark.operators.shuffle_audit import epoch_shuffle_runs

    rows = [(i, "a" if i % 2 else "b") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    e1 = [tuple(r) for r in epoch_shuffle_runs(df, epoch=1).collect()]
    e1_again = [tuple(r) for r in epoch_shuffle_runs(df, epoch=1).collect()]
    e2 = [tuple(r) for r in epoch_shuffle_runs(df, epoch=2).collect()]
    assert e1 == e1_again          # same epoch -> bit-identical
    assert e1 != e2                # different epoch -> different order


def test_cuped_reduces_variance_when_covariate_predicts(spark):
    import datetime as dt

    from pasta_pipeline_spark.operators.stat_tests import cuped_report

    # user i has a stable personal level: pre and post values both
    # proportional to it -> X strongly predicts Y -> CUPED shrinks var
    rows = []
    eid = 0
    for u in range(1, 41):
        level = float(10 * u)
        for d in (1, 5, 20, 25):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, d, 12, 0, 0), u, "view", level)
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = cuped_report(df).collect()[0]
    assert r["n_users"] == 40
    assert 0 < r["n_treat"] < 40
    # theta ~ 1 (Y == X here), variance collapses
    assert 900000 <= r["theta_sc"] <= 1100000
    assert r["var_reduction_sc"] <= 10000  # > 99% reduction
    # adjusted diff is (much) closer to zero than the raw diff
    assert abs(r["diff_adj_fp"]) <= abs(r["diff_raw_fp"])


def test_cuped_zero_covariate_degenerates_to_raw(spark):
    import datetime as dt

    from pasta_pipeline_spark.operators.stat_tests import cuped_report

    # all events post-boundary: X = 0 for everyone -> var(X)=0 ->
    # theta = 0 and adjusted == raw
    rows = [
        (i, dt.datetime(2024, 1, 20, 8, 0, 0), i % 7 + 1, "view", float(i))
        for i in range(1, 50)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = cuped_report(df).collect()[0]
    assert r["theta_sc"] == 0
    assert r["var_reduction_sc"] == 1000000
    assert r["diff_adj_fp"] == r["diff_raw_fp"]


def test_vocab_coverage_curve_monotone_and_exact(spark):
    from pasta_pipeline_spark.operators.text_analysis import vocab_coverage_curve

    # 'a' x 6, 'b' x 3, 'c' x 1 -> top-1 covers 60%, top-2 90%
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a a a b")], "doc_id long, text string"
    )
    out = vocab_coverage_curve(df, grid=(1, 2, 3)).collect()
    assert [(r["k"], r["top_cf"], r["total_cf"], r["share_sc"]) for r in out] == [
        (1, 6, 10, 600000),
        (2, 9, 10, 900000),
        (3, 10, 10, 1000000),
    ]
