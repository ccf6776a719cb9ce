"""Wave-11 operator unit tests: governance, engagement, ACF,
stopword discovery."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F


def test_k_anonymity_histogram(spark):
    from pasta_pipeline_spark.operators.governance import k_anonymity_report

    rows = (
        [("US", "A")] * 6
        + [("US", "B")] * 2
        + [("DE", "A")] * 1
        + [("DE", "B")] * 6
    )
    df = spark.createDataFrame(rows, "nation string, seg string")
    got = {r["class_size"]: r for r in k_anonymity_report(df, ["nation", "seg"], k=5).collect()}
    assert got[1]["n_classes"] == 1 and got[1]["at_risk"]
    assert got[2]["n_classes"] == 1 and got[2]["at_risk"]
    assert got[6]["n_classes"] == 2 and not got[6]["at_risk"]
    assert got[6]["n_rows"] == 12
    # shares sum to ~1 (floor rounding)
    assert sum(r["row_share_sc"] for r in got.values()) <= 1_000_000


def test_four_fifths_flag_exact(spark):
    from pasta_pipeline_spark.operators.governance import four_fifths_disparity

    # A: 10/10, B: 8/10 (ratio .8 -> NOT flagged, rule is strict <),
    # C: 7/10 (flagged)
    rows = [("A", 1)] * 10 + [("B", 1)] * 8 + [("B", 0)] * 2 + [("C", 1)] * 7 + [("C", 0)] * 3
    df = spark.createDataFrame(rows, "grp string, ok int")
    got = {r["grp"]: r for r in four_fifths_disparity(df, "grp", F.col("ok") == 1).collect()}
    assert not got["A"]["four_fifths_flag"] and got["A"]["ratio_sc"] == 1_000_000
    assert not got["B"]["four_fifths_flag"] and got["B"]["ratio_sc"] == 800_000
    assert got["C"]["four_fifths_flag"]


def test_dau_mau_stickiness_two_months(spark):
    from pasta_pipeline_spark.operators.engagement import dau_mau_stickiness

    base = datetime(2024, 1, 30)
    rows = []
    eid = 0
    # Jan 30: users 1,2 ; Jan 31: user 1 ; Feb 1: users 1,2,3
    for day, users in [(0, [1, 2]), (1, [1]), (2, [1, 2, 3])]:
        for u in users:
            rows.append((eid, base + timedelta(days=day), u))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {str(r["month"]): r for r in dau_mau_stickiness(df).collect()}
    jan, feb = got["2024-01-01"], got["2024-02-01"]
    assert jan["n_days"] == 2 and jan["dau_sum"] == 3 and jan["mau"] == 2
    assert jan["stickiness_sc"] == 750_000  # 3/(2*2)
    assert feb["n_days"] == 1 and feb["mau"] == 3 and feb["stickiness_sc"] == 1_000_000


def test_interarrival_percentile_picks(spark):
    from pasta_pipeline_spark.operators.engagement import interarrival_profile

    base = datetime(2024, 5, 1)
    # user 1 "click": events at 0, 10, 20, 120 s -> gaps 10, 10, 100
    ts = [0, 10, 20, 120]
    rows = [(i, base + timedelta(seconds=s), 1, "click") for i, s in enumerate(ts)]
    # user 2 "view": single event -> no gap
    rows.append((99, base, 2, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r["etype"]: r for r in interarrival_profile(df).collect()}
    assert list(got) == ["click"]
    c = got["click"]
    assert c["n_gaps"] == 3 and c["p50_s"] == 10 and c["p90_s"] == 100 and c["max_s"] == 100


def test_acf_weekly_periodic_series(spark):
    from pasta_pipeline_spark.operators.timeseries import daily_autocorrelation

    base = datetime(2024, 3, 4)
    # 4 exact repeats of a 7-day pattern: lag-7 r == 1, lag-1 < 1
    pattern = [100.0, 200.0, 150.0, 300.0, 250.0, 50.0, 400.0]
    rows = [
        (base + timedelta(days=d), pattern[d % 7]) for d in range(28)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = {r["lag"]: r for r in daily_autocorrelation(df, "o_orderdate", "o_totalprice").collect()}
    assert sorted(got) == list(range(1, 8))
    assert got[7]["n_pairs"] == 21 and got[7]["r_sc"] == 1_000_000
    assert got[1]["r_sc"] < 1_000_000
    # calendar-gap honesty: drop one day -> its pairs vanish, no NULL fill
    df2 = spark.createDataFrame(rows[:10] + rows[11:], "o_orderdate timestamp, o_totalprice double")
    got2 = {r["lag"]: r for r in daily_autocorrelation(df2, "o_orderdate", "o_totalprice").collect()}
    assert got2[1]["n_pairs"] == 25  # 27 consecutive-day pairs minus the 2 broken ones


def test_stopword_discovery_flags_ubiquitous_token(spark):
    from pasta_pipeline_spark.operators.text_analysis import stopword_discovery

    docs = spark.createDataFrame(
        [
            (1, "the cat the dog"),
            (2, "the bird"),
            (3, "the fish swims"),
            (4, "rare words only"),
        ],
        "doc_id long, text string",
    )
    got = {r["token"]: r for r in stopword_discovery(docs, top_k=10).collect()}
    the = got["the"]
    assert the["df"] == 3 and the["cf"] == 4 and the["is_stopword"]
    assert the["df_ratio_sc"] == 750_000
    assert the["per_doc_rate_sc"] == 1_333_333
    assert not got["cat"]["is_stopword"]
    # rank 1 is the highest-df token
    assert min(got.values(), key=lambda r: r["rnk"])["token"] == "the"
