"""Edge-case pytests for the wave-10 operators (journeys/lags, RAKE
keyphrases, contrastive data prep, seasonal decomposition). The oracle
gate pins the happy path at sf0.01; these pin boundaries and
invariants the synthetic corpus never hits."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_journey_paths_short_users_and_order(spark):
    from pasta_pipeline_spark.operators.journeys import user_journey_paths

    rows = [
        # user 1: full 4+1 events — 5th must be cut
        (1, _ts("2024-01-01T00:00:00"), 1, "view"),
        (1, _ts("2024-01-01T00:01:00"), 2, "view"),
        (1, _ts("2024-01-01T00:02:00"), 3, "cart"),
        (1, _ts("2024-01-01T00:03:00"), 4, "purchase"),
        (1, _ts("2024-01-01T00:04:00"), 5, "view"),
        # user 2: same first-4 path
        (2, _ts("2024-01-02T00:00:00"), 6, "view"),
        (2, _ts("2024-01-02T00:01:00"), 7, "view"),
        (2, _ts("2024-01-02T00:02:00"), 8, "cart"),
        (2, _ts("2024-01-02T00:03:00"), 9, "purchase"),
        # user 3: only 2 events — keeps its shorter path
        (3, _ts("2024-01-03T00:00:00"), 10, "view"),
        (3, _ts("2024-01-03T00:01:00"), 11, "cart"),
        # user 4: simultaneous timestamps — event_id breaks the tie
        (4, _ts("2024-01-04T00:00:00"), 13, "b"),
        (4, _ts("2024-01-04T00:00:00"), 12, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {r["path"]: r for r in user_journey_paths(df, path_len=4).collect()}
    assert got["view->view->cart->purchase"]["n_users"] == 2
    assert got["view->cart"]["n_users"] == 1
    assert got["a->b"]["n_users"] == 1  # event_id tiebreak, not input order
    assert "view->view->cart->purchase->view" not in got
    # shares: 2/4 and 1/4 of users
    assert got["view->view->cart->purchase"]["share_sc"] == 500000
    assert got["view->cart"]["share_sc"] == 250000


def test_conversion_lag_no_prior_view_bucket(spark):
    from pasta_pipeline_spark.operators.journeys import conversion_lag_profile

    rows = [
        # purchase 90 minutes after latest prior view -> lag_hours=1
        (1, _ts("2024-01-01T00:00:00"), 1, "view"),
        (1, _ts("2024-01-01T01:30:00"), 2, "purchase"),
        # purchase with NO prior view (view is later) -> -1
        (2, _ts("2024-01-02T00:00:00"), 3, "purchase"),
        (2, _ts("2024-01-02T01:00:00"), 4, "view"),
        # exact same second -> lag 0
        (3, _ts("2024-01-03T00:00:00"), 5, "view"),
        (3, _ts("2024-01-03T00:00:00"), 6, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {r["lag_hours"]: r for r in conversion_lag_profile(df).collect()}
    assert got[-1]["n"] == 1 and got[0]["n"] == 1 and got[1]["n"] == 1
    # cumulative share is monotone and ends at 1e6
    assert [got[k]["cum_share_sc"] for k in sorted(got)] == [333333, 666666, 1000000]


def test_shipping_lag_quartiles_small_domain(spark):
    from pasta_pipeline_spark.operators.journeys import shipping_lag_quartiles

    orders = spark.createDataFrame(
        [(1, 10, datetime.date(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderdate date, o_orderpriority string",
    )
    # gaps 1,2,3,4 days -> q1=1 (cum4>=4 at gap1), median=2, q3=3
    li = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 2 + i)) for i in range(4)],
        "l_orderkey long, l_shipdate date",
    )
    r = shipping_lag_quartiles(orders, li).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n"], row["q1_days"], row["median_days"], row["q3_days"], row["max_days"]) == (
        4, 1, 2, 3, 4
    )


def test_rake_scores_and_breaks(spark):
    from pasta_pipeline_spark.operators.keywords import rake_keyphrases

    # classic RAKE arithmetic: "deep learning" twice + "deep" once:
    # freq(deep)=3, deg(deep)=2+2+1=5; freq(learning)=2, deg=4
    # score(deep learning) = floor(5e6/3) + floor(4e6/2) = 1666666+2000000
    docs = spark.createDataFrame(
        [
            (1, "deep learning is the deep learning of deep!"),
            (2, "the of and"),  # all stopwords -> no phrases at all
            (3, ""),  # empty
        ],
        "doc_id long, text string",
    )
    got = rake_keyphrases(docs, top_k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc and 3 not in by_doc
    top = by_doc[1][0]
    assert top["phrase"] == "deep learning"
    assert top["score_sc"] == 1666666 + 2000000
    # "deep!" normalizes to "deep": second phrase is the singleton
    assert by_doc[1][1]["phrase"] == "deep"
    assert by_doc[1][1]["score_sc"] == 1666666


def test_hard_negatives_label_and_dim_guards(spark):
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining
    from pasta_pipeline_spark.operators.util import release_cached_deps

    d = 8
    rows = [
        (1, [1.0] * d, 0),
        (2, [1.0] * d, 0),          # same label as 1 -> never a negative for 1
        (3, [0.9] * d, 1),          # parallel vector, different label
        (4, [1.0] * (d - 1), 1),    # malformed: wrong dim, excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negative_mining(
        df, dim=d, k=3, num_planes=2, num_bands=2
    )
    got = out.collect()
    release_cached_deps(out)
    pairs = {(r["anchor_id"], r["neg_id"]) for r in got}
    assert (1, 2) not in pairs and (2, 1) not in pairs  # same label
    assert all(4 not in p for p in pairs)  # malformed excluded
    assert (1, 3) in pairs and (3, 1) in pairs
    # parallel vectors: cosine == 1 -> floor(1e6)
    sc = {p: r["cos_sc"] for p, r in zip(pairs, got)}
    for r in got:
        assert r["cos_sc"] == 1000000


def test_nearest_centroid_confusion_tiebreak_and_shares(spark):
    from pasta_pipeline_spark.operators.negatives import nearest_centroid_report

    d = 4
    rows = [
        # label 0 centroid = e0-ish, label 1 centroid = e1-ish
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.1, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 1),
        # mislabeled: points at label-0 territory but tagged 1
        (4, [1.0, 0.0, 0.0, 0.0], 1),
        # zero vector: norm 0 -> excluded entirely
        (5, [0.0, 0.0, 0.0, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {(r["true_label"], r["pred_label"]): r for r in
           nearest_centroid_report(df, dim=d).collect()}
    assert got[(0, 0)]["n"] == 2
    assert got[(1, 0)]["n"] == 1  # the mislabeled point crosses over
    assert got[(1, 1)]["n"] == 1
    assert (0, 1) not in got
    # row shares within true label 1: 50/50
    assert got[(1, 0)]["share_sc"] == 500000 and got[(1, 1)]["share_sc"] == 500000
    # vec 5 contributed nowhere: label-0 row total is 2
    assert got[(0, 0)]["share_sc"] == 1000000


def test_weekly_seasonality_edges_and_gap_guard(spark):
    from pasta_pipeline_spark.operators.seasonal import weekly_seasonal_decomposition

    # 14 dense days, then a gap, then 7 more days
    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 100.0) for i in range(14)]
    rows += [
        (base + datetime.timedelta(days=30 + i), 100.0) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "o_orderdate date, o_totalprice double")
    got = {r["day"]: r for r in weekly_seasonal_decomposition(df).collect()}
    days = sorted(got)
    # first/last 3 of the dense block have no full 7-day neighborhood
    for i in (0, 1, 2):
        assert got[days[i]]["trend_sc"] is None
    for i in (3, 10):
        # trend_sc is cents x100 fixed point: 100.00/day -> 10000 cents -> 1e6
        assert got[days[i]]["trend_sc"] == 1000000
        assert got[days[i]]["seasonal_sc"] in (0, -1)  # zero up to floor
    # days 11,12,13 touch the gap edge -> row-window spans >6 days -> NULL
    assert got[days[11]]["trend_sc"] is None
    assert got[days[12]]["trend_sc"] is None
    # the 7-day post-gap block: only its middle day has a full window
    post = [d for d in days if d >= base + datetime.timedelta(days=30)]
    assert got[post[3]]["trend_sc"] == 1000000
    assert got[post[0]]["trend_sc"] is None and got[post[6]]["trend_sc"] is None
