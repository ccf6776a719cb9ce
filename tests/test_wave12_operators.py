"""Wave-12 operator unit tests: curriculum, Lorenz, bot cadence,
contrastive positives."""

from __future__ import annotations

from datetime import datetime, timedelta


def test_curriculum_equal_token_budgets(spark):
    from pasta_pipeline_spark.operators.curriculum import curriculum_phases

    # 40 docs, 10 each at 4 distinct difficulties, 5 tokens each ->
    # perfectly equal budgets: one difficulty per phase
    words = {0: "ab", 1: "abcd", 2: "abcdef", 3: "abcdefgh"}
    rows = []
    for d in range(4):
        for i in range(10):
            rows.append((d * 10 + i, " ".join([words[d]] * 5)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["phase"]: r for r in curriculum_phases(docs, n_phases=4).collect()}
    assert sorted(got) == [0, 1, 2, 3]
    for p in range(4):
        assert got[p]["n_docs"] == 10 and got[p]["n_tokens"] == 50
        assert got[p]["token_share_sc"] == 250_000
    # easy phase holds the short words
    assert got[0]["difficulty_max_sc"] == 20_000  # mean len 2 * 1e4
    assert got[3]["difficulty_min_sc"] == 80_000
    # zero-token docs fail closed
    docs2 = spark.createDataFrame([(1, "a b"), (2, "   ")], "doc_id long, text string")
    rows2 = curriculum_phases(docs2).collect()
    assert sum(r["n_docs"] for r in rows2) == 1


def test_lorenz_deciles_concentration(spark):
    from pasta_pipeline_spark.operators.stats import revenue_lorenz_deciles

    # 20 customers: 19 spend 10.00, one whale spends 810.00
    rows = [(i, i, 10.0) for i in range(19)] + [(99, 99, 810.0)]
    orders = spark.createDataFrame(
        [(i, c, v) for i, (c, _, v) in enumerate([(c, c, v) for c, _, v in rows])],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    out = {r["decile"]: r for r in revenue_lorenz_deciles(orders).collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[d]["n_customers"] == 2 for d in out)
    total = sum(r["revenue_cents"] for r in out.values())
    assert total == 100000  # 190.00 + 810.00 in cents
    # top decile holds the whale: 810+10 of 1000 -> 82%
    assert out[10]["rev_share_sc"] == 820_000
    assert out[10]["cum_share_sc"] == 999_999 or out[10]["cum_share_sc"] == 1_000_000
    # monotone cumulative shares
    cums = [out[d]["cum_share_sc"] for d in range(1, 11)]
    assert cums == sorted(cums)


def test_bot_cadence_flags_machine_user(spark):
    from pasta_pipeline_spark.operators.engagement import bot_cadence_report

    base = datetime(2024, 6, 1)
    rows = []
    eid = 0
    # user 1: 30 events 1s apart -> bot
    for i in range(30):
        rows.append((eid, base + timedelta(seconds=i), 1)); eid += 1
    # user 2: 30 events 300s apart -> human
    for i in range(30):
        rows.append((eid, base + timedelta(seconds=300 * i), 2)); eid += 1
    # user 3: 5 fast events -> too few to flag
    for i in range(5):
        rows.append((eid, base + timedelta(seconds=i), 3)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {r["user_id"]: r for r in bot_cadence_report(df).collect()}
    assert got[1]["is_bot"] and got[1]["p50_gap_s"] == 1
    assert not got[2]["is_bot"] and got[2]["p50_gap_s"] == 300
    assert not got[3]["is_bot"]
    assert got[1]["span_s"] == 29
    # 30 events over 29s -> 3724.1379... events/hour
    assert got[1]["events_per_hour_sc"] == int(30 * 3600 / 29 * 1_000_000)


def test_contrastive_positives_same_label_no_self(spark):
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining

    v = lambda eps: [1.0, 0.5, 0.25, 0.125, 1.0, 0.5, 0.25, 0.125 + eps]  # noqa: E731
    rows = [(i, v(i * 1e-9), i % 2) for i in range(12)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    pos = hard_negative_mining(
        emb, dim=8, k=2, num_planes=4, num_bands=2, same_label=True
    ).collect()
    assert pos, "hub population must yield same-label candidates"
    for r in pos:
        assert r["neg_label"] == r["anchor_id"] % 2  # same label as anchor
        assert r["neg_id"] != r["anchor_id"]
    neg = hard_negative_mining(emb, dim=8, k=2, num_planes=4, num_bands=2).collect()
    for r in neg:
        assert r["neg_label"] != r["anchor_id"] % 2
