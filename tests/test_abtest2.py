"""A/B tier II (operators/abtest2.py): seeded invariants with known
ground truth — the causal-tier property pattern."""

from __future__ import annotations

import datetime as dt


def _events(spark, n_users, effect=0.0, effect_arm=1, per_user=3, salt="e"):
    import hashlib

    from pasta_pipeline_spark.operators.sampling import sample_bucket
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(u,) for u in range(1, n_users + 1)], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id", sample_bucket(F.col("user_id"), 2).alias("arm")
        ).collect()
    }

    def u01(i):
        return int.from_bytes(
            hashlib.md5(f"{salt}:{i}".encode()).digest()[:8], "big"
        ) / 2**64

    rows, eid = [], 0
    for u in range(1, n_users + 1):
        for j in range(per_user):
            eid += 1
            v = 50.0 + 30.0 * u01(eid)
            if arms[u] == effect_arm:
                v += effect
            rows.append(
                (eid, dt.datetime(2024, 1, 10 + j % 5, 12), u, f"t{j % 2}", v)
            )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ), arms


def test_srm_passes_fair_split_flags_planted_imbalance(spark):
    from pasta_pipeline_spark.operators.abtest2 import srm_check

    ev, arms = _events(spark, 400)
    r = srm_check(ev).collect()[0]
    assert r["n_users"] == 400
    assert r["n_ctrl"] + r["n_treat"] == 400
    assert not r["srm_flag"]  # md5 split is fair
    # plant the bug SRM exists to catch: drop 60% of one arm's users
    treat_users = [u for u, a in arms.items() if a == 1]
    dropped = set(treat_users[: int(len(treat_users) * 0.6)])
    from pyspark.sql import functions as F

    broken = ev.where(~F.col("user_id").isin(list(dropped)))
    rb = srm_check(broken).collect()[0]
    assert rb["srm_flag"]
    assert rb["chi2_sc"] > r["chi2_sc"]


def test_qte_zero_effect_small_planted_effect_visible(spark):
    from pasta_pipeline_spark.operators.abtest2 import quantile_treatment_effect

    ev0, _ = _events(spark, 300, effect=0.0)
    null_qte = {
        r["p_sc"]: r["qte_sc"]
        for r in quantile_treatment_effect(ev0).collect()
    }
    ev1, _ = _events(spark, 300, effect=20.0)  # +20 per event, 3 events
    shift_qte = {
        r["p_sc"]: r["qte_sc"]
        for r in quantile_treatment_effect(ev1).collect()
    }
    # planted shift = 20*100(scale)*3(events)*1e4(q_sc scale)/1e4... the
    # per-user metric shifts by 6000 fixed-point units = 6000*1e4 q_sc? No:
    # q_sc = floor(q*1e4) with q in floor(v*100) units -> shift 6000*1e4.
    planted = 20 * 100 * 3 * 10_000
    for p, q in shift_qte.items():
        # every quantile moves by ~the planted shift; the null curve is
        # an order of magnitude smaller
        assert abs(q - planted) < 0.5 * planted, (p, q)
        assert abs(null_qte[p]) < 0.5 * planted, (p, null_qte[p])


def test_post_stratification_helps_when_strata_explain_variance(spark):
    """Strata with very different levels + imbalanced mixes: the
    post-stratified diff lands near the true (zero) effect while the
    raw diff is polluted by the mix imbalance."""
    from pasta_pipeline_spark.operators.abtest2 import post_stratified_effect
    from pasta_pipeline_spark.operators.sampling import sample_bucket
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(u,) for u in range(1, 601)], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id", sample_bucket(F.col("user_id"), 2).alias("arm")
        ).collect()
    }
    rows, eid = [], 0
    for u, a in arms.items():
        # stratum assignment correlated with arm: treat users land in
        # the HIGH stratum more often -> raw diff biased upward
        high = (u % 10) < (7 if a == 1 else 3)
        stratum = "high" if high else "low"
        base = 200.0 if high else 10.0
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 10, 12), u, stratum, base + (u % 7)))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = post_stratified_effect(ev, strata_col="event_type").collect()[0]
    assert r["n_strata"] == 2
    # zero true effect: post-stratified estimate is an order of
    # magnitude closer to 0 than the mix-polluted raw diff
    assert abs(r["diff_ps_sc"]) * 10 < abs(r["diff_raw_sc"])
    assert abs(r["z_ps_sc"]) < 4_000_000  # and reads as null


def test_power_grid_monotone_and_scales_with_variance(spark):
    from pasta_pipeline_spark.operators.abtest2 import ab_power_grid

    ev, _ = _events(spark, 500)
    rows = ab_power_grid(ev).collect()
    reqs = [r["required_n_per_arm"] for r in rows]
    mdes = [r["mde_sc"] for r in rows]
    assert mdes == sorted(mdes)
    # required n strictly decreasing in MDE (quadratically)
    assert all(a > b for a, b in zip(reqs, reqs[1:]))
    # quadratic law: halving the MDE ~4x the n (10% -> 5% grid points)
    assert 3.5 <= reqs[2] / reqs[3] <= 4.5
    for r in rows:
        assert r["powered"] == (r["current_n_per_arm"] >= r["required_n_per_arm"])


def test_post_stratified_fails_closed_on_empty_arm_cell(spark):
    """A stratum whose users all land in ONE arm must null out the
    whole post-stratified readout — SUM alone would silently drop the
    stratum's NULL terms while n_users still counts its users,
    deflating the estimate (the r9 advisor finding). Both engines."""
    import duckdb
    import pandas as pd

    from pasta_pipeline_spark.operators.abtest2 import (
        post_stratified_effect,
        post_stratified_oracle_sql,
    )
    from pasta_pipeline_spark.operators.sampling import sample_bucket
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(u,) for u in range(1, 201)], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id", sample_bucket(F.col("user_id"), 2).alias("arm")
        ).collect()
    }
    # stratum "solo" holds ONLY arm-0 users; everyone else is "both"
    solo = [u for u, a in arms.items() if a == 0][:10]
    rows, eid = [], 0
    for u in range(1, 201):
        eid += 1
        stratum = "solo" if u in solo else "both"
        rows.append(
            (eid, dt.datetime(2024, 1, 10, 12), u, stratum, 50.0 + (u % 9))
        )
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    ev = spark.createDataFrame(rows, schema)
    r = post_stratified_effect(ev, strata_col="event_type").collect()[0]
    assert r["n_strata"] == 2
    assert r["n_users"] == 200
    assert r["diff_raw_sc"] is not None
    assert r["diff_ps_sc"] is None
    assert r["se_ps_sc"] is None
    assert r["z_ps_sc"] is None

    # the DuckDB twin fails closed identically
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    con = duckdb.connect()
    con.register("events", pdf)
    o = con.execute(
        post_stratified_oracle_sql("events", strata_sql="event_type")
    ).fetchone()
    assert o[0] == 2 and o[1] == 200
    assert o[2] is not None  # diff_raw_sc
    assert o[3] is None and o[4] is None and o[5] is None
