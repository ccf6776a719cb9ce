"""Property-based tests (SURVEY.md §5.4) — hypothesis generates the
batches; Spark round-trips are batched per example set to keep runtime
sane (one DataFrame per property, not per example)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from pasta_pipeline_spark.operators.merge import merge_upsert

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.text(alphabet="abcxyz", min_size=0, max_size=5)
TS = st.integers(min_value=0, max_value=1000)


def _df(spark, rows):
    base = datetime(2024, 1, 1)
    data = [(k, v, base + timedelta(minutes=t)) for k, v, t in rows]
    return spark.createDataFrame(data, "id long, val string, ts timestamp")


def _state(df):
    return sorted((r["id"], r["val"]) for r in df.collect())


@settings(max_examples=15, deadline=None)
@given(
    target=st.lists(st.tuples(KEYS, VALS, TS), max_size=12, unique_by=lambda r: r[0]),
    batch=st.lists(st.tuples(KEYS, VALS, TS), max_size=12),
)
def test_merge_idempotent(spark, target, batch):
    """merge(merge(T, B), B) == merge(T, B) for any target and batch."""
    t, b = _df(spark, target), _df(spark, batch)
    once = merge_upsert(t, b, key="id", order_col="ts")
    twice = merge_upsert(once, b, key="id", order_col="ts")
    assert _state(once) == _state(twice)


@settings(max_examples=15, deadline=None)
@given(
    target=st.lists(st.tuples(KEYS, VALS, TS), max_size=10, unique_by=lambda r: r[0]),
    batch_a=st.lists(
        st.tuples(st.integers(0, 4), VALS, TS), max_size=8, unique_by=lambda r: r[0]
    ),
    batch_b=st.lists(
        st.tuples(st.integers(5, 9), VALS, TS), max_size=8, unique_by=lambda r: r[0]
    ),
)
def test_merge_commutes_for_disjoint_batches(spark, target, batch_a, batch_b):
    """Non-overlapping batches can apply in either order (SURVEY.md §5.4)."""
    t = _df(spark, target)
    ab = merge_upsert(
        merge_upsert(t, _df(spark, batch_a), key="id", order_col="ts"),
        _df(spark, batch_b),
        key="id",
        order_col="ts",
    )
    ba = merge_upsert(
        merge_upsert(t, _df(spark, batch_b), key="id", order_col="ts"),
        _df(spark, batch_a),
        key="id",
        order_col="ts",
    )
    assert _state(ab) == _state(ba)


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(st.tuples(KEYS, VALS, TS), min_size=1, max_size=15),
)
def test_dedup_result_is_duplicate_free_and_keeps_max(spark, rows):
    """keep_latest output has one row per key, and it carries the
    maximum order value present for that key."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.dedup import keep_latest

    df = _df(spark, rows)
    out = keep_latest(df, "id", "ts", tiebreak="val")
    got = out.collect()
    assert len({r["id"] for r in got}) == len(got)
    expected_max = {
        r["id"]: r["mx"]
        for r in df.groupBy("id").agg(F.max("ts").alias("mx")).collect()
    }
    for r in got:
        assert r["ts"] == expected_max[r["id"]]


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=20),
    budget=st.integers(min_value=1, max_value=200),
)
def test_budget_sample_invariants(spark, sizes, budget):
    """For any sizes and budget: at least one row kept, kept total
    minus the largest kept row is under budget (<=1-row overshoot),
    and the kept set is a deterministic function of the input."""
    from pasta_pipeline_spark.operators.sampling import budget_sample

    rows = [(i, "g", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "id long, g string, sz long")
    kept = budget_sample(df, "id", "sz", budget=budget, group_col="g").collect()
    assert len(kept) >= 1
    tot = sum(r["sz"] for r in kept)
    assert tot - max(r["sz"] for r in kept) < budget
    again = budget_sample(df, "id", "sz", budget=budget, group_col="g").collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in kept)


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=2, max_size=6
    ),
)
def test_containment_matches_bruteforce(spark, docs):
    """containment_pairs == brute-force shingle-set containment on any
    tiny corpus (including empty/short/duplicate texts)."""
    from pasta_pipeline_spark.operators.text_dedup import containment_pairs
    from pasta_pipeline_spark.operators.util import release_cached_deps

    def sh(text, n=3):
        # mirrors the engine/oracle convention: fewer than n tokens
        # collapse to one joined shingle, so an empty doc has the
        # single empty shingle (two empty docs ARE mutual duplicates)
        toks = text.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.5)
    got = {(r["doc_inner"], r["doc_outer"]) for r in out.collect()}
    release_cached_deps(out)

    want = set()
    shs = {i: sh(t) for i, t in rows}
    for i, a in shs.items():
        for j, b in shs.items():
            if i != j and a and len(a & b) / len(a) >= 0.5:
                want.add((i, j))
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=30),
    budget=st.integers(min_value=32, max_value=300),
)
def test_greedy_pack_matches_reference_loop(spark, sizes, budget):
    """greedy_pack == the textbook next-fit loop for ANY sizes/budget."""
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    df = spark.createDataFrame(
        [(i, n, "g") for i, n in enumerate(sizes)],
        "doc_id long, n long, source string",
    )
    out = sorted(
        greedy_pack(df, "doc_id", "n", budget=budget, group_col="source").collect(),
        key=lambda r: r["doc_id"],
    )
    pack = fill = 0
    for r, n in zip(out, sizes):
        if fill > 0 and fill + n > budget:
            pack, fill = pack + 1, 0
        assert (r["pack_id"], r["offset_in_pack"]) == (pack, fill)
        fill += n


@settings(max_examples=10, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-2000, max_value=2000), min_size=8, max_size=64
    ),
    order=st.integers(min_value=0, max_value=2),
)
def test_flac_fixed_roundtrip_any_samples(samples, order):
    """General FIXED-order encode/decode round-trips arbitrary 16-bit
    sample streams (rice parameter sized to worst-case residuals)."""
    from tests.test_flac_decode import _encode_general
    from pasta_pipeline_spark.operators.multimodal import decode_flac_samples

    raw = _encode_general(samples, order=order, porder=0, k=14)
    out = decode_flac_samples(raw)
    assert out is not None
    assert out["n_samples"] == len(samples)
    assert out["sample_sum"] == sum(samples)
    assert out["sample_min"] == min(samples)
    assert out["sample_max"] == max(samples)


@settings(max_examples=8, deadline=None)
@given(
    prefix=st.lists(st.integers(0, 30), min_size=0, max_size=10),
    shared=st.lists(st.integers(0, 30), min_size=7, max_size=12),
    suffix=st.lists(st.integers(0, 30), min_size=0, max_size=10),
)
def test_winnowing_guarantee_random_docs(spark, prefix, shared, suffix):
    """Any two docs sharing >= w+k-1 consecutive tokens share a
    fingerprint — the winnowing guarantee under random contexts."""
    from pasta_pipeline_spark.operators.text_dedup import winnowing_fingerprints

    mk = lambda toks: " ".join(f"t{v}" for v in toks)  # noqa: E731
    a = mk(prefix + shared)
    b = mk(shared + suffix)
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = winnowing_fingerprints(df, k=4, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc.get(1, set()) & by_doc.get(2, set())


def test_winnowing_short_docs_no_crash(spark):
    """Regression (r6 ADVICE, high): a document with fewer than k
    tokens used to drive Spark's descending sequence(1, 0) into
    slice(ht, 0, k) → INVALID_PARAMETER_VALUE.START, aborting the
    whole job. Short/empty/whitespace/NULL docs must yield zero
    fingerprints, matching the oracle's ``len(ht) >= k`` guard."""
    from pasta_pipeline_spark.operators.text_dedup import (
        winnowing_fingerprints,
        winnowing_pairs,
    )

    long = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "   "), (4, None), (5, "a b c"),
         (6, long), (7, long)],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df)
    assert {r["doc_id"] for r in fps.collect()} == {6, 7}
    pairs = winnowing_pairs(df, min_shared=1)
    assert [(r["doc_a"], r["doc_b"]) for r in pairs.collect()] == [(6, 7)]


# ---------------------------------------------------------------------------
# Statistics-tier invariants (r8, verdict ask #6) — properties fixtures
# can't pin: algebraic identities that must hold for ANY input.
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.booleans()),
        min_size=4,
        max_size=40,
    ).filter(lambda r: any(g for _, g in r) and any(not g for _, g in r)),
)
def test_mann_whitney_symmetry(spark, rows):
    """U1 + U2 == n1*n2 for any two-sample split (in doubled units:
    u1_x2 + u2_x2 == 2*n1*n2), and swapping the groups flips the sign
    of z (floor scaling allows a 1-unit offset: floor(-x) == -floor(x)
    or -floor(x)-1)."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.stat_tests import mann_whitney_u

    df = spark.createDataFrame(rows, "val long, g boolean")
    a = mann_whitney_u(df, "val", F.col("g"), ~F.col("g")).collect()[0]
    b = mann_whitney_u(df, "val", ~F.col("g"), F.col("g")).collect()[0]
    assert a["n1"] == b["n2"] and a["n2"] == b["n1"]
    assert a["u1_x2"] + b["u1_x2"] == 2 * a["n1"] * a["n2"]
    if a["z_sc"] is not None and b["z_sc"] is not None:
        assert -1 <= a["z_sc"] + b["z_sc"] <= 0


@settings(max_examples=6, deadline=None)
@given(scale=st.integers(min_value=500, max_value=5000))
def test_benford_exact_distribution_near_zero_chi2(spark, scale):
    """On a synthetic corpus whose digit counts are round(p_d * N) for
    the literal Benford proportions, chi-square is ~0 (only the
    rounding residue survives) and the 9-row spine is complete."""
    from pasta_pipeline_spark.operators.stat_tests import (
        BENFORD_P,
        benford_digit_test,
    )

    rows = []
    for d, p in BENFORD_P.items():
        rows.extend([(float(d * 100),)] * round(p * scale))
    df = spark.createDataFrame(rows, "amt double")
    got = {r["digit"]: r for r in benford_digit_test(df, "amt").collect()}
    assert sorted(got) == list(range(1, 10))
    # per-digit rounding residue is <= 0.5 counts; chi2 stays tiny
    assert 0 <= got[1]["chi2_sc"] < 50_000  # chi2 < 0.05
    assert sum(r["observed"] for r in got.values()) == sum(
        round(p * scale) for p in BENFORD_P.values()
    )


def test_rfm_quintile_balance_seeded_random(spark):
    """Each R/F/M score bucket holds an equal-depth share: per score
    digit, customer counts differ by at most 1 (the closed-form ntile
    quotient contract) on seeded-random order data."""
    import random

    from pasta_pipeline_spark.operators.rfm import rfm_segments

    rng = random.Random(8)
    n_cust = 101  # deliberately not divisible by 5
    rows = []
    base = datetime(2024, 1, 1)
    okey = 0
    for c in range(n_cust):
        for _ in range(rng.randint(1, 4)):
            okey += 1
            rows.append(
                (
                    okey,
                    c,
                    base + timedelta(days=rng.randint(0, 365)),
                    round(rng.uniform(10.0, 9000.0), 2),
                )
            )
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    segs = rfm_segments(orders).collect()
    assert sum(r["n_customers"] for r in segs) == n_cust
    for pos in range(3):  # R, F, M digit positions
        counts = {}
        for r in segs:
            d = r["segment"][pos]
            counts[d] = counts.get(d, 0) + r["n_customers"]
        assert sorted(counts) == ["1", "2", "3", "4", "5"]
        assert max(counts.values()) - min(counts.values()) <= 1


def test_seasonal_residuals_sum_to_zero_per_weekday(spark):
    """The seasonal index is the per-weekday mean deviation, so the
    residuals of each weekday sum to ~0 by construction: with resid_sc
    = floor(resid*100), the per-dow sum lies in [-n_dow, 1] for any
    dense daily series."""
    import random

    from pasta_pipeline_spark.operators.seasonal import (
        weekly_seasonal_decomposition,
    )

    rng = random.Random(88)
    base = datetime(2024, 3, 1)
    rows = []
    for d in range(42):  # 6 dense weeks
        day = base + timedelta(days=d)
        for _ in range(rng.randint(1, 3)):
            rows.append((day, round(rng.uniform(100.0, 5000.0), 2)))
    orders = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    out = weekly_seasonal_decomposition(orders).collect()
    sums, counts = {}, {}
    for r in out:
        if r["resid_sc"] is not None:
            sums[r["dow"]] = sums.get(r["dow"], 0) + r["resid_sc"]
            counts[r["dow"]] = counts.get(r["dow"], 0) + 1
    assert len(sums) == 7
    for dow, s in sums.items():
        assert -counts[dow] <= s <= 1, (dow, s, counts[dow])


# ---------------------------------------------------------------------------
# Causal/AB tier invariants (r8 verdict ask #6): seeded synthetic
# populations with KNOWN ground truth — zero-effect nulls, sign
# symmetry, algebraic variance bounds, CI shrink rates. Deterministic
# (hash-seeded values, the operators' own md5 arm assignment), so
# these can't encode a fixture's bug as the contract (NOTES #38).
# ---------------------------------------------------------------------------


def _hashu(i: int, salt: str) -> float:
    """Deterministic uniform in [0, 1) from (i, salt) — no RNG state."""
    import hashlib

    h = hashlib.md5(f"{salt}:{i}".encode()).digest()
    return int.from_bytes(h[:8], "big") / 2**64


def _causal_events(spark, n_users: int, effect: float, salt: str,
                   effect_arm: int = 1, events_per_user: int = 4):
    """Synthetic A/B panel: every user emits pre- and post-period
    events with iid-ish hash-noise values; ``effect`` is added to the
    POST values of users in ``effect_arm`` (the operators' own md5
    bucket), so the true DiD/diff equals ``effect`` exactly."""
    import datetime as dt

    from pasta_pipeline_spark.operators.sampling import sample_bucket
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(u,) for u in range(1, n_users + 1)], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id", sample_bucket(F.col("user_id"), 2).alias("arm")
        ).collect()
    }
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        for j in range(events_per_user):
            eid += 1
            pre_day, post_day = 2 + (j % 10), 20 + (j % 10)
            noise_pre = 50.0 + 20.0 * _hashu(eid, salt + ":pre")
            noise_post = 50.0 + 20.0 * _hashu(eid, salt + ":post")
            boost = effect if arms[u] == effect_arm else 0.0
            rows.append((eid, dt.datetime(2024, 1, pre_day, 12), u, noise_pre))
            rows.append((eid + 10**6, dt.datetime(2024, 1, post_day, 12), u, noise_post + boost))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_causal_zero_effect_null(spark):
    """Invariant 1: a zero-effect population reads as null — |z| small
    and the implied CI covers 0 — for DiD AND the delta-method ratio."""
    from pasta_pipeline_spark.operators.stat_tests import did_report, ratio_metric_delta

    df = _causal_events(spark, 120, effect=0.0, salt="null1")
    d = did_report(df).collect()[0]
    assert d["z_sc"] is not None
    assert abs(d["z_sc"]) < 4_000_000  # |z| < 4 under the null
    assert abs(d["did_sc"]) <= 4 * d["se_sc"] + 10_000  # CI covers 0
    r = ratio_metric_delta(df).collect()[0]
    assert abs(r["z_sc"]) < 4_000_000
    assert abs(r["diff_sc"]) <= 4 * r["se_sc"] + 10


def test_causal_arm_relabel_flips_sign(spark):
    """Invariant 2: planting the same effect in the OTHER arm flips the
    DiD estimate's sign (magnitude preserved within noise)."""
    from pasta_pipeline_spark.operators.stat_tests import did_report

    a = did_report(_causal_events(spark, 100, 30.0, "flip", effect_arm=1)).collect()[0]
    b = did_report(_causal_events(spark, 100, 30.0, "flip", effect_arm=0)).collect()[0]
    assert a["did_sc"] > 0 > b["did_sc"]
    # same noise, mirrored planting: magnitudes match within 20%
    assert abs(a["did_sc"] + b["did_sc"]) < 0.2 * abs(a["did_sc"])
    # and the planted effect (30.0 * scale 100 * sc 1e4 / 1e4...) is
    # recovered: did ~ 30.0 in value units = 3000 in floor(v*100) units
    assert 2000 * 10000 < a["did_sc"] < 4000 * 10000


def test_cuped_variance_ratio_at_most_one(spark):
    """Invariant 3: var(Y*)/var(Y) = 1 - rho^2 <= 1 BY CONSTRUCTION —
    holds for predictive, anti-predictive, and useless covariates."""
    import datetime as dt

    from pasta_pipeline_spark.operators.stat_tests import cuped_report

    for mode, salt in (("pos", "c1"), ("neg", "c2"), ("none", "c3")):
        rows = []
        eid = 0
        for u in range(1, 80):
            base = 100.0 * _hashu(u, salt)
            for d in (2, 5):  # pre period
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, d, 12), u, base + 5 * _hashu(eid, salt)))
            for d in (20, 25):  # post period
                eid += 1
                post = (
                    base if mode == "pos"
                    else (100.0 - base) if mode == "neg"
                    else 50.0 * _hashu(eid, salt + "x")
                )
                rows.append((eid, dt.datetime(2024, 1, d, 12), u, post + 5 * _hashu(eid, salt)))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        r = cuped_report(df).collect()[0]
        assert r["var_reduction_sc"] <= 1_000_000, mode
        assert r["var_reduction_sc"] >= 0, mode
        if mode in ("pos", "neg"):
            # a strongly (anti)correlated covariate must actually help
            assert r["var_reduction_sc"] < 500_000, mode


def test_bootstrap_ci_width_shrinks_sqrt_n(spark):
    """Invariant 4: the Poisson-bootstrap CI width shrinks ~1/sqrt(n):
    16x the rows -> ~4x narrower, asserted within [2, 8]."""
    from pasta_pipeline_spark.operators.bootstrap import poisson_bootstrap_mean_ci

    def width(n: int) -> int:
        df = spark.createDataFrame(
            [(i, 10.0 + 10.0 * _hashu(i, "bw")) for i in range(n)],
            "id long, value double",
        )
        row = poisson_bootstrap_mean_ci(df, "id", "value").collect()[0]
        assert row["ci_lo_sc"] <= row["mean_sc"] <= row["ci_hi_sc"] + 1
        return row["width_sc"]

    w_small, w_big = width(400), width(6400)
    assert w_big < w_small
    ratio = w_small / max(w_big, 1)
    assert 2.0 <= ratio <= 8.0, ratio


def test_bootstrap_ci_covers_true_mean(spark):
    """Invariant 5: the CI covers the KNOWN population mean of a
    symmetric synthetic (values 10..20, mean ~15)."""
    from pasta_pipeline_spark.operators.bootstrap import poisson_bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, 10.0 + 10.0 * _hashu(i, "cov")) for i in range(2000)],
        "id long, value double",
    )
    row = poisson_bootstrap_mean_ci(df, "id", "value").collect()[0]
    true_mean_sc = 15.0 * 100 * 10000  # value*scale(100) -> sc 1e4
    assert row["ci_lo_sc"] <= true_mean_sc <= row["ci_hi_sc"]


# ---------------------------------------------------------------------------
# Privacy-tier invariants (r9, extending the causal-tier pattern):
# algebraic identities and monotonicity that a fixture pin can't fake.
# ---------------------------------------------------------------------------


def test_k_anonymity_at_risk_monotone_in_k(spark):
    """The at-risk row mass is non-decreasing in k, zero at k=1, and
    the histogram conserves the total row count at every k."""
    from pasta_pipeline_spark.operators.governance import k_anonymity_report

    rows = [(i, i % 7, (i * 3) % 4) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, qa long, qb long")
    prev_at_risk = -1
    for k in (1, 2, 3, 5, 9, 50):
        rep = k_anonymity_report(df, ["qa", "qb"], k=k).collect()
        assert sum(r["n_rows"] for r in rep) == len(rows)  # conservation
        at_risk = sum(r["n_rows"] for r in rep if r["at_risk"])
        assert at_risk >= prev_at_risk
        prev_at_risk = at_risk
        if k == 1:
            assert at_risk == 0  # class_size >= 1 by construction


def test_randomized_response_debias_recovers_truth(spark):
    """Unbiasedness in aggregate: the debiased estimates sum to ~n and
    each group's estimate lands near its truth (the md5 mechanism is a
    deterministic 'sample' of the coin distribution, so error is small
    at n=3000, far under a no-debias gap), while the REPORTED counts
    are visibly flattened toward uniform."""
    from pasta_pipeline_spark.operators.governance import (
        randomized_response_counts,
    )

    # skewed truth: group g gets ~(g+1) mass share over 4 groups
    rows = []
    for i in range(3000):
        g = 0 if i % 10 < 1 else 1 if i % 10 < 3 else 2 if i % 10 < 6 else 3
        rows.append((i, g))
    df = spark.createDataFrame(rows, "id long, grp long")
    rep = {r["grp"]: r for r in randomized_response_counts(df, "id", "grp").collect()}
    n = len(rows)
    assert abs(sum(r["est_n"] for r in rep.values()) - n) <= len(rep) + 1
    for g, r in rep.items():
        assert r["abs_err"] <= 0.1 * n  # estimate tracks truth
        # reported counts shrink toward uniform: the biggest group
        # reports FEWER than truth, the smallest reports MORE
    assert rep[3]["reported_n"] < rep[3]["true_n"]
    assert rep[0]["reported_n"] > rep[0]["true_n"]


def test_l_diversity_invariants(spark):
    """Structural invariants of the diversity histogram: levels are
    bounded by the sensitive domain, the histogram conserves all rows,
    a level's rows can't be fewer than l_distinct per class, at_risk
    mass is non-increasing as data gets MORE diverse, and a
    homogeneous class (the attack the audit exists for) surfaces at
    l_distinct = 1."""
    from pasta_pipeline_spark.operators.governance import l_diversity_report

    rows = [(i, i % 5, (i * 7) % 3) for i in range(120)]
    # plant a homogeneous class: qi=9 always carries sens=0
    rows += [(1000 + i, 9, 0) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, qi long, sens long")
    rep = l_diversity_report(df, ["qi"], "sens", l=2).collect()
    assert sum(r["n_rows"] for r in rep) == len(rows)  # conservation
    for r in rep:
        assert 1 <= r["l_distinct"] <= 3  # |sensitive domain| = 3
        # every class at this level has >= l_distinct rows
        assert r["n_rows"] >= r["l_distinct"] * r["n_classes"]
        assert r["at_risk"] == (r["l_distinct"] < 2)
    by_l = {r["l_distinct"]: r for r in rep}
    assert by_l[1].at_risk and by_l[1]["n_rows"] >= 8  # the planted class


# ---------------------------------------------------------------------------
# A/B tier II + unigram trainer invariants (r9 verdict ask #7)
# ---------------------------------------------------------------------------


def _ab2_events(spark, n_users, shift=0.0, per_user=2, salt="p", strata=("x",)):
    """Seeded per-user events with a known md5 arm map; treated users'
    values shift by ``shift``; strata cycle deterministically."""
    import datetime as dt
    import hashlib

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    def u01(seed):
        return (
            int.from_bytes(hashlib.md5(seed.encode()).digest()[:8], "big") / 2**64
        )

    rows, eid = [], 0
    for u in range(1, n_users + 1):
        for j in range(per_user):
            eid += 1
            v = 40.0 + 20.0 * u01(f"{salt}:{eid}")
            if arm(u) == 1:
                v += shift
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 10 + j % 3, 8),
                    u,
                    strata[u % len(strata)],
                    v,
                )
            )
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    return spark.createDataFrame(rows, schema)


def test_srm_chi2_is_z_squared_identity(spark):
    """With two arms, the SRM chi-square equals the square of the
    normal z for the binomial split: chi2 = (n0-n1)²/n = z² where
    z = (n1 - n/2)/sqrt(n/4). The operator must satisfy the identity
    against its OWN reported counts (algebra a fixture can't fake),
    and a fair md5 split must not flag."""
    from pasta_pipeline_spark.operators.abtest2 import srm_check

    r = srm_check(_ab2_events(spark, 600)).collect()[0]
    n, n0, n1 = r["n_users"], r["n_ctrl"], r["n_treat"]
    assert n == n0 + n1 == 600
    z = (n1 - n / 2.0) / (n / 4.0) ** 0.5
    import math

    assert r["chi2_sc"] == math.floor(z * z * 1_000_000)
    assert not r["srm_flag"]


def test_srm_flags_designed_imbalance(spark):
    """The designed-split alternative: keep only arm-1 users plus a
    token arm-0 minority — the check must flag, and chi2 must place
    the planted imbalance far past the df=1 critical point."""
    import hashlib

    from pasta_pipeline_spark.operators.abtest2 import CHI2_CRIT_SC, srm_check

    ev = _ab2_events(spark, 800)

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    keep = [u for u in range(1, 801) if arm(u) == 0][:40] + [
        u for u in range(1, 801) if arm(u) == 1
    ]
    from pyspark.sql import functions as F

    r = srm_check(ev.where(F.col("user_id").isin(keep))).collect()[0]
    assert r["srm_flag"] and r["chi2_sc"] > 10 * CHI2_CRIT_SC
    assert r["n_ctrl"] == 40


def test_qte_monotone_on_stochastically_ordered_arms(spark):
    """A constant positive shift for the treated arm stochastically
    orders the two per-user distributions: every grid quantile of the
    treated arm must sit at or above control (qte_sc >= 0 pointwise),
    and each arm's quantile curve must be non-decreasing in p (the
    quantile function of ANY distribution is monotone)."""
    from pasta_pipeline_spark.operators.abtest2 import quantile_treatment_effect

    rows = quantile_treatment_effect(
        _ab2_events(spark, 500, shift=25.0)
    ).collect()
    assert len(rows) >= 3
    ps = [r["p_sc"] for r in rows]
    assert ps == sorted(ps)
    for r in rows:
        assert r["qte_sc"] >= 0
    qc = [r["q_ctrl_sc"] for r in rows]
    qt = [r["q_treat_sc"] for r in rows]
    assert qc == sorted(qc) and qt == sorted(qt)
    # the planted +25/event shift is +50 per user (2 events), i.e.
    # 50e6 at the q_sc scale (value·1e6); the median QTE must sit on
    # it within sampling noise (~250 users/arm)
    med = [r for r in rows if r["p_sc"] == 500_000]
    assert med and abs(med[0]["qte_sc"] - 50_000_000) <= 5_000_000


def test_post_stratified_equals_raw_when_single_stratum(spark):
    """With a single (homogeneous) stratum the post-stratified
    estimator degenerates to the plain difference of means: w_s = 1
    and the within-stratum diff IS the raw diff — diff_ps_sc must
    equal diff_raw_sc exactly (same double tree on both paths)."""
    from pasta_pipeline_spark.operators.abtest2 import post_stratified_effect

    r = post_stratified_effect(
        _ab2_events(spark, 400, shift=10.0), strata_col="event_type"
    ).collect()[0]
    assert r["n_strata"] == 1
    assert r["diff_ps_sc"] == r["diff_raw_sc"]
    assert r["se_ps_sc"] is not None and r["se_ps_sc"] > 0


def test_unigram_em_total_nll_non_increasing(spark):
    """Viterbi-EM's objective: each E-step segments under costs fit to
    the PREVIOUS segmentation, so the corpus-total best-path NLL is
    non-increasing across EM rounds (hard-EM monotonicity) while the
    vocabulary is held open; the final pruned row may only rise
    because pruning removes pieces. Piece totals must also never
    increase (a better model never needs more pieces under the same
    candidate set)."""
    from pasta_pipeline_spark.operators.unigram_lm import unigram_em_curve

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the cat ran"),
            (2, "a mat and a cat and a rat sat"),
            (3, "the rat ran on and on and the cat sat"),
            (4, "cats rats mats the cat the rat the mat"),
        ],
        "doc_id long, text string",
    )
    rows = unigram_em_curve(docs, rounds=3).orderBy("em_round").collect()
    assert len(rows) == 4  # 3 E-steps + the pruned final
    em = [r["total_nll_fp"] for r in rows[:3]]
    assert all(a >= b for a, b in zip(em, em[1:])), em
    pieces = [r["total_pieces"] for r in rows[:3]]
    assert all(a >= b for a, b in zip(pieces, pieces[1:])), pieces


def test_trimmed_mean_invariant_to_whale_magnitude(spark):
    """The defining robustness property of the trimmed mean: once a
    user is inside the trim, the ESTIMATE cannot depend on how extreme
    their value is — a 1e6 whale and a 1e9 whale yield bit-identical
    reports (a winsorized or plain mean would move)."""
    import datetime as dt
    import hashlib

    from pasta_pipeline_spark.operators.abtest2 import trimmed_mean_effect

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    whale = next(u for u in range(1, 500) if arm(u) == 1)

    def events(wv):
        rows = []
        for u in range(1, 301):
            v = 80.0 + (u % 5) if u != whale else wv
            rows.append((u, dt.datetime(2024, 1, 10, 12), u, "t", v))
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double",
        )

    a = trimmed_mean_effect(events(1_000_000.0)).collect()
    b = trimmed_mean_effect(events(1_000_000_000.0)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["tmean_treat_sc"] is not None


def test_rrf_fused_score_monotone_in_ranks(spark):
    """RRF's defining property: moving a document UP either input list
    can never lower its fused score, and the fused ordering depends
    only on ranks, never raw scores — verified by scaling every BM25
    input (same ranks, different scores) and asserting the identical
    fused output."""
    from pasta_pipeline_spark.operators.search import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark"),
            (2, "spark spark spark pad"),
            (3, "spark spark pad pad"),
            (4, "spark pad pad pad"),
        ],
        "doc_id long, text string",
    )
    # doubling every doc's text preserves tf ORDER (and dl ratios), so
    # lexical ranks are unchanged while raw BM25 scores move
    docs2 = docs.selectExpr("doc_id", "concat(text, ' ', text) AS text")
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.1]),
            (2, [0.9, 0.2]),
            (3, [0.8, 0.4]),
            (4, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<double>",
    )
    r1 = [tuple(r) for r in hybrid_rrf_topk(docs, emb, ["spark"], k=4).collect()]
    r2 = [tuple(r) for r in hybrid_rrf_topk(docs2, emb, ["spark"], k=4).collect()]
    assert r1 == r2
    # rank monotonicity: fused scores ordered the same as rank sums here
    by_id = {t[0]: t for t in r1}
    assert by_id[1][3] >= by_id[2][3] >= by_id[3][3] >= by_id[4][3]


def test_rrf_invariant_under_per_system_monotone_transforms(spark):
    """Stronger than the r10 scaling test: REPLACE each system's raw
    scores with entirely different values that preserve only the
    per-system ORDER — the lexical side by tf inflation, the semantic
    side by swapping the whole embedding set for one at different
    angles with the same cosine ranking. RRF (ranks only) must emit
    the bit-identical fused table."""
    import math

    from pasta_pipeline_spark.operators.search import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark spark"),
            (2, "spark spark spark spark pad"),
            (3, "spark spark spark pad pad"),
            (4, "spark spark pad pad pad"),
            (5, "spark pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    docs_t = docs.selectExpr(
        "doc_id", "concat(text, ' ', text, ' ', text) AS text"
    )

    def emb_at(angles):
        rows = [
            (i + 1, [math.cos(a), math.sin(a)]) for i, a in enumerate(angles)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # query = lowest-id vector (angle 0); both sets rank 1<2<3<4<5 by
    # cosine but with very different similarity VALUES
    emb_a = emb_at([0.0, 0.2, 0.4, 0.6, 0.8])
    emb_b = emb_at([0.0, 0.9, 1.0, 1.1, 1.2])
    r_a = [tuple(r) for r in hybrid_rrf_topk(docs, emb_a, ["spark"], k=5).collect()]
    r_b = [tuple(r) for r in hybrid_rrf_topk(docs_t, emb_b, ["spark"], k=5).collect()]
    assert r_a == r_b
    assert len(r_a) == 5


def test_rank_agreement_tau_extremes(spark):
    """Kendall's tau pins: identical lexical and semantic rankings
    give tau_sc == +1e6 exactly; a fully reversed semantic ranking
    gives -1e6 exactly (integer arithmetic, no tie correction needed —
    ranks are distinct)."""
    import math

    from pasta_pipeline_spark.operators.search import retrieval_rank_agreement

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark spark"),
            (2, "spark spark spark spark pad"),
            (3, "spark spark spark pad pad"),
            (4, "spark spark pad pad pad"),
            (5, "spark pad pad pad pad"),
        ],
        "doc_id long, text string",
    )

    def emb_at(angles):
        rows = [
            (i + 1, [math.cos(a), math.sin(a)]) for i, a in enumerate(angles)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    same = retrieval_rank_agreement(
        docs, emb_at([0.0, 0.2, 0.4, 0.6, 0.8]), ["spark"]
    ).collect()[0]
    assert same["n_common"] == 5
    assert same["concordant"] == 10 and same["discordant"] == 0
    assert same["tau_sc"] == 1_000_000
    # reversed semantic order: query is still vec 1 (rank 1 in sem by
    # self-similarity), so reverse only the OTHER four
    rev = retrieval_rank_agreement(
        docs, emb_at([0.0, 0.8, 0.6, 0.4, 0.2]), ["spark"]
    ).collect()[0]
    # doc 1 agrees with everything (top of both); docs 2-5 fully
    # reversed: C = 4, D = 6, tau = (4-6)/10 = -0.2 exactly
    assert rev["concordant"] == 4 and rev["discordant"] == 6
    assert rev["tau_sc"] == -200_000
    # fully reversed COMMON set: flip the lexical side too by querying
    # a term whose tf order is the mirror of the semantic order
    docs_rev = spark.createDataFrame(
        [
            (1, "spark pad pad pad pad"),
            (2, "spark spark pad pad pad"),
            (3, "spark spark spark pad pad"),
            (4, "spark spark spark spark pad"),
            (5, "spark spark spark spark spark"),
        ],
        "doc_id long, text string",
    )
    full_rev = retrieval_rank_agreement(
        docs_rev, emb_at([0.0, 0.2, 0.4, 0.6, 0.8]), ["spark"]
    ).collect()[0]
    assert full_rev["tau_sc"] == -1_000_000
    assert full_rev["concordant"] == 0 and full_rev["discordant"] == 10


def test_group_sequential_never_crosses_designed_null(spark):
    """On a designed null (both arms draw from the same per-user value
    law), no O'Brien-Fleming look may cross — the alpha-spending
    guarantee the operator exists for. The fixture is deterministic
    (md5 arms over a u%7 value lattice), so this pins behavior; the z
    at the final look is asserted nonzero so the null is non-trivial
    (sampling noise present, just bounded)."""
    import datetime as dt

    from pasta_pipeline_spark.operators.abtest2 import group_sequential_check

    rows = []
    eid = 0
    for day in range(1, 9):
        for u in range(1, 201):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, day, 12),
                    u,
                    "m",
                    50.0 + ((u * 3 + day) % 7),
                )
            )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    out = group_sequential_check(events).collect()
    assert len(out) == 4
    assert all(not r["crossed"] for r in out)
    # OBF shape: boundaries strictly decrease toward ~2.024 at the end
    bnds = [r["boundary_sc"] for r in out]
    assert bnds == sorted(bnds, reverse=True)
    assert bnds[-1] == 2_024_000
    assert out[-1]["z_sc"] is not None and out[-1]["z_sc"] != 0


def test_minhash_gate_recall_vs_broder_bound(spark):
    """Measured-recall audit for the MinHash-LSH gate (r11 verdict ask
    #4): the banded gate's recall against brute-force exact Jaccard,
    with the SAME (num_hashes, bands, n) config the catalog registers
    (64 hashes / 16 bands / 3-gram shingles, threshold 0.5).

    A full-hash DuckDB oracle is blocked (no xxhash64 there — NOTES
    #68), so the contract is pinned HERE instead: since
    minhash_lsh_pairs exact-verifies its candidates (no false
    positives), recall = |gate| / |truth| directly. The banded
    collision probability for a pair with Jaccard s is
    1 - (1 - s^r)^b (Broder; r = hashes/bands = 4, b = 16), so the
    EXPECTED recall over the fixture's true pairs is the mean of the
    per-pair bounds; the deterministic xxhash64 family is one draw
    from that ensemble, so assert measured >= mean_bound - 0.15
    (measured at sf0.01: recall 1.0 vs mean bound ~0.97 — the
    fixture's true pairs sit far above the 0.5 threshold)."""
    from pasta_pipeline_spark.operators.text_dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert truth, "fixture has no true pairs at threshold 0.5"
    gate = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    # the exact verify admits no false positives
    assert gate <= set(truth)
    measured = len(gate) / len(truth)
    r, b = 64 // 16, 16
    mean_bound = sum(
        1.0 - (1.0 - s**r) ** b for s in truth.values()
    ) / len(truth)
    assert measured >= mean_bound - 0.15, (
        f"minhash gate recall {measured:.3f} fell more than 0.15 below "
        f"the Broder bound {mean_bound:.3f} for this config"
    )
