"""Edge-case pytests for the wave-9 operators (association mining,
inferential stats, readability, denoising examples, survivorship,
attribution, RFM). The oracle gate pins the happy path at sf0.01;
these pin boundaries and invariants the synthetic corpus never hits."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_basket_lift_values(spark):
    from pasta_pipeline_spark.operators.basket import basket_pair_lift

    # baskets: {A,B} x2, {A,C}, {B,C}; N=4, c(A)=3, c(B)=3, c(C)=2
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"), (4, "C"),
        (4, "C"),  # duplicate membership must not double-count
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pair_lift(df, "basket", "item", min_pair_count=1).collect()
    }
    ab = got[("A", "B")]
    assert ab["pair_count"] == 2 and ab["count_a"] == 3 and ab["count_b"] == 3
    # lift = 4*2/(3*3) = 0.888... -> floor 1e6 = 888888
    assert ab["lift_sc"] == 888888
    ac = got[("A", "C")]
    assert ac["pair_count"] == 1 and ac["lift_sc"] == 666666  # 4/(3*2)
    # min_pair_count=2 drops the singleton pairs
    kept = basket_pair_lift(df, "basket", "item", min_pair_count=2).collect()
    assert [(r["item_a"], r["item_b"]) for r in kept] == [("A", "B")]


def test_mann_whitney_no_ties_matches_textbook(spark):
    from pasta_pipeline_spark.operators.stat_tests import mann_whitney_u

    # group1 = {1,2,3}, group2 = {4,5}: U1 = 0 (every g1 < every g2)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")],
        "v long, g string",
    )
    row = mann_whitney_u(
        df, "v", F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert row["n1"] == 3 and row["n2"] == 2
    assert row["u1_x2"] == 0  # R1 = 1+2+3 = 6 = n1(n1+1)/2
    # z = (0 - 3)/sqrt(3*2*6/12) = -3/sqrt(3) = -1.7320508...
    assert row["z_sc"] == -1732051  # floor of a negative rounds down


def test_mann_whitney_all_tied(spark):
    from pasta_pipeline_spark.operators.stat_tests import mann_whitney_u

    # every observation identical: U1 = n1*n2/2 exactly, sigma = 0 -> z NULL/overflow guarded by floor(nan)?
    df = spark.createDataFrame(
        [(7, "a"), (7, "a"), (7, "b"), (7, "b")], "v long, g string"
    )
    row = mann_whitney_u(
        df, "v", F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    # 2*U1 = 2*(n1*n2/2) = 4
    assert row["u1_x2"] == 4
    # sigma^2 = 0 -> z undefined; Spark floor(NaN/inf) yields NULL
    assert row["z_sc"] is None


def test_benford_uniform_detects_deviation(spark):
    from pasta_pipeline_spark.operators.stat_tests import benford_digit_test

    # all amounts share first digit 9 -> massive chi-square; the 1..9
    # digit spine keeps every digit in the frame so the eight unseen
    # digits contribute their full expected mass n·p_d
    df = spark.createDataFrame([(900.0 + i,) for i in range(30)], "amt double")
    rows = {r["digit"]: r for r in benford_digit_test(df, "amt").collect()}
    assert sorted(rows) == list(range(1, 10))
    assert rows[9]["observed"] == 30
    assert all(rows[d]["observed"] == 0 for d in range(1, 9))
    # unseen digit d contributes (0 - n·p_d)²/(n·p_d) = n·p_d exactly
    assert all(
        rows[d]["contrib_sc"] == rows[d]["expected_sc"] for d in range(1, 9)
    )
    # chi2 = sum of all nine contributions, identical on every row
    total = sum(rows[d]["contrib_sc"] for d in range(1, 10))
    assert all(rows[d]["chi2_sc"] == total for d in range(1, 10))
    assert rows[9]["chi2_sc"] > 500_000_000
    # amounts < 1 are excluded from the screen
    tiny = spark.createDataFrame([(0.5,), (1.0,)], "amt double")
    got = {r["digit"]: r for r in benford_digit_test(tiny, "amt").collect()}
    assert len(got) == 9 and got[1]["observed"] == 1
    assert sum(r["observed"] for r in got.values()) == 1


def test_dow_seasonality_counts(spark):
    from pasta_pipeline_spark.operators.stat_tests import dow_seasonality

    df = spark.createDataFrame(
        [
            ("2024-01-07", 1.0),  # Sunday -> dow 1
            ("2024-01-08", 2.0),  # Monday -> dow 2
            ("2024-01-08", 3.0),
        ],
        "d string, amt double",
    ).select(F.col("d").cast("timestamp").alias("ts"), "amt")
    got = {r["dow"]: r for r in dow_seasonality(df, "ts", "amt").collect()}
    assert got[1]["n_rows"] == 1 and got[1]["amount_cents"] == 100
    assert got[2]["n_rows"] == 2 and got[2]["amount_cents"] == 500
    assert got[1]["chi2_sc"] == got[2]["chi2_sc"]  # total repeated per row


def test_corr_matrix_perfect_and_anti(spark):
    from pasta_pipeline_spark.operators.stat_tests import pearson_corr_matrix

    df = spark.createDataFrame(
        [(1, 2, 5), (2, 4, 4), (3, 6, 3), (4, 8, 2)], "x long, y long, z long"
    )
    row = pearson_corr_matrix(
        df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}
    ).collect()[0]
    assert row["n"] == 4
    assert row["corr_x_y_sc"] == 1_000_000  # y = 2x exactly
    assert row["corr_x_z_sc"] == -1_000_000  # z = 6 - x
    assert row["corr_y_z_sc"] == -1_000_000


def test_flesch_monotone_in_sentence_length(spark):
    from pasta_pipeline_spark.operators.readability import flesch_by_lang

    short = "The cat sat. The dog ran. It is fun."
    long_ = (
        "Notwithstanding considerable interdisciplinary deliberation "
        "concerning multidimensional organizational heterogeneity "
        "practitioners nevertheless demonstrate unconscionable "
        "recalcitrance regarding infrastructural modernization."
    )
    df = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "xx")], "doc_id long, text string, lang string"
    )
    got = {r["lang"]: r for r in flesch_by_lang(df).collect()}
    assert got["en"]["avg_flesch_sc"] > got["xx"]["avg_flesch_sc"]
    assert got["en"]["n_easy"] == 1 and got["xx"]["n_hard"] == 1
    # whitespace-only doc contributes no row
    empty = spark.createDataFrame([(3, "   ", "yy")], "doc_id long, text string, lang string")
    assert flesch_by_lang(empty).collect() == []


def test_span_corruption_structure(spark):
    from pasta_pipeline_spark.operators.denoising import span_corruption_examples

    text = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame([(1, text), (2, "solo")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_corruption_examples(df, noise_pct=30).collect()}
    r1 = got[1]
    assert r1["n_tokens"] == 40
    assert 0 < r1["n_masked"] < 40
    assert r1["n_spans"] >= 1
    # masked tokens appear in the target, not the input
    in_toks = r1["input_text"].split(" ")
    tg_toks = r1["target_text"].split(" ")
    originals = set(f"tok{i}" for i in range(40))
    masked = [t for t in tg_toks if t in originals]
    assert len(masked) == r1["n_masked"]
    assert set(masked).isdisjoint(in_toks)
    # every original token survives exactly once across input+target
    assert sorted(masked + [t for t in in_toks if t in originals]) == sorted(originals)
    # sentinels pair up: input and target share <extra_id_k> for each span
    for k in range(r1["n_spans"]):
        assert f"<extra_id_{k}>" in in_toks
        assert f"<extra_id_{k}>" in tg_toks
    # reconstruction: replacing input sentinels by target spans restores the text
    spans = {}
    cur = None
    for t in tg_toks:
        if t.startswith("<extra_id_"):
            cur = t
            spans[cur] = []
        elif cur is not None:
            spans[cur].append(t)
    rebuilt = []
    for t in in_toks:
        rebuilt.extend(spans[t] if t in spans else [t])
    assert rebuilt == text.split(" ")
    # an unmasked doc keeps an empty target
    if got[2]["n_masked"] == 0:
        assert got[2]["target_text"] == "" and got[2]["input_text"] == "solo"


def test_span_corruption_deterministic(spark):
    from pasta_pipeline_spark.operators.denoising import span_corruption_examples

    df = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    a = span_corruption_examples(df).collect()
    b = span_corruption_examples(df.repartition(4)).collect()
    assert a == b  # mask choice is a pure function of (doc_id, pos)


def test_golden_records_mode_election(spark):
    from pasta_pipeline_spark.operators.golden import golden_part_records

    parts = spark.createDataFrame(
        [
            (1, "red widget", "B1", 10, 100.0),
            (2, "red widget", "B1", 10, 101.0),
            (3, "red widget", "B2", 11, 102.0),
            (9, "lone bolt", "B9", 5, 50.0),
        ],
        "p_partkey long, p_name string, p_brand string, "
        "p_size int, p_retailprice double",
    ).withColumn("p_type", F.lit("T"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "a_key long, b_key long"
    )
    got = golden_part_records(parts, pairs=pairs).collect()
    assert len(got) == 1  # singleton cluster {9} excluded
    r = got[0]
    assert r["cluster_id"] == 1 and r["n_members"] == 3
    assert r["member_keys"] == [1, 2, 3]
    assert r["golden_brand"] == "B1"  # 2 votes beat 1
    assert r["price_cents_min"] == 10000 and r["price_cents_max"] == 10200


def test_golden_records_tie_breaks_to_min(spark):
    from pasta_pipeline_spark.operators.golden import golden_part_records

    parts = spark.createDataFrame(
        [
            (1, "x y", "B2", 1, 1.0),
            (2, "x y", "B1", 1, 1.0),
        ],
        "p_partkey long, p_name string, p_brand string, "
        "p_size int, p_retailprice double",
    ).withColumn("p_type", F.lit("T"))
    pairs = spark.createDataFrame([(1, 2)], "a_key long, b_key long")
    r = golden_part_records(parts, pairs=pairs).collect()[0]
    assert r["golden_brand"] == "B1"  # 1-1 tie -> smallest value


def test_last_touch_attribution_buckets(spark):
    from pasta_pipeline_spark.operators.attribution import last_touch_attribution

    orders = spark.createDataFrame(
        [
            (1, "2024-01-10", 10.0),
            (1, "2024-01-20", 20.0),
            (2, "2024-01-05", 40.0),  # before any touch -> (none)
        ],
        "o_custkey long, d string, o_totalprice double",
    ).select("o_custkey", F.col("d").cast("timestamp").alias("o_orderdate"), "o_totalprice")
    events = spark.createDataFrame(
        [
            (1, "2024-01-09", "email"),
            (1, "2024-01-15", "ad"),
            (2, "2024-02-01", "ad"),
        ],
        "user_id long, d string, event_type string",
    ).select("user_id", F.col("d").cast("timestamp").alias("ts"), "event_type")
    got = {r["touch_type"]: r for r in last_touch_attribution(orders, events).collect()}
    assert got["email"]["n_orders"] == 1 and got["email"]["revenue_cents"] == 1000
    assert got["ad"]["n_orders"] == 1 and got["ad"]["revenue_cents"] == 2000
    assert got["(none)"]["revenue_cents"] == 4000
    # shares sum to ~1e6
    assert sum(r["revenue_share_sc"] for r in got.values()) in (999999, 1000000, 1000001)


def test_rfm_quintiles_match_ntile(spark):
    """The closed-form tile over distributed ranks must equal ntile(5)
    for a non-divisible n (n=7: tiles of 2,2,1,1,1)."""
    from pasta_pipeline_spark.operators.rfm import rfm_segments
    from pasta_pipeline_spark.operators.util import release_cached_deps

    rows = []
    for ck in range(1, 8):
        # customer ck: ck orders of 10*ck each, last on day ck
        for i in range(ck):
            rows.append((ck, f"2024-01-{ck:02d}", 10.0 * ck))
    orders = spark.createDataFrame(
        rows, "o_custkey long, d string, o_totalprice double"
    ).select("o_custkey", F.col("d").cast("timestamp").alias("o_orderdate"), "o_totalprice")
    out = rfm_segments(orders)
    got = {r["segment"]: r for r in out.collect()}
    release_cached_deps(out)
    # frequency and monetary rank identically (both increase with ck);
    # recency score also increases with ck (later last-order = more
    # recent). n=7 -> ranks 1,2 => tile1 ... rank 7 => tile5.
    # customer 7: rank 7 everywhere -> tile 5 -> segment "555"
    assert got["555"]["n_customers"] == 1
    assert got["555"]["monetary_cents_sum"] == 7 * 7 * 1000
    # customer 1: rank 1 -> tile 1 -> recency invert gives r=6-1=5? no:
    # recency_days largest -> rank ... day 1 is OLDEST -> recency_days
    # max -> rank 7 of recency_days ascending? recency_days = ref-day1 =
    # largest -> rank 7 -> tile 5 -> score 6-5=1 -> "111"
    assert got["111"]["n_customers"] == 1
    assert got["111"]["monetary_cents_sum"] == 1000
    # 7 customers, every score dimension spreads 1..5 with tile sizes 2,2,1,1,1
    assert sum(r["n_customers"] for r in got.values()) == 7


def test_blocked_components_equals_iterative_fixpoint(spark):
    """linkage.blocked_components (per-block union-find, one shuffle)
    must produce the exact label set of the iterative min-label
    fixpoint on the same block-confined linkage graph — including on
    CHAINED components (the shape that forced the fixpoint to
    O(diameter) rounds and motivated the r10 replacement)."""
    from pasta_pipeline_spark.operators.linkage import (
        blocked_components,
        part_linkage_pairs,
    )
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters
    from pasta_pipeline_spark.schemas import load_table
    from pyspark.sql import functions as F

    parts = load_table(spark, "/root/testdata/sf0.01", "part")
    pairs = part_linkage_pairs(parts, with_block=True).persist()
    new = blocked_components(pairs, ["blk_noun", "blk_brand"]).collect()
    old = duplicate_clusters(
        parts.select("p_partkey"),
        pairs.select(F.col("a_key").alias("doc_a"), F.col("b_key").alias("doc_b")),
        id_col="p_partkey",
        doubling=True,
        checkpoint_every=2,
    ).collect()
    pairs.unpersist()
    new_map = {r["node"]: r["cluster_id"] for r in new}
    # duplicate_clusters also labels edge-free singletons; restrict to
    # edge-touched nodes (blocked_components' contract)
    old_map = {
        r["p_partkey"]: r["cluster_id"] for r in old if r["p_partkey"] in new_map
    }
    assert new_map == old_map
    # chained synthetic block: a-b, b-c, c-d in ONE block must collapse
    # to min label even though no direct a-d pair exists
    edges = spark.createDataFrame(
        [("blk", "B", 1, 2), ("blk", "B", 2, 3), ("blk", "B", 3, 4)],
        "blk_noun string, blk_brand string, a_key long, b_key long",
    )
    chain = blocked_components(edges, ["blk_noun", "blk_brand"]).collect()
    assert {r["node"]: r["cluster_id"] for r in chain} == {1: 1, 2: 1, 3: 1, 4: 1}
