"""Wave-15 operator unit tests: l-diversity, randomized response,
term burstiness."""

from __future__ import annotations


def test_l_diversity_homogeneous_class_flagged(spark):
    from pasta_pipeline_spark.operators.governance import l_diversity_report

    # class (1,'A'): 3 rows, 1 distinct sensitive -> at risk at l=2
    # class (2,'B'): 3 rows, 3 distinct sensitive -> safe
    rows = [
        (1, "A", 10),
        (1, "A", 10),
        (1, "A", 10),
        (2, "B", 1),
        (2, "B", 2),
        (2, "B", 3),
    ]
    df = spark.createDataFrame(rows, "qi1 long, qi2 string, sens long")
    got = {
        r["l_distinct"]: r
        for r in l_diversity_report(df, ["qi1", "qi2"], "sens", l=2).collect()
    }
    assert got[1]["at_risk"] and got[1]["n_classes"] == 1 and got[1]["n_rows"] == 3
    assert not got[3]["at_risk"] and got[3]["n_rows"] == 3
    assert got[1]["row_share_sc"] == 500000


def test_randomized_response_mass_conservation(spark):
    from pasta_pipeline_spark.operators.governance import (
        randomized_response_counts,
    )

    rows = [(i, "t%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id long, grp string")
    out = randomized_response_counts(df, "event_id", "grp").collect()
    # every group keeps its row; reported mass == true mass == n
    assert len(out) == 3
    assert sum(r["reported_n"] for r in out) == 300
    assert sum(r["true_n"] for r in out) == 300
    # debias is exact on expectation-level identities: the estimates
    # sum to ~n (floor error only: within k rows)
    est_sum = sum(r["est_n"] for r in out)
    assert abs(est_sum - 300) <= 3
    # determinism: rerun is bit-identical
    again = randomized_response_counts(df, "event_id", "grp").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_randomized_response_debias_reduces_error(spark):
    from pasta_pipeline_spark.operators.governance import (
        randomized_response_counts,
    )

    # heavily skewed truth: debiased estimate must sit closer to the
    # truth than the raw noisy count for the dominant group
    rows = [(i, "big" if i < 900 else "small%d" % (i % 2)) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, grp string")
    out = {r["grp"]: r for r in randomized_response_counts(df, "event_id", "grp").collect()}
    big = out["big"]
    raw_err = abs(big["reported_n"] - big["true_n"])
    assert big["abs_err"] <= raw_err


def test_term_burstiness_bursty_vs_uniform(spark):
    from pasta_pipeline_spark.operators.text_analysis import term_burstiness

    # 'the' once in every doc (D = variance 0 -> 0); 'x' five times in
    # one doc of four (bursty: D > 1)
    rows = [
        (1, "the x x x x x"),
        (2, "the"),
        (3, "the"),
        (4, "the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in term_burstiness(df, top_k=10).collect()}
    the = got["the"]
    assert the["cf"] == 4 and the["df"] == 4
    assert the["dispersion_sc"] == 0  # constant count, zero variance
    x = got["x"]
    assert x["cf"] == 5 and x["df"] == 1
    # zeros included: mean 5/4, var = (4*25-25)/16 -> D = 75/20 = 3.75
    assert x["mean_sc"] == 1250000
    assert x["dispersion_sc"] == 3750000


def test_term_burstiness_topk_tiebreak(spark):
    from pasta_pipeline_spark.operators.text_analysis import term_burstiness

    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    out = term_burstiness(df, top_k=3).collect()
    # equal cf -> alphabetic tiebreak, deterministic
    assert [r["term"] for r in out] == ["a", "b", "c"]
