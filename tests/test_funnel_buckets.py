"""Curation funnel + CCNet perplexity buckets (round 6) — unit checks
on crafted fixtures; the oracle layer pins both against DuckDB at
sf0.01 (catalog: curation_funnel, perplexity_buckets)."""

from __future__ import annotations


class TestCurationFunnel:
    def test_counts_telescope_and_dedup_drops(self, spark):
        # 3 identical good docs (dedup keeps 1), 1 empty, 1 too-short
        good = (
            "the quick brown fox jumps with many fine words and then "
            "some more of the usual text so that every gopher rule is "
            "satisfied here. " * 8
        )
        rows = [(1, good), (2, good), (3, good), (4, ""), (5, "tiny doc")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from pasta_pipeline_spark.operators.quality_filters import curation_funnel

        out = {r["stage"]: r for r in curation_funnel(df).collect()}
        assert out["non_empty"]["n_in"] == 5
        assert out["non_empty"]["n_out"] == 4  # empty doc dies
        # telescoping: each stage's n_in is the previous n_out
        chain = ["non_empty", "word_count", "gopher_all", "dedup_survivor"]
        for a, b in zip(chain, chain[1:]):
            assert out[b]["n_in"] == out[a]["n_out"]
        assert out["word_count"]["n_out"] == 3  # tiny doc dies
        assert out["dedup_survivor"]["n_out"] == 1  # two clones die
        for r in out.values():
            assert r["n_dropped"] == r["n_in"] - r["n_out"]


class TestPerplexityBuckets:
    def test_thirds_per_language_and_ordering(self, spark):
        # 9 docs in one lang: rare-token docs must land in 'tail'
        rows = [(i, "common words here", "en") for i in range(6)]
        rows += [(10 + i, f"rare{i} unique{i} token{i}", "en") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        from pasta_pipeline_spark.operators.text_analysis import perplexity_buckets

        out = perplexity_buckets(df).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r["bucket"], []).append(r)
        assert {len(v) for v in by_bucket.values()} == {3}
        # every tail doc scores >= every head doc
        assert min(r["nll_fp"] for r in by_bucket["tail"]) >= max(
            r["nll_fp"] for r in by_bucket["head"]
        )
        # the three rare-token docs are exactly the tail
        assert {r["doc_id"] for r in by_bucket["tail"]} == {10, 11, 12}


class TestCusumDrift:
    def test_closed_form_equals_textbook_recurrence(self, spark):
        # volumes: flat 10/day, then a sustained +5 drift from day 6
        xs = [10, 11, 9, 10, 10, 10, 15, 16, 15, 14, 16, 15]
        rows = [
            (d * 1000 + i, d, "ingest")
            for d, x in enumerate(xs)
            for i in range(x)
        ]
        df = spark.createDataFrame(rows, "id long, day long, grp string")
        import pyspark.sql.functions as F

        from pasta_pipeline_spark.operators.anomaly import cusum_drift

        out = cusum_drift(
            df.withColumn("one", F.lit(1)), "day", "one", ["grp"]
        ).collect()[0]

        # textbook recurrence in fixed point with the same mean allowance
        fp = 10_000
        k = sum(xs) * fp // len(xs)
        s_val, s_max, argmax = 0, 0, None
        for d, x in enumerate(xs):
            s_val = max(0, s_val + x * fp - k)
            if s_val > s_max:
                s_max, argmax = s_val, d
        assert out["s_max_fp"] == s_max
        assert out["bucket_at_max"] == argmax
        assert out["n_buckets"] == len(xs)
        # the drift is detected inside the drifted regime
        assert out["bucket_at_max"] >= 6

    def test_flat_series_scores_near_zero(self, spark):
        import pyspark.sql.functions as F

        from pasta_pipeline_spark.operators.anomaly import cusum_drift

        rows = [(d * 100 + i, d, "g") for d in range(10) for i in range(7)]
        df = spark.createDataFrame(rows, "id long, day long, grp string")
        out = cusum_drift(
            df.withColumn("one", F.lit(1)), "day", "one", ["grp"]
        ).collect()[0]
        assert out["s_max_fp"] == 0


def test_incremental_funnel_retry_and_batch_equivalence(spark, tmp_table_dir):
    """Micro-batched funnel state (id-ordered waves, every batch
    applied TWICE with the same mb id) must equal the batch
    curation_funnel on the union — including cross-batch duplicate
    texts, which only the seen-hash state can catch."""
    import pyspark.sql.functions as F  # noqa: F401

    from pasta_pipeline_spark.operators.quality_filters import curation_funnel
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        apply_funnel_batch,
        funnel_from_state,
    )

    good = (
        "the quick brown fox jumps with many fine words and then some "
        "more of the usual text so that every gopher rule is satisfied "
        "here in this doc. " * 8
    )
    rows = [
        (1, good), (2, good), (3, "tiny"),
        (4, good + "v2 "), (5, ""), (6, good),          # 6 dups wave-1's text
        (7, good + "v2 "), (8, None), (9, good + "v3 "),
    ]
    schema = "doc_id long, text string"
    expected = {
        tuple(r)
        for r in curation_funnel(spark.createDataFrame(rows, schema)).collect()
    }

    counts = TableStore(spark, f"{tmp_table_dir}/funnel_counts")
    seen = TableStore(spark, f"{tmp_table_dir}/funnel_seen")
    marker = f"{tmp_table_dir}/funnel_mb.json"
    waves = [rows[:3], rows[3:6], rows[6:]]
    for mb_id, wave in enumerate(waves):
        batch = spark.createDataFrame(wave, schema)
        apply_funnel_batch(batch, mb_id, counts, seen, marker)
        # simulated intra-batch retry
        apply_funnel_batch(batch, mb_id, counts, seen, marker)

    got = {tuple(r) for r in funnel_from_state(counts).collect()}
    assert got == expected


def test_incremental_funnel_sink_e2e_stream(spark, tmp_path):
    """Real writeStream e2e for the streaming curation funnel: micro-
    batched file drain == batch report (files ordered so survivorship
    matches the batch min-id contract)."""
    import pyspark.sql.functions as F  # noqa: F401

    from pasta_pipeline_spark.operators.quality_filters import curation_funnel
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        funnel_from_state,
        incremental_funnel_sink,
    )

    good = (
        "the quick brown fox jumps with many fine words and then some "
        "more of the usual text so that every gopher rule is satisfied "
        "here in this doc. " * 8
    )
    rows = [(1, good), (2, good), (3, ""), (4, good + "x "), (5, good)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path / "funnel_src"
    src.mkdir()
    # one file = one micro-batch; single file keeps arrival == id order
    df.coalesce(1).write.parquet(str(src), mode="overwrite")

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    counts = TableStore(spark, str(tmp_path / "f_counts"))
    seen = TableStore(spark, str(tmp_path / "f_seen"))
    q = incremental_funnel_sink(
        stream, counts, seen, str(tmp_path / "f_ckpt")
    )
    q.awaitTermination(120)

    expected = {tuple(r) for r in curation_funnel(df).collect()}
    got = {tuple(r) for r in funnel_from_state(counts).collect()}
    assert got == expected
