"""DSIR importance selection + greedy no-split packing (round 6).

The oracle-differential layer already pins both against DuckDB at
sf0.01 (catalog: dsir_selection, greedy_pack); these are the unit /
property checks on crafted fixtures — ranking sanity for DSIR, the
packing invariants the recursive oracle can't state as assertions.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestDsir:
    def test_target_like_docs_rank_first(self, spark):
        # target slice speaks "alpha beta"; raw noise speaks "zz0.."
        rows = [(i, "alpha beta alpha beta", "tgt") for i in range(4)]
        rows += [(10 + i, f"zz{i} yy{i} xx{i} ww{i}", "raw") for i in range(6)]
        rows += [(50, "alpha beta alpha alpha", "raw")]  # target-like raw doc
        from pasta_pipeline_spark.operators.dsir import dsir_select

        out = dsir_select(
            _docs(spark, rows), F.col("source") == "tgt", k=5
        ).collect()
        assert [r["rk"] for r in out] == [1, 2, 3, 4, 5]
        # the four target docs and the target-like raw doc beat every
        # noise doc; doc 50 ranks below the exact-target texts
        assert {r["doc_id"] for r in out} == {0, 1, 2, 3, 50}
        assert out[-1]["doc_id"] == 50

    def test_weights_deterministic_and_total(self, spark):
        from pasta_pipeline_spark.operators.dsir import dsir_weights

        rows = [(i, "a b c d", "tgt" if i % 2 else "raw") for i in range(8)]
        df = _docs(spark, rows)
        w1 = {r["doc_id"]: r["weight_fp"] for r in dsir_weights(df, F.col("source") == "tgt").collect()}
        w2 = {r["doc_id"]: r["weight_fp"] for r in dsir_weights(df, F.col("source") == "tgt").collect()}
        assert w1 == w2 and len(w1) == 8
        # identical text ⇒ identical weight regardless of slice membership
        assert len(set(w1.values())) == 1

    def test_empty_and_null_docs_excluded(self, spark):
        from pasta_pipeline_spark.operators.dsir import dsir_weights

        rows = [(1, "a b", "tgt"), (2, "", "raw"), (3, None, "raw"), (4, "  ", "raw")]
        out = dsir_weights(_docs(spark, rows), F.col("source") == "tgt").collect()
        assert {r["doc_id"] for r in out} == {1}


class TestGreedyPack:
    def _pack(self, spark, sizes, budget, group="s0"):
        from pasta_pipeline_spark.operators.sampling import greedy_pack

        df = spark.createDataFrame(
            [(i, n, group) for i, n in enumerate(sizes)],
            "doc_id long, n long, source string",
        )
        rows = greedy_pack(df, "doc_id", "n", budget=budget, group_col="source")
        return sorted(rows.collect(), key=lambda r: r["doc_id"])

    def test_next_fit_reference_loop(self, spark):
        sizes = [100, 100, 60, 300, 5, 256, 1]
        out = self._pack(spark, sizes, budget=256)
        # reference loop
        pack = fill = 0
        exp = []
        for n in sizes:
            if fill > 0 and fill + n > 256:
                pack, fill = pack + 1, 0
            exp.append((pack, fill))
            fill += n
        assert [(r["pack_id"], r["offset_in_pack"]) for r in out] == exp

    def test_invariants_no_split_no_overflow(self, spark):
        sizes = [7, 250, 9, 256, 1, 0, 300, 12, 12, 12, 200, 55, 2]
        budget = 256
        out = self._pack(spark, sizes, budget)
        fills = {}
        for r in out:
            fills.setdefault(r["pack_id"], []).append(r["n_units"])
            assert r["offset_in_pack"] + 0 <= budget or r["n_units"] > budget
        for pid, ns in fills.items():
            # a pack only exceeds budget when it holds a single oversize doc
            assert sum(ns) <= budget or (len(ns) == 1 and ns[0] > budget)
        # pack ids are consecutive from 0
        assert sorted(fills) == list(range(len(fills)))

    def test_groups_pack_independently(self, spark):
        from pasta_pipeline_spark.operators.sampling import greedy_pack

        df = spark.createDataFrame(
            [(i, 200, f"s{i % 2}") for i in range(6)],
            "doc_id long, n long, source string",
        )
        out = greedy_pack(df, "doc_id", "n", budget=256, group_col="source").collect()
        per_group = {}
        for r in out:
            per_group.setdefault(r["source"], []).append(r["pack_id"])
        # 3 docs of 200 at budget 256 → one pack each, per group
        for pids in per_group.values():
            assert sorted(pids) == [0, 1, 2]

    def test_null_and_negative_sizes_are_zero_width(self, spark):
        from pasta_pipeline_spark.operators.sampling import greedy_pack

        df = spark.createDataFrame(
            [(1, None, "s"), (2, -5, "s"), (3, 256, "s"), (4, 1, "s")],
            "doc_id long, n long, source string",
        )
        out = sorted(
            greedy_pack(df, "doc_id", "n", budget=256, group_col="source").collect(),
            key=lambda r: r["doc_id"],
        )
        assert [r["n_units"] for r in out] == [0, 0, 256, 1]
        # zero-width docs never open a new pack
        assert [r["pack_id"] for r in out] == [0, 0, 0, 1]


class TestJlProjection:
    def test_shape_and_determinism(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        from pasta_pipeline_spark.operators.similarity import jl_project

        a = {r["vec_id"]: r["proj"] for r in jl_project(df, "vec_id", "embedding").collect()}
        b = {r["vec_id"]: r["proj"] for r in jl_project(df, "vec_id", "embedding").collect()}
        assert a == b and all(len(p) == 16 for p in a.values())

    def test_preserves_relative_distance(self, spark):
        # near-identical vectors stay near; orthogonal-ish stay far —
        # the qualitative JL guarantee on a crafted fixture
        base = [1.0 if i < 32 else 0.0 for i in range(64)]
        near = list(base)
        near[0] = 0.99
        far = [0.0 if i < 32 else 1.0 for i in range(64)]
        df = spark.createDataFrame(
            [(0, base), (1, near), (2, far)],
            "vec_id long, embedding array<double>",
        )
        from pasta_pipeline_spark.operators.similarity import jl_project

        p = {r["vec_id"]: r["proj"] for r in jl_project(df, "vec_id", "embedding").collect()}
        d_near = sum((x - y) ** 2 for x, y in zip(p[0], p[1]))
        d_far = sum((x - y) ** 2 for x, y in zip(p[0], p[2]))
        assert d_near < d_far

    def test_malformed_vectors_excluded(self, spark):
        """Regression (r6 ADVICE): Spark's zip_with NULL-pads short
        vectors while DuckDB's list_sum skips NULLs — malformed
        embeddings must be consistently EXCLUDED, not diverge."""
        ok = [0.5] * 64
        df = spark.createDataFrame(
            [(0, ok), (1, [0.5] * 63), (2, [0.5] * 65), (3, [])],
            "vec_id long, embedding array<double>",
        )
        from pasta_pipeline_spark.operators.similarity import jl_project

        out = jl_project(df, "vec_id", "embedding").collect()
        assert [r["vec_id"] for r in out] == [0]
