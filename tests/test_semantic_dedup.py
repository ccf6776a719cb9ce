"""semantic_dedup keep-contract unit tests (operators/similarity.py)."""

from __future__ import annotations

from pasta_pipeline_spark.operators.similarity import semantic_dedup


def test_banded_lsh_recall_at_least_single_band(spark):
    """OR-of-bands >= single-band recall at a fixed threshold: band 0
    IS the single-band plane set, so banded candidates are a strict
    superset and every emitted pair still clears the exact cosine
    filter — pairs(1 band) <= pairs(2 bands) <= exact pairs."""
    from pasta_pipeline_spark.operators.similarity import cosine_dup_pairs
    from pasta_pipeline_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def pairs(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in cosine_dup_pairs(emb, 0.4, **kw).collect()
        }

    one = pairs(use_lsh=True, dim=64, num_planes=4, num_bands=1)
    two = pairs(use_lsh=True, dim=64, num_planes=4, num_bands=2)
    exact = pairs(use_lsh=False)
    assert one <= two <= exact
    # no false positives ever; banding is purely a recall knob
    assert len(exact) > 0


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_identical_vectors_keep_smallest_id(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(10, v), (3, v), (7, v), (99, [0.0, 1.0, 0.0, 0.0])]
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(_df(spark, rows), 0.99, dim=4).collect()
    }
    # identical group: only the smallest id survives; the orthogonal
    # vector is untouched
    assert got == {3: 1, 7: 0, 10: 0, 99: 1}


def test_dissimilar_vectors_all_kept(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    got = semantic_dedup(_df(spark, rows), 0.9, dim=4).collect()
    assert all(r["kept"] == 1 for r in got)


def test_chain_keeps_head_of_each_link(spark):
    # a ~ b (cos .995), b ~ c (cos .995), a !~ c (cos .98 < threshold):
    # b drops via a, c drops via b — greedy smaller-id contract, not
    # connected components; the head survives either way
    a = [1.0, 0.0]
    b = [0.995, 0.0998752]
    c = [0.9801, 0.1986]
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(_df2(spark, [(1, a), (2, b), (3, c)]), 0.99, dim=2).collect()
    }
    assert got[1] == 1 and got[2] == 0


def _df2(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_plan_is_bucket_gated(spark):
    rows = [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(20)]
    df = semantic_dedup(_df(spark, rows), 0.95, dim=4)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_select_survivors_policies(spark):
    from pasta_pipeline_spark.operators.text_dedup import select_survivors

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 50), (3, 50), (10, 9), (11, 3), (20, 7)],
        "doc_id long, score long",
    )
    best = {
        r["doc_id"]: r["is_survivor"]
        for r in select_survivors(clusters, docs, "score").collect()
    }
    # highest score wins; tie (2 vs 3, both 50) breaks to smaller id
    assert best == {1: False, 2: True, 3: False, 10: True, 11: False, 20: True}
    worst = {
        r["doc_id"]: r["is_survivor"]
        for r in select_survivors(clusters, docs, "score", ascending=True).collect()
    }
    assert worst == {1: True, 2: False, 3: False, 10: False, 11: True, 20: True}
    # exactly one survivor per cluster under any policy
    for rows in (best, worst):
        assert sum(rows.values()) == 3


def test_embedding_outliers_finds_planted_outlier(spark):
    from pasta_pipeline_spark.operators.similarity import embedding_outliers

    # label 0: tight cluster around (1,0) + one far point (planted outlier)
    rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(9)]
    rows.append((99, [-5.0, 4.0], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = embedding_outliers(df, k=2).collect()
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rk"])][0] == 99
    assert len(got) == 2


def test_cross_corpus_cosine_pairs_planted_leak(spark):
    from pasta_pipeline_spark.operators.similarity import cross_corpus_cosine_pairs

    base = [0.5] * 8
    train = spark.createDataFrame(
        [(0, base), (2, [1.0, -1.0] * 4)], "vec_id long, embedding array<float>"
    )
    ev = spark.createDataFrame(
        [(1, base), (3, [-1.0] * 8)], "vec_id long, embedding array<float>"
    )
    got = cross_corpus_cosine_pairs(train, ev, threshold=0.95, dim=8, num_planes=3).collect()
    assert [(r["train_id"], r["eval_id"]) for r in got] == [(0, 1)]
    assert abs(got[0]["sim"] - 1.0) < 1e-9


def test_pq_topk_recall_vs_exact(spark):
    """PQ-ADC ranking is a real approximation: the query's own vector
    ranks first at distance 0, scores ascend, and on a corpus with
    actual cluster structure (driver embeddings are uniform-random, so
    a clustered fixture is synthesized) ADC top-10 recovers most of
    the exact top-10."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.similarity import cosine_topk, pq_topk

    # 120 vectors in 4 well-separated clusters, deterministic jitter
    rows = []
    for i in range(120):
        c = i % 4
        base = [10.0 if d // 16 == c else 0.0 for d in range(64)]
        vec = [base[d] + ((i * 31 + d * 7) % 13) / 13.0 for d in range(64)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))

    adc = pq_topk(emb, query, k=10).collect()
    assert adc[0]["vec_id"] == 0 and adc[0]["adc_fp"] == 0  # self-distance
    assert [r["adc_fp"] for r in adc] == sorted(r["adc_fp"] for r in adc)
    # all top-10 come from the query's cluster (ids ≡ 0 mod 4)
    assert all(r["vec_id"] % 4 == 0 for r in adc)
    exact_ids = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
    adc_ids = {r["vec_id"] for r in adc}
    assert len(exact_ids & adc_ids) >= 6  # real recall on clustered data


def test_train_pq_codebooks_improves_recall(spark):
    """Lloyd's-trained PQ codebooks vs seed codebooks on a fixture
    built to break the seeds: ids are ordered so the first n_codes
    vectors (the seeds) all come from ONE cluster, leaving the other
    clusters unrepresented until training moves codes there. Training
    must strictly reduce the k-means objective (pq_distortion), more
    iterations must never increase it, ADC recall must not degrade,
    and iterations=0 keeps the seed path; codebooks stay n_codes rows
    per subspace."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.similarity import (
        _pq_seed_codebooks,
        cosine_topk,
        pq_distortion,
        pq_topk,
        train_pq_codebooks,
    )

    # 4 well-separated clusters; ids 0..29 ALL in cluster 0 (seed
    # poisoning), ids 30.. round-robin the rest; aperiodic jitter
    rows = []
    for i in range(120):
        c = 0 if i < 30 else (i % 3) + 1
        base = [10.0 if d // 16 == c else 0.0 for d in range(64)]
        vec = [base[d] + ((i * 37 + d * 13) % 101) / 101.0 * 3.0 for d in range(64)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    seed_cb = _pq_seed_codebooks(emb, 4, 16, 8, "vec_id", "embedding")
    t1_cb = train_pq_codebooks(emb, n_codes=8, iterations=1)
    t3_cb = train_pq_codebooks(emb, n_codes=8, iterations=3)
    d_seed = pq_distortion(emb, seed_cb).collect()[0][0]
    d_t1 = pq_distortion(emb, t1_cb).collect()[0][0]
    d_t3 = pq_distortion(emb, t3_cb).collect()[0][0]
    # Lloyd's: strict improvement over poisoned seeds, monotone in
    # iteration count (each round never increases the objective)
    assert d_t1 < d_seed * 0.8, (d_t1, d_seed)
    assert d_t3 <= d_t1

    per_m = {r["m"]: r["n"] for r in t3_cb.groupBy("m").agg(F.count("*").alias("n")).collect()}
    assert per_m == {0: 8, 1: 8, 2: 8, 3: 8}
    assert all(len(r["cv"]) == 16 for r in t3_cb.collect())

    # recall never degrades vs the seed path on an unseen cluster
    query = emb.where("vec_id = 31").select(F.col("embedding").alias("qv"))
    exact_ids = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
    seed_ids = {r["vec_id"] for r in pq_topk(emb, query, k=10, n_codes=8).collect()}
    trained_ids = {
        r["vec_id"]
        for r in pq_topk(emb, query, k=10, n_codes=8, train_iterations=3).collect()
    }
    assert len(trained_ids & exact_ids) >= len(seed_ids & exact_ids)
    assert len(trained_ids & exact_ids) >= 8


def test_pq_encode_persisted_codes_equal_direct(spark, tmp_path):
    """The at-scale PQ shape: encode once, persist the codes table,
    query many times over stored codes — pq_adc_topk over
    round-tripped parquet codes must equal pq_topk run direct, and
    the codes table is n_subspaces rows per vector of small ints."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.similarity import (
        _pq_seed_codebooks,
        pq_adc_topk,
        pq_encode,
        pq_topk,
    )

    rows = []
    for i in range(80):
        c = i % 4
        base = [10.0 if d // 16 == c else 0.0 for d in range(64)]
        vec = [base[d] + ((i * 37 + d * 13) % 101) / 101.0 for d in range(64)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = emb.where("vec_id = 2").select(F.col("embedding").alias("qv"))

    cb = _pq_seed_codebooks(emb, 4, 16, 16, "vec_id", "embedding").localCheckpoint()
    codes = pq_encode(emb, cb)
    assert codes.count() == 80 * 4

    path = str(tmp_path / "pq_codes")
    codes.write.parquet(path)
    stored = spark.read.parquet(path)

    direct = [(r["vec_id"], r["adc_fp"]) for r in pq_topk(emb, query, k=10).collect()]
    via_store = [
        (r["vec_id"], r["adc_fp"])
        for r in pq_adc_topk(stored, query, cb, k=10).collect()
    ]
    assert via_store == direct


def test_ivf_partitioned_scan_prunes(spark, tmp_path):
    """The IVF-as-partition-column deployment: writing the corpus
    partitioned by cell assignment makes the n_probe query a PRUNED
    scan — the executed plan reads only the probed cells' files — and
    results match ivf_topk over the same assignment."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_pruned,
        train_ivf_centroids,
        write_ivf_partitioned,
    )

    rows = []
    for i in range(200):
        c = i % 8
        base = [8.0 if d // 8 == c else 0.0 for d in range(64)]
        vec = [base[d] + ((i * 37 + d * 13) % 101) / 101.0 for d in range(64)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(emb, n_cells=8, iterations=2).localCheckpoint()

    path = str(tmp_path / "ivf_idx")
    write_ivf_partitioned(emb, cents, path)

    query = emb.where("vec_id = 3").select(F.col("embedding").alias("qv"))
    pruned = ivf_topk_pruned(spark, path, query, cents, k=10, n_probe=2)
    got = [(r["vec_id"], round(r["sim"], 9)) for r in pruned.collect()]

    # pruning evidence: the literal IN list lands in the scan's
    # PartitionFilters (planning-time pruning, before any IO), and it
    # names at most n_probe of the 8 cells
    import re

    jq = pruned._jdf.queryExecution()
    plan = jq.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "cell_id" in pf
    in_list = re.search(r"IN \(([0-9,\s]+)\)", pf)
    assert in_list is not None, pf
    probed = {int(c) for c in in_list.group(1).split(",")}
    assert len(probed) <= 2, probed
    assert spark.read.parquet(path).count() == 200

    # parity with the in-memory IVF over the same trained cells
    ref = ivf_topk(emb, query, k=10, n_cells=8, n_probe=2, train_iterations=2)
    ref_ids = [r["vec_id"] for r in ref.collect()]
    assert [g[0] for g in got] == ref_ids


def test_ivfpq_composite_recall_and_pruned_layout(spark, tmp_path):
    """IVF-PQ (IVFADC) composite. Four layers:

    1. recall: on a clustered fixture the composite's top-10 by ADC
       over residual codes recovers >= 8 of the exact cosine top-10
       (the query's own cluster concentrates in the probed cells and
       the shared residual codebook separates it);
    2. the persisted layout: write_ivfpq_index partitions the CODES
       by cell, ivfpq_topk_pruned scans only the probed cells
       (PartitionFilters evidence, same idiom as the IVF tier) and
       returns exactly the in-memory composite's rows;
    3. trained quantizers (train_iterations>0) keep the contract:
       same return shape, recall at least as good as seeds here;
    4. the codes table is the scan: n_subspaces rows of small ints
       per vector, no float vector column.
    """
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.similarity import (
        _pq_seed_codebooks,
        cosine_topk,
        ivf_pq_topk,
        ivf_residuals,
        ivfpq_topk_pruned,
        train_ivf_centroids,
        write_ivfpq_index,
    )

    # 24 interleaved near-duplicate groups of 10 (group = i % 24):
    # each group has a distinct two-spike base pattern, members differ
    # only by tiny perturbations — so the exact top-10 of a query IS
    # its group, the structure an ANN index must recover. Interleaving
    # puts groups 0..7 at ids 0..7, giving the seed centroids 8
    # distinct patterns.
    rows = []
    for i in range(240):
        g = i % 24
        base = [0.0] * 64
        base[(g * 7) % 64] = 8.0
        base[(g * 13 + 5) % 64] = 6.0
        vec = [
            base[d] + 0.02 * ((i * 37 + d * 13) % 101) / 101.0
            for d in range(64)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = emb.where("vec_id = 3").select(F.col("embedding").alias("qv"))

    exact = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
    assert exact == {i for i in range(240) if i % 24 == 3}  # fixture sanity

    got = ivf_pq_topk(
        emb, query, k=10, n_cells=8, n_probe=2, n_subspaces=4, n_codes=16
    )
    got_rows = [(r["vec_id"], r["adc_fp"]) for r in got.collect()]
    assert len(got_rows) == 10
    assert len({v for v, _ in got_rows} & exact) >= 8

    # trained coarse + PQ quantizers: same shape, recall holds
    trained = ivf_pq_topk(
        emb, query, k=10, n_cells=8, n_probe=2, n_subspaces=4, n_codes=16,
        train_iterations=2,
    )
    assert len({r["vec_id"] for r in trained.collect()} & exact) >= 8

    # persisted inverted lists: codes partitioned by cell, pruned scan
    cents = train_ivf_centroids(emb, n_cells=8, iterations=2).localCheckpoint()
    res = ivf_residuals(emb, cents)
    cb = _pq_seed_codebooks(res, 4, 16, 16, "vec_id", "rv").localCheckpoint()
    path = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(emb, cents, cb, path)

    stored = spark.read.parquet(path)
    assert stored.count() == 240 * 4
    assert set(stored.columns) == {"vec_id", "m", "code", "cell_id"}

    pruned = ivfpq_topk_pruned(spark, path, query, cents, cb, k=10, n_probe=2)
    import re

    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "cell_id" in pf
    in_list = re.search(r"IN \(([0-9,\s]+)\)", pf)
    assert in_list is not None, pf
    assert len({int(c) for c in in_list.group(1).split(",")}) <= 2

    # parity: pruned layout == in-memory composite over the same
    # trained cells + seed residual codebook
    from pasta_pipeline_spark.operators.similarity import (
        ivfpq_adc_topk,
        ivfpq_encode,
    )

    mem = ivfpq_adc_topk(
        ivfpq_encode(emb, cents, cb), query, cents, cb, k=10, n_probe=2
    )
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in mem.collect()]


def test_gate_recall_report_contract(spark):
    """gate_recall_report: gated pairs are a subset of true pairs (the
    exact verify admits no false positives), so recall_sc is in
    [0, 1e6]; the md5-ranked subsample cap binds deterministically;
    repeated runs are identical."""
    from pasta_pipeline_spark.operators.similarity import gate_recall_report
    from pasta_pipeline_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    r = gate_recall_report(emb, threshold=0.4, num_bands=2).collect()[0]
    assert r["n_vectors"] == 500
    assert 0 <= r["n_gated_pairs"] <= r["n_true_pairs"]
    assert r["recall_sc"] is None or 0 <= r["recall_sc"] <= 1_000_000
    r2 = gate_recall_report(emb, threshold=0.4, num_bands=2).collect()[0]
    assert tuple(r) == tuple(r2)
    # the subsample cap binds: audit cost is bounded at any corpus size
    small = gate_recall_report(emb, threshold=0.4, num_bands=2, max_n=50).collect()[0]
    assert small["n_vectors"] == 50
    # more bands can only widen the gate: recall is monotone in bands
    r4 = gate_recall_report(emb, threshold=0.4, num_bands=4).collect()[0]
    assert r4["n_gated_pairs"] >= r["n_gated_pairs"]
