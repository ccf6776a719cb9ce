"""Edge-case pytests for the wave-8 operators (weighted median, skyline,
linkage, PCA power iteration, bitext margin mining). The oracle gate
pins the sf0.01 happy path; these pin boundary semantics and the
numerical claims the docstrings make."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# skyline: no emitted row is dominated; no dominated row is emitted
# ---------------------------------------------------------------------------


def test_skyline_matches_bruteforce(spark):
    from pasta_pipeline_spark.queries.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        (r["p_partkey"], r["p_size"], r["price_c"])
        for r in REGISTRY["skyline_pareto"].spark_fn(spark, sf).collect()
    }
    rows = (
        spark.read.parquet(f"{sf}/part.parquet")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    )
    pts = [(r["p_partkey"], r["p_size"], r["p_retailprice"]) for r in rows]

    def dominated(r):
        return any(
            q[2] <= r[2] and q[1] >= r[1] and (q[2] < r[2] or q[1] > r[1])
            for q in pts
        )

    expect = {
        (k, s, math.floor(p * 100)) for (k, s, p) in pts if not dominated((k, s, p))
    }
    assert got == expect and got


# ---------------------------------------------------------------------------
# weighted median: brute-force replay
# ---------------------------------------------------------------------------


def test_weighted_median_bruteforce(spark):
    from pasta_pipeline_spark.queries.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        r["l_returnflag"]: r["weighted_median_qty"]
        for r in REGISTRY["weighted_median"].spark_fn(spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    byflag: dict = {}
    for r in li:
        byflag.setdefault(r["l_returnflag"], {})
        q = int(r["l_quantity"])
        byflag[r["l_returnflag"]][q] = byflag[r["l_returnflag"]].get(q, 0) + math.floor(
            r["l_extendedprice"] * 10000
        )
    for flag, wm in byflag.items():
        tot = sum(wm.values())
        cum = 0
        for q in sorted(wm):
            cum += wm[q]
            if cum * 2 >= tot:
                assert got[flag] == q
                break


# ---------------------------------------------------------------------------
# linkage: blocking + score arithmetic on a constructed frame
# ---------------------------------------------------------------------------


def _parts(spark, rows):
    return spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_size int, p_retailprice double"
    )


def test_linkage_blocks_and_scores(spark):
    from pasta_pipeline_spark.operators.linkage import part_linkage_pairs

    parts = _parts(
        spark,
        [
            (1, "red widget", "B1", 10, 100.0),
            (2, "blue widget", "B1", 11, 102.0),   # lev(red,blue)=4>3: 0+2+3=5
            (3, "rad widget", "B1", 30, 100.5),    # vs 1: lev=1,size far: 2+0+3=5
            (4, "red widget", "B2", 10, 100.0),    # other brand: never paired
            (5, "red gadget", "B1", 10, 100.0),    # other noun: never paired
            (6, "red widget", "B1", 10, 300.0),    # vs 1: 2+2+0=4 < 5 -> out
        ],
    )
    got = {(r["a_key"], r["b_key"]): r["score"] for r in part_linkage_pairs(parts).collect()}
    # (1,2): lev 4->0, size 2, price 3 = 5; (1,3): lev 1->2, size 0, price 3 = 5
    # (2,3): lev 4->0, size 0, price 3 = 3 -> below threshold
    assert got == {(1, 2): 5, (1, 3): 5}


def test_linkage_excludes_below_threshold(spark):
    from pasta_pipeline_spark.operators.linkage import part_linkage_pairs

    parts = _parts(
        spark,
        [
            (1, "red widget", "B1", 10, 100.0),
            (6, "red widget", "B1", 10, 300.0),  # 2+2+0 = 4 -> excluded
        ],
    )
    assert part_linkage_pairs(parts).count() == 0


# ---------------------------------------------------------------------------
# PCA power iteration: agrees with numpy's dominant eigenvector
# ---------------------------------------------------------------------------


def test_pca_power_iteration_matches_numpy(spark):
    import numpy as np

    from pasta_pipeline_spark.operators.similarity import pca_power_iteration

    rng = np.random.default_rng(7)
    # anisotropic cloud: dominant direction along a fixed unit vector
    d = 8
    u = np.ones(d) / math.sqrt(d)
    X = rng.normal(size=(300, d)) * 0.1 + np.outer(rng.normal(size=300) * 3.0, u)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    got = pca_power_iteration(emb, dim=d, iters=12).orderBy("dim").collect()
    v = np.array([r["loading_sc"] for r in got], dtype=np.float64)
    v = v / np.linalg.norm(v)
    # numpy reference on the float32-rounded data (the operator reads float32)
    Xf = X.astype(np.float32).astype(np.float64)
    w, V = np.linalg.eigh(Xf.T @ Xf / len(Xf))
    top = V[:, np.argmax(w)]
    assert abs(float(np.dot(v, top))) > 0.999
    assert all(r["lambda_sc"] == got[0]["lambda_sc"] for r in got)
    assert got[0]["lambda_sc"] > 0


def test_pca_sign_normalization(spark):
    from pasta_pipeline_spark.operators.similarity import pca_power_iteration

    # data along -e0: loadings must still come out with the pivot positive
    emb = spark.createDataFrame(
        [(i, [-1.0, 0.001 * i]) for i in range(1, 50)],
        "vec_id long, embedding array<float>",
    )
    rows = pca_power_iteration(emb, dim=2, iters=6).orderBy("dim").collect()
    mx = max(abs(r["loading_sc"]) for r in rows)
    piv = next(r for r in rows if abs(r["loading_sc"]) == mx)
    assert piv["loading_sc"] > 0


# ---------------------------------------------------------------------------
# bitext margin: thresholds honored, labels respected, hub suppression
# ---------------------------------------------------------------------------


def test_bitext_margin_thresholds_and_sides(spark):
    from pasta_pipeline_spark.operators.similarity import bitext_margin_pairs

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = bitext_margin_pairs(emb).collect()
    assert out  # nontrivial at sf0.001 (4 pairs per the oracle run)
    a_ids = {r["vec_id"] for r in emb.where(F.col("label") == 0).collect()}
    b_ids = {r["vec_id"] for r in emb.where(F.col("label") == 1).collect()}
    for r in out:
        assert r["a_id"] in a_ids and r["b_id"] in b_ids
        assert r["cos_sc"] >= 300_000
        assert r["margin_sc"] >= 1_050_000


def test_bitext_margin_suppresses_hub(spark):
    from pasta_pipeline_spark.operators.similarity import bitext_margin_pairs

    # a "hub" b-vector near-parallel to EVERY a-vector scores high cosine
    # against all of them, but its avgk is equally high, so margins stay
    # ~1 and below the 1.05 gate; a genuinely-mated pair clears it.
    import numpy as np

    rng = np.random.default_rng(3)
    d = 16
    a_vecs = [rng.normal(size=d) for _ in range(6)]
    hub = np.mean(a_vecs, axis=0)  # similar-ish to all of A
    mate = a_vecs[0] + rng.normal(size=d) * 0.01  # translation of a0
    rows = [(i, [float(x) for x in a_vecs[i]], 0) for i in range(6)]
    rows.append((100, [float(x) for x in hub], 1))
    rows.append((101, [float(x) for x in mate], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = bitext_margin_pairs(
        emb, dim=d, num_planes=2, num_bands=4, k=3,
        min_cos_sc=500_000, min_margin_sc=1_050_000,
    ).collect()
    mates = {(r["a_id"], r["b_id"]) for r in out}
    assert (0, 101) in mates
    assert all(b != 100 for (_, b) in mates)
