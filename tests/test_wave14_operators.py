"""Wave-14 operator unit tests: packing waste, transitivity."""

from __future__ import annotations


def test_packing_waste_arithmetic(spark):
    from pasta_pipeline_spark.operators.chunking import packing_waste_report

    rows = [
        (1, "w " * 512, "a"),        # exactly 1 chunk, 0 pad
        (2, "w " * 513, "a"),        # 2 chunks, 511 pad
        (3, "w " * 100, "b"),        # 1 chunk, 412 pad
        (4, "   ", "b"),             # zero tokens -> excluded
    ]
    df = spark.createDataFrame(
        [(i, t.strip() and t or t, s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in packing_waste_report(df).collect()}
    a = got["a"]
    assert a["n_docs"] == 2 and a["n_tokens"] == 1025 and a["n_chunks"] == 3
    assert a["pad_tokens"] == 3 * 512 - 1025 == 511
    b = got["b"]
    assert b["n_docs"] == 1 and b["pad_tokens"] == 412
    assert b["waste_share_sc"] == int(412 / 512 * 1_000_000)


def test_transitivity_triangle_vs_chain(spark):
    from pasta_pipeline_spark.operators.graph import transitivity_report

    # triangle 1-2-3 : wedges 3, triangles 1 -> transitivity 1.0
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "doc_a long, doc_b long"
    )
    r = transitivity_report(tri).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["wedges"], r["n_triangles"]) == (3, 3, 3, 1)
    assert r["transitivity_sc"] == 1_000_000
    # chain 1-2-3 : 1 wedge, 0 triangles -> 0
    chain = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    c = transitivity_report(chain).collect()[0]
    assert c["wedges"] == 1 and c["n_triangles"] == 0 and c["transitivity_sc"] == 0
    # single edge: no wedge -> NULL
    e = transitivity_report(
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    ).collect()[0]
    assert e["wedges"] == 0 and e["transitivity_sc"] is None
