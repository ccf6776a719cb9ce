"""Edge-case pytests for the round-7 operators (the oracle gate pins
the happy path at sf0.01; these pin the boundaries the synthetic
corpus never hits)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_global_line_dedup_edges(spark):
    from pasta_pipeline_spark.operators.text_dedup import global_line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nCOMMON  \nunique two"),
            (2, "common\nonly here"),          # matches after lower+trim
            (3, ""),                            # one empty line
            (4, None),                          # dropped (NULL text)
            (5, "\n\n"),                        # three empty lines (df=2 docs)
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in global_line_dedup(docs, max_df=1).collect()}
    assert 4 not in got
    # 'common' appears in docs 1 and 2 -> removed from both
    assert got[1]["clean_text"] == "unique one\nunique two"
    assert got[1]["n_lines"] == 3 and got[1]["n_kept"] == 2
    assert got[2]["clean_text"] == "only here"
    # empty lines appear in docs 3 and 5 -> df=2 -> removed
    assert got[3]["n_kept"] == 0 and got[3]["clean_text"] == ""
    assert got[5]["n_kept"] == 0


def test_stitch_pairs_edges(spark):
    from pasta_pipeline_spark.operators.text_dedup import stitch_pairs

    docs = spark.createDataFrame(
        [
            (1, "page one ends with to be continued"),
            (2, "to be continued on the next page"),
            (3, "to be"),          # < k tokens: excluded
            (4, None),
            (5, "a b c a b c"),    # head == tail of ITSELF: no self-pair
        ],
        "doc_id long, text string",
    )
    got = [(r["doc_a"], r["doc_b"]) for r in stitch_pairs(docs, k=3).collect()]
    assert got == [(1, 2)]


def test_cdc_chunks_edit_locality_and_copy_counts(spark):
    """The CDC property through the catalog-facing surface: a point
    edit reshapes only the chunks it touches — distant chunks keep
    their hashes and show n_copies == 2 across the two docs."""
    from pasta_pipeline_spark.operators.subdoc_dedup import cdc_chunks

    base = " ".join(f"w{i}" for i in range(200))
    toks = base.split()
    edited = " ".join(toks[:100] + ["EDIT"] + toks[100:])
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, "a"), (4, "")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs, avg_tokens=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["chunk_hash"])
    shared = by_doc[1] & by_doc[2]
    assert len(shared) >= len(by_doc[1]) // 2      # most chunks survive the edit
    assert by_doc[1] != by_doc[2]                  # but not all
    # shared chunks carry corpus-wide copy counts
    for r in rows:
        if r["doc_id"] == 1 and r["chunk_hash"] in shared:
            assert r["n_copies"] == 2
    # degenerate docs: one chunk for a 1-token doc, no rows for empty
    assert len(by_doc.get(3, set())) == 1
    assert 4 not in by_doc
    # chunks partition each doc: token counts sum to doc length
    n1 = sum(r["n_tokens"] for r in rows if r["doc_id"] == 1)
    assert n1 == 200


def test_bm25f_title_weighting(spark):
    """A title hit must outscore the same term buried in the body of
    an otherwise-identical document."""
    from pasta_pipeline_spark.operators.search import bm25f_topk

    docs = spark.createDataFrame(
        [
            (1, "spark engine guide intro text body words here filler end"),
            (2, "engine guide intro text body spark words here filler end"),
            (3, "nothing relevant at all in this one document right here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score_fp"] for r in bm25f_topk(docs, ["spark"], k=3).collect()}
    assert 3 not in got
    assert got[1] > got[2]          # title occurrence (pos < 5) outweighs body


def test_nb_confusion_separable_sources(spark):
    """Distinct vocabularies classify perfectly; a clone source draws
    off-diagonal mass."""
    from pasta_pipeline_spark.operators.dsir import nb_source_confusion

    rows = []
    for i in range(12):
        rows.append((i, "alpha beta gamma alpha", "a"))
        rows.append((100 + i, "delta epsilon zeta delta", "b"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["true_label"], r["predicted_label"]): r["n_docs"]
        for r in nb_source_confusion(docs).collect()
    }
    assert got == {("a", "a"): 12, ("b", "b"): 12}


def test_jl_ann_matches_exact_on_clustered_fixture(spark):
    """With candidates >= corpus size the JL prefilter passes
    everything through: jl_ann_topk == exact cosine_topk."""
    import random

    from pasta_pipeline_spark.operators.similarity import cosine_topk, jl_ann_topk

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    exact = [r["vec_id"] for r in cosine_topk(emb, query, k=5).collect()]
    ann = [
        r["vec_id"]
        for r in jl_ann_topk(emb, query, k=5, n_candidates=40).collect()
    ]
    assert ann == exact
