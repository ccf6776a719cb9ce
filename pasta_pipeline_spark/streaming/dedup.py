"""Streaming ingest deduplication (SURVEY.md §2.9 extension).

The batch dedup ladder (operators/dedup.py, operators/text_dedup.py)
removes duplicates already in the table; this is the *ingest-time*
form: re-delivered artifacts (at-least-once sources re-send scrape
batches; the reference tolerates this via ON CONFLICT upserts) are
dropped before they ever reach the sink.

``dropDuplicatesWithinWatermark`` keys the state on the dedup columns
and evicts entries older than the watermark — bounded state at any
scale, which plain streaming ``dropDuplicates`` (state grows forever)
cannot promise. The guarantee: two rows with equal keys whose event
times fall within the watermark horizon of each other dedup to one;
re-deliveries farther apart than the horizon are the table-side
merge's job (idempotent by key — streaming/sink.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-delivered rows by key within the watermark horizon.
    Batch DataFrames fall back to plain ``dropDuplicates`` (the whole
    frame is the horizon)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)


# ---------------------------------------------------------------------------
# Incremental MinHash-LSH dedup index (streaming near-dup detection)
# ---------------------------------------------------------------------------


def _bands_from_sigs(sigs: "DataFrame", num_hashes: int, bands: int) -> "DataFrame":
    """(doc, band, bh) band-bucket table derived from a signature
    frame (doc, mh0..mh{k-1}) — banding is a projection, so only the
    compact signatures ever persist; buckets are recomputed per batch
    at projection cost."""
    from pyspark.sql import functions as F

    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                *[F.col(f"mh{bi * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bh"),
        )
        for bi in range(bands)
    ]
    return sigs.select("doc", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )


def lsh_index_batch(
    batch: "DataFrame",
    index_store,
    pairs_dir: str | None = None,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    min_agree_frac: float = 0.5,
    index_buckets: int = 32,
):
    """One incremental-dedup step: detect near-dups of ``batch``
    against everything indexed so far (plus within the batch), then
    fold the batch into the index. Returns the detected pair frame
    ``(doc_a, doc_b, agree_fp)``.

    Index state = the per-doc MinHash signature table (k int64s per
    document — compact enough to keep forever; band buckets derive
    from it by projection). Candidate generation joins the batch's
    band buckets against the index's; scoring is the signature
    agreement fraction (the standard unbiased Jaccard estimator —
    agree/k), surfaced as exact integer basis points
    ``agree * 10000 div k``. Exact shingle-level verification of the
    emitted pairs is a downstream batch job (operators/text_dedup.py
    jaccard machinery) — the streaming path never needs old documents'
    TEXT, only their signatures, which is what makes the state small.

    Scale shape: signatures merge into the store at partition
    granularity (merge_partitioned on a stable doc-hash bucket); the
    bucket join shuffles on (band, bh); within-batch pairs come from
    the same banded frame self-joined. Re-delivered documents are
    no-ops: merge is keyed on doc, and a doc never pairs with itself
    (replays re-emit the same pairs — at-least-once on the pair sink,
    keyed dedup downstream).

    No collect anywhere: the returned frame is always THIS batch's
    pair plan, lazy over the CURRENT index version — TableStore keeps
    one predecessor version, so it stays valid until the NEXT merge
    (materialize before then; documented contract). When
    ``pairs_dir`` is given the batch's pairs are ALSO appended there
    as parquet; that directory accumulates the full pair history
    across batches for separate consumption (read it directly for
    the cumulative view) — it is not what this function returns.
    """
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.text_dedup import (
        _minhash_exprs,
        _shingle_table,
    )

    sh = _shingle_table(batch, id_col, text_col, n).persist()
    xh = sh.select("doc", F.col("sh").alias("xh"))
    sigs_new = xh.groupBy("doc").agg(*_minhash_exprs(num_hashes)).persist()

    if index_store.exists():
        sigs_old = index_store.read().drop("__bkt")
    else:
        sigs_old = batch.sparkSession.createDataFrame([], sigs_new.schema)
    banded_new = _bands_from_sigs(sigs_new, num_hashes, bands)
    banded_old = _bands_from_sigs(sigs_old, num_hashes, bands)

    # cross (new vs indexed) + within-batch candidates, doc_a < doc_b
    a, b = banded_new.alias("a"), banded_old.alias("b")
    cross = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc") != F.col("b.doc")),
    ).select(
        F.least(F.col("a.doc"), F.col("b.doc")).alias("doc_a"),
        F.greatest(F.col("a.doc"), F.col("b.doc")).alias("doc_b"),
    )
    w1, w2 = banded_new.alias("a"), banded_new.alias("b")
    within = w1.join(
        w2,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
    cand = cross.union(within).distinct()

    all_sigs = sigs_old.unionByName(sigs_new).dropDuplicates(["doc"])
    agree = None
    for i in range(num_hashes):
        t = F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    sa, sb = all_sigs.alias("a"), all_sigs.alias("b")
    pairs = (
        cand.join(sa, cand["doc_a"] == F.col("a.doc"))
        .join(sb, cand["doc_b"] == F.col("b.doc"))
        .select(
            "doc_a",
            "doc_b",
            (agree * F.lit(10000) / F.lit(num_hashes))
            .cast("long")
            .alias("agree_fp"),
        )
        .filter(F.col("agree_fp") >= int(min_agree_frac * 10000))
    )

    with_bkt = sigs_new.withColumn(
        "__bkt", F.pmod(F.xxhash64(F.col("doc")), F.lit(index_buckets)).cast("int")
    )
    # merge BEFORE the pair write: a crash in between replays the batch
    # against an index that already contains it — the same pairs are
    # re-detected (a doc never pairs with itself), nothing is lost.
    # The pair plan stays valid across the merge because TableStore
    # retains the predecessor version it was built on.
    index_store.merge_partitioned(with_bkt, key="doc", partition_col="__bkt")
    if pairs_dir is not None:
        to_write = pairs
        if batch_id is not None:
            # tag the history row with its micro-batch: the lifecycle
            # analytics (operators/pair_ttl.py pair_history_report)
            # key their TTL windows on it
            to_write = pairs.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        to_write.write.mode("append").parquet(pairs_dir)
    sh.unpersist()
    sigs_new.unpersist()
    return pairs


def compact_lsh_index(index_store, index_buckets: int = 32) -> None:
    """Periodic maintenance for the signature store ``lsh_index_batch``
    accretes into: every micro-batch merge adds one file per touched
    ``__bkt`` partition, so after months of batches the store is
    thousands of tiny files even though the DATA is compact (k int64s
    per doc). One compaction pass rewrites the live version to ~one
    file per bucket partition, preserving the ``__bkt`` layout so the
    NEXT merge is still differential. Run it on a cadence (every N
    batches / nightly), exactly like a lakehouse OPTIMIZE; detection
    results are unaffected — the store's contents don't change, only
    the file count."""
    index_store.compact(index_buckets, partition_by="__bkt")


def incremental_lsh_dedup(
    stream: "DataFrame",
    index_store,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
    **lsh_kwargs,
):
    """Streaming near-dup detection: every micro-batch is checked
    against the accumulated signature index and folded in; detected
    pairs append to ``pairs_dir`` as parquet. The index survives
    restarts (TableStore versioning) and replayed batches are no-ops
    (doc-keyed merge; a doc never pairs with itself)."""
    if not checkpoint_dir:
        raise ValueError("incremental_lsh_dedup requires checkpoint_dir")

    def step(batch: "DataFrame", batch_id: int) -> None:
        lsh_index_batch(
            batch,
            index_store,
            pairs_dir=pairs_dir,
            batch_id=batch_id,
            id_col=id_col,
            text_col=text_col,
            **lsh_kwargs,
        )

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(step)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
