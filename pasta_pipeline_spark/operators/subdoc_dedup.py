"""Sub-document deduplication — line-level and content-defined-chunk
granularity.

The document-level dedup ladder (``operators/text_dedup.py``) keeps or
drops WHOLE documents. Web-scale training corpora additionally need
removal of duplicated content *inside* otherwise-unique documents:
navigation boilerplate, license headers, quoted reply chains. Two
standard granularities, both re-expressed as pure DataFrame plans:

- **Line-level dedup** (CCNet / RefinedWeb style): count every line's
  global frequency across the corpus; rewrite each document keeping
  only lines whose frequency is at or below a threshold. One shuffle
  on the line hash (frequency count), one joinback, one shuffle on the
  document id (reassembly) — linear in corpus line mass, no driver
  state, no cross join.
- **Content-defined chunking** (CDC — the rolling-boundary trick from
  dedup storage systems, here at token granularity): a chunk boundary
  falls after every token whose 60-bit hash is ``0 mod avg_tokens``.
  Boundaries depend only on local content, so an insertion early in a
  document re-synchronizes at the next boundary and all later chunks
  hash identically — which is exactly what makes chunk-hash dedup
  robust to small edits where fixed-width windows are not (verified by
  the shift-resync pytest).

Cross-engine exactness: line/token hashing is md5-based (playbook #6),
chunk ids are int64 window cumsums, and reassembly orders by the
explode position — every step has a bit-identical DuckDB twin, so both
operators are full value-hash oracle-checked, not rows-only.

Reference scope note: the reference engine has no sub-document dedup
(its single tier is the whole-content md5 at
telegraph_processor.py:128-132); this module is part of the SURVEY
§2.12 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws
from pasta_pipeline_spark.operators.text_dedup import _hash60


def segment_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", delimiter: str = "\n"
) -> DataFrame:
    """Explode documents into ``(id, pos, line)`` rows. ``delimiter``
    must be a regex-free literal (it is passed to ``F.split`` on the
    Spark side and to ``string_split`` in oracles). Trailing empty
    segments are kept (split limit -1), matching DuckDB
    ``string_split``; null texts produce no rows."""
    c = F.col(text_col)
    return docs.where(c.isNotNull()).select(
        F.col(id_col),
        F.posexplode(F.split(c, delimiter, -1)).alias("pos", "line"),
    )


def remove_duplicated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    max_freq: int = 1,
    keep_blank: bool = True,
) -> DataFrame:
    """Corpus-level line dedup: drop every line whose global occurrence
    count exceeds ``max_freq``; reassemble each document from its kept
    lines in original order.

    Returns one row per input document (null-text docs excluded):
    ``(id, text_kept, n_lines, n_removed)`` — a document whose lines
    are all removed survives with ``text_kept = ''``, so the corpus
    row count is stable (downstream length filters decide its fate,
    not this operator).

    ``keep_blank=True`` exempts whitespace-only lines: they are
    formatting, not content, and removing them because blank lines are
    globally common would glue paragraphs together.

    Scale shape: frequency groupBy shuffles 16-byte md5 line keys (not
    line text); the joinback is AQE-broadcast-eligible when the over-
    threshold set is small; reassembly is a single groupBy on the doc
    id with an in-array sort — no window over a global order anywhere.
    """
    lines = segment_lines(docs, id_col, text_col, delimiter)
    lines = lines.withColumn("__lh", F.md5(F.col("line")))
    freq = lines.groupBy("__lh").agg(F.count(F.lit(1)).alias("__freq"))
    kept = F.col("__freq") <= F.lit(max_freq)
    if keep_blank:
        kept = kept | (F.trim(F.col("line")) == "")
    flagged = lines.join(freq, "__lh").withColumn("__kept", kept)
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum((~F.col("__kept")).cast("long")).cast("long").alias("n_removed"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__kept"), F.struct(F.col("pos"), F.col("line")))
                )
            ).alias("__ks"),
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(F.col("__ks"), lambda s: s.getField("line")), delimiter
            ).alias("text_kept"),
            "n_lines",
            "n_removed",
        )
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_tokens: int = 16,
) -> DataFrame:
    """Content-defined chunking at token granularity: a boundary closes
    the current chunk AFTER every token whose ``_hash60`` is
    ``0 mod avg_tokens`` (expected chunk length = ``avg_tokens``).
    Returns one row per chunk:
    ``(id, chunk_id, n_tokens, chunk_hash, n_copies)`` where
    ``n_copies`` is the corpus-wide occurrence count of the chunk text
    (``> 1`` → shared content, the dedup signal).

    Scale shape: the boundary cumsum window and the chunk groupBy both
    partition by the document id — one sort shuffle, then the chunk-
    hash count shuffles 32-byte md5 keys. Everything else is in-row.
    Chunk ids are exclusive prefix sums (int64), deterministic given
    the text alone — two identical documents always produce identical
    ``(chunk_id, chunk_hash)`` sequences.
    """
    c = F.col(text_col)
    toks = docs.where(c.isNotNull()).select(
        F.col(id_col),
        F.posexplode(tokenize_ws(c, lowercase=False)).alias("pos", "tok"),
    )
    boundary = (_hash60(F.col("tok")) % F.lit(avg_tokens) == 0).cast("long")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = toks.withColumn("__b", boundary).withColumn(
        "chunk_id", (F.sum("__b").over(w) - F.col("__b")).cast("long")
    )
    chunks = (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                        ),
                        lambda s: s.getField("tok"),
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )
    copies = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies")
    )
    return chunks.join(copies, "chunk_hash").select(
        F.col(id_col), "chunk_id", "n_tokens", "chunk_hash", "n_copies"
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2021,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language
    Models Better" — their suffix-array ExactSubstr pass, re-expressed
    for a distributed engine): for every document, the maximal token
    ranges covered by ``w``-token windows whose content occurs at
    least ``min_count`` times corpus-wide (across documents OR
    repeated within one). Returns ``(doc, span_start, span_end,
    n_windows)`` with 1-based inclusive token positions — the ranges a
    cleanup pass would cut, without dropping the whole document.

    Plan (no suffix array, same answer for fixed ``w``): every
    document emits one 60-bit hash per w-token window (token mass ×
    ~1 rows — a projection); one groupBy(hash) counts global
    occurrences; duplicated windows join back and collapse to maximal
    spans per document with a gaps-and-islands window (merge when the
    next window starts at or before the running span end + 1). Two
    shuffles total — window-hash count and per-doc island pass — both
    linear, no pair generation at all, so this tier is CHEAPER than
    any pairwise dedup and scales to 100 TB the same way a word count
    does. Hash collisions (~2^-60) can over-mark a span; no false
    negatives.

    Window hashes are md5-int60 over the joined window tokens
    (playbook recipe), positions and counts are int64 — full
    value-hash DuckDB oracle.
    """
    src = (
        df.select(F.col(id_col).alias("doc"), tokenize_ws(F.col(text_col)).alias("t"))
        .withColumn("n", F.size("t"))
        .filter(F.col("n") >= w)
    )
    wins = src.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - (w - 1)),
                lambda i: _hash60(F.array_join(F.slice(F.col("t"), i, w), " ")),
            )
        ).alias("p0", "wh"),
    ).select("doc", (F.col("p0") + 1).cast("long").alias("start"), "wh")
    dup = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("wh")
    )
    dwin = wins.join(dup, "wh").withColumn("end", F.col("start") + (w - 1))
    ord_w = Window.partitionBy("doc").orderBy("start")
    prev_end = F.max("end").over(
        ord_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("start") > prev_end + 1), 1
    ).otherwise(0)
    isl = dwin.withColumn(
        "island",
        F.sum(brk).over(ord_w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("doc", "island")
        .agg(
            F.min("start").cast("long").alias("span_start"),
            F.max("end").cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select("doc", "span_start", "span_end", "n_windows")
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """The cut pass over :func:`duplicated_spans`: rewrite every
    document with its duplicated spans removed, keeping original token
    order. Returns one row per tokenizable document:
    ``(doc, text_kept, n_tokens, n_removed)``.

    Output text is the kept TOKEN stream (lowercased,
    single-space-joined) — whitespace/case normalization is inherent
    to token-level cutting, and a training pipeline re-tokenizes
    immediately anyway. Documents shorter than ``w`` tokens have no
    windows, so they pass through complete; a fully-duplicated
    document survives as ``text_kept = ''`` (row count stable, same
    contract as remove_duplicated_lines).

    Scale shape: span detection's two linear shuffles, plus one
    per-doc anti-join of token positions against span ranges (doc-key
    equi-join with a range residual — never a cross join) and one
    groupBy(doc) reassembly with an in-array sort. Everything linear
    in token mass.
    """
    spans = duplicated_spans(df, id_col, text_col, w, min_count)
    toks = (
        df.select(F.col(id_col).alias("doc"), tokenize_ws(F.col(text_col)).alias("t"))
        .filter(F.size("t") > 0)
        .select("doc", F.posexplode("t").alias("p0", "tok"))
        .select("doc", (F.col("p0") + 1).cast("long").alias("pos"), "tok")
    )
    covered = spans.select("doc", "span_start", "span_end")
    kept = toks.join(
        covered,
        (toks["doc"] == covered["doc"])
        & (toks["pos"] >= covered["span_start"])
        & (toks["pos"] <= covered["span_end"]),
        "left_anti",
    )
    totals = toks.groupBy("doc").agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    return (
        kept.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sort_array(
                F.collect_list(F.struct(F.col("pos"), F.col("tok")))
            ).alias("__ks"),
        )
        .join(totals, "doc", "right")
        .select(
            "doc",
            F.coalesce(
                F.array_join(
                    F.transform(F.col("__ks"), lambda s: s.getField("tok")), " "
                ),
                F.lit(""),
            ).alias("text_kept"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    delimiter: str = "\n",
    frac_bp: int = 5000,
    min_docs: int = 3,
    keep_blank: bool = True,
) -> DataFrame:
    """GROUP-scoped template removal (the RefinedWeb/quality-pipeline
    companion to :func:`remove_duplicated_lines`): a line is
    boilerplate when it appears in at least ``frac_bp`` basis points
    of its OWN group's documents (site navigation, footers, cookie
    banners — repeated within one site, often unique corpus-wide, so
    the global frequency rule never catches them) and in at least
    ``min_docs`` documents (small groups can't convict on 2-of-3).
    Membership is per-DOCUMENT (a doc repeating its own footer twice
    counts once), so a single spammy doc cannot promote a line to
    boilerplate.

    Returns one row per input document:
    ``(id, group, text_kept, n_lines, n_removed)`` with original line
    order preserved and stable row count (same contract as the
    corpus-level operator).

    Scale shape: distinct (group, line-hash, doc) then a groupBy on
    (group, line-hash) — shuffles md5 keys, not text; per-group doc
    counts broadcast back; reassembly is the same single doc-id
    groupBy with an in-array sort. The boilerplate decision is pure
    integer arithmetic (d * 10000 >= frac_bp * n_docs), oracle-exact.
    """
    lines = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(F.split(F.col(text_col), delimiter, -1)).alias("pos", "line"),
    ).withColumn("__lh", F.md5(F.col("line")))
    docs_per_line = (
        lines.select(group_col, "__lh", id_col)
        .distinct()
        .groupBy(group_col, "__lh")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    group_sizes = (
        docs.where(F.col(text_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__nd"))
    )
    bp = (
        docs_per_line.join(F.broadcast(group_sizes), group_col)
        .where(
            (F.col("__d") * 10000 >= F.lit(frac_bp) * F.col("__nd"))
            & (F.col("__d") >= min_docs)
        )
        .select(group_col, "__lh")
    )
    flagged = lines.join(bp, [group_col, "__lh"], "left_semi").select(
        id_col, "pos"
    ).withColumn("__bp", F.lit(True))
    kept_col = F.col("__bp").isNull()
    if keep_blank:
        kept_col = kept_col | (F.trim(F.col("line")) == "")
    merged = lines.join(flagged, [id_col, "pos"], "left").withColumn(
        "__kept", kept_col
    )
    return (
        merged.groupBy(id_col, group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum((~F.col("__kept")).cast("long")).cast("long").alias("n_removed"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__kept"), F.struct(F.col("pos"), F.col("line")))
                )
            ).alias("__ks"),
        )
        .select(
            F.col(id_col),
            F.col(group_col),
            F.array_join(
                F.transform(F.col("__ks"), lambda s: s.getField("line")), delimiter
            ).alias("text_kept"),
            "n_lines",
            "n_removed",
        )
    )


def cdc_chunks_oracle_sql(
    avg_tokens: int = 16,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`cdc_chunks` — same 60-bit md5 boundary
    test, same exclusive-prefix-sum chunk ids, same chunk md5 and
    corpus-wide copy counts."""
    return f"""
    WITH toks AS (
      SELECT {id_col}, i - 1 AS pos, t[i] AS tok
      FROM (
        SELECT {id_col},
               list_filter(regexp_split_to_array({text_col}, '\\s+'),
                           y -> y <> '') AS t
        FROM {table} WHERE {text_col} IS NOT NULL
      ), unnest(generate_series(1, len(t))) AS u(i)
    ), marked AS (
      SELECT {id_col}, pos, tok,
             CASE WHEN ('0x' || substr(md5(tok), 1, 15))::BIGINT
                       % {avg_tokens} = 0 THEN 1 ELSE 0 END AS b
      FROM toks
    ), chunked AS (
      SELECT {id_col}, pos, tok,
             CAST(SUM(b) OVER (PARTITION BY {id_col} ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b
                  AS BIGINT) AS chunk_id
      FROM marked
    ), chunks AS (
      SELECT {id_col}, chunk_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      FROM chunked GROUP BY {id_col}, chunk_id
    ), copies AS (
      SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_copies
      FROM chunks GROUP BY chunk_hash
    )
    SELECT c.{id_col}, c.chunk_id, c.n_tokens, c.chunk_hash, p.n_copies
    FROM chunks c JOIN copies p USING (chunk_hash)
    """
