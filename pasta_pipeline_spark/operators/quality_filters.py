"""Gopher/C4-style document quality rules — the explicit verdict table.

operators/text_analysis.py scores documents on blended heuristics
(quality_score) and repetition (repetition_metrics); real corpus
pipelines additionally want the RULE-SET form popularized by the
Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) and C4
(Raffel et al. 2020) cleaning recipes: one named boolean per rule so
a curator can audit WHICH rule rejected a document and tune thresholds
per corpus. This module is that: per-document rule booleans + an
overall ``pass_all``, every rule a pure Column expression (no UDFs,
codegen-friendly), every ratio an exact integer cross-multiplication
(no doubles → hash-stable across engines).

The oracle SQL is GENERATED from the same thresholds
(:func:`gopher_rules_sql`, playbook: engine and oracle share one
recipe), so the two sides cannot drift.

Rules (thresholds adapted from the Gopher appendix; all tunable):

- ``r_word_count``: ``min_words <= n_words <= max_words``;
- ``r_mean_word_len``: mean token length in [3, 10] chars —
  ``3*n_words <= n_word_chars <= 10*n_words``;
- ``r_symbol_ratio``: '#' or ellipsis symbols per word <= 0.1 —
  ``10*n_symbols <= n_words``;
- ``r_bullet_lines``: <= 90% of lines start with a bullet;
- ``r_ellipsis_lines``: <= 30% of lines end with an ellipsis;
- ``r_alpha_words``: >= 80% of words contain a letter —
  ``5*n_alpha_words >= 4*n_words``;
- ``r_stopwords``: >= 2 DISTINCT common stopwords present (the
  C4-style natural-language gate).

Scale shape: a single projection over the corpus — no joins, no
shuffles, no explode (token statistics fold inside the row via
higher-order functions); Catalyst fuses the whole thing into one
codegen stage over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws

#: Gopher-appendix-flavored thresholds, shared by engine and oracle.
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3
MAX_MEAN_WORD_LEN = 10

#: C4-style stopword gate vocabulary (frozen, tiny by design).
STOPWORD_GATE = ("the", "a", "and", "of", "to", "in", "that", "for", "is", "it")


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document rule verdicts: ``(id, n_words, n_lines, r_*, pass_all)``.

    Three stacked projections, deliberately: the token/line arrays are
    bound to real columns first, then the integer counts, then the
    flags. Higher-order-function lambdas are interpreted and escape
    Spark's subexpression elimination, so the old single-projection
    form re-ran tokenize 4× and the line split 3× per row (and
    ``CollapseProject`` keeps multi-referenced non-cheap aliases in
    their own projection, so the staging survives optimization).
    """
    c = F.col(text_col)
    toks = F.col("__gr_toks")
    lines = F.col("__gr_lines")
    staged = docs.select(
        F.col(id_col),
        c.alias("__gr_text"),
        tokenize_ws(c, lowercase=False).alias("__gr_toks"),
        F.split(c, "\n").alias("__gr_lines"),
    )
    ct = F.col("__gr_text")
    n_words = F.coalesce(F.size(toks), F.lit(0)).cast("long")
    n_word_chars = F.coalesce(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    ).cast("long")
    n_lines = F.coalesce(F.size(lines), F.lit(0)).cast("long")
    n_bullet = F.coalesce(
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("- ") | l.startswith("* ") | l.startswith("• "),
            )
        ),
        F.lit(0),
    ).cast("long")
    n_ell_lines = F.coalesce(
        F.size(F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))),
        F.lit(0),
    ).cast("long")
    n_alpha_words = F.coalesce(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))), F.lit(0)
    ).cast("long")
    n_symbols = (
        F.regexp_count(ct, F.lit("#")) + F.regexp_count(ct, F.lit(r"(\.\.\.|…)"))
    ).cast("long")
    n_stop_distinct = F.coalesce(
        F.size(
            F.array_intersect(
                F.transform(toks, F.lower),
                F.array(*[F.lit(s) for s in STOPWORD_GATE]),
            )
        ),
        F.lit(0),
    ).cast("long")
    counted = staged.select(
        F.col(id_col),
        n_words.alias("__gr_n_words"),
        n_word_chars.alias("__gr_n_word_chars"),
        n_lines.alias("__gr_n_lines"),
        n_bullet.alias("__gr_n_bullet"),
        n_ell_lines.alias("__gr_n_ell"),
        n_alpha_words.alias("__gr_n_alpha_w"),
        n_symbols.alias("__gr_n_symbols"),
        n_stop_distinct.alias("__gr_n_stop"),
    )
    n_words = F.col("__gr_n_words")
    n_word_chars = F.col("__gr_n_word_chars")
    n_lines = F.col("__gr_n_lines")
    n_bullet = F.col("__gr_n_bullet")
    n_ell_lines = F.col("__gr_n_ell")
    n_alpha_words = F.col("__gr_n_alpha_w")
    n_symbols = F.col("__gr_n_symbols")
    n_stop_distinct = F.col("__gr_n_stop")

    r_word_count = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    r_mean_word_len = (n_word_chars >= MIN_MEAN_WORD_LEN * n_words) & (
        n_word_chars <= MAX_MEAN_WORD_LEN * n_words
    ) & (n_words > 0)
    r_symbol_ratio = 10 * n_symbols <= n_words
    r_bullet_lines = 10 * n_bullet <= 9 * n_lines
    r_ellipsis_lines = 10 * n_ell_lines <= 3 * n_lines
    r_alpha_words = 5 * n_alpha_words >= 4 * n_words
    r_stopwords = n_stop_distinct >= 2

    flags = {
        "r_word_count": r_word_count,
        "r_mean_word_len": r_mean_word_len,
        "r_symbol_ratio": r_symbol_ratio,
        "r_bullet_lines": r_bullet_lines,
        "r_ellipsis_lines": r_ellipsis_lines,
        "r_alpha_words": r_alpha_words,
        "r_stopwords": r_stopwords,
    }
    pass_all = None
    for expr in flags.values():
        pass_all = expr if pass_all is None else (pass_all & expr)
    return counted.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        *[expr.alias(name) for name, expr in flags.items()],
        pass_all.alias("pass_all"),
    )


def gopher_rules_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin generated from the SAME thresholds and stopword list
    as :func:`gopher_rules` — engine and oracle cannot drift."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORD_GATE)
    return f"""
    WITH m AS (
      SELECT {id_col},
             CAST(COALESCE(len(list_filter(regexp_split_to_array({text_col}, '\\s+'), y -> y <> '')), 0) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(list_filter(regexp_split_to_array({text_col}, '\\s+'), y -> y <> ''), y -> CAST(length(y) AS BIGINT))), 0) AS BIGINT) AS n_word_chars,
             CAST(COALESCE(len(string_split({text_col}, chr(10))), 0) AS BIGINT) AS n_lines,
             CAST(COALESCE(len(list_filter(string_split({text_col}, chr(10)), l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %')), 0) AS BIGINT) AS n_bullet,
             CAST(COALESCE(len(list_filter(string_split({text_col}, chr(10)), l -> l LIKE '%...' OR l LIKE '%…')), 0) AS BIGINT) AS n_ell_lines,
             CAST(COALESCE(len(list_filter(list_filter(regexp_split_to_array({text_col}, '\\s+'), y -> y <> ''), t -> regexp_matches(t, '[A-Za-z]'))), 0) AS BIGINT) AS n_alpha_words,
             CAST(len(regexp_extract_all({text_col}, '#')) + len(regexp_extract_all({text_col}, '(\\.\\.\\.|…)')) AS BIGINT) AS n_symbols,
             CAST(COALESCE(len(list_intersect(list_transform(list_filter(regexp_split_to_array({text_col}, '\\s+'), y -> y <> ''), t -> lower(t)), [{stop_list}])), 0) AS BIGINT) AS n_stop_distinct
      FROM {table}
    )
    SELECT {id_col}, n_words, n_lines,
           (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS r_word_count,
           (n_word_chars >= {MIN_MEAN_WORD_LEN} * n_words
            AND n_word_chars <= {MAX_MEAN_WORD_LEN} * n_words
            AND n_words > 0) AS r_mean_word_len,
           (10 * n_symbols <= n_words) AS r_symbol_ratio,
           (10 * n_bullet <= 9 * n_lines) AS r_bullet_lines,
           (10 * n_ell_lines <= 3 * n_lines) AS r_ellipsis_lines,
           (5 * n_alpha_words >= 4 * n_words) AS r_alpha_words,
           (n_stop_distinct >= 2) AS r_stopwords,
           ((n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS})
            AND (n_word_chars >= {MIN_MEAN_WORD_LEN} * n_words
                 AND n_word_chars <= {MAX_MEAN_WORD_LEN} * n_words
                 AND n_words > 0)
            AND (10 * n_symbols <= n_words)
            AND (10 * n_bullet <= 9 * n_lines)
            AND (10 * n_ell_lines <= 3 * n_lines)
            AND (5 * n_alpha_words >= 4 * n_words)
            AND (n_stop_distinct >= 2)) AS pass_all
    FROM m
    """


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2) — the LINE tier
# below the page-level rule table: C4's cleaning is famously applied
# per line BEFORE page verdicts, and the two tiers catch different
# garbage (navigation crumbs and cookie banners die at line level;
# template pages die at page level).
# ---------------------------------------------------------------------------

#: C4 keeps lines that end in terminal punctuation...
C4_TERMINAL_RE = "[.!?\"']$"
#: ...and contain at least this many words.
C4_MIN_LINE_WORDS = 5
#: Page-level: at least this many sentences after cleaning.
C4_MIN_SENTENCES = 3


def c4_line_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4's cleaning recipe as one projection: keep lines that end in
    terminal punctuation (. ! ? " ') AND carry >= 5 words; then the
    page verdicts — no ``lorem ipsum``, no ``{`` (code-page tell),
    and >= 3 sentences in the CLEANED text (terminal-punct count, the
    paper's sentence proxy). Returns per document the cleaned text,
    line bookkeeping, and the named page verdicts + ``page_pass`` —
    the audit-friendly verdict-table shape gopher_rules set.

    Pure Column expressions (nested higher-order functions — the line
    filter's word count folds inside the row); the oracle twin
    (:func:`c4_line_clean_sql`) is generated from the SAME constants,
    so engine and oracle cannot drift. One codegen stage over the
    scan; no explode, no shuffle."""
    c = F.col(text_col)
    lines = F.split(c, "\n")

    def line_kept(line):
        t = F.trim(line)
        words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        return t.rlike(C4_TERMINAL_RE) & (words >= C4_MIN_LINE_WORDS)

    kept = F.filter(lines, line_kept)
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.coalesce(
        F.size(F.split(cleaned, r"[.!?]")) - 1, F.lit(0)
    ).cast("long")
    no_lorem = ~F.lower(F.coalesce(c, F.lit(""))).contains("lorem ipsum")
    no_brace = ~F.coalesce(c, F.lit("")).contains("{")
    min_sentences = n_sentences >= C4_MIN_SENTENCES
    return docs.select(
        F.col(id_col),
        F.coalesce(F.size(lines), F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce(F.size(kept), F.lit(0)).cast("long").alias("n_kept"),
        cleaned.alias("cleaned_text"),
        n_sentences.alias("n_sentences"),
        no_lorem.alias("no_lorem"),
        no_brace.alias("no_brace"),
        min_sentences.alias("min_sentences"),
        (no_lorem & no_brace & min_sentences).alias("page_pass"),
    )


def c4_line_clean_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`c4_line_clean`, generated from the same
    constants. Sentence proxy counts terminal-punct splits the same
    way (split-array length - 1)."""
    kept = (
        f"list_filter(str_split({text_col}, chr(10)), l -> "
        f"regexp_matches(trim(l), '[.!?\"'']$') AND "
        f"len(list_filter(regexp_split_to_array(trim(l), '\\s+'), w -> w <> ''))"
        f" >= {C4_MIN_LINE_WORDS})"
    )
    return f"""
    WITH base AS (
      SELECT {id_col},
             str_split({text_col}, chr(10)) AS lines,
             -- array_to_string collapses the empty list to NULL in
             -- DuckDB; an empty kept set must stay '' (only a NULL
             -- input text is NULL), matching Spark's array_join
             CASE WHEN {text_col} IS NULL THEN NULL
                  ELSE COALESCE(array_to_string({kept}, chr(10)), '') END AS cleaned,
             len({kept}) AS n_kept,
             NOT contains(lower(COALESCE({text_col}, '')), 'lorem ipsum') AS no_lorem,
             NOT contains(COALESCE({text_col}, ''), '{{') AS no_brace
      FROM {table}
    )
    SELECT {id_col},
           CAST(COALESCE(len(lines), 0) AS BIGINT) AS n_lines,
           CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
           cleaned AS cleaned_text,
           CAST(COALESCE(len(str_split_regex(cleaned, '[.!?]')) - 1, 0) AS BIGINT)
             AS n_sentences,
           no_lorem, no_brace,
           COALESCE(len(str_split_regex(cleaned, '[.!?]')) - 1, 0)
             >= {C4_MIN_SENTENCES} AS min_sentences,
           no_lorem AND no_brace AND
             (COALESCE(len(str_split_regex(cleaned, '[.!?]')) - 1, 0)
              >= {C4_MIN_SENTENCES}) AS page_pass
    FROM base
    """


# ---------------------------------------------------------------------------
# Curation funnel — the attrition report of a filtering pipeline
# ---------------------------------------------------------------------------

#: Ordered funnel stages: (name, per-doc predicate builder). The funnel
#: is CUMULATIVE — a document is "in" stage k iff it passed stages
#: 1..k-1 — so the report reads as the pipeline actually executes.
FUNNEL_STAGES = ("non_empty", "word_count", "gopher_all", "dedup_survivor")


def curation_funnel(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stagewise attrition report of the standard curation chain —
    the table every corpus paper publishes (cf. FineWeb / RefinedWeb
    ablation tables): for each stage, how many documents entered,
    survived, and were dropped.

    Stages (cumulative conjunction, in pipeline order):

    1. ``non_empty`` — text present and non-empty;
    2. ``word_count`` — Gopher word-count bounds (r_word_count);
    3. ``gopher_all`` — the full Gopher rule conjunction;
    4. ``dedup_survivor`` — exact-dup keep-first survivor (min id per
       md5(text) group).

    One scan computes every per-doc flag (the gopher frame joins the
    dedup window on id), ONE conditional aggregate reduces them to a
    single row of running-conjunction counts, and the 4-row funnel is
    inlined from that scalar row — output is metadata-scale, the only
    fact-scale shuffles are the gopher join and the md5 dedup window.
    """
    from pyspark.sql import Window

    g = gopher_rules(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(F.md5(F.col(text_col).cast("binary"))).orderBy(
        F.asc(id_col)
    )
    surv = docs.select(
        F.col(id_col),
        (F.col(text_col).isNotNull() & (F.length(text_col) > 0)).alias("s1"),
        (F.row_number().over(w) == 1).alias("s4"),
    )
    flags = surv.join(
        g.select(F.col(id_col), F.col("r_word_count").alias("s2"), F.col("pass_all").alias("s3")),
        id_col,
    )
    c = lambda e: F.sum(F.when(e, 1).otherwise(0)).cast("long")  # noqa: E731
    row = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        c(F.col("s1")).alias("n1"),
        c(F.col("s1") & F.col("s2")).alias("n2"),
        c(F.col("s1") & F.col("s2") & F.col("s3")).alias("n3"),
        c(F.col("s1") & F.col("s2") & F.col("s3") & F.col("s4")).alias("n4"),
    )
    stages = [
        (1, FUNNEL_STAGES[0], "n0", "n1"),
        (2, FUNNEL_STAGES[1], "n1", "n2"),
        (3, FUNNEL_STAGES[2], "n2", "n3"),
        (4, FUNNEL_STAGES[3], "n3", "n4"),
    ]
    structs = [
        F.struct(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(nin).alias("n_in"),
            F.col(nout).alias("n_out"),
            (F.col(nin) - F.col(nout)).cast("long").alias("n_dropped"),
        )
        for i, name, nin, nout in stages
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def curation_funnel_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`curation_funnel`, generated over the SAME
    gopher SQL builder so thresholds cannot drift."""
    return f"""
    WITH g AS ({gopher_rules_sql(table, id_col, text_col)}),
    surv AS (
      SELECT {id_col},
             ({text_col} IS NOT NULL AND length({text_col}) > 0) AS s1,
             (row_number() OVER (PARTITION BY md5({text_col})
                                 ORDER BY {id_col} ASC) = 1) AS s4
      FROM {table}
    ),
    flags AS (
      SELECT surv.{id_col}, surv.s1, g.r_word_count AS s2,
             g.pass_all AS s3, surv.s4
      FROM surv JOIN g USING ({id_col})
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN s1 AND s2 AND s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN s1 AND s2 AND s3 AND s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM flags
    )
    SELECT CAST(1 AS BIGINT) AS stage_idx, 'non_empty' AS stage,
           n0 AS n_in, n1 AS n_out, CAST(n0 - n1 AS BIGINT) AS n_dropped FROM agg
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'word_count', n1, n2, CAST(n1 - n2 AS BIGINT) FROM agg
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'gopher_all', n2, n3, CAST(n2 - n3 AS BIGINT) FROM agg
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'dedup_survivor', n3, n4, CAST(n3 - n4 AS BIGINT) FROM agg
    """
