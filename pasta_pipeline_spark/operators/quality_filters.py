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
    """Per-document rule verdicts: ``(id, n_words, n_lines, r_*, pass_all)``."""
    c = F.col(text_col)
    toks = tokenize_ws(c, lowercase=False)
    n_words = F.coalesce(F.size(toks), F.lit(0)).cast("long")
    n_word_chars = F.coalesce(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    ).cast("long")
    lines = F.split(c, "\n")
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
        F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"(\.\.\.|…)"))
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
    return docs.select(
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
