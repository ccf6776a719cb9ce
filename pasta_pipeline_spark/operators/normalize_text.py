"""Unicode text normalization — the pre-tokenization hygiene stage.

Corpora scraped from the web mix composed and decomposed Unicode
(``é`` vs ``e+U+0301``), control-character debris, and whitespace
floods; tokenizers and hash-based dedup treat those as DIFFERENT
bytes, silently splitting what is one logical document. The standard
fix is NFC + cleanup before anything downstream hashes the text.

Split by where the work can run:

- :func:`clean_text` — control-char strip, whitespace collapse/trim,
  optional lowercase: pure Column expressions (portable regexes), stays
  in codegen, oracle-exact;
- :func:`nfc_normalize` — Unicode NFC composition. Spark has no
  built-in normalizer, so this is one of the sanctioned Arrow-batched
  Python stages (SURVEY §2.10): a pandas UDF over
  ``unicodedata.normalize("NFC", ...)``, still oracle-checkable
  because DuckDB ships ``nfc_normalize`` and both implement the same
  Unicode standard;
- :func:`normalize_documents` — the composed stage (NFC first, then
  cleanup, matching the order real pipelines use: composition can
  merge a combining mark into a precomposed char BEFORE the
  control-strip runs).

Scale shape: per-row projection, no shuffle; the only Python is the
NFC batch loop (Arrow transfer, vectorized string ops around it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: C0/C1 control chars except tab/newline/carriage-return (kept:
#: they're whitespace, handled by the collapse step).
_CONTROL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


@F.pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def nfc_normalize(text: Column | str) -> Column:
    """Unicode NFC composition (Arrow-batched; DuckDB twin:
    ``nfc_normalize``)."""
    c = F.col(text) if isinstance(text, str) else text
    return _nfc_udf(c)


def clean_text(text: Column | str, lowercase: bool = False) -> Column:
    """Control-char strip + whitespace collapse + trim (+ optional
    lowercase) — pure expressions, portable regexes."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, _CONTROL_PATTERN, "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return c


def clean_text_sql(expr: str, lowercase: bool = False) -> str:
    """Generated DuckDB twin of :func:`clean_text` (same patterns)."""
    s = f"regexp_replace({expr}, '{_CONTROL_PATTERN}', '', 'g')"
    s = f"regexp_replace({s}, '\\s+', ' ', 'g')"
    s = f"trim({s})"
    if lowercase:
        s = f"lower({s})"
    return s


def normalize_documents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    lowercase: bool = False,
) -> DataFrame:
    """NFC + cleanup, appended as ``out_col``; also emits
    ``changed`` (did normalization alter the text?) so the hygiene
    rate is auditable per corpus."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    norm = clean_text(nfc_normalize(F.col(text_col)), lowercase=lowercase)
    return df.withColumn(out_col, norm).withColumn(
        "changed", ~F.col(out_col).eqNullSafe(F.col(text_col))
    )


# ---------------------------------------------------------------------------
# Mojibake repair — UTF-8 bytes mis-decoded as Windows-1252
# ---------------------------------------------------------------------------
#
# The classic web-corpus corruption (ftfy's headline case): a page's
# UTF-8 bytes were decoded as cp1252 somewhere upstream, so "é"
# (UTF-8 C3 A9) arrives as "Ã©". The repair table is COMPUTED, not
# guessed: for each target character, the mojibake sequence is the
# round trip ``target.encode('utf-8').decode('cp1252')`` (latin-1 for
# the five bytes cp1252 leaves unmapped) — the same derivation both
# the Spark replace chain and the SQL oracle twin are generated from,
# so the two engines cannot drift.

#: Characters whose cp1252-mojibake forms are repaired, most frequent
#: web-text victims first. Longer sequences (3-char punctuation) are
#: applied before 2-char accents so a prefix can never shadow them.
MOJIBAKE_TARGETS = (
    "’‘“”–—…€"  # ’ ‘ “ ” – — … €
    "éèêàâäöüñ"  # é è ê à â ä ö ü ñ
    "áóúíçß«»©"  # á ó ú í ç ß « » ©
    "ïîìôòûùë "  # ï î ì ô ò û ù ë nbsp
)


def _mojibake_pairs() -> list[tuple[str, str]]:
    pairs = []
    for ch in MOJIBAKE_TARGETS:
        raw = ch.encode("utf-8")
        try:
            moji = raw.decode("cp1252")
        except UnicodeDecodeError:
            moji = raw.decode("latin-1")
        pairs.append((moji, ch))
    # longest mojibake first: "â€™" must run before any 2-char rule
    # that could consume its prefix
    pairs.sort(key=lambda p: -len(p[0]))
    return pairs


def repair_mojibake(text: Column | str) -> Column:
    """Undo cp1252 mojibake for the computed repair table: one chained
    ``replace`` per target character, longest sequences first. Pure
    expressions — stays in codegen, no UDF; text without mojibake
    passes through byte-identical. (Full ftfy also handles doubly
    encoded text and other legacy codepages; this covers the dominant
    single-pass cp1252 case.)"""
    c = F.col(text) if isinstance(text, str) else text
    for moji, ch in _mojibake_pairs():
        c = F.replace(c, F.lit(moji), F.lit(ch))
    return c


def mojibake_repair_sql(expr: str) -> str:
    """DuckDB twin of :func:`repair_mojibake`, generated from the same
    computed pairs (single-quote escaping applied)."""
    for moji, ch in _mojibake_pairs():
        m = moji.replace("'", "''")
        t = ch.replace("'", "''")
        expr = f"replace({expr}, '{m}', '{t}')"
    return expr
