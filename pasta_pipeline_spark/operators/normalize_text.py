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
