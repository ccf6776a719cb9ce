"""PII detection and redaction over text columns.

A first-class pre-training hygiene stage: count and strip personally
identifiable information (emails, phone numbers, IPv4 addresses)
before text enters a training corpus. The reference has no PII
surface (its texts are public Telegraph articles); this extends the
reference's regex-extraction discipline (dags/utils/utils.py:4-17 —
compile once, findall, post-strip) to the removal direction.

Engine notes:

- Every pattern is deliberately portable across Java regex (Spark),
  RE2 (the DuckDB oracle), and Python ``re`` (the differential unit
  tests): no backreferences, no lookaround, no possessive
  quantifiers, ASCII classes only. This is what makes the redaction
  *oracle-checkable* — the same pattern text runs in all three
  engines.
- Detection/redaction are pure native expressions (``regexp_count`` /
  ``regexp_replace``) — whole-stage codegen applies, no Python in the
  hot path, scales linearly with a parquet scan.
- Redaction order is fixed (emails → phones → IPv4) and matters:
  ``user@10.0.0.1``-style strings must resolve to one placeholder,
  not a nested rewrite, so later patterns see earlier placeholders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Portable email pattern (no TLD list — length-2+ alpha suffix).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: International-prefix phone numbers: +CC then 2-4 digit groups
#: separated by ``-`` or `` ``. Deliberately requires the ``+`` so
#: plain integers / ids in text never count as phones.
PHONE_PATTERN = r"\+[0-9]{1,3}[- ][0-9]{2,4}([- ][0-9]{2,4}){1,3}"

#: Dotted-quad IPv4 (word-bounded; octet range not validated — this is
#: a redaction net, over-matching 999.1.1.1 is the safe direction).
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

#: (name, pattern, placeholder) in fixed application order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
]


def pii_count(col: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (long).
    DuckDB twin: ``CAST(len(regexp_extract_all(x, pat)) AS BIGINT)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern)).cast("long")


def redact_pii(col: Column | str, rules: list[tuple[str, str, str]] | None = None) -> Column:
    """Replace every PII match with its placeholder, applying ``rules``
    in order (emails before IPs — see module docstring). DuckDB twin:
    nested ``regexp_replace(..., 'g')`` in the same order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, placeholder in rules or PII_RULES:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def scan_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII profile: one count column per rule plus the
    redacted text. One narrow projection — no shuffle, no UDF."""
    counts = [
        pii_count(text_col, pattern).alias(f"n_{name}") for name, pattern, _ in PII_RULES
    ]
    return df.select(
        F.col(id_col),
        *counts,
        redact_pii(text_col).alias("redacted"),
    )


def pseudonymize(col: Column | str, salt: str, length: int = 16) -> Column:
    """Join-preserving keyed pseudonym: ``sha2(salt || ':' || value,
    256)`` truncated to ``length`` hex chars. Equal values map to
    equal pseudonyms (joins, groupBys, and dedup still work across
    pseudonymized tables sharing the salt) while the original
    identifier is not recoverable without the salt — the governance
    step between raw-ID and no-ID data. NULL stays NULL.

    Pure expression (JVM sha2 == DuckDB sha256 bit-for-bit, verified),
    so pseudonymized pipelines stay full-hash oracle-checkable. At
    100 TB: one projection, no shuffle; rotate the salt per release to
    break cross-release linkage.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.sha2(F.concat(F.lit(salt), F.lit(":"), c.cast("string")), 256), 1, length
    )


def pseudonymize_columns(
    df: DataFrame, cols: list[str], salt: str, length: int = 16
) -> DataFrame:
    """Replace each named column with its keyed pseudonym in place."""
    out = df
    for c in cols:
        out = out.withColumn(c, pseudonymize(c, salt, length))
    return out


#: Credit-card CANDIDATES: 13-19 digits allowing single space/dash
#: group separators, word-bounded. A regex alone over-matches any
#: long number; the Luhn checksum below is what separates real card
#: numbers from ids/timestamps — the precision upgrade every
#: production PII scanner applies.
CC_CANDIDATE_PATTERN = r"\b[0-9](?:[ -]?[0-9]){12,18}\b"


def luhn_valid(c: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) as pure expressions: strip
    non-digits, then from the RIGHT double every second digit
    (subtracting 9 above 9) and require the sum ≡ 0 mod 10, with the
    13-19 digit length gate. HOF transform + aggregate — no UDF, no
    explode; runs inside an array filter so a document's candidate
    list validates in one projection. Guard order matters: the length
    gate short-circuits the sequence() so the empty-string descending
    -sequence quirk can never fire."""
    d = F.regexp_replace(c, "[^0-9]", "")
    length = F.length(d)

    def term(i):
        v = F.ascii(d.substr(length - i + 1, F.lit(1))) - 48
        dbl = v * 2
        return F.when(i % 2 == 1, v).otherwise(
            dbl - F.when(dbl > 9, F.lit(9)).otherwise(F.lit(0))
        )

    checksum = F.aggregate(
        F.transform(F.sequence(F.lit(1), length), term),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(
        (length >= 13) & (length <= 19), checksum % 10 == 0
    ).otherwise(F.lit(False))


def scan_credit_cards(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document credit-card report: candidate count (regex) and
    Luhn-VALID count — the number that matters; regex-only scanners
    flag ~10% of arbitrary long numbers, the checksum eliminates them
    at 9-in-10 odds per candidate. Expression-only projection."""
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(CC_CANDIDATE_PATTERN), F.lit(0)
    )
    valid = F.filter(cands, luhn_valid)
    return df.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("n_cc_candidates"),
        F.size(valid).cast("long").alias("n_cc_valid"),
    )
