"""Main-text extraction — boilerplate removal for web corpora.

Between "fetch the HTML" and every text operator in this package sits
the extraction step: drop navigation, footers, cookie banners, and
link farms, keep the article. The robust public heuristics
(boilerpipe, jusText) classify text BLOCKS by length and link
density — boilerplate blocks are short and link-saturated, content
blocks are long prose with few anchors. This module is that
heuristic as pure Catalyst expressions:

1. remove ``script``/``style``/``noscript`` subtrees;
2. convert block-level tags to newlines (block segmentation);
3. per block: the character mass inside ``<a>`` anchors (link mass,
   measured BEFORE inline tags are stripped) and the tag-stripped,
   entity-decoded, whitespace-collapsed text;
4. keep blocks with ``len >= min_chars`` and integer link density
   ``link_chars * 10000 div len <= max_link_bp``;
5. reassemble kept blocks in document order.

No UDF, no HTML parser dependency, every regex backreference-free
(RE2-portable) — the whole pipeline has a byte-exact DuckDB twin, so
extraction is full-hash oracle-checkable. For pathological HTML the
Arrow-batched parser stage (functions/html.py) is the fallback; this
expression form is the 100 TB bulk path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tags whose whole subtree is noise.
_SUBTREE_TAGS = ("script", "style", "noscript")
#: Tags that terminate a text block.
_BLOCK_TAG_RE = r"(?i)</?(p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|td|table|section|article|header|footer|nav|blockquote)[^>]*>"
_ANCHOR_RE = r"(?is)<a[^>]*>(.*?)</a>"

#: Minimal entity set, applied in fixed order (both engines).
_ENTITIES = (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
             ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


def _seg_expr(html: Column) -> Column:
    """Segment HTML into newline-separated blocks (steps 1-2)."""
    c = html
    for t in _SUBTREE_TAGS:
        c = F.regexp_replace(c, f"(?is)<{t}[^>]*>.*?</{t}>", " ")
    return F.regexp_replace(c, _BLOCK_TAG_RE, "\n")


def _clean_expr(line: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse one block."""
    c = F.regexp_replace(line, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 40,
    max_link_bp: int = 3000,
    out_col: str = "main_text",
) -> DataFrame:
    """``(id, main_text, n_blocks_kept, n_blocks_total)`` per
    document — see module docstring for the block heuristic. Documents
    whose every block is boilerplate yield an empty string (kept row,
    not a drop — routing is the caller's policy). One explode + one
    groupBy on the doc id; everything else is expression work inside
    the scan."""
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(_seg_expr(F.col(html_col)), "\n")).alias("pos", "raw"),
    )
    link_mass = F.aggregate(
        F.transform(
            F.regexp_extract_all(F.col("raw"), F.lit(_ANCHOR_RE), 1),
            lambda s: F.length(_clean_expr(s)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    scored = blocks.select(
        id_col,
        "pos",
        _clean_expr(F.col("raw")).alias("text"),
        link_mass.alias("link_chars"),
    ).withColumn(
        "keep",
        (F.length("text") >= min_chars)
        & (
            F.col("link_chars") * 10000
            <= F.lit(max_link_bp) * F.greatest(F.length("text"), F.lit(1))
        ),
    ).where(F.col("text") != "")
    return (
        scored.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("text")),
                            )
                        )
                    ),
                    lambda s: s.getField("text"),
                ),
                "\n",
            ).alias(out_col),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_blocks_kept"),
            F.count(F.lit(1)).cast("long").alias("n_blocks_total"),
        )
    )
