"""bs4-differential HTML parity (VERDICT r1 #4).

The reference extracts title/description/date with BeautifulSoup on the
'html.parser' backend (telegraph_processor.py:194-224). The container
ships no bs4, so these fixtures encode bs4-on-html.parser semantics *by
construction*: each adversarial document is generated around known
field values, with the expected output derived from how that parser
treats the mutation (quote styles, attribute order, entities, nesting,
uppercase tags, token-wise class matching, unclosed elements). The
extractor runs on the same stdlib tokenizer, so agreement here is
agreement with the reference parse, not with a regex approximation.

When bs4 IS present (a real deployment), functions.html switches to
calling it verbatim — and this same suite then differentially tests
that branch against the identical expectations.
"""

from __future__ import annotations

import pytest

from pasta_pipeline_spark.functions.html import _extract_fields

# each case: (doc_label, html, expected_title, expected_desc, expected_date_raw)
CASES = []


def case(label, html, title, desc, date):
    CASES.append(pytest.param(html, title, desc, date, id=label))


# --- quoting styles on meta attributes (html.parser accepts all three) ---
case(
    "meta-double-quoted",
    '<head><meta property="twitter:description" content="plain desc"/></head>',
    None, "plain desc", None,
)
case(
    "meta-single-quoted",
    "<head><meta property='twitter:description' content='single quoted'/></head>",
    None, "single quoted", None,
)
case(
    "meta-unquoted-value",
    "<head><meta property=twitter:description content=oneword></head>",
    None, "oneword", None,
)
case(
    "meta-mixed-quotes",
    "<head><meta property=\"twitter:description\" content='mixed style'/></head>",
    None, "mixed style", None,
)
case(
    "date-single-quoted",
    "<head><meta property='article:published_time' content='2024-01-02T03:04:05Z'/></head>",
    None, None, "2024-01-02T03:04:05Z",
)
case(
    "date-unquoted",
    "<head><meta property=article:published_time content=2024-05-06T07:08:09+00:00></head>",
    None, None, "2024-05-06T07:08:09+00:00",
)

# --- attribute order flips ---
case(
    "meta-content-first",
    '<meta content="reversed order" property="twitter:description">',
    None, "reversed order", None,
)
case(
    "meta-extra-attrs-between",
    '<meta name="x" property="twitter:description" data-a="1" content="spaced out" id="m1">',
    None, "spaced out", None,
)
case(
    "date-content-first",
    '<meta content="2023-12-31T23:59:59Z" property="article:published_time">',
    None, None, "2023-12-31T23:59:59Z",
)

# --- first-match-wins (bs4 find returns the first in document order) ---
case(
    "meta-first-wins",
    '<meta property="twitter:description" content="first">'
    '<meta property="twitter:description" content="second">',
    None, "first", None,
)
case(
    "meta-first-wins-order-flipped",
    '<meta content="first" property="twitter:description">'
    '<meta property="twitter:description" content="second">',
    None, "first", None,
)

# --- matching tag without content attr → .get('content','') → '' ---
case(
    "meta-missing-content",
    '<meta property="twitter:description">',
    None, "", None,
)
# reference turns an empty/whitespace date into None (`if date_str:`)
case(
    "date-missing-content",
    '<meta property="article:published_time">',
    None, None, None,
)
case(
    "date-blank-content",
    '<meta property="article:published_time" content="   ">',
    None, None, None,
)

# --- entity decoding (html.parser decodes attrs and text) ---
case(
    "entities-in-content",
    '<meta property="twitter:description" content="a &amp; b &#8211; c">',
    None, "a & b – c", None,
)
case(
    "entities-in-title",
    "<title>Caf&eacute; &amp; Bar</title>",
    "Café & Bar", None, None,
)
case(
    "numeric-entity-title-suffix",
    "<title>Story &#8211; Telegraph</title>",
    # &#8211; decodes to the en dash of ' – Telegraph', so the suffix strips
    "Story", None, None,
)

# --- title handling ---
case("title-plain", "<title>Just A Title</title>", "Just A Title", None, None)
case(
    "title-telegraph-suffix",
    "<title>My Story – Telegraph</title>",
    "My Story", None, None,
)
case(
    "title-whitespace",
    "<title>\n   Padded Title \t</title>",
    "Padded Title", None, None,
)
case(
    "title-nested-tags",
    "<title>Broken <b>Bold</b> Title</title>",
    "Broken Bold Title", None, None,
)
case("title-empty", "<title></title>", "", None, None)
case(
    "title-first-wins",
    "<title>One</title><title>Two</title>",
    "One", None, None,
)
case("title-uppercase-tag", "<TITLE>Loud Title</TITLE>", "Loud Title", None, None)

# --- header/h1 extraction (token-wise class matching) ---
_H1 = '<header class="tl_article_header"><h1>Header Title</h1></header>'
case("h1-beats-title", f"<title>Page – Telegraph</title>{_H1}", "Header Title", None, None)
case(
    "h1-multi-class",
    '<header class="x tl_article_header y"><h1>Multi Class</h1></header>',
    "Multi Class", None, None,
)
case(
    "h1-single-quoted-class",
    "<header class='tl_article_header'><h1>SQ Class</h1></header>",
    "SQ Class", None, None,
)
case(
    "h1-class-substring-no-match",
    # class token is tl_article_headerX — bs4 class_ matching is per
    # token, so this header does NOT match and title wins
    '<title>Fallback</title><header class="tl_article_headerX"><h1>Nope</h1></header>',
    "Fallback", None, None,
)
case(
    "h1-nested-inline-tags",
    '<header class="tl_article_header"><h1>Big <em>emph &amp; co</em> end</h1></header>',
    "Big emph & co end", None, None,
)
case(
    "h1-double-nested-h1",
    '<header class="tl_article_header"><h1>Outer <h1>Inner</h1> tail</h1></header>',
    # html.parser nests the inner h1; get_text concatenates all of it
    "Outer Inner tail", None, None,
)
case(
    "header-no-h1-falls-to-title",
    '<title>T2 – Telegraph</title><header class="tl_article_header"><p>no h1</p></header>',
    "T2", None, None,
)
case(
    "h1-outside-header-ignored",
    "<h1>Stray</h1><title>Real Title</title>",
    "Real Title", None, None,
)
case(
    "h1-before-header-ignored",
    '<h1>Early</h1><header class="tl_article_header"><h1>Late</h1></header>',
    "Late", None, None,
)
case(
    "first-matching-header-wins",
    '<header class="tl_article_header"><h1>First</h1></header>'
    '<header class="tl_article_header"><h1>Second</h1></header>',
    "First", None, None,
)
case(
    "unclosed-header-still-captures",
    '<header class="tl_article_header"><div><h1>Unclosed</h1>',
    "Unclosed", None, None,
)
case(
    "header-uppercase-tags",
    '<HEADER CLASS="tl_article_header"><H1>Shouty</H1></HEADER>',
    "Shouty", None, None,
)
case(
    "h1-whitespace-strip",
    '<header class="tl_article_header"><h1>  spaced h1\n</h1></header>',
    "spaced h1", None, None,
)
case(
    "h1-empty",
    '<header class="tl_article_header"><h1></h1></header>',
    "", None, None,
)

# --- mrakopedia prefix strip (reference quirk, decoded-length strip) ---
case(
    "mrako-plain",
    '<meta property="twitter:description" content="https://mrakopedia.net/wiki/Story rest of text">',
    None, "rest of text", None,
)
case(
    "mrako-percent-encoded",
    # decoded name 'Жуть' (4 chars + prefix) — strip length comes from
    # the DECODED name, so part of the raw encoded tail survives: this
    # is the reference's own quirk, replicated bit-for-bit
    '<meta property="twitter:description" content="https://mrakopedia.net/wiki/%D0%96%D1%83%D1%82%D1%8C tail">',
    None,
    "https://mrakopedia.net/wiki/%D0%96%D1%83%D1%82%D1%8C tail"[
        len("https://mrakopedia.net/wiki/") + 4:
    ].strip(),
    None,
)
case(
    "mrako-no-tail",
    '<meta property="twitter:description" content="https://mrakopedia.net/wiki/OnlyName">',
    None, "", None,
)
case(
    "mrako-lookalike-not-stripped",
    '<meta property="twitter:description" content="see https://mrakopedia.net/wiki/X inside">',
    None, "see https://mrakopedia.net/wiki/X inside", None,
)

# --- combined documents ---
case(
    "full-document",
    """<html><head><title>Full – Telegraph</title>
<meta property="og:title" content="decoy">
<meta property='twitter:description' content='full &quot;desc&quot;'>
<meta content="2024-03-04T05:06:07Z" property="article:published_time">
</head><body>
<header class="wrap tl_article_header"><h1>Full <span>Doc</span></h1></header>
<p>body</p></body></html>""",
    "Full Doc", 'full "desc"', "2024-03-04T05:06:07Z",
)
case(
    "no-fields-at-all",
    "<html><body><p>nothing here</p></body></html>",
    None, None, None,
)
case(
    "decoy-meta-name-not-property",
    # bs4 find(property=...) requires the property attr; name= does not match
    '<meta name="twitter:description" content="not this one">',
    None, None, None,
)
case(
    "property-case-sensitive",
    # attribute *values* are case-sensitive in bs4 matching
    '<meta property="Twitter:Description" content="wrong case">',
    None, None, None,
)
case(
    "meta-self-closing-xhtml",
    '<meta property="twitter:description" content="xhtml style" />',
    None, "xhtml style", None,
)
case(
    "meta-inside-body",
    '<body><meta property="twitter:description" content="late meta"></body>',
    None, "late meta", None,
)
case(
    "comment-not-parsed",
    '<!-- <meta property="twitter:description" content="in comment"> -->'
    "<title>After Comment</title>",
    "After Comment", None, None,
)
case(
    "attr-value-with-gt",
    '<meta property="twitter:description" content="a > b">',
    None, "a > b", None,
)
case(
    "title-with-attrs",
    '<title data-x="1">Attr Title</title>',
    "Attr Title", None, None,
)
case(
    "desc-whitespace-stripped",
    '<meta property="twitter:description" content="  padded  ">',
    None, "padded", None,
)
case(
    "date-trailing-space-stripped",
    '<meta property="article:published_time" content=" 2022-02-02T02:02:02Z ">',
    None, None, "2022-02-02T02:02:02Z",
)
case(
    "cyrillic-content",
    '<header class="tl_article_header"><h1>Жуткая история</h1></header>'
    '<meta property="twitter:description" content="Очень страшно">',
    "Жуткая история", "Очень страшно", None,
)
case(
    "crlf-document",
    '<head>\r\n<title>CRLF – Telegraph</title>\r\n'
    '<meta property="twitter:description"\r\n content="multi line attr">\r\n</head>',
    "CRLF", "multi line attr", None,
)
case(
    "stray-lt-in-text",
    "<title>Math 1 < 2 stays</title>",
    # html.parser treats '< 2' as text (invalid tag start is data)
    "Math 1 < 2 stays", None, None,
)
case(
    "duplicate-date-first-wins",
    '<meta property="article:published_time" content="2020-01-01T00:00:00Z">'
    '<meta property="article:published_time" content="2021-01-01T00:00:00Z">',
    None, None, "2020-01-01T00:00:00Z",
)


assert len(CASES) >= 50, f"adversarial corpus too small: {len(CASES)}"


@pytest.mark.parametrize("html,title,desc,date", CASES)
def test_reference_parse_semantics(html, title, desc, date):
    got_title, got_desc, got_date = _extract_fields(html)
    assert got_title == title
    assert got_desc == desc
    assert got_date == date


def test_corpus_size():
    assert len(CASES) >= 50


def test_spark_stage_matches_direct_extraction(spark):
    """The Arrow-batched pandas-UDF stage must produce exactly what the
    per-document extractor produces, across the whole adversarial
    corpus in one DataFrame pass."""
    from pasta_pipeline_spark.functions.html import with_html_fields

    docs = [(i, c.values[0]) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(docs, "id long, content string")
    rows = {r["id"]: r for r in with_html_fields(df, "content").collect()}
    for i, c in enumerate(CASES):
        html, title, desc, _date = c.values
        assert rows[i]["title"] == title, c.id
        assert rows[i]["description"] == desc, c.id
