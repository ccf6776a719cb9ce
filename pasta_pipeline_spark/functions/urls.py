"""URL handling — P2/P7/F8/F9 in SURVEY.md §2.

Parity sources:
- scalarization + brace strip: /root/reference/dags/processors/db_loader.py:57-78
- cleaning + validation:       /root/reference/dags/processors/telegraph_processor.py:96-125
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scalarize_link(links: Column | str) -> Column:
    """First element of a link array, trimmed, ``{…}``-stripped,
    empty→NULL — the load-time scalarization P2 (db_loader.py:57-78).

    Null-safe: null/empty arrays → NULL.
    """
    c = F.col(links) if isinstance(links, str) else links
    # F.get is null-safe on empty arrays (element_at raises under the
    # ANSI mode that Spark 4 defaults to)
    first = F.get(c, 0)
    return clean_link(first)


def clean_link(link: Column | str) -> Column:
    """Trim; strip one surrounding ``{…}`` pair; ''/'{}' → NULL.

    Parity: db_loader.py:71-78 and telegraph_processor.py:101-103.
    """
    c = F.col(link) if isinstance(link, str) else link
    t = F.trim(c)
    unbraced = F.when(
        t.startswith("{") & t.endswith("}") & (F.length(t) >= 2),
        t.substr(F.lit(2), F.length(t) - 2),
    ).otherwise(t)
    return F.when(unbraced.isNull() | (unbraced == "") | (unbraced == "{}"), None).otherwise(
        unbraced
    )


def is_valid_telegraph_url(url: Column | str) -> Column:
    """scheme == https AND host == telegra.ph AND path length > 1.

    Parity: validate_telegraph_url (telegraph_processor.py:117-125),
    via native ``parse_url`` instead of Python urlparse.
    """
    c = F.col(url) if isinstance(url, str) else url
    # try_parse_url: malformed URLs yield NULL (plain parse_url raises
    # under Spark 4's default ANSI mode, where the reference's
    # try/except-False behavior maps to null-is-false)
    proto = F.try_parse_url(c, F.lit("PROTOCOL"))
    host = F.try_parse_url(c, F.lit("HOST"))
    path = F.try_parse_url(c, F.lit("PATH"))
    return (
        c.isNotNull()
        & (proto == "https")
        & (host == "telegra.ph")
        & (F.length(F.coalesce(path, F.lit(""))) > 1)
    )


def url_decode(col: Column | str) -> Column:
    """Percent-decode (F9, telegraph_processor.py:208-213)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.url_decode(c)


def url_host(url: Column | str) -> Column:
    """Hostname of a URL (NULL for malformed input) — the grouping key
    for per-site corpus curation (crawl budgeting, site-level quality
    priors, blocklists)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(c, F.lit("HOST"))


def registrable_domain(host: Column | str) -> Column:
    """Last-two-labels approximation of the registrable domain
    (``cdn.assets.example.com`` → ``example.com``).

    A faithful eTLD+1 needs the public-suffix list (multi-label
    suffixes like ``co.uk`` are mis-split here) — documented contract:
    ship the PSL as a broadcast join table when that precision
    matters; this expression form is the shuffle-free default.
    """
    c = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(c, r"([^.]+\.[^.]+)$", 1)


#: Representative multi-label public suffixes (publicsuffix.org — the
#: Mozilla-maintained PUBLIC dataset every browser ships). This subset
#: covers the highest-traffic ccTLD registries; deployments needing
#: the full ~9k-entry list load it with :func:`psl_suffix_frame` and
#: use :func:`registrable_domain_join` (broadcast join) instead.
PSL_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "gen.in",
    "co.kr", "ne.kr", "or.kr", "re.kr",
    "co.nz", "net.nz", "org.nz",
    "com.mx", "org.mx", "com.sg", "com.tr", "com.ar", "com.co",
    "co.za", "org.za", "co.th", "co.id", "com.my", "com.hk",
    "com.tw", "com.ua", "co.il", "com.eg", "com.sa", "com.pk",
    # 3-label registry suffixes (state school registries, PSL entries)
    "act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
)


def registrable_domain_psl(
    host: Column | str, multi_suffixes: tuple[str, ...] | list[str] = PSL_MULTI_SUFFIXES
) -> Column:
    """Registrable domain (eTLD+1) with multi-label public-suffix
    awareness — the precision upgrade :func:`registrable_domain`'s
    docstring promises: ``news.bbc.co.uk`` → ``bbc.co.uk`` (not
    ``co.uk``), while single-label TLDs keep the last-two-labels rule.

    Pure expressions: the host's last 2 and last 3 labels are tested
    against the inlined suffix list (longest match wins; ``isin``
    folds into the scan predicate — zero joins, zero shuffles), and
    the matched suffix extends the kept window by one label. A host
    that IS a public suffix exactly (no registrable part) falls back
    to the last-two-labels rule, identically in the SQL twin. For the
    full PSL use :func:`registrable_domain_join`."""
    h = F.col(host) if isinstance(host, str) else host
    ls = F.split(h, r"\.")
    n = F.size(ls)
    two = [s for s in multi_suffixes if s.count(".") == 1]
    three = [s for s in multi_suffixes if s.count(".") == 2]
    c2 = F.array_join(F.slice(ls, n - 1, 2), ".")
    c3 = F.array_join(F.slice(ls, n - 2, 3), ".")
    out = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    # a host that IS a listed 3-label suffix exactly has no registrant
    # under the 2-label upgrade either — same fallback as bare "co.uk"
    bare3 = (n == 3) & h.isin(*three) if three else F.lit(False)
    if two:
        out = F.when(
            (n >= 3) & c2.isin(*two) & ~bare3,
            F.array_join(F.slice(ls, n - 2, 3), "."),
        ).otherwise(out)
    if three:
        out = F.when(
            (n >= 4) & c3.isin(*three), F.array_join(F.slice(ls, n - 3, 4), ".")
        ).otherwise(out)
    return out


def psl_suffix_frame(spark, suffixes=PSL_MULTI_SUFFIXES):
    """``(suffix, n_labels)`` frame for :func:`registrable_domain_join`
    — load the full publicsuffix.org list here in a real deployment
    (~9k rows: pure broadcast scale)."""
    return spark.createDataFrame(
        [(s, s.count(".") + 1) for s in suffixes], "suffix string, n_labels int"
    )


def registrable_domain_join(
    df, host_col: str, psl, out_col: str = "domain"
):
    """Full-PSL registrable domain via broadcast join — the scale path
    when the suffix list is too large to inline in a predicate: each
    host emits its last-2 and last-3 label candidates, one broadcast
    left join per candidate width resolves membership, and the longest
    matched suffix wins (fallback: last two labels). Two broadcast
    hash joins against a ~9k-row table — no shuffle of the corpus."""
    h = F.col(host_col)
    ls = F.split(h, r"\.")
    n = F.size(ls)
    with_c = df.withColumn(
        "__c2", F.when(n >= 2, F.array_join(F.slice(ls, n - 1, 2), "."))
    ).withColumn("__c3", F.when(n >= 3, F.array_join(F.slice(ls, n - 2, 3), ".")))
    p2 = psl.filter(F.col("n_labels") == 2).select(F.col("suffix").alias("__s2"))
    p3 = psl.filter(F.col("n_labels") == 3).select(F.col("suffix").alias("__s3"))
    joined = with_c.join(
        F.broadcast(p2), with_c["__c2"] == F.col("__s2"), "left"
    ).join(F.broadcast(p3), F.col("__c3") == F.col("__s3"), "left")
    ls2 = F.split(F.col(host_col), r"\.")
    n2 = F.size(ls2)
    domain = (
        F.when(
            F.col("__s3").isNotNull() & (n2 >= 4),
            F.array_join(F.slice(ls2, n2 - 3, 4), "."),
        )
        .when(
            # exact-3-label-suffix hosts (__s3 matched, n == 3) have no
            # registrant — fall through to the last-two-labels rule
            F.col("__s2").isNotNull() & (n2 >= 3) & F.col("__s3").isNull(),
            F.array_join(F.slice(ls2, n2 - 2, 3), "."),
        )
        .otherwise(F.regexp_extract(F.col(host_col), r"([^.]+\.[^.]+)$", 1))
    )
    return joined.withColumn(out_col, domain).drop("__c2", "__c3", "__s2", "__s3")


def parse_psl_lines(lines, value_col: str = "value"):
    """Parse raw publicsuffix.org list lines (the
    ``public_suffix_list.dat`` format: ``spark.read.text`` the file
    and pass the result) into a typed rules frame
    ``(suffix, n_labels, kind)``:

    - ``kind='rule'``      — a literal suffix (``com``, ``co.uk``);
    - ``kind='wildcard'``  — ``*.ck`` style; ``suffix`` holds the part
      AFTER ``*.`` and ``n_labels`` counts the ``*`` label, matching
      the spec ("the wildcard matches exactly one label");
    - ``kind='exception'`` — ``!www.ck`` style; ``suffix`` without
      the ``!``.

    Comments (``//``), blank lines, and surrounding whitespace are
    dropped per the spec ("each line is only read up to the first
    whitespace"). Pure expressions over the lines frame — the full
    ~15k-line file parses in one projection and stays broadcast-sized.
    """
    t = F.regexp_extract(F.trim(F.col(value_col)), r"^(\S+)", 1)
    rules = lines.select(t.alias("__raw")).where(
        (F.col("__raw") != "") & ~F.col("__raw").startswith("//")
    )
    body = F.when(
        F.col("__raw").startswith("!"), F.expr("substr(__raw, 2)")
    ).otherwise(F.col("__raw"))
    kind = (
        F.when(F.col("__raw").startswith("!"), F.lit("exception"))
        .when(body.startswith("*."), F.lit("wildcard"))
        .otherwise(F.lit("rule"))
    )
    suffix = F.when(body.startswith("*."), F.expr("substr(__body, 3)")).otherwise(
        F.col("__body")
    )
    return (
        rules.withColumn("__body", body)
        .select(
            suffix.alias("suffix"),
            F.size(F.split(F.col("__body"), r"\.")).alias("n_labels"),
            kind.alias("kind"),
        )
        .where(F.col("suffix") != "")
    )


def registrable_domain_psl_full(df, host_col: str, rules, out_col: str = "domain"):
    """Registrable domain (eTLD+1) under the COMPLETE publicsuffix.org
    algorithm — literal rules, ``*.`` wildcard rules, and ``!``
    exception rules from :func:`parse_psl_lines` — as a chain of
    broadcast left joins (no shuffle of the corpus; the rules table is
    kilobytes).

    Per the spec: any matching exception rule prevails and the
    registrable domain IS the exception's suffix; otherwise the
    longest matching rule wins and the domain is the suffix plus one
    label; a wildcard's ``*`` consumes exactly one host label;
    unmatched hosts fall back to the implicit ``*`` rule (TLD = last
    label → domain = last two labels). Hosts that ARE a public suffix
    (no registrant label left) keep the practical last-(w+1 capped at
    n) fallback rather than NULLing out mid-pipeline.

    The join ladder is derived from the rules frame itself — one
    metadata-scale ``distinct(kind, n_labels)`` collect over the
    kilobyte rules table picks exactly the widths present, so the
    real PSL's 4- and 5-label rules (mostly the private section, e.g.
    ``*.s3.dualstack.<region>.amazonaws.com``) resolve via their own
    width instead of silently falling through to a narrower rule."""
    h = F.col(host_col)
    ls = F.split(h, r"\.")
    n = F.size(ls)

    # which (kind, width) combinations exist — drives the ladder;
    # the rules frame is broadcast-sized, this is a tiny collect
    present = {
        (r["kind"], int(r["n_labels"]))
        for r in rules.select("kind", "n_labels").distinct().collect()
    }
    exc_ws = sorted({w for k, w in present if k == "exception"}, reverse=True)
    sfx_ws = sorted(
        {w for k, w in present if k in ("rule", "wildcard")}, reverse=True
    )

    def last(k):
        return F.when(n >= k, F.array_join(F.slice(ls, n - (k - 1), k), "."))

    def side(kind, w, alias):
        # wildcard rules with n_labels=w match on the last w-1 labels
        width = w - 1 if kind == "wildcard" else w
        cand = last(width)
        guard = n >= w if kind == "wildcard" else F.lit(True)
        r = rules.filter(
            (F.col("kind") == kind) & (F.col("n_labels") == w)
        ).select(F.col("suffix").alias(alias))
        return cand, guard, F.broadcast(r)

    ladder = [("exception", w, f"__e{w}") for w in exc_ws]
    for w in sfx_ws:
        if ("rule", w) in present:
            ladder.append(("rule", w, f"__r{w}"))
        if ("wildcard", w) in present:
            ladder.append(("wildcard", w, f"__w{w}"))

    joined = df
    aliases = []
    for kind, w, alias in ladder:
        cand, guard, r = side(kind, w, alias)
        ccol = f"__c{alias}"
        joined = joined.withColumn(ccol, F.when(guard, cand)).join(
            r, F.col(ccol) == F.col(alias), "left"
        )
        aliases.append(alias)

    ls2 = F.split(F.col(host_col), r"\.")
    n2 = F.size(ls2)

    def last2(k):
        # cap at the host's own label count: a host that IS the suffix
        # keeps itself instead of going NULL
        kk = F.least(F.lit(k), n2)
        return F.array_join(F.slice(ls2, n2 - (kk - 1), kk), ".")

    def hit(alias):
        return F.col(alias).isNotNull()

    # exceptions prevail at any width (spec: "the prevailing rule is
    # the exception rule if there is one"), widest first for
    # determinism; then longest suffix match wins
    domain = None
    for w in exc_ws:
        cond, val = hit(f"__e{w}"), F.col(f"__e{w}")
        domain = F.when(cond, val) if domain is None else domain.when(cond, val)
    for w in sfx_ws:
        parts = [hit(f"__{t}{w}") for t, k in (("r", "rule"), ("w", "wildcard"))
                 if (k, w) in present]
        cond = parts[0] if len(parts) == 1 else (parts[0] | parts[1])
        val = last2(w + 1)
        domain = F.when(cond, val) if domain is None else domain.when(cond, val)
    domain = last2(2) if domain is None else domain.otherwise(last2(2))

    out = joined.withColumn(out_col, domain)
    return out.drop(*aliases, *[f"__c{a}" for a in aliases])


def filter_blocked_domains(df, url_col: str, blocked: list[str], keep_blocked: bool = False):
    """Drop (or keep, for auditing) rows whose registrable domain is on
    the blocklist. Small lists inline into the scan predicate (isin →
    pushed filter); for blocklists that are themselves tables, use a
    broadcast left-anti join instead."""
    dom = registrable_domain(url_host(F.col(url_col)))
    cond = dom.isin(*blocked)
    return df.filter(cond if keep_blocked else ~F.coalesce(cond, F.lit(False)))


#: Query parameters that never affect content — the tracking noise a
#: crawler must strip before URL-level dedup. Deliberately NARROW:
#: only unambiguous tracking forms. A bare ``ref=`` is content-bearing
#: on common sites (GitHub branch refs, storefront listing refs) —
#: stripping it would merge genuinely distinct pages, the worse
#: failure mode — so only the ``ref_src``/``ref_url`` tracking
#: variants are listed; extend per-corpus via the
#: ``tracking_param_re`` parameter of :func:`canonicalize_url`.
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref_src|ref_url|mc_cid|mc_eid)="


def canonicalize_url(url: Column | str, tracking_param_re: str | None = None) -> Column:
    """Canonical URL form for URL-level dedup (the tier BEFORE any
    text dedup in a web-corpus pipeline — same document, different
    crawl variants):

    - scheme and host lowercased; default port stripped (http:80 /
      https:443);
    - fragment dropped; trailing slashes on the path dropped;
    - tracking query parameters removed (``tracking_param_re``,
      default :data:`TRACKING_PARAM_RE` — override per corpus);
      remaining parameters SORTED so permutations collapse.

    Pure expressions (regexp_extract + array ops) — one projection, no
    UDF; every rule has a byte-identical DuckDB twin (regexp_extract /
    list_filter / list_sort), so URL dedup is full-hash
    oracle-checkable. URLs without a scheme://host shape yield NULL
    (route to quarantine, the P10 policy)."""
    strip_re = TRACKING_PARAM_RE if tracking_param_re is None else tracking_param_re
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hp = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hp, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hp, ":80$", ""))
        .otherwise(hp)
    )
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
        "/+$",
        "",
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(strip_re),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), canon)


#: Anchor tags with quoted hrefs: group 1 = href, group 2 = anchor
#: body (lazy, dotall via inline flag — RE2/Java/Python portable; no
#: backrefs/lookaround per the portability policy).
ANCHOR_PATTERN = r"""(?s)<a\s[^>]*href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a>"""

#: Inner markup stripped from anchor bodies.
_TAG_RE = r"<[^>]+>"


def extract_anchors(html: Column | str) -> Column:
    """Outlink extraction WITH anchor text — the raw material of the
    link graph (PageRank / domain authority) and of anchor-text
    relevance signals, straight from crawled HTML: returns
    ``array<struct<href, anchor>>`` where ``anchor`` is the tag body
    with inner markup stripped and whitespace collapsed.

    Pure expressions: two group-extractions of the SAME pattern (the
    engines guarantee match order), zipped positionally — no HTML
    parser, no UDF, one projection over the crawl scan. The regex
    requires quoted hrefs (the overwhelming real-world form);
    unquoted-attribute tags are skipped, not mangled."""
    c = F.col(html) if isinstance(html, str) else html
    hrefs = F.regexp_extract_all(c, F.lit(ANCHOR_PATTERN), F.lit(1))
    bodies = F.regexp_extract_all(c, F.lit(ANCHOR_PATTERN), F.lit(2))
    clean = lambda b: F.trim(  # noqa: E731 — tiny local expression
        F.regexp_replace(F.regexp_replace(b, _TAG_RE, ""), r"\s+", " ")
    )
    return F.zip_with(
        hrefs, bodies, lambda h, b: F.struct(h.alias("href"), clean(b).alias("anchor"))
    )


#: spam-heuristic weights (integer points; shared by the SQL twin)
URL_SPAM_W_DIGIT = 2
URL_SPAM_W_HYPHEN = 3
URL_SPAM_W_DEEP_SUBDOMAIN = 5   # > 4 host labels
URL_SPAM_W_LONG_HOST = 5        # > 40 chars
URL_SPAM_W_PARAM = 1
URL_SPAM_W_PCT = 2


def url_features(df, url_col: str, prefix: str = ""):
    """Frontier-prioritization URL features + an integer spam score —
    the IRLbot-style heuristic tier: hosts stuffed with digits and
    hyphens, deep subdomain chains, very long hosts, parameter farms,
    and heavy percent-encoding correlate with crawler traps and spam
    networks, and a crawl budget should prefer low-score URLs long
    before any content-based signal exists.

    Appends (all integer, pure expressions, portable regex — host is
    extracted by pattern, not engine URL functions, so the SQL twin is
    exact): ``host, host_len, n_host_digits, n_host_hyphens,
    n_labels, path_depth, n_params, n_pct, spam_points`` where
    ``spam_points = 2*digits + 3*hyphens + 5*(labels>4) +
    5*(host_len>40) + params + 2*pct``. A score, not a verdict —
    threshold per corpus."""
    u = F.col(url_col)
    authority = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(authority, r"^[^@]*@", ""), r":[0-9]+$", ""
    )
    host_len = F.length(host).cast("long")
    n_digits = (host_len - F.length(F.regexp_replace(host, r"[0-9]", ""))).cast("long")
    n_hyphens = (host_len - F.length(F.regexp_replace(host, r"-", ""))).cast("long")
    n_labels = F.when(host == "", F.lit(0)).otherwise(
        F.size(F.split(host, r"\."))
    ).cast("long")
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)
    path_depth = (
        F.length(path) - F.length(F.regexp_replace(path, r"/", ""))
    ).cast("long")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, r"&"))
    ).cast("long")
    n_pct = F.coalesce(
        F.size(F.expr(f"regexp_extract_all({url_col}, '%[0-9A-Fa-f]{{2}}', 0)")),
        F.lit(0),
    ).cast("long")
    spam = (
        URL_SPAM_W_DIGIT * n_digits
        + URL_SPAM_W_HYPHEN * n_hyphens
        + F.when(n_labels > 4, F.lit(URL_SPAM_W_DEEP_SUBDOMAIN)).otherwise(0)
        + F.when(host_len > 40, F.lit(URL_SPAM_W_LONG_HOST)).otherwise(0)
        + URL_SPAM_W_PARAM * n_params
        + URL_SPAM_W_PCT * n_pct
    ).cast("long")
    p = prefix
    return df.select(
        "*",
        host.alias(f"{p}host"),
        host_len.alias(f"{p}host_len"),
        n_digits.alias(f"{p}n_host_digits"),
        n_hyphens.alias(f"{p}n_host_hyphens"),
        n_labels.alias(f"{p}n_labels"),
        path_depth.alias(f"{p}path_depth"),
        n_params.alias(f"{p}n_params"),
        n_pct.alias(f"{p}n_pct"),
        spam.alias(f"{p}spam_points"),
    )
