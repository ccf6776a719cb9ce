"""Gopher/C4 rule-set quality gate unit tests."""

from __future__ import annotations

from pasta_pipeline_spark.operators.quality_filters import gopher_rules


def _rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r for r in gopher_rules(df).collect()}


def test_gopher_rules_adversarial_docs(spark):
    good = " ".join(["the quick brown fox jumps over a lazy dog and it is fine for now"] * 5)
    short = "too short"
    symbol_soup = " ".join(["### ### #tag ..."] * 30)
    bullets = "\n".join(["- item one here"] * 19 + ["closing line of prose"])
    ellipses = "\n".join(["this line trails off..."] * 4 + ["a closing line", "another one", "third one", "fourth"])
    digits = " ".join(["12345 67890 00000"] * 25)
    got = _rows(
        spark,
        [(1, good), (2, short), (3, symbol_soup), (4, bullets), (5, ellipses), (6, digits)],
    )
    assert got[1]["pass_all"]
    assert not got[2]["r_word_count"] and not got[2]["pass_all"]
    assert not got[3]["r_symbol_ratio"]
    assert not got[4]["r_bullet_lines"]  # 19/20 bullet lines > 90%
    assert not got[5]["r_ellipsis_lines"]  # 4/8 ellipsis-ended > 30%
    assert not got[6]["r_alpha_words"] and not got[6]["r_stopwords"]


def test_gopher_rules_empty_and_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    for i in (1, 2):
        assert got[i]["n_words"] == 0
        assert not got[i]["pass_all"]


def test_gopher_rules_single_projection_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = gopher_rules(df)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan  # pure projection, no shuffle


def test_psl_full_format_parse_and_match(spark):
    """Complete publicsuffix.org semantics on real-format input:
    comments/blanks dropped, wildcard and exception rules parsed and
    applied per the spec's ck / kobe.jp worked examples, literal
    multi-label suffixes resolved, unknown TLDs fall back to the
    implicit * rule."""
    from pasta_pipeline_spark.functions.urls import (
        parse_psl_lines,
        registrable_domain_psl_full,
    )

    dat = [
        "// ===BEGIN ICANN DOMAINS===",
        "",
        "com",
        "co.uk",
        "  jp  ",            # whitespace-trimmed
        "*.ck",
        "!www.ck",
        "*.kobe.jp",
        "!city.kobe.jp",
        "// a trailing comment",
    ]
    lines = spark.createDataFrame([(x,) for x in dat], "value string")
    rules = parse_psl_lines(lines)
    parsed = {(r["suffix"], r["n_labels"], r["kind"]) for r in rules.collect()}
    assert parsed == {
        ("com", 1, "rule"),
        ("co.uk", 2, "rule"),
        ("jp", 1, "rule"),
        ("ck", 2, "wildcard"),
        ("www.ck", 2, "exception"),
        ("kobe.jp", 3, "wildcard"),
        ("city.kobe.jp", 3, "exception"),
    }

    hosts = [
        ("foo.bar.com", "bar.com"),            # literal 1-label rule
        ("sub.foo.co.uk", "foo.co.uk"),        # literal 2-label rule
        ("this.that.ck", "this.that.ck"),      # *.ck -> that.ck is TLD
        ("www.ck", "www.ck"),                  # exception beats wildcard
        ("deep.www.ck", "www.ck"),             # exception suffix IS domain
        ("x.y.kobe.jp", "x.y.kobe.jp"),        # *.kobe.jp worked example
        ("city.kobe.jp", "city.kobe.jp"),      # exception
        ("a.city.kobe.jp", "city.kobe.jp"),    # exception under subdomain
        ("just.jp", "just.jp"),                # plain jp rule
        ("x.unknowntld", "x.unknowntld"),      # implicit * fallback
        ("single", "single"),                  # degenerate 1-label host
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {r["host"]: r["domain"] for r in
           registrable_domain_psl_full(df, "host", rules).collect()}
    for h, want in hosts:
        assert got[h] == want, (h, got[h], want)


def test_psl_full_wide_rules(spark):
    """4- and 5-label PSL rules (the real list's private section, e.g.
    ``*.s3.dualstack.<region>.amazonaws.com``) resolve via their OWN
    width: the join ladder is derived from the parsed rules frame's
    (kind, n_labels) set, so wide rules are never silently shadowed by
    a narrower match."""
    from pasta_pipeline_spark.functions.urls import (
        parse_psl_lines,
        registrable_domain_psl_full,
    )

    dat = [
        "com",
        "s3.dualstack.eu-west-1.amazonaws.com",   # literal, 5 labels
        "*.ew.r.appspot.com",                     # wildcard, 5 labels
        "!allowed.ew.r.appspot.com",              # exception, 4 labels
    ]
    lines = spark.createDataFrame([(x,) for x in dat], "value string")
    rules = parse_psl_lines(lines)

    hosts = [
        # 5-label literal beats the 1-label `com` rule
        ("bucket.s3.dualstack.eu-west-1.amazonaws.com",
         "bucket.s3.dualstack.eu-west-1.amazonaws.com"),
        ("x.bucket.s3.dualstack.eu-west-1.amazonaws.com",
         "bucket.s3.dualstack.eu-west-1.amazonaws.com"),
        # 5-label wildcard: * consumes one label; host == suffix keeps itself
        ("proj.ew.r.appspot.com", "proj.ew.r.appspot.com"),
        ("a.proj.ew.r.appspot.com", "a.proj.ew.r.appspot.com"),
        ("b.a.proj.ew.r.appspot.com", "a.proj.ew.r.appspot.com"),
        # 4-label exception prevails over the 5-label wildcard
        ("allowed.ew.r.appspot.com", "allowed.ew.r.appspot.com"),
        ("sub.allowed.ew.r.appspot.com", "allowed.ew.r.appspot.com"),
        # plain com rule still works alongside the wide ladder
        ("amazonaws.com", "amazonaws.com"),
        ("foo.bar.com", "bar.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {r["host"]: r["domain"] for r in
           registrable_domain_psl_full(df, "host", rules).collect()}
    for h, want in hosts:
        assert got[h] == want, (h, got[h], want)


def test_extract_anchors_contract(spark):
    """Anchor extraction: quoted hrefs in either quote style pair with
    their tag bodies positionally; inner markup strips; whitespace
    collapses; href-less anchors and malformed tags are skipped;
    anchor-free documents yield an empty array."""
    from pasta_pipeline_spark.functions.urls import extract_anchors

    html = (
        '<p>x</p><a href="https://a.example/1">One <b>bold</b></a>'
        "<a class='c' href='https://b.example/2'>two\n  lines</a>"
        '<a name="skip">no href</a><a href="https://c.example/3"></a>'
    )
    df = spark.createDataFrame([(1, html), (2, "<p>plain</p>")], "id long, h string")
    got = {r["id"]: r["a"] for r in df.select("id", extract_anchors("h").alias("a")).collect()}
    assert [(x["href"], x["anchor"]) for x in got[1]] == [
        ("https://a.example/1", "One bold"),
        ("https://b.example/2", "two lines"),
        ("https://c.example/3", ""),
    ]
    assert got[2] == []


def test_parse_crawl_delays(spark):
    """Crawl-delay extraction: per-(host, agent) delays with
    consecutive-UA group sharing, ceil of fractional values, largest
    wins within a group, junk values dropped, hosts without the
    directive absent."""
    from pasta_pipeline_spark.operators.robots import parse_crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
             "User-agent: fastbot\nUser-agent: otherbot\nCrawl-delay: 0.5\n"),
            ("b.org", "User-agent: *\nCrawl-delay: junk\nDisallow: /\n"),
            ("c.net", "User-agent: *\nDisallow: /private\n"),
            ("d.io", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 7\n"),
        ],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["agent"]): r["delay_s"]
           for r in parse_crawl_delays(robots).collect()}
    assert got == {
        ("a.com", "*"): 2,
        ("a.com", "fastbot"): 1,    # 0.5 ceils to 1; shared UA group
        ("a.com", "otherbot"): 1,
        ("d.io", "*"): 7,           # largest in group wins
    }


def test_refresh_selection_semantics(spark):
    """Re-crawl selection: unfetched URLs are 'new'; fetched URLs
    refetch only when lastmod (full ISO or date-only) is strictly
    newer; unverifiable lastmod on a fetched URL does NOT trigger a
    refetch; garbage lastmod degrades to NULL, never an error."""
    from pasta_pipeline_spark.operators.sitemaps import parse_sitemap, refresh_selection

    xml = (
        "<urlset>"
        "<url><loc>https://a.com/new</loc><lastmod>2026-01-02T03:04:05Z</lastmod></url>"
        "<url><loc>https://a.com/stale</loc><lastmod>2026-02-01</lastmod></url>"
        "<url><loc>https://a.com/fresh</loc><lastmod>2025-01-01</lastmod></url>"
        "<url><loc>https://a.com/nolm</loc></url>"
        "<url><loc>https://a.com/junk</loc><lastmod>not-a-date-at-all</lastmod></url>"
        "</urlset>"
    )
    disc = parse_sitemap(
        spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    )
    jan1_2026 = 1767225600
    log = spark.createDataFrame(
        [("https://a.com/stale", jan1_2026), ("https://a.com/fresh", jan1_2026),
         ("https://a.com/nolm", 100), ("https://a.com/junk", 100)],
        "url string, fetched_at_s long",
    )
    got = {r["url"]: r["reason"] for r in refresh_selection(disc, log).collect()}
    assert got == {"https://a.com/new": "new", "https://a.com/stale": "stale"}


def test_parse_sitemap_directives(spark):
    """Sitemap directives: case-insensitive name, global (not
    UA-scoped), comments stripped, duplicates collapsed, hosts
    without the directive absent."""
    from pasta_pipeline_spark.operators.robots import parse_sitemap_directives

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nDisallow: /\nSitemap: https://a.com/s1.xml\n"
             "SITEMAP: https://a.com/s2.xml  # comment\n"
             "Sitemap: https://a.com/s1.xml\n"),   # duplicate
            ("b.org", "User-agent: x\nDisallow: /y\n"),
        ],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["sitemap_url"])
           for r in parse_sitemap_directives(robots).collect()}
    assert got == {
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
    }


def test_c4_line_clean_contract(spark):
    """C4 line cleaning: terminal-punct + min-words line filter, page
    verdicts (lorem/brace/min-sentences), NULL text safety, and the
    cleaned text itself."""
    from pasta_pipeline_spark.operators.quality_filters import c4_line_clean

    docs = spark.createDataFrame(
        [
            (1, "This is a proper sentence with enough words.\n"
                "short.\n"
                "menu home about contact login\n"
                "Another good long sentence ends here too!\n"
                "And a third full sentence completes the page.\n"),
            (2, "Only one good sentence lives on this page."),  # < 3 sentences
            (3, "A fine sentence with words to spare right here.\n"
                "if (x) { return 1; } and some words too."),     # brace page
            (4, "Lorem ipsum dolor sit amet consectetur filler here."),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in c4_line_clean(docs).collect()}

    # doc 1: 3 lines kept (terminal punct AND >=5 words), others dropped
    assert got[1]["n_kept"] == 3
    assert got[1]["cleaned_text"].count("\n") == 2
    assert "menu home" not in got[1]["cleaned_text"]
    assert "short." not in got[1]["cleaned_text"]  # 1 word
    assert got[1]["page_pass"] is True and got[1]["n_sentences"] >= 3

    assert got[2]["n_kept"] == 1 and got[2]["min_sentences"] is False
    assert got[2]["page_pass"] is False

    assert got[3]["no_brace"] is False and got[3]["page_pass"] is False
    assert got[4]["no_lorem"] is False and got[4]["page_pass"] is False

    assert got[5]["cleaned_text"] is None and got[5]["n_kept"] == 0
    assert got[5]["page_pass"] is False


def test_robots_refetch_and_recrawl_schedule(spark):
    from pasta_pipeline_spark.operators.robots import robots_refetch_list
    from pasta_pipeline_spark.operators.sitemaps import recrawl_schedule

    hosts = spark.createDataFrame(
        [("a.com",), ("a.com",), ("b.com",), ("c.com",)], "host string"
    )
    cache = spark.createDataFrame(
        [("a.com", 900), ("a.com", 1500), ("b.com", 100)],
        "host string, fetched_at_s long",
    )
    got = {r["host"]: r.asDict() for r in
           robots_refetch_list(hosts, cache, now_s=1600, max_age_s=300).collect()}
    assert len(got) == 3  # frontier hosts deduped
    assert got["a.com"]["stale"] is False and got["a.com"]["last_fetch_s"] == 1500
    assert got["b.com"]["stale"] is True and got["b.com"]["age_s"] == 1500
    assert got["c.com"]["stale"] is True and got["c.com"]["last_fetch_s"] is None

    obs = spark.createDataFrame(
        [("u1", 0), ("u1", 1000), ("u1", 4000),       # mean interval 2000
         ("u2", 50), ("u2", 50),                       # 1 distinct obs -> default
         ("u3", 10), ("u3", 20)],                      # span 10 -> floored
        "url string, lastmod_s long",
    )
    got = {r["url"]: r.asDict() for r in
           recrawl_schedule(obs, now_s=7000, default_interval_s=100_000,
                            min_interval_s=600).collect()}
    assert got["u1"]["interval_s"] == 2000 and got["u1"]["next_due_s"] == 6000
    assert got["u1"]["due_now"] is True
    assert got["u2"]["n_obs"] == 1 and got["u2"]["interval_s"] == 100_000
    assert got["u2"]["due_now"] is False
    assert got["u3"]["interval_s"] == 600  # politeness floor


def test_url_features_contract(spark):
    from pasta_pipeline_spark.functions.urls import url_features

    urls = spark.createDataFrame(
        [
            (1, "https://a1-b2.sub.spam4you.example.com:8080/p/x/y?a=1&b=%2F"),
            (2, "https://clean.example.com/page"),
            (3, "http://user@host.com/"),
            (4, "not a url"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r.asDict() for r in url_features(urls, "url").collect()}
    r1 = got[1]
    assert r1["host"] == "a1-b2.sub.spam4you.example.com"  # port stripped
    assert r1["n_host_digits"] == 3 and r1["n_host_hyphens"] == 1
    assert r1["n_labels"] == 5 and r1["path_depth"] == 3
    assert r1["n_params"] == 2 and r1["n_pct"] == 1
    assert r1["spam_points"] > got[2]["spam_points"]
    assert got[3]["host"] == "host.com"  # userinfo stripped
    assert got[4]["host"] == "" and got[4]["spam_points"] == 0
