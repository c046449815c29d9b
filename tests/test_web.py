"""URL extraction, link-density stats, and domain blocklist filtering
(operators/web.py)."""

from __future__ import annotations

import duckdb

from rnadam_spark.operators import web


def _docs(spark):
    rows = [
        (1, "see https://example.com/page and http://Sub.Example.com:8080/x?q=1 plus text"),
        (2, "spam spam https://spam.bad/a https://spam.bad/b https://other.io end"),
        (3, "no links at all in this one"),
        (4, "bare domain example.com is not a url; https://ok.org/ is"),
        (5, ""),
    ]
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


def test_url_stats_golden(spark):
    rows, df = _docs(spark)
    got = {r.doc_id: r for r in web.url_stats(df).collect()}
    assert got[1].n_urls == 2 and got[1].n_domains == 2
    assert got[1].top_domain == "example.com"  # lowercased, sorted
    assert got[2].n_urls == 3 and got[2].n_domains == 2
    assert got[2].top_domain == "other.io"
    assert got[3].n_urls == 0 and got[3].top_domain is None
    assert got[3].url_char_frac == 0.0
    assert got[4].n_urls == 1 and got[4].top_domain == "ok.org"
    assert got[5].n_urls == 0 and got[5].url_char_frac == 0.0
    # link density: doc 2's URLs dominate its length
    url_chars = sum(len(u) for u in
                    ["https://spam.bad/a", "https://spam.bad/b", "https://other.io"])
    assert abs(got[2].url_char_frac - url_chars / len(rows[1][1])) < 1e-6


def test_url_stats_matches_duckdb(spark):
    _, df = _docs(spark)
    got = {
        (r.doc_id, r.n_urls, r.n_domains, r.url_char_frac, r.top_domain)
        for r in web.url_stats(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", [tuple(r) for r in df.collect()])
    want = set(
        con.execute(
            f"""
            WITH t AS (SELECT doc_id, text,
                              regexp_extract_all(text, '{web.URL_PATTERN}') AS us
                       FROM docs),
            d AS (SELECT doc_id, text, us,
                         list_sort(list_distinct(list_transform(us,
                           u -> lower(regexp_extract(u, 'https?://([^\\s/:]+)', 1))))) AS ds
                  FROM t)
            SELECT doc_id,
                   CAST(len(us) AS BIGINT) AS n_urls,
                   CAST(len(ds) AS BIGINT) AS n_domains,
                   floor((CAST(list_sum(list_transform(us, u -> length(u))) AS DOUBLE)
                          / greatest(length(text), 1)) * 1000000.0 + 0.5) / 1000000.0
                     AS url_char_frac,
                   ds[1] AS top_domain
            FROM d
            """
        ).fetchall()
    )
    # DuckDB list_sum of an empty list is NULL -> normalize to 0.0
    want = {(a, b, c, (0.0 if d is None else d), e) for a, b, c, d, e in want}
    assert got == want


def test_filter_blocklisted_domains(spark):
    _, df = _docs(spark)
    bl = spark.createDataFrame([("SPAM.BAD",), ("unused.net",)], ["domain"])
    kept = web.filter_blocklisted_domains(df, bl)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 4, 5]
    assert set(kept.columns) == set(df.columns)
    # empty blocklist keeps everything
    empty = spark.createDataFrame([], "domain string")
    assert web.filter_blocklisted_domains(df, empty).count() == 5


def test_filter_blocklist_plan_broadcasts(spark):
    _, df = _docs(spark)
    bl = spark.createDataFrame([("spam.bad",)], ["domain"])
    plan = (
        web.filter_blocklisted_domains(df, bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # blocklist semi-join never shuffles the corpus


def test_domain_edges_feed_pagerank(spark):
    from rnadam_spark.operators.graph import pagerank
    from rnadam_spark.operators.web import domain_edges

    rows = [
        (1, "see https://hub.example/a and https://other.io/b", "en", "siteA", 50),
        (2, "also https://hub.example/c", "en", "siteB", 30),
        (3, "no links here", "en", "siteC", 20),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    edges = domain_edges(docs)
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {("sitea", "hub.example"), ("sitea", "other.io"), ("siteb", "hub.example")}
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=10).collect()}
    # the doubly-linked hub outranks every source and the singly-linked domain
    assert max(ranks, key=ranks.get) == "hub.example"
    assert ranks["hub.example"] > ranks["other.io"]


def test_domain_quality_prior(spark):
    from rnadam_spark.operators.graph import pagerank
    from rnadam_spark.operators.web import domain_edges, domain_quality_prior

    good = ("The article is a clean one and it reads like prose with the usual "
            "words of sensible length here today.")
    rows = [
        (1, good, "en", "GoodSite", 1),
        (2, good + " More fresh text follows in this one.", "en", "goodsite", 1),
        (3, "spam123 456789 !!!! ####", "en", "spamsite", 1),
        (4, "spam123 456789 !!!! ####", "en", "spamsite", 1),  # exact dup
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    got = {r.source: r for r in domain_quality_prior(docs).collect()}
    assert set(got) == {"goodsite", "spamsite"}  # sources lowercased+merged
    assert got["goodsite"].n_docs == 2 and got["goodsite"].exact_dup_rate == 0.0
    assert got["spamsite"].exact_dup_rate > 0.4  # one of two is a dup
    assert got["goodsite"].avg_quality > got["spamsite"].avg_quality
    # optional pagerank join keys by lowercased source
    edges = spark.createDataFrame(
        [("goodsite", "spamsite"), ("spamsite", "goodsite")], "src string, dst string"
    )
    pr = pagerank(edges, iterations=3)
    with_pr = {r.source: r.pagerank for r in domain_quality_prior(docs, pagerank=pr).collect()}
    assert with_pr["goodsite"] is not None and with_pr["goodsite"] > 0


def test_canonical_url_normalizations(spark):
    from rnadam_spark.operators.web import canonical_url

    cases = [
        ("HTTP://WWW.Example.COM/Path/Page?a=1#frag", "http://example.com/Path/Page?a=1"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/", "http://example.com"),
        ("https://example.com/p?utm_source=x&utm_medium=y&id=7", "https://example.com/p?id=7"),
        ("https://example.com/p?id=7&fbclid=abc", "https://example.com/p?id=7"),
        ("https://example.com/p?utm_campaign=z", "https://example.com/p"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com/a/b/", "https://example.com/a/b/"),  # deep trailing / kept
        ("https://example.com/p?id=7&ref=rss&b=2", "https://example.com/p?id=7&b=2"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], ["i", "url"])
    got = {r.i: r.c for r in df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, (raw, got[i], want)


def test_frontier_dedup_collapses_variants(spark):
    from rnadam_spark.operators.web import frontier_dedup

    urls = spark.createDataFrame(
        [
            ("https://www.example.com/p?utm_source=a", 1.0),
            ("https://example.com/p", 5.0),
            ("https://example.com/p#sec2", 2.0),
            ("https://other.org/q", 3.0),
        ],
        ["url", "priority"],
    )
    got = {
        r.canonical_url: r
        for r in frontier_dedup(urls, priority_col="priority").collect()
    }
    assert set(got) == {"https://example.com/p", "https://other.org/q"}
    page = got["https://example.com/p"]
    assert page.n_variants == 3
    assert page.best_priority == 5.0  # strongest claim survives the collapse
    assert page.url == "https://example.com/p"  # deterministic representative


def test_host_suffixes_shapes(spark):
    from rnadam_spark.operators.web import host_suffixes

    df = spark.createDataFrame(
        [("a.b.Example.COM",), ("example.com",), ("localhost",)], "h STRING"
    )
    got = [r.s for r in df.select(host_suffixes("h").alias("s")).collect()]
    assert got[0] == ["a.b.example.com", "b.example.com", "example.com"]
    assert got[1] == ["example.com"]
    assert got[2] == ["localhost"]


def test_filter_blocklisted_domains_suffix_mode(spark):
    from rnadam_spark.operators import web

    docs = spark.createDataFrame(
        [
            (1, "see https://ads.tracker.example/x for deals"),
            (2, "fine text https://docs.python.org/3/"),
            (3, "mixed https://sub.bad.site/page and https://good.org/"),
            (4, "exact https://bad.site/root"),
            (5, "no urls at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    bl = spark.createDataFrame([("tracker.example",), ("bad.site",)], "domain STRING")
    exact = {r.doc_id for r in web.filter_blocklisted_domains(docs, bl).collect()}
    # exact mode misses the subdomain mentions (ads.tracker.example and
    # sub.bad.site are not literal blocklist entries) but drops doc 4
    assert exact == {1, 2, 3, 5}
    suffix = {
        r.doc_id
        for r in web.filter_blocklisted_domains(docs, bl, suffix=True).collect()
    }
    assert suffix == {2, 5}


def test_blocklist_filter_urls_matches_duckdb(spark):
    import duckdb

    from rnadam_spark.operators import web

    urls = [
        "https://ads.tracker.example/x",
        "https://tracker.example/",
        "https://nottracker.example/ok",     # no dot boundary: survives
        "https://docs.python.org/3/",
        "https://casino.example.net/?download.php",
        "https://a.b.c.bad.site/deep",
    ]
    udf_ = spark.createDataFrame([(u,) for u in urls], "url STRING")
    bl = spark.createDataFrame([("tracker.example",), ("bad.site",)], "domain STRING")
    got = sorted(
        r.url
        for r in web.blocklist_filter_urls(
            udf_, bl, patterns=["download.php"]
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE u (url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    con.execute("CREATE TABLE bl (domain VARCHAR)")
    con.executemany("INSERT INTO bl VALUES (?)", [("tracker.example",), ("bad.site",)])
    want = sorted(
        r[0]
        for r in con.execute(
            r"""
            SELECT url FROM u
            WHERE NOT EXISTS (
              SELECT 1 FROM bl
              WHERE lower(regexp_extract(url, 'https?://([^\s/:]+)', 1)) = bl.domain
                 OR ends_with(lower(regexp_extract(url, 'https?://([^\s/:]+)', 1)),
                              '.' || bl.domain)
            )
            AND url NOT LIKE '%download.php%'
            """
        ).fetchall()
    )
    assert got == want == sorted(
        ["https://nottracker.example/ok", "https://docs.python.org/3/"]
    )


def test_blocklist_filter_urls_null_url_consistent(spark):
    # ADVICE r8: with `patterns`, ~rlike(NULL) is NULL and used to drop
    # NULL-url rows that the pattern-less branch keeps — null handling
    # must not depend on whether patterns are provided
    from rnadam_spark.operators import web

    df = spark.createDataFrame(
        [("https://ok.example/",), (None,)], "url STRING"
    )
    bl = spark.createDataFrame([("bad.site",)], "domain STRING")
    no_pat = {r.url for r in web.blocklist_filter_urls(df, bl).collect()}
    with_pat = {
        r.url
        for r in web.blocklist_filter_urls(df, bl, patterns=["download.php"]).collect()
    }
    assert no_pat == with_pat == {"https://ok.example/", None}
