"""URL and domain operators for web-scrape curation.

A crawl-derived corpus is filtered by where its text came from and what
it links to: extract URLs, reduce them to registrable domains, score
link density, and drop documents that mention blocklisted domains. All
extraction is chained RE2-compatible ``regexp`` projections (scan-speed,
shuffle-free); the blocklist filter is a broadcast semi-join keyed on
the exploded per-document domain set, so the corpus scan never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rnadam_spark.functions.rounding import hround

# RE2-compatible (no lookaround): scheme://host[:port][/path] up to
# whitespace; the host capture stops at :/ or whitespace.
URL_PATTERN = r"https?://[^\s/:]+(?::\d+)?(?:/[^\s]*)?"
_HOST_PATTERN = r"https?://([^\s/:]+)"


def urls_of(col: Column | str) -> Column:
    """All URLs of a text column, in order of appearance."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)


def domains_of(col: Column | str) -> Column:
    """Distinct lowercased hostnames of a text column's URLs."""
    return F.array_distinct(
        F.transform(
            urls_of(col),
            lambda u: F.lower(F.regexp_extract(u, _HOST_PATTERN, 1)),
        )
    )


def url_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_urls, n_domains, url_char_frac, top_domain): link
    inventory per document — ``url_char_frac`` (URL characters over
    total characters) is the link-density quality signal (boilerplate
    and spam pages are URL-heavy); ``top_domain`` is the
    lexicographically-first distinct domain (deterministic under any
    partitioning; null when the document has no URLs)."""
    us = urls_of(text_col)
    ds = domains_of(text_col)
    url_chars = F.aggregate(us, F.lit(0), lambda a, u: a + F.length(u))
    return docs.select(
        F.col(id_col),
        F.size(us).cast("bigint").alias("n_urls"),
        F.size(ds).cast("bigint").alias("n_domains"),
        hround(
            url_chars.cast("double")
            / F.greatest(F.length(text_col), F.lit(1)).cast("double"),
            6,
        ).alias("url_char_frac"),
        # get() is null-on-empty (ANSI element_at throws on index 1 of [])
        F.get(F.array_sort(ds), F.lit(0)).alias("top_domain"),
    )


def host_suffixes(col: Column | str) -> Column:
    """All dot-suffixes of a hostname with at least two labels, plus the
    host itself: ``a.b.example.com`` → ``[a.b.example.com,
    b.example.com, example.com]``. This is the UT1-blocklist match
    unit — an entry ``example.com`` must block every subdomain — and
    generating the suffixes in-row turns suffix matching into an
    equi-join (blocklists are keyed by registrable domain, so one
    broadcast semi-join replaces a per-entry LIKE scan). Bare TLDs are
    not generated (no real blocklist bans ``com``). Hostnames have a
    handful of labels, so the expansion is a small bounded array."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    labels = F.split(c, r"\.")
    n = F.size(labels)
    # suffix starting at label i (0-based), for i in [0, n-2]: keeps >= 2 labels
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def filter_blocklisted_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
    suffix: bool = False,
) -> DataFrame:
    """Drop every document that mentions a blocklisted domain; pass the
    rest through unchanged (all columns). ``suffix=True`` applies UT1
    semantics — a blocklist entry also bans every subdomain (the
    mentioned host's dot-suffixes expand in-row, see
    :func:`host_suffixes`); the default exact match is the conservative
    legacy behavior.

    Shape for 100 TB: the per-document domain set explodes to
    (doc_id, domain) rows, the offender set is a broadcast semi-join
    against the (small) blocklist, and the corpus drops offenders with
    a doc_id anti-join. The blocklist broadcast means the exploded
    domain rows never shuffle; the anti-join is doc_id-equi. Domains
    compare lowercased on both sides."""
    mentioned = domains_of(text_col)
    keys = (
        F.flatten(F.transform(mentioned, host_suffixes)) if suffix else mentioned
    )
    doc_domains = docs.select(F.col(id_col), F.explode(keys).alias("_domain"))
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_domain")).distinct()
    )
    offenders = doc_domains.join(bl, "_domain", "leftsemi").select(id_col).distinct()
    return docs.join(offenders, id_col, "left_anti")


def blocklist_filter_urls(
    urls: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    patterns: list[str] | None = None,
) -> DataFrame:
    """Drop frontier/source URLs whose HOST falls under a blocklisted
    domain (subdomains included — :func:`host_suffixes`) or whose full
    URL contains any of the literal ``patterns`` substrings; pass the
    rest through unchanged. This is the RefinedWeb/FineWeb first gate:
    the UT1-style domain list scales to millions of entries as a
    broadcast semi-join on the exploded host suffixes (never a LIKE
    scan per entry), while ``patterns`` — curated URL substrings, a
    bounded hand-written list — compile into ONE RE2 alternation of
    escaped literals evaluated at scan speed. Zero shuffle on the URL
    scan; the only exchanges are inside the broadcast."""
    import re as _re

    host = F.regexp_extract(F.col(url_col), _HOST_PATTERN, 1)
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_domain")).distinct()
    )
    exploded = urls.select(
        F.col(url_col).alias("_u"), F.explode(host_suffixes(host)).alias("_domain")
    )
    blocked_urls = exploded.join(bl, "_domain", "leftsemi").select("_u").distinct()
    kept = urls.join(
        blocked_urls.withColumnRenamed("_u", url_col), url_col, "left_anti"
    )
    if patterns:
        alternation = "|".join(_re.escape(p) for p in sorted(patterns))
        # NULL urls pass the suffix branch (explode of a NULL host emits
        # nothing, so they never reach the blocked set) — keep the same
        # contract here: rlike(NULL) is NULL, and a bare ~rlike filter
        # would silently drop those rows only when patterns are given
        kept = kept.filter(
            F.col(url_col).isNull() | ~F.col(url_col).rlike(alternation)
        )
    return kept


def domain_quality_prior(
    docs: DataFrame,
    pagerank: DataFrame | None = None,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(source, n_docs, n_tokens, avg_quality, exact_dup_rate,
    [pagerank]): the per-source quality table a crawl scheduler
    prioritizes by — which domains yield clean, novel text and which
    yield boilerplate. One groupBy over in-row stats (quality heuristic,
    content hash) plus an optional broadcast join of
    :func:`operators.graph.pagerank` scores keyed by lowercased source.

    ``exact_dup_rate`` is 1 − distinct(content)/docs within the source —
    approximate at scale via the HLL sketch (``approx_count_distinct``),
    which partial-aggregates map-side so a hot domain never funnels one
    task."""
    from rnadam_spark.functions.rounding import hround
    from rnadam_spark.functions.shingles import tokens
    from rnadam_spark.operators.text import quality_columns

    per_source = (
        docs.select(
            F.lower(F.col(source_col)).alias("source"),
            F.size(tokens(text_col)).alias("_nt"),
            quality_columns(text_col)["quality"].alias("_q"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            hround(F.avg("_q"), 6).alias("avg_quality"),
            hround(
                F.lit(1.0)
                - F.approx_count_distinct("_h").cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("exact_dup_rate"),
        )
    )
    if pagerank is None:
        return per_source
    pr = F.broadcast(
        pagerank.select(F.lower(F.col("node")).alias("source"), F.col("rank").alias("pagerank"))
    )
    return per_source.join(pr, "source", "left")


def domain_edges(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(src, dst): the domain link graph — one edge from a document's
    own source/domain to each distinct domain its text links to
    (multiplicity = number of linking documents, which is what a
    PageRank over curation sources should weight by). Feed to
    ``operators.graph.pagerank`` for domain-authority scores, the
    standard quality prior for web corpora."""
    return docs.select(
        F.lower(F.col(source_col)).alias("src"),
        F.explode(domains_of(text_col)).alias("dst"),
    ).filter(F.col("src").isNotNull() & (F.length("dst") > 0))


# tracking parameters every major canonicalizer strips (utm_* handled
# by pattern; the rest listed explicitly)
_TRACKING_PARAM_RE = (
    r"(?:utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)"
)

#: the normalization chain as (pattern, replacement-with-$n) pairs —
#: ONE table drives both the Spark operator and the DuckDB oracle
#: (queries/web_q.py translates $n → \n), so the two cannot drift.
#: All patterns are RE2-compatible (no lookaround).
CANON_STEPS: list[tuple[str, str]] = [
    # fragment FIRST — it is never sent to the server, and stripping it
    # before the authority rules keeps one pass a fixed point: with the
    # old order "http://x.com:80#" kept its :80 (the port rule saw '#'
    # where it requires /, ? or end) and only converged on a SECOND
    # canonicalization — caught by the idempotence property test
    (r"#.*$", ""),
    (r"^http://(?:www\.)+", "http://"),  # (?:...)+ so www.www. collapses in one pass
    (r"^https://(?:www\.)+", "https://"),
    (r"^(https?://[^/?#]*):80(/|\?|$)", r"$1$2"),
    (r"^(https?://[^/?#]*):443(/|\?|$)", r"$1$2"),
    # tracking params: a RUN of them mid-query collapses in one match
    # (regexp_replace does not rescan replaced text, so consecutive
    # params need the (?:...)+ run form), then a trailing one drops
    (r"([?&])(?:" + _TRACKING_PARAM_RE + r"=[^&#]*&)+", r"$1"),
    (r"([?&])" + _TRACKING_PARAM_RE + r"=[^&#]*$", ""),
    (r"[?&]$", ""),  # dangling separator
    (r"^(https?://[^/?#]+)/$", r"$1"),  # bare trailing /
]

#: the scheme+host prefix (lowercased before the chain runs)
CANON_HEAD_PATTERN = r"^((?i:https?)://[^/?#]*)"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL column — the crawl-frontier identity:
    two fetches of the "same" page must collide so the frontier and the
    (url, date) document ids dedup correctly. Normalizations (the
    conservative, always-safe set):

    - scheme and host lowercased; ``www.`` prefix dropped;
    - fragment (``#...``) dropped — never sent to the server;
    - tracking query parameters stripped (``utm_*``, click ids);
      remaining parameters keep their original order (re-sorting
      changes semantics for some sites, so we don't);
    - default ports (``:80``/``:443``) dropped; trailing ``?``/``&``
      and a bare trailing ``/`` on a pathless URL tidied.

    Chained RE2 ``regexp_replace`` projections — composes at scan speed
    like every other web operator. The step table ``CANON_STEPS`` is
    shared with the DuckDB gate oracle (queries/web_q.py)."""
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme+host (up to the first single /), leave path case
    head = F.regexp_extract(c, CANON_HEAD_PATTERN, 1)
    tail = F.substring(c, F.length(head) + 1, 2_000_000_000)
    u = F.concat(F.lower(head), tail)
    for pat, repl in CANON_STEPS:
        u = F.regexp_replace(u, pat, repl)
    return u


def frontier_dedup(
    urls: DataFrame, url_col: str = "url", priority_col: str | None = None
) -> DataFrame:
    """(canonical_url, url, n_variants[, best_priority]): crawl-frontier
    dedup — group candidate URLs by canonical form, keep one
    representative per page (the lexicographically-smallest raw URL for
    determinism), count the collapsed variants, and carry the best
    (max) priority when a priority column is present (so a page queued
    from several sources keeps its strongest claim). One groupBy on the
    canonical key — map-side partial agg, AQE-splittable."""
    base = urls.withColumn("_canon", canonical_url(url_col))
    aggs = [
        F.min(url_col).alias(url_col),
        F.count("*").cast("bigint").alias("n_variants"),
    ]
    if priority_col is not None:
        aggs.append(F.max(priority_col).alias("best_priority"))
    return (
        base.groupBy(F.col("_canon").alias("canonical_url"))
        .agg(*aggs)
    )
