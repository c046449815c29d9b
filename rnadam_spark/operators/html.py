"""HTML → main-text extraction (boilerplate removal), in-row.

Real pre-training pipelines start from crawled HTML, not clean text:
before any of the text-curation stages (``text.c4_clean``,
``text.gopher_quality``, dedup) can run, the page chrome — navigation,
headers, footers, link lists, scripts — has to go. This module is a
jusText-style block classifier (Pomikálek 2011: segment on block-level
tags, keep blocks that look like prose by word count, link density, and
stopword density) re-expressed as pure Catalyst expressions: regex
strip → split → per-block ``transform`` scoring → ``filter`` →
``array_join``. No UDF, no Python boundary, zero shuffle — at 100 TB
the extraction is a projection over the raw crawl scan, pushdown- and
codegen-friendly, and composes with everything downstream exactly like
a text column.

Deliberately "lite": a real extractor also uses DOM nesting and
context-sensitive smoothing of block verdicts. The heuristics here
(the same three jusText core features) are the 90% case and keep the
operator declarative; swap in a trafilatura-style Arrow-batched
``mapInPandas`` behind the same (doc_id, main_text) contract if the
dependency ever lands — the Spark-side plumbing stays identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rnadam_spark.functions.rounding import hround
from rnadam_spark.functions.shingles import tokens
from rnadam_spark.operators.text import STOPWORDS

# scripts/styles/comments vanish wholesale — their text is never prose
_DROP_WHOLE_RE = r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
# block-level boundaries: splitting on these yields candidate text blocks
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|br|li|h[1-6]|tr|td|th|table|thead|tbody|ul|ol|dl|dt|dd"
    r"|blockquote|section|article|aside|header|footer|nav|form|pre|figure"
    r"|figcaption|main|body|html|head|title)(?:\s[^>]*)?/?>"
)
_INLINE_TAG_RE = r"<[^>]*>"
_ANCHOR_RE = r"(?i)<a[\s>]"

# (entity, replacement) — &amp; decoded LAST so "&amp;lt;" single-decodes
_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def _block_text(raw: Column) -> Column:
    """Visible text of one block: inline tags → space, entities
    decoded, whitespace collapsed."""
    txt = F.regexp_replace(raw, _INLINE_TAG_RE, " ")
    for ent, rep in _ENTITIES:
        txt = F.regexp_replace(txt, ent, rep)
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def html_blocks(html_col: str | Column = "html") -> Column:
    """Array of candidate block structs (txt, n_words, n_anchors,
    stopword_frac) for one HTML document — the segmentation +
    per-block features of the jusText scheme, all in-row."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    # null pages behave as empty ones (n_blocks 0, empty main_text) —
    # without the coalesce, size(split(null)) yields -1 and the audit
    # columns go nonsensical for exactly the rows most worth auditing
    c = F.coalesce(c, F.lit(""))
    cleaned = F.regexp_replace(
        F.regexp_replace(c, _DROP_WHOLE_RE, " "), _COMMENT_RE, " "
    )
    raw_blocks = F.split(cleaned, _BLOCK_TAG_RE)

    def feats(raw: Column) -> Column:
        txt = _block_text(raw)
        toks = tokens(txt)
        n_words = F.size(toks)
        n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
        n_anchors = F.size(F.split(raw, _ANCHOR_RE)) - F.lit(1)
        return F.struct(
            txt.alias("txt"),
            n_words.alias("n_words"),
            n_anchors.alias("n_anchors"),
            (n_stop.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")).alias(
                "stopword_frac"
            ),
        )

    return F.transform(raw_blocks, feats)


def extract_main_text(
    docs: DataFrame,
    min_words: int = 3,
    max_link_density: float = 0.25,
    min_stopword_frac: float = 0.0,
    html_col: str = "html",
    id_col: str = "doc_id",
    out_col: str = "main_text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, main_text, n_blocks, n_kept, link_frac): boilerplate-
    stripped text of each HTML document. A block survives when it has
    ≥ ``min_words`` words, anchor density (anchors per word) ≤
    ``max_link_density``, and stopword fraction ≥ ``min_stopword_frac``
    (0 disables — use ~0.1 for English-leaning crawls). Kept blocks
    join with newlines in document order.

    One projection: every document row carries its own segmentation and
    verdicts; nothing shuffles (pinned by a no-Exchange plan test).
    ``link_frac`` (fraction of blocks dropped as link-dense) is the
    audit signal for tuning ``max_link_density``. ``carry`` names input
    columns to pass through in the SAME projection — metadata (url,
    fetch date) rides along without a second scan of the (expensive)
    upstream subtree, e.g. a WARC parse."""
    blocks = html_blocks(html_col)

    def keeps(b: Column) -> Column:
        link_density = b["n_anchors"].cast("double") / F.greatest(
            b["n_words"], F.lit(1)
        ).cast("double")
        return (
            (b["n_words"] >= min_words)
            & (link_density <= max_link_density)
            & (b["stopword_frac"] >= min_stopword_frac)
        )

    def is_linky(b: Column) -> Column:
        link_density = b["n_anchors"].cast("double") / F.greatest(
            b["n_words"], F.lit(1)
        ).cast("double")
        return (b["n_words"] >= min_words) & (link_density > max_link_density)

    kept = F.filter(blocks, keeps)
    nonempty = F.filter(blocks, lambda b: b["n_words"] > 0)
    linky = F.filter(blocks, is_linky)
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.array_join(F.transform(kept, lambda b: b["txt"]), "\n").alias(out_col),
        F.size(nonempty).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        hround(
            F.size(linky).cast("double")
            / F.greatest(F.size(nonempty), F.lit(1)).cast("double"),
            6,
        ).alias("link_frac"),
    )
