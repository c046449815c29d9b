"""HTML main-text extraction (operators/html.py): python-reference
golden over a realistic page, edge cases, and the zero-shuffle plan
contract."""

from __future__ import annotations

import re

from rnadam_spark.operators import html as H
from rnadam_spark.operators.text import STOPWORDS

PAGE = """<!DOCTYPE html><html><head><title>Site</title>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head><body>
<!-- tracking comment <div>hidden</div> -->
<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About us</a></li>
<li><a href="/contact">Contact</a></li></ul></nav>
<div class="content">
<h1>The quick study of a brown fox</h1>
<p>The quick brown fox jumps over the lazy dog and the small cat in a
single bound, which is a feat of agility.</p>
<p>It was &quot;amazing&quot; to see &amp; hear &#39;the&#39; crowd react
to the jump &lt;live&gt; on the field.</p>
<p>Short one.</p>
<p>See <a href="/fox">the fox page</a> for more details of the jump and
the full story of the day.</p>
</div>
<footer><a href="/privacy">Privacy</a> | <a href="/terms">Terms</a> |
<a href="/jobs">Jobs</a></footer>
</body></html>"""

DOCS = [(1, PAGE), (2, ""), (3, "plain text with no tags at all here the end"),
        (4, "<p></p><div></div>")]

_DROP = r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>"
_COMMENT = r"(?s)<!--.*?-->"
_BLOCK = (
    r"(?i)</?(?:p|div|br|li|h[1-6]|tr|td|th|table|thead|tbody|ul|ol|dl|dt|dd"
    r"|blockquote|section|article|aside|header|footer|nav|form|pre|figure"
    r"|figcaption|main|body|html|head|title)(?:\s[^>]*)?/?>"
)
_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&"))


def _py_extract(page, min_words=3, max_link_density=0.25, min_stop=0.0):
    cleaned = re.sub(_DROP, " ", page)
    cleaned = re.sub(_COMMENT, " ", cleaned)
    kept, n_blocks, n_kept, n_linky = [], 0, 0, 0
    for raw in re.split(_BLOCK, cleaned):
        txt = re.sub(r"<[^>]*>", " ", raw)
        for ent, rep in _ENTITIES:
            txt = txt.replace(ent, rep)
        txt = re.sub(r"\s+", " ", txt).strip()
        toks = [t for t in re.split(r"\s+", txt) if t]
        n_words = len(toks)
        if n_words > 0:
            n_blocks += 1
        n_anchors = len(re.findall(r"(?i)<a[\s>]", raw))
        link_density = n_anchors / max(n_words, 1)
        n_stop = sum(1 for t in toks if t.lower() in STOPWORDS)
        stop_frac = n_stop / max(n_words, 1)
        if n_words >= min_words and link_density > max_link_density:
            n_linky += 1
        if n_words >= min_words and link_density <= max_link_density and stop_frac >= min_stop:
            kept.append(txt)
            n_kept += 1
    import math
    lf = math.floor(n_linky / max(n_blocks, 1) * 1e6 + 0.5) / 1e6
    return "\n".join(kept), n_blocks, n_kept, lf


def test_extract_matches_python_reference(spark):
    got = {
        r.doc_id: (r.main_text, r.n_blocks, r.n_kept, r.link_frac)
        for r in H.extract_main_text(
            spark.createDataFrame(DOCS, ["doc_id", "html"])
        ).collect()
    }
    for doc_id, page in DOCS:
        assert got[doc_id] == _py_extract(page), f"doc {doc_id}"


def test_extract_drops_boilerplate_keeps_prose(spark):
    got = {
        r.doc_id: r
        for r in H.extract_main_text(
            spark.createDataFrame(DOCS, ["doc_id", "html"])
        ).collect()
    }
    text = got[1].main_text
    # prose paragraphs survive, entities decoded
    assert "quick brown fox jumps" in text
    assert '"amazing"' in text and "& hear" in text and "<live>" in text
    # nav/footer link lists, script body, and comments are gone
    assert "Home" not in text and "Privacy" not in text
    assert "var x" not in text and "tracking comment" not in text
    # the short block misses min_words
    assert "Short one." not in text
    # tag-free text passes through whole
    assert got[3].main_text == "plain text with no tags at all here the end"
    assert got[2].main_text == "" and got[2].n_blocks == 0
    assert got[4].main_text == "" and got[4].n_blocks == 0


def test_extract_plan_is_shuffle_free(spark):
    df = H.extract_main_text(spark.createDataFrame(DOCS, ["doc_id", "html"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_html_behaves_as_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "<p>the fox is one of a kind and is fast</p>")],
        ["doc_id", "html"],
    )
    got = {r.doc_id: r for r in H.extract_main_text(docs).collect()}
    assert got[1].main_text == "" and got[1].n_blocks == 0
    assert got[1].n_kept == 0 and got[1].link_frac == 0.0
    assert "fox" in got[2].main_text


def test_stopword_gate(spark):
    # a word-salad block (no stopwords) dies when min_stopword_frac > 0
    docs = spark.createDataFrame(
        [(1, "<p>lorem ipsum dolor sit amet consectetur adipiscing elit</p>"
             "<p>the fox is one of a kind and is fast</p>")],
        ["doc_id", "html"],
    )
    strict = H.extract_main_text(docs, min_stopword_frac=0.2).collect()[0]
    assert "lorem" not in strict.main_text
    assert "fox" in strict.main_text
