"""CSR content recovery (functions/hydration.py).

The reference reads every page through a hydrated browser DOM
(`src/sites/thanhlinh.net/getPageContent.ts:32-60` waits on selectors
before extracting); this module recovers the same content for the
no-JS fetcher whenever the framework serialized it into the HTML.
Pure-Python tests (no Spark) except the final UDF shape check.
"""

from __future__ import annotations

import json

from crawler_spark.functions.hydration import (
    extract_jsonld,
    extract_state_json,
    hydrated_content,
    promote_noscript,
    recover_csr,
    visible_text_len,
)

NEXT_PAGE = """<!doctype html><html><head><title>t</title></head>
<body><div id="__next"></div>
<script id="__NEXT_DATA__" type="application/json">
{"props":{"pageProps":{"article":{"headline":"Chapter 12",
"body":"In the beginning was the Word.\\n\\nAnd the Word was with God.",
"image":{"url":"/img/page12.jpg","caption":"Folio 12 recto"}}}},
"page":"/c/12","buildId":"abc"}
</script></body></html>"""

JSONLD_PAGE = """<html><head>
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"NewsArticle",
 "headline":"Synod closes",
 "articleBody":"The synod closed on Sunday with a procession.",
 "image":[{"@type":"ImageObject","contentUrl":"https://h/a.jpg",
           "caption":"The procession"},
          {"@type":"ImageObject","contentUrl":"https://h/b.jpg"}]}
</script></head><body><div id="root"></div></body></html>"""

STATE_PAGE = """<html><body><div id="app"></div><script>
window.__INITIAL_STATE__ = {"post":{"title":"x","content":
"Serialized body text that only exists in the store.","tags":["a}"]}};
window.other = 1;
</script></body></html>"""


def test_promote_noscript_exposes_lazy_img():
    html = (
        '<img class="lazy" src="data:image/gif;base64,R0lGODlh" '
        'data-src="/real.jpg"><noscript><img src="/real.jpg" '
        'alt="Real"></noscript>'
    )
    out = promote_noscript(html)
    assert "<noscript>" not in out
    assert out.count('src="/real.jpg"') == 2


def test_extract_jsonld_flattens_graph_and_skips_bad_json():
    html = (
        '<script type="application/ld+json">{"@graph":[{"@type":"WebPage",'
        '"name":"P"},{"@type":"ImageObject","contentUrl":"u"}]}</script>'
        '<script type="application/ld+json">{broken</script>'
    )
    nodes = extract_jsonld(html)
    types = [n.get("@type") for n in nodes]
    assert types == [None, "WebPage", "ImageObject"]


def test_extract_state_braces_inside_strings():
    states = extract_state_json(STATE_PAGE)
    assert len(states) == 1
    name, payload = states[0]
    assert name == "__INITIAL_STATE__"
    assert payload["post"]["tags"] == ["a}"]


def test_extract_state_next_data():
    states = extract_state_json(NEXT_PAGE)
    assert states[0][0] == "__NEXT_DATA__"
    assert states[0][1]["page"] == "/c/12"


def test_hydrated_content_jsonld_first():
    c = hydrated_content(JSONLD_PAGE)
    assert c["headline"] == "Synod closes"
    assert c["body"].startswith("The synod closed")
    assert c["images"] == [
        ("https://h/a.jpg", "The procession"),
        ("https://h/b.jpg", ""),
    ]


def test_hydrated_content_state_walk_document_order():
    c = hydrated_content(NEXT_PAGE)
    assert "In the beginning" in c["body"]
    assert ("/img/page12.jpg", "Folio 12 recto") in c["images"]


def test_recover_csr_thin_shell_appends_marked_block():
    out = recover_csr(NEXT_PAGE)
    assert "<!-- csr-recovered -->" in out
    assert "<h1>Chapter 12</h1>" in out
    assert '<figcaption>Folio 12 recto</figcaption>' in out
    # original bytes preserved as a prefix
    assert out.startswith(NEXT_PAGE.split("</html>")[0][:40])


def test_recover_csr_rich_page_untouched_beyond_noscript():
    rich = "<html><body>" + ("<p>real text</p>" * 40) + NEXT_PAGE
    out = recover_csr(rich)
    assert "<!-- csr-recovered -->" not in out


def test_recover_csr_no_payload_is_noscript_only():
    html = "<html><body><div id='root'></div><noscript><p>hi</p></noscript>"
    out = recover_csr(html)
    assert out == "<html><body><div id='root'></div><p>hi</p>"


def test_recover_csr_escapes_payload_html_metachars():
    # a real page embeds "</script>" inside JSON as "<\/script>" (a
    # literal close tag would terminate the script element — and this
    # module's tokenizer honors that HTML rule); \/ is valid JSON
    html = (
        '<div id="r"></div><script type="application/ld+json">'
        '{"@type": "Article", '
        '"headline": "<script>alert(1)<\\/script>", '
        '"articleBody": "a & b < c"}'
        "</script>"
    )
    out = recover_csr(html)
    assert "<script>alert(1)</script></h1>" not in out
    assert "&lt;script&gt;" in out
    assert "<p>a &amp; b &lt; c</p>" in out


def test_literal_close_tag_terminates_jsonld_block():
    # HTML rule: an unescaped </script> inside the payload ends the
    # element; the truncated prefix is not valid JSON and is skipped
    html = (
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":"<script>x</script>"}'
        "</script>"
    )
    assert extract_jsonld(html) == []


def test_visible_text_len_ignores_scripts():
    assert visible_text_len(NEXT_PAGE) < 20


def test_hostile_deep_nesting_bounded():
    deep = json.loads("{}")
    node = deep
    for _ in range(300):
        node["child"] = {"content": "x"}
        node = node["child"]
    html = (
        '<div id="r"></div><script>window.__INITIAL_STATE__ = '
        + json.dumps(deep)
        + ";</script>"
    )
    # must not raise; collection stops at the depth cap
    c = hydrated_content(html)
    assert c["body"] is None or isinstance(c["body"], str)


def test_oversized_payload_skipped():
    big = '{"content":"' + "x" * (3 * 1024 * 1024) + '"}'
    html = (
        '<div id="r"></div><script id="__NEXT_DATA__" '
        'type="application/json">' + big + "</script>"
    )
    assert hydrated_content(html)["body"] is None


def test_image_dedup_first_wins():
    html = (
        '<div id="r"></div><script type="application/ld+json">'
        '{"@type":"Article","image":[{"@type":"ImageObject",'
        '"contentUrl":"u1","caption":"first"},{"@type":"ImageObject",'
        '"contentUrl":"u1","caption":"second"}]}</script>'
    )
    c = hydrated_content(html)
    assert c["images"] == [("u1", "first")]


def test_fetch_boundary_absolutizes_recovered_images(spark):
    """Opt-in csr_recover at fetch_scheduled: recovered relative image
    URLs resolve against the page URL like author-written markup."""
    import pandas as pd

    from crawler_spark.sources.fetch import FETCH_RESULT_FIELDS, fetch_scheduled

    class _CsrFetcher:
        BODY_KIND = "html"
        RESULT_FIELDS = FETCH_RESULT_FIELDS

        def fetch_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
            out = pdf.copy()
            out["body"] = [NEXT_PAGE] * len(pdf)
            out["status"] = 200
            out["success"] = True
            out["latency_ms"] = 1
            return out

    sched = spark.createDataFrame(
        [("https://ex.test/c/12", "ex.test")], "url string, host string"
    )
    rows = fetch_scheduled(
        sched, _CsrFetcher(), csr_recover=True
    ).collect()
    assert len(rows) == 1
    body = rows[0].body
    assert "<!-- csr-recovered -->" in body
    assert 'src="https://ex.test/img/page12.jpg"' in body


# ---------------------------------------------------------------------------
# adversarial property fuzz: arbitrary bytes must never raise, and the
# structural guarantees hold on any input
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SOUP = st.text(
    alphabet=st.sampled_from(
        list('<>{}[]"\\/=;:,.&#! \n\tabcdeNEXTDATAscriptnoscriptwindow_')
    ),
    max_size=400,
)


@settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(_SOUP)
def test_recover_csr_total_on_tag_soup(soup):
    """recover_csr is total: any byte soup (broken tags, truncated
    JSON, dangling assignments) produces a string, never an
    exception; noscript containers never survive."""
    out = recover_csr(soup)
    assert isinstance(out, str)
    assert "<noscript" not in out.lower() or "</noscript" not in out.lower()


@settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(_SOUP, st.integers(min_value=0, max_value=50))
def test_state_extraction_total_and_json_strict(soup, pad):
    html = soup + 'window.__INITIAL_STATE__ = ' + soup[:pad]
    for name, payload in extract_state_json(html):
        # anything extracted round-trips through strict json
        json.dumps(payload)


@settings(max_examples=100, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(_SOUP)
def test_rich_page_prefix_preserved(soup):
    """When no recovery block is appended, output bytes are exactly
    the noscript-promoted input — recovery never mutates author
    content in place."""
    out = recover_csr(soup)
    if "<!-- csr-recovered -->" not in out:
        assert out == promote_noscript(soup)
    else:
        assert out.startswith(promote_noscript(soup))
