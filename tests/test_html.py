"""C16 HTML→Markdown: golden cases + Spark pandas-UDF surface parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.html import html_to_md, html_to_md_udf

CASES = [
    ("<h1>Tựa đề</h1><p>Đoạn một.</p>", "# Tựa đề\n\nĐoạn một."),
    ("<p>In <strong>đậm</strong> và <em>nghiêng</em>.</p>", "In **đậm** và *nghiêng*."),
    (
        '<p>Xem <a href="http://x.vn/a">liên kết</a>.</p>',
        "Xem [liên kết](http://x.vn/a).",
    ),
    (
        '<p><img src="http://x/i.png" alt="Hình Đức Mẹ"></p>',
        "![Hình Đức Mẹ](http://x/i.png)",
    ),
    (
        '<p><img alt="Alt trước" src="http://x/j.png"/></p>',
        "![Alt trước](http://x/j.png)",
    ),
    ('<p><img src="http://x/k.png"></p>', "![](http://x/k.png)"),
    ("<ul><li>một</li><li>hai</li></ul>", "- một\n- hai"),
    ("<blockquote>Trích dẫn</blockquote>", "> Trích dẫn"),
    ("<p>dòng<br>ngắt</p>", "dòng\nngắt"),
    (
        "<script>alert('x')</script><style>p{}</style><p>sạch</p><!-- ghi chú -->",
        "sạch",
    ),
    ("<p>&amp;amp; &lt;tag&gt; &quot;q&quot; &#7879;</p>", '&amp; <tag> "q" ệ'),
    ("<div class='x'><span>giữ chữ</span></div>", "giữ chữ"),
    ("<h3 id='a'>Mục</h3>", "### Mục"),
]


def test_html_to_md_goldens():
    for html, want in CASES:
        assert html_to_md(html) == want, html


def test_entity_encoded_markup_stays_text():
    # &lt;strong&gt; must NOT become markdown emphasis
    assert html_to_md("<p>&lt;strong&gt;x&lt;/strong&gt;</p>") == "<strong>x</strong>"


def test_udf_surface(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, html string"
    )
    rows = df.select("i", html_to_md_udf(F.col("html")).alias("md")).collect()
    for r in rows:
        assert r["md"] == CASES[r["i"]][1]
    # null passthrough
    one = spark.createDataFrame([(None,)], "html string")
    assert one.select(html_to_md_udf("html").alias("md")).first()["md"] is None
