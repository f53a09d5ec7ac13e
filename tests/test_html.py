"""C16 HTML→Markdown: golden cases + Spark pandas-UDF surface parity.

r3 extends the subset with GFM tables, ordered lists, code,
strikethrough, hr, and retext-smartypants text punctuation (VERDICT r2
#4; the real unified pipeline itself is npm/network-blocked here —
goldens are hand-derived from the published plugin semantics)."""

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
    # smartypants: entity-decoded straight quotes curl (text-node scope)
    ("<p>&amp;amp; &lt;tag&gt; &quot;q&quot; &#7879;</p>", "&amp; <tag> “q” ệ"),
    ("<div class='x'><span>giữ chữ</span></div>", "giữ chữ"),
    ("<h3 id='a'>Mục</h3>", "### Mục"),
    # --- r3: GFM + smartypants additions -------------------------------
    ("<ol><li>đầu</li><li>giữa</li><li>cuối</li></ol>", "1. đầu\n2. giữa\n3. cuối"),
    ("<p>trước</p><hr><p>sau</p>", "trước\n\n***\n\nsau"),
    ("<p>gạch <del>bỏ</del> và <s>xoá</s></p>", "gạch ~~bỏ~~ và ~~xoá~~"),
    ("<p>mã <code>a|b -- c</code> xong</p>", "mã `a|b -- c` xong"),
    (
        "<pre><code>if (a &lt; b) {\n  x = \"y\";\n}</code></pre>",
        '```\nif (a < b) {\n  x = "y";\n}\n```',
    ),
    (
        "<table><tr><th>Tên</th><th align='right'>Số</th></tr>"
        "<tr><td>a|b</td><td>1</td></tr>"
        "<tr><td><strong>c</strong></td><td>2</td></tr></table>",
        "| Tên | Số |\n| --- | --: |\n| a\\|b | 1 |\n| **c** | 2 |",
    ),
    (
        "<table><tr><th style='text-align:center'>X</th></tr>"
        "<tr><td>v</td></tr></table>",
        "| X |\n| :-: |\n| v |",
    ),
    # smartypants: quotes, em dash, ellipsis; URLs stay untouched
    (
        "<p>\"kép\" và 'đơn' -- rồi... hết</p>",
        "“kép” và ‘đơn’ — rồi… hết",
    ),
    (
        '<p>apostrophe trong don\'t</p>',
        "apostrophe trong don’t",
    ),
    (
        '<p>Xem <a href="http://x/a--b...c">nơi \'này\'</a></p>',
        "Xem [nơi ‘này’](http://x/a--b...c)",
    ),
    ("<p>TeX ``trích'' xưa</p>", "TeX “trích” xưa"),
]


def test_html_to_md_goldens():
    for html, want in CASES:
        assert html_to_md(html) == want, html


def test_entity_encoded_markup_stays_text():
    # &lt;strong&gt; must NOT become markdown emphasis
    assert html_to_md("<p>&lt;strong&gt;x&lt;/strong&gt;</p>") == "<strong>x</strong>"


def test_code_content_protected_from_smartypants():
    # quotes/dashes INSIDE code must stay straight (text-node scope)
    got = html_to_md("<p><code>\"x\" -- 'y'</code> ngoài \"z\"</p>")
    assert got == "`\"x\" -- 'y'` ngoài “z”"


def test_table_delimiter_survives_smartypants():
    got = html_to_md("<table><tr><th>a</th></tr><tr><td>b -- c</td></tr></table>")
    assert got == "| a |\n| --- |\n| b — c |"


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
