"""Engine e2e over a raw-HTML fetcher with CSR recovery.

The reference reads every site through a hydrated browser DOM
(`src/sites/*/getPageContent*.ts`); this repo's engine consumes
fetched bytes. These tests pin the full no-browser path: an
HTML-body fetcher's pages are (1) CSR-recovered (hydration payloads /
noscript), (2) absolutized, (3) normalized to the engine's markdown
body model, and then the STANDARD discovery + extraction stages see
links and image+caption pairs — no special-case stages.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawler_spark.plans.store import SnapshotStore
from crawler_spark.sources.fetch import FETCH_RESULT_FIELDS
from crawler_spark.streaming.rounds import CrawlEngine

HOST = "csr.test"

# server-rendered page: one author image with figcaption, one link
SERVER_PAGE = """<html><body>
<h1>Trang chủ</h1>
<p>Nội dung thực sự của trang, đủ dài
để không bị coi là vỏ mỏng: câu
mở đầu, câu thân bài và câu
kết luận. Thêm vài chữ nữa cho chắc
chắn vượt ngưỡng hai trăm ký
tự hiển thị của bộ lọc trang vỏ.</p>
<figure><img src="/img/main.jpg">
<figcaption>Ảnh chính</figcaption></figure>
<a href="/chapter-2">Chương 2</a>
</body></html>"""

# thin CSR shell: content only exists in the hydration payload
CSR_PAGE = """<html><body><div id="__next"></div>
<script id="__NEXT_DATA__" type="application/json">
{"props":{"pageProps":{"article":{"headline":"Chương 2",
"body":"Văn bản chỉ có trong payload.",
"image":{"url":"/img/ch2.jpg","caption":"Minh họa chương 2"}}}}}
</script></body></html>"""


def make_html_fetcher(pages):
    # defined inside a function so cloudpickle ships the class BY
    # VALUE (a module-level class in tests/ pickles by reference,
    # which executors cannot import)
    class HtmlFixtureFetcher:
        BODY_KIND = "html"
        RESULT_FIELDS = FETCH_RESULT_FIELDS

        def __init__(self, pages):
            self.pages = pages

        def fetch_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
            out = pdf.copy()
            out["body"] = [self.pages.get(u) for u in out["url"]]
            out["status"] = [
                200 if b is not None else 404 for b in out["body"]
            ]
            out["success"] = out["body"].notna()
            out["latency_ms"] = 1
            return out

    return HtmlFixtureFetcher(pages)


@pytest.fixture()
def engine(spark, tmp_path):
    seeds = spark.createDataFrame(
        [
            (
                "A", 1, "web", f"https://{HOST}/a", 1, HOST, "doc-a",
                False, True,
            )
        ],
        "genre_code string, document_number int, source_type string, "
        "source_url string, seq int, source string, document_id string, "
        "requires_manual_check boolean, has_chapters boolean",
    )
    robots = spark.createDataFrame(
        [(HOST, "/", True)], "host string, path_prefix string, allow boolean"
    )
    politeness = spark.createDataFrame(
        [(HOST, 4)], "host string, budget_per_round int"
    )
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp_path / "store")),
        fetcher=make_html_fetcher(
            {
                f"https://{HOST}/a": SERVER_PAGE,
                f"https://{HOST}/chapter-2": CSR_PAGE,
            }
        ),
        robots=robots,
        politeness=politeness,
        csr_recover=True,
    )
    eng.init_frontier(seeds)
    return eng


def test_html_engine_discovers_and_extracts_csr(engine):
    engine.run(max_rounds=4)

    pages = {r["url"]: r for r in engine.store.read("pages").collect()}
    # discovery followed the converted <a> link into round 2
    assert f"https://{HOST}/chapter-2" in pages

    # bodies are stored as markdown (engine body model), absolutized
    body_a = pages[f"https://{HOST}/a"]["body"]
    assert "# Trang chủ" in body_a
    assert f"![Ảnh chính](https://{HOST}/img/main.jpg)" in body_a
    assert f"[Chương 2](https://{HOST}/chapter-2)" in body_a

    # the CSR page's hydrated content survived into markdown
    body_b = pages[f"https://{HOST}/chapter-2"]["body"]
    assert "# Chương 2" in body_b
    assert "Văn bản chỉ có trong payload." in body_b

    ext = {
        (r["img_url"], r["caption"])
        for r in engine.store.read("extractions").collect()
    }
    assert (f"https://{HOST}/img/main.jpg", "Ảnh chính") in ext
    # the hydrated image went through the SAME extraction stage, with
    # its caption from the payload and its URL absolutized
    assert (f"https://{HOST}/img/ch2.jpg", "Minh họa chương 2") in ext


def test_html_engine_without_csr_recovery_misses_payload(spark, tmp_path):
    """Control: same world, csr_recover off — the thin shell yields no
    image, proving the recovery stage (not some other path) did it."""
    seeds = spark.createDataFrame(
        [("A", 1, "web", f"https://{HOST}/chapter-2", 1, HOST, "doc-b",
          False, False)],
        "genre_code string, document_number int, source_type string, "
        "source_url string, seq int, source string, document_id string, "
        "requires_manual_check boolean, has_chapters boolean",
    )
    robots = spark.createDataFrame(
        [(HOST, "/", True)], "host string, path_prefix string, allow boolean"
    )
    politeness = spark.createDataFrame(
        [(HOST, 4)], "host string, budget_per_round int"
    )
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp_path / "store2")),
        fetcher=make_html_fetcher({f"https://{HOST}/chapter-2": CSR_PAGE}),
        robots=robots,
        politeness=politeness,
        csr_recover=False,
    )
    eng.init_frontier(seeds)
    eng.run(max_rounds=2)
    urls = {r["img_url"] for r in eng.store.read("extractions").collect()}
    assert f"https://{HOST}/img/ch2.jpg" not in urls
