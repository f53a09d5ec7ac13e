#!/usr/bin/env python
"""Single-core throughput of the CSR recovery kernel
(`functions/hydration.recover_csr`) on the three page shapes it sees:

  * rich     — server-rendered page (threshold short-circuits after
               noscript promotion + visible-text scan);
  * thin-csr — thin shell with a __NEXT_DATA__ payload (full recovery:
               JSON parse + walk + render);
  * soup     — hostile tag soup (worst-case regex scans, no payload).

The number that matters for the fetch boundary: recovery must be
small against network/page-parse cost (html_to_md converts ~1-5 ms
per page; a real fetch is tens of ms). Usage:

  python tools/bench_hydration.py [n_pages_per_shape]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions.hydration import recover_csr  # noqa: E402

RICH = (
    "<html><body><h1>Bài viết</h1>"
    + "<p>Nội dung có thật của trang với đủ độ dài hiển thị.</p>" * 20
    + '<img src="/a.jpg" alt="x"><noscript><img src="/b.jpg"></noscript>'
    + "</body></html>"
)

THIN = (
    '<html><body><div id="__next"></div>'
    '<script id="__NEXT_DATA__" type="application/json">'
    + json.dumps(
        {
            "props": {
                "pageProps": {
                    "article": {
                        "headline": "Chương 12",
                        "body": "Đoạn văn. " * 200,
                        "image": {"url": "/i.jpg", "caption": "Minh họa"},
                    }
                }
            }
        }
    )
    + "</script></body></html>"
)

SOUP = ("<<script>window.__INITIAL_STATE__ = {" + '"a":[' * 40 + "<div " * 50) * 4


def bench(name: str, page: str, n: int) -> dict:
    # warm
    for _ in range(50):
        recover_csr(page)
    t0 = time.perf_counter()
    for _ in range(n):
        recover_csr(page)
    dt = time.perf_counter() - t0
    return {
        "shape": name,
        "bytes": len(page),
        "pages_per_sec": round(n / dt, 1),
        "us_per_page": round(dt / n * 1e6, 1),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out = [bench(s, p, n) for s, p in (("rich", RICH), ("thin-csr", THIN), ("soup", SOUP))]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
