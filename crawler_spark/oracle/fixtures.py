"""Deterministic synthetic crawl world (FIXTURES.md, seed=42).

Generates, with no external data:

  * ``seeds``     — metadata rows mirroring ``data/main.tsv`` (reference
                    header ``data/main.tsv:1``; schema
                    ``src/lib/crawler/schema.ts:68-182``), including
                    deliberate duplicate source_urls (first-wins dedup,
                    ``thanhlinh.net/getMetadataList.ts:197``), a few
                    ``pdf`` rows that the seed filter must drop
                    (``thanhlinh.net/main.ts:15-19``) and schema-invalid
                    rows that must quarantine, not crash
                    (``crawlerUtils.ts:22-37``);
  * ``web_graph`` — fetchable pages: markdown bodies with headings,
                    footnote markers, image tags ``![caption](url)``,
                    chapter TOC links for has_chapters docs (with a
                    duplicate-chapter-link and a self-link cycle,
                    ``rongmotamhon.net/getChapters.ts:52-70``), Zipf-ish
                    host skew (site0 ≥ 60% of URLs), and deterministic
                    transient/permanent fetch failures;
  * ``robots``    — per-host disallow prefixes (north rule);
  * ``politeness``— small per-host budgets so ordering under politeness
                    is observable at tiny scale;
  * ``images``    — the payload table in the exact ``input_hint`` shape
                    (image_id, bytes, w, h, fmt, caption, phash) plus
                    golden raw pixels for PSNR checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from crawler_spark.functions import images as im

SITES = ["site0.test", "site1.test", "site2.test", "site3.test"]
# Zipf-ish skew: dominant host gets ~60% of documents (exercises salting)
SITE_WEIGHTS = [0.60, 0.20, 0.12, 0.08]
GENRES = ["A", "C", "D", "N", "Z"]
FMTS = ["ppm", "bmp", "png", "qjpg", "jpg", "gif"]
CAPTION_WORDS = ["Hằng Cứu Giúp", "La Vang", "Fatima", "Lộ Đức", "Trà Kiệu"]
MAX_ATTEMPTS = 5


@dataclass
class PageSpec:
    url: str
    host: str
    body: str
    fail_rounds: int  # attempts 1..fail_rounds fail; (99 = permanent)
    latency_ms: int


@dataclass
class ImageSpec:
    image_id: str
    url: str
    caption: str
    fmt: str
    w: int
    h: int
    data: bytes
    pixels: bytes  # raw RGB golden buffer
    phash: int


@dataclass
class World:
    seeds: list[dict] = field(default_factory=list)
    pages: dict[str, PageSpec] = field(default_factory=dict)
    robots: list[dict] = field(default_factory=list)
    politeness: dict[str, int] = field(default_factory=dict)
    images: dict[str, ImageSpec] = field(default_factory=dict)  # by url


def _mk_image(rng: np.random.Generator, idx: int, site: str) -> ImageSpec:
    w = int(rng.choice([16, 32, 64, 128]))
    h = int(rng.choice([16, 32, 64, 128]))
    fmt = FMTS[idx % len(FMTS)]
    if fmt == "gif":
        # GIF is palettized (≤ 256 colors, lossless for palette
        # images): draw pixels from a random 64-color palette
        palette = rng.integers(0, 256, (64, 3), dtype=np.uint8)
        arr = palette[rng.integers(0, 64, (h, w))]
    else:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = im.encode_image(arr, fmt)
    decoded = im.decode_image(data, fmt)  # golden = decode(encode(.)) —
    # for lossy fmts the *stored* truth is the decoded result
    caption = f"Hình {idx}: Đức Mẹ {CAPTION_WORDS[idx % len(CAPTION_WORDS)]}"
    return ImageSpec(
        image_id=f"img_{idx:08d}",
        url=f"http://{site}/img/{idx}.{fmt}",
        caption=caption,
        fmt=fmt,
        w=w,
        h=h,
        data=data,
        pixels=decoded.tobytes(),
        phash=im.phash64(decoded),
    )


def _body_for(
    world: World,
    rng: np.random.Generator,
    site: str,
    url: str,
    doc_num: int,
    n_chapters: int,
    img_start: int,
) -> tuple[str, int]:
    """Markdown body; returns (body, next_img_idx). Chapter links are
    embedded as markdown links the discovery step extracts."""
    lines = [f"# Tài liệu {doc_num}", ""]
    n_imgs = int(rng.integers(1, 3))
    idx = img_start
    for k in range(n_imgs):
        spec = _mk_image(rng, idx, site)
        world.images[spec.url] = spec
        lines.append(f"Đoạn văn {k} với chú thích[{k + 1}] và hình.")
        lines.append(f"![{spec.caption}]({spec.url})")
        lines.append("")
        idx += 1
    if n_chapters > 0:
        lines.append("## Mục lục")
        for c in range(1, n_chapters + 1):
            ch_url = f"http://{site}/doc/{doc_num}/ch_{c}_p"
            lines.append(f"- [Chương {c}]({ch_url})")
            if c == 1:  # duplicate chapter link — derived-key dedup (D2)
                lines.append(f"- [Chương {c} (bis)]({ch_url})")
        lines.append(f"- [Quay lại]({url})")  # self-link cycle (D4)
    return "\n".join(lines), idx


def build_world(
    n_docs: int = 40,
    seed: int = 42,
    chapter_frac: float = 0.3,
    manual_frac: float = 0.1,
    budget: int = 2,
) -> World:
    rng = np.random.default_rng(seed)
    world = World()
    world.politeness = {s: budget for s in SITES}
    for s in SITES:
        world.robots.append({"host": s, "path_prefix": "/private", "allow": False})
        world.robots.append({"host": s, "path_prefix": "/", "allow": True})

    site_of = rng.choice(len(SITES), size=n_docs, p=SITE_WEIGHTS)
    per_site_count: dict[str, int] = {s: 0 for s in SITES}
    img_idx = 0
    seq = 0
    for i in range(n_docs):
        site = SITES[int(site_of[i])]
        per_site_count[site] += 1
        doc_num = per_site_count[site]
        private = rng.random() < 0.05  # robots-disallowed doc
        path = f"/private/doc/{doc_num}" if private else f"/doc/{doc_num}"
        url = f"http://{site}{path}"
        has_chapters = bool(rng.random() < chapter_frac)
        n_ch = int(rng.integers(2, 5)) if has_chapters else 0
        genre = GENRES[i % len(GENRES)]
        row = {
            "seq": seq,
            "document_number": doc_num,
            "document_id": f"DSG_{doc_num:03d}",
            "title": f"Tựa đề {i} — Đức Tin {genre}",
            "genre_code": genre,
            "genre_category": "B",
            "tag_category": "t1 | t2",
            "volume": "",
            "author": f"Tác giả {i % 7}",
            "source_type": "pdf" if rng.random() < 0.05 else "web",
            "source_url": url,
            "source": site,
            "has_chapters": has_chapters,
            "published_time": f"{(i % 28) + 1:02d}/{(i % 12) + 1:02d}/20{10 + i % 15}"
            if i % 9
            else "2021",
            "language": "Việt",
            "requires_manual_check": bool(rng.random() < manual_frac),
        }
        world.seeds.append(row)
        seq += 1
        # deliberate duplicate source_url rows (first-wins dedup)
        if i % 11 == 3:
            dup = dict(row)
            dup["seq"] = seq
            dup["title"] = row["title"] + " (bản sao)"
            dup["requires_manual_check"] = not row["requires_manual_check"]
            world.seeds.append(dup)
            seq += 1
        # schema-invalid rows: bad genre / negative document_number
        if i % 17 == 5:
            bad = dict(row)
            bad["seq"] = seq
            bad["genre_code"] = "9"  # invalid: must be A-Z letter
            bad["document_number"] = -1
            world.seeds.append(bad)
            seq += 1

        # page bodies
        body, img_idx = _body_for(world, rng, site, url, doc_num, n_ch, img_idx)
        fail = 0
        r = rng.random()
        if r < 0.10:
            fail = int(rng.integers(1, 3))  # transient: succeeds on retry
        elif r < 0.14:
            fail = 99  # permanent failure
        world.pages[url] = PageSpec(
            url=url,
            host=site,
            body=body,
            fail_rounds=fail,
            latency_ms=int(rng.integers(5, 50)),
        )
        for c in range(1, n_ch + 1):
            ch_url = f"http://{site}/doc/{doc_num}/ch_{c}_p"
            ch_body, img_idx = _body_for(
                world, rng, site, ch_url, doc_num, 0, img_idx
            )
            cfail = int(rng.integers(1, 3)) if rng.random() < 0.08 else 0
            world.pages[ch_url] = PageSpec(
                url=ch_url,
                host=site,
                body=ch_body,
                fail_rounds=cfail,
                latency_ms=int(rng.integers(5, 50)),
            )
    return world


def robots_allowed(world: World, host: str, path: str) -> bool:
    """Longest-prefix-match robots decision (our spec; reference has no
    robots handling — verified SURVEY §2.10). RFC 9309 tie-break:
    among equally long matches, allow wins — mirrors
    ``operators/robots.py`` exactly (fixture rule sets have no ties,
    but the spec is total either way)."""
    matches = [
        r
        for r in world.robots
        if r["host"] == host and path.startswith(r["path_prefix"])
    ]
    if not matches:
        return True
    best_len = max(len(r["path_prefix"]) for r in matches)
    return any(
        r["allow"] for r in matches if len(r["path_prefix"]) == best_len
    )
