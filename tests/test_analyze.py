"""Corpus stats rollup + JSON/XML chapter exports over tree tables."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from crawler_spark.analyze import corpus_stats, export_json, export_xml
from crawler_spark.operators.treegen import build_sentence_tables


def _tables(spark, world):
    import re

    rows = []
    # one site only: DSG ids are per-corpus keys; the multi-site fixture
    # reuses document numbers across sites, which would alias sentence
    # ids (the exports require unique ids, as the reference's per-genre
    # directories do)
    # content pages only (reference: chaptered docs get their content
    # from chapter pages, the landing page is a TOC — crawler.ts:240-247)
    chaptered = {u.split("/ch_")[0] for u in world.pages if "/ch_" in u}
    for url, p in world.pages.items():
        if "site0.test" not in url:
            continue
        if "/private/" in url:
            # robots-disallowed paths never reach the corpus (the
            # engine's robots filter drops them before fetch); this
            # quick builder must match, or a /private/doc/N page
            # aliases doc N's sentence ids
            continue
        if "/ch_" not in url and url in chaptered:
            continue
        m = re.search(r"/doc/(\d+)", url)
        doc_num = int(m.group(1)) if m else 0
        depth = 1 if "ch_" in url else 0
        rows.append((url, f"DSG_{doc_num:03d}", doc_num, depth, p.body))
    pages = spark.createDataFrame(
        rows, "url string, doc_id string, document_number int, depth int, body string"
    )
    return build_sentence_tables(pages)


def test_corpus_stats_rollup(spark, world):
    s_df, _, _ = _tables(spark, world)
    genres = spark.createDataFrame(
        [(r["doc_id"],) for r in s_df.select("doc_id").distinct().collect()],
        "doc_id string",
    ).withColumn(
        "genre",
        F.element_at(
            F.array(F.lit("A"), F.lit("C"), F.lit("N")),
            (F.abs(F.xxhash64("doc_id")) % 3 + 1).cast("int"),
        ),
    )
    stats = {r["genre"]: r for r in corpus_stats(s_df, genres).collect()}
    assert "ALL" in stats
    total = stats["ALL"]
    assert total["sentence_share"] == 1.0
    per_genre = [v for k, v in stats.items() if k != "ALL"]
    assert sum(v["n_sentences"] for v in per_genre) == total["n_sentences"]
    assert sum(v["n_words"] for v in per_genre) == total["n_words"]
    for v in per_genre:
        assert 0 < v["sentence_share"] < 1
        assert v["avg_words_per_sentence"] > 0


def test_export_json_roundtrip(spark, world):
    s_df, f_df, _ = _tables(spark, world)
    out = export_json(s_df, f_df).collect()
    assert out
    n_sent = 0
    for r in out:
        doc = json.loads(r["json"])
        assert doc["doc_id"] == r["doc_id"]
        for page in doc["pages"]:
            for s in page["sentences"]:
                n_sent += 1
                assert s["sentence_id"].startswith(r["doc_id"])
    assert n_sent == s_df.count()


def test_export_xml_wellformed(spark, world):
    import xml.etree.ElementTree as ET

    s_df, f_df, _ = _tables(spark, world)
    out = export_xml(s_df, f_df).collect()
    assert out
    n_stc = 0
    n_fn = 0
    for r in out:
        root = ET.fromstring(r["xml"])
        assert root.tag == "FILE" and root.attrib["ID"] == r["doc_id"]
        sect = root.find("SECT")
        assert sect.attrib["NUMBER"] == str(r["chapter_num"])
        n_stc += len(sect.findall(".//STC"))
        n_fn += len(sect.findall(".//FOOTNOTE"))
    assert n_stc == s_df.count()
    assert n_fn == f_df.count()


def test_export_csv_reference_format(spark):
    """K4 generateCsvTree parity (`treeUtils.ts:447-482`): quoted
    header, the literal space before the text field, quote-doubling in
    text only, rows in (page, sentence) order."""
    from crawler_spark.analyze import export_csv

    sentences = spark.createDataFrame(
        [
            ("DSG_001", 1, 1, 2, "DSG_001.001.001.02", 'nói "được" rồi', "V"),
            ("DSG_001", 1, 1, 1, "DSG_001.001.001.01", "Câu đầu.", "V"),
            ("DSG_001", 1, 2, 1, "DSG_001.001.002.01", "Trang hai.", ""),
        ],
        "doc_id string, chapter_num int, page_num int, sentence_num int, "
        "sentence_id string, text string, language_code string",
    )
    out = {r["chapter_num"]: r["csv"] for r in export_csv(sentences).collect()}
    assert out[1] == (
        '"sentence_id","language_code","text"\n'
        '"DSG_001.001.001.01","V", "Câu đầu."\n'
        '"DSG_001.001.001.02","V", "nói ""được"" rồi"\n'
        '"DSG_001.001.002.01","", "Trang hai."'
    )


def test_export_xml_escapes_labels_and_attrs(spark):
    """ADVICE r1: footnote labels and attribute values containing
    &, <, or quotes must be escaped (well-formed XML)."""
    import xml.etree.ElementTree as ET

    sentences = spark.createDataFrame(
        [("d&1", 1, 1, 1, 's"1', "a < b & c")],
        "doc_id string, chapter_num int, page_num int, sentence_num int, "
        "sentence_id string, text string",
    )
    footnotes = spark.createDataFrame(
        [('s"1', 3, 'lab<&"el')],
        "sentence_id string, position int, label string",
    )
    row = export_xml(sentences, footnotes).collect()[0]
    root = ET.fromstring(row["xml"])  # raises on malformed XML
    assert root.attrib["ID"] == "d&1"
    stc = root.find(".//STC")
    assert stc.attrib["ID"] == 's"1'
    assert stc.text == "a < b & c"
    fn = root.find(".//FOOTNOTE")
    assert fn.text == 'lab<&"el'
    assert fn.attrib["STC_ID"] == 's"1'
