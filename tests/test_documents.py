"""Distributed document loading (S7): binaryFile scan + per-format
extraction, with REAL .docx parsing (zip + word/document.xml), and the
chunker the q49 oracle pins."""

import zipfile

import pytest
from pyspark.sql import functions as F

from sparkdiff.sources.documents import (
    chunk_documents,
    docx_to_text,
    load_documents,
)

_DOCX_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
  <w:body>
    <w:p><w:r><w:t>Hive to Snowflake</w:t></w:r><w:r><w:t xml:space="preserve"> migration notes</w:t></w:r></w:p>
    <w:p><w:r><w:t>Use</w:t></w:r><w:r><w:tab/></w:r><w:r><w:t>CONVERT_TIMEZONE</w:t></w:r></w:p>
  </w:body>
</w:document>"""

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
  <Default Extension="xml" ContentType="application/xml"/>
</Types>"""


def _write_docx(path):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("word/document.xml", _DOCX_XML)


def test_docx_to_text_paragraphs_runs_tabs(tmp_path):
    p = tmp_path / "notes.docx"
    _write_docx(p)
    text = docx_to_text(p.read_bytes())
    assert text == "Hive to Snowflake migration notes\n\nUse\tCONVERT_TIMEZONE"


def test_load_documents_mixed_formats(spark, tmp_path):
    _write_docx(tmp_path / "guide.docx")
    (tmp_path / "readme.txt").write_text("plain text body")
    (tmp_path / "query.sql").write_text("SELECT 1")
    rows = {
        r.doc_name: r
        for r in load_documents(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"guide.docx", "readme.txt", "query.sql"}
    assert rows["guide.docx"].doc_format == "docx"
    assert rows["guide.docx"].text.startswith("Hive to Snowflake")
    assert rows["readme.txt"].text == "plain text body"
    assert rows["query.sql"].text == "SELECT 1"


def test_load_documents_glob_prunes_scan(spark, tmp_path):
    _write_docx(tmp_path / "a.docx")
    (tmp_path / "b.txt").write_text("x")
    got = load_documents(spark, str(tmp_path), glob="*.docx").collect()
    assert [r.doc_name for r in got] == ["a.docx"]


def test_chunk_documents_matches_q49_math(spark, tmp_path):
    (tmp_path / "long.txt").write_text("ab" * 600)  # 1200 chars
    docs = load_documents(spark, str(tmp_path))
    chunks = chunk_documents(docs, ["doc_name"]).orderBy("chunk_idx").collect()
    # 1200 chars, stride 450 -> starts 1, 451, 901 -> 3 chunks
    assert [r.chunk_idx for r in chunks] == [0, 1, 2]
    assert [r.chunk_len for r in chunks] == [500, 500, 300]
    full = "ab" * 600
    assert chunks[1].chunk == full[450:950]


def test_unknown_extension_falls_back_to_utf8(spark, tmp_path):
    (tmp_path / "data.log").write_bytes("caf\xe9 ✓".encode("utf-8"))
    got = load_documents(spark, str(tmp_path)).collect()
    assert got[0].text == "caf\xe9 ✓"


def test_html_to_text_strips_tags_scripts_entities():
    from sparkdiff.sources.documents import html_to_text

    html = b"""<html><head><style>p {color: red}</style>
    <script>var x = "ignore me";</script></head>
    <body><h1>Parity &amp; Drift</h1>
    <p>First <b>bold</b> para.</p>
    <ul><li>one</li><li>two</li></ul>
    </body></html>"""
    text = html_to_text(html)
    assert "Parity & Drift" in text
    assert "First bold para." in text
    assert "one\n" in text and "two" in text
    assert "ignore me" not in text and "color" not in text


def test_html_loads_through_document_source(spark, tmp_path):
    (tmp_path / "page.html").write_text("<p>hello <i>world</i></p>")
    got = load_documents(spark, str(tmp_path)).collect()
    assert got[0].doc_format == "html"
    assert got[0].text == "hello world"


def test_pdf_registration_tracks_importability():
    from sparkdiff.sources.documents import EXTRACTORS

    try:
        import pypdf  # noqa: F401
        assert ".pdf" in EXTRACTORS
    except ImportError:
        assert ".pdf" not in EXTRACTORS
