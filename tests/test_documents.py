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
    """.pdf is ALWAYS registered: pypdf when importable, the stdlib
    extractor otherwise — no optional dependency leaves a format hole."""
    from sparkdiff.sources.documents import EXTRACTORS, pdf_to_text_stdlib

    try:
        import pypdf  # noqa: F401
        assert EXTRACTORS[".pdf"] is not pdf_to_text_stdlib
    except ImportError:
        assert EXTRACTORS[".pdf"] is pdf_to_text_stdlib


def _minimal_pdf(compress: bool) -> bytes:
    """A structurally-valid one-page PDF whose content stream shows two
    lines via Tj / TJ, optionally FlateDecode-compressed."""
    import zlib

    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(Hive to \\(Snowflake\\) parity) Tj "
        b"0 -14 Td [(kerned ) -120 (ar) 20 (ray)] TJ "
        b"T* (third <line>) Tj ET"
    )
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< "
        + filt
        + b"/Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream",
    ]
    out = [b"%PDF-1.4"]
    for i, o in enumerate(objs, 1):
        out.append(str(i).encode() + b" 0 obj\n" + o + b"\nendobj")
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF")
    return b"\n".join(out)


@pytest.mark.parametrize("compress", [False, True], ids=["plain", "flate"])
def test_pdf_to_text_stdlib_plain_and_flate(compress):
    from sparkdiff.sources.documents import pdf_to_text_stdlib

    text = pdf_to_text_stdlib(_minimal_pdf(compress))
    assert text.splitlines() == [
        "Hive to (Snowflake) parity",
        "kerned array",
        "third <line>",
    ]


def test_pdf_registered_end_to_end(spark, tmp_path):
    """.pdf flows through load_documents with no optional dependency —
    the stdlib extractor is the registered fallback."""
    (tmp_path / "doc.pdf").write_bytes(_minimal_pdf(True))
    rows = load_documents(spark, str(tmp_path)).collect()
    assert rows[0].doc_format == "pdf"
    assert rows[0].text.startswith("Hive to (Snowflake) parity")


def test_pdf_to_text_stdlib_ignores_binary_streams():
    """Image/xref streams (no BT, or non-Flate filters) contribute
    nothing; malformed Flate data is skipped, not raised."""
    from sparkdiff.sources.documents import pdf_to_text_stdlib

    blob = (
        b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Filter /DCTDecode "
        b"/Length 4 >>\nstream\n\xff\xd8\xff\xe0\nendstream\nendobj\n"
        b"2 0 obj\n<< /Filter /FlateDecode /Length 3 >>\nstream\n"
        b"bad\nendstream\nendobj\n"
        b"3 0 obj\n<< /Length 20 >>\nstream\nBT (ok) Tj ET\nendstream"
        b"\nendobj\n%%EOF"
    )
    assert pdf_to_text_stdlib(blob) == "ok"
