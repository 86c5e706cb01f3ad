"""Distributed document loading for the RAG corpus path (S7).

The reference loads ONE document on the driver through LangChain
loaders — ``Docx2txtLoader`` for .docx, ``TextLoader`` otherwise
(``/root/reference/tools/rag_tool.py:24-36``) — then chunks it with
``CharacterTextSplitter(500, 50)``.  Here the whole directory is a
DataFrame:

- the scan is Spark's ``binaryFile`` source (distributed, partitioned
  by file, predicate-pushable on path/size/modtime),
- per-format text extraction runs as an Arrow-batched pandas UDF over
  the binary content (CPU-parallel across executors, no driver loop),
- .docx extraction is real, not stubbed: a .docx is a zip whose
  ``word/document.xml`` carries the text in ``w:t`` runs — exactly what
  the reference's ``docx2txt`` dependency parses.  stdlib ``zipfile`` +
  ``xml.etree`` cover it, so no optional dependency is needed.

Chunking (``chunk_documents``) is the same native-explode 500/50 window
q49 pins against its DuckDB oracle.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_to_text(blob: bytes) -> str:
    """Text of a .docx binary: paragraphs (``w:p``) joined with blank
    lines, runs (``w:t``) concatenated, tabs/breaks as whitespace —
    the same shape ``docx2txt`` (the reference's extractor) produces."""
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter(_W + "p"):
        parts = []
        for node in p.iter():
            if node.tag == _W + "t":
                parts.append(node.text or "")
            elif node.tag == _W + "tab":
                parts.append("\t")
            elif node.tag in (_W + "br", _W + "cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n\n".join(paras)


def _utf8_to_text(blob: bytes) -> str:
    return blob.decode("utf-8", errors="replace")


_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "section", "article", "blockquote", "pre",
}


def html_to_text(blob: bytes) -> str:
    """Visible text of an HTML binary: script/style dropped, block tags
    become newlines, entities decoded (stdlib ``html.parser``), runs of
    blank lines collapsed."""
    from html.parser import HTMLParser

    class _Text(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self._skip = max(0, self._skip - 1)
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self._skip:
                self.parts.append(data)

    p = _Text()
    p.feed(_utf8_to_text(blob))
    lines = [ln.strip() for ln in "".join(p.parts).splitlines()]
    out: list[str] = []
    for ln in lines:
        if ln:
            out.append(ln)
        elif out and out[-1] != "":
            out.append("")
    return "\n".join(out).strip("\n")


def _pdf_to_text(blob: bytes) -> str:  # pragma: no cover - needs pypdf
    from pypdf import PdfReader  # gated: registered only when importable

    reader = PdfReader(io.BytesIO(blob))
    return "\n\n".join(page.extract_text() or "" for page in reader.pages)


_PDF_ESC = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}
#: text-showing / line-moving operators a minimal extractor understands
_PDF_SHOW_OPS = (b"Tj", b"TJ", b"'", b'"')
_PDF_LINE_OPS = (b"T*", b"Td", b"TD", b"'", b'"')
_PDF_DELIMS = b"()<>[]{}/% \t\r\n\x00\x0c"


def _pdf_literal(data: bytes, i: int) -> tuple[str, int]:
    """Decode a PDF literal string starting at ``data[i] == '('``;
    returns (text, index-after-closing-paren).  Handles balanced
    unescaped parens, ``\\``-escapes and 1-3 digit octal codes."""
    out: list[str] = []
    depth, i = 1, i + 1
    while i < len(data) and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(data):
                break
            e = data[i]
            if e in _PDF_ESC:
                out.append(_PDF_ESC[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, len(data)) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < len(data) and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _pdf_content_text(data: bytes) -> str:
    """Text shown by one decoded content stream: literal/hex strings
    attached to ``Tj``/``TJ``/``'``/``\"``, with the line-moving
    operators (``Td``/``TD``/``T*``/``'``/``\"``) rendered as
    newlines.  Inline images (``BI..EI``) are skipped."""
    out: list[str] = []
    pending: list[str] = []

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == 0x28:  # ( literal string
            s, i = _pdf_literal(data, i)
            pending.append(s)
        elif c == 0x3C and i + 1 < n and data[i + 1] != 0x3C:  # <hex>
            j = data.find(b">", i)
            j = n if j < 0 else j
            hx = bytes(
                b for b in data[i + 1:j] if b not in b" \t\r\n"
            ).decode("ascii", "ignore")
            if len(hx) % 2:
                hx += "0"
            pending.append(bytes.fromhex(hx).decode("latin-1"))
            i = j + 1
        elif c == 0x3C:  # << dict (e.g. inline-image params) — skip
            i += 2
        elif c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c in b"[]{}>/":
            if c == 0x2F:  # /Name token
                j = i + 1
                while j < n and data[j] not in _PDF_DELIMS:
                    j += 1
                i = j
            else:
                i += 1
        else:
            j = i
            while j < n and data[j] not in _PDF_DELIMS:
                j += 1
            tok = data[i:j]
            i = j if j > i else i + 1
            if tok == b"BI":  # inline image: skip to EI
                k = data.find(b"EI", i)
                i = n if k < 0 else k + 2
                pending.clear()
                continue
            if not tok.lstrip(b"+-.0123456789"):
                continue  # numeric operand: keep pending strings (TJ)
            if tok in _PDF_LINE_OPS:
                newline()
            if tok in _PDF_SHOW_OPS:
                out.append("".join(pending))
            pending.clear()  # any operator consumes its operands
    return "".join(out).strip("\n")


def pdf_to_text_stdlib(blob: bytes) -> str:
    """Minimal pure-stdlib PDF text extraction: every stream object
    that is plain or FlateDecode-compressed (zlib IS stdlib) and
    contains a text block (``BT``) contributes its shown strings.

    Scope (documented, test-pinned): simple-font PDFs with
    WinAnsi/ASCII-ish string bytes — the reference's own fixtures'
    class.  CID/Type0 composite fonts, encryption, object streams and
    non-Flate filters need ``pypdf``, which stays the registered
    ``.pdf`` extractor whenever importable (reference loads PDFs via
    PyPDFLoader, ``agents/confluence_agent.py``)."""
    import re
    import zlib

    texts: list[str] = []
    for m in re.finditer(
        rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", blob, re.S
    ):
        d, data = m.group(1), m.group(2)
        if b"/FlateDecode" in d:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in d:
            continue  # unsupported filter (DCT, LZW, ...)
        if b"BT" not in data:
            continue  # not a text content stream
        t = _pdf_content_text(data)
        if t:
            texts.append(t)
    return "\n\n".join(texts)


#: extension (lowercase, with dot) -> bytes->str extractor.  Register new
#: formats (pdf, html, ...) here; unknown extensions fall back to UTF-8
#: text, mirroring the reference's TextLoader default.
EXTRACTORS: dict[str, Callable[[bytes], str]] = {
    ".docx": docx_to_text,
    ".html": html_to_text,
    ".htm": html_to_text,
    ".txt": _utf8_to_text,
    ".md": _utf8_to_text,
    ".sql": _utf8_to_text,
}

# .pdf: pypdf when importable (full filter/encoding coverage), else the
# pure-stdlib extractor — simple-font Flate/plain PDFs always work with
# no optional dependency (see pdf_to_text_stdlib's scope note).
EXTRACTORS[".pdf"] = pdf_to_text_stdlib
try:  # pragma: no cover - container lacks pypdf
    import pypdf  # noqa: F401

    EXTRACTORS[".pdf"] = _pdf_to_text
except ImportError:
    # Silent fallback is the contract: the stdlib extractor registered
    # above stays in place, so PDF ingestion works everywhere and
    # upgrades in-place when the richer library is installed.
    pass


def load_documents(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """``(doc_path, doc_name, doc_format, text)`` for every file under
    ``path`` — the distributed replacement for the reference's
    driver-side single-file loader."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).select("path", "content")

    extractors = dict(EXTRACTORS)  # task-serialized snapshot

    @F.pandas_udf("string")
    def extract(paths: pd.Series, blobs: pd.Series) -> pd.Series:
        out = []
        for p, b in zip(paths, blobs):
            ext = "." + p.rsplit(".", 1)[-1].lower() if "." in p else ""
            fn = extractors.get(ext, _utf8_to_text)
            out.append(fn(bytes(b)))
        return pd.Series(out)

    name = F.element_at(F.split(F.col("path"), "/"), -1)
    fmt = F.lower(F.element_at(F.split(name, r"\."), -1))
    return raw.select(
        F.col("path").alias("doc_path"),
        name.alias("doc_name"),
        fmt.alias("doc_format"),
        extract("path", "content").alias("text"),
    )


def chunk_documents(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    size: int = 500,
    overlap: int = 50,
) -> DataFrame:
    """500/50 character chunking (the reference's RAG constants,
    ``tools/rag_tool.py:38``) as a native explode — one output row per
    chunk, ``chunk_idx`` ordinal, start positions striding by
    ``size - overlap``.  Identical math to q49's oracle-pinned query."""
    stride = size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(text_col), F.lit(1)), F.lit(stride)
    )
    chunks = df.select(
        *id_cols,
        F.posexplode(
            F.transform(starts, lambda s: F.substring(F.col(text_col), s, F.lit(size)))
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        *id_cols,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        F.length("chunk").cast("long").alias("chunk_len"),
    )
