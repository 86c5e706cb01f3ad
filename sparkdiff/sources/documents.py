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

# .pdf registers only when a parser is importable — otherwise the
# extension falls back to utf-8 like any unknown format, and users
# register their own extractor instead of hitting task-time failures.
try:  # pragma: no cover - container lacks pypdf
    import pypdf  # noqa: F401

    EXTRACTORS[".pdf"] = _pdf_to_text
except ImportError:
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
