"""Office/ebook document extraction — DOCX and EPUB, stdlib-only.

Both formats are ZIP containers (stdlib ``zipfile``) around XML/XHTML:
DOCX keeps text in ``word/document.xml`` as ``<w:t>`` runs inside
``<w:p>`` paragraphs; EPUB keeps XHTML chapters listed by a spine. No
XML library is needed for TEXT extraction — the runs are pulled with the
same regex discipline as the HTML tier (ASCII semantics, RE2-compatible
patterns) and XML entities decode with ``&amp;`` last. EPUB chapters
reuse :func:`bridge_analytics_template_spark.llm.warc.strip_html`, so
every markup-stripping path in the engine shares ONE pipeline.

Writers (``mux_docx`` / ``mux_epub``) produce complete, well-formed
containers for fixtures. Malformed zips or missing members quarantine as
``None``. Per-row extraction inside Arrow-batched ``mapInPandas``, like
the rest of the document tier.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib

from .warc import strip_html

_WT_RE = re.compile(r"(?s)<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.ASCII)
_WP_SPLIT = re.compile(r"</w:p>", re.ASCII)
_XML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
    )


def _xml_unescape(s: str) -> str:
    for ent, ch in _XML_ENTITIES:
        s = s.replace(ent, ch)
    return s


def mux_docx(paragraphs) -> bytes:
    """Paragraph strings → a complete minimal DOCX: [Content_Types].xml,
    the package rels, and word/document.xml with one ``<w:p>`` of one
    ``<w:t>`` run per paragraph (specials XML-escaped on write)."""
    body = "".join(
        f"<w:p><w:r><w:t>{_xml_escape(p)}</w:t></w:r></w:p>" for p in paragraphs
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="word/document.xml"/></Relationships>',
        )
        z.writestr("word/document.xml", document)
    return buf.getvalue()


def extract_docx_text(b: bytes):
    """DOCX bytes → text: ``<w:t>`` runs concatenated within a paragraph,
    paragraphs joined by newlines, XML entities decoded. None for
    non-zip payloads or containers without word/document.xml."""
    try:
        with zipfile.ZipFile(io.BytesIO(bytes(b))) as z:
            xml = z.read("word/document.xml").decode("utf-8", errors="replace")
    except (zipfile.BadZipFile, KeyError, OSError, ValueError, zlib.error,
            EOFError, NotImplementedError):  # exotic compression-method bytes
        return None
    paras = []
    for chunk in _WP_SPLIT.split(xml):
        runs = [_xml_unescape(m) for m in _WT_RE.findall(chunk)]
        if runs:
            paras.append("".join(runs))
    return "\n".join(paras)


def mux_epub(chapters, *, title: str = "fixture") -> bytes:
    """(name, xhtml_body) pairs → a complete minimal EPUB: mimetype
    (stored uncompressed first, per spec), container.xml, a package
    document whose spine lists the chapters in order, and one XHTML file
    per chapter."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip", compress_type=zipfile.ZIP_STORED)
        z.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container version="1.0" '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
            '<rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>",
        )
        manifest = "".join(
            f'<item id="c{i}" href="{name}" media-type="application/xhtml+xml"/>'
            for i, (name, _x) in enumerate(chapters)
        )
        spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
        z.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="id">'
            f'<metadata><dc:title xmlns:dc="http://purl.org/dc/elements/1.1/">{_xml_escape(title)}</dc:title></metadata>'
            f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>",
            compress_type=zipfile.ZIP_DEFLATED,
        )
        for name, xhtml in chapters:
            z.writestr(
                f"OEBPS/{name}",
                '<?xml version="1.0" encoding="UTF-8"?><html xmlns="http://www.w3.org/1999/xhtml">'
                f"<head><title>c</title></head><body>{xhtml}</body></html>",
                compress_type=zipfile.ZIP_DEFLATED,
            )
    return buf.getvalue()


def extract_epub_text(b: bytes):
    """EPUB bytes → text: spine order resolved from the package document
    (href attributes in manifest order matched to itemref order), each
    chapter stripped with the shared HTML pipeline, chapters joined by
    newlines. None for non-zip / spine-less containers."""
    try:
        with zipfile.ZipFile(io.BytesIO(bytes(b))) as z:
            names = set(z.namelist())
            opf_name = next(
                (n for n in z.namelist() if n.endswith("content.opf")), None
            )
            if opf_name is None:
                return None
            opf = z.read(opf_name).decode("utf-8", errors="replace")
            items = dict(
                re.findall(r'<item id="([^"]+)" href="([^"]+)"', opf, re.ASCII)
            )
            refs = re.findall(r'<itemref idref="([^"]+)"', opf, re.ASCII)
            base = opf_name.rsplit("/", 1)[0]
            out = []
            for ref in refs:
                href = items.get(ref)
                if href is None:
                    continue
                member = f"{base}/{href}" if base != opf_name else href
                if member not in names:
                    continue
                xhtml = z.read(member).decode("utf-8", errors="replace")
                xhtml = re.sub(r"(?s)<head(?:\s[^>]*)?>.*?</head>", " ", xhtml, flags=re.ASCII)
                out.append(strip_html(xhtml))
    except (zipfile.BadZipFile, KeyError, OSError, ValueError, zlib.error,
            EOFError, NotImplementedError):  # exotic compression-method bytes
        return None
    return "\n".join(out)


# --- ODS (OpenDocument spreadsheet) ------------------------------------------

_ODS_ROW_RE = re.compile(r"(?s)<table:table-row(?:\s[^>]*)?>(.*?)</table:table-row>", re.ASCII)
_ODS_CELL_RE = re.compile(
    r"(?s)<table:table-cell((?:\s[^>]*)?)(?:/>|>(.*?)</table:table-cell>)", re.ASCII
)
_ODS_TP_RE = re.compile(r"(?s)<text:p>(.*?)</text:p>", re.ASCII)
_ODS_VAL_RE = re.compile(r'office:value="(-?\d+)"', re.ASCII)
_ODS_REP_RE = re.compile(r'table:number-columns-repeated="(\d+)"', re.ASCII)


def mux_ods(rows) -> bytes:
    """Rows of cells → a complete minimal ODS. Each cell is a str (string
    cell, XML-escaped on write), an int (float-typed cell carrying
    ``office:value``), or None (an empty self-closing cell — written with
    ``number-columns-repeated="2"`` so the reader's repeat handling is
    always exercised)."""
    body_rows = []
    for row in rows:
        cells = []
        for c in row:
            if c is None:
                cells.append('<table:table-cell table:number-columns-repeated="2"/>')
            elif isinstance(c, int):
                cells.append(
                    f'<table:table-cell office:value-type="float" office:value="{c}">'
                    f"<text:p>{c}</text:p></table:table-cell>"
                )
            else:
                cells.append(
                    '<table:table-cell office:value-type="string">'
                    f"<text:p>{_xml_escape(c)}</text:p></table:table-cell>"
                )
        body_rows.append(f"<table:table-row>{''.join(cells)}</table:table-row>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="Sheet1">{"".join(body_rows)}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr(
            "META-INF/manifest.xml",
            '<?xml version="1.0"?><manifest:manifest '
            'xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
            '<manifest:file-entry manifest:full-path="/" '
            'manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>'
            '<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>'
            "</manifest:manifest>",
            compress_type=zipfile.ZIP_DEFLATED,
        )
        z.writestr("content.xml", content, compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


def extract_ods_cells(b: bytes):
    """ODS bytes → list of rows, each a list of (text, value) cells —
    ``text`` the entity-decoded cell text, ``value`` the integer
    ``office:value`` for float-typed cells (None for string cells).
    Empty repeated cells expand to ``number-columns-repeated`` ("", None)
    entries, the way a dataloader sees the grid. None for non-zip payloads
    or containers without content.xml."""
    try:
        with zipfile.ZipFile(io.BytesIO(bytes(b))) as z:
            xml = z.read("content.xml").decode("utf-8", errors="replace")
    except (zipfile.BadZipFile, KeyError, OSError, ValueError, zlib.error,
            EOFError, NotImplementedError):
        return None
    rows = []
    for row_xml in _ODS_ROW_RE.findall(xml):
        cells = []
        for attrs, inner in _ODS_CELL_RE.findall(row_xml):
            rep = _ODS_REP_RE.search(attrs)
            n_rep = int(rep.group(1)) if rep else 1
            val = _ODS_VAL_RE.search(attrs)
            text = "".join(_xml_unescape(m) for m in _ODS_TP_RE.findall(inner or ""))
            for _ in range(min(n_rep, 10_000)):  # clamp hostile repeat counts
                cells.append((text, int(val.group(1)) if val else None))
        rows.append(cells)
    return rows
