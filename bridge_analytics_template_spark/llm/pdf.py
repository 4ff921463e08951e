"""Minimal PDF text extraction — spec-written, stdlib-zlib only.

The document-corpus operation every crawl pipeline needs: pull the text
out of PDF payloads. This implements the byte-level core from the public
PDF spec (ISO 32000): object scanning (``N G obj … endobj``), stream
extraction with ``/FlateDecode`` inflation (zlib is stdlib — same move as
the PNG decoder), and content-stream text operators — ``BT``/``ET`` text
blocks, ``(…)`` literal strings with the full escape set (``\\n \\r \\t
\\b \\f \\( \\) \\\\``, octal ``\\ddd``, line continuations), ``<…>`` hex
strings, shown by ``Tj`` / ``'`` / ``"`` / ``TJ`` (array form, numeric
kerning entries skipped). Line-move operators (``Td TD T* '``) emit
newlines, so extracted text reads top-down like a text dump.

``mux_pdf`` writes complete single-page PDFs (catalog → pages → page →
FlateDecode'd or raw content stream → font, correct xref offsets) as the
fixture side. Out of scope, honestly: encrypted PDFs, predictor-tagged
streams, CID/Type0 multi-byte fonts, and layout reconstruction — a
malformed or unsupported payload quarantines as ``None``/empty rather
than failing a batch.

Scale note: per-row extraction inside Arrow-batched ``mapInPandas``
passes — no shuffle, no driver work, like the rest of the codec tier.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
# one optional EOL before endstream — \s* would eat trailing data bytes
# that happen to be whitespace-class (the reason the spec length-delimits
# streams; /Length is preferred below and this regex is the fallback)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\n?endstream", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")

#: PDF string-literal escapes (§7.3.4.2).
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes):
    """Decode the inside of a ``(…)`` literal: escapes, octal, and
    backslash-newline continuation."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2  # line continuation
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            out += nxt  # lone backslash before other char: drop backslash
            i += 2
    return bytes(out)


def _scan_literal(data: bytes, i: int):
    """data[i] == '(' → (decoded bytes, index past the closing paren),
    honoring nesting and escapes; None on unbalanced parens."""
    depth = 0
    j = i
    while j < len(data):
        c = data[j : j + 1]
        if c == b"\\":
            j += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return _unescape_literal(data[i + 1 : j]), j + 1
        j += 1
    return None


def _extract_stream_text(data: bytes) -> list[bytes]:
    """Walk one decoded content stream: returns text runs in order; a
    None sentinel (here b'\\n') is appended on line-move operators."""
    out: list[bytes] = []
    i = 0
    n = len(data)
    in_text = False
    pending: list[bytes] = []  # strings seen since the last operator

    def flush_as(op: bytes):
        nonlocal pending
        if op in (b"Tj", b"TJ", b"'", b'"'):
            if op in (b"'", b'"') and out and out[-1] != b"\n":
                out.append(b"\n")  # ' and " imply a line move first
            out.extend(pending)
        pending = []

    while i < n:
        c = data[i : i + 1]
        if c == b"(":
            lit = _scan_literal(data, i)
            if lit is None:
                return out
            s, i = lit
            if in_text:
                pending.append(s)
            continue
        if c == b"<" and data[i + 1 : i + 2] != b"<":
            j = data.find(b">", i)
            if j < 0:
                return out
            hexs = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                if in_text:
                    pending.append(bytes.fromhex(hexs.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
            continue
        if c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and (data[j : j + 1].isalpha() or data[j : j + 1] in (b"'", b'"', b"*")):
                j += 1
            op = data[i:j]
            if op == b"BT":
                in_text = True
                pending = []
            elif op == b"ET":
                in_text = False
                pending = []
                if out and out[-1] != b"\n":
                    out.append(b"\n")
            elif in_text and op in (b"Tj", b"TJ", b"'", b'"'):
                flush_as(op)
            elif in_text and op in (b"Td", b"TD", b"T*"):
                pending = []
                if out and out[-1] != b"\n":
                    out.append(b"\n")
            i = j
            continue
        i += 1
    return out


def extract_pdf_text(b: bytes):
    """PDF bytes → extracted text (str) or None for non-PDF/undecodable
    payloads. Scans every object, inflates ``/FlateDecode`` streams,
    walks content-stream text operators; text runs join in stream order
    with newlines at line moves / block ends; trailing whitespace is
    trimmed. Corrupt streams are skipped, not fatal."""
    b = bytes(b)
    if not b.startswith(b"%PDF"):
        return None
    runs: list[bytes] = []
    for m in _OBJ_RE.finditer(b):
        body = m.group(3)
        start = _STREAM_START_RE.search(body)
        if not start:
            continue
        head = body[: start.start()]
        lm = _LENGTH_RE.search(head)
        if lm:  # length-delimited (the spec-preferred reading)
            data = body[start.end() : start.end() + int(lm.group(1))]
        else:
            sm = _STREAM_RE.search(body, start.start())
            if not sm:
                continue
            data = sm.group(1)
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue  # corrupt stream: quarantine it, keep the rest
        if b"BT" not in data:
            continue
        runs.extend(_extract_stream_text(data))
    text = b"".join(runs).decode("utf-8", errors="replace")
    return text.strip()


def mux_pdf(lines, *, compress: bool = True) -> bytes:
    """Single-page PDF writer (fixture sibling of the other mux_*):
    ``lines`` (list of str) → a complete, offset-correct PDF whose
    content stream shows one ``Tj`` per line with ``Td`` line moves,
    ``/FlateDecode``'d when ``compress``. Literal-string specials are
    escaped on write and unescape on extraction (net identity)."""

    def esc(s: str) -> bytes:
        raw = s.encode("utf-8")
        return raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")

    content = bytearray(b"BT /F1 12 Tf 72 720 Td ")
    for k, line in enumerate(lines):
        if k:
            content += b"0 -14 Td "
        content += b"(" + esc(line) + b") Tj "
    content += b"ET"
    data = zlib.compress(bytes(content)) if compress else bytes(content)
    filt = b"/Filter /FlateDecode " if compress else b""

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(data)).encode() + b" >>\nstream\n" + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)
