"""WARC (ISO 28500) record framing — the web-crawl container every
corpus pipeline ingests (Common Crawl ships it). Spec-written: records
are ``WARC/1.0`` header blocks terminated by CRLFCRLF with
``Content-Length``-delimited payloads and CRLFCRLF record separators;
response records carry an HTTP message whose body follows ITS OWN
CRLFCRLF. ``mux_warc`` writes multi-record files (warcinfo + responses);
``warc_html_bodies`` walks records and returns the HTML bodies of
response records. Malformed framing quarantines (partial parse keeps
earlier records — one bad record must not drop a shard).

The text-strip step downstream (``strip_html``) mirrors the JVM-side
``llm_html_extract`` pipeline pattern-for-pattern with ``re.ASCII`` so
Python ``\\s`` means the same byte class as Java/RE2 ``\\s`` — the three
engines must agree character-for-character.

Scale note: per-row parsing inside Arrow-batched ``mapInPandas``; a real
deployment points the same pass at ``binaryFile``-scanned WARC shards.
"""

from __future__ import annotations

import re
import zlib

_CRLF2 = b"\r\n\r\n"
_GZ_MAGIC = b"\x1f\x8b"

#: the llm_html_extract pipeline, Python rendering (ASCII \s to match RE2/Java)
_STRIP_STEPS = [
    (re.compile(r"(?s)<script[^>]*>.*?</script>", re.ASCII), " "),
    (re.compile(r"(?s)<style[^>]*>.*?</style>", re.ASCII), " "),
    (re.compile(r"<[^>]*>", re.ASCII), " "),
]
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]
_WS = re.compile(r"\s+", re.ASCII)


def mux_warc(responses, *, info: str = "software: bridge-analytics-template-spark",
             gzip_members: bool = False, requests: bool = False,
             revisits=None) -> bytes:
    """(uri, html) pairs → a complete WARC file: one warcinfo record then
    one response record per pair, each wrapping an HTTP/1.1 200 message.
    With ``gzip_members`` each record is its OWN gzip member (the
    ``.warc.gz`` layout Common Crawl ships — members concatenate, so a
    reader can still seek record boundaries). With ``requests`` each
    response is preceded by its ``request`` record (the crawler's outgoing
    HTTP GET, linked the ISO 28500 way: the response names the request via
    ``WARC-Concurrent-To``). ``revisits`` maps uri → count: after a uri's
    response, that many ``revisit`` records are written (the
    identical-payload-digest profile — a re-crawl that matched the stored
    digest, so only headers ship; body bytes are NOT stored, which is the
    crawl-time dedup the record type exists for)."""
    out = bytearray()
    seq = [0]

    def record(headers: list[tuple[str, str]], payload: bytes) -> str:
        rid = f"<urn:uuid:rec-{seq[0]:08d}>"
        seq[0] += 1
        head = b"WARC/1.0\r\n"
        for k, v in [("WARC-Record-ID", rid)] + headers + [("Content-Length", str(len(payload)))]:
            head += f"{k}: {v}\r\n".encode()
        rec = head + b"\r\n" + payload + _CRLF2
        if gzip_members:
            co = zlib.compressobj(wbits=31)  # gzip wrapper
            rec = co.compress(rec) + co.flush()
        out.extend(rec)
        return rid

    record([("WARC-Type", "warcinfo"), ("Content-Type", "application/warc-fields")],
           info.encode() + b"\r\n")
    for uri, html in responses:
        body = html.encode("utf-8")
        req_id = None
        if requests:
            host = uri.split("/")[2] if "//" in uri else ""
            path = "/" + uri.split("/", 3)[3] if uri.count("/") >= 3 else "/"
            req_http = (
                f"GET {path} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode()
            )
            req_id = record(
                [("WARC-Type", "request"), ("WARC-Target-URI", uri),
                 ("Content-Type", "application/http; msgtype=request")],
                req_http,
            )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        # labelled-algorithm digest per ISO 28500 §5.8 (algorithm:value);
        # crc32 is the strongest stdlib-cheap checksum and the label is
        # honest — consumers compare equality, not preimage resistance
        digest = f"crc32:{zlib.crc32(body):08x}"
        resp_headers = [
            ("WARC-Type", "response"), ("WARC-Target-URI", uri),
            ("WARC-Payload-Digest", digest),
            ("Content-Type", "application/http; msgtype=response"),
        ]
        if req_id is not None:
            resp_headers.insert(2, ("WARC-Concurrent-To", req_id))
        record(resp_headers, http)
        for _ in range((revisits or {}).get(uri, 0)):
            # identical-payload-digest revisit: HTTP head only, no body
            record(
                [("WARC-Type", "revisit"), ("WARC-Target-URI", uri),
                 ("WARC-Profile",
                  "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"),
                 ("WARC-Refers-To-Target-URI", uri),
                 ("WARC-Payload-Digest", digest),
                 ("Content-Type", "application/http; msgtype=response")],
                b"HTTP/1.1 304 Not Modified\r\n\r\n",
            )
    return bytes(out)


def parse_warc(b: bytes, with_headers: bool = False):
    """WARC bytes → list of (warc_type, target_uri, payload bytes)
    (plus the raw lowercase-keyed header dict with ``with_headers``).
    Content-Length-delimited; stops (keeping earlier records) at the
    first malformed header block — partial shards stay usable."""
    b = bytes(b)
    if b.startswith(_GZ_MAGIC):
        # .warc.gz: one gzip member per record — inflate member by member
        # (unused_data hands back the next member's start); a corrupt
        # member keeps the records before it
        plain = bytearray()
        rest = b
        while rest.startswith(_GZ_MAGIC):
            d = zlib.decompressobj(wbits=31)
            try:
                plain += d.decompress(rest)
                plain += d.flush()
            except zlib.error:
                break
            if not d.eof or d.unused_data == rest:
                break
            rest = d.unused_data
        b = bytes(plain)
    out = []
    i = 0
    while i < len(b):
        if not b[i:].startswith(b"WARC/"):
            break
        hend = b.find(_CRLF2, i)
        if hend < 0:
            break
        headers = {}
        for line in b[i:hend].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            ln = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        payload = b[hend + 4 : hend + 4 + ln]
        if len(payload) < ln:
            break
        out.append(
            (
                headers.get(b"warc-type", b"").decode("ascii", "replace"),
                headers.get(b"warc-target-uri", b"").decode("ascii", "replace"),
                payload,
                headers,
            )
            if with_headers
            else (
                headers.get(b"warc-type", b"").decode("ascii", "replace"),
                headers.get(b"warc-target-uri", b"").decode("ascii", "replace"),
                payload,
            )
        )
        i = hend + 4 + ln
        while b[i : i + 2] == b"\r\n":
            i += 2
    return out


def warc_record_stats(b: bytes):
    """Full-fidelity record walk: every record → (warc_type, target_uri,
    payload_len, http_body_len, refers_to_uri, payload_digest). The
    crawl-accounting view a dedup-aware ingest needs: ``response`` records
    carry stored body bytes, ``revisit`` records carry none (their HTTP
    message is headers-only under the identical-payload-digest profile),
    and the digest/refers-to columns let the reader join a revisit back to
    the capture it deduplicated against."""
    stats = []
    for wtype, uri, payload, headers in parse_warc(b, with_headers=True):
        sep = payload.find(_CRLF2)
        body_len = len(payload) - sep - 4 if sep >= 0 else 0
        stats.append(
            (
                wtype,
                uri,
                len(payload),
                body_len,
                headers.get(b"warc-refers-to-target-uri", b"").decode("ascii", "replace"),
                headers.get(b"warc-payload-digest", b"").decode("ascii", "replace"),
            )
        )
    return stats


def warc_html_bodies(b: bytes):
    """Response records → decoded HTML bodies (HTTP head split at its
    own CRLFCRLF); non-response records and headerless payloads skip."""
    bodies = []
    for wtype, _uri, payload in parse_warc(b):
        if wtype != "response":
            continue
        sep = payload.find(_CRLF2)
        if sep < 0:
            continue
        bodies.append(payload[sep + 4 :].decode("utf-8", errors="replace"))
    return bodies


def strip_html(html: str) -> str:
    """The llm_html_extract pipeline in Python (ASCII regex semantics):
    script/style drop, tag strip, entity decode (&amp; last), whitespace
    collapse, trim."""
    t = html
    for pat, rep in _STRIP_STEPS:
        t = pat.sub(rep, t)
    for ent, ch in _ENTITIES:
        t = t.replace(ent, ch)
    return _WS.sub(" ", t).strip()


# --- timed text (SRT / WebVTT) ---------------------------------------------

_TS_RE = re.compile(
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*(\d{2}):(\d{2}):(\d{2})[,.](\d{3})",
    re.ASCII,
)


def mux_subtitles(cues, *, vtt: bool = False) -> str:
    """(start_ms, end_ms, text) cues → an SRT document, or WebVTT with
    ``vtt`` (header line, '.' millisecond separator, no cue numbers)."""

    def ts(ms: int) -> str:
        sep = "." if vtt else ","
        return f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:{ms // 1000 % 60:02d}{sep}{ms % 1000:03d}"

    blocks = []
    for k, (start, end, text) in enumerate(cues, start=1):
        head = "" if vtt else f"{k}\n"
        blocks.append(f"{head}{ts(start)} --> {ts(end)}\n{text}")
    prefix = "WEBVTT\n\n" if vtt else ""
    return prefix + "\n\n".join(blocks) + "\n"


def parse_subtitles(doc: str):
    """SRT or WebVTT → list of (start_ms, end_ms, text). Cue numbers,
    the WEBVTT header, and cue settings after the timestamp line are
    tolerated; blocks without a valid timestamp line are skipped
    (quarantine-by-omission)."""
    out = []
    for block in re.split(r"\n\s*\n", doc.strip(), flags=re.ASCII):
        lines = [ln for ln in block.split("\n")]
        for i, ln in enumerate(lines):
            m = _TS_RE.search(ln)
            if m:
                g = [int(x) for x in m.groups()]
                start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
                end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
                text = "\n".join(lines[i + 1 :]).strip()
                out.append((start, end, text))
                break
    return out


# --- WET / WAT (the Common Crawl sibling formats) ---------------------------


def mux_wet(pages, *, gzip_members: bool = False) -> bytes:
    """(uri, text) pairs → a WET file: warcinfo + one ``conversion``
    record per page (Content-Type text/plain, the extracted-text layout
    Common Crawl ships as .wet — what most LLM ingest pipelines actually
    read instead of raw WARC)."""
    out = bytearray()

    def record(headers, payload: bytes):
        head = b"WARC/1.0\r\n"
        for k, v in headers + [("Content-Length", str(len(payload)))]:
            head += f"{k}: {v}\r\n".encode()
        rec = head + b"\r\n" + payload + _CRLF2
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            rec = co.compress(rec) + co.flush()
        out.extend(rec)

    record([("WARC-Type", "warcinfo"), ("Content-Type", "application/warc-fields")],
           b"format: WET File Format 1.0\r\n")
    for uri, text in pages:
        record(
            [("WARC-Type", "conversion"), ("WARC-Target-URI", uri),
             ("Content-Type", "text/plain")],
            text.encode("utf-8"),
        )
    return bytes(out)


def wet_texts(b: bytes):
    """WET bytes → [(uri, text)] from conversion records (payload IS the
    text — no HTTP head to split, unlike response records)."""
    return [
        (uri, payload.decode("utf-8", errors="replace"))
        for wtype, uri, payload in parse_warc(b)
        if wtype == "conversion"
    ]


def mux_wat(entries, *, gzip_members: bool = False) -> bytes:
    """(uri, json_str) pairs → a WAT file: warcinfo + one ``metadata``
    record per page (Content-Type application/json — the link/title
    metadata sidecar Common Crawl ships as .wat)."""
    out = bytearray()

    def record(headers, payload: bytes):
        head = b"WARC/1.0\r\n"
        for k, v in headers + [("Content-Length", str(len(payload)))]:
            head += f"{k}: {v}\r\n".encode()
        rec = head + b"\r\n" + payload + _CRLF2
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            rec = co.compress(rec) + co.flush()
        out.extend(rec)

    record([("WARC-Type", "warcinfo"), ("Content-Type", "application/warc-fields")],
           b"format: WAT File Format 1.0\r\n")
    for uri, js in entries:
        record(
            [("WARC-Type", "metadata"), ("WARC-Target-URI", uri),
             ("Content-Type", "application/json")],
            js.encode("utf-8"),
        )
    return bytes(out)


def wat_json(b: bytes):
    """WAT bytes → [(uri, json_str)] from metadata records."""
    return [
        (uri, payload.decode("utf-8", errors="replace"))
        for wtype, uri, payload in parse_warc(b)
        if wtype == "metadata"
    ]
