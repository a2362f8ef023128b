"""From-spec WARC 1.0 record codec (ISO 28500 / the public WARC
specification; the container format of Common Crawl's WARC/WET dumps).
Pure Python, stdlib-only, written from the spec like the point-
shapefile codec (``sources/shp_codec.py``) — no external warc library
exists in this environment and none is needed: a WARC file is a
concatenation of records, each

    WARC/1.0 CRLF
    <field>: <value> CRLF ...
    CRLF
    <Content-Length bytes of payload> CRLF CRLF

Parsing is CONTENT-LENGTH DRIVEN, never delimiter-scanned: payloads
routinely contain ``\\r\\n\\r\\n`` (every HTTP response envelope does),
so any implementation that searches for a separator is wrong on real
crawl data — the tests pin exactly that case.

Out of scope here, documented: header obs-fold continuation lines
(obsolete in the spec, absent from crawler output) and WARC/0.x legacy
versions (rejected loudly). The ``.warc.gz`` member-per-record gzip
framing is handled one layer up — ``sources/warc.py::warc_reader``
decompresses a gzip-magic-prefixed file before parsing (Python's gzip
consumes concatenated members by design); this codec stays a pure
bytes-in/records-out spec implementation.
"""

from __future__ import annotations

CRLF = b"\r\n"


def write_warc_records(records: list[dict]) -> bytes:
    """Serialize records — each ``{"headers": {name: value}, "payload":
    bytes}`` — into a WARC byte stream. ``Content-Length`` is computed
    (a caller-supplied value is overwritten: the spec defines it as the
    payload length, nothing else is valid)."""
    out = []
    for rec in records:
        payload = bytes(rec["payload"])
        lines = [b"WARC/1.0"]
        headers = {str(k): str(v) for k, v in rec["headers"].items()}
        headers["Content-Length"] = str(len(payload))
        for k, v in headers.items():
            if "\r" in v or "\n" in v:
                raise ValueError(f"header {k!r} value contains a line break")
            lines.append(f"{k}: {v}".encode())
        out.append(CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF)
    return b"".join(out)


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse a WARC byte stream into ``[{"version", "headers",
    "payload"}, ...]``. Header names keep their on-disk spelling (use
    :func:`header` for the spec's case-insensitive lookup). Raises
    ``ValueError`` on a non-WARC prefix, an unsupported version, a
    missing Content-Length, or a truncated payload — loud rejection,
    never a silently partial parse (the shp_codec discipline)."""
    data = bytes(data)
    recs: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            break
        eol = data.find(CRLF, pos)
        if eol < 0:
            raise ValueError("unterminated WARC version line")
        version = data[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}: {version[:20]!r}")
        if version != "WARC/1.0" and not version.startswith("WARC/1.1"):
            raise ValueError(f"unsupported WARC version {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            headers[k.decode("ascii", "replace").strip()] = v.decode(
                "utf-8", "replace"
            ).strip()
        cl = header(headers, "Content-Length")
        if cl is None:
            raise ValueError("WARC record missing Content-Length")
        length = int(cl)
        payload = data[pos : pos + length]
        if len(payload) != length:
            raise ValueError(
                f"truncated WARC payload: expected {length}, got {len(payload)}"
            )
        pos += length
        recs.append({"version": version, "headers": headers, "payload": payload})
    return recs


def header(headers: dict[str, str], name: str) -> str | None:
    """Spec-correct case-insensitive field lookup."""
    lname = name.lower()
    for k, v in headers.items():
        if k.lower() == lname:
            return v
    return None


def strip_http_envelope(payload: bytes) -> bytes:
    """Body of an ``application/http; msgtype=response`` payload: drop
    the status line + headers up to the first CRLFCRLF. Raises on a
    payload that is not an HTTP message (caller should only strip when
    the record's Content-Type says so)."""
    payload = bytes(payload)
    if not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP message")
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        raise ValueError("HTTP envelope has no header/body separator")
    return payload[sep + 4 :]
