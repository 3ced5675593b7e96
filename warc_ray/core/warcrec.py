"""WARC 1.0 record model: header map, parse, and byte-exact serialize.

Py3 reimplementation of the semantics of the reference library
(internetarchive/warc v0.2.0, warc/warc.py) operating on ``bytes``:

  * ``WARCHeader`` — case-insensitive header map with the fixed version
    string ``WARC/1.0`` (warc/warc.py:70), typed accessors
    (warc/warc.py:106-124), default initialization (warc/warc.py:75-88)
    and the exact header-name canonicalization used on write
    (``title()`` + ``Warc-``→``WARC-``, ``-Ip-``→``-IP-``, ``-Id``→``-ID``,
    ``-Uri``→``-URI`` — warc/warc.py:95-97, including the ``-Id`` over-match
    quirk, e.g. ``x-identity`` → ``X-IDentity``).
  * ``WARCRecord`` — header + opaque byte payload; serialization is
    header block + payload + ``\\r\\n\\r\\n`` (warc/warc.py:159-164);
    write-path payload digest is ``"sha1:" + hexdigest`` (warc/warc.py:156-157).
    Read-path digests are preserved verbatim (real-world WARCs carry
    Base32 digests — reference test_warc.py:119 — and are never recomputed).
  * ``parse_record`` / ``WARCReader`` — strict header parsing with the
    reference's regexes (version ``WARC/(\\d+.\\d+)\\r\\n``, header
    ``([a-zA-Z_\\-]+): *(.*)\\r\\n`` — warc/warc.py:316-317), only version
    1.0 accepted, ``IOError`` on malformed lines (warc/warc.py:331-343),
    and the mandatory ``\\r\\n\\r\\n`` record trailer (warc/warc.py:348-361).

Determinism notes (differences from the reference, intentional):
  * Header *write order* in the reference is py2 dict-hash order —
    nondeterministic and never asserted by its tests.  Here it is the
    insertion order of the header map (deterministic).
  * ``init_defaults`` in the reference uses ``uuid1()`` / ``utcnow()``
    (warc/warc.py:84-86) — nondeterministic.  Here both are injectable;
    the pipeline layer always injects seeded uuid5 ids and a logical
    clock date.  When not injected we fall back to uuid4/utcnow for
    API compatibility (values are never asserted by the ported tests).

No Ray dependency; safe to import in any worker.
"""

from __future__ import annotations

import datetime
import hashlib
import io
import re
import uuid

from .utils import CaseInsensitiveDict, FilePart

WARC_VERSION = "WARC/1.0"

# WARC-Type -> default Content-Type (reference warc/warc.py:52-55)
CONTENT_TYPES = {
    "warcinfo": "application/warc-fields",
    "response": "application/http; msgtype=response",
    "request": "application/http; msgtype=request",
    "metadata": "application/warc-fields",
}
DEFAULT_CONTENT_TYPE = "application/octet-stream"

# attribute name -> canonical header name (reference warc/warc.py:57-67)
KNOWN_HEADERS = {
    "type": "WARC-Type",
    "date": "WARC-Date",
    "record_id": "WARC-Record-ID",
    "ip_address": "WARC-IP-Address",
    "target_uri": "WARC-Target-URI",
    "warcinfo_id": "WARC-Warcinfo-ID",
    "request_uri": "WARC-Request-URI",
    "content_type": "Content-Type",
    "content_length": "Content-Length",
}

RE_VERSION = re.compile(rb"WARC/(\d+.\d+)\r\n")
RE_HEADER = re.compile(rb"([a-zA-Z_\-]+): *(.*)\r\n")
SUPPORTED_VERSIONS = ("1.0",)


def canonical_header_name(name: str) -> str:
    """The exact display form the reference writes (warc/warc.py:95-97)."""
    name = name.title()
    return (
        name.replace("Warc-", "WARC-")
        .replace("-Ip-", "-IP-")
        .replace("-Id", "-ID")
        .replace("-Uri", "-URI")
    )


def sha1_digest(payload: bytes) -> str:
    """Write-path payload digest, reference form (warc/warc.py:156-157)."""
    return "sha1:" + hashlib.sha1(payload or b"").hexdigest()


class WARCHeader(CaseInsensitiveDict):
    """The headers of one WARC record (str keys/values)."""

    def __init__(self, headers=None, defaults: bool = False,
                 record_id: str | None = None, date: str | None = None):
        self.version = WARC_VERSION
        super().__init__(headers or {})
        if defaults:
            self.init_defaults(record_id=record_id, date=date)

    def init_defaults(self, record_id: str | None = None, date: str | None = None) -> None:
        """Fill WARC-Record-ID / WARC-Date / Content-Type when absent.

        ``record_id`` / ``date`` allow deterministic injection; the
        fallback mirrors the reference (warc/warc.py:83-88).
        """
        if "WARC-Record-ID" not in self:
            self["WARC-Record-ID"] = record_id or "<urn:uuid:%s>" % uuid.uuid4()
        if "WARC-Date" not in self:
            self["WARC-Date"] = date or datetime.datetime.utcnow().strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
        if "Content-Type" not in self:
            self["Content-Type"] = CONTENT_TYPES.get(self.type, DEFAULT_CONTENT_TYPE)

    def to_bytes(self) -> bytes:
        """Header block: version line, ``Name: value`` lines, blank line."""
        out = [self.version.encode("ascii"), b"\r\n"]
        for name, value in self.items():
            out.append(canonical_header_name(name).encode("ascii"))
            out.append(b": ")
            out.append(str(value).encode("ascii", "replace"))
            out.append(b"\r\n")
        out.append(b"\r\n")
        return b"".join(out)

    def write_to(self, f) -> None:
        f.write(self.to_bytes())

    @property
    def content_length(self) -> int:
        return int(self["Content-Length"])

    @property
    def type(self):
        return self.get("WARC-Type")

    @property
    def record_id(self):
        return self["WARC-Record-ID"]

    @property
    def date(self):
        return self["WARC-Date"]

    def __str__(self) -> str:
        return self.to_bytes().decode("ascii")

    def __repr__(self) -> str:
        return "<WARCHeader: type=%r, record_id=%r>" % (self.type, self.get("WARC-Record-ID"))


class WARCRecord:
    """One WARC record: header + opaque byte payload."""

    def __init__(self, header: WARCHeader | None = None, payload=None,
                 headers=None, defaults: bool = True,
                 record_id: str | None = None, date: str | None = None):
        headers = dict(headers or {})
        if header is None and defaults:
            headers.setdefault("WARC-Type", "response")
        self.header = header or WARCHeader(headers, defaults=True,
                                           record_id=record_id, date=date)
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        self.payload = payload

        if defaults and "Content-Length" not in self.header:
            if payload:
                self.header["Content-Length"] = str(len(payload))
            else:
                self.header["Content-Length"] = "0"
        if defaults and "WARC-Payload-Digest" not in self.header:
            self.header["WARC-Payload-Digest"] = sha1_digest(
                payload if isinstance(payload, bytes) else b""
            )

    def payload_bytes(self) -> bytes:
        """Materialize the payload (handles lazy FilePart payloads)."""
        p = self.payload
        if p is None:
            return b""
        if isinstance(p, bytes):
            return p
        if hasattr(p, "read"):
            return p.read()
        return bytes(p)

    def to_bytes(self) -> bytes:
        return self.header.to_bytes() + self.payload_bytes() + b"\r\n\r\n"

    def write_to(self, f) -> None:
        f.write(self.to_bytes())
        if hasattr(f, "flush"):
            f.flush()

    @property
    def type(self):
        return self.header.type

    @property
    def url(self):
        return self.header.get("WARC-Target-URI")

    @property
    def ip_address(self):
        return self.header.get("WARC-IP-Address")

    @property
    def date(self):
        return self.header.get("WARC-Date")

    @property
    def checksum(self):
        return self.header.get("WARC-Payload-Digest")

    def __getitem__(self, name):
        return self.header[name]

    def __setitem__(self, name, value):
        self.header[name] = value

    def __contains__(self, name):
        return name in self.header

    def __str__(self) -> str:
        return self.to_bytes().decode("latin-1")

    def __repr__(self) -> str:
        return "<WARCRecord: type=%r record_id=%s>" % (self.type, self.header.get("WARC-Record-ID"))

    @staticmethod
    def from_response(response) -> "WARCRecord":
        """HTTP response object → ``response`` WARC record (reference
        warc/warc.py:215-242, op #25).

        Duck-typed rather than requests-only (no network in this
        engine): accepts either a ``requests.Response``-shaped object
        (``.raw._original_response`` with ``status``/``reason``/
        ``msg``/``read()``) or anything exposing ``status_code``,
        ``reason``, ``headers`` (mapping) and ``content`` bytes.
        Payload layout is the reference's: status line, header block,
        blank line, body.
        """
        raw = getattr(response, "raw", None)
        orig = getattr(raw, "_original_response", None)
        if orig is not None:
            status_line = "HTTP/1.1 %d %s" % (orig.status, orig.reason)
            head = str(orig.msg)
            body = orig.read()
            import io as _io

            raw._fp = _io.BytesIO(body)  # keep response readable after
        else:
            status_line = "HTTP/1.1 %d %s" % (response.status_code,
                                              response.reason)
            head = "".join("%s: %s\r\n" % kv for kv in response.headers.items())
            body = response.content
        if isinstance(body, str):
            body = body.encode("utf-8")
        payload = status_line.encode("ascii") + b"\r\n" + \
            head.encode("latin-1") + b"\r\n" + body
        req = getattr(response, "request", None)
        uri = getattr(req, "url", None) or getattr(response, "url", "")
        return WARCRecord(payload=payload,
                          headers={"WARC-Type": "response",
                                   "WARC-Target-URI": uri})


def read_header(fileobj) -> WARCHeader | None:
    """Parse one header block from a binary stream; None at EOF.

    Strictness matches the reference (warc/warc.py:324-346): bad version
    line or bad header line raise ``IOError``; only WARC/1.0 accepted.
    """
    version_line = fileobj.readline()
    if not version_line:
        return None
    m = RE_VERSION.match(version_line)
    if not m:
        raise IOError("Bad version line: %r" % version_line)
    try:
        version = m.group(1).decode("ascii")
    except UnicodeDecodeError:
        # the version pattern's unescaped '.' (reference parity,
        # warc/warc.py RE_VERSION) matches ANY byte, so corruption
        # like b"1\xae0" reaches here — strict IOError, never a codec
        # error escaping the reader (hypothesis-found, round 5)
        raise IOError("Bad version line: %r" % version_line)
    if version not in SUPPORTED_VERSIONS:
        raise IOError("Unsupported WARC version: %s" % version)
    headers = {}
    while True:
        line = fileobj.readline()
        if line == b"\r\n":  # end of headers
            break
        m = RE_HEADER.match(line)
        if not m:
            raise IOError("Bad header line: %r" % line)
        name, value = m.groups()
        try:
            headers[name.decode("ascii")] = value.decode("ascii")
        except UnicodeDecodeError:
            # the write path is ASCII ("replace"-lossy), so non-ASCII
            # header bytes can only come from corruption — surface as
            # the strict reader's IOError, not a codec error escaping
            # the format layer (caught by the round-4 byte-flip
            # property test)
            raise IOError("Bad header line (non-ASCII): %r" % line)
    return WARCHeader(headers)


def _expect_line(fileobj, expected: bytes) -> None:
    line = fileobj.readline()
    if line != expected:
        raise IOError("Expected %r, found %r" % (expected, line))


class WARCReader:
    """One-record cursor over an uncompressed WARC byte stream.

    Payloads are lazy ``FilePart`` views; reading the next record first
    drains the previous record's payload and consumes its ``\\r\\n\\r\\n``
    trailer (reference warc/warc.py:354-361).
    """

    def __init__(self, fileobj):
        self.fileobj = fileobj
        self.current_payload: FilePart | None = None

    def finish_reading_current_record(self) -> None:
        if self.current_payload is not None:
            self.current_payload.read()  # drain
            _expect_line(self.current_payload.fileobj, b"\r\n")
            _expect_line(self.current_payload.fileobj, b"\r\n")
            self.current_payload = None

    def read_record(self) -> WARCRecord | None:
        self.finish_reading_current_record()
        header = read_header(self.fileobj)
        if header is None:
            return None
        self.current_payload = FilePart(self.fileobj, header.content_length)
        return WARCRecord(header, self.current_payload, defaults=False)

    def __iter__(self):
        record = self.read_record()
        while record is not None:
            yield record
            record = self.read_record()


def parse_record_bytes(data: bytes) -> WARCRecord:
    """Parse exactly one record (header + payload + trailer) from bytes.

    Used by the distributed datasource, where each gzip member /
    record slice is already materialized as one bytes object.
    The payload is materialized eagerly and the trailer validated.
    """
    f = io.BytesIO(data)
    header = read_header(f)
    if header is None:
        raise IOError("Empty record data")
    try:
        clen = header.content_length
    except (KeyError, ValueError):
        # corruption can tear the Content-Length header name or value;
        # the reference's WARCReader propagates the raw KeyError /
        # ValueError (warc/warc.py:107-109 — parity kept there), but
        # this batch-parse entry is the distributed reader's error
        # boundary, so corruption surfaces as the strict IOError
        raise IOError("Bad or missing Content-Length header")
    if clen < 0:
        raise IOError("Bad or missing Content-Length header")
    payload = f.read(clen)
    if len(payload) != clen:
        raise IOError(
            "Truncated payload: expected %d bytes, got %d"
            % (clen, len(payload))
        )
    _expect_line(f, b"\r\n")
    _expect_line(f, b"\r\n")
    rec = WARCRecord(header, payload, defaults=False)
    return rec
