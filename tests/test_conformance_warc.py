"""WARC conformance: the reference's test vectors, ported to py3 bytes.

Golden literals from /root/reference/warc/tests/test_warc.py (line refs
in comments).  This suite is the "round-trip pass rate 100%" gate of
BASELINE.json.
"""

import io
import os

from warc_ray.core import (
    CONTENT_TYPES,
    WARCFile,
    WARCHeader,
    WARCReader,
    WARCRecord,
    canonical_header_name,
    parse_record_bytes,
    sha1_digest,
)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


class TestWARCHeader:
    # test_warc.py:6-16
    def test_attrs(self):
        h = WARCHeader({
            "WARC-Type": "response",
            "WARC-Record-ID": "<record-1>",
            "WARC-Date": "2000-01-02T03:04:05Z",
            "Content-Length": "10",
        })
        assert h.type == "response"
        assert h.record_id == "<record-1>"
        assert h.date == "2000-01-02T03:04:05Z"
        assert h.content_length == 10

    # test_warc.py:18-28
    def test_item_access(self):
        h = WARCHeader({"WARC-Type": "response", "X-New-Header": "42"})
        assert h["WARC-Type"] == "response"
        assert h["WARC-TYPE"] == "response"
        assert h["warc-type"] == "response"
        assert h["X-New-Header"] == "42"
        assert h["x-new-header"] == "42"

    # test_warc.py:30-37
    def test_str(self):
        h = WARCHeader({})
        assert str(h) == "WARC/1.0\r\n\r\n"
        h = WARCHeader({"WARC-Type": "response"})
        assert str(h) == "WARC/1.0\r\n" + "WARC-Type: response\r\n\r\n"

    # test_warc.py:39-45
    def test_init_defaults(self):
        h = WARCHeader({"WARC-Type": "resource"}, defaults=True)
        assert h.type == "resource"
        assert "WARC-Date" in h
        assert "Content-Type" in h
        assert "WARC-Record-ID" in h

    # test_warc.py:47-53 (CONTENT_TYPES map, warc/warc.py:52-55)
    def test_new_content_types(self):
        def f(type):
            return WARCHeader({"WARC-Type": type}, defaults=True)

        assert f("response")["Content-Type"] == "application/http; msgtype=response"
        assert f("request")["Content-Type"] == "application/http; msgtype=request"
        assert f("warcinfo")["Content-Type"] == "application/warc-fields"
        assert f("metadata")["Content-Type"] == "application/warc-fields"
        assert f("newtype")["Content-Type"] == "application/octet-stream"
        assert set(CONTENT_TYPES) == {"warcinfo", "response", "request", "metadata"}

    # header-name canonicalization incl. the -Id over-match quirk
    # (warc/warc.py:95-97; verified against the reference's transform)
    def test_canonical_names(self):
        assert canonical_header_name("warc-type") == "WARC-Type"
        assert canonical_header_name("warc-ip-address") == "WARC-IP-Address"
        assert canonical_header_name("warc-record-id") == "WARC-Record-ID"
        assert canonical_header_name("warc-target-uri") == "WARC-Target-URI"
        assert canonical_header_name("x-new-header") == "X-New-Header"
        assert canonical_header_name("x-identity") == "X-IDentity"  # quirk
        assert canonical_header_name("content-length") == "Content-Length"


# test_warc.py:55-66
SAMPLE_WARC_RECORD_TEXT = (
    b"WARC/1.0\r\n"
    b"Content-Length: 10\r\n"
    b"WARC-Date: 2012-02-10T16:15:52Z\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:80fb9262-5402-11e1-8206-545200690126>\r\n"
    b"WARC-Target-URI: http://example.com/\r\n"
    b"\r\n"
    b"Helloworld"
    b"\r\n\r\n"
)


class TestWARCReader:
    # test_warc.py:69-75
    def test_read_header1(self):
        f = io.BytesIO(SAMPLE_WARC_RECORD_TEXT)
        h = WARCReader(f).read_record().header
        assert h.date == "2012-02-10T16:15:52Z"
        assert h.record_id == "<urn:uuid:80fb9262-5402-11e1-8206-545200690126>"
        assert h.type == "response"
        assert h.content_length == 10

    # test_warc.py:77-79
    def test_empty(self):
        reader = WARCReader(io.BytesIO(b""))
        assert reader.read_record() is None

    # test_warc.py:81-85
    def test_read_record(self):
        reader = WARCReader(io.BytesIO(SAMPLE_WARC_RECORD_TEXT))
        record = reader.read_record()
        assert b"".join(record.payload) == b"Helloworld"

    # test_warc.py:87-92 (defined but never auto-run in the reference;
    # we run it)
    def test_read_multiple_records(self):
        reader = WARCReader(io.BytesIO(SAMPLE_WARC_RECORD_TEXT * 5))
        for _ in range(5):
            assert reader.read_record() is not None
        assert reader.read_record() is None

    def test_parse_record_bytes_roundtrip(self):
        rec = parse_record_bytes(SAMPLE_WARC_RECORD_TEXT)
        assert rec.payload_bytes() == b"Helloworld"
        # insertion order preserved → byte-exact re-serialization
        assert rec.to_bytes() == SAMPLE_WARC_RECORD_TEXT


class TestWarcFile:
    # test_warc.py:95-98
    def test_read(self):
        f = WARCFile(fileobj=io.BytesIO(SAMPLE_WARC_RECORD_TEXT))
        assert f.read_record() is not None
        assert f.read_record() is None

    # test_warc.py:100-109 — the gzip member-per-record invariant
    def test_write_gz(self):
        buffer = io.BytesIO()
        f = WARCFile(fileobj=buffer, mode="w", compress=True)
        for i in range(10):
            record = WARCRecord(payload=b"hello %d" % i)
            f.write_record(record)
        # one gzip MEMBER per record (reference warc/warc.py:269-272).
        # Counting magic-number byte pairs is flaky: record ids are
        # random uuids and deflate output can contain \x1f\x8b by
        # chance (~5%/run) — count real member boundaries instead.
        from warc_ray.core import gzipm
        buffer.seek(0)
        assert sum(1 for _ in gzipm.iter_members(buffer)) == 10

    # test_warc.py:111-119 — CRLF across a 1024-byte boundary; Base32
    # payload digest read back verbatim (never recomputed)
    def test_long_header(self):
        f = WARCFile(os.path.join(DATA, "crlf_at_1k_boundary.warc.gz"))
        h = f.read_record().header
        assert h["WARC-Payload-Digest"] == "sha1:M4VJCCJQJKPACSSSBHURM572HSDQHO2P"

    def test_gz_roundtrip(self):
        buffer = io.BytesIO()
        f = WARCFile(fileobj=buffer, mode="w", compress=True)
        payloads = [b"x" * n for n in (0, 1, 1023, 1024, 1025, 70000)]
        for p in payloads:
            f.write_record(WARCRecord(payload=p,
                                      headers={"WARC-Type": "response"},
                                      record_id="<urn:uuid:test>",
                                      date="2012-02-10T16:15:52Z"))
        buffer.seek(0)
        rf = WARCFile(fileobj=buffer, compress=True)
        got = [r.payload.read() for r in rf]
        assert got == payloads

    def test_browse_offsets(self):
        buffer = io.BytesIO()
        f = WARCFile(fileobj=buffer, mode="w", compress=True)
        for i in range(3):
            f.write_record(WARCRecord(payload=b"p%d" % i,
                                      record_id="<urn:uuid:%d>" % i,
                                      date="2012-02-10T16:15:52Z"))
        data = buffer.getvalue()
        buffer.seek(0)
        rf = WARCFile(fileobj=buffer, compress=True)
        entries = [(off, size) for _rec, off, size in rf.browse()]
        assert entries[0][0] == 0
        assert sum(size for _off, size in entries) == len(data)
        # offsets are member-aligned: each starts with the gzip magic
        for off, _size in entries:
            assert data[off:off + 2] == b"\x1f\x8b"


class TestDigest:
    # write-path digest form: "sha1:" + hexdigest (warc/warc.py:156-157)
    def test_payload_digest(self):
        rec = WARCRecord(payload=b"Helloworld")
        import hashlib
        assert rec.checksum == "sha1:" + hashlib.sha1(b"Helloworld").hexdigest()
        assert sha1_digest(b"") == "sha1:" + hashlib.sha1(b"").hexdigest()


def test_from_response_duck_typed():
    # reference warc/warc.py:215-242: payload = status line + headers +
    # blank line + body; WARC-Type=response, Target-URI from request.
    from warc_ray.core.warcrec import WARCRecord

    class Resp:
        status_code = 200
        reason = "OK"
        headers = {"Content-Type": "text/html", "Server": "x"}
        content = b"<html>hi</html>"
        url = "http://example.org/p"

    rec = WARCRecord.from_response(Resp())
    assert rec.type == "response"
    assert rec.url == "http://example.org/p"
    body = rec.payload_bytes()
    assert body.startswith(b"HTTP/1.1 200 OK\r\n")
    assert b"Content-Type: text/html\r\n" in body
    assert body.endswith(b"\r\n<html>hi</html>")
    assert rec["Content-Length"] == str(len(body))
