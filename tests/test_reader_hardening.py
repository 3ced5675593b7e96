"""Adversarial-input reader conformance (round-3 VERDICT item 5).

The reference reader is STRICT: bad version line, unsupported WARC
version, torn header line, or a payload missing its ``\\r\\n\\r\\n``
trailer raise ``IOError`` (reference warc/warc.py:316-346,348-361) —
never a silent skip, never a different exception type.  These tests
pin that contract on the core parser under hypothesis-generated
corruption, pin truncated-gzip behavior on the member scanner, and
pin the q167 dead-letter discipline on the distributed reader (one
corrupt member fails ONE record-range task in strict mode; in dlq
mode it becomes a ``_quarantined`` row and the scan completes) —
see also tests/test_split_read.py::test_planted_corrupt_member_*.

The pure-parser tests need no Ray.
"""

import gzip
import io
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from warc_ray.core import gzipm
from warc_ray.core.warcrec import WARCReader, WARCRecord, parse_record_bytes


def _record_bytes(payload: bytes = b"hello world",
                  uri: str = "http://h/x") -> bytes:
    buf = io.BytesIO()
    rec = WARCRecord(payload=payload,
                     headers={"WARC-Type": "response",
                              "WARC-Target-URI": uri})
    rec.write_to(buf)
    return buf.getvalue()


# -- strict IOError semantics, case by case ---------------------------------

def test_bad_version_line_raises():
    with pytest.raises(IOError, match="Bad version line"):
        parse_record_bytes(b"HTTP/1.1 200 OK\r\n\r\n")


def test_unsupported_warc_version_raises():
    d = _record_bytes().replace(b"WARC/1.0", b"WARC/0.18", 1)
    with pytest.raises(IOError, match="Unsupported WARC version"):
        parse_record_bytes(d)


def test_torn_header_line_raises():
    d = _record_bytes()
    # tear one header line: remove its ': ' separator
    d = d.replace(b"WARC-Type: response", b"WARC-Type response", 1)
    with pytest.raises(IOError, match="Bad header line"):
        parse_record_bytes(d)


def test_missing_trailer_raises():
    d = _record_bytes()
    assert d.endswith(b"\r\n\r\n")
    with pytest.raises(IOError):
        parse_record_bytes(d[:-4])          # trailer gone entirely
    with pytest.raises(IOError, match="Expected"):
        parse_record_bytes(d[:-4] + b"\r\nX\r\n")  # trailer torn


def test_short_payload_raises():
    d = _record_bytes(payload=b"x" * 100)
    with pytest.raises(IOError):
        parse_record_bytes(d[:-40])


def test_uncompressed_stream_reader_same_semantics():
    d = _record_bytes().replace(b"WARC/1.0", b"WARC/2.0", 1)
    r = WARCReader(io.BytesIO(d))
    with pytest.raises(IOError, match="Unsupported WARC version"):
        r.read_record()


# -- hypothesis: corruption never escapes as a wrong parse or a foreign
#    exception type --------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=300),
       st.integers(min_value=0, max_value=10**6))
def test_truncation_always_ioerror(payload, cut):
    """ANY strict prefix of a valid record byte string raises IOError
    (truncation tears the header block, the payload, or the trailer —
    there is no prefix that is itself a valid record)."""
    d = _record_bytes(payload=payload)
    cut = cut % len(d)          # strictly shorter than the record
    with pytest.raises(IOError):
        parse_record_bytes(d[:cut])


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200),
       st.integers(min_value=0, max_value=10**6),
       st.integers(min_value=1, max_value=255))
def test_byteflip_parses_or_ioerror(payload, pos, xor):
    """A single byte flip anywhere either still parses (flip landed in
    the payload / a header value) or raises IOError — never any other
    exception type, never a hang."""
    d = _record_bytes(payload=payload)
    pos = pos % len(d)
    m = bytearray(d)
    m[pos] ^= xor
    try:
        rec = parse_record_bytes(bytes(m))
    except IOError:
        return
    assert rec is not None


# -- truncated gzip members -------------------------------------------------

def _gz_archive(n: int = 10) -> bytes:
    out = io.BytesIO()
    for i in range(n):
        out.write(gzip.compress(_record_bytes(
            payload=b"p%d" % i, uri="http://h/%d" % i)))
    return out.getvalue()


def test_gzip_truncation_prefix_or_ioerror():
    """Truncating a member-per-record archive at EVERY byte position
    either yields a clean prefix of the member list (cut exactly on a
    member boundary) or raises IOError — never a corrupt member, never
    a silent partial record."""
    data = _gz_archive(6)
    full = [d for *_, d in gzipm.split_members(data)]
    bounds = {0}
    acc = 0
    for _, size, _d in gzipm.split_members(data):
        acc += size
        bounds.add(acc)
    rng = random.Random(3)
    cuts = sorted(set(rng.randrange(len(data)) for _ in range(200)) | bounds)
    for cut in cuts:
        got = []
        try:
            for m in gzipm.iter_members(io.BytesIO(data[:cut])):
                got.append(m[2])
        except (IOError, OSError, EOFError):
            continue
        assert cut in bounds, f"clean EOF at non-boundary cut {cut}"
        assert got == full[:len(got)]
