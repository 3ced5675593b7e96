"""ARC→WARC migration mapping (stages/assemble.arc_rows_to_warc_records):
field mapping, date conversion, digests, and a full in-memory
ARC-file → WARC-file round trip through the core layer."""

import io

import pyarrow as pa

import warc_ray.core as wc
from warc_ray.core.warcrec import sha1_digest
from warc_ray.schema import ARC_RECORD_SCHEMA
from warc_ray.stages.assemble import (arc_rows_to_warc_records,
                                      serialize_records)


def _arc_batch():
    rows = [
        {"url": "http://example.org/a", "ip_address": "10.0.0.1",
         "date": "20011110123456", "content_type": "text/html",
         "result_code": "200", "checksum": "-", "location": "-",
         "offset": "0", "filename": "f.arc", "length": "5",
         "arc_version": 2, "payload": b"hello"},
        {"url": "http://example.org/b", "ip_address": "",
         "date": "19970101000000", "content_type": "text/plain",
         "result_code": None, "checksum": None, "location": None,
         "offset": None, "filename": None, "length": "3",
         "arc_version": 1, "payload": b"xyz"},
    ]
    return pa.Table.from_pylist(rows, schema=ARC_RECORD_SCHEMA)


def test_field_mapping_and_date_conversion():
    out = arc_rows_to_warc_records(_arc_batch())
    assert out["rec_type"].to_pylist() == ["response", "response"]
    assert out["target_uri"].to_pylist() == [
        "http://example.org/a", "http://example.org/b"]
    assert out["date"].to_pylist() == [
        "2001-11-10T12:34:56Z", "1997-01-01T00:00:00Z"]
    assert out["ip_address"].to_pylist() == ["10.0.0.1", ""]
    assert out["payload"].to_pylist() == [b"hello", b"xyz"]
    assert out["payload_digest"].to_pylist() == [
        sha1_digest(b"hello"), sha1_digest(b"xyz")]
    assert out["content_length"].to_pylist() == [5, 3]


def test_migrated_records_roundtrip_through_core_reader(tmp_path):
    """Serialized migrated records must parse back through the core
    WARC reader with identical fields — the conformance bar the
    reference's own write→read tests set (warc/tests/test_warc.py)."""
    ser = serialize_records(arc_rows_to_warc_records(_arc_batch()))
    path = str(tmp_path / "mig.warc")
    with open(path, "wb") as f:
        for blob in ser["record_bytes"].to_pylist():
            f.write(blob)
    got = []
    for rec in wc.open_archive(path):
        got.append((rec.type, rec.header.get("warc-target-uri"),
                    rec.payload.read()))
    assert got == [("response", "http://example.org/a", b"hello"),
                   ("response", "http://example.org/b", b"xyz")]
