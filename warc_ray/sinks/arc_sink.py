"""ARC shard sink: Dataset of fetched rows → ``.arc.gz`` shards.

The distributed counterpart of ``ARCFile.write`` (reference
warc/arc.py:297-305): each output shard leads with the mandatory
``filedesc://<name>`` file-header record (arc.py:264-295 — including
the v2 length-before-interpolation quirk the reference tests pin),
then one v2 record per input row, ``\\n``-separated.

Hot path: a TEMPLATED serializer (same trick as the WARC sink,
stages/assemble.py serialize_records) — the v2 header line is one
string format per record, with a running integer offset instead of
``buf.tell()`` bookkeeping; byte-parity with the ARCFile object path
is pinned by tests/test_conformance_arc.py::test_arc_sink_fast_path_parity.

Compression writes ONE GZIP MEMBER PER RECORD (filedesc included), the
same record-splittable layout the WARC sink uses (reference
warc/warc.py:269-272 — the reference's ARC path never gzips, so this
extends the engine's own splittability convention to ``.arc.gz``).
Logical (uncompressed) offsets in the headers are unchanged, and the
decompressed concatenation is byte-identical to the uncompressed file.

Same scale/resumability design as the WARC sink: one shard per input
block, content-addressed names → idempotent rewrite, and an index row
per record emitted as the stage output.
"""

from __future__ import annotations

import hashlib
import io
import os
import uuid

import pyarrow as pa

from ..core.arcrec import ARCFile, ARCHeader, ARCRecord
from ..core.gzipm import compress_member, compress_member_stored

ARC_INDEX_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("shard", pa.string()),
    ("n_bytes", pa.int64()),
])


def filedesc_bytes(shard_name: str, *, org: str, ip_address: str,
                   date: str) -> bytes:
    """The shard's leading filedesc record (+ separator), produced by
    the conformance-tested ARCFile header writer."""
    buf = io.BytesIO()
    buf.name = shard_name
    f = ARCFile(fileobj=buf, version=2,
                file_headers={"org": org, "ip_address": ip_address,
                              "date": date})
    # header_written=True first: _write_header()'s internal write()
    # would otherwise re-enter _write_header and emit filedesc twice
    f.header_written = True
    f._write_header()
    return buf.getvalue()


def serialize_arc_records(batch: pa.Table, shard_name: str, start_offset: int,
                          *, version: int = 2) -> list[bytes]:
    """v2 record bytes per row (header line + payload + \\n + separator
    \\n), offsets running from ``start_offset`` — byte-identical to
    ARCRecord.write_to + the ARCFile separator (arcrec.py write())."""
    assert version == 2, "fast path serializes v2 (the sink default)"
    out = []
    offset = start_offset
    for url, ip, date, ctype, body in zip(
            batch["url"].to_pylist(),
            batch["ip_address"].to_pylist(),
            batch["date"].to_pylist(),
            batch["content_type"].to_pylist(),
            batch["body"].to_pylist()):
        body = bytes(body or b"")
        rec = ("%s %s %s %s 200 - - %d %s %d\n"
               % (url, ip, date, ctype, offset, shard_name,
                  len(body))).encode("latin-1") + body + b"\n\n"
        out.append(rec)
        offset += len(rec)
    return out


def serialize_arc_records_reference(batch: pa.Table, shard_name: str,
                                    start_offset: int) -> list[bytes]:
    """The ARCHeader/ARCRecord object path (parity oracle for the
    templated serializer above)."""
    out = []
    offset = start_offset
    for url, ip, date, ctype, body in zip(
            batch["url"].to_pylist(),
            batch["ip_address"].to_pylist(),
            batch["date"].to_pylist(),
            batch["content_type"].to_pylist(),
            batch["body"].to_pylist()):
        body = bytes(body or b"")
        rec = ARCRecord(header=ARCHeader(
            url=url, ip_address=ip, date=date, content_type=ctype,
            result_code="200", checksum="-", location="-",
            offset=str(offset), filename=shard_name,
            length=str(len(body))), payload=body, version=2)
        b = rec.to_bytes(2) + b"\n"  # write() appends the separator
        out.append(b)
        offset += len(b)
    return out


class WriteArcShard:
    """``map_batches`` callable: one batch → one ``.arc.gz`` shard.

    Expects columns (url, ip_address, date, content_type, body) —
    ``date`` in ARC ``YYYYmmddHHMMSS`` form (injected logical date, not
    wall clock — determinism)."""

    def __init__(self, out_dir: str, *, org: str = "warc-ray",
                 ip_address: str = "127.0.0.1",
                 date: str = "20260101000000", compress: bool = True):
        self.out_dir = out_dir
        self.org = org
        self.ip = ip_address
        self.date = date
        self.compress = compress
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({f.name: [] for f in ARC_INDEX_SCHEMA},
                            schema=ARC_INDEX_SCHEMA)
        urls = batch["url"].to_pylist()
        name_h = hashlib.sha1("|".join(urls).encode()).hexdigest()[:16]
        ext = ".arc.gz" if self.compress else ".arc"
        shard_name = f"part-{name_h}{ext}"
        shard_path = os.path.join(self.out_dir, shard_name)

        head = filedesc_bytes(shard_name, org=self.org, ip_address=self.ip,
                              date=self.date)
        recs = serialize_arc_records(batch, shard_name, len(head))
        sizes = [len(r) for r in recs]
        if self.compress:
            # one gzip member per record → record-aligned split points;
            # high-entropy media payloads get STORED members (level-9
            # match search over them is ~12x CPU for zero ratio gain —
            # same content-type-driven effort as the WARC sink)
            ctypes = batch["content_type"].to_pylist()
            data = b"".join(
                [compress_member(head)]
                + [compress_member_stored(r)
                   if ct == "application/octet-stream" else compress_member(r)
                   for r, ct in zip(recs, ctypes)])
        else:
            data = b"".join([head] + recs)
        tmp = shard_path + ".tmp-%s" % uuid.uuid4().hex[:8]
        with open(tmp, "wb") as out:
            out.write(data)
        os.replace(tmp, shard_path)

        return pa.table({
            "url": urls,
            "shard": [shard_path] * len(urls),
            "n_bytes": pa.array(sizes, type=pa.int64()),
        }, schema=ARC_INDEX_SCHEMA)


def write_arc_shards(ds, out_dir: str, *, batch_size: int = 4096,
                     clean: bool = True, **sink_kwargs):
    """Write a Dataset of (url, ip_address, date, content_type, body)
    rows as ARC v2 shards; returns the index Dataset (lazy)."""
    if clean and os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.endswith((".arc", ".arc.gz")) or ".tmp-" in name:
                os.unlink(os.path.join(out_dir, name))
    return ds.map_batches(
        WriteArcShard(out_dir, **sink_kwargs),
        batch_format="pyarrow", batch_size=batch_size,
    )
