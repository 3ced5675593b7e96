"""ARC shard sink: Dataset of fetched rows → ``.arc.gz`` shards.

The distributed counterpart of ``ARCFile.write`` (reference
warc/arc.py:297-305): each output shard leads with the mandatory
``filedesc://<name>`` file-header record (arc.py:264-295 — including
the v2 length-before-interpolation quirk the reference tests pin),
then one v2 record per input row, ``\\n``-separated.

Same scale/resumability design as the WARC sink: one shard per input
block, content-addressed names → idempotent rewrite, and an index row
per record emitted as the stage output.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid

import pyarrow as pa

from ..core.arcrec import ARCFile, ARCHeader, ARCRecord

ARC_INDEX_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("shard", pa.string()),
    ("n_bytes", pa.int64()),
])


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

        buf = io.BytesIO()
        buf.name = shard_name  # ARCFile reads .name for filedesc://
        f = ARCFile(fileobj=buf, version=2,
                    file_headers={"org": self.org, "ip_address": self.ip,
                                  "date": self.date})
        sizes = []
        for url, ip, date, ctype, body in zip(
                urls,
                batch["ip_address"].to_pylist(),
                batch["date"].to_pylist(),
                batch["content_type"].to_pylist(),
                batch["body"].to_pylist()):
            body = bytes(body or b"")
            rec = ARCRecord(header=ARCHeader(
                url=url, ip_address=ip, date=date, content_type=ctype,
                result_code="200", checksum="-", location="-",
                offset=str(buf.tell()), filename=shard_name,
                length=str(len(body))), payload=body, version=2)
            before = buf.tell()
            f.write(rec)
            sizes.append(buf.tell() - before)

        data = buf.getvalue()
        if self.compress:
            data = gzip.compress(data, compresslevel=9)
        tmp = shard_path + ".tmp-%s" % uuid.uuid4().hex[:8]
        with open(tmp, "wb") as out:
            out.write(data)
        os.replace(tmp, shard_path)

        return pa.table({
            "url": urls,
            "shard": [shard_path] * len(urls),
            "n_bytes": pa.array(sizes, type=pa.int64()),
        }, schema=ARC_INDEX_SCHEMA)


def write_arc_shards(ds, out_dir: str, *, batch_size: int = 2048,
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
