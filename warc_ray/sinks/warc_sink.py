"""WARC shard sink: Dataset of records → ``.warc.gz`` shards + CDX index.

Write-path invariants (reference parity):
  * exactly one gzip member per record, level 9
    (warc/warc.py:269-272, gzip2.py:17,54; test_warc.py:100-109);
  * one ``warcinfo`` record leads every shard (G12);
  * the sink emits a CDX-like index row per record — (uri, shard,
    compressed offset, length, digest) — the distributed counterpart of
    ``WARCFile.browse()``/``tell()`` (warc/warc.py:284-313).

Scale/resumability design:
  * one shard file per input block (`map_batches` task) — no shuffle;
  * shard names are content-addressed (sha1 of record ids) → reruns
    overwrite the same file, so a restarted job is idempotent;
  * files land via write-temp-then-rename (atomic on one node; on a
    real cluster each worker renames on its own mount / object store).
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa


def _as_array(col) -> pa.Array:
    """Column → single contiguous Array (cheap for the 1-chunk case)."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

from ..core import gzipm
from ..core.warcrec import WARCHeader, sha1_digest
from ..schema import CDX_SCHEMA
from ..stages.assemble import record_id_for

WARCINFO_FIELDS = (
    "software: warc-ray/0.1\r\nformat: WARC File Format 1.0\r\n"
)


def warcinfo_bytes(shard_name: str, date: str) -> bytes:
    """The shard-leading warcinfo record (deterministic id from name)."""
    payload = WARCINFO_FIELDS.encode("ascii")
    h = WARCHeader({})
    h["WARC-Type"] = "warcinfo"
    h["WARC-Record-ID"] = record_id_for("urn:warcinfo:" + shard_name, "warcinfo")
    h["WARC-Date"] = date
    h["WARC-Filename"] = shard_name
    h["Content-Type"] = "application/warc-fields"
    h["Content-Length"] = str(len(payload))
    h["WARC-Payload-Digest"] = sha1_digest(payload)
    return h.to_bytes() + payload + b"\r\n\r\n"


class WriteWarcShard:
    """``map_batches`` callable: one batch → one ``.warc.gz`` shard file.

    Emits CDX index rows as its output table, so the pipeline's sink
    stage doubles as index construction (zero extra passes).
    """

    def __init__(self, out_dir: str, date: str = "2026-01-01T00:00:00Z",
                 compress: bool = True):
        self.out_dir = out_dir
        self.date = date
        self.compress = compress
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({f.name: [] for f in CDX_SCHEMA}, schema=CDX_SCHEMA)
        rec_ids = batch["record_id"].to_pylist()
        name_h = hashlib.sha1("|".join(rec_ids).encode()).hexdigest()[:16]
        ext = ".warc.gz" if self.compress else ".warc"
        shard_name = f"part-{name_h}{ext}"
        shard_path = os.path.join(self.out_dir, shard_name)

        blobs = batch["record_bytes"].to_pylist()
        info = warcinfo_bytes(shard_name, self.date)
        compress = gzipm.compress_member if self.compress else (lambda b: b)
        chunks = [compress(info)]
        if self.compress and "entropy_hint" in batch.column_names:
            # content-type-driven effort: high-entropy media payloads
            # get STORED members (level-9 match search over them is
            # ~12x the CPU for zero ratio gain); text keeps level 9
            stored = gzipm.compress_member_stored
            hints = batch["entropy_hint"].to_pylist()
            chunks.extend(stored(b) if h else compress(b)
                          for b, h in zip(blobs, hints))
        else:
            chunks.extend(compress(blob) for blob in blobs)
        lengths = np.fromiter((len(c) for c in chunks), dtype=np.int64,
                              count=len(chunks))
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])

        tmp = shard_path + ".tmp-%s" % uuid.uuid4().hex[:8]
        with open(tmp, "wb") as f:
            f.write(b"".join(chunks))
        os.replace(tmp, shard_path)  # idempotent overwrite on rerun

        n = len(chunks)
        return pa.table({
            "target_uri": pa.concat_arrays(
                [pa.array([""], type=pa.string()),
                 _as_array(batch["target_uri"])]),
            "record_id": pa.concat_arrays(
                [pa.array([record_id_for("urn:warcinfo:" + shard_name,
                                         "warcinfo")], type=pa.string()),
                 _as_array(batch["record_id"])]),
            "rec_type": pa.concat_arrays(
                [pa.array(["warcinfo"], type=pa.string()),
                 _as_array(batch["rec_type"])]),
            "shard": [shard_path] * n,
            "offset": offsets,
            "length": lengths,
            "payload_digest": pa.concat_arrays(
                [pa.array([sha1_digest(WARCINFO_FIELDS.encode("ascii"))],
                          type=pa.string()),
                 _as_array(batch["payload_digest"])]),
        }, schema=CDX_SCHEMA)


def write_warc_shards(records_ds, out_dir: str, *, compress: bool = True,
                      date: str = "2026-01-01T00:00:00Z",
                      batch_size: int = 2048, clean: bool = True):
    """Serialize+write a Dataset of serialized records; returns the CDX
    index Dataset (lazy — consume it to drive the write).

    ``clean=True``: the sink owns ``out_dir`` — stale shards from a
    previous (possibly differently-batched) run are removed first, so a
    rerun is idempotent at directory granularity.  Resumable pipelines
    give each partition/round its own directory and skip completed ones
    via their manifest (G16), rather than merging files in place.
    """
    if clean and os.path.isdir(out_dir):
        suffix = ".warc.gz" if compress else ".warc"
        for name in os.listdir(out_dir):
            if name.endswith(suffix) or ".tmp-" in name:
                os.unlink(os.path.join(out_dir, name))
    return records_ds.map_batches(
        WriteWarcShard(out_dir, date=date, compress=compress),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


_TRAILER = b"\r\n\r\n"

_REQ_HDR = (
    "WARC/1.0\r\nWARC-Type: request\r\nWARC-Record-ID: %s\r\n"
    "WARC-Date: %s\r\nWARC-Target-URI: %s\r\n"
    "Content-Type: application/http; msgtype=request\r\n"
    "Content-Length: %d\r\nWARC-Payload-Digest: %s\r\n\r\n")
_RESP_HDR = (
    "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: %s\r\n"
    "WARC-Date: %s\r\nWARC-Target-URI: %s\r\n"
    "Content-Type: application/http; msgtype=response\r\n"
    "Content-Length: %d\r\nWARC-Payload-Digest: %s\r\n"
    "WARC-Concurrent-To: %s\r\n\r\n")
_META_HDR = (
    "WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Record-ID: %s\r\n"
    "WARC-Date: %s\r\nWARC-Target-URI: %s\r\n"
    "Content-Type: application/warc-fields\r\n"
    "Content-Length: %d\r\nWARC-Payload-Digest: %s\r\n"
    "WARC-Concurrent-To: %s\r\n\r\n")


def write_fused_round(batch: pa.Table, out_dir: str, date: str) -> pa.Table:
    """Fetch-log rows → one ``.warc.gz`` shard, FUSED: assembly and
    per-record gzip run in one pass and the response body streams from
    its Arrow buffer straight into sha1 + deflate
    (``compress_member_parts``) — no record-bytes table, no
    ``to_pylist`` body copies, no joined payload bytes.

    Byte-identical to ``WriteWarcShard(out_dir, date)(
    fused_fetch_records(batch))`` — file bytes AND CDX rows — pinned by
    tests/test_archive_slice.py::test_write_fused_round_parity.  The
    writer pool is memory-bandwidth-bound at full node occupancy
    (measured: +83% CPU/call under 10 bandwidth hogs), so the copies
    this removes buy disproportionate wall on the 32-CPU arm."""
    from ..stages.assemble import _record_id_fast, logical_date
    from ..stages.multimodal import _binary_views

    if batch.num_rows == 0:
        return pa.table({f.name: [] for f in CDX_SCHEMA}, schema=CDX_SCHEMA)
    os.makedirs(out_dir, exist_ok=True)
    sha1 = hashlib.sha1
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    statuses = batch["status"].to_pylist()
    rounds = batch["round"].to_pylist()
    ctypes = batch["content_type"].to_pylist()
    n = batch.num_rows
    depths = (batch["depth"].to_pylist()
              if "depth" in batch.column_names else [0] * n)
    seqs = (batch["fetch_seq"].to_pylist()
            if "fetch_seq" in batch.column_names else [0] * n)
    _, bstarts, bends, bdata = _binary_views(batch["body"])

    ids: list = []
    types_: list = []
    uris: list = []
    digs: list = []
    chunks: list = []          # compressed members (warcinfo prepended)
    deflate = gzipm.compress_member_parts
    stored = gzipm.compress_member_stored_parts
    for i in range(n):
        url = urls[i]
        rnd = rounds[i]
        date_r = logical_date(rnd)
        salt = "r%d" % rnd
        rest = url.split("://", 1)[1]
        path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"

        req_id = _record_id_fast(url, "request", salt)
        req_payload = ("GET %s HTTP/1.1\r\nHost: %s\r\n"
                       "User-Agent: warc-ray/0.1\r\n\r\n"
                       % (path, hosts[i])).encode("ascii")
        dig = "sha1:" + sha1(req_payload).hexdigest()
        ids.append(req_id)
        types_.append("request")
        uris.append(url)
        digs.append(dig)
        chunks.append(deflate((
            (_REQ_HDR % (req_id, date_r, url, len(req_payload), dig))
            .encode("ascii"), req_payload, _TRAILER)))

        body = bdata[bstarts[i]:bends[i]]
        status_line = ("HTTP/1.1 200 OK" if statuses[i] == 200
                       else "HTTP/1.1 %d X" % statuses[i])
        http_hdr = ("%s\r\nContent-Type: %s\r\nContent-Length: %d\r\n\r\n"
                    % (status_line, ctypes[i], len(body))).encode("ascii")
        h = sha1(http_hdr)
        h.update(body)
        dig = "sha1:" + h.hexdigest()
        rid = _record_id_fast(url, "response", salt)
        ids.append(rid)
        types_.append("response")
        uris.append(url)
        digs.append(dig)
        warc_hdr = (_RESP_HDR % (
            rid, date_r, url, len(http_hdr) + len(body), dig, req_id)
        ).encode("ascii")
        member = (stored if ctypes[i] == "application/octet-stream"
                  else deflate)
        chunks.append(member((warc_hdr, http_hdr, body, _TRAILER)))

        meta_payload = ("hopsFromSeed: %d\r\nfetchSeq: %d\r\n"
                        "fetchStatus: %d\r\nfetchRound: %d\r\n"
                        % (depths[i], seqs[i], statuses[i], rnd)
                        ).encode("ascii")
        dig = "sha1:" + sha1(meta_payload).hexdigest()
        rid = _record_id_fast(url, "metadata", salt)
        ids.append(rid)
        types_.append("metadata")
        uris.append(url)
        digs.append(dig)
        chunks.append(deflate((
            (_META_HDR % (rid, date_r, url, len(meta_payload), dig, req_id))
            .encode("ascii"), meta_payload, _TRAILER)))

    name_h = hashlib.sha1("|".join(ids).encode()).hexdigest()[:16]
    shard_name = f"part-{name_h}.warc.gz"
    shard_path = os.path.join(out_dir, shard_name)
    chunks.insert(0, gzipm.compress_member(warcinfo_bytes(shard_name, date)))
    lengths = np.fromiter((len(c) for c in chunks), dtype=np.int64,
                          count=len(chunks))
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    tmp = shard_path + ".tmp-%s" % uuid.uuid4().hex[:8]
    with open(tmp, "wb") as f:
        f.write(b"".join(chunks))
    os.replace(tmp, shard_path)

    m = len(chunks)
    return pa.table({
        "target_uri": pa.array([""] + uris, type=pa.string()),
        "record_id": pa.array(
            [record_id_for("urn:warcinfo:" + shard_name, "warcinfo")] + ids,
            type=pa.string()),
        "rec_type": pa.array(["warcinfo"] + types_, type=pa.string()),
        "shard": [shard_path] * m,
        "offset": offsets,
        "length": lengths,
        "payload_digest": pa.array(
            [sha1_digest(WARCINFO_FIELDS.encode("ascii"))] + digs,
            type=pa.string()),
    }, schema=CDX_SCHEMA)
