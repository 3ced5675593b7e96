"""Archive slice: docs table → WARC response records → gz shards + CDX.

The "minimum end-to-end slice" of SURVEY.md §7 step 3 — read →
map_batches → write, zero shuffles.  Every stage is a vectorized Arrow
batch transform; output shards are record-per-gzip-member and carry a
leading warcinfo record, so they round-trip through both this package's
distributed reader and the single-process core ``WARCFile``.
"""

from __future__ import annotations

import ray.data as rd

from ..sinks.warc_sink import write_warc_shards
from ..stages.assemble import fused_doc_records


def archive_docs(docs_ds: "rd.Dataset", out_dir: str, *,
                 date: str = "2026-01-01T00:00:00Z",
                 records_per_shard: int = 2048) -> "rd.Dataset":
    """Returns the (lazy) CDX index Dataset; consuming it drives the write.

    Assembly uses the fused docs→record-bytes pass (vectorized span
    rendering + templated headers); byte-parity with the two-step
    docs_to_response_records → serialize_records path is pinned by
    tests/test_archive_slice.py::test_fused_doc_records_parity."""
    serialized = docs_ds.map_batches(
        lambda b: fused_doc_records(b, date=date),
        batch_format="pyarrow",
    )
    return write_warc_shards(serialized, out_dir, date=date,
                             batch_size=records_per_shard)


def archive_corpus(corpus_docs_path: str, out_dir: str, **kwargs) -> "rd.Dataset":
    from .. import io as wio

    return archive_docs(wio.read_docs(corpus_docs_path), out_dir, **kwargs)


def cdx_replay_batch(b: "pa.Table") -> "pa.Table":
    """Replay a batch of CDX rows by compressed offset: seek each shard
    at ``offset``, gunzip exactly one member (record-per-member makes
    any record independently decodable — reference warc/warc.py:269-272
    invariant), parse, and verify the payload digest.  Rows are served
    shard-grouped/offset-sorted so a shard is opened once per batch.
    Used by q65 (__ray_entry__._cdx_lookup_q) and the corruption test."""
    import numpy as np
    import pyarrow as pa

    from ..core.gzipm import decompress_members
    from ..core.warcrec import parse_record_bytes, sha1_digest

    order = pa.compute.sort_indices(
        b, sort_keys=[("shard", "ascending"), ("offset", "ascending")])
    b = b.take(order)
    ok = np.zeros(b.num_rows, dtype=bool)
    fh, cur = None, None
    for i, (sh, off, ln, dig) in enumerate(zip(
            b["shard"].to_pylist(), b["offset"].to_pylist(),
            b["length"].to_pylist(), b["payload_digest"].to_pylist())):
        if sh != cur:
            if fh is not None:
                fh.close()
            fh, cur = open(sh, "rb"), sh
        fh.seek(off)
        rec = parse_record_bytes(decompress_members(fh.read(ln)))
        payload = rec.payload if isinstance(rec.payload, bytes) \
            else rec.payload.read()
        ok[i] = (sha1_digest(payload) == dig
                 and rec.header.get("warc-payload-digest", dig) == dig)
    if fh is not None:
        fh.close()
    return pa.table({
        "record_id": b["record_id"],
        "target_uri": b["target_uri"],
        "rec_type": b["rec_type"],
        "length": b["length"],
        "digest_ok": pa.array(ok),
    })
