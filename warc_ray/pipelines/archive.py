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
