"""Simulated fetcher (G10): resolve canonical URLs against the corpus.

No network exists (or is allowed) here; "fetching" a synthetic URL
deterministically reconstructs the document from the corpus table:

  * ``/doc/<i>``   → HTTP 200, body = rendered span interleaving,
                     parse result = the original spans (the per-row
                     span-sequence invariant rides on this);
  * ``/media/<i>`` → HTTP 200, deterministic binary blob (image/video
                     stand-in), no out-links;
  * anything else  → HTTP 404, empty body.

Scale design: URLs are grouped by **corpus bucket** (doc_index mod
n_buckets) and fetched with ``groupby("bucket").map_groups`` — each
group reads exactly one bucket file of the corpus (locality), with a
small per-worker LRU cache.  Nothing holds the whole corpus in memory;
at 100 TB the bucket files are the unit of co-partitioning.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa

from .. import corpus as corpus_mod
from ..schema import FETCH_SCHEMA, SPAN_STRUCT
from .assemble import http_response_payload, media_body, render_body

_EMPTY_SPANS: list = []
_BUCKET_CACHE: OrderedDict = OrderedDict()
_BUCKET_CACHE_CAP = 8


def _load_bucket(corpus_dir: str, bucket: int) -> dict[int, list]:
    """doc_index -> spans (pylist) for one corpus bucket, LRU-cached."""
    key = (corpus_dir, bucket)
    if key in _BUCKET_CACHE:
        _BUCKET_CACHE.move_to_end(key)
        return _BUCKET_CACHE[key]
    t = corpus_mod.read_bucket(corpus_dir, bucket)
    idx = {int(d.removeprefix("doc-")): s
           for d, s in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist())}
    _BUCKET_CACHE[key] = idx
    if len(_BUCKET_CACHE) > _BUCKET_CACHE_CAP:
        _BUCKET_CACHE.popitem(last=False)
    return idx


def add_bucket_column(batch: pa.Table, n_buckets: int) -> pa.Table:
    """bucket = doc_index % n_buckets, parsed from the synthetic URL."""
    urls = batch["url"].to_pylist()
    buckets = np.empty(len(urls), dtype=np.int32)
    for i, u in enumerate(urls):
        _kind, idx = corpus_mod.parse_synthetic_url(u)
        buckets[i] = (idx % n_buckets) if idx >= 0 else 0
    return batch.append_column("bucket", pa.array(buckets))


def fetch_rows(urls: list[str], corpus_dir: str, n_buckets: int):
    """(doc_id, status, content_type, body, spans) per URL — the shared
    inner fetch used by BOTH the distributed group fetcher and the
    single-process oracle (parity by construction)."""
    out = []
    for u in urls:
        kind, idx = corpus_mod.parse_synthetic_url(u)
        if kind == "doc":
            spans = _load_bucket(corpus_dir, idx % n_buckets).get(idx)
            if spans is None:
                out.append(("", 404, "text/plain", b"", _EMPTY_SPANS))
                continue
            body = http_response_payload(render_body(spans))
            out.append((f"doc-{idx}", 200, "text/html", body, spans))
        elif kind == "media":
            out.append((f"media-{idx}", 200, "application/octet-stream",
                        media_body(u), _EMPTY_SPANS))
        else:
            out.append(("", 404, "text/plain", b"", _EMPTY_SPANS))
    return out


class FetchGroup:
    """``map_groups`` callable over one bucket's URL group."""

    def __init__(self, corpus_dir: str, n_buckets: int):
        self.corpus_dir = corpus_dir
        self.n_buckets = n_buckets

    def __call__(self, group: pa.Table) -> pa.Table:
        urls = group["url"].to_pylist()
        rows = fetch_rows(urls, self.corpus_dir, self.n_buckets)
        return pa.table({
            "url": group["url"],
            "host": group["host"],
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "status": pa.array([r[1] for r in rows], type=pa.int32()),
            "round": group["round"],
            "fetch_seq": group["fetch_seq"],
            "content_type": pa.array([r[2] for r in rows], type=pa.string()),
            "body": pa.array([r[3] for r in rows], type=pa.large_binary()),
            "spans": pa.array([r[4] for r in rows], type=pa.list_(SPAN_STRUCT)),
            "depth": group["depth"],
        }, schema=FETCH_SCHEMA)
