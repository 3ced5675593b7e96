"""URL layer: RFC 3986 canonicalization, SHA-1 hashing, link extraction.

Stateless ``map_batches`` transforms (G2-G4).  The canonicalizer is a
pure function (property-tested): scheme/host lower-cased, default ports
stripped, dot-segments removed, percent-encoding normalized (uppercase
hex, unreserved characters decoded), fragment dropped, query preserved.

Link extraction explodes the interleaved ``spans`` column with
``pyarrow.compute`` list kernels — no Python loop over rows for the
flatten; only the (inherently per-string) canonicalization loops.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import URL_SCHEMA

DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _normalize_pct(s: str) -> str:
    """Uppercase %XX escapes; decode escapes of unreserved characters."""

    def repl(m):
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    # preserve leading slash; re-add trailing slash semantics for ./..
    p = "/".join(out)
    if path.endswith(("/.", "/..", "/")) and not p.endswith("/"):
        p += "/"
    if not p.startswith("/"):
        p = "/" + p
    return p


def canonicalize_url(url: str) -> str | None:
    """Canonical form, or None for non-http(s)/malformed URLs."""
    try:
        parts = urlsplit(url.strip())
        # .port raises ValueError for non-numeric / out-of-range ports
        # ('http://h:99999/'), so it must be read inside the guard too
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https") or not parts.hostname:
            return None
        host = parts.hostname.lower().rstrip(".")
        port = parts.port
    except ValueError:
        return None
    netloc = host if (port is None or str(port) == DEFAULT_PORTS[scheme]) else f"{host}:{port}"
    path = _normalize_pct(_remove_dot_segments(parts.path or "/"))
    query = _normalize_pct(parts.query)
    return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")


def host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0].split(":")[0]


def url_sha1(url: str) -> bytes:
    """20-byte digest of the canonical URL (G4)."""
    return hashlib.sha1(url.encode("utf-8")).digest()


def url_hash64(url: str) -> int:
    """uint64 key for the cuckoo filter (first 8 digest bytes)."""
    return int.from_bytes(url_sha1(url)[:8], "big")


# Already-canonical fast path: lowercase http scheme+host (no port, no
# trailing dot), non-empty path containing no '%', '?', '#', or '.'
# → canonicalize_url(u) == u by construction.  Covers ~all in-crawl
# links (they come from canonical media_ref columns); seed variants,
# dotted paths and anything unusual take the per-string slow path.
# Property-tested: tests/test_urls.py::test_canonical_fast_path.
_CANON_FAST_RE = (
    r"^http://"
    r"[a-z0-9-]+(\.[a-z0-9-]+)+"
    r"(/[A-Za-z0-9\-_~!$&'()*+,;=:@]*)+$"
)


def canonicalize_batch(batch: pa.Table, url_col: str = "url",
                       with_hashes: bool = True) -> pa.Table:
    """Add ``url`` (canonical) and — when ``with_hashes`` —
    ``url_sha1``, ``host`` and ``hash64`` columns; drops rows whose URL
    doesn't canonicalize.

    ``with_hashes=False`` is for pure URL-dedup/report pipelines that
    group on the canonical string itself: sha1 over millions of links
    is the dominant cost of this stage and those pipelines throw the
    digest away."""
    url_arr = batch[url_col]
    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    fast = pc.match_substring_regex(
        url_arr, _CANON_FAST_RE).to_numpy(zero_copy_only=False)
    if fast.all():
        canon_arr = url_arr
        batch = batch.drop_columns([url_col])
        kept = None  # materialized lazily only if hashes are needed
    else:
        urls = url_arr.to_pylist()
        canon = [u if f else canonicalize_url(u)
                 for u, f in zip(urls, fast)]
        keep = np.array([c is not None for c in canon], dtype=bool)
        batch = batch.drop_columns([url_col]).filter(pa.array(keep))
        kept = [c for c in canon if c is not None]
        canon_arr = pa.array(kept, type=pa.string())
    out = batch.add_column(0, "url", canon_arr)
    if not with_hashes:
        return out
    if kept is None:
        kept = canon_arr.to_pylist()
    sha = [hashlib.sha1(c.encode()).digest() for c in kept]
    # host: vectorized regex (equals host_of on canonical URLs)
    m = pc.extract_regex(canon_arr, r"^https?://(?P<host>[^/:]+)")
    hosts = pc.cast(pc.struct_field(m, "host"), pa.string())
    # hash64 = first 8 digest bytes, big-endian — the cuckoo-filter key
    # (G4/G5).  Computed HERE (parallel map_batches workers), so the
    # serialized frontier shards never touch a hash function.
    if sha:
        h64 = (np.frombuffer(b"".join(sha), dtype=np.uint8)
               .reshape(-1, 20)[:, :8].copy().view(">u8")
               .astype(np.uint64).ravel())
    else:
        h64 = np.zeros(0, dtype=np.uint64)
    return out.append_column("url_sha1", pa.array(sha, type=pa.binary(20))) \
        .append_column("host", hosts) \
        .append_column("hash64", pa.array(h64, type=pa.uint64()))


def extract_links(batch: pa.Table, spans_col: str = "spans",
                  doc_col: str = "doc_id", depth_col: str | None = None) -> pa.Table:
    """Explode span lists → candidate URL rows (G2).

    Emits ``(url, src_doc, src_offset, priority, depth)`` for every
    link/image/video span; discovery order is carried by
    ``(src_doc, src_offset)`` — the deterministic tie-break the frontier
    sorts on, so no global sequence counter (and no global shuffle) is
    needed.
    """
    spans = batch[spans_col]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    kind = flat.field("kind")
    is_ref = pc.is_in(kind, value_set=pa.array(["link", "image", "video"]))
    refs = flat.field("media_ref").filter(is_ref)
    offs = flat.field("offset").filter(is_ref)
    par = parents.filter(is_ref)
    src_doc = pc.take(batch[doc_col], par)
    if depth_col is not None:
        depth = pc.add(pc.take(batch[depth_col], par), 1)
    else:
        depth = pa.array(np.zeros(len(par), dtype=np.int32))
    # priority: media fetches lower priority (1) than page links (5)
    prio = pc.if_else(pc.equal(kind.filter(is_ref), "link"),
                      pa.scalar(5, type=pa.int32()), pa.scalar(1, type=pa.int32()))
    return pa.table({
        "url": refs,
        "priority": prio,
        "src_doc": src_doc,
        "src_offset": offs,
        "depth": pc.cast(depth, pa.int32()),
    })


def urls_from_seeds(seeds: pa.Table, offset0: int = 0) -> pa.Table:
    """Seed table → canonical URL rows with seed discovery order.

    ``offset0`` is the slice's base discovery index: parallel seeding
    splits the seed table into row ranges and each task passes its
    range start, so the global ``src_offset`` ordering (and therefore
    frontier ingestion order) is identical to the serial path."""
    n = seeds.num_rows
    t = pa.table({
        "url": seeds["url"],
        "priority": pc.cast(seeds["priority"], pa.int32()),
        "src_doc": pa.array([""] * n),
        "src_offset": pa.array(np.arange(offset0, offset0 + n,
                                         dtype=np.int32)),
        "depth": pa.array(np.zeros(n, dtype=np.int32)),
    })
    return canonicalize_batch(t)


def finish_url_schema(batch: pa.Table) -> pa.Table:
    """Project/cast to URL_SCHEMA column order."""
    cols = {f.name: pc.cast(batch[f.name], f.type) for f in URL_SCHEMA}
    return pa.table(cols, schema=URL_SCHEMA)
