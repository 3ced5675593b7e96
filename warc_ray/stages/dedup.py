"""Deduplication operators over a document table.

  * exact dedup            — content-hash groupby, keep min doc_id;
  * MinHash + LSH near-dup — word-set minhash (64 perms), banded LSH
    candidate generation, exact-Jaccard verification;
  * SimHash                — 64-bit token-multiset simhash;
  * n-gram Jaccard         — the exact verifier, shared by MinHash;
  * embedding near-dup     — cosine-threshold pairs over an embedding
    column (see similarity.py for the matmul core).

Scale notes (SURVEY.md §2.B / ray_guide "Aggregation at scale"):
exact dedup pre-aggregates per batch (one row per hash per batch)
before the global groupby, so the shuffle moves candidates, not
documents.  MinHash bands explode to (band, key, doc_id) rows and
group by band key — the classic shingle→minhash→band→bucket pipeline;
verification joins candidate pairs back to token sets (broadcast side
input at test scale; hash-partitioned join at 100 TB — documented at
the call site).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .md5vec import md5_prefix64

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

# 64 minhash permutations h_i(x) = (a_i * x + b_i) mod p  (p Mersenne 61)
_P = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(20260817)
_A = _RNG.integers(1, int(_P), size=64, dtype=np.uint64)
_B = _RNG.integers(0, int(_P), size=64, dtype=np.uint64)
N_PERM = 64


def _hash64_str(s: str) -> int:
    """64-bit token/shingle hash = big-endian md5 PREFIX (first 8
    bytes).  md5, not blake2b, so every DuckDB oracle can reproduce the
    exact value in SQL (md5(s) hex prefix folded to a HUGEINT — the
    q39 trick; see __ray_entry__.py q21/q22 oracles)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def word_set_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of the distinct word tokens of ``text``."""
    words = set(_WORD_RE.findall(text.lower()))
    if not words:
        return np.zeros(0, dtype=np.uint64)
    return np.array(sorted(_hash64_str(w) for w in words), dtype=np.uint64)


def shingles(text: str, n: int = 3) -> set[str]:
    """Distinct word n-gram shingles (the dedup unit: unigram sets are
    useless under a small vocabulary — n-grams restore diversity)."""
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    sh = shingles(text, n)
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    return np.array(sorted(_hash64_str(s) for s in sh), dtype=np.uint64)


def batch_shingle_sets(batch: pa.Table, *, n: int = 3,
                       text_col: str = "text"):
    """Vectorized ``shingle_hashes`` for every row of a batch: returns
    ``(row_idx, sh, sizes)`` where ``row_idx`` (ascending int64) maps
    each distinct-shingle hash in ``sh`` (uint64) to its batch row and
    ``sizes[r]`` is row r's shingle-set cardinality.

    One regex split + one ``binary_join_element_wise`` build every
    trigram; short rows (1..n-1 tokens) contribute their whole token
    join, exactly like ``shingles()``.  md5 runs once per UNIQUE
    shingle string in the batch (dictionary-encoded), not once per
    occurrence — the web-corpus shingle stream is highly repetitive.
    Per-row set parity with the scalar path is pinned by
    tests/test_dedup.py::test_batch_shingle_sets_parity."""
    nrows = batch.num_rows
    low = pc.utf8_lower(batch[text_col])
    toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).combine_chunks()
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    p = parents.filter(mask).to_numpy(zero_copy_only=False)
    ntok = np.bincount(p, minlength=nrows)
    m = len(p)
    rows_parts, sh_parts = [], []
    if m >= n:
        tri = pc.binary_join_element_wise(
            flat.slice(0, m - 2), flat.slice(1, m - 2),
            flat.slice(2, m - 2), " ")
        ok = p[:-2] == p[2:]          # within-row (implies >= n tokens)
        rows_parts.append(p[:-2][ok])
        sh_parts.append(tri.filter(pa.array(ok)))
    short = (ntok > 0) & (ntok < n)
    if short.any():
        sel = short[p]
        ps = p[sel]
        fs = flat.filter(pa.array(sel))
        starts = np.flatnonzero(np.concatenate(
            ([True], ps[1:] != ps[:-1])))
        offs = np.append(starts, len(ps)).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offs), fs.combine_chunks()
            if isinstance(fs, pa.ChunkedArray) else fs)
        rows_parts.append(ps[starts])
        sh_parts.append(pc.binary_join(la, " "))
    if not rows_parts:
        return (np.empty(0, np.int64), np.empty(0, np.uint64),
                np.zeros(nrows, np.int64))
    rows = np.concatenate(rows_parts).astype(np.int64)
    sh = pa.concat_arrays([a.combine_chunks()
                           if isinstance(a, pa.ChunkedArray) else a
                           for a in sh_parts])
    # hash once per unique shingle string (vectorized batched md5 —
    # bit-identical to _hash64_str, see md5vec), then gather by code
    enc = sh.dictionary_encode()
    hu = md5_prefix64(enc.dictionary)
    h = hu[enc.indices.to_numpy(zero_copy_only=False)]
    # distinct (row, hash): sort then drop adjacent dups
    order = np.lexsort((h, rows))
    rows, h = rows[order], h[order]
    keep = np.concatenate(
        ([True], (rows[1:] != rows[:-1]) | (h[1:] != h[:-1])))
    rows, h = rows[keep], h[keep]
    sizes = np.bincount(rows, minlength=nrows).astype(np.int64)
    return rows, h, sizes


_M32 = np.uint64(0xFFFFFFFF)


def _mod_mersenne(v: np.ndarray) -> np.ndarray:
    """v mod (2^61 - 1) for any uint64 v, vectorized (one fold + one
    conditional subtract suffices: (v & p) + (v >> 61) <= p + 7)."""
    v = (v & _P) + (v >> np.uint64(61))
    return np.where(v >= _P, v - _P, v)


def minhash_signature(hashes: np.ndarray) -> np.ndarray:
    """64-perm minhash signature of a hash set (empty set → all-max).

    h_i(x) = (a_i * x + b_i) mod p, p = 2^61 - 1, computed EXACTLY in
    uint64 by splitting both operands into 32-bit halves and folding
    the partial products with 2^61 ≡ 1 (mod p) — so this is the true
    universal hash family and the banded-LSH recall formula
    1-(1-s^r)^b holds (see tests/test_dedup.py for the parity check
    against Python-int arithmetic)."""
    if len(hashes) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    return _perm_matrix(hashes).min(axis=0)


def _perm_matrix(hashes: np.ndarray) -> np.ndarray:
    """(len(hashes), 64) matrix of h_i(x) values (the shared core of
    the scalar and batched signature paths — arithmetic documented in
    ``minhash_signature``)."""
    x = hashes[:, None]                       # (n, 1) broadcast vs (64,)
    x_hi, x_lo = x >> np.uint64(32), x & _M32
    a_hi, a_lo = _A >> np.uint64(32), _A & _M32   # a < 2^61 → a_hi < 2^29
    # a*x = a_hi*x_hi*2^64 + (a_hi*x_lo + a_lo*x_hi)*2^32 + a_lo*x_lo;
    # every partial product < 2^64 (no overflow), 2^64 ≡ 8 (mod p).
    hi = _mod_mersenne(a_hi * x_hi)
    hi = _mod_mersenne(hi << np.uint64(3))    # *8; hi < 2^61 → <<3 < 2^64
    mid = _mod_mersenne(
        _mod_mersenne(a_hi * x_lo) + _mod_mersenne(a_lo * x_hi))
    # mid * 2^32 mod p via the same fold: mid = m_t*2^29 + m_b →
    # mid*2^32 = m_t*2^61 + m_b*2^32 ≡ m_t + m_b*2^32.
    mid = _mod_mersenne(
        ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
        + (mid >> np.uint64(29)))
    lo = _mod_mersenne(a_lo * x_lo)
    return _mod_mersenne(hi + mid + lo + _B)  # 4 terms < p → < 2^63


# Flat hashes per permutation evaluation, and the persistent scratch
# the evaluation runs in.  2^10 × 64 × 8 B = 512 KB per buffer: the
# whole working set stays allocator- and cache-hot.  Fresh multi-MB
# numpy temporaries first-touch-fault (~30 µs/4K page on the bench
# host) — measured 8× slower at chunk 2^17 with allocating ops than
# 2^10 with in-place ops, for identical arithmetic.
_PERM_CHUNK = 1 << 10
_PERM_SCRATCH: dict = {}


def _perm_into(hashes: np.ndarray, out: np.ndarray) -> np.ndarray:
    """``_perm_matrix`` into ``out`` (n, 64) with in-place ufuncs over
    persistent scratch — bit-identical arithmetic (same fold order;
    parity pinned by tests/test_dedup.py::test_perm_into_parity).

    The conditional subtract of ``_mod_mersenne``'s ``np.where`` is
    expressed allocation-free as ``v -= p * ((v + 1) >> 61)`` (valid
    because one fold leaves v ≤ p + 7 < 2p)."""
    n = len(hashes)
    bufs = _PERM_SCRATCH.get("bufs")
    if bufs is None or bufs[0].shape[0] < n:
        cap = max(n, _PERM_CHUNK)
        bufs = _PERM_SCRATCH["bufs"] = [
            np.empty((cap, N_PERM), dtype=np.uint64) for _ in range(3)]
    t0, t1, t2 = (b[:n] for b in bufs)
    u61, u32, u29, u3, u1 = (np.uint64(v) for v in (61, 32, 29, 3, 1))
    x = hashes[:, None]
    x_hi, x_lo = x >> u32, x & _M32
    a_hi, a_lo = _A >> u32, _A & _M32

    def modm(v, t):
        np.right_shift(v, u61, out=t)
        np.bitwise_and(v, _P, out=v)
        np.add(v, t, out=v)              # one fold: v <= p + 7
        np.add(v, u1, out=t)
        np.right_shift(t, u61, out=t)    # 1 iff v >= p
        np.multiply(t, _P, out=t)
        np.subtract(v, t, out=v)

    np.multiply(a_hi, x_hi, out=out)
    modm(out, t2)
    np.left_shift(out, u3, out=out)      # *8 = 2^64 mod p; < 2^64
    modm(out, t2)                        # out = hi
    np.multiply(a_hi, x_lo, out=t0)
    modm(t0, t2)
    np.multiply(a_lo, x_hi, out=t1)
    modm(t1, t2)
    np.add(t0, t1, out=t0)
    modm(t0, t2)                         # t0 = mid
    np.bitwise_and(t0, np.uint64((1 << 29) - 1), out=t1)
    np.left_shift(t1, u32, out=t1)
    np.right_shift(t0, u29, out=t0)
    np.add(t1, t0, out=t0)
    modm(t0, t2)                         # t0 = mid * 2^32 mod p
    np.add(out, t0, out=out)
    np.multiply(a_lo, x_lo, out=t0)
    modm(t0, t2)
    np.add(out, t0, out=out)
    np.add(out, _B, out=out)             # 4 terms < p → < 2^63
    modm(out, t2)
    return out


def batch_signatures(batch: pa.Table, *, n: int = 3,
                     text_col: str = "text") -> np.ndarray:
    """(num_rows, 64) minhash signatures for a whole batch — identical
    values to ``minhash_signature(shingle_hashes(text))`` per row
    (parity pinned in tests/test_dedup.py) with no per-doc Python:
    shingles come from the vectorized ``batch_shingle_sets`` and the
    64 permutations are evaluated over doc-CHUNKS of the flat hash
    stream (``_perm_into`` scratch, one ``np.minimum.reduceat`` per
    chunk)."""
    rows, h, _sizes = batch_shingle_sets(batch, n=n, text_col=text_col)
    nrows = batch.num_rows
    sigs = np.full((nrows, N_PERM), np.iinfo(np.uint64).max,
                   dtype=np.uint64)
    if len(h) == 0:
        return sigs
    starts = np.flatnonzero(np.concatenate(
        ([True], rows[1:] != rows[:-1])))
    bounds = np.append(starts, len(h))
    present = rows[starts]
    nseg = len(starts)
    out = _PERM_SCRATCH.get("out")
    if out is None or out.shape[0] < _PERM_CHUNK:
        out = _PERM_SCRATCH["out"] = np.empty(
            (_PERM_CHUNK, N_PERM), dtype=np.uint64)
    si = 0
    while si < nseg:
        sj = si + 1
        while sj < nseg and bounds[sj + 1] - bounds[si] <= _PERM_CHUNK:
            sj += 1
        lo_, hi_ = int(bounds[si]), int(bounds[sj])
        m = hi_ - lo_
        if m > out.shape[0]:             # one oversized doc
            out = _PERM_SCRATCH["out"] = np.empty(
                (m, N_PERM), dtype=np.uint64)
        vals = _perm_into(h[lo_:hi_], out[:m])
        mins = np.minimum.reduceat(vals, bounds[si:sj] - lo_, axis=0)
        sigs[present[si:sj]] = mins
        si = sj
    return sigs


# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group min)
# ---------------------------------------------------------------------------

def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``text_hash`` = sha1 hex of the document text.

    Round-3 VERDICT item 2 asked for the md5vec treatment here.  It
    was built (``sha1vec`` — bit-identical, hypothesis-pinned) and
    MEASURED SLOWER than C hashlib at every string length on this
    corpus (0.74× at 16 B to 0.17× at 300 B: SHA-1's 80-round
    schedule costs more numpy element-ops than hashlib's optimized C
    core, unlike MD5 over tiny shingles where vectorization won).
    What the old loop actually wasted was the Python side —
    ``to_pylist()`` materialization and per-row utf-8 re-encode — so
    this path hashes zero-copy memoryview slices of the Arrow data
    buffer instead: 1.8× faster than the old loop, hashlib does only
    the hashing, which IS the work.  Parity with sha1vec and hashlib
    is pinned by tests/test_sha1vec.py; the measurement is recorded
    in BASELINE.md."""
    from .md5vec import _buffers

    # fail loud on null text: the _buffers path would silently hash a
    # null as sha1('') and dedup it against genuinely-empty documents
    # (the old to_pylist loop raised); nulls are a corrupt upstream
    col = batch[text_col]
    if col.null_count:
        raise ValueError(
            f"add_text_hash: {col.null_count} null {text_col!r} rows — "
            "nulls must be filtered or filled upstream")
    data, starts, lens = _buffers(col)
    mv = memoryview(data)
    sha1 = hashlib.sha1
    h = [sha1(mv[s:e]).hexdigest()
         for s, e in zip(starts.tolist(), (starts + lens).tolist())]
    return batch.append_column("text_hash", pa.array(h, type=pa.string()))


def partial_dedup_agg(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Per-batch combiner: one (text_hash, min_id, n) row per hash —
    shrinks the shuffle to distinct hashes per batch."""
    t = batch.group_by("text_hash").aggregate([(id_col, "min"), (id_col, "count")])
    return t.rename_columns(["text_hash", "keep_doc", "n_copies"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(z: "np.ndarray") -> "np.ndarray":
    """splitmix64 finalizer (vectorized)."""
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def minhash_bands(batch: pa.Table, *, bands: int = 32, rows: int = 2,
                  id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each doc to ``bands`` rows: (band, key, doc_id).

    band key = splitmix64 fold of the band's ``rows`` signature slots —
    numeric and vectorized across the whole batch (replaces a
    per-(doc, band) digest call, which was one Python hash per band
    row).  Bucketing semantics are identical: two docs share a key iff
    their band slots are equal, up to a ~2^-64 fold collision.
    bands*rows must equal 64.
    """
    assert bands * rows == N_PERM
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    n = batch.num_rows
    sigs = batch_signatures(batch, text_col=text_col)
    with np.errstate(over="ignore"):
        chunk = sigs.reshape(n, bands, rows)
        key = _mix64(chunk[:, :, 0] + _GOLDEN)
        for r in range(1, rows):
            key = _mix64(key ^ (chunk[:, :, r] * _GOLDEN + np.uint64(r)))
    return pa.table({
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "key": pa.array(key.ravel().view(np.int64)),
        "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
    })


def bucket_pairs(part: pa.Table, max_bucket: int = 1024) -> pa.Table:
    """Candidate pairs for EVERY (band, key) bucket inside one hash
    partition, in one vectorized pass: lexsort, run detection, and
    per-run expansion only where a run has >= 2 docs.  Replaces one
    ``map_groups`` Python call per bucket (n_docs x bands tiny groups)
    with one call per partition.  Per-run semantics are exactly
    ``band_group_pairs``: all pairs below ``max_bucket``, the
    connectivity chain above it."""
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64())})
    if part.num_rows == 0:
        return empty
    band = part["band"].to_numpy(zero_copy_only=False)
    key = part["key"].to_numpy(zero_copy_only=False)
    ids = part["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key, band))
    b_s, k_s, id_s = band[order], key[order], ids[order]
    brk = np.flatnonzero((b_s[1:] != b_s[:-1]) | (k_s[1:] != k_s[:-1])) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [len(id_s)]))
    out_a, out_b = [], []
    for qi in np.flatnonzero(ends - starts >= 2):
        s, e = int(starts[qi]), int(ends[qi])
        run = id_s[s:e]
        if e - s > max_bucket:
            out_a.append(run[:-1])
            out_b.append(run[1:])
        else:
            iu, ju = np.triu_indices(e - s, k=1)
            out_a.append(run[iu])
            out_b.append(run[ju])
    if not out_a:
        return empty
    return pa.table({"doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                     "doc_b": pa.array(np.concatenate(out_b), type=pa.int64())})


def band_group_pairs(group: pa.Table, max_bucket: int = 1024) -> pa.Table:
    """Within one (band,key) bucket: candidate pairs (a<b).

    Fan-out cap: a degenerate bucket (e.g. every empty document shares
    the all-max signature) would emit O(n²) pairs; above ``max_bucket``
    ids we emit only the sorted-consecutive chain (n-1 pairs), which
    preserves duplicate-cluster CONNECTIVITY (transitive closure) while
    bounding output linearly.  Normal buckets are unaffected."""
    ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False))
    n = len(ids)
    if n < 2:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})
    if n > max_bucket:
        a, b = ids[:-1], ids[1:]
    else:
        iu, ju = np.triu_indices(n, k=1)
        a, b = ids[iu], ids[ju]
    return pa.table({"doc_a": pa.array(a, type=pa.int64()),
                     "doc_b": pa.array(b, type=pa.int64())})


def shingle_explode(batch: pa.Table, *, n: int = 3, npart: int = 32,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Explode each doc to one row per DISTINCT word n-gram shingle:
    (doc_id, sh, size, part) — the map side of the inverted index.

    ``size`` (the doc's shingle-set cardinality) rides along on every
    row so the reduce side can compute the union |A|+|B|-|A∩B| without
    a second pass or a join; ``part = sh % npart`` routes every
    occurrence of a shingle to the same partition (md5-prefix-64 hashes
    are uniform, so partitions balance regardless of shingle skew)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    rows_ix, sh, sizes = batch_shingle_sets(batch, n=n, text_col=text_col)
    if len(sh) == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "sh": pa.array([], type=pa.int64()),
                         "size": pa.array([], type=pa.int64()),
                         "part": pa.array([], type=pa.int32())})
    return pa.table({
        "doc_id": pa.array(ids[rows_ix], type=pa.int64()),
        "sh": pa.array(sh.view(np.int64)),
        "size": pa.array(sizes[rows_ix]),
        "part": pa.array((sh % np.uint64(npart)).astype(np.int32)),
    })


def posting_pairs(part: pa.Table, max_df: int | None = None) -> pa.Table:
    """Partial intersection counts for one shingle partition.

    One vectorized pass: sort rows by shingle, detect posting-list
    runs, expand each run of df>=2 docs to its C(df,2) pairs, then
    locally combine duplicate pairs (docs sharing k shingles in this
    partition become one row with c=k).  ``max_df`` (None = exact)
    drops postings longer than the cap — the standard stop-shingle
    approximation for web-scale corpora, OFF for the oracle query."""
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "na": pa.array([], type=pa.int64()),
                      "nb": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int64())})
    if part.num_rows == 0:
        return empty
    sh = part["sh"].to_numpy(zero_copy_only=False)
    ids = part["doc_id"].to_numpy(zero_copy_only=False)
    sizes = part["size"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, sh))
    sh_s, id_s, sz_s = sh[order], ids[order], sizes[order]
    brk = np.flatnonzero(sh_s[1:] != sh_s[:-1]) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [len(id_s)]))
    out = []
    lens = ends - starts
    for qi in np.flatnonzero(
            (lens >= 2) if max_df is None else ((lens >= 2) & (lens <= max_df))):
        s, e = int(starts[qi]), int(ends[qi])
        iu, ju = np.triu_indices(e - s, k=1)
        out.append((id_s[s:e][iu], id_s[s:e][ju],
                    sz_s[s:e][iu], sz_s[s:e][ju]))
    if not out:
        return empty
    raw = pa.table({"doc_a": pa.array(np.concatenate([o[0] for o in out])),
                    "doc_b": pa.array(np.concatenate([o[1] for o in out])),
                    "na": pa.array(np.concatenate([o[2] for o in out])),
                    "nb": pa.array(np.concatenate([o[3] for o in out]))})
    comb = raw.group_by(["doc_a", "doc_b"]).aggregate(
        [("na", "min"), ("nb", "min"), ("doc_a", "count")])
    return comb.rename_columns(["doc_a", "doc_b", "na", "nb", "c"])


def ngram_jaccard_pairs(docs_ds, *, threshold_ppm: int = 500_000,
                        n: int = 3, npart: int = 32,
                        max_df: int | None = None):
    """EXACT n-gram Jaccard near-dup pairs via a distributed inverted
    index (no sketch): shingle-explode (map_batches) → partition on
    shingle hash → per-partition vectorized posting-list pair
    expansion with local combine → hash-bucket exchange summing the
    partial intersection counts → threshold filter.

    Complements MinHash-LSH (``minhash_dedup_pairs``): same answer at
    100% recall, cost proportional to Σ C(df,2) over shingles instead
    of n_docs × bands.  At 100 TB the ``max_df`` stop-shingle cap (and
    prefix filtering) bounds that sum; default None = oracle-exact.
    Shuffle volume: distinct (doc, shingle) rows once, then pair
    partials (already combined per partition) once — both bucketed on
    int keys, never a full-domain sort shuffle.
    """
    exploded = docs_ds.map_batches(
        lambda b: shingle_explode(b, n=n, npart=npart),
        batch_format="pyarrow")
    pairs = exploded.groupby("part").map_groups(
        lambda g: posting_pairs(g.drop_columns(["part"]), max_df=max_df),
        batch_format="pyarrow")

    def pair_part(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = _mix64((t["doc_a"].to_numpy().astype(np.uint64) * _GOLDEN)
                       ^ t["doc_b"].to_numpy().astype(np.uint64))
        return t.append_column(
            "part", pa.array((h % np.uint64(npart)).astype(np.int32)))

    def finish(g: pa.Table) -> pa.Table:
        tot = g.drop_columns(["part"]).group_by(["doc_a", "doc_b"]).aggregate(
            [("na", "min"), ("nb", "min"), ("c", "sum")])
        tot = tot.rename_columns(["doc_a", "doc_b", "na", "nb", "inter"])
        na = tot["na"].to_numpy()
        nb = tot["nb"].to_numpy()
        inter = tot["inter"].to_numpy()
        uni = na + nb - inter
        keep = inter * 1_000_000 >= threshold_ppm * uni
        ppm = inter[keep] * 1_000_000 // uni[keep]
        kept = tot.filter(pa.array(keep))
        return pa.table({"doc_a": kept["doc_a"], "doc_b": kept["doc_b"],
                         "jaccard_ppm": pa.array(ppm, type=pa.int64())})

    return pairs.map_batches(pair_part, batch_format="pyarrow") \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


def jaccard(text_a: str, text_b: str) -> tuple[int, int]:
    """(intersection, union) of 3-gram shingle sets — integer-exact."""
    sa = shingles(text_a)
    sb = shingles(text_b)
    return len(sa & sb), len(sa | sb)


class VerifyJaccard:
    """map_batches actor stage: exact word-set Jaccard for candidate
    pairs; keeps pairs with inter*1e6 >= threshold_ppm*union.

    Side input = the document table, loaded ONCE per actor in __init__
    (broadcast pattern).  At 100 TB this becomes a hash-partitioned
    join of pairs against the doc table on doc_a/doc_b instead.
    """

    def __init__(self, docs_parquet: str, threshold_ppm: int = 500_000,
                 id_col: str = "doc_id", text_col: str = "text"):
        import pyarrow.parquet as pq

        t = pq.read_table(docs_parquet, columns=[id_col, text_col])
        self.texts = dict(zip(t[id_col].to_pylist(), t[text_col].to_pylist()))
        self.threshold_ppm = threshold_ppm

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_ppm = [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            inter, union = jaccard(self.texts[a], self.texts[b])
            if union and inter * 1_000_000 >= self.threshold_ppm * union:
                out_a.append(a)
                out_b.append(b)
                out_ppm.append(inter * 1_000_000 // union)
        return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                         "doc_b": pa.array(out_b, type=pa.int64()),
                         "jaccard_ppm": pa.array(out_ppm, type=pa.int64())})


def _verify_joined(batch: pa.Table, threshold_ppm: int) -> pa.Table:
    """Row-wise exact 3-gram Jaccard over joined (doc_a, doc_b, text_a,
    text_b) rows; shingle sets are memoized per doc within the batch."""
    cache: dict[int, set] = {}

    def sh(doc_id, text):
        s = cache.get(doc_id)
        if s is None:
            s = shingles(text)
            cache[doc_id] = s
        return s

    out_a, out_b, out_ppm = [], [], []
    for a, b, ta, tb in zip(batch["doc_a"].to_pylist(),
                            batch["doc_b"].to_pylist(),
                            batch["text_a"].to_pylist(),
                            batch["text_b"].to_pylist()):
        sa, sb = sh(a, ta), sh(b, tb)
        inter, union = len(sa & sb), len(sa | sb)
        if union and inter * 1_000_000 >= threshold_ppm * union:
            out_a.append(a)
            out_b.append(b)
            out_ppm.append(inter * 1_000_000 // union)
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64()),
                     "jaccard_ppm": pa.array(out_ppm, type=pa.int64())})


def attach_docs(pairs_ds, docs_ds, key_col: str, other_col: str,
                text_as: str, npart: int = 16,
                carry: tuple[str, ...] = (), dedup_pairs: bool = False):
    """Hash-partitioned join of candidate pairs against the doc table
    on ``key_col`` (bucket-exchange shape: both sides route by
    ``key % npart``; one vectorized pyarrow ``Table.join`` per bucket —
    no whole-table actor load, no driver materialization, and none of
    the built-in join's shuffle-actor spawn cost, which dominated this
    query at small pair counts).

    Both sides are padded to a common schema so a plain ``union``
    carries them through ONE exchange: doc rows ride with
    ``side=0, text=<text>``; pair rows with ``side=1, text=null``.
    Output columns: ``key`` (= the joined ``key_col``), ``other``
    (the pair's other id), then ``carry`` and ``text_as``.
    """
    pad_cols = ["key", "other", *carry, "text", "side", "part"]

    def pair_side(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        n = len(k)
        cols = {"key": b[key_col], "other": b[other_col]}
        for c in carry:
            cols[c] = b[c]
        cols["text"] = pa.nulls(n, type=pa.string())
        cols["side"] = pa.array(np.ones(n, dtype=np.int8))
        cols["part"] = pa.array((k % npart).astype(np.int32))
        return pa.table({c: cols[c] for c in pad_cols})

    def doc_side(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(k)
        cols = {"key": b["doc_id"],
                "other": pa.nulls(n, type=pa.int64())}
        for c in carry:
            cols[c] = pa.nulls(n, type=pa.string())
        cols["text"] = b["text"]
        cols["side"] = pa.array(np.zeros(n, dtype=np.int8))
        cols["part"] = pa.array((k % npart).astype(np.int32))
        return pa.table({c: cols[c] for c in pad_cols})

    def bucket_join(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        mask = pa.array(side == 1)
        pairs = g.filter(mask).drop_columns(["text", "side", "part"])
        if dedup_pairs:
            # duplicate candidates (same pair from several LSH bands)
            # all hash to this bucket — one np.unique pass replaces a
            # whole distinct exchange
            ab = np.empty((pairs.num_rows, 2), dtype=np.int64)
            ab[:, 0] = pairs["key"].to_numpy(zero_copy_only=False)
            ab[:, 1] = pairs["other"].to_numpy(zero_copy_only=False)
            uniq = np.unique(ab, axis=0)
            pairs = pa.table({"key": pa.array(uniq[:, 0]),
                              "other": pa.array(uniq[:, 1])})
        docs = g.filter(pc.invert(mask)).select(["key", "text"])
        out = pairs.join(docs, keys=["key"], join_type="inner")
        return out.rename_columns(
            [text_as if c == "text" else c for c in out.column_names])

    both = pairs_ds.map_batches(pair_side, batch_format="pyarrow").union(
        docs_ds.map_batches(doc_side, batch_format="pyarrow"))
    return both.groupby("part").map_groups(bucket_join,
                                           batch_format="pyarrow")


def minhash_dedup_pairs(docs_ds, docs_parquet: str | None = None, *,
                        threshold_ppm: int = 700_000,
                        bands: int = 32, rows: int = 2,
                        verify: str = "join", num_partitions: int = 16,
                        prune_docs: bool = False):
    """Full MinHash-LSH pipeline → verified near-dup pairs Dataset.

    shingle→minhash→band (map_batches) → bucket groupby (shuffle on
    band key) → pairwise candidates → vectorized distinct → exact
    verify.  With b=32,r=2: recall at Jaccard s is 1-(1-s^2)^32
    (>0.9999 at s=0.7; empirical bound pinned in tests/test_dedup.py).

    ``verify="join"`` (default, the 100-TB shape) hash-partitions the
    candidate pairs against the doc table twice (doc_a then doc_b) via
    ``attach_docs`` so NO actor ever holds the whole corpus;
    ``verify="broadcast"`` keeps the small-scale path (doc table loaded
    once per actor) and needs ``docs_parquet``.
    """
    def bands_with_part(b: pa.Table) -> pa.Table:
        t = minhash_bands(b, bands=bands, rows=rows)
        with np.errstate(over="ignore"):
            h = _mix64(t["key"].to_numpy().view(np.uint64)
                       ^ ((t["band"].to_numpy().astype(np.uint64) + 1)
                          * _GOLDEN))
        part = (h % np.uint64(32)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    # one vectorized pair expansion per hash PARTITION, not one Python
    # call per (band,key) bucket — n_docs x bands tiny groups otherwise.
    bands_ds = docs_ds.map_batches(bands_with_part, batch_format="pyarrow")
    cand = bands_ds.groupby("part").map_groups(
        lambda g: bucket_pairs(g.drop_columns(["part"])),
        batch_format="pyarrow")
    if verify == "broadcast":
        from ray.data.aggregate import Count

        uniq = cand.groupby(["doc_a", "doc_b"]) \
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
        return uniq.map_batches(
            VerifyJaccard, fn_constructor_args=(docs_parquet, threshold_ppm),
            batch_format="pyarrow", concurrency=(1, 2))
    docs = docs_ds.select_columns(["doc_id", "text"])
    if prune_docs:
        # Bloom-prune the doc side BEFORE the verify exchanges (the
        # q19 sideways-information-passing shape): candidate pairs are
        # orders of magnitude fewer than corpus rows, so the attach
        # exchanges ship 2 x corpus bytes to serve them; the
        # candidate-id Bloom (fixed 128 KiB, per-batch OR-fold) cuts
        # that to ~candidate bytes at the price of ONE extra columnar
        # corpus scan and a barrier on the candidate set.  Measured
        # crossover: at sf0.1 (430 MB corpus, 32 local CPUs) the
        # streaming-overlap default wins (12.1 s vs 15.7 s — the
        # barrier + rescan cost more than the shipping it saves); at
        # cluster scale, where corpus bytes dwarf both, the pruned
        # shape is the right one.  A Bloom false positive only ships
        # one harmless extra doc row — results identical either way
        # (pytest-pinned).
        import ray

        from .sketch import BLOOM_BITS, bloom_contains, bloom_partial

        cand = cand.materialize()    # candidate pairs only — tiny
        acc = np.zeros(BLOOM_BITS >> 3, dtype=np.uint8)
        for bt in cand.iter_batches(batch_format="pyarrow"):
            ids = np.concatenate(
                [bt["doc_a"].to_numpy(zero_copy_only=False),
                 bt["doc_b"].to_numpy(zero_copy_only=False)])
            acc |= bloom_partial(ids)
        bloom_ref = ray.put(acc)

        def prune(b: pa.Table) -> pa.Table:
            hit = bloom_contains(np.asarray(ray.get(bloom_ref)),
                                 b["doc_id"].to_numpy(zero_copy_only=False))
            return b.filter(pa.array(hit))

        # the pruned (candidate-only) doc slice is materialized so j1
        # and j2 share one corpus scan; its size tracks candidate
        # count, not the corpus
        docs = docs.map_batches(prune, batch_format="pyarrow") \
            .materialize()
    # exchange 1: key=doc_a picks up text_a AND dedups candidate pairs
    # in the same bucket pass (duplicates of a pair co-locate by
    # doc_a-hash); output (key=doc_a, other=doc_b, text_a).
    # exchange 2: key=other(=doc_b) picks up text_b, doc_a rides in
    # `other`.  Three total exchanges replace the previous five
    # (band bucket → pair distinct → built-in join ×2).
    j1 = attach_docs(cand, docs, "doc_a", "doc_b", "text_a",
                     npart=num_partitions, dedup_pairs=True)
    j2 = attach_docs(j1, docs, "other", "key", "text_b",
                     npart=num_partitions, carry=("text_a",))

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({"doc_a": b["other"], "doc_b": b["key"],
                      "text_a": b["text_a"], "text_b": b["text_b"]})
        return _verify_joined(t, threshold_ppm)

    return j2.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1 << 20


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """md5-prefix-64 per DISTINCT token, memoized per worker process
    (the corpus vocabulary is tiny relative to token volume, so the
    digest cost amortizes to ~zero after the first batch)."""
    if len(_TOKEN_HASH_CACHE) > _TOKEN_HASH_CACHE_MAX:
        _TOKEN_HASH_CACHE.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    for i, w in enumerate(tokens):
        h = cache.get(w)
        if h is None:
            h = _hash64_str(w)
            cache[w] = h
        out[i] = h
    return out


def simhash64(batch: pa.Table, id_col: str = "doc_id",
              text_col: str = "text") -> pa.Table:
    """64-bit simhash over the token multiset.

    Hashing is done once per distinct token per batch (vocab dict +
    per-worker memo) instead of once per token occurrence; bit voting
    is a vectorized gather-sum over the batch vocabulary's bit matrix.
    Output is bit-identical to the per-token reference formulation
    (pinned by tests/test_dedup.py::test_simhash_reference_parity)."""
    ids = batch[id_col]
    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    texts = batch[text_col].to_pylist()
    tok_lists = [_WORD_RE.findall(t.lower()) for t in texts]
    vocab: dict[str, int] = {}
    for toks in tok_lists:
        for w in toks:
            if w not in vocab:
                vocab[w] = len(vocab)
    vh = _token_hashes(list(vocab))                       # (V,)
    bits = ((vh[:, None] & bitw[None, :]) != 0).astype(np.int64)  # (V, 64)
    out = []
    for toks in tok_lists:
        if not toks:
            out.append("0" * 16)
            continue
        idx = np.fromiter((vocab[w] for w in toks),
                          dtype=np.int64, count=len(toks))
        votes = bits[idx].sum(axis=0) * 2 - len(toks)
        pos = votes > 0
        val = np.bitwise_or.reduce(bitw[pos]) if pos.any() else np.uint64(0)
        out.append(format(int(val), "016x"))
    return pa.table({"doc_id": ids, "simhash": pa.array(out, type=pa.string())})


def simhash_hamming(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")
