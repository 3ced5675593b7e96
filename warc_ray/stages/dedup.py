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

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

# 64 minhash permutations h_i(x) = (a_i * x + b_i) mod p  (p Mersenne 61)
_P = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(20260817)
_A = _RNG.integers(1, int(_P), size=64, dtype=np.uint64)
_B = _RNG.integers(0, int(_P), size=64, dtype=np.uint64)
N_PERM = 64


def word_set_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of the distinct word tokens of ``text``."""
    words = set(_WORD_RE.findall(text.lower()))
    if not words:
        return np.zeros(0, dtype=np.uint64)
    return np.array(
        sorted(int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
               for w in words),
        dtype=np.uint64)


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
    return np.array(
        sorted(int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
               for s in sh),
        dtype=np.uint64)


def minhash_signature(hashes: np.ndarray) -> np.ndarray:
    """64-perm minhash signature of a hash set (empty set → all-max)."""
    if len(hashes) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (a*x+b) mod p per permutation; broadcast (n_hashes, 64)
        hx = (hashes[:, None] * _A[None, :] + _B[None, :]) % _P
    return hx.min(axis=0)


# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group min)
# ---------------------------------------------------------------------------

def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    h = [hashlib.sha1(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("text_hash", pa.array(h, type=pa.string()))


def partial_dedup_agg(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Per-batch combiner: one (text_hash, min_id, n) row per hash —
    shrinks the shuffle to distinct hashes per batch."""
    t = batch.group_by("text_hash").aggregate([(id_col, "min"), (id_col, "count")])
    return t.rename_columns(["text_hash", "keep_doc", "n_copies"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_bands(batch: pa.Table, *, bands: int = 32, rows: int = 2,
                  id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each doc to ``bands`` rows: (band, key, doc_id).

    band key = blake2b of the band's ``rows`` signature slots; candidate
    pairs are docs sharing any (band, key).  bands*rows must equal 64.
    """
    assert bands * rows == N_PERM
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_band, out_key, out_id = [], [], []
    for did, text in zip(ids, texts):
        sig = minhash_signature(shingle_hashes(text))
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_band.append(b)
            out_key.append(key)
            out_id.append(did)
    return pa.table({
        "band": pa.array(out_band, type=pa.int32()),
        "key": pa.array(out_key, type=pa.string()),
        "doc_id": pa.array(out_id, type=pa.int64()),
    })


def band_group_pairs(group: pa.Table) -> pa.Table:
    """Within one (band,key) bucket: all candidate pairs (a<b)."""
    ids = sorted(group["doc_id"].to_pylist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"doc_a": pa.array(a, type=pa.int64()),
                     "doc_b": pa.array(b, type=pa.int64())})


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


def minhash_dedup_pairs(docs_ds, docs_parquet: str, *,
                        threshold_ppm: int = 700_000,
                        bands: int = 32, rows: int = 2):
    """Full MinHash-LSH pipeline → verified near-dup pairs Dataset.

    shingle→minhash→band (map_batches) → bucket groupby (shuffle on
    band key) → pairwise candidates → distinct → exact verify.
    With b=32,r=2: recall at Jaccard s is 1-(1-s^2)^32 (>0.9999 at s=0.7).
    """
    bands_ds = docs_ds.map_batches(
        lambda b: minhash_bands(b, bands=bands, rows=rows),
        batch_format="pyarrow")
    pairs = bands_ds.groupby(["band", "key"]).map_groups(
        band_group_pairs, batch_format="pyarrow")
    uniq = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
    return uniq.map_batches(
        VerifyJaccard, fn_constructor_args=(docs_parquet, threshold_ppm),
        batch_format="pyarrow", concurrency=2)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(batch: pa.Table, id_col: str = "doc_id",
              text_col: str = "text") -> pa.Table:
    """64-bit simhash over the token multiset (vectorized bit voting)."""
    ids = batch[id_col]
    out = []
    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for text in batch[text_col].to_pylist():
        toks = _WORD_RE.findall(text.lower())
        if not toks:
            out.append("0" * 16)
            continue
        hs = np.array([int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                       for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] & bitw[None, :]) != 0)
        votes = bits.sum(axis=0) * 2 - len(hs)
        val = np.uint64(0)
        for j in np.flatnonzero(votes > 0):
            val |= bitw[j]
        out.append(format(int(val), "016x"))
    return pa.table({"doc_id": ids, "simhash": pa.array(out, type=pa.string())})


def simhash_hamming(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")
