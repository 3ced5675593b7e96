"""Batched numpy SHA-1 (stages/sha1vec) and the production
``dedup.add_text_hash`` path — bit-parity vs hashlib.

sha1vec exists as the vectorized cross-check for the exact-dedup text
hash (the production path hashes Arrow-buffer memoryviews with
hashlib — measured faster; see the module docstrings).  These tests
pin THREE-way bit-identity (hashlib == sha1vec == add_text_hash)
across the padding boundaries (55/56/64 bytes), multi-block messages,
nulls, slices, chunked arrays, and a hypothesis sweep.  No Ray needed
— pure numpy/Arrow.
"""

import hashlib
import random

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from warc_ray.stages.dedup import add_text_hash
from warc_ray.stages.sha1vec import (sha1_hex, sha1_prefix64, sha1_raw,
                                     sha1_state)

EDGE = ["", "a", "abc", "hello world", "x" * 54, "x" * 55, "x" * 56,
        "x" * 63, "x" * 64, "x" * 65, "x" * 119, "x" * 120, "x" * 128,
        "x" * 1000, "\x00\x01\x7f", "héllo ünïcode ✓"]


def _ref_hex(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


def test_hex_and_raw_match_hashlib_edges():
    hx = sha1_hex(pa.array(EDGE)).to_pylist()
    raw = sha1_raw(pa.array(EDGE))
    for s, h, r in zip(EDGE, hx, raw):
        assert h == _ref_hex(s)
        assert bytes(r) == hashlib.sha1(s.encode()).digest()


def test_prefix64_matches_hashlib():
    got = sha1_prefix64(pa.array(EDGE))
    exp = np.array([int.from_bytes(hashlib.sha1(s.encode()).digest()[:8],
                                   "big") for s in EDGE], dtype=np.uint64)
    assert (got == exp).all()


def test_hex_matches_hashlib_random():
    rng = random.Random(7)
    cases = ["".join(rng.choices("abcdef word\n\t0123",
                                 k=rng.randint(0, 400)))
             for _ in range(1000)]
    got = sha1_hex(pa.array(cases)).to_pylist()
    assert got == [_ref_hex(s) for s in cases]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1,
                max_size=30))
def test_hypothesis_binary_parity(payloads):
    got = sha1_hex(pa.array(payloads, type=pa.binary())).to_pylist()
    assert got == [hashlib.sha1(b).hexdigest() for b in payloads]


def test_null_hashes_as_empty_and_slices():
    arr = pa.array(["aa", None, "", "bb", "cc"])
    h = sha1_hex(arr).to_pylist()
    assert h[1] == h[2] == _ref_hex("")
    sl = sha1_hex(arr.slice(3, 2)).to_pylist()
    assert sl == h[3:]
    ch = pa.chunked_array([["aa"], ["bb", "cc"]])
    assert sha1_hex(ch).to_pylist() == [h[0], h[3], h[4]]


def test_state_is_five_uint32_vectors():
    st_ = sha1_state(pa.array(EDGE))
    assert len(st_) == 5
    assert all(v.dtype == np.uint32 and len(v) == len(EDGE) for v in st_)


def test_add_text_hash_three_way_parity():
    """Production path (hashlib over Arrow-buffer memoryviews) ==
    sha1vec == per-row hashlib reference, including multi-chunk and
    offset-sliced input tables."""
    rng = random.Random(11)
    texts = ["".join(rng.choices("The quick brown fox 0123 \n",
                                 k=rng.randint(0, 500)))
             for _ in range(500)]
    tbl = pa.table({"doc_id": list(range(500)), "text": texts})
    out = add_text_hash(tbl)["text_hash"].to_pylist()
    assert out == [_ref_hex(s) for s in texts]
    assert out == sha1_hex(tbl["text"]).to_pylist()
    # sliced (non-zero Arrow offset) and chunked inputs
    sl = add_text_hash(tbl.slice(100, 50))["text_hash"].to_pylist()
    assert sl == out[100:150]
    chunked = pa.table({
        "doc_id": pa.chunked_array([list(range(250)), list(range(250, 500))]),
        "text": pa.chunked_array([texts[:250], texts[250:]]),
    })
    assert add_text_hash(chunked)["text_hash"].to_pylist() == out
