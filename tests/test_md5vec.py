"""Batched numpy MD5 (stages/md5vec) — bit-parity vs hashlib.

The engine's SQL-reproducible key hash is the md5 prefix; md5vec is
the vectorized execution of the SAME function, so these tests pin
bit-identity against hashlib across the padding boundaries (55/56/64
bytes), multi-block messages, nulls, slices and chunked arrays.  No
Ray needed — pure numpy/Arrow.
"""

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

from warc_ray.stages.md5vec import (md5_chunks_u32, md5_hex,
                                    md5_prefix64, md5_raw)

EDGE = ["", "a", "abc", "hello world", "x" * 54, "x" * 55, "x" * 56,
        "x" * 63, "x" * 64, "x" * 65, "x" * 119, "x" * 120, "x" * 128,
        "x" * 1000, "\x00\x01\x7f", "héllo ünïcode ✓"]


def _ref64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def test_prefix64_matches_hashlib_edges():
    got = md5_prefix64(pa.array(EDGE))
    exp = np.array([_ref64(s) for s in EDGE], dtype=np.uint64)
    assert (got == exp).all()


def test_prefix64_matches_hashlib_random():
    rng = random.Random(7)
    cases = ["".join(rng.choices("abcdef word\n\t0123", k=rng.randint(0, 400)))
             for _ in range(1000)]
    got = md5_prefix64(pa.array(cases))
    exp = np.array([_ref64(s) for s in cases], dtype=np.uint64)
    assert (got == exp).all()


def test_hex_and_raw_match_hashlib():
    hx = md5_hex(pa.array(EDGE)).to_pylist()
    raw = md5_raw(pa.array(EDGE))
    for s, h, r in zip(EDGE, hx, raw):
        assert h == hashlib.md5(s.encode()).hexdigest()
        assert bytes(r) == hashlib.md5(s.encode()).digest()


def test_chunks_u32_is_hex_window_integer():
    ch = md5_chunks_u32(pa.array(EDGE))
    for i, s in enumerate(EDGE):
        hx = hashlib.md5(s.encode()).hexdigest()
        for r in range(4):
            assert int(ch[i, r]) == int(hx[8 * r:8 * r + 8], 16)


def test_null_hashes_as_empty_and_slices():
    arr = pa.array(["aa", None, "", "bb", "cc"])
    h = md5_prefix64(arr)
    assert h[1] == h[2] == _ref64("")
    sl = md5_prefix64(arr.slice(3, 2))
    assert sl[0] == h[3] and sl[1] == h[4]
    ch = pa.chunked_array([["aa"], ["bb", "cc"]])
    assert (md5_prefix64(ch) == h[[0, 3, 4]]).all()


def test_accepts_python_list_and_empty():
    assert md5_prefix64(["abc"])[0] == _ref64("abc")
    assert len(md5_prefix64(pa.array([], type=pa.string()))) == 0


def test_binary_input():
    payload = [b"\x00\xffbin", b"", bytes(range(256))]
    got = md5_prefix64(pa.array(payload, type=pa.binary()))
    exp = np.array([int.from_bytes(hashlib.md5(b).digest()[:8], "big")
                    for b in payload], dtype=np.uint64)
    assert (got == exp).all()
