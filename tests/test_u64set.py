"""U64Set: vectorized GC-free set must match Python-set semantics."""

import numpy as np

from warc_ray.state.u64set import U64Set


def test_contains_add_matches_python_set():
    rng = np.random.default_rng(7)
    s = U64Set(capacity=64)  # tiny start → exercises growth/rebuild
    ref: set[int] = set()
    for _ in range(30):
        n = int(rng.integers(1, 5000))
        # heavy duplication: draw from a small-ish universe, with some
        # in-batch repeats and some zeros (the sentinel edge case)
        keys = rng.integers(0, 20_000, size=n).astype(np.uint64)
        keys[rng.random(n) < 0.01] = 0
        expect = np.array([int(k) in ref for k in keys])
        got = s.contains_add(keys.copy())
        assert np.array_equal(got, expect)
        ref.update(int(k) for k in keys)
        assert len(s) == len(ref)


def test_signed_input_view():
    s = U64Set()
    k = np.array([-1, -2, 3], dtype=np.int64)
    assert not s.contains_add(k).any()
    assert s.contains_add(k.copy()).all()
    assert len(s) == 3


def test_clear():
    s = U64Set()
    s.contains_add(np.arange(1, 100, dtype=np.uint64))
    s.clear()
    assert len(s) == 0
    assert not s.contains_add(np.arange(1, 100, dtype=np.uint64)).any()
