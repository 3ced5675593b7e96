"""Cuckoo filter (G5): correctness, determinism, capacity, checkpoint."""

import numpy as np
import pytest

from warc_ray.state.cuckoo import CuckooFilter


def test_no_false_negatives():
    f = CuckooFilter(10_000, seed=1)
    rng = np.random.default_rng(0)
    keys = rng.integers(1, 2**63, size=5_000, dtype=np.uint64)
    seen = f.contains_or_add(keys)
    assert not seen.any() or seen.mean() < 0.01  # a few FPs allowed
    # every inserted key is found
    again = f.contains_or_add(keys)
    assert again.all()


def test_duplicates_within_batch():
    f = CuckooFilter(1024, seed=1)
    keys = np.array([7, 8, 7, 9, 8, 7], dtype=np.uint64)
    seen = f.contains_or_add(keys)
    assert list(seen) == [False, False, True, False, True, True]


def test_deterministic():
    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, size=20_000, dtype=np.uint64)
    a = CuckooFilter(30_000, seed=5)
    b = CuckooFilter(30_000, seed=5)
    sa = a.contains_or_add(keys)
    sb = b.contains_or_add(keys)
    assert (sa == sb).all()
    assert a.table.tobytes() == b.table.tobytes()


def test_high_load_with_evictions():
    cap = 4096
    f = CuckooFilter(cap, seed=2)
    n = int(f.nbuckets * 4 * 0.90)  # 90% load forces eviction chains
    rng = np.random.default_rng(4)
    keys = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    f.contains_or_add(keys)
    assert f.contains_or_add(keys).all()  # still no false negatives


def test_low_false_positive_rate():
    f = CuckooFilter(100_000, seed=7)
    rng = np.random.default_rng(8)
    f.contains_or_add(rng.integers(1, 2**62, size=50_000, dtype=np.uint64))
    probe = rng.integers(2**62, 2**63, size=50_000, dtype=np.uint64)
    fpr = np.array([int(k) in f for k in probe[:5000]]).mean()
    assert fpr < 0.01  # theory ~0.012% for 16-bit fp, 4-way


def test_checkpoint_roundtrip():
    f = CuckooFilter(2048, seed=9)
    rng = np.random.default_rng(10)
    keys = rng.integers(1, 2**63, size=1000, dtype=np.uint64)
    f.contains_or_add(keys)
    g = CuckooFilter.from_state(f.state())
    assert g.table.tobytes() == f.table.tobytes()
    assert g.contains_or_add(keys).all()
    # continued inserts stay deterministic after restore
    more = rng.integers(1, 2**63, size=500, dtype=np.uint64)
    f2 = f.contains_or_add(more)
    g2 = g.contains_or_add(more)
    assert (f2 == g2).all()
    assert g.table.tobytes() == f.table.tobytes()


def test_full_filter_raises():
    f = CuckooFilter(64, seed=1)
    rng = np.random.default_rng(11)
    with pytest.raises(RuntimeError):
        # way past capacity
        f.contains_or_add(rng.integers(1, 2**63, size=10_000, dtype=np.uint64))


def test_vectorized_matches_sequential_reference():
    # The batch API must be bit-identical to the naive per-key loop
    # (same seen flags, same table bytes, same kick stream).
    import numpy as np

    from warc_ray.state.cuckoo import CuckooFilter

    rng = np.random.default_rng(7)
    # heavy intra-batch duplication + enough load to trigger evictions
    keys = rng.integers(0, 1 << 20, size=6000, dtype=np.uint64)

    fast = CuckooFilter(4096, seed=3)
    slow = CuckooFilter(4096, seed=3)

    def sequential(filt, ks):
        ks = np.asarray(ks, dtype=np.uint64)
        fps = filt._fingerprint(ks)
        i1s = filt._index1(ks)
        i2s = filt._alt_index(i1s, fps)
        seen = np.zeros(len(ks), dtype=bool)
        for j in range(len(ks)):
            i1, i2, fp = int(i1s[j]), int(i2s[j]), int(fps[j])
            if filt._contains(i1, i2, fp):
                seen[j] = True
            else:
                filt._insert(i1, i2, fp)
        return seen

    for lo in range(0, len(keys), 1500):
        batch = keys[lo:lo + 1500]
        got = fast.contains_or_add(batch)
        exp = sequential(slow, batch)
        assert (got == exp).all()
    assert fast.table.tobytes() == slow.table.tobytes()
    assert fast.count == slow.count
    assert fast._kick_state == slow._kick_state


def test_bulk_insert_byte_parity_high_load():
    """The wave-vectorized bulk insert must reproduce the sequential
    per-key path byte-for-byte INCLUDING kick-heavy high-load regimes
    (a prior wave formulation diverged only above ~0.8 load)."""
    import numpy as np

    from warc_ray.state.cuckoo import CuckooFilter

    rng = np.random.default_rng(1)
    for cap_pow, load in ((12, 0.93), (10, 0.85), (14, 0.90)):
        f1 = CuckooFilter(1 << cap_pow, seed=3)
        f2 = CuckooFilter(1 << cap_pow, seed=3)
        keys = rng.integers(0, 1 << 63, int((1 << cap_pow) * load),
                            dtype=np.uint64)
        r1 = f1.contains_or_add(keys)
        # sequential reference: same canonical-identity dedup, per-key
        fps = f2._fingerprint(keys)
        i1 = f2._index1(keys)
        i2 = f2._alt_index(i1, fps)
        lo = np.minimum(i1, i2).astype(np.uint64)
        comb = (lo << np.uint64(16)) | fps.astype(np.uint64)
        first_seen: set = set()
        seen_ref = []
        for k in range(len(keys)):
            present = f2._contains(int(i1[k]), int(i2[k]), int(fps[k]))
            c = int(comb[k])
            s = present or (c in first_seen)
            first_seen.add(c)
            seen_ref.append(s)
            if not s:
                f2._insert(int(i1[k]), int(i2[k]), int(fps[k]))
        assert (r1 == np.array(seen_ref)).all()
        assert (f1.table == f2.table).all()
        assert f1._kick_state == f2._kick_state
        assert f1.count == f2.count
