"""Deterministic cuckoo filter for the URL-seen set (G5).

Design per Fan et al. 2014 ("Cuckoo Filter: Practically Better Than
Bloom"): 4-way buckets, 16-bit fingerprints, partial-key cuckoo hashing
(alternate bucket = bucket XOR hash(fingerprint)), bounded eviction
chains.  Differences for this engine:

  * **Deterministic** — eviction victim selection comes from a seeded
    counter stream, so identical insertion order ⇒ identical final
    table bytes.  The oracle simulator runs the *same class*, giving
    seen-set parity by construction (BASELINE.json: final URL-seen set
    must match exactly).
  * Batch API over uint64 keys (first 8 bytes of the URL SHA-1):
    ``contains_or_add(keys) -> seen`` processes keys in the caller's
    (sorted, deterministic) order.
  * Storage = one numpy uint16 array (nbuckets × 4); checkpointing is
    an ``np.save``.

Capacity: nbuckets=2^k, 4 slots; load ≤ ~0.95.  At 10^10 URLs, shard
count × capacity scales horizontally (the filter is per frontier
shard); 16-bit fingerprints give ≤ 2·4/65535 ≈ 0.012% FPR per lookup.
"""

from __future__ import annotations

import numpy as np

_FP_MASK = np.uint64(0xFFFF)


class CuckooFilter:
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0):
        nb = 1
        while nb * 4 < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, 4), dtype=np.uint16)
        # slots fill left-to-right and are never vacated (no deletes;
        # kicks swap occupied slots), so fill[i] IS the first empty
        # slot index — O(1) insert instead of a per-key flatnonzero
        # scan (that scan was the dominant frontier seal cost).  A
        # bytearray, not numpy: per-element access from the insert loop
        # is ~3x cheaper than numpy scalar indexing.
        self.fill = bytearray(nb)
        self.count = 0
        self.seed = seed
        self._kick_state = np.uint64(seed * 2654435761 + 0x9E3779B9)

    # -- hashing --------------------------------------------------------

    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (keys >> np.uint64(48)) & _FP_MASK
        return np.where(fp == 0, np.uint64(1), fp).astype(np.uint16)

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.int64)

    def _alt_index(self, index, fp) -> np.ndarray:
        # partial-key hashing: i2 = i1 xor H(fp)  (Fan et al. §3.1)
        with np.errstate(over="ignore"):
            h = (np.asarray(fp, dtype=np.uint64) * np.uint64(0x5BD1E995)) & self.mask
        return (np.asarray(index, dtype=np.uint64) ^ h).astype(np.int64)

    def _next_victim_slot(self) -> int:
        # deterministic xorshift stream
        x = self._kick_state
        x ^= x << np.uint64(13)
        x &= np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(7)
        x ^= x << np.uint64(17)
        x &= np.uint64(0xFFFFFFFFFFFFFFFF)
        self._kick_state = x
        return int(x & np.uint64(3))

    # -- single-key ops (used inside the batch loop) --------------------

    def _contains(self, i1: int, i2: int, fp: int) -> bool:
        t = self.table
        return bool((t[i1] == fp).any() or (t[i2] == fp).any())

    def _insert(self, i1: int, i2: int, fp: int) -> bool:
        t = self.table
        fill = self.fill
        for i in (i1, i2):
            f = fill[i]
            if f < 4:
                t[i, f] = fp
                fill[i] = f + 1
                self.count += 1
                return True
        i = i1
        cur = np.uint16(fp)
        for _ in range(self.MAX_KICKS):
            slot = self._next_victim_slot()
            cur, t[i, slot] = t[i, slot], cur
            i = int(self._alt_index(i, int(cur)))
            f = fill[i]
            if f < 4:
                t[i, f] = cur
                fill[i] = f + 1
                self.count += 1
                return True
        raise RuntimeError("cuckoo filter full (load %.3f)" %
                           (self.count / (self.nbuckets * 4)))

    # -- batch API ------------------------------------------------------

    def contains_or_add(self, keys: np.ndarray) -> np.ndarray:
        """For each key (in order): True if already present (or FP hit),
        else insert and return False.  The caller's order defines dedup
        semantics.

        Vectorized, but bit-identical to the per-key sequential loop:
        membership = fingerprint present in the key's bucket pair
        {i1, i2}, and the XOR pairing (i2 = i1 ^ H(fp)) means two keys
        with the same fingerprint have bucket pairs that either
        coincide or are disjoint — so (min(i1,i2), fp) is a canonical
        identity, eviction (which only moves a fp within its own pair)
        never changes membership, and intra-batch duplicates are
        exactly the non-first occurrences of a canonical identity.
        Inserts run in batch order → identical table bytes + kick
        stream as the sequential formulation."""
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        t = self.table
        present = ((t[i1s] == fps[:, None]).any(axis=1)
                   | (t[i2s] == fps[:, None]).any(axis=1))
        lo = np.minimum(i1s, i2s).astype(np.uint64)
        comb = (lo << np.uint64(16)) | fps.astype(np.uint64)
        uniq, inv = np.unique(comb, return_inverse=True)
        first = np.full(len(uniq), n, dtype=np.int64)
        np.minimum.at(first, inv, np.arange(n))
        is_first = np.arange(n) == first[inv]
        seen = present | ~is_first
        # per-key inserts in batch order (exact table-byte parity with
        # the sequential reference); the common no-kick path is inlined
        # over C-converted Python ints — ~3x cheaper than calling
        # _insert with numpy scalars.  (A wave-vectorized bulk insert
        # was tried and reverted: exact ordering forces the wave to cut
        # at the first would-overflow key, which degenerates
        # quadratically once the filter has full buckets.)
        fresh = np.flatnonzero(~seen)
        if len(fresh):
            # writable flat uint16 memoryview over the same buffer:
            # scalar stores are ~2x cheaper than numpy 2-D indexing
            flat = self.table.reshape(-1).data
            fill = self.fill
            cnt = 0
            for i1, i2, fp in zip(i1s[fresh].tolist(), i2s[fresh].tolist(),
                                  fps[fresh].tolist()):
                f = fill[i1]
                if f < 4:
                    flat[4 * i1 + f] = fp
                    fill[i1] = f + 1
                    cnt += 1
                    continue
                f = fill[i2]
                if f < 4:
                    flat[4 * i2 + f] = fp
                    fill[i2] = f + 1
                    cnt += 1
                    continue
                self._insert(i1, i2, fp)  # rare: kick path
            self.count += cnt
        return seen

    def __contains__(self, key: int) -> bool:
        k = np.uint64(key)
        fp = int(self._fingerprint(np.array([k]))[0])
        i1 = int(self._index1(np.array([k]))[0])
        i2 = int(self._alt_index(i1, fp))
        return self._contains(i1, i2, fp)

    # -- checkpoint -----------------------------------------------------

    def state(self) -> dict:
        return {
            "table": self.table.copy(), "count": self.count, "seed": self.seed,
            "kick_state": int(self._kick_state),
        }

    @classmethod
    def from_state(cls, s: dict) -> "CuckooFilter":
        f = cls(s["table"].shape[0] * 4, seed=s["seed"])
        f.table = s["table"].copy()
        f.fill = bytearray(
            (f.table != 0).sum(axis=1).astype(np.uint8).tobytes())
        f.count = s["count"]
        f._kick_state = np.uint64(s["kick_state"])
        return f
