"""GC-free uint64 membership set (vectorized open addressing).

The crawl worker's re-offer suppression set reaches millions of keys.
As a Python ``set[int]`` that is (a) rescanned by EVERY gen-2 garbage
collection — observed as seconds of fixed per-round stall once the set
passed ~2M keys — and (b) ~2.5 µs/key to probe from numpy input via a
Python loop.  A flat numpy linear-probing table is invisible to the GC
and probes ~50 ns/key in bulk.

Semantics match ``set``: ``contains_add(keys)`` reports membership
against the PRE-CALL state for every element (in-batch duplicates all
report "absent" if the key was new, mirroring the reference
formulation in CrawlWorker.process_round), then inserts the batch.

Insert uses wave writes: every active key writes its slot, winners are
read back, losers advance one step.  Slots only ever fill (no
deletes), so any key's final slot is reachable from its home position
through occupied slots — lookup correctness is invariant to insertion
order, which is what lets the waves run vectorized.
"""

from __future__ import annotations

import numpy as np

# key 0 is remapped to this constant (0 is the empty-slot sentinel);
# keys are 64-bit content hashes, so collision odds are negligible
_ZERO_ALIAS = np.uint64(0x9E3779B97F4A7C15)


class U64Set:
    def __init__(self, capacity: int = 1 << 16):
        cap = 1
        while cap < capacity:
            cap <<= 1
        self.cap = cap
        self.table = np.zeros(cap, dtype=np.uint64)
        self.n = 0

    def __len__(self) -> int:
        return self.n

    def clear(self) -> None:
        self.table[:] = 0
        self.n = 0

    def _rebuild(self, new_cap: int) -> None:
        old = self.table[self.table != 0]
        self.cap = new_cap
        self.table = np.zeros(new_cap, dtype=np.uint64)
        self.n = 0
        if old.size:
            self._insert(old)

    def _probe(self, keys: np.ndarray) -> np.ndarray:
        """Membership of each key (pre-call state)."""
        n = len(keys)
        found = np.zeros(n, dtype=bool)
        pos = (keys & np.uint64(self.cap - 1)).astype(np.int64)
        active = np.arange(n)
        table = self.table
        while active.size:
            slot = table[pos[active]]
            k = keys[active]
            hit = slot == k
            found[active[hit]] = True
            cont = ~(hit | (slot == 0))
            active = active[cont]
            if active.size:
                pos[active] = (pos[active] + 1) & (self.cap - 1)
        return found

    def _insert(self, keys: np.ndarray) -> None:
        """Insert keys (already remapped, any duplicates fine)."""
        mask = self.cap - 1
        pos = (keys & np.uint64(mask)).astype(np.int64)
        active = np.arange(len(keys))
        table = self.table
        inserted = 0
        while active.size:
            p = pos[active]
            k = keys[active]
            slot = table[p]
            empty = slot == 0
            # wave write into empty slots; ties resolved by readback
            tgt = p[empty]
            table[tgt] = k[empty]
            won = np.zeros(len(active), dtype=bool)
            won[empty] = table[tgt] == k[empty]
            inserted += int(np.count_nonzero(won))
            settled = won | (slot == k)
            active = active[~settled]
            if active.size:
                pos[active] = (pos[active] + 1) & mask
        self.n += inserted

    def contains_add(self, keys: np.ndarray) -> np.ndarray:
        """Bulk membership-test-then-insert; returns pre-call membership."""
        keys = np.asarray(keys).view(np.uint64)
        keys = np.where(keys == 0, _ZERO_ALIAS, keys)
        # keep load factor under 0.7 even if every key is new
        need = self.n + len(keys)
        if need * 10 > self.cap * 7:
            new_cap = self.cap
            while need * 10 > new_cap * 7:
                new_cap <<= 1
            self._rebuild(new_cap)
        found = self._probe(keys)
        if not found.all():
            # dedup in-batch copies so the slot count stays exact
            self._insert(np.unique(keys[~found]))
        return found

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Bulk membership test WITHOUT insert (pure probe)."""
        keys = np.asarray(keys).view(np.uint64)
        keys = np.where(keys == 0, _ZERO_ALIAS, keys)
        return self._probe(keys)

    def add(self, keys: np.ndarray) -> None:
        """Bulk insert (no membership report)."""
        keys = np.asarray(keys).view(np.uint64)
        if len(keys) == 0:
            return
        keys = np.where(keys == 0, _ZERO_ALIAS, keys)
        need = self.n + len(keys)
        if need * 10 > self.cap * 7:
            new_cap = self.cap
            while need * 10 > new_cap * 7:
                new_cap <<= 1
            self._rebuild(new_cap)
        self._insert(np.unique(keys))
