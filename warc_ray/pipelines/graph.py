"""Iterative graph algorithms over bucket-sharded actors (BSP).

The reference library has no iterative operators (SURVEY.md §2.A #27);
these implement the two classic training-data graph passes —
**PageRank** (authority scoring over a link graph) and **connected
components** (near-duplicate *clusters* from pairwise near-dup edges,
the step that turns q21/q25's pairs into keep/drop families) — with
the execution shape an iterative algorithm needs at 100 TB:

  * the EDGE table is hash-partitioned by ``src`` node ONCE into P
    ``GraphShard`` actors and never moves again; each iteration ships
    only the per-node value vector (ranks / labels), whose per-shard
    partials are grouped+reduced shard-side (sum for PageRank, min for
    CC) before crossing the object store — shuffle volume per
    iteration is O(nodes), not O(edges);
  * node ownership uses the SAME hash as edge placement, so a shard's
    out-edge sources are exactly its owned nodes (no lookup exchange);
  * all arithmetic is INTEGER (rank in 1e-12 units, labels are node
    ids), so reduce order cannot perturb results — the distributed
    answer is bit-equal to the single-process formulation and to the
    DuckDB oracle (unrolled-iteration SQL for PageRank, recursive-CTE
    transitive closure for CC).

Ray Data is used for the wide one-shot steps (edge distinct via
per-batch combiners routed straight into the shards); the iteration
itself is raw actor BSP — recipe (c) of the build brief, used exactly
where a Dataset would re-shuffle the edge table every iteration.

Partitioning assumptions (documented per the brief): node ids are
non-negative and < 2^31 (edge dedup packs a pair into one uint64);
graphs are symmetrized by the builders below, so every node has
out-degree >= 1 (no dangling-mass term needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

BFS_INF = np.int64(1) << 40      # unreachable sentinel (+1-safe)
SCALE = 1_000_000_000_000  # PageRank unit: 1e-12 of total mass
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def node_part(ids: np.ndarray, nparts: int) -> np.ndarray:
    """Shard owner of each node id (splitmix-style mix, uniform even
    for sequential ids)."""
    x = ids.astype(np.uint64) * _GOLD
    x ^= x >> np.uint64(31)
    return (x % np.uint64(nparts)).astype(np.int64)


def _pack(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    return (src.astype(np.uint64) << np.uint64(32)) | dst.astype(np.uint64)


@ray.remote
class GraphShard:
    """One edge bucket + the value vector of its owned nodes."""

    def __init__(self, part: int, nparts: int):
        self.part = part
        self.nparts = nparts
        self.buf: list[pa.Table] = []
        # sealed state
        self.nodes: np.ndarray | None = None   # owned node ids, sorted
        self.src_idx: np.ndarray | None = None  # per-edge index into nodes
        self.dst: np.ndarray | None = None      # per-edge dst id
        self.dst_part: np.ndarray | None = None
        self.outdeg: np.ndarray | None = None   # per-owned-node out-degree
        self.val: np.ndarray | None = None      # rank or label, int64

    def offer(self, tbl: pa.Table) -> int:
        if tbl.num_rows:
            self.buf.append(tbl)
        return tbl.num_rows

    def seal(self) -> int:
        """Dedup buffered edges, group by src, index owned nodes."""
        if self.buf:
            t = pa.concat_tables(self.buf)
            self.buf = []
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            packed = np.unique(_pack(src, dst))
            src = (packed >> np.uint64(32)).astype(np.int64)
            dst = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            src = dst = np.zeros(0, dtype=np.int64)
        self.nodes, self.src_idx = np.unique(src, return_inverse=True)
        self.dst = dst
        self.dst_part = node_part(dst, self.nparts)
        self.outdeg = np.bincount(self.src_idx, minlength=len(self.nodes)) \
            .astype(np.int64)
        return len(self.nodes)

    def n_nodes(self) -> int:
        return len(self.nodes)

    def init_values(self, mode: str, n_total: int,
                    seeds: np.ndarray | None = None) -> None:
        if mode == "pagerank":
            self.val = np.full(len(self.nodes), SCALE // n_total,
                               dtype=np.int64)
        elif mode == "bfs":                    # dist 0 at seeds, "inf" else
            self.val = np.full(len(self.nodes), BFS_INF, dtype=np.int64)
            mine = np.intersect1d(self.nodes, np.asarray(seeds,
                                                         dtype=np.int64))
            self.val[np.searchsorted(self.nodes, mine)] = 0
        else:  # cc: label = own id
            self.val = self.nodes.copy()

    # -- one BSP exchange step -------------------------------------------
    # partials(): per-edge value of the OWNED src, reduced per (dst,
    # dst_part) shard-side; returns nparts tables (dst, v).
    # apply_*(): fold the partials addressed to this shard into val.

    def partials(self, op: str):
        if op == "sum":
            contrib = self.val[self.src_idx] // self.outdeg[self.src_idx]
        elif op == "min1":                     # BFS relax: dist(u) + 1
            contrib = np.minimum(self.val[self.src_idx] + 1, BFS_INF)
        else:
            contrib = self.val[self.src_idx]
        out = []
        for p in range(self.nparts):
            m = self.dst_part == p
            d = self.dst[m]
            ud, inv = np.unique(d, return_inverse=True)
            if op == "sum":
                v = np.zeros(len(ud), dtype=np.int64)
                np.add.at(v, inv, contrib[m])
            else:
                v = np.full(len(ud), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(v, inv, contrib[m])
            out.append(pa.table({"dst": pa.array(ud), "v": pa.array(v)}))
        return tuple(out) if self.nparts > 1 else out[0]

    def _fold(self, parts: list[pa.Table], op: str) -> np.ndarray:
        if parts and isinstance(parts[0], ray.ObjectRef):
            # refs nested in a list arg are NOT auto-resolved by Ray —
            # pull the peer shards' partials from the object store here
            parts = ray.get(list(parts))
        acc = (np.zeros(len(self.nodes), dtype=np.int64) if op == "sum"
               else self.val.copy())
        for t in parts:
            if t.num_rows == 0:
                continue
            d = t["dst"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.nodes, d)
            # symmetrized graphs: every dst with an in-edge is a src
            # somewhere, but THIS shard only owns ids hashed here —
            # builders route edges by src part, so dst∈nodes holds.
            if op == "sum":
                np.add.at(acc, idx, v)
            else:
                np.minimum.at(acc, idx, v)
        return acc

    def apply_pagerank(self, parts: list[pa.Table], n_total: int) -> None:
        s = self._fold(parts, "sum")
        base = (15 * (SCALE // n_total)) // 100
        self.val = base + (85 * s) // 100

    def apply_min(self, parts: list[pa.Table]) -> int:
        new = self._fold(parts, "min")
        changed = int((new != self.val).sum())
        self.val = new
        return changed

    def values_table(self, id_name: str, val_name: str) -> pa.Table:
        return pa.table({id_name: pa.array(self.nodes),
                         val_name: pa.array(self.val)})


class _RouteEdges:
    """map_batches stage: per-batch distinct (src, dst) pairs routed by
    src part straight into the shard actors (combiner + exchange in one
    pass — the edge table never materializes driver-side)."""

    def __init__(self, shards):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = np.unique(_pack(src, dst))
        src = (packed >> np.uint64(32)).astype(np.int64)
        dst = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        parts = node_part(src, len(self.shards))
        order = np.argsort(parts, kind="stable")
        bounds = np.searchsorted(parts[order], np.arange(len(self.shards) + 1))
        refs = []
        for p in range(len(self.shards)):
            s, e = bounds[p], bounds[p + 1]
            if e > s:
                sl = order[s:e]
                refs.append(self.shards[p].offer.remote(
                    pa.table({"src": pa.array(src[sl]),
                              "dst": pa.array(dst[sl])})))
        ray.get(refs)  # landed before the caller's seal barrier
        return pa.table({"n": pa.array([len(packed)], type=pa.int64())})


def _build(edges_ds, nparts: int):
    """Load a symmetric (src, dst) edge Dataset into sealed shards."""
    shards = [GraphShard.remote(p, nparts) for p in range(nparts)]
    edges_ds.map_batches(_RouteEdges(shards), batch_format="pyarrow",
                         batch_size=65536).count()
    n_per = ray.get([s.seal.remote() for s in shards])
    return shards, int(sum(n_per))


def _exchange(shards, op: str):
    nparts = len(shards)
    if nparts == 1:
        return [[ray.get(shards[0].partials.remote(op))]]
    refs = [s.partials.options(num_returns=nparts).remote(op)
            for s in shards]
    return [[refs[q][p] for q in range(nparts)] for p in range(nparts)]


def pagerank(edges_ds, *, iters: int = 5, nparts: int = 8) -> pa.Table:
    """Integer-arithmetic PageRank (damping 0.85, SCALE=1e12 units,
    floor division — deterministic and reduce-order-free).

    r_{k+1}(v) = (15*(SCALE//N))//100 + (85 * Σ_{u→v} r_k(u)//deg(u))//100

    Returns (node_id, rank) for every node of the symmetrized graph.
    """
    shards, n_total = _build(edges_ds, nparts)
    ray.get([s.init_values.remote("pagerank", n_total) for s in shards])
    for _ in range(iters):
        inbox = _exchange(shards, "sum")
        ray.get([s.apply_pagerank.remote(inbox[p], n_total)
                 for p, s in enumerate(shards)])
    return pa.concat_tables(
        ray.get([s.values_table.remote("node_id", "rank") for s in shards]))


def connected_components(edges_ds, *, nparts: int = 8,
                         max_iters: int = 64) -> pa.Table:
    """Min-label propagation to fixpoint: component id = min node id
    reachable (converges in graph-diameter rounds; each round is one
    O(nodes) exchange)."""
    shards, _ = _build(edges_ds, nparts)
    ray.get([s.init_values.remote("cc", 0) for s in shards])
    for _ in range(max_iters):
        inbox = _exchange(shards, "min")
        changed = ray.get([s.apply_min.remote(inbox[p])
                           for p, s in enumerate(shards)])
        if sum(changed) == 0:
            break
    return pa.concat_tables(
        ray.get([s.values_table.remote("node_id", "cluster") for s in shards]))


def bfs_distance(edges_ds, seeds: np.ndarray, *, nparts: int = 8,
                 max_iters: int = 64) -> pa.Table:
    """Multi-source BFS (min-distance label propagation to fixpoint):
    dist(v) = min over in-neighbors u of dist(u)+1, seeds at 0 — the
    frontier-depth primitive without the crawl's politeness coupling.
    Same BSP shape as connected_components: edges sharded once, each
    round ships only O(nodes) (dst, candidate-dist) partials, reduced
    min-wise shard-side; converges in graph-eccentricity rounds.
    Unreached nodes keep the BFS_INF sentinel (reported as -1)."""
    shards, _ = _build(edges_ds, nparts)
    ray.get([s.init_values.remote("bfs", 0, np.asarray(seeds, np.int64))
             for s in shards])
    for _ in range(max_iters):
        inbox = _exchange(shards, "min1")
        changed = ray.get([s.apply_min.remote(inbox[p])
                           for p, s in enumerate(shards)])
        if sum(changed) == 0:
            break
    t = pa.concat_tables(
        ray.get([s.values_table.remote("node_id", "dist") for s in shards]))
    d = t["dist"].to_numpy(zero_copy_only=False)
    return t.set_column(1, "dist",
                        pa.array(np.where(d >= BFS_INF, -1, d)))
