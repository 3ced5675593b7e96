"""Similarity search over an embedding column (``list<float>``).

  * brute-force cosine top-k — numpy matmul per batch against a
    broadcast query matrix (the baseline; exact);
  * IVF-bucketed variant — seeded k-means-lite centroids, search only
    the ``nprobe`` nearest clusters (the scale path: candidate set per
    query shrinks by ~n_clusters/nprobe);
  * cosine-threshold near-dup pairs.

Float discipline: all math in float64 with the same formula DuckDB's
``list_cosine_similarity`` uses (dot / (|a|·|b|)); OUTPUTS carry only
ids/ranks (never floats), so driver value-hash comparisons are exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against broadcast
    queries; emits (query_id, neighbor_id, sim) candidates.  A final
    small groupby-head(k) keeps the global top-k per query."""

    def __init__(self, query_ids: list[int], query_matrix: np.ndarray, k: int):
        self.qids = np.asarray(query_ids)
        self.q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_matrix(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.q @ m.T                     # (nq, nbatch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            sel = idx[qi]
            rows_q.extend([int(self.qids[qi])] * len(sel))
            rows_v.extend(vec_ids[sel].tolist())
            rows_s.extend(sims[qi, sel].tolist())
        return pa.table({
            "query_id": pa.array(rows_q, type=pa.int64()),
            "vec_id": pa.array(rows_v, type=pa.int64()),
            "sim": pa.array(rows_s, type=pa.float64()),
        })


def knn_topk(embeddings_ds, query_ids: list[int], query_matrix: np.ndarray,
             k: int = 10, exclude_self: bool = True) -> pa.Table:
    """Exact top-k per query: distributed candidate generation + small
    driver-side merge (k × n_blocks candidate rows only).

    Deterministic ordering: (sim DESC, vec_id ASC); output columns are
    (query_id, vec_id, rank) — integer-only.
    """
    cand = embeddings_ds.map_batches(
        BruteForceTopK, fn_constructor_args=(query_ids, query_matrix, k + 1),
        batch_format="pyarrow", concurrency=(1, 2),
    )
    df = cand.to_pandas()  # small: (k+1) * n_batches * n_queries
    out_q, out_v, out_r = [], [], []
    for qid, grp in df.groupby("query_id"):
        if exclude_self:
            grp = grp[grp.vec_id != qid]
        grp = grp.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        out_q.extend([qid] * len(grp))
        out_v.extend(grp.vec_id.tolist())
        out_r.extend(range(1, len(grp) + 1))
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })


class NearDupPairs:
    """Cosine-threshold pairs: each batch × broadcast full matrix.

    O(n·N) per pass — exact; the IVF variant below is the scale path.
    Outputs integer pair ids only (a < b).
    """

    def __init__(self, all_ids: np.ndarray, all_matrix: np.ndarray,
                 threshold: float):
        self.ids = np.asarray(all_ids)
        self.m = normalize_rows(np.asarray(all_matrix, dtype=np.float64))
        self.t = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        bm = normalize_rows(_matrix(batch))
        bids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = bm @ self.m.T
        a_out, b_out = [], []
        for i in range(sims.shape[0]):
            hits = self.ids[sims[i] >= self.t]
            for h in hits:
                if bids[i] < h:  # canonical a<b, no self-pairs
                    a_out.append(int(bids[i]))
                    b_out.append(int(h))
        return pa.table({"vec_a": pa.array(a_out, type=pa.int64()),
                         "vec_b": pa.array(b_out, type=pa.int64())})


def neardup_pairs_blocked(embeddings_ds, threshold: float,
                          n_blocks: int = 8):
    """EXACT cosine-threshold pairs with NO full-matrix broadcast:
    triangle block join.

    Each vector is assigned a block ``vec_id % n_blocks`` and replicated
    to the n_blocks (i,j) block-pair groups it participates in; each
    group holds two blocks (≈ 2N/B rows) and computes its cross/within
    sims with one matmul.  Data movement is O(N·B) — the inherent cost
    of exact all-pairs; B is chosen so a group (2N/B vectors) fits one
    worker, so this scales by growing B with N while per-task memory
    stays constant.  LSH/IVF (above) are the sub-quadratic approximate
    paths; this is the exact one.  Output: (vec_a, vec_b), a < b, each
    qualifying pair exactly once.
    """
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        blk = (ids % n_blocks).astype(np.int64)
        base = pa.table({
            "block": pa.array(blk, type=pa.int64()),
            "vec_id": batch["vec_id"],
            "embedding": batch["embedding"],
        })
        parts = []
        for j in range(n_blocks):
            key = np.where(blk <= j, blk * n_blocks + j, j * n_blocks + blk)
            parts.append(base.add_column(
                0, "pair_key", pa.array(key, type=pa.int64())))
        return pa.concat_tables(parts)

    def compute(group: pa.Table) -> pa.Table:
        key = group["pair_key"][0].as_py()
        i, j = divmod(key, n_blocks)
        blocks = group["block"].to_numpy(zero_copy_only=False)
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        m = normalize_rows(_matrix(group))
        if i == j:
            sims = m @ m.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= threshold
            left, right = ids[iu[hit]], ids[ju[hit]]
        else:
            mi, mj = m[blocks == i], m[blocks == j]
            idi, idj = ids[blocks == i], ids[blocks == j]
            ii, jj = np.nonzero(mi @ mj.T >= threshold)
            left, right = idi[ii], idj[jj]
        return pa.table({
            "vec_a": pa.array(np.minimum(left, right), type=pa.int64()),
            "vec_b": pa.array(np.maximum(left, right), type=pa.int64()),
        })

    exploded = embeddings_ds.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby("pair_key").map_groups(
        compute, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------

def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                seed: int = 42) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample → centroid matrix."""
    rng = np.random.default_rng(seed)
    x = normalize_rows(sample.astype(np.float64))
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = x[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfAssign:
    """Assign each vector to its nearest centroid (adds ``cluster``)."""

    def __init__(self, centroids: np.ndarray):
        self.c = np.asarray(centroids, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_matrix(batch))
        assign = np.argmax(m @ self.c.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(assign))


def ivf_topk(embeddings_ds, query_ids: list[int], query_matrix: np.ndarray,
             centroids: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
    """IVF search: filter to the nprobe nearest clusters per query set,
    then brute-force within the (much smaller) candidate set.

    Approximate (recall < 1 when a true neighbor lives in an unprobed
    cluster) — the documented trade for ~n_clusters/nprobe less work.
    """
    q = normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    cq = np.argsort(-(q @ np.asarray(centroids).T), axis=1)[:, :nprobe]
    probe = sorted(set(cq.flatten().tolist()))
    assigned = embeddings_ds.map_batches(
        IvfAssign, fn_constructor_args=(centroids,), batch_format="pyarrow",
        concurrency=(1, 2))
    import pyarrow.compute as pc

    cand = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["cluster"], value_set=pa.array(probe, type=pa.int32()))),
        batch_format="pyarrow")
    return knn_topk(cand, query_ids, query_matrix, k=k)
