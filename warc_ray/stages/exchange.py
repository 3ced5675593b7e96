"""Hash-bucket exchange: high-cardinality aggregates without the
per-key shuffle machinery.

Ray Data's ``groupby(key).aggregate(...)`` sort-shuffles on the full
key domain and runs its per-key combine at the reduce; for
high-cardinality keys the exchange fabric dominates the actual
aggregation (measured on the 1.2M-doc corpus: a 3.5M-row / 1.8M-key
URL dedup took ~30s through the built-in aggregate vs ~5s through this
exchange at identical results).  The bucket exchange instead:

  1. the caller pre-aggregates per batch with vectorized Arrow
     ``Table.group_by`` (the classic combiner),
  2. ``with_part`` appends ``part = hash(key) % npart`` (vectorized),
  3. one Ray groupby on the tiny int key domain co-locates buckets,
  4. ``combine_buckets`` runs ONE vectorized Arrow group_by per bucket
     (npart Python calls total — not per-key).

``npart`` sizes the reduce parallelism and bounds per-task group state:
at cluster scale set it to a few × total cores so each bucket's
distinct keys fit a worker's heap.  Keys hash uniformly, so buckets
balance regardless of key skew in the ROW distribution (skew collapses
in step 1's partials).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # vectorized 64-bit hash; polars ships in the target environment
    import polars as _pl

    def hash64_strings(arr: pa.Array | pa.ChunkedArray,
                       seed: int = 42) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return _pl.from_arrow(arr).hash(seed=seed).to_numpy()
except ImportError:  # pragma: no cover - vectorized numpy fallback
    _FB_GOLD = np.uint64(0x9E3779B97F4A7C15)
    _FB_C1 = np.uint64(0xBF58476D1CE4E5B9)
    _FB_C2 = np.uint64(0x94D049BB133111EB)

    def _fb_mix(x: np.ndarray) -> np.ndarray:
        x = x ^ (x >> np.uint64(30))
        x = x * _FB_C1
        x = x ^ (x >> np.uint64(27))
        x = x * _FB_C2
        return x ^ (x >> np.uint64(31))

    def hash64_strings(arr, seed: int = 42) -> np.ndarray:
        """Polynomial byte hash + splitmix64 finalizer, fully
        vectorized over the Arrow data buffer — the exchange fabric
        must never degrade to per-row Python hashing (the hash need
        not match polars', only be a deterministic uniform uint64)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.cast(pa.large_binary())
        n = len(arr)
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        validity, offbuf, databuf = arr.buffers()
        o = arr.offset
        off = np.frombuffer(offbuf, dtype=np.int64, count=n + 1 + o)[o:]
        starts, ends = off[:-1], off[1:]
        if validity is not None:
            valid = np.unpackbits(
                np.frombuffer(validity, dtype=np.uint8),
                bitorder="little")[o:o + n].astype(bool)
            ends = np.where(valid, ends, starts)  # nulls hash as ""
        lens = (ends - starts).astype(np.int64)
        base = np.zeros(n, dtype=np.uint64)
        total = int(lens.sum())
        if total:
            data = np.frombuffer(databuf, dtype=np.uint8)
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            csum = np.cumsum(lens) - lens       # flat start per row
            pos = np.arange(total, dtype=np.int64) - csum[row]
            byts = data[starts[row] + pos].astype(np.uint64)
            maxlen = int(lens.max())
            powr = np.concatenate((
                [np.uint64(1)],
                np.multiply.accumulate(
                    np.full(maxlen - 1, np.uint64(0x100000001B3),
                            dtype=np.uint64)))) if maxlen > 1 else \
                np.ones(1, dtype=np.uint64)
            terms = byts * powr[lens[row] - 1 - pos]
            nz = lens > 0
            base[nz] = np.add.reduceat(terms, csum[nz])
        h = base ^ (lens.astype(np.uint64) + _FB_GOLD)
        smix = _fb_mix(np.array([seed], dtype=np.uint64) + _FB_GOLD)
        return _fb_mix(h ^ smix[0])


def with_part(tab: pa.Table, key_col: str, npart: int,
              seed: int = 42) -> pa.Table:
    """Append ``part = hash64(key) % npart`` (int32, vectorized)."""
    h = hash64_strings(tab[key_col], seed=seed)
    part = (h % np.uint64(npart)).astype(np.int32)
    return tab.append_column("part", pa.array(part))


def combine_buckets(ds, key_cols, aggs: list[tuple[str, str]],
                    names: list[str] | None = None):
    """One vectorized Arrow group_by per hash bucket.

    ``ds`` rows must carry a ``part`` column (see ``with_part``);
    ``aggs`` is the pyarrow ``Table.group_by(...).aggregate`` spec;
    ``names`` positionally renames the output (keys first, then the
    aggregates — pyarrow's output order).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def combine(g: pa.Table) -> pa.Table:
        out = g.drop_columns(["part"]).group_by(keys).aggregate(aggs)
        return out.rename_columns(names) if names else out

    return ds.groupby("part").map_groups(combine, batch_format="pyarrow")


def hash_join(left_ds, right_ds, keys, how: str = "inner", *,
              npart: int = 32, right_suffix: str = "_r",
              bucket_finish=None):
    """General bucket-exchange join for two Datasets — the
    both-sides-large path (for fact ⋈ small-dim, broadcast a dict
    instead; see pipelines/relational.revenue_by_nation).

    Both sides are padded to one union schema (each side's non-key
    columns null on the other side, plus a ``side`` flag) so a plain
    ``union`` moves everything through ONE hash exchange on the join
    key; each bucket then runs a single vectorized pyarrow
    ``Table.join``.  Compared with Ray's built-in join this avoids the
    shuffle-actor spawn cost that dominates at small-to-medium
    cardinalities, and it composes with the `with_part` fabric the
    rest of the engine uses.  Right-side non-key columns that clash
    with left names get ``right_suffix``.

    Partitioning assumption: one key's rows (both sides) fit a
    bucket's worker — salt hot keys upstream if that breaks.
    ``how`` ∈ {"inner", "left outer", "right outer", "full outer"}.
    ``bucket_finish``: optional per-bucket post-join callable — because
    a join key's rows are complete within a bucket, any per-key finish
    (grouped aggregate, top-k partial, keep-first) fused here avoids a
    second exchange (q100 uses this for join→aggregate→top-k).
    """
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_names = list(l_schema.names)
    r_extra = [n for n in r_schema.names if n not in keys]
    r_out = {n: (n + right_suffix if n in l_names else n) for n in r_extra}
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    pad_cols = (keys + [n for n in l_names if n not in keys]
                + [r_out[n] for n in r_extra] + ["side", "part"])

    def _key_part(b: pa.Table) -> np.ndarray:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for k in keys:
            col = b[k]
            if pa.types.is_integer(col.type):
                kv = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                with np.errstate(over="ignore"):
                    kv = (kv ^ (kv >> np.uint64(33))) \
                        * np.uint64(0xFF51AFD7ED558CCD)
            else:
                kv = hash64_strings(col)
            h ^= kv
        return (h % np.uint64(npart)).astype(np.int32)

    def pad_left(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        for n in l_names:
            if n not in keys:
                cols[n] = b[n]
        for n in r_extra:
            cols[r_out[n]] = pa.nulls(b.num_rows, type=r_types[n])
        cols["side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["part"] = pa.array(_key_part(b))
        return pa.table({c: cols[c] for c in pad_cols})

    def pad_right(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        for n in l_names:
            if n not in keys:
                cols[n] = pa.nulls(b.num_rows, type=l_types[n])
        for n in r_extra:
            cols[r_out[n]] = b[n]
        cols["side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        cols["part"] = pa.array(_key_part(b))
        return pa.table({c: cols[c] for c in pad_cols})

    def bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)) \
            .select(keys + [n for n in l_names if n not in keys])
        rt = g.filter(pa.array(side == 1)) \
            .select(keys + [r_out[n] for n in r_extra])
        j = lt.join(rt, keys=keys, join_type=how)
        # join→consumer fusion: a key's rows are COMPLETE inside this
        # bucket, so a per-key finish (aggregate, top-k partial, dedup)
        # applied here needs no second exchange downstream
        return bucket_finish(j) if bucket_finish is not None else j

    u = left_ds.map_batches(pad_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(pad_right, batch_format="pyarrow"))
    return u.groupby("part").map_groups(bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Range-partitioned global sort (terasort shape)
# ---------------------------------------------------------------------------

def range_sort(ds, key_fn, tiebreak_fn, *, npart: int = 32,
               sample_per_block: int = 256, rank_col: str = "rank"):
    """Distributed total-order sort with exact global ranks.

    The classic sampled range partition (the TeraSort shape; Ray Data's
    own ``Dataset.sort`` uses the same boundary-sampling idea but does
    not expose ranks):

      1. SAMPLE pass — each batch contributes a deterministic,
         evenly-strided sample of its primary sort keys; the driver
         folds the tiny sample and cuts ``npart - 1`` splitters at even
         quantiles.  Splitters are *data-adaptive*, so skewed key
         distributions still yield balanced range buckets.
      2. COUNT pass — ``part = searchsorted(splitters, key)`` is a pure
         stateless function of the row, so exact per-part row counts
         come from per-batch ``bincount`` partials (npart ints per
         block — the shuffle never carries rows).  Their prefix sum is
         each bucket's global rank offset.
      3. EXCHANGE pass — one range exchange co-locates each key range;
         each bucket sorts vectorized (``np.lexsort`` on tiebreak-then-key)
         and emits ``rank = offset[part] + local position`` (1-based).

    ``key_fn(batch) -> np.uint64`` must encode the PRIMARY sort order
    as ascending unsigned bits (use ``_ordered_bits_*`` encoders;
    invert ``~bits`` for descending).  ``tiebreak_fn(batch) ->
    np.uint64`` breaks ties (must be unique per row for a
    deterministic total order).  Rows with EQUAL primary keys always
    land in the same bucket (``searchsorted`` side='right'), so ranks
    are exact even when ties straddle a splitter value.

    Scale shape: three pruned scans of the key column, one scan of the
    payload; per-bucket memory = rows/npart — size ``npart`` so a
    bucket fits a worker's heap.  No driver materialization beyond the
    sample and the npart-int histogram.
    """
    import ray

    # -- pass 1: strided key sample → splitters --------------------------
    def sample_keys(b: pa.Table) -> pa.Table:
        k = key_fn(b)
        if len(k) == 0:
            return pa.table({"k": pa.array([], type=pa.uint64())})
        step = max(1, len(k) // sample_per_block)
        return pa.table({"k": pa.array(np.sort(k)[::step])})

    samp = np.sort(np.concatenate(
        [b["k"].to_numpy() for b in
         ds.map_batches(sample_keys, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow")] or
        [np.array([], dtype=np.uint64)]))
    if len(samp) == 0:
        splitters = np.array([], dtype=np.uint64)
    else:
        cuts = (np.arange(1, npart) * len(samp)) // npart
        splitters = np.unique(samp[np.minimum(cuts, len(samp) - 1)])
    spl_ref = ray.put(splitters)

    def _parts(b: pa.Table) -> np.ndarray:
        return np.searchsorted(ray.get(spl_ref), key_fn(b),
                               side="right").astype(np.int32)

    # -- pass 2: exact per-part counts (npart ints per block) ------------
    def count_parts(b: pa.Table) -> pa.Table:
        c = np.bincount(_parts(b), minlength=len(splitters) + 1)
        return pa.table({"part": pa.array(np.arange(len(c), dtype=np.int32)),
                         "n": pa.array(c.astype(np.int64))})

    counts = np.zeros(len(splitters) + 1, dtype=np.int64)
    for b in ds.map_batches(count_parts, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        # np.add.at: iter_batches coalesces blocks, so part indices
        # repeat within one yielded batch — fancy-index += would
        # silently keep only one block's count per part
        np.add.at(counts, b["part"].to_numpy(zero_copy_only=False),
                  b["n"].to_numpy(zero_copy_only=False))
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    off_ref = ray.put(offsets)

    # -- pass 3: range exchange + per-bucket vectorized sort -------------
    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("part", pa.array(_parts(b)))

    def bucket(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        order = np.lexsort((tiebreak_fn(g), key_fn(g)))
        g = g.drop_columns(["part"]).take(pa.array(order))
        base = int(ray.get(off_ref)[part])
        rank = np.arange(1, g.num_rows + 1, dtype=np.int64) + base
        return g.append_column(rank_col, pa.array(rank))

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("part").map_groups(bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Skew-aware join (salted hot keys)
# ---------------------------------------------------------------------------

_GOLD2 = np.uint64(0x9E3779B97F4A7C15)


def detect_hot_keys(ds, key: str, *, hot_share_ppm: int = 20_000,
                    cand_per_batch: int = 32) -> set:
    """Heavy-key detection pre-pass: per-batch top-``cand_per_batch``
    key counts fold driver-side; keys whose summed candidate count is
    ≥ ``hot_share_ppm`` of total rows are hot.  Approximate (a key
    missing some batches' top lists undercounts) but DETERMINISTIC for
    a given block layout — and correctness never depends on it: salted
    and unsalted joins are value-equal, detection only moves work."""
    import pyarrow as pa

    def cand(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b[key]})
        c = t.group_by(["k"]).aggregate([("k", "count")]) \
            .rename_columns(["k", "n"])
        c = c.take(pa.compute.sort_indices(c, sort_keys=[
            ("n", "descending"), ("k", "ascending")]))
        c = c.slice(0, cand_per_batch)
        return c.append_column(
            "rows", pa.array([b.num_rows] + [0] * (c.num_rows - 1)
                             if c.num_rows else [],
                             type=pa.int64()))

    parts = ds.map_batches(cand, batch_format="pyarrow")
    t = pa.concat_tables(parts.iter_batches(batch_format="pyarrow"))
    if t.num_rows == 0:
        return set()
    total = int(pa.compute.sum(t["rows"]).as_py() or 0)
    folded = t.group_by(["k"]).aggregate([("n", "sum")])
    hot = set()
    for k, n in zip(folded["k"].to_pylist(), folded["n_sum"].to_pylist()):
        if n * 1_000_000 >= hot_share_ppm * max(total, 1):
            hot.add(k)
    return hot


def skew_join(left_ds, right_ds, key: str, how: str = "inner", *,
              npart: int = 32, n_salt: int = 8,
              hot_keys: set | None = None, hot_share_ppm: int = 20_000,
              right_suffix: str = "_r", bucket_finish=None):
    """Salted hash join for skewed keys — the big×big join where one
    key (a null/anonymous bucket, a supernode host) would overflow its
    bucket's worker under plain hashing.

    Hot LEFT rows spread across ``n_salt`` sub-buckets
    (``salt = row_index % n_salt``); hot RIGHT rows REPLICATE to every
    salt so each sub-bucket joins completely.  Cold keys pay nothing
    (salt 0).  ``how`` ∈ {"inner", "left outer"} — replicating the
    right side would multiply unmatched right rows under right/full
    outer.  Value-parity with ``hash_join`` is pinned by
    tests/test_exchange.py.

    ``hot_keys``: pass a precomputed set to skip the detection
    pre-pass (e.g. from a Misra-Gries sketch over yesterday's run).
    ``bucket_finish`` fuses a per-key consumer exactly as in
    ``hash_join`` — valid because a key's rows (left×replicated-right)
    are complete within each salted sub-bucket only for PER-ROW
    finishes; per-KEY aggregates of hot keys span salts, so fuse only
    per-row work when salting is active."""
    import pyarrow as pa

    assert how in ("inner", "left outer")
    if hot_keys is None:
        hot_keys = detect_hot_keys(left_ds, key,
                                   hot_share_ppm=hot_share_ppm)
    hot_arr = np.sort(np.array(sorted(hot_keys), dtype=np.int64)) \
        if hot_keys else np.zeros(0, dtype=np.int64)

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_names = list(l_schema.names)
    r_extra = [n for n in r_schema.names if n != key]
    r_out = {n: (n + right_suffix if n in l_names else n) for n in r_extra}
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    pad_cols = ([key] + [n for n in l_names if n != key]
                + [r_out[n] for n in r_extra] + ["side", "part"])

    def _part(kv: np.ndarray, salt: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (kv.astype(np.uint64) ^ (kv.astype(np.uint64)
                                         >> np.uint64(33))) \
                * np.uint64(0xFF51AFD7ED558CCD)
            h = h + salt.astype(np.uint64) * _GOLD2
        return (h % np.uint64(npart)).astype(np.int32)

    def pad_left(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False)
        is_hot = np.isin(kv, hot_arr)
        salt = np.where(is_hot, np.arange(len(kv)) % n_salt, 0)
        cols = {key: b[key]}
        for n in l_names:
            if n != key:
                cols[n] = b[n]
        for n in r_extra:
            cols[r_out[n]] = pa.nulls(b.num_rows, type=r_types[n])
        cols["side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["part"] = pa.array(_part(kv, salt))
        return pa.table({c: cols[c] for c in pad_cols})

    def pad_right(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False)
        is_hot = np.isin(kv, hot_arr)
        # replicate hot rows once per salt; cold rows once (salt 0)
        reps = np.where(is_hot, n_salt, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(kv)), reps)
        cs = np.concatenate(([0], np.cumsum(reps)[:-1])) \
            if len(reps) else np.zeros(0, dtype=np.int64)
        salt = np.arange(int(reps.sum())) - np.repeat(cs, reps)
        bb = b.take(pa.array(idx))
        kv2 = kv[idx]
        cols = {key: bb[key]}
        for n in l_names:
            if n != key:
                cols[n] = pa.nulls(bb.num_rows, type=l_types[n])
        for n in r_extra:
            cols[r_out[n]] = bb[n]
        cols["side"] = pa.array(np.ones(bb.num_rows, dtype=np.int8))
        cols["part"] = pa.array(_part(kv2, salt))
        return pa.table({c: cols[c] for c in pad_cols})

    def bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)) \
            .select([key] + [n for n in l_names if n != key])
        rt = g.filter(pa.array(side == 1)) \
            .select([key] + [r_out[n] for n in r_extra])
        j = lt.join(rt, keys=[key], join_type=how)
        return bucket_finish(j) if bucket_finish is not None else j

    u = left_ds.map_batches(pad_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(pad_right, batch_format="pyarrow"))
    return u.groupby("part").map_groups(bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Storage-clustered join (range-pruned, one-sided exchange)
# ---------------------------------------------------------------------------

def clustered_join(fact_ds, dim_path: str, *, fact_key: str,
                   dim_key: str, dim_columns=None, npart: int = 32,
                   bucket_finish=None):
    """Join a fact Dataset against a parquet table SORTED on the join
    key, moving only the fact side — the dimension is never shuffled.

    At 100-TB scale this is the join you want against any big sorted /
    clustered table (a doc store keyed by doc_id, a CDX index keyed by
    url hash): the driver reads only parquet FOOTER metadata, derives
    each partition's key range from row-group min statistics, and each
    bucket task reads exactly its own row groups — dimension bytes
    read equal the dimension's size once, split across tasks, with no
    all-to-all for it.  The fact side takes ONE range exchange
    (np.searchsorted against the partition bounds — no hash, no
    sample pass, because the storage layout already fixes the ranges).

    Partitioning assumption: the dimension file's ``dim_key`` is
    globally non-decreasing across row groups (writer contract, e.g.
    the q101 bucketed layout or any sorted export).  ``bucket_finish``
    fuses a per-key consumer exactly like ``hash_join``'s.  Inner
    join only (fact rows outside the dimension's key range are
    dropped, as they have no match by construction).
    """
    import pyarrow.parquet as pq

    md = pq.read_metadata(dim_path)
    ncols = md.row_group(0).num_columns if md.num_row_groups else 0
    key_idx = next(j for j in range(ncols)
                   if md.row_group(0).column(j).path_in_schema == dim_key)
    mins, rows = [], []
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(key_idx).statistics
        mins.append(st.min)
        rows.append(md.row_group(i).num_rows)
    if any(mins[i] > mins[i + 1] for i in range(len(mins) - 1)):
        raise ValueError(f"{dim_path} is not sorted by {dim_key}")

    # contiguous row-group runs, balanced by rows, at most npart parts
    target = max(1, -(-sum(rows) // npart))
    parts, start, acc = [], 0, 0
    for i, r in enumerate(rows):
        acc += r
        if acc >= target or i == len(rows) - 1:
            parts.append((start, i + 1, mins[start]))
            start, acc = i + 1, 0
    los = np.array([p[2] for p in parts], dtype=np.int64)

    def route(b: pa.Table) -> pa.Table:
        k = b[fact_key].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (np.searchsorted(los, k, side="right") - 1).astype(np.int32)
        t = b.append_column("part", pa.array(part))
        return t.filter(pa.array(part >= 0))

    cols = ([dim_key] + [c for c in (dim_columns or [])
                         if c != dim_key])

    def bucket(g: pa.Table) -> pa.Table:
        pid = int(g["part"][0].as_py())
        s, e, _ = parts[pid]
        dim = pq.ParquetFile(dim_path).read_row_groups(
            list(range(s, e)), columns=cols)
        if dim_key != fact_key:
            dim = dim.rename_columns(
                [fact_key if c == dim_key else c for c in dim.column_names])
        j = g.drop_columns(["part"]).join(dim, keys=fact_key,
                                          join_type="inner")
        return bucket_finish(j) if bucket_finish is not None else j

    return fact_ds.map_batches(route, batch_format="pyarrow") \
        .groupby("part").map_groups(bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Stats-driven join strategy selection (the planner's join rule)
# ---------------------------------------------------------------------------

BROADCAST_ROW_LIMIT = 2_000_000        # dim rows a worker can hold (~tens of MB)


def auto_join(fact_ds, dim_path: str, *, fact_key: str, dim_key: str,
              dim_columns=None, npart: int = 32, bucket_finish=None,
              broadcast_row_limit: int | None = None):
    """Join a fact Dataset against a parquet dimension choosing the
    strategy FROM STORAGE STATISTICS — the rule a query planner runs,
    exposed as an engine primitive (q168 reports these costs; this
    acts on them):

      1. dim rows ≤ broadcast_row_limit → BROADCAST: read the dim
         once driver-side, ship via the task closure, join per batch
         with np.searchsorted against the sorted key column — no
         exchange AT ALL, the fact never moves.
      2. dim key-sorted (row-group min stats monotone) → CLUSTERED:
         range-route only the fact; each bucket reads its own row
         groups (``clustered_join``).
      3. otherwise → bucket-exchange ``hash_join`` (both sides move).

    All three produce identical rows (inner join); the choice moves
    only WORK.  Decision inputs are parquet FOOTER metadata — no data
    scan.  ``bucket_finish`` fuses the consumer in every path (for
    the broadcast path it runs per BATCH — correct for any per-row
    finish or any per-key aggregate whose downstream re-reduces)."""
    import pyarrow.parquet as pq

    limit = (BROADCAST_ROW_LIMIT if broadcast_row_limit is None
             else broadcast_row_limit)
    md = pq.read_metadata(dim_path)
    cols = [dim_key] + [c for c in (dim_columns or []) if c != dim_key]

    if md.num_rows <= limit:
        dim = pq.read_table(dim_path, columns=cols)
        order = pa.compute.sort_indices(dim[dim_key])
        dim = dim.take(order)
        keys = dim[dim_key].to_numpy(zero_copy_only=False)
        dim_cols = {c: dim[c] for c in cols if c != dim_key}

        def probe(b: pa.Table) -> pa.Table:
            if len(keys) == 0:
                # empty dim: inner join is empty — emit the joined
                # SCHEMA (fact cols + dim cols) with zero rows; the
                # old `(len(keys) > 0) & ...` guard never ran because
                # `&` is eager and keys[pos_c] raised first.
                out = b.slice(0, 0)
                for c, col in dim_cols.items():
                    name = c + ("_r" if c in b.column_names else "")
                    out = out.append_column(name, col.slice(0, 0))
                return bucket_finish(out) if bucket_finish is not None \
                    else out
            fk = b[fact_key].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(keys, fk, side="left")
            hi = np.searchsorted(keys, fk, side="right")
            cnt = hi - lo                    # 0 = miss, >1 = dup dim keys
            if cnt.max(initial=0) <= 1:      # unique-key fast path
                hit = cnt == 1
                out = b.filter(pa.array(hit))
                take = pa.array(lo[hit])
                for c, col in dim_cols.items():
                    name = c + ("_r" if c in b.column_names else "")
                    out = out.append_column(name, col.take(take))
            else:
                # expand duplicate matches so all three strategies
                # produce identical rows (hash/clustered join N:M)
                fact_take = np.repeat(
                    np.arange(len(fk), dtype=np.int64), cnt)
                csum = np.cumsum(cnt) - cnt
                pos = (np.arange(int(cnt.sum()), dtype=np.int64)
                       - csum[fact_take] + lo[fact_take])
                out = b.take(pa.array(fact_take))
                for c, col in dim_cols.items():
                    name = c + ("_r" if c in b.column_names else "")
                    out = out.append_column(name, col.take(pa.array(pos)))
            return bucket_finish(out) if bucket_finish is not None \
                else out

        return fact_ds.map_batches(probe, batch_format="pyarrow"), \
            "broadcast"

    key_idx = next(j for j in range(md.row_group(0).num_columns)
                   if md.row_group(0).column(j).path_in_schema == dim_key)
    mins = [md.row_group(i).column(key_idx).statistics.min
            for i in range(md.num_row_groups)]
    if all(mins[i] <= mins[i + 1] for i in range(len(mins) - 1)):
        return clustered_join(fact_ds, dim_path, fact_key=fact_key,
                              dim_key=dim_key, dim_columns=dim_columns,
                              npart=npart,
                              bucket_finish=bucket_finish), "clustered"

    import ray.data as rd
    dim_ds = rd.read_parquet(dim_path, columns=cols)
    if dim_key != fact_key:
        def rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [fact_key if c == dim_key else c for c in b.column_names])
        dim_ds = dim_ds.map_batches(rename, batch_format="pyarrow")
    return hash_join(fact_ds, dim_ds, fact_key, npart=npart,
                     bucket_finish=bucket_finish), "hash"


# ---------------------------------------------------------------------------
# Distributed exact selection (radix-select, no global sort)
# ---------------------------------------------------------------------------


def distributed_select(make_ds, value_col: str, ranks: list[int],
                       *, n_total: int | None = None) -> dict[int, int]:
    """Exact k-th smallest selection over a non-negative int64 column
    WITHOUT a global sort — the distributed quickselect every exact-
    percentile op needs once the value domain is unbounded (the q15/
    q145 bounded-histogram trick stops working):

      pass A: (count, max) partials → radix shift so the high bits
              fit 2^16 buckets,
      pass B: 2^16-bucket histogram partials → driver prefix walk
              pins each rank's bucket + in-bucket residual rank,
      pass C: exact value histogram RESTRICTED to the (few) pinned
              buckets → driver selects.

    Three scans, each reducing to bounded driver state (65k ints); the
    data never moves.  ``make_ds()`` must return a fresh Dataset per
    pass (a lazy Dataset can be consumed once per execution but
    callers may hold non-reusable pipelines).  ``ranks`` are 1-based.
    """
    import pyarrow as pa

    def fold(ds, fn):
        t = pa.concat_tables(
            ds.map_batches(fn, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow"))
        return t

    def nm(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(v)], type=pa.int64()),
                         "mx": pa.array([int(v.max()) if len(v) else 0],
                                        type=pa.int64())})

    t = fold(make_ds(), nm)
    n = int(np.sum(t["n"].to_numpy()))
    mx = int(np.max(t["mx"].to_numpy())) if t.num_rows else 0
    if n_total is not None:
        assert n == n_total
    shift = max(0, int(mx).bit_length() - 16)

    def hist_hi(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        c = np.bincount(v >> shift, minlength=1)
        nz = np.flatnonzero(c)
        return pa.table({"bkt": pa.array(nz.astype(np.int64)),
                         "c": pa.array(c[nz].astype(np.int64))})

    t = fold(make_ds(), hist_hi)
    counts = np.zeros((mx >> shift) + 2, dtype=np.int64)
    np.add.at(counts, t["bkt"].to_numpy(zero_copy_only=False),
              t["c"].to_numpy(zero_copy_only=False))
    cum = np.cumsum(counts)
    targets = {}                      # bucket -> [(rank, residual)]
    for k in ranks:
        b = int(np.searchsorted(cum, k, side="left"))
        res = k - (int(cum[b - 1]) if b > 0 else 0)
        targets.setdefault(b, []).append((k, res))
    want = np.array(sorted(targets), dtype=np.int64)

    def hist_lo(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        keep = np.isin(v >> shift, want)
        v = v[keep]
        uv, cv = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv.astype(np.int64)),
                         "c": pa.array(cv.astype(np.int64))})

    t = fold(make_ds(), hist_lo)
    uv, inv = np.unique(t["v"].to_numpy(zero_copy_only=False),
                        return_inverse=True)
    cv = np.zeros(len(uv), dtype=np.int64)
    np.add.at(cv, inv, t["c"].to_numpy(zero_copy_only=False))
    out = {}
    for b, lst in targets.items():
        m = (uv >> shift) == b
        vals, cnts = uv[m], cv[m]
        ccum = np.cumsum(cnts)
        for k, res in lst:
            out[k] = int(vals[np.searchsorted(ccum, res, side="left")])
    return out
