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
except ImportError:  # pragma: no cover - fallback: crc32 per row
    import zlib

    def hash64_strings(arr, seed: int = 42) -> np.ndarray:
        return np.array(
            [zlib.crc32((s or "").encode()) ^ seed for s in arr.to_pylist()],
            dtype=np.uint64)


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
