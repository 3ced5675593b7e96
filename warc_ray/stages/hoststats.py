"""Hot-host salted aggregation (G11).

The synthetic web is deliberately Zipf-skewed: host-0 owns ~20% of all
documents (corpus.py host_index), so any groupby-on-host sends a fifth
of the data to one reducer.  The classic fix: a COUNT pre-pass picks a
salt factor k per hot key, stage 1 groups by ``host#(hash % k)``
(parallel partial aggregates), stage 2 merges the k salted partials —
two small shuffles instead of one skewed one.

Used on the link table (millions of rows at bench scale); the same
pattern applies to any host-keyed reduce over fetched records.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

HOST_RE = r"^https?://(?P<host>[^/:]+)"


def add_host_column(batch: pa.Table, url_col: str = "url") -> pa.Table:
    m = pc.extract_regex(batch[url_col], HOST_RE)
    host = pc.struct_field(m, "host")
    return batch.append_column("host", pc.cast(host, pa.string()))


def estimate_host_counts(ds: rd.Dataset, url_col: str = "url") -> dict[str, int]:
    """COUNT pre-pass: per-batch partials → tiny driver-side dict."""
    def partial(b: pa.Table) -> pa.Table:
        t = add_host_column(b, url_col)
        g = t.group_by("host").aggregate([("host", "count")])
        return g.rename_columns(["host", "n"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n", alias_name="n"))
    # one Arrow pull of the (host-cardinality-sized) aggregate — not a
    # row-at-a-time driver loop
    t = pa.Table.from_pandas(agg.to_pandas())
    return dict(zip(t["host"].to_pylist(),
                    (int(n) for n in t["n"].to_pylist())))


def salt_factors(counts: dict[str, int], target_per_group: int = 50_000,
                 max_salt: int = 32) -> dict[str, int]:
    """k per host that needs splitting (k=1 hosts are left unsalted)."""
    return {
        h: min(max_salt, -(-n // target_per_group))
        for h, n in counts.items() if n > target_per_group
    }


class AddSaltedHost:
    """map_batches stage: host → ``host#<hash%k>`` for hot hosts.

    The (small) salt map is broadcast once via ray.put and resolved in
    ``__init__`` — once per actor, never per batch."""

    def __init__(self, salts_ref, url_col: str = "url"):
        self.salts = (salts_ref if isinstance(salts_ref, dict)
                      else ray.get(salts_ref))
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        batch = add_host_column(batch, self.url_col)
        hosts = batch["host"].to_pylist()
        if not self.salts:
            salted = hosts
        else:
            # deterministic spread (crc32 of the url — row position is
            # not stable across runs, value hashes are)
            urls = batch[self.url_col].to_pylist()
            salted = [
                "%s#%d" % (h, zlib.crc32(u.encode()) % self.salts[h])
                if h in self.salts else h
                for h, u in zip(hosts, urls)
            ]
        return batch.append_column("host_salted",
                                   pa.array(salted, type=pa.string()))


def host_link_stats(ds: rd.Dataset, url_col: str = "url",
                    target_per_group: int = 50_000) -> rd.Dataset:
    """Per-host inbound-link stats with hot-key salting:
    (host, n_links, n_src_docs is NOT computed — count + min/max src).

    Output columns: host, n_links, min_src, max_src — named identically
    in the SQL oracle."""
    counts = estimate_host_counts(ds, url_col)
    salts = salt_factors(counts, target_per_group)
    salts_ref = ray.put(salts)

    def partial(b: pa.Table) -> pa.Table:
        t = AddSaltedHost(salts_ref, url_col)(b)
        g = t.group_by("host_salted").aggregate(
            [("host_salted", "count"), ("src_doc", "min"), ("src_doc", "max")])
        return g.rename_columns(["host_salted", "n_links", "min_src", "max_src"])

    # stage 1: reduce on the SALTED key (skew split across k groups)
    stage1 = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host_salted").aggregate(
            Sum("n_links", alias_name="n_links"),
            Min("min_src", alias_name="min_src"),
            Max("max_src", alias_name="max_src"))

    # stage 2: strip the salt, merge the k partials per hot host
    def strip(b: pa.Table) -> pa.Table:
        hosts = [h.split("#", 1)[0] for h in b["host_salted"].to_pylist()]
        return pa.table({
            "host": pa.array(hosts, type=pa.string()),
            "n_links": b["n_links"],
            "min_src": b["min_src"],
            "max_src": b["max_src"],
        })

    return stage1.map_batches(strip, batch_format="pyarrow") \
        .groupby("host").aggregate(
            Sum("n_links", alias_name="n_links"),
            Min("min_src", alias_name="min_src"),
            Max("max_src", alias_name="max_src"))
