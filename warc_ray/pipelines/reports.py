"""Crawl reports (G17) + metrics aggregation (G15) over the fetch log.

All pure Ray Data over the round-keyed log parquet written by
pipelines/crawl.py — pre-aggregate per batch, then a small groupby;
sorts only on already-aggregated (small) results (SURVEY.md §2.B G17:
"sort shuffle" on report keys only, never the raw log).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def hottest_hosts(log_ds: rd.Dataset, k: int = 20) -> pa.Table:
    """Top-k hosts by fetch count: (host, n_fetched, n_ok, first_round,
    last_round), ordered n_fetched DESC, host ASC."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        ok = pc.cast(pc.equal(b["status"], 200), pa.int64())
        t = pa.table({"host": b["host"], "ok": ok, "round": b["round"]})
        g = t.group_by("host").aggregate(
            [("ok", "count"), ("ok", "sum"), ("round", "min"), ("round", "max")])
        return g.rename_columns(["host", "n_fetched", "n_ok",
                                 "first_round", "last_round"])

    agg = log_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            Sum("n_fetched", alias_name="n_fetched"),
            Sum("n_ok", alias_name="n_ok"),
            Min("first_round", alias_name="first_round"),
            Max("last_round", alias_name="last_round"))
    top = agg.sort(["n_fetched", "host"], descending=[True, False]).limit(k)
    return _pull(top).select(
        ["host", "n_fetched", "n_ok", "first_round", "last_round"])


def _pull(ds: rd.Dataset) -> pa.Table:
    """Small-result driver pull as ONE Arrow table — no pandas
    round-trip (round-2 VERDICT nit: Arrow→pandas→Arrow on top-k
    results loses types and copies twice for nothing)."""
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        return pa.table({})
    return pa.concat_tables([pa.table(t) if not isinstance(t, pa.Table)
                             else t for t in tabs])


def deepest_paths(log_ds: rd.Dataset, k: int = 20) -> pa.Table:
    """Top-k fetched URLs by crawl depth (depth DESC, url ASC)."""
    top = log_ds.sort(["depth", "url"], descending=[True, False]).limit(k)
    return _pull(top).select(
        ["url", "host", "depth", "round", "fetch_seq"])


def crawl_metrics(log_ds: rd.Dataset) -> pa.Table:
    """Per-round scheduling metrics: (round, n_fetched, n_ok, n_hosts,
    min_seq, max_seq) — the G15 aggregate the driver/ops dashboards
    read; per-shard counters (dedup hits, robots denials) live in the
    shard stats returned by run_crawl."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        ok = pc.cast(pc.equal(b["status"], 200), pa.int64())
        t = pa.table({"round": b["round"], "ok": ok,
                      "fetch_seq": b["fetch_seq"]})
        g = t.group_by("round").aggregate(
            [("ok", "count"), ("ok", "sum"),
             ("fetch_seq", "min"), ("fetch_seq", "max")])
        return g.rename_columns(["round", "n_fetched", "n_ok",
                                 "min_seq", "max_seq"])

    agg = log_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("round").aggregate(
            Sum("n_fetched", alias_name="n_fetched"),
            Sum("n_ok", alias_name="n_ok"),
            Min("min_seq", alias_name="min_seq"),
            Max("max_seq", alias_name="max_seq"))
    # distinct hosts per round: per-batch distinct shrinks the shuffle,
    # then two vectorized aggregates (distinct → count) — no per-group
    # Python (each (round, host) group would be a tiny Python call).
    n_hosts = log_ds.map_batches(
        lambda b: pa.table({"round": b["round"], "host": b["host"]})
        .group_by(["round", "host"]).aggregate([]),
        batch_format="pyarrow",
    ).groupby(["round", "host"]).aggregate(Count(alias_name="_c")) \
        .groupby("round").aggregate(Count(alias_name="n_hosts"))
    a = _pull(agg)
    h = _pull(n_hosts)
    return a.join(h, keys="round").sort_by("round")
