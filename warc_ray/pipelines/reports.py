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


def robots_audit(log_ds: rd.Dataset, robots: pa.Table) -> pa.Table:
    """q259: robots-compliance audit — for every host that publishes
    disallow rules: rule count, fetches recorded, and VIOLATIONS
    (fetched URLs whose path falls under a disallowed prefix — the
    invariant the frontier's robots gate must keep at exactly zero,
    here re-proved by an independent query over the output log instead
    of trusted from the gate's own counters).

    Scale shape: the rules table is the broadcast-small side (one row
    per host, prefixes nested); per batch the path column is one regex
    kernel and each (host, prefix) rule is a vectorized mask — the
    rule count, not the log size, bounds the loop.  Per-host partials
    fold in a ≤hosts-row groupby; no exchange of log rows."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    hosts = robots["host"].to_pylist()
    prefs = robots["disallow_prefixes"].to_pylist()
    ruled = [(h, tuple(p)) for h, p in zip(hosts, prefs) if p]
    rule_hosts = [h for h, _ in ruled]

    def partial(b: pa.Table) -> pa.Table:
        from ..state.frontier import rep_rule_to_regex

        path = pc.struct_field(
            pc.extract_regex(b["url"], r"^https?://[^/]+(?P<path>/.*)$"),
            "path")
        out_h, out_f, out_v = [], [], []
        for h, plist in ruled:
            on_host = pc.equal(b["host"], h)
            n_f = int(pc.sum(pc.cast(on_host, pa.int64())).as_py() or 0)
            viol = 0
            for p in plist:
                # full REP rule forms: plain prefixes keep the
                # starts_with kernel; '*'/'$' rules run the SAME
                # regex translation the frontier gate compiles
                # (state/frontier.rep_rule_to_regex) as one RE2 kernel
                if "*" in p or p.endswith("$"):
                    hit = pc.match_substring_regex(
                        path, rep_rule_to_regex(p))
                else:
                    hit = pc.starts_with(path, p)
                m = pc.and_(on_host, pc.fill_null(hit, False))
                viol += int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)
            out_h.append(h)
            out_f.append(n_f)
            out_v.append(viol)
        return pa.table({
            "host": pa.array(out_h, type=pa.string()),
            "n_fetched": pa.array(out_f, type=pa.int64()),
            "n_violations": pa.array(out_v, type=pa.int64())})

    agg = log_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host") \
        .aggregate(Sum("n_fetched", alias_name="n_fetched"),
                   Sum("n_violations", alias_name="n_violations"))
    rows = _pull(agg)
    got = {h: (int(f), int(v)) for h, f, v in
           zip(rows["host"].to_pylist(),
               rows["n_fetched"].to_pylist(),
               rows["n_violations"].to_pylist())} if rows.num_rows \
        else {}
    n_rules = {h: len(p) for h, p in ruled}
    return pa.table({
        "host": pa.array(rule_hosts, type=pa.string()),
        "n_rules": pa.array([n_rules[h] for h in rule_hosts],
                            type=pa.int64()),
        "n_fetched": pa.array([got.get(h, (0, 0))[0]
                               for h in rule_hosts], type=pa.int64()),
        "n_violations": pa.array([got.get(h, (0, 0))[1]
                                  for h in rule_hosts],
                                 type=pa.int64())}).sort_by("host")
