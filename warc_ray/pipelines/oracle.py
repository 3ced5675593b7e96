"""Single-process crawl oracle (G14).

Drives the SAME components as the distributed loop — ``FrontierCore``,
``fetch_rows``, ``extract_links``, ``canonicalize_batch`` — in one
process with plain loops.  The distributed crawl must reproduce this
oracle's fetch log (crawl order) and final cuckoo tables (URL-seen set)
exactly, under the same seed list + politeness budget (BASELINE.json).
One code path, two drivers → parity by construction; the test then
verifies the *distributed machinery* (routing, barriers, actor state)
preserves it.
"""

from __future__ import annotations

import pyarrow as pa

from .. import corpus as corpus_mod
from ..stages.fetch import fetch_rows
from ..stages.urls import canonicalize_batch, extract_links, urls_from_seeds
from ..state.frontier import (
    FrontierConfig,
    FrontierCore,
    robots_to_shard_dict,
    shard_of,
    split_by_host_shard,
)
from ..schema import SPAN_STRUCT

LOG_FIELDS = ("url", "host", "doc_id", "status", "round", "fetch_seq", "depth")


def _route_offer(cores: list[FrontierCore], table: pa.Table, num_shards: int) -> int:
    n = 0
    for s, sub in enumerate(split_by_host_shard(table, num_shards)):
        if sub is not None:
            n += cores[s].offer(sub)
    return n


def simulate(corpus_dir: str, *, config: FrontierConfig | None = None) -> dict:
    cfg = config or FrontierConfig()
    profile = corpus_mod.profile_for_sf_dir  # noqa: F841 (doc pointer)
    import json, os

    prof = corpus_mod.PROFILES[json.load(open(os.path.join(corpus_dir, "MANIFEST.json")))["name"]]

    robots = robots_to_shard_dict(corpus_mod.read_robots(corpus_dir))
    cores = [
        FrontierCore(s, cfg, {h: r for h, r in robots.items()
                              if shard_of(h, cfg.num_shards) == s})
        for s in range(cfg.num_shards)
    ]

    seeds = urls_from_seeds(corpus_mod.read_seeds(corpus_dir))
    _route_offer(cores, seeds, cfg.num_shards)
    for c in cores:
        c.seal_round()

    log: list[tuple] = []
    t = 0
    rounds = 0
    while t < cfg.max_rounds:
        emits = [c.pop_round(t) for c in cores]
        emits = [e for e in emits if e.num_rows]
        if not emits:
            if not any(c.has_pending() for c in cores):
                break
            nexts = [x for x in (c.earliest_allowed(t) for c in cores) if x is not None]
            t = max(t + 1, min(nexts)) if nexts else t + 1
            continue
        emit = pa.concat_tables(emits)
        urls = emit["url"].to_pylist()
        fetched = fetch_rows(urls, corpus_dir, prof.n_buckets)
        hosts = emit["host"].to_pylist()
        rnds = emit["round"].to_pylist()
        seqs = emit["fetch_seq"].to_pylist()
        depths = emit["depth"].to_pylist()
        for u, h, rn, sq, dp, (doc_id, status, _ct, _body, _spans) in zip(
                urls, hosts, rnds, seqs, depths, fetched):
            log.append((u, h, doc_id, status, rn, sq, dp))
        # link discovery through the SAME extract/canonicalize stages
        fetched_tbl = pa.table({
            "doc_id": pa.array([f[0] for f in fetched]),
            "spans": pa.array([f[4] for f in fetched], type=pa.list_(SPAN_STRUCT)),
            "depth": pa.array(depths, type=pa.int32()),
        })
        links = canonicalize_batch(extract_links(fetched_tbl, doc_col="doc_id",
                                                 depth_col="depth"))
        _route_offer(cores, links, cfg.num_shards)
        for c in cores:
            c.seal_round()
        rounds += 1
        t += 1

    log_types = {"url": pa.string(), "host": pa.string(), "doc_id": pa.string(),
                 "status": pa.int32(), "round": pa.int32(),
                 "fetch_seq": pa.int64(), "depth": pa.int32()}
    log_tbl = pa.table({
        name: pa.array([r[i] for r in log], type=log_types[name])
        for i, name in enumerate(LOG_FIELDS)
    })
    return {
        "log": log_tbl,
        "filter_bytes": [c.filter.table.tobytes() for c in cores],
        "stats": [dict(c.counters, shard_id=c.shard_id) for c in cores],
        "rounds": rounds,
        "last_round": t,
    }
