"""Distributed crawl loop (G9): round-barrier frontier over Ray Data.

Per logical round ``t``::

    emit    = ray.get([shard.pop_round(t) ...])        # politeness-bounded
    fetched = Dataset(emit).groupby(bucket).map_groups(FetchGroup)
    WARC    = fetched → request/response records → gz shards (round dir)
    links   = fetched → extract spans → canonicalize → offer to shards
              (pushed directly from map_batches tasks — no driver hop)
    seal    = ray.get([shard.seal_round() ...])        # round barrier

The barrier per round is REQUIRED for exact crawl-order parity with the
single-process oracle (SURVEY.md §4 Ordering); throughput comes from
within-round parallelism.  Outputs are round-keyed directories with a
manifest per round → a restarted run resumes from the last checkpoint
and skips completed rounds (G16).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import corpus as corpus_mod
from ..sinks.warc_sink import write_warc_shards
from ..stages.assemble import fetch_to_warc_records, logical_date, serialize_records
from ..stages.fetch import FetchGroup, add_bucket_column
from ..stages.urls import canonicalize_batch, extract_links
from ..state.frontier import (
    FrontierConfig,
    make_frontier_shard_cls,
    robots_to_shard_dict,
    shard_of,
)

LOG_COLS = ["url", "host", "doc_id", "status", "round", "fetch_seq", "depth"]


def route_and_offer(table: pa.Table, shards, num_shards: int) -> int:
    """Split a canonical-URL table by host-hash shard and push offers.

    Runs on whatever process holds the batch (driver for seeds, Ray
    workers for in-crawl links); acks are awaited so the caller's
    barrier guarantees all offers landed before seal.
    """
    if table.num_rows == 0:
        return 0
    hosts = table["host"].to_pylist()
    sid = [shard_of(h, num_shards) for h in hosts]
    refs = []
    import numpy as np

    sid = np.array(sid)
    for s in range(num_shards):
        mask = sid == s
        if mask.any():
            refs.append(shards[s].offer.remote(table.filter(pa.array(mask))))
    return sum(ray.get(refs))


class OfferLinks:
    """map_batches stage: fetched rows → extracted+canonical links →
    direct actor offers.  Emits one count row per batch."""

    def __init__(self, shards, num_shards: int):
        self.shards = shards
        self.num_shards = num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        links = extract_links(batch, doc_col="doc_id", depth_col="depth")
        links = canonicalize_batch(links)
        n = route_and_offer(links, self.shards, self.num_shards)
        return pa.table({"offered": pa.array([n], type=pa.int64())})


def run_crawl(corpus_dir: str, out_dir: str, *,
              config: FrontierConfig | None = None,
              write_warc: bool = True,
              checkpoint_every: int = 0,
              resume: bool = False,
              fetch_concurrency: int | None = None) -> dict:
    """Run the crawl; returns stats.  Fetch log parquet lands under
    ``out_dir/round=NNNNN/log/``, WARC shards under ``.../warc/``."""
    profile = corpus_mod.PROFILES[json.load(open(os.path.join(corpus_dir, "MANIFEST.json")))["name"]]
    cfg = config or FrontierConfig()
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoint")
    manifest_path = os.path.join(out_dir, "CRAWL_MANIFEST.json")

    Shard = make_frontier_shard_cls()
    robots_ref = ray.put(robots_to_shard_dict(corpus_mod.read_robots(corpus_dir)))

    start_round = 0
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        start_round = m["next_round"]
        shards = [
            Shard.remote(s, cfg, robots_ref,
                         restore_path=os.path.join(ckpt_dir, f"shard-{s:03d}.pkl"))
            for s in range(cfg.num_shards)
        ]
    else:
        shards = [Shard.remote(s, cfg, robots_ref) for s in range(cfg.num_shards)]
        # round -1: seed the frontier
        from ..stages.urls import urls_from_seeds

        seeds = urls_from_seeds(corpus_mod.read_seeds(corpus_dir))
        route_and_offer(seeds, shards, cfg.num_shards)
        ray.get([s.seal_round.remote() for s in shards])

    _fg = FetchGroup(corpus_dir, profile.n_buckets)

    def fetcher(group: pa.Table) -> pa.Table:  # map_groups wants __name__
        return _fg(group)
    t = start_round
    rounds_run = 0
    total_fetched = 0
    while t < cfg.max_rounds:
        tables = [tb for tb in ray.get([s.pop_round.remote(t) for s in shards])
                  if tb.num_rows]
        if not tables:
            if not any(ray.get([s.has_pending.remote() for s in shards])):
                break
            nexts = [x for x in ray.get([s.earliest_allowed.remote(t) for s in shards])
                     if x is not None]
            t = max(t + 1, min(nexts)) if nexts else t + 1
            continue
        emit = pa.concat_tables(tables)
        round_dir = os.path.join(out_dir, f"round={t:05d}")
        os.makedirs(os.path.join(round_dir, "log"), exist_ok=True)

        urls_ds = rd.from_arrow(emit).map_batches(
            lambda b: add_bucket_column(b, profile.n_buckets),
            batch_format="pyarrow",
        )
        fetched = urls_ds.groupby("bucket").map_groups(
            fetcher, batch_format="pyarrow"
        ).materialize()           # round-sized (politeness-bounded)

        # fetch log (parquet, round-keyed → resumable)
        blocks = ray.get(fetched.to_arrow_refs())
        log_tbl = pa.concat_tables([b.select(LOG_COLS) for b in blocks])
        pq.write_table(log_tbl, os.path.join(round_dir, "log", "part-0.parquet"))
        total_fetched += log_tbl.num_rows

        if write_warc:
            records = fetched.map_batches(fetch_to_warc_records, batch_format="pyarrow")
            serialized = records.map_batches(serialize_records, batch_format="pyarrow")
            cdx = write_warc_shards(serialized, os.path.join(round_dir, "warc"),
                                    date=logical_date(t))
            cdx.write_parquet(os.path.join(round_dir, "cdx"))

        # discover + offer next frontier (pushed from workers)
        fetched.map_batches(OfferLinks(shards, cfg.num_shards),
                            batch_format="pyarrow").sum("offered")
        ray.get([s.seal_round.remote() for s in shards])

        rounds_run += 1
        t += 1
        if checkpoint_every and rounds_run % checkpoint_every == 0:
            _checkpoint(shards, ckpt_dir, manifest_path, t, cfg)

    if checkpoint_every:
        _checkpoint(shards, ckpt_dir, manifest_path, t, cfg)
    stats = ray.get([s.stats.remote() for s in shards])
    filters = ray.get([s.filter_table_bytes.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    return {
        "rounds": rounds_run,
        "last_round": t,
        "total_fetched": total_fetched,
        "shard_stats": stats,
        "filter_bytes": filters,
        "out_dir": out_dir,
    }


def _checkpoint(shards, ckpt_dir: str, manifest_path: str, next_round: int,
                cfg: FrontierConfig) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    ray.get([
        s.checkpoint.remote(os.path.join(ckpt_dir, f"shard-{i:03d}.pkl"))
        for i, s in enumerate(shards)
    ])
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"next_round": next_round, "config": asdict(cfg)}, f)
    os.replace(tmp, manifest_path)


def read_fetch_log(out_dir: str) -> "rd.Dataset":
    """Union of all round logs (use for reports/parity checks)."""
    import glob

    paths = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "log")
        if d.startswith("round=") and os.path.isdir(p):
            paths.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
    return rd.read_parquet(paths)
