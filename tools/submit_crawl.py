#!/usr/bin/env python
"""Cluster job entry for the crawl pipeline (BASELINE.json north rule:
"run via ray job submit on a fixed-size multi-node Ray cluster").

Usage on a real cluster (N or 4N nodes — the same entry both sizes)::

    ray job submit --working-dir . -- \
        python tools/submit_crawl.py --corpus /data/corpus/benchxl2 \
            --out /data/out/crawl-run1 --rounds 12 --budget 128

In-sandbox the same script runs against a local session (it connects
with ``address="auto"`` when a cluster is reachable, else starts a
local one); ``bench.py --scaling`` is the sandbox stand-in for the
two-cluster-size criterion and uses the same ``run_crawl`` entry.

Pool sizing scales with the CLUSTER, not a constant: frontier shards
default to total_CPUs/2 (crawl results are invariant to the shard
count — tests/test_crawl_parity.py::test_shard_count_invariance), and
the fetch:writer split inside run_crawl is derived from measured
per-URL costs.  Output lands under round=NNNNN/ partitioned dirs with
a lineage manifest, so a resubmitted job with --resume skips finished
rounds (resumable-output requirement).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="corpus dir (from warc_ray.corpus.ensure_corpus) "
                         "or a profile name to generate")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--budget", type=int, default=128,
                    help="per-host per-round fetch budget (token rate; "
                         "burst = 2x)")
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--shards", type=int, default=0,
                    help="frontier shards; 0 = cluster CPUs // 2")
    ap.add_argument("--fetch-workers", type=int, default=0,
                    help="fetch actor pool size; 0 = measured-cost split")
    ap.add_argument("--filter-capacity", type=int, default=0,
                    help="per-shard cuckoo capacity; 0 = sized to corpus")
    ap.add_argument("--checkpoint-every", type=int, default=4,
                    help="rounds between frontier checkpoints (0 = off)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the out dir's last checkpoint")
    ap.add_argument("--no-warc", action="store_true",
                    help="skip WARC assembly (frontier-only job)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` the cluster is already up -> "auto";
        # standalone (sandbox, CI) that fails fast and we start local.
        try:
            ray.init(address="auto", ignore_reinit_error=True,
                     logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")

    from warc_ray import corpus as corpus_mod
    from warc_ray.pipelines.crawl import run_crawl
    from warc_ray.state.frontier import FrontierConfig

    cdir = (args.corpus if os.path.isdir(args.corpus)
            else corpus_mod.ensure_corpus(args.corpus))
    prof = corpus_mod.PROFILES[
        json.load(open(os.path.join(cdir, "MANIFEST.json")))["name"]]

    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    n_shards = args.shards or max(4, total_cpus // 2)
    cap = args.filter_capacity
    if not cap:
        cap = 1
        while cap * n_shards < 6 * prof.n_docs:
            cap <<= 1

    cfg = FrontierConfig(rate=float(args.budget), burst=2 * args.budget,
                         per_round_host_budget=args.budget,
                         num_shards=n_shards, max_rounds=args.rounds,
                         max_depth=args.max_depth, filter_capacity=cap)
    stats = run_crawl(cdir, args.out, config=cfg,
                      write_warc=not args.no_warc,
                      checkpoint_every=args.checkpoint_every,
                      resume=args.resume,
                      fetch_concurrency=args.fetch_workers or None)
    stats["cluster_cpus"] = total_cpus
    stats["num_shards"] = n_shards
    # raw per-shard cuckoo tables (bytes, for parity checks) aren't
    # JSON; report their fingerprint + size instead
    filters = stats.pop("filter_bytes", None)
    if filters:
        import hashlib

        stats["filter_sha1"] = hashlib.sha1(b"".join(filters)).hexdigest()
        stats["filter_bytes_total"] = sum(len(b) for b in filters)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
