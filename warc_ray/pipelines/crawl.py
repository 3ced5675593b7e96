"""Distributed crawl loop (G9): round-barrier frontier over Ray actors.

Per logical round ``t``::

    emit    = ray.get([shard.pop_round(t) ...])        # politeness-bounded
    slices  = split emit by corpus bucket → worker (bucket % n_workers)
    counts  = ray.get([worker.process_round(t, slice) ...])
              # each worker: fetch → log parquet → WARC shard + CDX →
              #              extract links → offer to frontier shards
    seal    = ray.get([shard.seal_round() ...])        # round barrier

The barrier per round is REQUIRED for exact crawl-order parity with the
single-process oracle (SURVEY.md §4 Ordering); throughput comes from
within-round parallelism.  Outputs are round-keyed directories with a
manifest per round → a restarted run resumes from the last checkpoint
and skips completed rounds (G16).

Why raw actors, not per-round ``Dataset`` pipelines (SURVEY.md §2.B
"custom operators", case (b)): a crawl round is a small,
politeness-bounded batch (≤ burst × hosts rows) but there are hundreds
of rounds.  Expressing each round as Dataset.map_batches/groupby costs
a fresh task/actor pool + an all-to-all shuffle per round — fixed
overhead that dominated wall-time ~50× over the useful work at bench
scale.  Persistent ``CrawlWorker`` actors keep bucket caches and WARC
sinks warm across rounds; the bucket → worker assignment is stable
(``bucket % n_workers``) so each corpus bucket file is read by exactly
one worker for the whole crawl (same co-partitioning a 256-node
cluster would use).  The bulk, non-iterative paths (corpus → WARC
archive, readers, reports) remain plain Ray Data pipelines
(pipelines/archive.py, sources/).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import corpus as corpus_mod
from ..sinks.warc_sink import WriteWarcShard, write_fused_round
from ..stages.assemble import (
    fetch_to_warc_records,
    fused_fetch_records,
    logical_date,
    serialize_records,
)
from ..stages.fetch import FetchGroup, add_bucket_column
from ..stages.urls import canonicalize_batch, extract_links
from ..state.frontier import (
    FrontierConfig,
    make_frontier_shard_cls,
    robots_to_shard_dict,
    split_by_host_shard,
)

LOG_COLS = ["url", "host", "doc_id", "status", "round", "fetch_seq", "depth"]
# exactly what fused_fetch_records reads — the writer-IPC payload
WRITER_COLS = ["url", "host", "status", "round", "content_type", "body",
               "depth", "fetch_seq"]

# (corpus_dir, n_buckets, num_shards, n_workers, n_writers) -> pools.
# Worker/writer actors are stateless between runs (bind_run resets the
# per-run bits) so they are reused across run_crawl calls in a process.
_POOL_CACHE: dict = {}


def _single_threaded_arrow() -> None:
    """Cap this process's Arrow kernel/IO pools at 1 thread.

    Every actor process otherwise spins up an Arrow pool sized to the
    MACHINE's core count — 13 actors x 32 threads oversubscribed an
    8-CPU cluster ~50x and tripled wall time.  Parallelism here comes
    from the actor pools, not intra-kernel threads."""
    import gc
    import pyarrow as _pa

    _pa.set_cpu_count(1)
    _pa.set_io_thread_count(1)
    # Stretch GC cadence ~20x: crawl actors hold large long-lived
    # containers (bucket index maps, buffered log tables), and CPython's
    # default cadence runs a full gen-2 scan over all of them every
    # ~70k container allocations — a fixed multi-100ms tax per round at
    # full batch rate.  Almost all garbage here is refcount-freed, so
    # collections are purely cycle insurance.
    gc.set_threshold(50_000, 25, 25)
    # heal scheduling policy: this process may previously have hosted a
    # SCHED_BATCH WarcWriter (Ray reuses worker processes); fetch and
    # frontier actors are latency-critical
    try:
        os.sched_setscheduler(0, os.SCHED_OTHER, os.sched_param(0))
    except (AttributeError, OSError):
        pass


def route_and_offer(table: pa.Table, shards, num_shards: int) -> int:
    """Split a canonical-URL table by host-hash shard and push offers.

    Runs on whatever process holds the batch (driver for seeds,
    CrawlWorker actors in-crawl); acks are awaited so the caller's
    barrier guarantees all offers landed before seal.
    """
    if table.num_rows == 0:
        return 0
    refs = [
        shards[s].offer.remote(sub)
        for s, sub in enumerate(split_by_host_shard(table, num_shards))
        if sub is not None
    ]
    return sum(ray.get(refs))


class OfferLinks:
    """map_batches stage: fetched rows → extracted+canonical links →
    direct actor offers.  Emits one count row per batch.  (Used by the
    Dataset-based re-crawl paths/tests; the crawl loop's workers call
    the same extract/canonicalize/route functions inline.)"""

    def __init__(self, shards, num_shards: int):
        self.shards = shards
        self.num_shards = num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        links = extract_links(batch, doc_col="doc_id", depth_col="depth")
        links = canonicalize_batch(links)
        n = route_and_offer(links, self.shards, self.num_shards)
        return pa.table({"offered": pa.array([n], type=pa.int64())})


@ray.remote
class WarcWriter:
    """Persistent WARC assembly/compression worker.

    Off the round critical path on purpose: WARC output never feeds the
    frontier, so gzip (the single largest CPU cost) pipelines ACROSS
    round barriers in a dedicated long-lived actor pool (persistent
    processes — floating tasks churned Ray worker processes and
    stalled the loop).  The crawl driver holds the returned refs and
    flushes them before each checkpoint (durability) and at the end."""

    def __init__(self, writer_id: int = 0):
        _single_threaded_arrow()
        self.writer_id = writer_id
        self._cdx_buf: list = []
        # Deprioritize the compressor pool with SCHED_BATCH, NOT
        # os.nice(): Ray reuses worker PROCESSES across actor
        # lifetimes, and nice can never be lowered back without
        # CAP_SYS_NICE — one bench run left every ray::IDLE process
        # niced and later fetch workers ran degraded.  SCHED_BATCH is
        # unprivileged in BOTH directions (latency-critical actors
        # reset to SCHED_OTHER in their own init), and gives fetch /
        # frontier wakeups preemption preference over the long-running
        # gzip slices.
        try:
            os.sched_setscheduler(0, os.SCHED_BATCH, os.sched_param(0))
        except (AttributeError, OSError):
            pass

    def write_round(self, fetched: pa.Table, round_dir: str, part_id: str,
                    date_str: str) -> int:
        import time as _t

        _b0 = _t.perf_counter()
        _c0 = _t.process_time()
        # fused assembly+gzip (write_fused_round): the writer pool is
        # memory-bandwidth-bound at full node occupancy, so the record
        # bytes never materialize — bodies stream Arrow→sha1→deflate.
        # _busy_asm stays 0 by construction (folded into the member
        # loop); byte parity with the two-pass path is pytest-pinned.
        cdx = write_fused_round(fetched, os.path.join(round_dir, "warc"),
                                date_str)
        self._busy_asm = getattr(self, "_busy_asm", 0.0)
        # CDX rows buffer in-actor and flush at checkpoint barriers /
        # crawl end (same durability granularity as the fetch log) —
        # a parquet file per 2048-row chunk was ~3k tiny files and a
        # measurable slice of writer busy time.  CDX is re-derivable
        # from the WARC shards themselves, so a crash loses nothing.
        self._cdx_buf.append(cdx)
        self._busy = getattr(self, "_busy", 0.0) + (_t.perf_counter() - _b0)
        # wall vs CPU split: busy-wall >> busy-cpu means the writer was
        # preempted mid-call (oversubscribed node), not doing more work
        self._busy_cpu = getattr(self, "_busy_cpu", 0.0) + (_t.process_time() - _c0)
        return cdx.num_rows

    def flush_cdx(self, out_dir: str, upto: int) -> int:
        """Write buffered CDX rows as one parquet part under
        ``out_dir/cdx/`` (rounds < upto; filename is rerun-stable)."""
        if not self._cdx_buf:
            return 0
        tbl = pa.concat_tables(self._cdx_buf)
        self._cdx_buf = []
        # (shard, offset) is a natural deterministic total order (one
        # gzip member per compressed offset per file) — canonicalize
        # so part contents don't depend on write_round arrival order.
        # Parts stay content-identical across runs up to the absolute
        # output-path prefix embedded in ``shard``.
        tbl = tbl.sort_by([("shard", "ascending"), ("offset", "ascending")])
        cdx_dir = os.path.join(out_dir, "cdx")
        os.makedirs(cdx_dir, exist_ok=True)
        pq.write_table(tbl, os.path.join(
            cdx_dir, f"part-{self.writer_id:03d}-r{upto:05d}.parquet"))
        return tbl.num_rows

    def reset_run(self) -> float:
        """Drop state from a previous (possibly aborted) run on pool
        reuse; returns and clears the busy counter."""
        self._cdx_buf = []
        b = getattr(self, "_busy", 0.0)
        self._busy = self._busy_cpu = self._busy_asm = 0.0
        return b

    def busy_seconds(self) -> tuple:
        """Cumulative write_round (wall, cpu, assembly-wall) work time."""
        b = (getattr(self, "_busy", 0.0), getattr(self, "_busy_cpu", 0.0),
             getattr(self, "_busy_asm", 0.0))
        self._busy = self._busy_cpu = self._busy_asm = 0.0
        return b

    def seed_slice(self, seeds: pa.Table, lo: int, hi: int,
                   shards, num_shards: int) -> int:
        """Canonicalize+route one seed row-range (parallel seeding —
        writers are idle before round 0, so they seed too)."""
        from ..stages.urls import urls_from_seeds

        part = urls_from_seeds(seeds.slice(lo, hi - lo), offset0=lo)
        return route_and_offer(part, shards, num_shards)


@ray.remote
class CrawlWorker:
    """Persistent per-round fetch/assemble/offer worker.

    Owns buckets ``{b : b % n_workers == worker_id}`` for the whole
    crawl: the bucket→spans cache stays warm, and every output file the
    worker writes is keyed ``(round, worker_id)`` → reruns of a round
    overwrite their own files (idempotent, resumable).
    """

    # worker-side re-offer suppression set cap: above this the set is
    # cleared (suppression is best-effort traffic shaping — a cleared
    # set only costs duplicate offers the shard dedups anyway)
    OFFERED_SET_CAP = 16_000_000

    def __init__(self, worker_id: int, corpus_dir: str, n_buckets: int,
                 shards, num_shards: int, out_dir: str, writers=None):
        _single_threaded_arrow()
        self.worker_id = worker_id
        self.fetch = FetchGroup(corpus_dir, n_buckets)
        self.shards = shards
        self.num_shards = num_shards
        self.out_dir = out_dir
        self.writers = writers or []
        self._log_buf: list = []
        from ..state.u64set import U64Set

        self._offered = U64Set()
        self._round_t: int | None = None
        self._round_pending: list = []

    def bind_run(self, shards, out_dir: str) -> None:
        """Rebind to a new crawl run (pool reuse): fresh frontier shard
        handles + output dir; the bucket cache stays warm."""
        self.shards = shards
        self.out_dir = out_dir
        self._log_buf = []
        self._offered.clear()
        self._round_t = None
        self._round_pending = []

    def flush_log(self, upto: int) -> int:
        """Write buffered fetch-log rows (rounds < upto) as one parquet
        part.  Called at checkpoint barriers and at crawl end — log
        durability has checkpoint granularity, and per-round tiny-file
        writes were a measurable slice of the round critical path."""
        if not self._log_buf:
            return 0
        tbl = pa.concat_tables(self._log_buf)
        self._log_buf = []
        # Canonical row order at flush: the buffer concatenates shard
        # slices in ray.wait ARRIVAL order, which varies run-to-run
        # even though the row multiset is deterministic.  Sorting by
        # all columns here makes each part file byte-stable, so crash
        # recovery (tools/kill_resume_check.py) can assert sha1
        # equality on log parts, not just content equality
        # (round-3 ADVICE).  Cost: one sort of this worker's buffered
        # rows per checkpoint barrier — off the round critical path.
        tbl = tbl.sort_by([(c, "ascending") for c in tbl.column_names])
        log_dir = os.path.join(self.out_dir, "log")
        os.makedirs(log_dir, exist_ok=True)
        pq.write_table(tbl, os.path.join(
            log_dir, f"part-{self.worker_id:03d}-r{upto:05d}.parquet"))
        return tbl.num_rows

    def seed_slice(self, seeds: pa.Table, lo: int, hi: int,
                   shards, num_shards: int) -> int:
        from ..stages.urls import urls_from_seeds

        part = urls_from_seeds(seeds.slice(lo, hi - lo), offset0=lo)
        return route_and_offer(part, shards, num_shards)

    def process_round_refs(self, t: int, slice_refs: list,
                           write_warc: bool) -> dict:
        """process_round over shard-side-split slices: the driver hands
        this worker the ObjectRefs of ITS slices only — emitted rows
        flow shard → worker through the object store, never the
        driver.  Slices are processed in READINESS order (``ray.wait``),
        not shard order: the driver submits this call before the pops
        resolve, so the worker fetches every fast shard's emissions
        while the hot shard (the per-round straggler) is still sealing —
        its seal+pop tail stops gating the other shards' fetch work.
        Ready slices are processed in WAVES (everything complete at each
        ``ray.wait`` return is concatenated into one call), so the
        vectorized fetch/extract/offer path keeps its batch width —
        typically two waves: the fast shards together, then the hot one.
        The ``wave`` tag keeps WARC part ids unique per call."""
        sid_of = {r: i for i, r in enumerate(slice_refs)}
        pend = list(slice_refs)
        agg = {"fetched": 0, "offer_refs": [], "warc_refs": [],
               "tm": [0.0, 0.0, 0.0, 0.0]}
        while pend:
            done, pend = ray.wait(pend, num_returns=1)
            if pend:  # drain everything else that is already complete
                more, pend = ray.wait(pend, num_returns=len(pend), timeout=0)
                done += more
            # keep the SHARD id with each slice: WARC chunk ids derive
            # from it, so archive file layout is a pure function of the
            # round content — wave composition (which slices happened
            # to be ready together) never leaks into output bytes
            slices = [(sid_of[r], tb) for r, tb in zip(done, ray.get(done))
                      if tb.num_rows]
            if not slices:
                continue
            one = self.process_round(t, slices, write_warc)
            agg["fetched"] += one["fetched"]
            agg["offer_refs"].extend(one["offer_refs"])
            agg["warc_refs"].extend(one["warc_refs"])
            agg["tm"] = [a + b for a, b in zip(agg["tm"], one["tm"])]
        agg["tm"] = tuple(agg["tm"])
        return agg

    def process_round(self, t: int, slices: list, write_warc: bool) -> dict:
        """``slices``: list of ``(shard_id, url_table)`` — fetch and
        extraction run over the concatenation (vector width), WARC
        dispatch runs per SLICE so chunk ids/file names are
        deterministic (shard id, not arrival wave)."""
        import time as _t
        _p0 = _t.perf_counter()
        # fetch PER SLICE: FetchGroup re-sorts its input bucket-
        # contiguously, so a concatenated-wave fetch returns rows in an
        # order that depends on which slices happened to share a wave —
        # slicing THAT by offsets produced wave-dependent WARC chunks
        # (the round-3 determinism hunt).  Per-slice fetch keeps each
        # fetched part a pure function of (round, shard); vector width
        # is the slice (thousands of rows at bench scale).
        fetched_parts = [(sid, self.fetch(tb)) for sid, tb in slices]
        fetched = (fetched_parts[0][1] if len(fetched_parts) == 1
                   else pa.concat_tables([f for _, f in fetched_parts]))
        _p1 = _t.perf_counter()
        round_dir = os.path.join(self.out_dir, f"round={t:05d}")
        self._log_buf.append(fetched.select(LOG_COLS))

        warc_refs = []
        if write_warc and self.writers:
            # chunked so a fat round spreads over the WHOLE writer pool,
            # not one writer per fetch worker.  Only the columns the
            # record assembler reads are shipped — the spans column in
            # particular is ~1/3 of the fetched table's bytes and dead
            # weight in the writer IPC.  Chunk identity is
            # (worker, SHARD, chunk): a pure function of round content,
            # so reruns/resumes regenerate byte-identical shard files.
            nwr = len(self.writers)
            csz = int(os.environ.get("GRAFT_WRITE_CHUNK", "2048"))
            for sid, fp in fetched_parts:
                to_write = fp.select(WRITER_COLS)
                for c, lo in enumerate(range(0, fp.num_rows, csz)):
                    chunk = to_write.slice(lo, min(csz, fp.num_rows - lo))
                    w = self.writers[
                        (t * 131 + self.worker_id * 7 + sid * 17 + c)
                        % nwr]
                    warc_refs.append(w.write_round.remote(
                        chunk, round_dir,
                        "%03d-%02d-%02d" % (self.worker_id, sid, c),
                        logical_date(t)))

        _p2 = _t.perf_counter()
        links = canonicalize_batch(
            extract_links(fetched, doc_col="doc_id", depth_col="depth"))
        _p3 = _t.perf_counter()
        # Re-offer suppression: a URL this worker already offered is a
        # guaranteed duplicate at its shard (the cuckoo filter holds
        # every offered key), so repeats ship as per-shard COUNTS
        # instead of rows — ~7x less offer traffic / seal sort volume
        # on link-dense corpora, with counters exactly preserved
        # (FrontierCore.count_suppressed).
        import numpy as np

        from ..state.frontier import shard_ids_of

        offer_refs = []
        if links.num_rows:
            # ROUND-SNAPSHOT suppression (determinism fix): slices are
            # consumed in ray.wait readiness order, so the SAME round's
            # links may split into different waves run-to-run.  If the
            # set mutated per wave, which occurrence of a newly-found
            # URL survives to the seal — and so its (depth, src_doc,
            # src_offset) sort key, queue seq, even its depth — would
            # depend on wave timing (observed: run-to-run fetch-order
            # and depth divergence at t2/budget-64).  Membership is
            # answered against the ROUND-START state and inserts apply
            # at the round boundary, so the offered multiset is a pure
            # function of the round's fetched pages.  This also makes
            # checkpoint/resume exact: a resumed worker's emptier set
            # only re-offers prior-round URLs, which the shard filter
            # drops identically.
            if t != self._round_t:
                if len(self._offered) > self.OFFERED_SET_CAP:
                    self._offered.clear()
                for arr in self._round_pending:
                    self._offered.add(arr)
                self._round_pending = []
                self._round_t = t
            h = links["hash64"].to_numpy(zero_copy_only=False)
            # GC-free vectorized set: a Python set[int] of millions of
            # offered keys made every gen-2 GC pass scan it — observed
            # as seconds of fixed stall per late crawl round
            fresh = ~self._offered.contains(h)
            self._round_pending.append(h[fresh])
            sid = shard_ids_of(links, self.num_shards)
            sup = np.bincount(sid[~fresh], minlength=self.num_shards)
            # fire-and-forget: the DRIVER awaits these acks before
            # sealing the round, so this worker is free immediately
            for s in range(self.num_shards):
                mask = fresh & (sid == s)
                if mask.any():
                    offer_refs.append(self.shards[s].offer.remote(
                        links.filter(pa.array(mask))))
                if sup[s]:
                    offer_refs.append(
                        self.shards[s].count_suppressed.remote(int(sup[s])))
        return {"fetched": fetched.num_rows, "offer_refs": offer_refs,
                "warc_refs": warc_refs,
                "tm": (_p1 - _p0, _p2 - _p1, _p3 - _p2,
                       _t.perf_counter() - _p3)}


def _split_by_worker(emit: pa.Table, n_buckets: int, n_workers: int):
    """bucket % n_workers slices, preserving deterministic row order."""
    import numpy as np

    emit = add_bucket_column(emit, n_buckets)
    wid = emit["bucket"].to_numpy(zero_copy_only=False) % n_workers
    out = []
    for w in range(n_workers):
        mask = wid == w
        out.append(emit.filter(pa.array(mask)) if mask.any() else None)
    return out


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
    if not (resume and os.path.exists(manifest_path)):
        # fresh run into a reused out_dir: drop ALL prior outputs.
        # Flushed log/cdx part names are keyed (worker_id, round) — a
        # rerun with a different pool size overwrites only ITS OWN
        # part names and read_fetch_log would union in stale parts
        # from the previous layout.
        for sub in ("log", "cdx", "checkpoint"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        for name in os.listdir(out_dir):
            if name.startswith("round="):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        for fname in ("CRAWL_MANIFEST.json", "LINEAGE.jsonl"):
            try:
                os.unlink(os.path.join(out_dir, fname))
            except FileNotFoundError:
                pass

    import time as _time

    _phase = {}
    _pt = _time.perf_counter()

    Shard = make_frontier_shard_cls()
    robots_ref = ray.put(robots_to_shard_dict(corpus_mod.read_robots(corpus_dir)))

    start_round = 0
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        start_round = m["next_round"]
        # drop log parts flushed after the manifest's checkpoint (crash
        # between flush and manifest write) — the rerun regenerates them
        for sub in ("log", "cdx"):
            part_dir = os.path.join(out_dir, sub)
            if not os.path.isdir(part_dir):
                continue
            for name in os.listdir(part_dir):
                if name.endswith(".parquet"):
                    upto = int(name.rsplit("-r", 1)[1].split(".")[0])
                    if upto > start_round:
                        os.unlink(os.path.join(part_dir, name))
        shards = [
            Shard.remote(s, cfg, robots_ref,
                         restore_path=os.path.join(ckpt_dir, f"shard-{s:03d}.pkl"))
            for s in range(cfg.num_shards)
        ]
    else:
        shards = [Shard.remote(s, cfg, robots_ref) for s in range(cfg.num_shards)]
        _phase["spawn_shards"] = _time.perf_counter() - _pt
    _pt = _time.perf_counter()

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # On small clusters don't reserve a whole core for the driver (it
    # mostly blocks on ray.get between barriers): at 4 CPUs the old
    # budget degenerated to 1 fetch + 1 WRITER, which serialized the
    # entire ~370 core-s gzip backlog through one actor while the rest
    # of the machine idled (measured: 393 s wall, 298 s of it
    # final_flush).  The writer pool's TOTAL must fit the wall — it
    # needs the lion's share of tiny budgets.
    driver_reserve = 1 if cpus >= 12 else 0
    shard_reserve = (cfg.num_shards + 3) // 4
    env_r = os.environ.get("GRAFT_POOL_RESERVE")
    if env_r is not None:  # packing experiments: total cores held back
        driver_reserve, shard_reserve = 0, int(env_r)
    budget = max(1, cpus - shard_reserve - driver_reserve)
    if fetch_concurrency is None:
        # (A combined fetch+gzip pool with max_concurrency=2 was tried
        # and LOST ~40% at small cluster sizes to head-of-line
        # blocking; split pools also mirror how a real cluster would
        # separate IO-politeness-bound fetchers from CPU-bound
        # compressors.)
        # measured round-2 costs (benchxl2, after the GC/vectorization
        # fixes): fetch+links ≈ 20µs/URL of pool CPU vs WARC
        # assembly+gzip ≈ 165µs/URL → writer:fetch work ≈ 7:1.  Fetch
        # still gets ~1/5 of the pool (above its work share) because
        # the round-barrier chain rides on fetch latency — the writer
        # pool drains asynchronously across barriers and only its
        # TOTAL must fit inside the crawl's wall time.
        frac = max(1, round(budget * 0.22)) if write_warc else budget
        fetch_concurrency = max(1, min(profile.n_buckets, 32, frac))
    n_workers = fetch_concurrency
    n_writers = max(1, budget - n_workers) if write_warc else 0
    pool_key = (corpus_dir, profile.n_buckets, cfg.num_shards,
                n_workers, n_writers)
    cached = _POOL_CACHE.get(pool_key)
    if cached is not None:
        workers, writers = cached
        # rebind to this run's fresh frontier shards + output dir; the
        # per-worker bucket caches survive across crawls (a long-lived
        # fetch fleet, as a production crawler would keep)
        ray.get([w.bind_run.remote(shards, out_dir) for w in workers])
    else:
        writers = [WarcWriter.remote(i) for i in range(n_writers)]
        workers = [
            CrawlWorker.remote(w, corpus_dir, profile.n_buckets,
                               shards, cfg.num_shards, out_dir, writers)
            for w in range(n_workers)
        ]
        _POOL_CACHE.clear()  # previous pools (different key) die here
        _POOL_CACHE[pool_key] = (workers, writers)

    _phase["spawn_pools"] = _time.perf_counter() - _pt
    _pt = _time.perf_counter()
    if writers:  # drop stale buffers/counters (pool reuse across runs)
        ray.get([w.reset_run.remote() for w in writers])

    if start_round == 0 and not (resume and os.path.exists(manifest_path)):
        # round -1: seed the frontier IN PARALLEL across the whole
        # actor fleet (writers are idle before round 0) — seed
        # canonicalization+sha1 was ~11 s of serial driver time at
        # bench scale, a fixed cost that capped scaling efficiency.
        # src_offset bases keep the ingestion order byte-identical to
        # the serial path (seal sorts offers deterministically).
        seeds_tbl = corpus_mod.read_seeds(corpus_dir)
        seed_pool = list(workers) + list(writers)
        n_seeds = seeds_tbl.num_rows
        k = max(1, min(len(seed_pool), n_seeds // 20_000 or 1))
        seeds_ref = ray.put(seeds_tbl)
        bounds = [n_seeds * i // k for i in range(k + 1)]
        ray.get([
            seed_pool[i % len(seed_pool)].seed_slice.remote(
                seeds_ref, bounds[i], bounds[i + 1], shards, cfg.num_shards)
            for i in range(k) if bounds[i + 1] > bounds[i]
        ])
        _phase["seed_slices"] = _time.perf_counter() - _pt
        _phase["seed"] = _time.perf_counter() - _pt
        _pt = _time.perf_counter()

    round_log = os.environ.get("WARC_RAY_ROUND_LOG")
    t = start_round
    next_split = None  # (round, split_refs) from a combined seal+pop
    if start_round == 0 and not (resume and os.path.exists(manifest_path)):
        # seed seal FUSED with the round-0 pop (one actor call instead
        # of a seal barrier + a pop chain; the hot shard's seed seal
        # overlaps every other shard's round-0 pop)
        next_split = (0, [
            s.seal_then_pop_split.options(num_returns=n_workers + 1).remote(
                0, profile.n_buckets, n_workers)
            for s in shards
        ])
    rounds_run = 0
    total_fetched = 0
    total_warc_records = 0
    pending_warc: list = []
    n_shards = len(shards)

    # rounds already on disk when THIS run starts are stale (an
    # unfinished prior run) and safe to clear on resubmission; a round
    # dir that appears DURING the run belongs to our own in-flight
    # writers — deleting it mid-write was a crash under back-to-back
    # bench runs (an orphaned writer re-created a cleared dir, and the
    # "unfinished round" rmtree then raced a live writer's open)
    stale_rounds = {name for name in
                    (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
                    if name.startswith("round=")}

    def _submit_work(t_sub: int, split_refs_sub):
        rd_name = f"round={t_sub:05d}"
        rd_dir = os.path.join(out_dir, rd_name)
        if rd_name in stale_rounds:          # rerun of an unfinished round
            stale_rounds.discard(rd_name)
            shutil.rmtree(rd_dir, ignore_errors=True)
        return [
            workers[w].process_round_refs.remote(
                t_sub, [split_refs_sub[si][w + 1] for si in range(n_shards)],
                write_warc)
            for w in range(n_workers)
        ]
    next_work = None
    while t < cfg.max_rounds:
        _t0 = _time.perf_counter()
        # shard-side pop+split: the driver sees only per-worker row
        # COUNTS; emitted rows travel shard → worker via ObjectRefs
        # (the driver-side concat+re-split was a serial per-round cost
        # that grew with cluster emission rate).  Usually the previous
        # iteration already fired the combined seal+pop for this round
        # AND pre-submitted the per-(shard, worker) fetch tasks — the
        # workers are already fetching by the time the driver reads the
        # counts below.
        if next_split is not None and next_split[0] == t:
            split_refs = next_split[1]
            refs = next_work if next_work is not None \
                else _submit_work(t, split_refs)
        else:
            split_refs = [
                s.pop_round_split.options(num_returns=n_workers + 1).remote(
                    t, profile.n_buckets, n_workers)
                for s in shards
            ]
            refs = _submit_work(t, split_refs)
        next_split = None
        next_work = None
        counts_per_shard = ray.get([r[0] for r in split_refs])
        per_worker = [sum(c[w] for c in counts_per_shard)
                      for w in range(n_workers)]
        if sum(per_worker) == 0:
            # drain the no-op calls AND any write tasks they dispatched
            # — discarding warc_refs here orphaned writers that could
            # outlive the run and collide with a later run's cleanup
            for c in ray.get(refs):
                pending_warc.extend(c["warc_refs"])
            if not any(ray.get([s.has_pending.remote() for s in shards])):
                break
            nexts = [x for x in ray.get([s.earliest_allowed.remote(t) for s in shards])
                     if x is not None]
            t = max(t + 1, min(nexts)) if nexts else t + 1
            continue

        _t1 = _time.perf_counter()
        counts = [c for c in ray.get(refs) if c["fetched"]]
        _t2 = _time.perf_counter()
        total_fetched += sum(c["fetched"] for c in counts)
        pending_warc.extend(r for c in counts for r in c["warc_refs"])
        # barrier: every offer must have LANDED in its shard before seal
        ray.get([r for c in counts for r in c["offer_refs"]])
        if t + 1 < cfg.max_rounds and not checkpoint_every:
            # combined seal + next-round pop in one actor call: the
            # driver never awaits seal separately (the next iteration's
            # counts read IS the barrier), saving an RPC round per
            # crawl round.  The next round's fetch tasks are submitted
            # HERE too, referencing the not-yet-ready pop slices — each
            # worker starts on a shard's slice the moment that pop
            # lands, so the slowest shard's seal+pop never gates the
            # other 15 shards' fetch work.  Checkpointing runs need the
            # explicit seal barrier below (shard snapshots must be
            # post-seal).
            next_split = (t + 1, [
                s.seal_then_pop_split.options(
                    num_returns=n_workers + 1).remote(
                    t + 1, profile.n_buckets, n_workers)
                for s in shards
            ])
            next_work = _submit_work(t + 1, next_split[1])
        else:
            ray.get([s.seal_round.remote() for s in shards])
        if round_log:
            tmx = [max(c["tm"][i] for c in counts) for i in range(4)]
            with open(round_log, "a") as f:
                f.write("%d %d %.3f %.3f %.3f  f%.2f w%.2f l%.2f o%.2f  "
                        "rows[%d..%d]\n" % (
                            t, sum(per_worker), _t1 - _t0, _t2 - _t1,
                            _time.perf_counter() - _t2, *tmx,
                            min(per_worker), max(per_worker)))

        rounds_run += 1
        t += 1
        if checkpoint_every and rounds_run % checkpoint_every == 0:
            # durability barrier: all WARC shards + log rows up to this
            # round must be on disk before the manifest commits it
            total_warc_records += sum(ray.get(pending_warc))
            pending_warc = []
            ray.get([w.flush_log.remote(t) for w in workers]
                    + [w.flush_cdx.remote(out_dir, t) for w in writers])
            _checkpoint(shards, ckpt_dir, manifest_path, t, cfg)

    _phase["rounds"] = _time.perf_counter() - _pt
    _pt = _time.perf_counter()
    total_warc_records += sum(ray.get(pending_warc))
    pending_warc = []
    ray.get([w.flush_log.remote(t) for w in workers]
            + [w.flush_cdx.remote(out_dir, t) for w in writers])
    if checkpoint_every:
        _checkpoint(shards, ckpt_dir, manifest_path, t, cfg)
    _phase["final_flush"] = _time.perf_counter() - _pt
    shard_busy = ray.get([s.busy_seconds.remote() for s in shards])
    _phase["seal_busy_max"] = max(b["seal"] for b in shard_busy)
    _phase["seal_busy_sum"] = sum(b["seal"] for b in shard_busy)
    _phase["pop_busy_max"] = max(b["pop"] for b in shard_busy)
    hot = max(shard_busy, key=lambda b: b["seal"])
    for k in ("seal_sort", "seal_filter", "seal_queue"):
        _phase["hot_" + k] = hot.get(k, 0.0)
    if writers:
        wb = ray.get([w.busy_seconds.remote() for w in writers])
        _phase["writer_busy"] = sum(b[0] for b in wb)
        _phase["writer_busy_cpu"] = sum(b[1] for b in wb)
        _phase["writer_busy_asm"] = sum(b[2] for b in wb)
    stats = ray.get([s.stats.remote() for s in shards])
    filters = ray.get([s.filter_table_bytes.remote() for s in shards])
    for a in shards:          # workers/writers stay warm (_POOL_CACHE)
        ray.kill(a)
    return {
        "rounds": rounds_run,
        "last_round": t,
        "total_fetched": total_fetched,
        "warc_records": total_warc_records,
        "shard_stats": stats,
        "filter_bytes": filters,
        "out_dir": out_dir,
        "phase_sec": {k: round(v, 3) for k, v in _phase.items()},
    }


def _checkpoint(shards, ckpt_dir: str, manifest_path: str, next_round: int,
                cfg: FrontierConfig) -> None:
    import hashlib

    os.makedirs(ckpt_dir, exist_ok=True)
    paths = ray.get([
        s.checkpoint.remote(os.path.join(ckpt_dir, f"shard-{i:03d}.pkl"))
        for i, s in enumerate(shards)
    ])
    stats = ray.get([s.stats.remote() for s in shards])
    out_dir = os.path.dirname(manifest_path)

    # G16 lineage: one append-only row per checkpoint — which rounds it
    # covers, the digests of the shard state files it commits, and the
    # per-shard counters at that point (G15 metrics dump).  A restarted
    # run can audit exactly which state/outputs each epoch produced.
    digests = {}
    for p in paths:
        with open(p, "rb") as f:
            digests[os.path.basename(p)] = hashlib.sha1(f.read()).hexdigest()
    with open(os.path.join(out_dir, "LINEAGE.jsonl"), "a") as f:
        f.write(json.dumps({
            "next_round": next_round,
            "shard_state_sha1": digests,
            "metrics": stats,
        }) + "\n")

    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"next_round": next_round, "config": asdict(cfg)}, f)
    os.replace(tmp, manifest_path)


def read_fetch_log(out_dir: str) -> "rd.Dataset":
    """The crawl fetch log (rows carry their ``round`` column; file
    layout is checkpoint-granular parts under ``out_dir/log/``)."""
    import glob

    paths = sorted(glob.glob(os.path.join(out_dir, "log", "*.parquet")))
    return rd.read_parquet(paths)
