"""Crawl-order + URL-seen-set parity: distributed engine vs oracle (G14),
and checkpoint/resume (G16).

BASELINE.json: "crawl ordering and the final URL-seen set required to
match exactly" under the same seed list + politeness budget.
"""

import glob
import os
import shutil

import pytest

from warc_ray import corpus
from warc_ray.state.frontier import FrontierConfig

KEY = ["round", "host", "fetch_seq", "url"]
CFG = FrontierConfig(num_shards=4, max_rounds=60, filter_capacity=1 << 14)


@pytest.fixture(scope="module")
def t1_dir(tmp_path_factory):
    return corpus.ensure_corpus("t1", root=str(tmp_path_factory.mktemp("corpus")))


@pytest.fixture(scope="module")
def oracle_result(t1_dir):
    from warc_ray.pipelines.oracle import simulate

    return simulate(t1_dir, config=CFG)


@pytest.fixture(scope="module")
def crawl_result(ray_session, t1_dir, tmp_path_factory):
    from warc_ray.pipelines.crawl import run_crawl

    out = str(tmp_path_factory.mktemp("crawl"))
    res = run_crawl(t1_dir, out, config=CFG, write_warc=True, checkpoint_every=10)
    return out, res


def _logs(out, oracle_result):
    from warc_ray.pipelines.crawl import read_fetch_log

    d = read_fetch_log(out).to_pandas().sort_values(KEY).reset_index(drop=True)
    o = oracle_result["log"].to_pandas().sort_values(KEY).reset_index(drop=True)
    return d, o


def test_fetch_log_parity(crawl_result, oracle_result):
    out, _res = crawl_result
    d, o = _logs(out, oracle_result)
    assert len(d) == len(o) > 0
    assert d.equals(o)  # crawl order (per host) + outcomes identical


def test_seen_set_parity(crawl_result, oracle_result):
    """Final cuckoo tables byte-identical per shard."""
    _out, res = crawl_result
    assert res["filter_bytes"] == oracle_result["filter_bytes"]


def test_politeness_budget_respected(crawl_result, oracle_result):
    out, _res = crawl_result
    d, _ = _logs(out, oracle_result)
    per = d.groupby(["round", "host"]).size()
    assert per.max() <= CFG.per_round_host_budget


def test_robots_and_dedup_counters(crawl_result, oracle_result):
    _out, res = crawl_result
    dstats = {k: sum(s[k] for s in res["shard_stats"])
              for k in ("offered", "dup", "robots_denied", "queued", "emitted")}
    ostats = {k: sum(s[k] for s in oracle_result["stats"])
              for k in ("offered", "dup", "robots_denied", "queued", "emitted")}
    assert dstats == ostats
    assert dstats["robots_denied"] > 0
    assert dstats["dup"] > 0


def test_warc_output_per_round(crawl_result):
    out, res = crawl_result
    rounds = sorted(glob.glob(os.path.join(out, "round=*")))
    assert len(rounds) == res["rounds"]
    shards = glob.glob(os.path.join(out, "round=*", "warc", "*.warc.gz"))
    assert shards
    # every fetch produced a request+response+metadata triple
    from warc_ray.core import WARCFile

    n_records = 0
    for s in shards:
        for rec in WARCFile(s):
            n_records += 1
    n_info = len(shards)
    assert n_records == n_info + 3 * res["total_fetched"]


def test_resume_from_checkpoint(ray_session, t1_dir, oracle_result, tmp_path_factory):
    """Interrupt after ~half the rounds; resume must converge to the
    exact same fetch log and seen set."""
    from warc_ray.pipelines.crawl import read_fetch_log, run_crawl

    out = str(tmp_path_factory.mktemp("crawl_resume"))
    half_cfg = FrontierConfig(num_shards=4, max_rounds=8, filter_capacity=1 << 14)
    res1 = run_crawl(t1_dir, out, config=half_cfg, write_warc=False,
                     checkpoint_every=1)
    assert res1["last_round"] == 8
    # resume with the full horizon
    res2 = run_crawl(t1_dir, out, config=CFG, write_warc=False,
                     checkpoint_every=1, resume=True)
    d = read_fetch_log(out).to_pandas().sort_values(KEY).reset_index(drop=True)
    o = oracle_result["log"].to_pandas().sort_values(KEY).reset_index(drop=True)
    assert d.equals(o)
    assert res2["filter_bytes"] == oracle_result["filter_bytes"]


def test_shard_count_invariance(ray_session, t1_dir, tmp_path_factory):
    """Crawl results are invariant to num_shards (hosts are partitioned
    by hash, but each host's queue/politeness state is self-contained)
    — which is what lets the bench scale shard count with cluster
    size."""
    import pandas as pd

    from warc_ray.pipelines.crawl import read_fetch_log, run_crawl

    logs = []
    totals = []
    for ns in (3, 5):
        out = str(tmp_path_factory.mktemp(f"shards{ns}"))
        cfg = FrontierConfig(num_shards=ns, max_rounds=40,
                             filter_capacity=1 << 12)
        res = run_crawl(t1_dir, out, config=cfg, write_warc=False)
        df = read_fetch_log(out).to_pandas().sort_values(KEY).reset_index(drop=True)
        logs.append(df)
        agg = {}
        for s in res["shard_stats"]:
            for k, v in s.items():
                if k != "shard_id":
                    agg[k] = agg.get(k, 0) + v
        totals.append(agg)
    pd.testing.assert_frame_equal(logs[0], logs[1])
    assert totals[0] == totals[1]


def test_lineage_and_metrics(crawl_result):
    """G16 lineage + G15 metrics: every checkpoint appends a row with
    the committed shard-state digests and per-shard counters."""
    import json
    import os

    out, res = crawl_result
    path = os.path.join(out, "LINEAGE.jsonl")
    rows = [json.loads(line) for line in open(path)]
    assert rows, "no lineage rows written"
    last = rows[-1]
    assert last["next_round"] == res["last_round"]
    assert set(last["shard_state_sha1"]) == {
        f"shard-{i:03d}.pkl" for i in range(CFG.num_shards)}
    # the committed metrics must add up to the crawl's totals
    assert sum(s["emitted"] for s in last["metrics"]) == res["total_fetched"]
    # monotone rounds across checkpoints
    assert [r["next_round"] for r in rows] == sorted(
        r["next_round"] for r in rows)


def test_fresh_run_clears_stale_parts(ray_session, tmp_path):
    """A fresh (non-resume) run into a reused out_dir must not leave
    stale log/cdx parts from a previous run with a DIFFERENT pool
    layout (part filenames are keyed by worker id)."""
    import shutil

    from warc_ray import corpus as corpus_mod
    from warc_ray.pipelines.crawl import read_fetch_log, run_crawl
    from warc_ray.state.frontier import FrontierConfig

    cdir = corpus_mod.ensure_corpus("t1")
    out = str(tmp_path / "reused-out")
    cfg = FrontierConfig(num_shards=2, max_rounds=6, filter_capacity=1 << 14)
    run_crawl(cdir, out, config=cfg, write_warc=False, fetch_concurrency=2)
    n2 = read_fetch_log(out).count()
    run_crawl(cdir, out, config=cfg, write_warc=False, fetch_concurrency=1)
    n1 = read_fetch_log(out).count()
    assert n1 == n2


def test_sort_offers_fast_path_exact():
    """The seed-ingest int-argsort fast path must equal the full
    multi-key sort when depth/src_doc are constant and offsets unique,
    and FALL BACK (still exact) when offsets tie."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from warc_ray.state.frontier import FrontierCore

    rng = np.random.default_rng(3)
    n = 10_000
    offs = rng.permutation(n).astype(np.int32)
    buf = pa.table({
        "url": pa.array([f"http://h/x/{i}" for i in rng.integers(0, n, n)]),
        "host": pa.array(["h"] * n),
        "priority": pa.array(np.full(n, 5, dtype=np.int32)),
        "depth": pa.array(np.zeros(n, dtype=np.int32)),
        "hash64": pa.array(rng.integers(0, 2**63, n), type=pa.uint64()),
        "src_doc": pa.array([""] * n),
        "src_offset": pa.array(offs),
    })
    full = pc.sort_indices(buf, sort_keys=[("depth", "ascending"),
                                           ("src_doc", "ascending"),
                                           ("src_offset", "ascending"),
                                           ("url", "ascending")])
    fast = FrontierCore._sort_offers(buf, n)
    assert fast.to_pylist() == full.to_pylist()

    # ties in src_offset -> fallback path, still the full ordering
    dup = buf.set_column(buf.schema.get_field_index("src_offset"),
                         "src_offset",
                         pa.array(np.repeat(np.arange(n // 2), 2)
                                  .astype(np.int32)))
    full2 = pc.sort_indices(dup, sort_keys=[("depth", "ascending"),
                                            ("src_doc", "ascending"),
                                            ("src_offset", "ascending"),
                                            ("url", "ascending")])
    fast2 = FrontierCore._sort_offers(dup, n)
    assert fast2.to_pylist() == full2.to_pylist()

    # varying depth -> fallback
    vd = buf.set_column(buf.schema.get_field_index("depth"), "depth",
                        pa.array((offs % 3).astype(np.int32)))
    fullv = pc.sort_indices(vd, sort_keys=[("depth", "ascending"),
                                           ("src_doc", "ascending"),
                                           ("src_offset", "ascending"),
                                           ("url", "ascending")])
    assert FrontierCore._sort_offers(vd, n).to_pylist() == fullv.to_pylist()
