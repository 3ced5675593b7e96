"""HyperLogLog sketch: accuracy bound, merge laws, end-to-end (q26)."""

import numpy as np
import pyarrow as pa

from warc_ray.stages.sketch import (M, estimate, merge_registers,
                                    registers_for)


def _hashes(n: int, seed: int) -> np.ndarray:
    """n deterministic 64-bit hashes (splitmix64 over arange)."""
    x = (np.arange(n, dtype=np.uint64)
         + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    x = x + np.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def test_hll_accuracy_bound():
    # sigma = 1.04/sqrt(4096) ~ 1.6%; assert within 4 sigma
    for n, seed in [(1_000, 1), (50_000, 2), (200_000, 3)]:
        h = _hashes(n, seed)
        regs = registers_for(h, np.zeros(n, dtype=np.int64), 1)
        est = estimate(regs)[0]
        assert abs(est - n) / n < 0.065, (n, est)


def test_hll_small_range_linear_counting():
    # tiny cardinalities hit the linear-counting branch: near-exact
    for n in [1, 10, 100]:
        h = _hashes(n, 7)
        est = estimate(registers_for(h, np.zeros(n, dtype=np.int64), 1))[0]
        assert abs(est - n) <= max(1, 0.02 * n), (n, est)


def test_hll_merge_equals_single_pass():
    h = _hashes(30_000, 5)
    gid = np.zeros(len(h), dtype=np.int64)
    full = registers_for(h, gid, 1)
    # three partials merged (any split) == one pass; idempotent re-merge
    parts = np.vstack([
        registers_for(h[:10_000], gid[:10_000], 1),
        registers_for(h[10_000:11_000], gid[:1_000], 1),
        registers_for(h[11_000:], gid[11_000:], 1),
    ])
    merged = merge_registers(parts, np.array([0]))
    assert np.array_equal(merged, full)
    again = merge_registers(np.vstack([merged, full]), np.array([0]))
    assert np.array_equal(again, full)


def test_hll_grouped_registers():
    # interleaved groups fold independently
    h = _hashes(20_000, 11)
    gid = (np.arange(20_000) % 2).astype(np.int64)
    both = registers_for(h, gid, 2)
    solo0 = registers_for(h[gid == 0], np.zeros(10_000, dtype=np.int64), 1)
    solo1 = registers_for(h[gid == 1], np.zeros(10_000, dtype=np.int64), 1)
    assert np.array_equal(both[0], solo0[0])
    assert np.array_equal(both[1], solo1[0])
    assert M == both.shape[1]


def test_hll_distinct_dataset(ray_session):
    import ray.data as rd

    from warc_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(42)
    groups, keys = [], []
    truth = {"a": 5_000, "b": 700, "c": 12}
    for g, n in truth.items():
        # every key at least once + random repeats (~3 refs per key)
        ids = np.concatenate([np.arange(n), rng.choice(n, size=n * 2)])
        groups += [g] * len(ids)
        keys += [f"{g}-key-{i}" for i in ids]
    t = pa.table({"host": pa.array(groups), "url": pa.array(keys)})
    ds = rd.from_arrow(t).repartition(8)
    out = hll_distinct(ds, key_col="url", group_col="host").to_pandas()
    got = dict(zip(out["host"], out["est_distinct"]))
    assert set(got) == set(truth)
    for g, n in truth.items():
        assert abs(got[g] - n) / n < 0.08, (g, n, got[g])


# -- bottom-k (KMV) sketch ----------------------------------------------------

def test_bottomk_partial_keeps_k_smallest_distinct():
    from warc_ray.stages.sketch import bottomk_partial

    codes = np.array([0, 0, 0, 0, 1, 1], dtype=np.int64)
    h = np.array([9, 3, 3, 5, 7, 2], dtype=np.uint64)
    keep = bottomk_partial(codes, h, k=2)
    got = sorted(zip(codes[keep].tolist(), h[keep].tolist()))
    assert got == [(0, 3), (0, 5), (1, 2), (1, 7)]  # dup 3 dropped


def test_bottomk_merge_equals_single_pass():
    from warc_ray.stages.sketch import bottomk_partial

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 3, size=5000).astype(np.int64)
    h = rng.integers(0, 1 << 62, size=5000).astype(np.uint64)
    direct = bottomk_partial(codes, h, k=16)
    ref = sorted(zip(codes[direct].tolist(), h[direct].tolist()))
    # split into 7 parts, cut each, merge, cut again
    mc, mh = [], []
    for part in np.array_split(np.arange(5000), 7):
        kp = bottomk_partial(codes[part], h[part], k=16)
        mc.append(codes[part][kp])
        mh.append(h[part][kp])
    mc, mh = np.concatenate(mc), np.concatenate(mh)
    merged = bottomk_partial(mc, mh, k=16)
    assert sorted(zip(mc[merged].tolist(), mh[merged].tolist())) == ref


def test_bottomk_estimate_accuracy_and_exact_small():
    from warc_ray.stages.sketch import bottomk_estimate, bottomk_partial

    # fewer distinct than k -> exact count
    assert bottomk_estimate(5, 123456, k=16) == 5
    # k smallest of n uniform hashes -> estimate within ~4/sqrt(k-2)
    rng = np.random.default_rng(11)
    for n in (500, 20_000):
        h = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
        h = np.unique(h)
        codes = np.zeros(len(h), dtype=np.int64)
        keep = bottomk_partial(codes, h, k=64)
        kth = int(np.sort(h[keep])[-1])
        est = bottomk_estimate(len(keep), kth, k=64)
        assert abs(est - len(h)) / len(h) < 4 / np.sqrt(62), (n, est)


def test_md5_prefix64_matches_hex_prefix():
    import hashlib

    from warc_ray.stages.sketch import md5_prefix64

    texts = ["", "abc", "päyload é"]
    got = md5_prefix64(texts)
    for t, g in zip(texts, got):
        want = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
        assert int(g) == want


def test_cms_partial_merge_and_no_undercount():
    """Count-min laws: partials from any split of the data sum to the
    whole-data sketch, and point estimates never under-count."""
    import collections

    from warc_ray.stages.sketch import (cms_estimate, cms_partial,
                                        md5_chunks_u32)

    rng = np.random.default_rng(11)
    keys = [f"k{int(v)}" for v in rng.zipf(1.3, size=5000)]
    cnt = collections.Counter(keys)
    uniq = sorted(cnt)
    counts = np.array([cnt[k] for k in uniq], dtype=np.int64)
    ch = md5_chunks_u32(uniq)

    whole = cms_partial(ch, counts)
    assert (whole.sum(axis=1) == counts.sum()).all()  # mass per row
    # split invariance: any partition of the increments merges to whole
    for cut in (1, len(uniq) // 3, len(uniq) - 1):
        merged = cms_partial(ch[:cut], counts[:cut]) \
            + cms_partial(ch[cut:], counts[cut:])
        assert np.array_equal(merged, whole)
    est = cms_estimate(whole, ch)
    assert (est >= counts).all()
    # error bound: over-count <= e*N/W per Cormode-Muthukrishnan, with
    # 4 rows the failure probability is e^-4 per key — allow 8*N/W slack
    from warc_ray.stages.sketch import CMS_W
    assert (est - counts <= max(1, 8 * counts.sum() // CMS_W)).all()


def test_cms_chunks_match_md5_hex():
    import hashlib

    from warc_ray.stages.sketch import md5_chunks_u32

    texts = ["", "abc", "päyload é", "http://h0.example/p/1"]
    ch = md5_chunks_u32(texts)
    for t, row in zip(texts, ch):
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        for r in range(4):
            assert int(row[r]) == int(h[8 * r:8 * r + 8], 16)


def test_cms_freq_dataset(ray_session):
    """End-to-end: probe set = the deterministic md5 1/97 sample,
    estimates >= true counts, invariant to block partitioning."""
    import collections

    import ray.data as rd

    from warc_ray.stages.sketch import cms_freq, md5_chunks_u32

    keys = [f"u{i % 257}" for i in range(8000)] + ["u3"] * 300
    true = collections.Counter(keys)
    ch = md5_chunks_u32(sorted(true))
    h64 = (ch[:, 0].astype(np.uint64) << np.uint64(32)) | ch[:, 1]
    probe = sorted(k for k, h in zip(sorted(true), h64)
                   if h % np.uint64(97) == 0)

    outs = []
    for nblocks in (2, 7):
        ds = rd.from_arrow(pa.table({"url": pa.array(keys)})) \
            .repartition(nblocks)
        out = cms_freq(ds, "url").to_pandas()
        assert list(out.url) == probe
        assert all(out.est_refs[i] >= true[out.url[i]]
                   for i in range(len(out)))
        outs.append(out)
    assert outs[0].values.tolist() == outs[1].values.tolist()


def test_kll_accuracy_merge_roundtrip():
    """KLL sketch laws: bounded rank error, deterministic merge ==
    deterministic single-pass at fixed chunking, serialization
    round-trips bit-exactly."""
    from warc_ray.stages.sketch import KLLSketch

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(size=60_000),
                        rng.exponential(5.0, size=40_000)])
    s = KLLSketch()
    s.add_many(x)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = s.quantile(q)
        assert abs((x <= est).mean() - q) < 0.02, q
    # merge in part order == the part-wise construction, reproducibly
    a, b = KLLSketch(), KLLSketch()
    a.add_many(x[:50_000])
    b.add_many(x[50_000:])
    m1 = a.merge(b)
    a2, b2 = KLLSketch(), KLLSketch()
    a2.add_many(x[:50_000])
    b2.add_many(x[50_000:])
    m2 = a2.merge(b2)
    assert m1.to_bytes() == m2.to_bytes()
    r = KLLSketch.from_bytes(m1.to_bytes())
    assert r.to_bytes() == m1.to_bytes()
    assert abs((x <= m1.quantile(0.5)).mean() - 0.5) < 0.02
    # bounded memory: retained values << n
    assert sum(len(lv) for lv in m1.levels) < 40 * 256


def test_event_quantile_sketch_pipeline(ray_session):
    """q64: per-type sketch percentiles are deterministic across runs
    and within rank-error 2% of the exact per-type order statistics."""
    import pyarrow.parquet as pq_

    from warc_ray.pipelines.relational import event_quantile_sketch

    sf = "/root/testdata/sf0.001"
    got = event_quantile_sketch(sf).to_pandas()
    got2 = event_quantile_sketch(sf).to_pandas()
    assert got.values.tolist() == got2.values.tolist()

    ev = pq_.read_table(sf + "/events.parquet",
                        columns=["event_type", "value"]).to_pandas()
    for _, row in got.iterrows():
        vals = ev[ev.event_type == row.event_type].value.to_numpy()
        for q, col in ((0.5, "p50_milli"), (0.9, "p90_milli"),
                       (0.99, "p99_milli")):
            est = row[col] / 1000.0
            rank_err = abs((vals <= est).mean() - q)
            assert rank_err < 0.02 + 1.0 / len(vals), (row.event_type, q)
