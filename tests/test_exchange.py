"""Bucket exchange (stages/exchange.py): equivalence with the built-in
per-key aggregate, hash determinism, and skew balance."""

import numpy as np
import pyarrow as pa
import pytest

from warc_ray.stages.exchange import (combine_buckets, hash64_strings,
                                      with_part)


def _rand_table(n=5000, nkeys=700, seed=7):
    rng = np.random.default_rng(seed)
    keys = [f"key-{i}" for i in rng.integers(0, nkeys, n)]
    return pa.table({
        "k": pa.array(keys, type=pa.string()),
        "v": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
        "s": pa.array([f"s{i}" for i in rng.integers(0, 50, n)],
                      type=pa.string()),
    })


def test_hash64_deterministic_and_spread():
    t = _rand_table()
    h1 = hash64_strings(t["k"])
    h2 = hash64_strings(t["k"])
    assert np.array_equal(h1, h2)
    # same value -> same hash, different value -> (almost surely) different
    arr = pa.array(["a", "b", "a"])
    ha = hash64_strings(arr)
    assert ha[0] == ha[2] and ha[0] != ha[1]
    # buckets balance: no bucket gets more than ~3x its fair share
    part = with_part(t, "k", 16)["part"].to_numpy()
    counts = np.bincount(part, minlength=16)
    assert counts.max() < 3 * len(t) / 16


def test_combine_buckets_matches_builtin_aggregate(ray_session):
    import ray.data as rd

    t = _rand_table()
    # ground truth: single-table Arrow aggregate
    want = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "min"), ("s", "max")]) \
        .rename_columns(["k", "v_sum", "v_min", "s_max"]) \
        .sort_by("k")

    # distributed: per-batch partials + bucket combine over many blocks
    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("k").aggregate(
            [("v", "sum"), ("v", "min"), ("s", "max")])
        return with_part(
            g.rename_columns(["k", "v_sum", "v_min", "s_max"]), "k", 8)

    ds = rd.from_arrow(t).repartition(13) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    got = combine_buckets(
        ds, "k", [("v_sum", "sum"), ("v_min", "min"), ("s_max", "max")],
        names=["k", "v_sum", "v_min", "s_max"])
    got_pd = got.to_pandas().sort_values("k").reset_index(drop=True)
    want_pd = want.to_pandas().reset_index(drop=True)
    assert got_pd.equals(want_pd)


def test_with_part_rejects_nothing_and_is_int32():
    t = _rand_table(n=10)
    out = with_part(t, "k", 4)
    assert out.num_rows == t.num_rows
    assert out["part"].type == pa.int32()
    assert set(out["part"].to_pylist()) <= set(range(4))


def test_hash_join_vs_duckdb(ray_session):
    """Generic bucket-exchange join: inner and left-outer results match
    DuckDB joins on the same parquet inputs (including unmatched left
    rows and the suffix on clashing right columns)."""
    import duckdb
    import ray.data as rd

    from warc_ray.stages.exchange import hash_join

    sf = "/root/testdata/sf0.001"
    orders = rd.read_parquet(sf + "/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = rd.read_parquet(sf + "/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: b.rename_columns(
            ["o_custkey", "c_mktsegment"]), batch_format="pyarrow")

    got = hash_join(orders, cust, "o_custkey", how="inner") \
        .to_pandas().sort_values(["o_orderkey"]).reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice, c.c_mktsegment
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey""").df()
    assert len(got) == len(want)
    assert got.o_orderkey.tolist() == want.o_orderkey.tolist()
    assert got.c_mktsegment.tolist() == want.c_mktsegment.tolist()

    # left outer: synthetic right side missing most keys
    import pyarrow as pa

    small = rd.from_arrow(pa.table({
        "o_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "tag": pa.array(["a", "b", "c"])}))
    lo = hash_join(orders, small, "o_custkey", how="left outer") \
        .to_pandas()
    assert len(lo) == orders.count()
    matched = lo[lo.o_custkey.isin([1, 2, 3])]
    assert len(matched) > 0 and matched.tag.notna().all()
    assert lo[~lo.o_custkey.isin([1, 2, 3])].tag.isna().all()


# ---------------------------------------------------------------------------
# range_sort (TeraSort-shaped global sort with exact ranks)
# ---------------------------------------------------------------------------

def _sortable_ds(n=4000, seed=11, nblocks=8):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    # heavy ties: values drawn from a small domain so splitter
    # boundaries land ON tied keys
    vals = rng.integers(0, 97, n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "val": pa.array(vals)})
    return rd.from_arrow(t).repartition(nblocks), t


@pytest.mark.parametrize("npart", [1, 5, 32])
def test_range_sort_exact_ranks(ray_session, npart):
    from warc_ray.stages.exchange import range_sort

    def u64(a):
        return a.to_numpy(zero_copy_only=False).view(np.uint64) \
            ^ np.uint64(1 << 63)

    ds, t = _sortable_ds()
    out = range_sort(ds, lambda b: u64(b["val"]),
                     lambda b: u64(b["id"]), npart=npart)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    got = got.take(pa.array(np.argsort(got["rank"].to_numpy())))
    order = np.lexsort((t["id"].to_numpy(), t["val"].to_numpy()))
    assert got["id"].to_numpy().tolist() == \
        t["id"].to_numpy()[order].tolist()
    ranks = got["rank"].to_numpy()
    assert ranks.tolist() == list(range(1, len(t) + 1))


def test_range_sort_descending_with_tie_leak_check(ray_session):
    """All-equal primary keys: every row lands in ONE bucket (ties may
    never straddle a splitter) and ranks follow the tiebreak."""
    import ray.data as rd
    from warc_ray.stages.exchange import range_sort

    def u64(a):
        return a.to_numpy(zero_copy_only=False).view(np.uint64) \
            ^ np.uint64(1 << 63)

    n = 500
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "val": pa.array(np.zeros(n, dtype=np.int64))})
    out = range_sort(rd.from_arrow(t).repartition(4),
                     lambda b: ~u64(b["val"]), lambda b: u64(b["id"]),
                     npart=8)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    got = got.take(pa.array(np.argsort(got["rank"].to_numpy())))
    assert got["id"].to_numpy().tolist() == list(range(n))
    assert got["rank"].to_numpy().tolist() == list(range(1, n + 1))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_mg_prune_guarantee():
    """Cumulative prune offsets stay under n/(k+1): a key with true
    count > n/(k+1) can never be evicted."""
    from warc_ray.stages.sketch import mg_prune

    rng = np.random.default_rng(3)
    # Zipf stream, vocab far above k
    raw = rng.zipf(1.3, 200_000)
    raw = raw[raw < 5000]
    keys, counts = np.unique(raw, return_counts=True)
    keys = keys.astype(str).astype(object)
    k = 64
    pk, pcnt = mg_prune(keys, counts, k)
    assert len(pk) <= k
    n = counts.sum()
    thresh = n // (k + 1)
    heavy = set(keys[counts > thresh])
    assert heavy <= set(pk)
    # under-count bounded by the single prune's offset
    m = {key: c for key, c in zip(pk, pcnt)}
    true = {key: c for key, c in zip(keys, counts)}
    for key in pk:
        assert 0 < m[key] <= true[key]
        assert true[key] - m[key] <= thresh + 1


def test_mg_heavy_hitters_exact_vs_bruteforce(ray_session):
    import ray.data as rd
    from warc_ray.stages.sketch import mg_heavy_hitters

    rng = np.random.default_rng(5)
    vals = rng.zipf(1.2, 60_000)
    vals = vals[vals < 3000]
    keys = np.array([f"h{v}" for v in vals], dtype=object)
    ds = rd.from_arrow(pa.table({"host": pa.array(list(keys))})) \
        .repartition(16)
    phi_inv = 64
    got = mg_heavy_hitters(ds, "host", k=256, phi_inv=phi_inv)
    uk, uc = np.unique(keys, return_counts=True)
    n = len(keys)
    want = sorted((str(k_), int(c)) for k_, c in zip(uk, uc)
                  if c * phi_inv > n)
    assert list(zip(got["host"].to_pylist(),
                    got["n_refs"].to_pylist())) == want
    assert len(want) >= 3  # the law test must actually exercise hitters


def test_skew_join_parity_with_hash_join(ray_session):
    """Salted and unsalted joins are VALUE-equal on skewed input —
    the skew_join contract (salting only moves work)."""
    import ray.data as rd
    from warc_ray.stages.exchange import hash_join, skew_join

    rng = np.random.default_rng(7)
    # hot key 0 carries ~40% of fact rows; dim has one row per key
    keys = np.where(rng.random(20_000) < 0.4, 0,
                    rng.integers(1, 500, 20_000))
    fact = pa.table({"k": pa.array(keys, type=pa.int64()),
                     "v": pa.array(np.arange(20_000), type=pa.int64())})
    dim = pa.table({"k": pa.array(np.arange(500), type=pa.int64()),
                    "w": pa.array(np.arange(500) * 10, type=pa.int64())})
    f = rd.from_arrow(fact).repartition(8)
    d = rd.from_arrow(dim).repartition(4)

    def norm(ds):
        t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        df = t.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        return df

    a = norm(skew_join(f, d, "k", how="inner", n_salt=4,
                       hot_keys={0}))
    b = norm(hash_join(rd.from_arrow(fact).repartition(8),
                       rd.from_arrow(dim).repartition(4), "k",
                       how="inner"))
    assert len(a) == len(b) == 20_000          # every fact row matched
    assert (a.k.to_numpy() == b.k.to_numpy()).all()
    assert (a.v.to_numpy() == b.v.to_numpy()).all()
    assert (a.w.to_numpy() == b.w.to_numpy()).all()


def test_skew_join_left_outer_and_detection(ray_session):
    import ray.data as rd
    from warc_ray.stages.exchange import detect_hot_keys, skew_join

    keys = np.concatenate([np.zeros(5_000, np.int64),
                           np.arange(1, 101).repeat(10)])
    fact = pa.table({"k": pa.array(keys, type=pa.int64()),
                     "v": pa.array(np.arange(len(keys)), type=pa.int64())})
    dim = pa.table({"k": pa.array([0, 1, 2], type=pa.int64()),
                    "w": pa.array([7, 8, 9], type=pa.int64())})
    f = rd.from_arrow(fact).repartition(8)
    hot = detect_hot_keys(f, "k", hot_share_ppm=100_000)
    assert 0 in hot                            # 5/6 of rows → detected
    out = skew_join(rd.from_arrow(fact).repartition(8),
                    rd.from_arrow(dim), "k", how="left outer",
                    n_salt=4, hot_keys=hot)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = t.to_pandas()
    assert len(df) == len(keys)                # left outer keeps all
    assert df[df.k == 0].w.eq(7).all()
    assert df[df.k > 2].w.isna().all()         # unmatched → null


def test_clustered_join_parity_and_pruning(ray_session, tmp_path):
    """clustered_join == plain inner join, over a multi-row-group
    sorted dimension; out-of-range fact keys drop; >1 part is real."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from warc_ray.stages.exchange import clustered_join

    rng = np.arange(1000, dtype=np.int64)
    dim = pa.table({"k": pa.array(rng), "w": pa.array(rng * 7)})
    path = str(tmp_path / "dim.parquet")
    pq.write_table(dim, path, row_group_size=100)      # 10 row groups
    assert pq.read_metadata(path).num_row_groups == 10

    keys = np.array([5, 105, 205, 999, 1500, -3, 0, 205], np.int64)
    fact = pa.table({"k": pa.array(keys),
                     "v": pa.array(np.arange(len(keys), dtype=np.int64))})
    out = clustered_join(rd.from_arrow(fact).repartition(4), path,
                         fact_key="k", dim_key="k", dim_columns=["w"],
                         npart=8)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow")) \
        .sort_by([("k", "ascending"), ("v", "ascending")])
    want = fact.join(dim, keys="k", join_type="inner") \
        .sort_by([("k", "ascending"), ("v", "ascending")])
    assert got.select(["k", "v", "w"]).equals(want.select(["k", "v", "w"]))
    assert 1500 not in got["k"].to_pylist()            # beyond range: dropped
    # negative key dropped at route time (part < 0)
    assert -3 not in got["k"].to_pylist()


def test_clustered_join_rejects_unsorted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd
    from warc_ray.stages.exchange import clustered_join

    dim = pa.table({"k": pa.array([50, 10, 99], type=pa.int64())})
    path = str(tmp_path / "bad.parquet")
    pq.write_table(dim, path, row_group_size=1)
    fact = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError, match="not sorted"):
        clustered_join(fact, path, fact_key="k", dim_key="k")


def test_auto_join_three_paths_value_equal(ray_session, tmp_path):
    """auto_join must pick broadcast / clustered / hash from parquet
    stats and produce IDENTICAL rows on every path (the strategy only
    moves work)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from warc_ray.stages.exchange import auto_join

    rng = np.random.RandomState(7)
    fact = pa.table({
        "k": pa.array(rng.randint(0, 50, 300), type=pa.int64()),
        "v": pa.array(np.arange(300), type=pa.int64())})
    fact_path = str(tmp_path / "fact.parquet")
    pq.write_table(fact, fact_path)

    dim_sorted = pa.table({
        "k": pa.array(np.arange(0, 40), type=pa.int64()),   # 10 keys miss
        "w": pa.array(np.arange(0, 40) * 7, type=pa.int64())})
    ds_path = str(tmp_path / "dim_sorted.parquet")
    pq.write_table(dim_sorted, ds_path, row_group_size=8)

    perm = rng.permutation(40)
    du_path = str(tmp_path / "dim_unsorted.parquet")
    pq.write_table(dim_sorted.take(pa.array(perm)), du_path,
                   row_group_size=8)

    def run(dim_path, limit):
        ds, strat = auto_join(rd.read_parquet(fact_path), dim_path,
                              fact_key="k", dim_key="k",
                              dim_columns=["w"], npart=4,
                              broadcast_row_limit=limit)
        df = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        return df, strat

    base, s1 = run(ds_path, 1000)       # small dim → broadcast
    clus, s2 = run(ds_path, 10)        # big + sorted → clustered
    hashj, s3 = run(du_path, 10)       # big + unsorted → hash
    assert (s1, s2, s3) == ("broadcast", "clustered", "hash")
    assert len(base) == 300 * 0 + int((fact["k"].to_numpy() < 40).sum())
    for other in (clus, hashj):
        assert base.equals(other[base.columns])


def test_auto_join_broadcast_duplicate_and_empty_dim(ray_session,
                                                     tmp_path):
    """Broadcast path edge cases that round-2 ADVICE flagged: a dim
    with DUPLICATE keys must expand matches (N:M parity with the hash
    path), and an EMPTY dim must yield an empty result with the joined
    schema instead of raising IndexError."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from warc_ray.stages.exchange import auto_join

    fact = pa.table({
        "k": pa.array([0, 1, 2, 3, 1], type=pa.int64()),
        "v": pa.array([10, 11, 12, 13, 14], type=pa.int64())})
    fact_path = str(tmp_path / "fact.parquet")
    pq.write_table(fact, fact_path)

    # duplicate dim keys: k=1 appears 3x, k=2 appears 2x, k=9 misses
    dim = pa.table({
        "k": pa.array([0, 1, 1, 1, 2, 2, 9], type=pa.int64()),
        "w": pa.array([100, 201, 202, 203, 301, 302, 900],
                      type=pa.int64())})
    dim_path = str(tmp_path / "dim_dup.parquet")
    pq.write_table(dim, dim_path)

    ds, strat = auto_join(rd.read_parquet(fact_path), dim_path,
                          fact_key="k", dim_key="k",
                          dim_columns=["w"], broadcast_row_limit=1000)
    assert strat == "broadcast"
    got = ds.to_pandas().sort_values(["k", "v", "w"]) \
        .reset_index(drop=True)
    exp = fact.to_pandas().merge(dim.to_pandas(), on="k") \
        .sort_values(["k", "v", "w"]).reset_index(drop=True)
    assert got.equals(exp[got.columns])

    empty_path = str(tmp_path / "dim_empty.parquet")
    pq.write_table(dim.slice(0, 0), empty_path)
    ds2, strat2 = auto_join(rd.read_parquet(fact_path), empty_path,
                            fact_key="k", dim_key="k",
                            dim_columns=["w"], broadcast_row_limit=1000)
    assert strat2 == "broadcast"
    assert ds2.count() == 0
    assert ds2.schema().names == ["k", "v", "w"]


def test_distributed_select_matches_sort(ray_session):
    """radix-select = sort-based selection on hostile shapes: heavy
    duplicates, values straddling bucket boundaries, rank 1 and n."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from warc_ray.stages.exchange import distributed_select

    rng = np.random.RandomState(3)
    vals = np.concatenate([
        rng.randint(0, 5, 200),                  # heavy dup low values
        rng.randint(0, 1 << 30, 500),            # wide domain
        np.full(50, (1 << 30) - 1),              # boundary pile-up
    ]).astype(np.int64)
    n = len(vals)
    ranks = [1, 2, n // 3, n // 2, n - 1, n]

    def make_ds():
        return rd.from_arrow(pa.table({"v": vals})).repartition(6)

    got = distributed_select(make_ds, "v", ranks, n_total=n)
    srt = np.sort(vals)
    for k in ranks:
        assert got[k] == int(srt[k - 1]), k
