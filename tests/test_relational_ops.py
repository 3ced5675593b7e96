"""Edge-case tests for the round-2 relational operators (q14–q18):
grouped top-k, exact quantiles, hash sample, range join, anti join.
Each is compared against DuckDB running the same SQL as the driver
oracle, on adversarial in-memory fixtures (ties, duplicates, empties).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


MIN = 60_000_000  # one minute in us
BASE = 1_700_000_000_000_000


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, event_type, value)"""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([float(r[4]) for r in rows]),
        "props": pa.array([""] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf_dir}/events.parquet')")
    return con.execute(sql).df()


def test_grouped_topk_ties_and_small_groups(ray_session, tmp_path):
    from warc_ray.pipelines.relational import grouped_topk_events

    rows = [
        # user 1: 5 events, value ties broken by event_id
        (10, 1, BASE, "x", 5.0), (11, 1, BASE, "x", 5.0),
        (12, 1, BASE, "x", 5.0), (13, 1, BASE, "x", 7.0),
        (14, 1, BASE, "x", -1.0),
        # user 2: fewer than k events, negative values
        (20, 2, BASE, "x", -3.5), (21, 2, BASE, "x", -2.5),
        # user 3: single event, value 0
        (30, 3, BASE, "x", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = grouped_topk_events(sf).to_pandas()
    want = _duck(sf, """
        SELECT user_id, event_id, value, rank FROM (
            SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rank
            FROM events) WHERE rank <= 3 ORDER BY user_id, rank""")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_event_quantiles_matches_percentile_disc(ray_session, tmp_path):
    from warc_ray.pipelines.relational import event_quantiles

    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    # group sizes chosen to hit ceil() boundary cases: q*n integral,
    # n=1, n=2, and a large group with duplicate values
    for etype, n in [("a", 1), ("b", 2), ("c", 10), ("d", 100), ("e", 997)]:
        for _ in range(n):
            rows.append((eid, 1, BASE + eid, etype,
                         float(rng.integers(0, 50)) / 7.0))
            eid += 1
    sf = _write_events(tmp_path, rows)
    got = event_quantiles(sf).to_pandas()
    want = _duck(sf, """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(percentile_disc(0.50) WITHIN GROUP
                    (ORDER BY CAST(FLOOR(value*1000) AS BIGINT)) AS BIGINT) AS p50_milli,
               CAST(percentile_disc(0.90) WITHIN GROUP
                    (ORDER BY CAST(FLOOR(value*1000) AS BIGINT)) AS BIGINT) AS p90_milli,
               CAST(percentile_disc(0.99) WITHIN GROUP
                    (ORDER BY CAST(FLOOR(value*1000) AS BIGINT)) AS BIGINT) AS p99_milli
        FROM events GROUP BY event_type ORDER BY event_type""")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_range_join_window_edges(ray_session, tmp_path):
    from warc_ray.pipelines.relational import range_join_views

    rows = [
        # user 1: views at 0, 10min(exact window edge), 20min
        (0, 1, BASE, "view", 1.0),
        (1, 1, BASE + 10 * MIN, "view", 1.0),
        (2, 1, BASE + 20 * MIN, "click", 1.0),   # views at 10min in; 0 out
        (3, 1, BASE + 10 * MIN, "click", 1.0),   # view at same ts EXCLUDED,
                                                 # view at 0 exactly at edge IN
        # user 2: view exactly at another user's window — must not leak
        (4, 2, BASE + 15 * MIN, "view", 1.0),
        (5, 2, BASE + 15 * MIN, "purchase", 1.0),  # same-ts view excluded
        (6, 2, BASE + 15 * MIN + 1, "click", 1.0),  # 1us later: included
        # user 3: no views at all
        (7, 3, BASE, "click", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = range_join_views(sf).to_pandas()
    want = _duck(sf, """
        SELECT e.event_id, e.user_id,
               CAST(COUNT(v.ts) AS BIGINT) AS n_views_10m
        FROM events e LEFT JOIN events v
          ON v.user_id = e.user_id AND v.event_type = 'view'
         AND v.ts >= e.ts - INTERVAL 10 MINUTE AND v.ts < e.ts
        GROUP BY 1, 2 ORDER BY e.event_id""")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    # spot-check the documented edges
    by_id = dict(zip(got["event_id"], got["n_views_10m"]))
    assert by_id[2] == 1      # 10min view in, 0min view out
    assert by_id[3] == 1      # same-ts view excluded, 10min-ago view in
    assert by_id[5] == 0      # same-ts view excluded
    assert by_id[6] == 1      # 1us-later click sees it
    assert by_id[7] == 0


def test_anti_join_and_hash_sample(ray_session, tmp_path):
    import hashlib

    from warc_ray.pipelines.relational import (customers_without_orders,
                                               sample_documents)

    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"]),
    })
    orders = pa.table({
        "o_custkey": pa.array([2, 2, 4, 1], type=pa.int64()),
        "o_orderpriority": pa.array(
            ["1-URGENT", "5-LOW", "1-URGENT", "5-LOW"]),
    })
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = customers_without_orders(str(tmp_path)).to_pandas()
    # only 2 and 4 placed URGENT orders
    assert list(got["c_custkey"]) == [1, 3]
    assert list(got["c_name"]) == ["a", "c"]

    docs = pa.table({
        "doc_id": pa.array(range(1000), type=pa.int64()),
        "lang": pa.array(["en"] * 1000),
        "n_chars": pa.array([7] * 1000, type=pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = sample_documents(str(tmp_path)).to_pandas()
    want = sorted(i for i in range(1000)
                  if hashlib.md5(str(i).encode()).hexdigest()[:2] <= "28")
    assert list(got["doc_id"]) == want
    assert 0.10 < len(want) / 1000 < 0.22      # ~16% expected
