"""Sessionize combine kernel edge cases (the q08 streaming window)."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"

MIN = 60_000_000  # one minute in us


def test_sessionize_edges(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pandas as pd

    from warc_ray.pipelines.relational import sessionize

    base = 1_700_000_000_000_000
    rows = [
        # user 1: 3 events, gap exactly 30min (NOT a break), then 30min+1us (break)
        (1, base),
        (1, base + 30 * MIN),
        (1, base + 60 * MIN + 1),
        # user 2: single event
        (2, base),
        # user 3: duplicate timestamps then a break
        (3, base), (3, base), (3, base + 31 * MIN),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = sessionize(str(tmp_path)).to_pandas()
    got = [(r.user_id, r.session_id, r.n_events) for r in out.itertuples()]
    assert got == [
        (1, 1, 2),   # 30min gap keeps the session
        (1, 2, 1),   # 30min+1us breaks
        (2, 1, 1),
        (3, 1, 2),   # duplicate ts same session
        (3, 2, 1),
    ]
    # start/end per session
    s11 = out[(out.user_id == 1) & (out.session_id == 1)].iloc[0]
    assert s11.start_ts == pd.Timestamp(base, unit="us")
    assert s11.end_ts == pd.Timestamp(base + 30 * MIN, unit="us")


def test_asof_prior_event_edges(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from warc_ray.pipelines.relational import asof_prior_event

    base = 1_700_000_000_000_000
    rows = [
        # (event_id, user, ts, type)
        (0, 1, base, "view"),
        (1, 1, base + 10, "click"),        # prior view at base
        (2, 1, base + 10, "view"),         # equal-ts view: excluded for #1
        (3, 1, base + 20, "click"),        # prior = base+10 (the later view)
        (4, 1, base + 20, "view"),         # a view row: its own prior = base+10
        (5, 2, base + 5, "click"),         # user 2 has no views -> NULL
        (6, 3, base, "view"),              # first view: no strictly-prior one
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = asof_prior_event(str(tmp_path)).to_pandas().set_index("event_id")

    def ptс(us):
        return pd.Timestamp(us, unit="us")

    assert out.loc[0].prior_ts is pd.NaT          # self excluded (strict >)
    assert out.loc[1].prior_ts == ptс(base)       # equal-ts view excluded
    assert out.loc[2].prior_ts == ptс(base)
    assert out.loc[3].prior_ts == ptс(base + 10)
    assert out.loc[4].prior_ts == ptс(base + 10)
    assert out.loc[5].prior_ts is pd.NaT
    assert out.loc[6].prior_ts is pd.NaT


def test_moving_average_edges_and_npart_invariance(ray_session):
    """q67: warm-up rows average over the shorter prefix window, values
    are exact integer milli math, and bucket count doesn't change
    results (per-user windows are bucket-local)."""
    from warc_ray.pipelines.relational import moving_average

    a = moving_average(SF, npart=32).to_pandas()
    b = moving_average(SF, npart=5).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    # per-user reference check on the first few users
    import pyarrow.parquet as pq_

    ev = pq_.read_table(SF + "/events.parquet",
                        columns=["user_id", "event_id", "ts", "value"]) \
        .to_pandas().sort_values(["user_id", "ts", "event_id"])
    ev["vm"] = np.floor(ev.value * 1000).astype(np.int64)
    for uid in sorted(ev.user_id.unique())[:5]:
        sub = ev[ev.user_id == uid].reset_index(drop=True)
        want = [int(sub.vm[max(0, i - 2):i + 1].sum()
                    // min(i + 1, 3)) for i in range(len(sub))]
        got = a[a.user_id == uid].sort_values("event_id")
        got = got.set_index("event_id").loc[sub.event_id].ma_milli.tolist()
        assert got == want, uid


def test_moving_average_negative_values_trunc_division(ray_session, tmp_path):
    """q67 division convention pinned against DuckDB on a corpus with
    NEGATIVE values: DuckDB ``//`` truncates toward zero (-7//2 = -3)
    while numpy ``//`` floors (-4).  The engine must divide like its
    declared SQL twin on ANY corpus — this test plants window sums of
    both signs, including ones where floor != trunc, and diffs the
    engine against the exact oracle SQL run by DuckDB."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from warc_ray.pipelines.relational import moving_average

    rng = np.random.default_rng(67)
    n = 400
    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array((rng.integers(0, 13, n)).astype(np.int64)),
        "ts": pa.array(base + rng.permutation(n) * 1_000_000,
                       type=pa.timestamp("us")),
        "event_type": pa.array(["x"] * n),
        # values in [-5, 5): negative milli sums guaranteed, odd sums
        # over 3-row windows exercise floor != trunc
        "value": pa.array(rng.uniform(-5.0, 5.0, n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = moving_average(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(entrymod.oracle_sql()["q67_moving_average"]).df()
    con.close()
    # the oracle must come back BIGINT (the CAST that fixes the round-4
    # driver hash row), and values must match exactly
    assert str(want.ma_milli.dtype) == "int64"
    assert got.columns.tolist() == want.columns.tolist()
    assert got.values.tolist() == want.values.tolist()
    # sanity: the corpus actually exercised the floor != trunc branch
    assert (got.ma_milli < 0).any()
