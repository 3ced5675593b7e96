"""JSONL log ingestion (q158, pipelines/logs.py): export → read-back
→ aggregate must be value-exact against a pandas ground truth, with
the text-format edge cases a real log pipeline hits."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from warc_ray.pipelines.logs import export_events_jsonl, ingest_events_jsonl


def _mk_events(path: str) -> pa.Table:
    base = dt.datetime(2024, 1, 1)
    rows = [
        # negative cents, zero value, repeated users across types,
        # multi-digit props, µs-precision timestamps
        (0, base, 7, "click", 9.64, '{"k": 12}'),
        (1, base + dt.timedelta(microseconds=1), 7, "click", -3.21, '{"k": 0}'),
        (2, base + dt.timedelta(days=400), 8, "click", 0.0, '{"k": 987654}'),
        (3, base, 7, "view", 185.22, '{"k": 87}'),
        (4, base + dt.timedelta(seconds=59, microseconds=999999),
         9, "view", 1e7 - 0.01, '{"k": 1}'),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], type=pa.float64()),
        "props": pa.array([r[5] for r in rows]),
    })
    pq.write_table(t, os.path.join(path, "events.parquet"))
    return t


def test_jsonl_roundtrip_aggregate(ray_session, tmp_path):
    sf_dir = str(tmp_path / "sf")
    out = str(tmp_path / "jsonl")
    os.makedirs(sf_dir)
    _mk_events(sf_dir)
    assert export_events_jsonl(sf_dir, out, batch_size=2) == 5
    shards = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(shards) >= 2          # really sharded, not one file
    got = {r["event_type"]: r for b in
           ingest_events_jsonl(out).iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    assert set(got) == {"click", "view"}
    c = got["click"]
    assert (c["n_events"], c["n_users"]) == (3, 2)
    assert c["sum_cents"] == 964 - 321 + 0
    assert c["min_ts_us"] == 1704067200000000
    assert c["max_ts_us"] == 1704067200000000 + 400 * 86400_000000
    assert c["sum_k"] == 12 + 0 + 987654
    v = got["view"]
    assert (v["n_events"], v["n_users"]) == (2, 2)
    assert v["sum_cents"] == 18522 + 999999999
    assert v["max_ts_us"] == 1704067200000000 + 59_999999


def test_jsonl_export_idempotent(ray_session, tmp_path):
    """Re-export with a different batch size must replace stale shards
    (the sink owns the dir) — read-back rows never double."""
    sf_dir = str(tmp_path / "sf")
    out = str(tmp_path / "jsonl")
    os.makedirs(sf_dir)
    _mk_events(sf_dir)
    export_events_jsonl(sf_dir, out, batch_size=2)
    export_events_jsonl(sf_dir, out, batch_size=5)
    total = sum(r["n_events"] for b in
                ingest_events_jsonl(out).iter_batches(batch_format="pyarrow")
                for r in b.to_pylist())
    assert total == 5


def test_read_evolved_union_by_name_and_widening(ray_session, tmp_path):
    """io.read_evolved: a gen-1 file (missing column, int32 ids) and a
    gen-2 file must surface as ONE stable schema with nulls filled and
    types widened — per batch, inside the scan."""
    import pyarrow.parquet as pq2

    from warc_ray import io as wio

    d = str(tmp_path / "evo")
    os.makedirs(d)
    pq2.write_table(pa.table({
        "id": pa.array([1, 2], type=pa.int32()),
        "v": pa.array([10.0, 20.0])}), d + "/gen1.parquet")
    pq2.write_table(pa.table({
        "id": pa.array([3], type=pa.int64()),
        "v": pa.array([30.0]),
        "src": pa.array(["web"])}), d + "/gen2.parquet")
    schema = pa.schema([("id", pa.int64()), ("v", pa.float64()),
                        ("src", pa.string())])
    rows = sorted((r["id"], r["v"], r["src"]) for b in
                  wio.read_evolved(d, schema)
                  .iter_batches(batch_format="pyarrow")
                  for r in b.to_pylist())
    assert rows == [(1, 10.0, None), (2, 20.0, None), (3, 30.0, "web")]
    assert all(b.schema == schema for b in
               wio.read_evolved(d, schema)
               .iter_batches(batch_format="pyarrow"))


def test_dlq_ingestion_reconciles(ray_session, tmp_path):
    """q167: torn lines land in the DLQ verbatim (recoverable), valid
    lines aggregate, and totals reconcile with the source exactly."""
    from warc_ray.pipelines.logs import (export_events_jsonl_corrupt,
                                         ingest_events_jsonl_dlq)

    sf_dir = str(tmp_path / "sf")
    src = str(tmp_path / "jsonl")
    dlq = str(tmp_path / "dlq")
    os.makedirs(sf_dir)
    t = _mk_events(sf_dir)
    # ids 0..4: none hits %97==13 — re-plant id 13 to force one tear
    import pyarrow.parquet as pq2
    t = t.set_column(0, "event_id",
                     pa.array([13, 1, 2, 3, 4], type=pa.int64()))
    pq2.write_table(t, os.path.join(sf_dir, "events.parquet"))
    assert export_events_jsonl_corrupt(sf_dir, src, batch_size=2) == 5

    got = {r["event_type"]: (r["n_events"], r["sum_cents"]) for b in
           ingest_events_jsonl_dlq(src, dlq)
           .iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    assert got["_quarantined"] == (1, 0)
    assert sum(n for n, _ in got.values()) == 5    # nothing vanished
    assert got["click"] == (2, -321 + 0)           # id 13 (click) torn out
    dlq_lines = []
    for f in os.listdir(dlq):
        dlq_lines += open(os.path.join(dlq, f)).read().splitlines()
    assert len(dlq_lines) == 1 and dlq_lines[0].startswith(
        '{"event_id":13,')


def test_csv_roundtrip_quoting(ray_session, tmp_path):
    """q202 sink/parse parity on hostile props: embedded commas,
    doubled quotes, leading/trailing spaces — the RFC-4180 cases.
    Byte-exact props after export → Arrow CSV read-back."""
    import pyarrow.csv as pacsv

    from warc_ray.pipelines.logs import _WriteCsvShard

    props = ['{"k": 1, "s": "a,b"}',
             '{"k": 2, "s": "he said \\"hi\\""}',
             '{"k": 3, "s": " padded "}',
             '{"k": 40}']
    base = dt.datetime(2024, 1, 1)
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([base] * 4, type=pa.timestamp("us")),
        "user_id": pa.array([7, 7, 8, 9], type=pa.int64()),
        "event_type": pa.array(["click"] * 4),
        "value": pa.array([1.0, -2.5, 0.0, 9.99], type=pa.float64()),
        "props": pa.array(props),
    })
    out = str(tmp_path / "csv")
    man = _WriteCsvShard(out)(t)
    assert man["n_rows"][0].as_py() == 4
    back = pacsv.read_csv(man["path"][0].as_py())
    assert back["props"].to_pylist() == props
    assert back["value_cents"].to_pylist() == [100, -250, 0, 999]


def test_csv_ingest_aggregate_matches_pandas(ray_session, tmp_path):
    from warc_ray.pipelines.logs import export_events_csv, \
        ingest_events_csv

    sf_dir = str(tmp_path / "sf")
    out = str(tmp_path / "csvdir")
    os.makedirs(sf_dir)
    _mk_events(sf_dir)
    assert export_events_csv(sf_dir, out, batch_size=2) == 5
    got = {r["event_type"]: r for b in
           ingest_events_csv(out).iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    assert got["click"]["n_events"] == 3
    assert got["click"]["n_users"] == 2
    assert got["click"]["sum_cents"] == 964 - 321 + 0
    assert got["click"]["sum_k"] == 12 + 0 + 987654
    assert got["view"]["sum_cents"] == 18522 + 10 ** 9 - 1
    assert got["view"]["props_bytes"] == len('{"k": 87}') + len('{"k": 1}')


def test_fixedwidth_roundtrip_layout(ray_session, tmp_path):
    """q215 layout parity on boundary-width values: 12-digit orderkey,
    full-width priority, zero cents."""
    from warc_ray.pipelines.logs import (_FW_LAYOUT, _WriteFixedWidthShard,
                                         ingest_orders_fixedwidth)

    t = pa.table({
        "o_orderkey": pa.array([999999999999, 1], type=pa.int64()),
        "o_custkey": pa.array([9999999999, 2], type=pa.int64()),
        "o_orderstatus": pa.array(["F", "O"]),
        "o_totalprice": pa.array([0.0, 123456.78], type=pa.float64()),
        "o_orderdate": pa.array([dt.datetime(1999, 12, 31),
                                 dt.datetime(2001, 1, 2)],
                                type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT-MAX-15", "5-LOW"]),
    })
    out = str(tmp_path / "fw")
    man = _WriteFixedWidthShard(out)(t)
    path = man["path"][0].as_py()
    lines = open(path).read().splitlines()
    assert all(len(x) == _FW_LAYOUT[-1][1] for x in lines)
    assert lines[0] == ("999999999999" + "9999999999" + "F"
                        + "0" * 14 + "19991231" + "1-URGENT-MAX-15")
    got = {(r["status"], r["priority"]): r for b in
           ingest_orders_fixedwidth(out)
           .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    assert got[("O", "5-LOW")]["sum_cents"] == 12345678
    assert got[("F", "1-URGENT-MAX-15")]["min_date"] == 19991231
