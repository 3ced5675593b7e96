"""``read_warc`` — distributed WARC reader (Ray Data datasource).

The reference reads one file per process, one record at a time
(warc/warc.py:244-263,274-279).  Here each ``.warc.gz`` file is a read
task; because the write path puts **one gzip member per record**
(warc/warc.py:269-272), member boundaries are record-aligned split
points, and a file streams through ``gzipm.iter_members`` with memory
bounded by one member + one record batch.

Rows follow ``schema.WARC_RECORD_SCHEMA`` plus provenance columns
(``shard``, ``offset``, ``length``) — the browse()/CDX information
(warc/warc.py:284-313) falls out of member scanning for free.
"""

from __future__ import annotations

import io
from typing import Iterator

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

from ..core import gzipm
from ..core.warcrec import WARCReader, parse_record_bytes
from ..schema import WARC_RECORD_SCHEMA

READ_SCHEMA = pa.schema(
    list(WARC_RECORD_SCHEMA)
    + [("shard", pa.string()), ("offset", pa.int64()), ("length", pa.int64())]
)


def _records_to_table(recs: list, path: str, offsets: list[int],
                      lengths: list[int]) -> pa.Table:
    """One Arrow table per BATCH of parsed records (building a 1-row
    table per record was a third of read-path cost)."""
    from ..stages.assemble import parse_record_rows  # local import (cycle)

    t = parse_record_rows(recs)
    n = t.num_rows
    return t.append_column("shard", pa.array([path] * n, type=pa.string())) \
        .append_column("offset", pa.array(offsets, type=pa.int64())) \
        .append_column("length", pa.array(lengths, type=pa.int64()))


class WarcDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, batch_rows: int = 512, **kwargs):
        super().__init__(paths, **kwargs)
        self._batch_rows = batch_rows

    def _open_input_source(self, filesystem, path, **open_args):
        # We scan gzip members ourselves (record-aligned split points);
        # defeat the base class's path-based auto-decompression.
        buffer_size = open_args.pop("buffer_size", None)
        if buffer_size is None:
            buffer_size = self._data_context.streaming_read_buffer_size
        return filesystem.open_input_stream(
            path, buffer_size=buffer_size, compression=None
        )

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        recs, offs, lens = [], [], []
        if path.endswith(".gz"):
            for offset, size, data in gzipm.iter_members(f):
                recs.append(parse_record_bytes(data))
                offs.append(offset)
                lens.append(size)
                if len(recs) >= self._batch_rows:
                    yield _records_to_table(recs, path, offs, lens)
                    recs, offs, lens = [], [], []
        else:
            # Uncompressed: offsets are raw byte offsets.
            buf = io.BytesIO(f.read())
            reader = WARCReader(buf)
            start = buf.tell()
            while True:
                rec = reader.read_record()
                if rec is None:
                    break
                payload = rec.payload.read()  # materialize before cursor moves
                rec.payload = payload
                reader.finish_reading_current_record()
                end = buf.tell()
                recs.append(rec)
                offs.append(start)
                lens.append(end - start)
                start = end
                if len(recs) >= self._batch_rows:
                    yield _records_to_table(recs, path, offs, lens)
                    recs, offs, lens = [], [], []
        if recs:
            yield _records_to_table(recs, path, offs, lens)


DEFAULT_SPLIT_SIZE = 64 << 20


def _expand_paths(paths) -> list[tuple[str, int]]:
    import os

    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if name.endswith((".warc", ".warc.gz")):
                    fp = os.path.join(p, name)
                    out.append((fp, os.path.getsize(fp)))
        else:
            out.append((p, os.path.getsize(p)))
    return out


def _plan_ranges(files: list[tuple[str, int]], split_size: int) -> list[dict]:
    """One descriptor per byte range; only ``.gz`` files split (member
    boundaries are the record-aligned split points; a bare ``.warc``
    has no in-band resync marker, so it stays one task)."""
    tasks = []
    for path, size in files:
        if path.endswith(".gz") and size > split_size:
            for s in range(0, size, split_size):
                tasks.append({"path": path, "start": s,
                              "end": min(s + split_size, size)})
        else:
            tasks.append({"path": path, "start": 0, "end": size})
    return tasks


class _ReadWarcRanges:
    """map_batches callable over range descriptors → record rows.

    Each descriptor is an independent task: seek, resynchronize on the
    next validated gzip member (prefix b"WARC/"), stream members whose
    start offset falls inside the range (gzipm.members_in_range)."""

    def __init__(self, batch_rows: int = 512):
        self._batch_rows = batch_rows

    def __call__(self, batch: pa.Table):
        recs, offs, lens = [], [], []
        cur_path = None
        for path, start, end in zip(batch["path"].to_pylist(),
                                    batch["start"].to_pylist(),
                                    batch["end"].to_pylist()):
            cur_path = path
            if path.endswith(".gz"):
                with open(path, "rb") as f:
                    for off, size, data in gzipm.members_in_range(
                            f, start, end, prefix=b"WARC/"):
                        recs.append(parse_record_bytes(data))
                        offs.append(off)
                        lens.append(size)
                        if len(recs) >= self._batch_rows:
                            yield _records_to_table(recs, path, offs, lens)
                            recs, offs, lens = [], [], []
            else:
                with open(path, "rb") as f:
                    buf = io.BytesIO(f.read())
                reader = WARCReader(buf)
                pos = buf.tell()
                while True:
                    rec = reader.read_record()
                    if rec is None:
                        break
                    payload = rec.payload.read()
                    rec.payload = payload
                    reader.finish_reading_current_record()
                    end_pos = buf.tell()
                    recs.append(rec)
                    offs.append(pos)
                    lens.append(end_pos - pos)
                    pos = end_pos
                    if len(recs) >= self._batch_rows:
                        yield _records_to_table(recs, path, offs, lens)
                        recs, offs, lens = [], [], []
            # flush per descriptor: rows must carry THEIR file's path
            if recs:
                yield _records_to_table(recs, cur_path, offs, lens)
                recs, offs, lens = [], [], []
        # always yield (possibly empty) so the stage schema stays stable
        yield pa.Table.from_pylist([], schema=READ_SCHEMA)


def read_warc(paths, *, batch_rows: int = 512,
              split_size: int = DEFAULT_SPLIT_SIZE, **kwargs) -> "rd.Dataset":
    """Read WARC archives into a Dataset of record rows.

    ``paths`` may be a file, a directory of shards, or a list.  A
    ``.warc.gz`` larger than ``split_size`` is read by MULTIPLE
    byte-range tasks that resynchronize on gzip-member boundaries (the
    record-per-member write invariant makes every member a split
    point), so one 100 GB Common-Crawl-style shard parallelizes across
    the cluster instead of pinning one reader task.  Files below the
    threshold keep the one-task-per-file datasource path."""
    try:
        files = _expand_paths(paths)
    except OSError:
        files = []
    if files and any(p.endswith(".gz") and sz > split_size for p, sz in files):
        ranges = _plan_ranges(files, split_size)
        desc = rd.from_arrow(pa.table({
            "path": [r["path"] for r in ranges],
            "start": pa.array([r["start"] for r in ranges], type=pa.int64()),
            "end": pa.array([r["end"] for r in ranges], type=pa.int64()),
        }))
        # one descriptor per task: ranges are the parallelism unit
        return desc.map_batches(_ReadWarcRanges(batch_rows),
                                batch_format="pyarrow", batch_size=1)
    return rd.read_datasource(WarcDatasource(paths, batch_rows=batch_rows), **kwargs)
