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


def _record_to_row(rec, path: str, offset: int, length: int) -> dict:
    from ..stages.assemble import parse_record_rows  # local import (cycle)

    row = parse_record_rows([rec]).to_pylist()[0]
    row["shard"] = path
    row["offset"] = offset
    row["length"] = length
    return row


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
        rows: list[dict] = []
        if path.endswith(".gz"):
            for offset, size, data in gzipm.iter_members(f):
                rec = parse_record_bytes(data)
                rows.append(_record_to_row(rec, path, offset, size))
                if len(rows) >= self._batch_rows:
                    yield pa.Table.from_pylist(rows, schema=READ_SCHEMA)
                    rows = []
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
                rows.append(_record_to_row(rec, path, start, end - start))
                start = end
                if len(rows) >= self._batch_rows:
                    yield pa.Table.from_pylist(rows, schema=READ_SCHEMA)
                    rows = []
        if rows:
            yield pa.Table.from_pylist(rows, schema=READ_SCHEMA)


def read_warc(paths, *, batch_rows: int = 512, **kwargs) -> "rd.Dataset":
    """Read WARC archives into a Dataset of record rows.

    ``paths`` may be a file, a directory of shards, or a list.
    """
    return rd.read_datasource(WarcDatasource(paths, batch_rows=batch_rows), **kwargs)
