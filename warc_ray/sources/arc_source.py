"""``read_arc`` — distributed ARC v1/v2 reader (Ray Data datasource).

Mirrors the reference's read path (warc/arc.py:307-372): the filedesc
file-header record is consumed once per file (version autodetected from
its second line), then records stream out.  Each ``.arc``/``.arc.gz``
file is one read task; rows follow ``schema.ARC_RECORD_SCHEMA`` plus a
``shard`` provenance column.  File headers are attached to every row
(``file_org``, ``file_date``) rather than datasource metadata so they
survive unions of many files.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

from ..core.arcrec import ARCFile
from ..schema import ARC_RECORD_SCHEMA

READ_SCHEMA = pa.schema(
    list(ARC_RECORD_SCHEMA)
    + [("shard", pa.string()), ("file_org", pa.string()), ("file_date", pa.string())]
)


class ArcDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["arc", "arc.gz"]

    def __init__(self, paths, batch_rows: int = 512, **kwargs):
        super().__init__(paths, **kwargs)
        self._batch_rows = batch_rows

    def _open_input_source(self, filesystem, path, **open_args):
        # raw bytes; we decompress (multi-member capable) ourselves
        buffer_size = open_args.pop("buffer_size", None)
        if buffer_size is None:
            buffer_size = self._data_context.streaming_read_buffer_size
        return filesystem.open_input_stream(
            path, buffer_size=buffer_size, compression=None
        )

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        data = f.read()
        if path.endswith(".gz"):
            data = gzip.decompress(data)
        af = ARCFile(fileobj=io.BytesIO(data))
        rows: list[dict] = []
        for rec in af:
            h = rec.header
            rows.append({
                "url": h["url"], "ip_address": h["ip_address"], "date": h["date"],
                "content_type": h["content_type"], "result_code": h["result_code"],
                "checksum": h["checksum"], "location": h["location"],
                "offset": h["offset"], "filename": h["filename"],
                "length": h["length"], "arc_version": af.version,
                "payload": rec.payload or b"",
                "shard": path,
                "file_org": af.file_headers.get("org", ""),
                "file_date": af.file_headers["date"].strftime("%Y%m%d%H%M%S")
                if af.file_headers.get("date") else "",
            })
            if len(rows) >= self._batch_rows:
                yield pa.Table.from_pylist(rows, schema=READ_SCHEMA)
                rows = []
        if rows:
            yield pa.Table.from_pylist(rows, schema=READ_SCHEMA)


def read_arc(paths, *, batch_rows: int = 512, **kwargs) -> "rd.Dataset":
    return rd.read_datasource(ArcDatasource(paths, batch_rows=batch_rows), **kwargs)
