"""WARCFile — file-level read/write API (plain or multi-member gzip).

Py3 counterpart of the reference's ``WARCFile`` (warc/warc.py:244-313):

  * ``write_record`` writes each record as its **own gzip member** when
    compressed (warc/warc.py:269-272) so archives stay record-splittable.
  * iteration yields records in file order; payloads are lazy
    ``FilePart`` views (bounded memory).
  * ``browse()`` yields ``(record, offset, size)`` with the payload
    capped at 1 MB (warc/warc.py:284-313); offsets are compressed-file
    offsets for ``.gz`` inputs — the CDX-style index the distributed
    sink also emits.
  * ``tell()`` reports the compressed offset for gzip files
    (warc/warc.py:306-313).
"""

from __future__ import annotations

import builtins
import io

from . import gzipm
from .utils import FilePart
from .warcrec import WARCReader, WARCRecord, read_header

BROWSE_PAYLOAD_CAP = 1024 * 1024  # reference warc/warc.py:300


class _GzipMemberRecordReader:
    """Reads WARC records from a multi-member gzip stream, one member
    per record, tracking compressed offsets."""

    def __init__(self, fileobj):
        self.raw = fileobj
        self._members = gzipm.iter_members(fileobj)
        self.member_start = 0
        self.member_size = 0
        self.next_offset = 0

    def read_record(self):
        try:
            offset, size, data = next(self._members)
        except StopIteration:
            return None
        self.member_start, self.member_size = offset, size
        self.next_offset = offset + size
        f = io.BytesIO(data)
        header = read_header(f)
        if header is None:
            return None
        payload = FilePart(f, header.content_length)
        return WARCRecord(header, payload, defaults=False)

    def __iter__(self):
        record = self.read_record()
        while record is not None:
            yield record
            record = self.read_record()


class WARCFile:
    def __init__(self, filename=None, mode=None, fileobj=None, compress=None):
        if fileobj is None:
            mode = mode or "rb"
            if "b" not in mode:
                mode += "b"
            fileobj = builtins.open(filename, mode)
        if compress is None and filename and filename.endswith(".gz"):
            compress = True
        self.compress = bool(compress)
        self.fileobj = fileobj
        self._reader = None

    @property
    def reader(self):
        if self._reader is None:
            if self.compress:
                self._reader = _GzipMemberRecordReader(self.fileobj)
            else:
                self._reader = WARCReader(self.fileobj)
        return self._reader

    def write_record(self, warc_record: WARCRecord) -> None:
        data = warc_record.to_bytes()
        if self.compress:
            self.fileobj.write(gzipm.compress_member(data))
        else:
            self.fileobj.write(data)

    def read_record(self):
        return self.reader.read_record()

    def __iter__(self):
        return iter(self.reader)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def close(self):
        self.fileobj.close()

    def tell(self) -> int:
        """Compressed-file offset for gzip inputs (warc/warc.py:306-313)."""
        if self.compress:
            r = self._reader
            return r.next_offset if isinstance(r, _GzipMemberRecordReader) else 0
        return self.fileobj.tell()

    def browse(self):
        """Iterate ``(record, offset, size)``; payload capped at 1 MB."""
        offset = 0
        reader = self.reader
        for record in reader:
            record.payload = io.BytesIO(record.payload.read(BROWSE_PAYLOAD_CAP))
            if isinstance(reader, WARCReader):
                reader.finish_reading_current_record()
            next_offset = self.tell()
            yield record, offset, next_offset - offset
            offset = next_offset
