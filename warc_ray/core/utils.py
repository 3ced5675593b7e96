"""Small building blocks shared by the WARC/ARC format layer.

Behavioral parity targets (reference = internetarchive/warc v0.2.0):
  * ``CaseInsensitiveDict`` — case-insensitive str->str mapping with
    lower-cased storage keys (reference: warc/utils.py:12-43).  Unlike the
    py2 original, iteration order is *insertion order* (deterministic under
    py3), which also makes header serialization deterministic.
  * ``FilePart`` — bounded file-like view over ``length`` bytes of an
    underlying binary stream, with the 1 KiB-chunk ``readline`` whose
    CRLF-at-chunk-boundary behavior the reference's
    ``crlf_at_1k_boundary.warc.gz`` fixture guards
    (reference: warc/utils.py:45-96).

This module is pure Python 3 and operates on ``bytes``; it has no Ray
dependency and is safe to import inside any worker.
"""

from __future__ import annotations

from collections.abc import MutableMapping
from typing import Iterator


class CaseInsensitiveDict(MutableMapping):
    """A str->value mapping whose keys compare case-insensitively.

    Keys are stored lower-cased and returned lower-cased by ``keys()``;
    insertion order is preserved (py3 dict semantics), so serializing the
    mapping is deterministic.
    """

    def __init__(self, mapping=None, **kwargs):
        self._d: dict = {}
        if mapping is not None:
            self.update(mapping)
        if kwargs:
            self.update(kwargs)

    def __setitem__(self, name: str, value) -> None:
        self._d[name.lower()] = value

    def __getitem__(self, name: str):
        return self._d[name.lower()]

    def __delitem__(self, name: str) -> None:
        del self._d[name.lower()]

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def __eq__(self, other) -> bool:
        return isinstance(other, CaseInsensitiveDict) and other._d == self._d

    def __repr__(self) -> str:
        return f"CaseInsensitiveDict({self._d!r})"


class FilePart:
    """File-like view over the next ``length`` bytes of ``fileobj``.

    Mirrors the reference's lazy payload stream semantics
    (warc/utils.py:45-96): bounded ``read``, an ``_unread`` pushback
    buffer, and a ``readline`` that scans in 1024-byte chunks (the code
    path the ``crlf_at_1k_boundary`` fixture exercises).
    Operates on bytes.
    """

    CHUNK = 1024

    def __init__(self, fileobj, length: int):
        self.fileobj = fileobj
        self.length = length
        self.offset = 0
        self.buf = b""

    def read(self, size: int = -1) -> bytes:
        if size == -1:
            return self._read(self.length)
        return self._read(size)

    def _read(self, size: int) -> bytes:
        if len(self.buf) >= size:
            content, self.buf = self.buf[:size], self.buf[size:]
        else:
            size = min(size, self.length - self.offset - len(self.buf))
            content = self.buf + self.fileobj.read(size)
            self.buf = b""
        self.offset += len(content)
        return content

    def _unread(self, content: bytes) -> None:
        self.buf = content + self.buf
        self.offset -= len(content)

    def readline(self) -> bytes:
        chunks = []
        chunk = self._read(self.CHUNK)
        while chunk and b"\n" not in chunk:
            chunks.append(chunk)
            chunk = self._read(self.CHUNK)
        if b"\n" in chunk:
            index = chunk.index(b"\n")
            self._unread(chunk[index + 1:])
            chunk = chunk[: index + 1]
        chunks.append(chunk)
        return b"".join(chunks)

    def __iter__(self):
        line = self.readline()
        while line:
            yield line
            line = self.readline()
