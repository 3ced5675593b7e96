"""Format dispatch: open a WARC or ARC file by filename.

Parity with the reference's ``warc.open``/``detect_format``
(warc/__init__.py:13-38): substring match on the filename, ``IOError``
for unknown formats.
"""

from __future__ import annotations


def detect_format(filename: str) -> str:
    if ".arc" in filename:
        return "arc"
    if ".warc" in filename:
        return "warc"
    return "unknown"


def open_archive(filename: str, mode: str = "rb", format: str | None = None):
    from .arcrec import ARCFile
    from .warcfile import WARCFile

    if format in (None, "auto"):
        format = detect_format(filename)
    if format == "warc":
        return WARCFile(filename, mode)
    if format == "arc":
        return ARCFile(filename, mode)
    raise IOError("Don't know how to open '%s' files" % format)
