"""Format dispatch + real-fixture golden (reference test_common.py)."""

import gzip
import os

import pytest

from warc_ray.core import ARCFile, WARCFile, detect_format, open_archive

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def test_detect_format():
    assert detect_format("foo.warc") == "warc"
    assert detect_format("foo.warc.gz") == "warc"
    assert detect_format("foo.arc") == "arc"
    assert detect_format("foo.arc.gz") == "arc"
    assert detect_format("foo") == "unknown"


# test_common.py:8-14
def test_open_warc_file(tmp_path):
    p = str(tmp_path / "foo.warc")
    f = open_archive(p, "wb")
    assert isinstance(f, WARCFile)
    f.close()


# test_common.py:17-23
def test_open_arc_file(tmp_path):
    p = str(tmp_path / "foo.arc")
    f = open_archive(p, "wb")
    assert isinstance(f, ARCFile)
    f.close()


# test_common.py:26-30
def test_open_unknown_file(tmp_path):
    with pytest.raises(IOError):
        open_archive(str(tmp_path / "foo"), "wb")


# test_common.py:33-40 — golden first record of the Alexa crawl fixture
def test_sample_data():
    f = gzip.GzipFile(os.path.join(DATA, "alexa_short_header.arc.gz"))
    a = ARCFile(fileobj=f)
    record = str(a.read())
    expected = (
        "http://www.killerjo.net:80/robots.txt 211.111.217.29 20110804181142       39\n"
        "SSH-2.0-OpenSSH_5.3p1 Debian-3ubuntu3\r\n\n"
    )
    assert record == expected


def test_open_archive_arc_gz_direct():
    # Extension beyond the reference: open_archive on a .arc.gz wraps the
    # stream in gzip transparently (the reference's own warc.open would
    # hand ARCFile raw gzip bytes; its test wraps manually,
    # test_common.py:33-40).
    from warc_ray.core import open_archive

    f = open_archive(os.path.join(DATA, "alexa_short_header.arc.gz"))
    record = str(f.read())
    expected = (
        "http://www.killerjo.net:80/robots.txt 211.111.217.29 "
        "20110804181142       39\nSSH-2.0-OpenSSH_5.3p1 Debian-3ubuntu3\r\n\n"
    )
    assert record == expected


def test_stored_member_roundtrip():
    """compress_member_stored: valid one-member gzip, exact roundtrip,
    readable by the standard member splitter."""
    import numpy as np

    from warc_ray.core import gzipm

    rng = np.random.default_rng(3)
    for size in (0, 1, 500, 4096, 70_000):  # >64k spans >1 stored block
        data = rng.bytes(size)
        blob = gzipm.compress_member_stored(data)
        assert blob.startswith(gzipm.GZIP_MAGIC)
        members = gzipm.split_members(blob)
        assert len(members) == 1
        assert members[0][2] == data
        import gzip as _gz

        assert _gz.decompress(blob) == data
