"""Intra-file gzip-member split points (SURVEY §4): a big ``.warc.gz``
reads with parallelism > 1, byte-range tasks resynchronizing on member
boundaries — rows identical to the single-task read.

The record-per-member write invariant (reference warc/warc.py:269-272,
asserted by reference test_warc.py:100-109) is what makes every member
a valid split point.
"""

import gzip
import io
import os

import pyarrow as pa
import pytest

from warc_ray.core import gzipm


def _archive_bytes(n_records: int = 120, seed: int = 5) -> bytes:
    import numpy as np

    import warc_ray.core as wc

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    f = wc.WARCFile(fileobj=buf, compress=True)
    for i in range(n_records):
        # payload sizes vary so member boundaries land at odd offsets;
        # random bytes make the compressed stream adversarial for the
        # magic-scan (incompressible => magic-like bytes can occur)
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(10, 3000)),
                                     dtype=np.uint8))
        f.write_record(wc.WARCRecord(
            payload=payload,
            headers={"WARC-Type": "response",
                     "WARC-Target-URI": "http://h/%d" % i}))
    data = buf.getvalue()  # before close() closes the BytesIO
    f.close()
    return data


def test_members_in_range_partition():
    """For any range size, the union of members over consecutive ranges
    equals the full member list — each member owned exactly once."""
    data = _archive_bytes()
    expect = gzipm.split_members(data)
    assert len(expect) == 120
    for split in (512, 1777, 4096, 1 << 20):
        got = []
        for s in range(0, len(data), split):
            f = io.BytesIO(data)
            got.extend(gzipm.members_in_range(
                f, s, min(s + split, len(data)), prefix=b"WARC/"))
        assert [(o, n) for o, n, _ in got] == [(o, n) for o, n, _ in expect], split
        assert [d for *_, d in got] == [d for *_, d in expect]


def test_members_in_range_rejects_false_magic():
    """A payload crafted so its COMPRESSED member contains the gzip
    magic sequence must not desynchronize a mid-file range scan."""
    # store-mode gzip (level 0) embeds the raw payload in the stream,
    # so planting the magic in the payload plants it in the member
    evil = b"A" * 40 + b"\x1f\x8b\x08" + b"WARC/5 nope" + b"B" * 40
    m1 = gzip.compress(b"WARC/first " + b"x" * 300, compresslevel=9, mtime=0)
    m2 = gzip.compress(evil, compresslevel=0, mtime=0)
    m3 = gzip.compress(b"WARC/third " + b"y" * 300, compresslevel=9, mtime=0)
    data = m1 + m2 + m3
    inner = data.find(b"\x1f\x8b\x08", len(m1) + 1)
    assert len(m1) < inner < len(m1) + len(m2)  # decoy really embedded
    # a range starting just past member 2's true start must resync on
    # member 3, skipping the decoy inside member 2
    got = list(gzipm.members_in_range(io.BytesIO(data), len(m1) + 1,
                                      len(data), prefix=b"WARC/"))
    assert [o for o, *_ in got] == [len(m1) + len(m2)]
    assert got[0][2].startswith(b"WARC/third")


def test_read_warc_split_matches_unsplit(ray_session, tmp_path):
    from warc_ray.sources import read_warc

    data = _archive_bytes()
    p = tmp_path / "big.warc.gz"
    p.write_bytes(data)

    unsplit = read_warc(str(p)).to_pandas().sort_values("offset")
    split = read_warc(str(p), split_size=4096).to_pandas().sort_values("offset")
    assert len(unsplit) == 120
    assert split.offset.tolist() == unsplit.offset.tolist()
    assert split.record_id.tolist() == unsplit.record_id.tolist()
    assert [bytes(x) for x in split.payload] == \
        [bytes(x) for x in unsplit.payload]
    # the split plan really produced multiple range tasks
    assert os.path.getsize(p) // 4096 >= 4


def test_warc_columnar_parse_parity():
    # _members_to_table's fast path must emit exactly the rows the core
    # parser does — across extras, empty payloads, payloads containing
    # \r\n\r\n, and oddly-spaced header values (fallback cases included)
    import pyarrow as pa

    from warc_ray.core import gzipm
    from warc_ray.core.warcrec import parse_record_bytes
    from warc_ray.sources.warc_source import (_members_to_table,
                                              _records_to_table)

    def member(header_lines, payload):
        head = b"WARC/1.0\r\n" + b"".join(l + b"\r\n" for l in header_lines)
        return head + b"\r\n" + payload + b"\r\n\r\n"

    raws = [
        member([b"WARC-Type: response",
                b"WARC-Record-ID: <urn:uuid:1>",
                b"WARC-Target-URI: http://e/x",
                b"WARC-Date: 2026-01-01T00:00:00Z",
                b"Content-Length: 5",
                b"X-Extra-Header: keep me",
                b"Content-Type: text/plain"], b"hello"),
        member([b"Content-Length: 9"], b"a\r\n\r\nb c!"),       # CRLFCRLF inside payload
        member([b"Content-Length: 0", b"WARC-Type: metadata"], b""),
        member([b"Content-Length:4", b"odd:  spaced value "], b"abcd"),
        member([b"Content-Length: +3", b"WARC-Type: weird"], b"xyz"),  # int("+3") both paths
    ]
    members = []
    off = 0
    for r in raws:
        blob = gzipm.compress_member(r)
        members.append((off, len(blob), r))
        off += len(blob)

    fast = _members_to_table(members, "p.warc.gz")
    core = _records_to_table([parse_record_bytes(r) for r in raws],
                             "p.warc.gz", [m[0] for m in members],
                             [m[1] for m in members])
    assert fast.to_pydict() == core.to_pydict()


def test_warc_columnar_parse_real_shard(tmp_path, ray_session):
    # archive a few docs, read the shard back through both parse paths
    import glob

    import pyarrow as pa
    import ray.data as rd

    from warc_ray.core import gzipm
    from warc_ray.core.warcrec import parse_record_bytes
    from warc_ray.pipelines.archive import archive_docs
    from warc_ray.sources.warc_source import (_members_to_table,
                                              _records_to_table)
    from warc_ray import corpus

    cdir = corpus.ensure_corpus("t1")
    docs = rd.read_parquet(corpus.docs_path(cdir)).limit(40)
    out = str(tmp_path / "w")
    archive_docs(docs, out).materialize()
    f = sorted(glob.glob(out + "/*.warc.gz"))[0]
    data = open(f, "rb").read()
    members = list(gzipm.iter_member_spans(data))
    fast = _members_to_table(members, f)
    core = _records_to_table([parse_record_bytes(d) for _, _, d in members],
                             f, [m[0] for m in members],
                             [m[1] for m in members])
    assert fast.to_pydict() == core.to_pydict()
