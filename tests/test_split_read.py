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


def _corrupt_one_member(data: bytes, idx: int) -> tuple[bytes, int, int]:
    """Zero 16 bytes in the middle of member ``idx``'s compressed body
    (past the 10-byte gzip header, so the member still looks like a
    member and fails only at inflate/CRC time).  Returns (corrupted
    bytes, member offset, member size)."""
    members = gzipm.split_members(data)
    off, size, _ = members[idx]
    mid = off + max(12, size // 2)
    m = bytearray(data)
    m[mid:mid + 16] = b"\x00" * 16
    return bytes(m), off, size


def test_planted_corrupt_member_strict_fails_one_range_task(
        ray_session, tmp_path):
    """Strict mode (reference IOError semantics): the corrupt member
    fails its OWN record-range task — other ranges, run independently,
    still parse their members (the failure granularity is the range,
    not the scan plan)."""
    import io as _io

    import pytest

    from warc_ray.sources import read_warc
    from warc_ray.sources.warc_source import _ReadWarcRanges, _plan_ranges

    data = _archive_bytes()
    bad, bad_off, _ = _corrupt_one_member(data, 60)
    p = tmp_path / "corrupt.warc.gz"
    p.write_bytes(bad)

    # whole-scan strict read surfaces the IOError (wrapped by Ray)
    with pytest.raises(Exception, match="(?i)gzip|corrupt|invalid|error"):
        read_warc(str(p), split_size=4096).materialize()

    # range-level: ONLY the range containing the corrupt member fails
    ranges = _plan_ranges([(str(p), len(bad))], 4096)
    reader = _ReadWarcRanges()
    n_fail = 0
    ok_rows = 0
    for r in ranges:
        batch = pa.table({"path": [r["path"]],
                          "start": pa.array([r["start"]], type=pa.int64()),
                          "end": pa.array([r["end"]], type=pa.int64())})
        try:
            for t in reader(batch):
                ok_rows += t.num_rows
        except Exception:
            n_fail += 1
    assert n_fail == 1              # exactly the corrupted range
    assert ok_rows > 60             # every other range parsed fine


def test_planted_corrupt_member_dlq_scan_completes(ray_session, tmp_path):
    """DLQ mode (q167 discipline applied to archives): the scan
    COMPLETES; every member before the corruption and every member
    owned by OTHER ranges parses; the corruption surfaces as
    ``_quarantined`` row(s) at a real offset — nothing silently
    vanishes and nothing fails."""
    from warc_ray.sources import read_warc
    from warc_ray.sources.warc_source import DLQ_REC_TYPE

    data = _archive_bytes()
    bad, bad_off, _ = _corrupt_one_member(data, 60)
    p = tmp_path / "corrupt.warc.gz"
    p.write_bytes(bad)

    df = read_warc(str(p), split_size=4096,
                   on_error="dlq").to_pandas()
    quarantined = df[df.rec_type == DLQ_REC_TYPE]
    good = df[df.rec_type != DLQ_REC_TYPE]
    assert len(quarantined) >= 1
    # the quarantine row points into the corrupted region's range
    assert (quarantined.offset <= bad_off).any()
    # members of every OTHER range all parsed: only the corrupted
    # range's tail (members from the corrupt one to its range end) is
    # lost to parsing — and is accounted for by the quarantine row
    expect = gzipm.split_members(data)
    range_end = ((bad_off // 4096) + 1) * 4096
    lost = [o for o, *_ in expect
            if bad_off <= o and o < range_end]
    assert len(good) == 120 - len(lost)
    # single-file (unsplit) dlq read also completes, quarantining the
    # tail from the corrupt member on
    df1 = read_warc(str(p), on_error="dlq").to_pandas()
    q1 = df1[df1.rec_type == DLQ_REC_TYPE]
    g1 = df1[df1.rec_type != DLQ_REC_TYPE]
    assert len(q1) == 1 and len(g1) == 60
