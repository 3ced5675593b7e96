"""Span-invariant verifier (G13): per-row output↔corpus equality.

BASELINE.json input_hint: "per-row invariant vs the reference:
span-sequence equality (kind, text, media_ref, order)".  The archived
WARC response body is the rendered span interleaving
(stages/assemble.py render_body); this module parses it back and
compares the recovered sequence against the corpus row — as a
distributed hash-shuffle join on ``doc_id`` (union both sides, group
by key, compare inside the group), never materializing either side on
the driver.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

_LINK_RE = re.compile(r'^<a href="(?P<ref>[^"]*)">(?P<text>.*)</a>$', re.S)
_IMG_RE = re.compile(r'^<img src="(?P<ref>[^"]*)">$')
_VID_RE = re.compile(r'^<video src="(?P<ref>[^"]*)">$')


def body_to_spans(body: bytes) -> list[tuple[str, str, str]]:
    """Inverse of render_body: rendered bytes → [(kind, text,
    media_ref)] in document order.  Exact for the corpus' span alphabet
    (span text never contains newlines)."""
    if not body:
        return []
    out = []
    for line in body.decode("utf-8").split("\n"):
        m = _LINK_RE.match(line)
        if m:
            out.append(("link", m.group("text"), m.group("ref")))
            continue
        m = _IMG_RE.match(line)
        if m:
            out.append(("image", "", m.group("ref")))
            continue
        m = _VID_RE.match(line)
        if m:
            out.append(("video", "", m.group("ref")))
            continue
        out.append(("text", line, ""))
    return out


def _canon_seq(spans: list[tuple[str, str, str]]) -> str:
    return "\x1e".join("\x1f".join(s) for s in spans)


def _corpus_side(batch: pa.Table) -> pa.Table:
    seqs = [
        _canon_seq([(s["kind"], s["text"], s["media_ref"]) for s in spans])
        for spans in batch["spans"].to_pylist()
    ]
    return pa.table({
        "doc_id": batch["doc_id"],
        "side": pa.array(["ref"] * batch.num_rows),
        "seq": pa.array(seqs, type=pa.string()),
    })


def _warc_side(batch: pa.Table) -> pa.Table:
    doc_ids, seqs = [], []
    for uri, rec_type, payload in zip(batch["target_uri"].to_pylist(),
                                      batch["rec_type"].to_pylist(),
                                      batch["payload"].to_pylist()):
        if rec_type != "response" or not uri.startswith("urn:doc:"):
            continue
        body = bytes(payload).split(b"\r\n\r\n", 1)[1]
        doc_ids.append(uri.removeprefix("urn:doc:"))
        seqs.append(_canon_seq(body_to_spans(body)))
    n = len(doc_ids)
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "side": pa.array(["out"] * n),
        "seq": pa.array(seqs, type=pa.string()),
    })


def _compare_group(group: pa.Table) -> pa.Table:
    sides = dict(zip(group["side"].to_pylist(), group["seq"].to_pylist()))
    ok = len(sides) == 2 and sides.get("ref") == sides.get("out")
    return pa.table({
        "doc_id": group["doc_id"].slice(0, 1),
        "ok": pa.array([ok]),
        "n_sides": pa.array([group.num_rows], type=pa.int32()),
    })


def verify_archive_spans(warc_dir: str, corpus_docs_path: str) -> rd.Dataset:
    """(doc_id, ok, n_sides) per document: archived span sequence ==
    corpus span sequence.  Shuffle key = doc_id (G13)."""
    from ..sources import read_warc

    ref = rd.read_parquet(corpus_docs_path).map_batches(
        _corpus_side, batch_format="pyarrow")
    out = read_warc(warc_dir).map_batches(_warc_side, batch_format="pyarrow")
    both = ref.union(out)
    return both.groupby("doc_id").map_groups(
        _compare_group, batch_format="pyarrow")
