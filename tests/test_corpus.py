"""Corpus generator: determinism, schema, closed graph, span invariants."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from warc_ray import corpus
from warc_ray.schema import DOC_SCHEMA, ROBOTS_SCHEMA, SEED_SCHEMA


@pytest.fixture(scope="module")
def t1_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    return corpus.ensure_corpus("t1", root=root)


def test_schema_and_counts(t1_dir):
    p = corpus.PROFILES["t1"]
    tables = [corpus.read_bucket(t1_dir, b) for b in range(p.n_buckets)]
    total = sum(t.num_rows for t in tables)
    assert total == p.n_docs
    assert tables[0].schema.equals(DOC_SCHEMA)
    assert corpus.read_seeds(t1_dir).schema.equals(SEED_SCHEMA)
    assert corpus.read_robots(t1_dir).schema.equals(ROBOTS_SCHEMA)


def test_deterministic_regeneration(tmp_path):
    a = corpus._gen_bucket(corpus.PROFILES["t1"], 2)
    b = corpus._gen_bucket(corpus.PROFILES["t1"], 2)
    assert a.equals(b)


def test_offsets_strictly_increasing(t1_dir):
    t = corpus.read_bucket(t1_dir, 0)
    for spans in t["spans"].to_pylist():
        offs = [s["offset"] for s in spans]
        assert offs[0] == 0
        assert all(b > a for a, b in zip(offs, offs[1:]))


def test_span_fields(t1_dir):
    t = corpus.read_bucket(t1_dir, 1)
    for spans in t["spans"].to_pylist()[:50]:
        for s in spans:
            if s["kind"] == "text":
                assert s["text"] and s["media_ref"] == ""
            elif s["kind"] == "link":
                assert s["text"] and "/doc/" in s["media_ref"]
            else:
                assert s["text"] == "" and "/media/" in s["media_ref"]


def test_closed_graph(t1_dir):
    """Every media_ref resolves to a document inside the corpus."""
    p = corpus.PROFILES["t1"]
    t = corpus.read_bucket(t1_dir, 3)
    for spans in t["spans"].to_pylist():
        for s in spans:
            if s["media_ref"]:
                kind, idx = corpus.parse_synthetic_url(s["media_ref"])
                assert kind in ("doc", "media")
                assert 0 <= idx < p.n_docs
                # host in url matches host_index of target
                host = int(s["media_ref"].split("host-")[1].split(".")[0])
                assert host == int(corpus.host_index(idx, p.n_hosts))


def test_host_skew(t1_dir):
    p = corpus.PROFILES["t1"]
    idx = np.arange(p.n_docs)
    hosts = corpus.host_index(idx, p.n_hosts)
    assert (hosts == 0).mean() == pytest.approx(0.2, abs=0.01)


def test_seeds_have_noncanonical_variants(t1_dir):
    urls = corpus.read_seeds(t1_dir)["url"].to_pylist()
    assert any("HOST" in u or ":80" in u or "/./" in u or "#" in u or "%" in u
               for u in urls)


def test_robots_rules(t1_dir):
    p = corpus.PROFILES["t1"]
    t = corpus.read_robots(t1_dir)
    assert t.num_rows == p.n_hosts
    rules = dict(zip(t["host"].to_pylist(), t["disallow_prefixes"].to_pylist()))
    assert rules[f"host-{p.n_hosts-1}.example"] == ["/"]
    # full REP grammar is planted: plain prefixes, star+anchor rules,
    # trailing-star rules, and a multi-rule host (GEN_VERSION 3)
    all_rules = [r for rs in rules.values() for r in rs]
    assert any("*" in r and r.endswith("$") for r in all_rules)
    assert any(r.endswith("*") for r in all_rules)
    assert any(len(rs) > 1 for rs in rules.values())


def test_idempotent_ensure(t1_dir, tmp_path):
    # second call reuses the manifest and rewrites nothing
    import os
    mtime = os.path.getmtime(corpus.bucket_path(t1_dir, 0))
    d2 = corpus.ensure_corpus("t1", root=os.path.dirname(t1_dir))
    assert d2 == t1_dir
    assert os.path.getmtime(corpus.bucket_path(t1_dir, 0)) == mtime
