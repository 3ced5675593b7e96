"""Deterministic synthetic corpus: interleaved text+media documents.

Implements the input table mandated by BASELINE.json ``input_hint``:

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

plus the ``seeds`` and ``robots`` side tables (FIXTURES.md §2-3).

Everything is a pure function of ``(seed, profile)``:
  * per-bucket numpy Generators seeded ``[seed, bucket]`` — regeneration
    is byte-identical and independent of write order (resumable: each
    bucket is one parquet file, skipped if already present);
  * the crawl graph is closed — link spans point at ``/doc/<j>`` URLs and
    image/video spans at ``/media/<j>`` URLs of corpus documents;
  * host assignment is Zipf-ish: host 0 owns ~20% of docs (every 5th) to
    exercise hot-host salting; the rest spread uniformly by a mixed hash.

No Ray dependency — generation runs on the driver (or any worker) with
pyarrow + numpy only, so it can run at module-import time for the
correctness harness.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import DOC_SCHEMA, ROBOTS_SCHEMA, SEED_SCHEMA, SPAN_STRUCT

GEN_VERSION = 3  # v3: REP wildcard/$ robots rules (round-4)
DEFAULT_SEED = 42
CORPUS_ROOT = "/tmp/warc_ray_corpus"

# span-kind distribution: text, link, image, video
KIND_NAMES = np.array(["text", "link", "image", "video"])
KIND_P = np.array([0.55, 0.30, 0.10, 0.05])


@dataclass(frozen=True)
class Profile:
    name: str
    n_docs: int
    n_hosts: int
    n_seeds: int
    n_buckets: int
    seed: int = DEFAULT_SEED


PROFILES = {
    "t1": Profile("t1", 500, 20, 10, 4),
    "t2": Profile("t2", 5_000, 100, 50, 8),
    # bench: 50k seeds over 200k docs so crawl rounds are tens of
    # thousands of URLs wide — a 500-seed frontier is discovery-limited
    # (tiny rounds) and benchmarks the round barrier, not the engine.
    # The round-coordination floor is fixed (~80ms/round); scaling
    # efficiency is only meaningful when per-round work dwarfs it,
    # which is exactly the production regime (rounds of millions).
    "bench": Profile("bench", 1_200_000, 2_000, 600_000, 128),
    # benchxl: the scaling-criterion corpus — efficiency between two
    # cluster sizes is only meaningful when per-URL work dwarfs the
    # per-JOB constants (spawn, seed, final flush), i.e. the regime the
    # 10^10-URL rule describes; bench-sized runs at 32 CPUs finish in
    # ~15s and the constants are a third of that.
    "benchxl": Profile("benchxl", 2_400_000, 2_000, 1_200_000, 128),
    # benchxl2: 2x benchxl for the official scaling measurement — at
    # benchxl size a 32-CPU run finishes in ~20s and the per-JOB
    # constants (pool spawn, seed seal, round-barrier latency ~0.35s x
    # 12 rounds) are still ~25% of wall; doubling per-round work halves
    # their share, which is exactly the 10^10-URL regime the >=0.8
    # criterion describes (rounds of millions of URLs, hours-long
    # jobs).  More hosts (4k) keeps per-host politeness budgets — and
    # hence round count — the same while doubling round width.
    "benchxl2": Profile("benchxl2", 4_800_000, 4_000, 2_400_000, 256),
    # benchxl3: 2x benchxl2 — per-JOB constants (seed seal, 12 round
    # barriers, final flush tail) fall to ~5% of wall at 32 CPUs, and
    # the 32-arm's noise exposure is amortized over ~2x the work.  The
    # official scaling row uses the largest profile that keeps a full
    # harness run under ~an hour on this host.
    "benchxl3": Profile("benchxl3", 9_600_000, 8_000, 4_800_000, 512),
}

# testdata scale-factor directory basename -> corpus profile
SF_PROFILE = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}


def profile_for_sf_dir(sf_dir: str) -> Profile:
    base = os.path.basename(os.path.normpath(sf_dir))
    return PROFILES[SF_PROFILE.get(base, "t1")]


# ---------------------------------------------------------------------------
# URL scheme of the synthetic web
# ---------------------------------------------------------------------------

def _mix(i):
    """splitmix64-style integer mix (vectorized, deterministic).

    uint64 wraparound is the point — overflow warnings suppressed.
    """
    with np.errstate(over="ignore"):
        x = np.asarray(i, dtype=np.uint64)
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def host_index(doc_idx, n_hosts: int):
    """Host of doc i: every 5th doc → host 0 (~20% hot host)."""
    i = np.asarray(doc_idx, dtype=np.int64)
    spread = 1 + (_mix(i) % np.uint64(max(1, n_hosts - 1))).astype(np.int64)
    return np.where(i % 5 == 0, 0, spread)


def doc_url_array(doc_idx, n_hosts: int, kind: str = "doc") -> pa.Array:
    """Vectorized ``http://host-<h>.example/<kind>/<i>`` construction."""
    i = np.asarray(doc_idx, dtype=np.int64)
    h = host_index(i, n_hosts)
    return pc.binary_join_element_wise(
        "http://host-", pa.array(h.astype("U")), ".example/" + kind + "/",
        pa.array(i.astype("U")), "",
    )


def doc_url(i: int, n_hosts: int) -> str:
    return f"http://host-{int(host_index(i, n_hosts))}.example/doc/{i}"


def media_url(i: int, n_hosts: int) -> str:
    return f"http://host-{int(host_index(i, n_hosts))}.example/media/{i}"


def parse_synthetic_url(url: str):
    """Return ``(kind, doc_index)`` for a canonical synthetic URL, or
    ``(None, -1)`` if it doesn't resolve within the corpus."""
    try:
        path = url.split(".example", 1)[1]
        kind, idx = path.lstrip("/").split("/", 1)
        if kind in ("doc", "media"):
            return kind, int(idx)
    except (IndexError, ValueError):
        pass
    return None, -1


# ---------------------------------------------------------------------------
# Span generation (vectorized per bucket)
# ---------------------------------------------------------------------------

def _gen_bucket(p: Profile, bucket: int) -> pa.Table:
    """Docs ``i ≡ bucket (mod n_buckets)`` — one parquet file's worth."""
    rng = np.random.default_rng([p.seed, bucket])
    idx = np.arange(bucket, p.n_docs, p.n_buckets, dtype=np.int64)
    m = len(idx)

    n_spans = rng.integers(1, 13, size=m)
    total = int(n_spans.sum())
    parent = np.repeat(np.arange(m), n_spans)          # span -> local doc row
    doc_of_span = idx[parent]                          # span -> global doc index

    kind_code = rng.choice(4, size=total, p=KIND_P)
    target = rng.integers(0, p.n_docs, size=total)     # closed graph targets
    tok = rng.integers(0, 50_000, size=(total, 4))

    # text: 4 seeded tokens for text/link spans, "" for media spans
    words = pc.binary_join_element_wise(
        "w", pa.array(tok[:, 0].astype("U")), " w", pa.array(tok[:, 1].astype("U")),
        " w", pa.array(tok[:, 2].astype("U")), " w", pa.array(tok[:, 3].astype("U")), "",
    )
    empty = pa.array([""] * total)
    is_text_or_link = pa.array(kind_code <= 1)
    text = pc.if_else(is_text_or_link, words, empty)

    # media_ref: /doc/<j> for links, /media/<j> for image/video, "" for text
    link_ref = doc_url_array(target, p.n_hosts, "doc")
    media_ref = doc_url_array(target, p.n_hosts, "media")
    ref = pc.if_else(pa.array(kind_code == 1), link_ref,
                     pc.if_else(pa.array(kind_code >= 2), media_ref, empty))

    # strictly increasing char offsets: cumulative (len(text)+len(ref)+1)
    inc = (pc.utf8_length(text).to_numpy(zero_copy_only=False)
           + pc.utf8_length(ref).to_numpy(zero_copy_only=False) + 1)
    cum = np.cumsum(inc)
    doc_start = np.zeros(total, dtype=np.int64)
    starts = np.cumsum(n_spans)[:-1]                   # first span index per doc (from 2nd doc)
    if len(starts):
        doc_start[starts] = cum[starts - 1]
    offset = (cum - inc - np.maximum.accumulate(doc_start)).astype(np.int32)

    kinds = pa.array(KIND_NAMES[kind_code])
    span_struct = pa.StructArray.from_arrays(
        [kinds, text, ref, pa.array(offset, type=pa.int32())],
        fields=list(SPAN_STRUCT),
    )
    list_offsets = np.concatenate([[0], np.cumsum(n_spans)]).astype(np.int32)
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), span_struct)

    doc_ids = pc.binary_join_element_wise("doc-", pa.array(idx.astype("U")), "")
    buckets = pa.array(np.full(m, bucket, dtype=np.int32))
    return pa.table(
        {"doc_id": doc_ids, "spans": spans, "bucket": buckets},
        schema=DOC_SCHEMA,
    )


def _gen_seeds(p: Profile) -> pa.Table:
    """Seed list: canonical URLs + duplicates and non-canonical variants
    (uppercase host, :80 port, /./ segments, fragments, %-encoded
    unreserved chars) to exercise RFC 3986 canonicalization + dedup."""
    rng = np.random.default_rng([p.seed, 10_001])
    idx = np.arange(min(p.n_seeds, p.n_docs), dtype=np.int64)
    urls = [doc_url(int(i), p.n_hosts) for i in idx]
    variants = []
    for k, i in enumerate(idx[:: max(1, len(idx) // 8) or 1]):
        u = doc_url(int(i), p.n_hosts)
        scheme, rest = u.split("://", 1)
        host, path = rest.split("/", 1)
        variants.append([
            f"{scheme}://{host.upper()}/{path}",
            f"{scheme}://{host}:80/{path}",
            f"{scheme}://{host}/./{path}",
            f"{u}#frag{k}",
            u.replace("/doc/", "/%64oc/"),
        ][k % 5])
    all_urls = urls + variants
    prio = rng.integers(0, 10, size=len(all_urls)).astype(np.int32)
    return pa.table({"url": pa.array(all_urls), "priority": pa.array(prio)},
                    schema=SEED_SCHEMA)


def _gen_robots(p: Profile) -> pa.Table:
    """Per-host disallow rules in full REP form (RFC 9309): plain
    prefixes, ``*`` wildcards and trailing-``$`` anchors, chosen by a
    deterministic host-hash mix; the last host disallows everything;
    seeded crawl delays.

    Rule grammar planted here is deliberately single-star (``pre*suf``
    with optional ``$``): the engine's matcher handles arbitrary REP
    patterns (state/frontier.rep_rule_to_regex), but the q259 DuckDB
    oracle re-implements matching in plain SQL, which stays exact for
    one star."""
    rng = np.random.default_rng([p.seed, 10_002])
    hosts, rules, delays = [], [], []
    # Crawl-Delay is the exception, not the rule (real robots.txt
    # coverage of Crawl-Delay is ~10%): 90% of hosts have none.  A
    # uniform 0/100/500ms mix idles most hosts most rounds, making the
    # whole crawl cadence-bound instead of work-bound.
    delay_choices = np.array([0, 100, 500], dtype=np.int32)
    delay_p = np.array([0.9, 0.05, 0.05])
    for h in range(p.n_hosts):
        hosts.append(f"host-{h}.example")
        kind = int(_mix(np.int64(h)) % np.uint64(20)) if h > 0 else -1
        if p.n_hosts > 1 and h == p.n_hosts - 1:
            rules.append(["/"])
        elif kind in (3, 13):
            rules.append(["/doc/1"])          # plain prefix
        elif kind == 4:
            rules.append(["/media/*7$"])      # star + end anchor
        elif kind == 6:
            rules.append(["/doc/*3$", "/media/9"])  # two rules, mixed
        elif kind == 8:
            rules.append(["/doc/2*"])         # trailing star ≡ prefix
        else:
            rules.append([])
        delays.append(int(rng.choice(delay_choices, p=delay_p)))
    return pa.table(
        {"host": pa.array(hosts),
         "disallow_prefixes": pa.array(rules, type=pa.list_(pa.string())),
         "crawl_delay_ms": pa.array(delays, type=pa.int32())},
        schema=ROBOTS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Materialization (idempotent, per-bucket resumable)
# ---------------------------------------------------------------------------

def corpus_dir(profile: Profile, root: str = CORPUS_ROOT) -> str:
    return os.path.join(root, f"{profile.name}-seed{profile.seed}")


def ensure_corpus(profile: Profile | str, root: str = CORPUS_ROOT) -> str:
    """Generate (or reuse) the corpus for ``profile``; returns its dir.

    Layout::

        <dir>/MANIFEST.json
        <dir>/docs/bucket-<b>.parquet     # docs with i % n_buckets == b
        <dir>/seeds.parquet
        <dir>/robots.parquet
    """
    if isinstance(profile, str):
        profile = PROFILES[profile]
    d = corpus_dir(profile, root)
    manifest = os.path.join(d, "MANIFEST.json")
    # bump GEN_VERSION whenever any _gen_* function changes — cached
    # corpus dirs regenerate on mismatch (bucket files are reused only
    # when doc generation itself is unchanged; seeds/robots always
    # rewrite).
    params = dict(asdict(profile), gen_version=GEN_VERSION)
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == params:
                return d
        # params changed → stale bucket files must go (the per-bucket
        # exists-check below only resumes an INTERRUPTED generation of
        # the SAME params)
        shutil.rmtree(os.path.join(d, "docs"), ignore_errors=True)
    os.makedirs(os.path.join(d, "docs"), exist_ok=True)
    for b in range(profile.n_buckets):
        path = os.path.join(d, "docs", f"bucket-{b:04d}.parquet")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            pq.write_table(_gen_bucket(profile, b), tmp)
            os.replace(tmp, path)                      # atomic → resumable
    pq.write_table(_gen_seeds(profile), os.path.join(d, "seeds.parquet"))
    pq.write_table(_gen_robots(profile), os.path.join(d, "robots.parquet"))
    with open(manifest + ".tmp", "w") as f:
        json.dump(params, f)
    os.replace(manifest + ".tmp", manifest)
    return d


def docs_path(d: str) -> str:
    return os.path.join(d, "docs")


def bucket_path(d: str, bucket: int) -> str:
    return os.path.join(d, "docs", f"bucket-{bucket:04d}.parquet")


def read_bucket(d: str, bucket: int) -> pa.Table:
    return pq.read_table(bucket_path(d, bucket))


def read_seeds(d: str) -> pa.Table:
    return pq.read_table(os.path.join(d, "seeds.parquet"))


def read_robots(d: str) -> pa.Table:
    return pq.read_table(os.path.join(d, "robots.parquet"))
