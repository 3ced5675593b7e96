"""Full REP (RFC 9309) robots matching — rule translation, frontier
gate, audit kernel and oracle-SQL agreement.

One matching semantics, four executions: the frontier seal gate
(compiled ``re`` alternation), the q259 audit (Arrow RE2 kernel), the
q259 DuckDB oracle (single-star SQL decomposition), and a brute-force
reference matcher here.  These tests pin them against each other.
"""

import re

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from warc_ray.state.frontier import (_robots_deny, compile_robots_rules,
                                     rep_rule_to_regex)

CASES = [
    # (pattern, path, should_match)
    ("/doc/1", "/doc/123", True),
    ("/doc/1", "/doc/2", False),
    ("/media/*7$", "/media/17", True),
    ("/media/*7$", "/media/7", True),       # '*' matches empty
    ("/media/*7$", "/media/171", False),    # anchor: must END in 7
    ("/doc/*3$", "/doc/3", True),
    ("/doc/*3$", "/doc/13", True),
    ("/doc/*3$", "/doc/31", False),
    ("/doc/2*", "/doc/2999", True),         # trailing star ≡ prefix
    ("/doc/2*", "/doc/19", False),
    ("/a*b", "/aXXb", True),
    ("/a*b", "/ab", True),
    ("/a*b", "/aXbY", True),                # unanchored: prefix match
    ("/a*b", "/aX", False),
    ("/doc/5$", "/doc/5", True),            # anchor without star
    ("/doc/5$", "/doc/55", False),
    ("/", "/anything", True),
    ("/x*y*z", "/x11y22z33", True),         # multi-star (engine only)
    ("/x*y*z", "/xz", False),
]


def _ref_match(pattern: str, path: str) -> bool:
    """Brute-force REP reference: '*' = any sequence, trailing '$' =
    end anchor, otherwise prefix semantics."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(seg) for seg in core.split("*"))
    rx = "^" + rx + ("$" if anchored else "")
    return re.match(rx, path) is not None


def test_case_table_engine_matcher():
    for pat, path, exp in CASES:
        plain, rx = compile_robots_rules([pat])
        assert _robots_deny(path, plain, rx) == exp, (pat, path)


def test_case_table_arrow_re2_kernel_agrees():
    """The audit's RE2 kernel (pc.match_substring_regex) must agree
    with the frontier's ``re`` matcher on the translated patterns."""
    import pyarrow.compute as pc

    for pat, path, exp in CASES:
        got = pc.match_substring_regex(
            pa.array([path]), rep_rule_to_regex(pat))[0].as_py()
        assert got == exp, (pat, path)


def test_case_table_sql_decomposition_agrees():
    """The q259 oracle's single-star SQL decomposition must agree with
    the engine on every ≤1-star pattern (the grammar the corpus
    plants; multi-star rules are engine-only by documented contract)."""
    con = duckdb.connect()
    for pat, path, exp in CASES:
        if pat.count("*") > 1:
            continue
        got = con.execute("""
            WITH r AS (
              SELECT (? LIKE '%$') AS anch,
                     CASE WHEN ? LIKE '%$'
                          THEN substr(?, 1, length(?) - 1)
                          ELSE ? END AS core),
            rr AS (
              SELECT anch, (strpos(core, '*') > 0) AS has_star,
                     CASE WHEN strpos(core, '*') > 0
                          THEN substr(core, 1, strpos(core, '*') - 1)
                          ELSE core END AS pre,
                     CASE WHEN strpos(core, '*') > 0
                          THEN substr(core, strpos(core, '*') + 1)
                          ELSE '' END AS suf
              FROM r)
            SELECT starts_with(?, pre) AND CASE
                WHEN NOT has_star AND NOT anch THEN TRUE
                WHEN NOT has_star AND anch THEN ? = pre
                WHEN anch THEN length(?) >= length(pre) + length(suf)
                  AND substr(?, length(?) - length(suf) + 1) = suf
                ELSE suf = ''
                  OR strpos(substr(?, length(pre) + 1), suf) > 0
              END FROM rr""",
            [pat, pat, pat, pat, pat, path, path, path, path, path,
             path]).fetchone()[0]
        assert bool(got) == exp, (pat, path)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="/abc17*$", min_size=0, max_size=12),
       st.text(alphabet="/abc17", min_size=0, max_size=16))
def test_hypothesis_engine_matches_reference(pattern, path):
    plain, rx = compile_robots_rules([pattern])
    assert _robots_deny(path, plain, rx) == _ref_match(pattern, path)


def test_frontier_gate_denies_wildcard_rules():
    """End-to-end through FrontierCore: wildcard-ruled URLs never reach
    the queues and are counted robots_denied."""
    import numpy as np

    from warc_ray.state.frontier import FrontierConfig, FrontierCore

    cfg = FrontierConfig(rate=8.0, burst=8, per_round_host_budget=8,
                         num_shards=1, filter_capacity=1 << 10)
    robots = {"h.example": (("/media/*7$", "/doc/2*"), 0)}
    core = FrontierCore(0, cfg, robots)
    urls = ["http://h.example/doc/1", "http://h.example/doc/29",
            "http://h.example/media/17", "http://h.example/media/171",
            "http://h.example/media/7", "http://h.example/doc/3"]
    n = len(urls)
    offer = pa.table({
        "url": pa.array(urls),
        "host": pa.array(["h.example"] * n),
        "priority": pa.array([1] * n, type=pa.int32()),
        "src_doc": pa.array([0] * n, type=pa.int64()),
        "src_offset": pa.array(list(range(n)), type=pa.int64()),
        "depth": pa.array([0] * n, type=pa.int32()),
        "hash64": pa.array(np.arange(n, dtype=np.uint64)),
    })
    core.offer(offer)
    core.seal_round()
    # denied: /doc/29 (prefix via trailing star), /media/17 and
    # /media/7 (star+anchor); kept: /doc/1, /media/171, /doc/3
    assert core.counters["robots_denied"] == 3
    assert core.counters["queued"] == 3
    emitted = core.pop_round(0)["url"].to_pylist()
    assert sorted(emitted) == ["http://h.example/doc/1",
                               "http://h.example/doc/3",
                               "http://h.example/media/171"]


def test_crawl_delay_caps_one_fetch_per_window():
    """REP Crawl-delay overrides the token bucket: a delayed host
    emits at most one URL per delay window even with full tokens."""
    import numpy as np

    from warc_ray.state.frontier import FrontierConfig, FrontierCore

    cfg = FrontierConfig(rate=8.0, burst=16, per_round_host_budget=8,
                         num_shards=1, filter_capacity=1 << 10)
    core = FrontierCore(0, cfg, {"h.example": ((), 3)})  # 3-round delay
    urls = [f"http://h.example/doc/{i}" for i in range(6)]
    offer = pa.table({
        "url": pa.array(urls),
        "host": pa.array(["h.example"] * 6),
        "priority": pa.array([1] * 6, type=pa.int32()),
        "src_doc": pa.array([0] * 6, type=pa.int64()),
        "src_offset": pa.array(list(range(6)), type=pa.int64()),
        "depth": pa.array([0] * 6, type=pa.int32()),
        "hash64": pa.array(np.arange(6, dtype=np.uint64)),
    })
    core.offer(offer)
    core.seal_round()
    got = {t: core.pop_round(t).num_rows for t in range(7)}
    # one fetch at t=0, then blocked until t=3, then t=6: windows of 3
    assert got == {0: 1, 1: 0, 2: 0, 3: 1, 4: 0, 5: 0, 6: 1}
