"""Registry invariants for the correctness driver.

The driver samples the FIRST ~50 ``queries()`` entries; round-2's
VERDICT asked for that window to span every operator family with
fully-oracle-backed entries.  These tests pin the contract so future
registry edits can't silently break it.  No Ray needed — the registry
is plain dict construction.
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry


def test_sample_head_is_fully_oracle_backed():
    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    head = qs[:50]
    assert head == entry._DRIVER_SAMPLE_ORDER
    missing = [k for k in head if k not in oracles]
    assert not missing, f"sampled head lacks oracles: {missing}"


def test_sample_head_spans_families():
    head = set(entry.queries())
    head = entry._DRIVER_SAMPLE_ORDER
    families = {
        "crawl": {"q52_crawl_frontier", "q53_warc_roundtrip",
                  "q57_verify_spans", "q58_arc_roundtrip"},
        "formats": {"q158_jsonl_ingest", "q202_csv_ingest",
                    "q215_fixedwidth_ingest"},
        "dedup": {"q20_exact_dedup", "q21_minhash_pairs",
                  "q44_segment_dedup"},
        "sketch": {"q26_hll_host_distinct", "q49_cms_url_refs"},
        "tpch": {"q100_shipping_priority", "q163_tpch_q5",
                 "q189_large_orders"},
        "engine": {"q68_segment_order_stats", "q70_global_sort_orders",
                   "q103_skewed_user_join"},
    }
    for fam, keys in families.items():
        assert keys <= set(head), f"family {fam} missing from head"


def test_every_query_key_unique_and_well_formed():
    qs = list(entry.queries())
    assert len(qs) == len(set(qs))
    pat = re.compile(r"^q\d+_[a-z0-9_]+$")
    bad = [k for k in qs if not pat.match(k)]
    assert not bad, bad


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries())
    orphans = [k for k in entry.oracle_sql() if k not in qs]
    assert not orphans, f"oracle entries with no query: {orphans}"
