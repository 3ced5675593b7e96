"""Fuzzy edit-distance-1 join (stages/fuzzy.py): completeness of the
deletion-variant blocking vs brute force, pair uniqueness, and the
exact verify."""

import numpy as np
import pyarrow as pa
import pytest

from warc_ray.stages.fuzzy import deletion_variants, is_lev1, lev1_join


def _brute_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


@pytest.mark.parametrize("a,b,want", [
    ("abc", "abc", False),       # equal: distance 0
    ("abc", "abd", True),        # substitution
    ("abc", "ab", True),         # deletion
    ("abc", "xabc", True),       # insertion at front
    ("abc", "acb", False),       # transposition = distance 2
    ("abc", "a", False),
    ("", "x", True),
])
def test_is_lev1(a, b, want):
    assert is_lev1(a, b) is want
    assert (_brute_lev(a, b) == 1) is want


def _rand_keys(n=400, seed=17):
    rng = np.random.default_rng(seed)
    alpha = "abcd"  # tiny alphabet → dense distance-1 neighborhoods
    base = ["".join(rng.choice(list(alpha), rng.integers(3, 7)))
            for _ in range(n)]
    return pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                     "name": pa.array(base, type=pa.string())})


def test_lev1_join_matches_bruteforce(ray_session):
    import ray.data as rd

    t = _rand_keys()
    got = pa.concat_tables(
        lev1_join(rd.from_arrow(t).repartition(6), "name", "id")
        .iter_batches(batch_format="pyarrow"))
    pairs = sorted(zip(got["a_id"].to_pylist(), got["b_id"].to_pylist()))
    # pairs must be unique: a distance-1 pair shares exactly ONE
    # variant string (module docstring's completeness argument)
    assert len(pairs) == len(set(pairs))
    names = t["name"].to_pylist()
    want = sorted(
        (i, j)
        for i in range(len(names)) for j in range(i + 1, len(names))
        if _brute_lev(names[i], names[j]) == 1)
    assert pairs == want
    assert len(want) > 50  # the law test must exercise real pairs


def test_deletion_variants_counts():
    t = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                  "name": pa.array(["abc", "aa"], type=pa.string())})
    v = deletion_variants(t, "name", "id")
    by_id = {}
    for rid, var in zip(v["id"].to_pylist(), v["variant"].to_pylist()):
        by_id.setdefault(rid, set()).add(var)
    assert by_id[1] == {"abc", "bc", "ac", "ab"}
    # repeated chars: duplicate deletion variants collapse
    assert by_id[2] == {"aa", "a"}
