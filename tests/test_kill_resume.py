"""Crash-recovery invariant (G16): SIGKILL mid-crawl → resume →
byte-identical output vs an uninterrupted run.

Drives ``tools/kill_resume_check.py`` (the same harness that produces
the bench-scale artifact recorded in BASELINE.md) at the t2 profile so
the crash path — process group killed with no flush, torn shards and
post-checkpoint parts discarded on resume — is exercised in every
test run, not just graceful interruption
(test_crawl_parity.test_resume_from_checkpoint).

Subprocess-isolated: the harness owns its own Ray sessions, so this
test deliberately does NOT use the shared ray_session fixture.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_resume_byte_identical(tmp_path):
    env = dict(os.environ,
               RAY_GRAFT_CPUS="4",
               GRAFT_BENCH_OUT=str(tmp_path))
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "kill_resume_check.py"),
         "t2", "--kill-at", "2"],
        env=env, capture_output=True, text=True, timeout=900,
        cwd=REPO)
    assert p.returncode == 0, p.stdout + p.stderr
    res = json.loads(p.stdout.strip().splitlines()[-1])
    assert res["ok"], res
    assert res["equal_log"] and res["equal_cdx"] and res["equal_warc"]
    assert res["killed_at_round"] >= 2
    assert res["n_warc_shards"] > 0
