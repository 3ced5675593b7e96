#!/usr/bin/env python
"""Run one crawl bench arm when the host is quiet; record diagnostics.

Usage: python tools/quietrun.py <cpus> <tag> [profile]

Waits for 1-min load < threshold (default 2.0, env QUIET_THRESH), then
runs bench.py --job crawl-only in a fresh process with a round log, and
appends one JSON line {tag, cpus, load_before, load_after, result,
roundlog} to /tmp/quietruns.jsonl.
"""
import json
import os
import subprocess
import sys
import time


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    cpus = int(sys.argv[1])
    tag = sys.argv[2]
    profile = sys.argv[3] if len(sys.argv) > 3 else "benchxl"
    thresh = float(os.environ.get("QUIET_THRESH", "2.0"))
    max_wait = int(os.environ.get("QUIET_MAX_WAIT", "3600"))
    t0 = time.time()
    while load1() >= thresh and time.time() - t0 < max_wait:
        time.sleep(15)
    lb = load1()
    rl = f"/tmp/roundlog-{tag}.txt"
    if os.path.exists(rl):
        os.unlink(rl)
    env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_PROFILE=profile,
               GRAFT_BENCH_RUNS="1", WARC_RAY_ROUND_LOG=rl)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["rm", "-rf", "/tmp/warc_ray_bench",
                    "/dev/shm/warc_ray_bench"])
    os.sync()
    p = subprocess.run([sys.executable, os.path.join(repo, "bench.py"),
                        "--job", "crawl-only"],
                       env=env, capture_output=True, text=True, timeout=3600)
    la = load1()
    res = None
    if p.returncode == 0:
        res = json.loads(p.stdout.strip().splitlines()[-1])
    rec = {"tag": tag, "cpus": cpus, "profile": profile,
           "load_before": lb, "load_after": la,
           "rc": p.returncode, "result": res,
           "roundlog": open(rl).read() if os.path.exists(rl) else "",
           "stderr_tail": p.stderr[-1500:] if p.returncode else ""}
    with open("/tmp/quietruns.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("tag", "cpus", "load_before", "load_after", "rc")}))
    if res:
        print(json.dumps({"sec": res["value"], "phase": res.get("phase_sec")}))


if __name__ == "__main__":
    main()
