"""Shared read-parallelism default for the archive datasources.

Ray Data's automatic parallelism estimates in-memory size from
COMPRESSED file bytes, so gzip archives get bundled into far too few
read tasks (159 ARC shards → ~2 tasks read 8× slower than file-level
parallelism at sf0.1).  The opposite extreme — one block per file —
poisons any downstream all-to-all: a groupby over 1280 shard-blocks
spent ~100 s in shuffle task overhead where 64 blocks take 2 s.  The
right default is file-count capped at a small multiple of cluster
CPUs: every core gets read work, shuffles stay at sane partition
counts, and an explicit ``override_num_blocks`` still wins.
"""

from __future__ import annotations

import os


def default_read_blocks(n_files: int, per_cpu: int = 2) -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - defensive
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or 8
    return max(1, min(n_files, cpus * per_cpu))
