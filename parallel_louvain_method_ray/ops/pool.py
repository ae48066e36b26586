"""Actor-pool sizing helper.

Stateful map_batches stages (MinHasher, SimHasher, TextStats, LangId, the
HTML extractor) use ELASTIC pools: `concurrency=(1, cap)` lets Ray Data's
autoscaler grow the pool to the cluster's free CPUs instead of starving a
32-CPU run with a hardcoded 2-actor pool, while min=1 avoids reserving
CPUs that would deadlock against downstream shuffle tasks on small
clusters (see state/shard_pool.py docstring for the observed deadlock).
"""

from __future__ import annotations

import os

import ray


def elastic_pool(cap: int | None = None) -> tuple[int, int]:
    """(1, cap) with cap defaulting to the cluster CPU count."""
    if cap is None:
        if ray.is_initialized():
            cap = int(ray.cluster_resources().get("CPU", 0)) or None
        if cap is None:
            cap = os.cpu_count() or 4
    return (1, max(2, cap))
