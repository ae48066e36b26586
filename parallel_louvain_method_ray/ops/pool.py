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
    """(min, cap) with cap defaulting to the cluster CPU count.

    min is 2 (cheap pre-warm; the r1 pools were hard-capped AT 2 and
    starved 32-CPU runs) but never more than half the cluster — a large
    minimum reservation deadlocks small clusters against shuffle tasks."""
    if cap is None:
        if ray.is_initialized():
            cap = int(ray.cluster_resources().get("CPU", 0)) or None
        if cap is None:
            cap = os.cpu_count() or 4
    cap = max(2, cap)
    return (min(2, max(1, cap // 2)), cap)


_STAGE_CACHE: dict = {}


def cached_stage(cls):
    """map_batches callable holding a PER-WORKER-PROCESS cached instance
    of `cls` (setup still runs once per worker, as with an actor pool).

    For tiny-state stages (compiled regexes, a 1 KB permutation table)
    the task pool reuses already-warm Ray worker processes, while an
    actor pool pays ~2 s of fresh actor spawn per stage — measured to
    dominate the whole stage at bench scale. Heavy-state stages (the
    HTML extractor) keep real actor pools."""

    def fn(batch):
        inst = _STAGE_CACHE.get(cls)
        if inst is None:
            inst = _STAGE_CACHE[cls] = cls()
        return inst(batch)

    fn.__name__ = f"cached_{cls.__name__}"
    return fn
