"""Stateful-stage pooling.

Tiny-state map_batches stages (MinHasher, SimHasher, TextStats, LangId —
compiled regexes, a 1 KB permutation table) run as TASK pools with a
per-worker-process instance cache (`cached_stage`): the task pool reuses
already-warm Ray worker processes, while a dedicated actor pool pays ~2 s
of fresh actor spawn per stage — measured to dominate the whole stage at
bench scale. Heavy-state stages (the HTML extractor, the Louvain shard
pool) keep real actor pools with elastic `(min, cap)` concurrency sized
in their own modules (see `web/extract.py`, `state/shard_pool.py`).
"""

from __future__ import annotations

_STAGE_CACHE: dict = {}


def cached_stage(cls):
    """map_batches callable holding a PER-WORKER-PROCESS cached instance
    of `cls` (setup still runs once per worker, as with an actor pool)."""

    def fn(batch):
        inst = _STAGE_CACHE.get(cls)
        if inst is None:
            inst = _STAGE_CACHE[cls] = cls()
        return inst(batch)

    fn.__name__ = f"cached_{cls.__name__}"
    return fn
