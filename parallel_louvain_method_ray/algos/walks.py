"""Deterministic random-walk sampling over the link graph — the walk
corpus generator for DeepWalk/node2vec-style graph-embedding training
data (Perozzi et al. 2014), made fully deterministic so the walks are
reproducible at any parallelism AND SQL-oracle-checkable: at step t the
walker at vertex v moves to the neighbor u minimizing
``splitmix64(v*K1 + u*K2 + t)`` (ties, which need a 64-bit hash
collision, break to the smaller u).

Scale shape — broadcast small side, stream the big side (no shuffle):
the frontier (one current vertex per seed) is ``ray.put`` once per step;
every edge batch computes its LOCAL best candidate per seed vectorized,
and the driver merges O(batches x seeds) partial rows. Each step is one
full edge scan; at 100 TB with many seeds you would hash-partition the
edge table once by src and home walkers with their partition (the
state/spmv_pool.py layout) — this operator keeps the broadcast tier
because walk frontiers are tiny by construction.

No counterpart in /root/reference (no sampling operators at all —
SURVEY §2.5 "Sorts / top-k / sampling").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.sources.kronecker import mix64

WALK_K1 = 1000003
WALK_K2 = 17


def _step_key(cur: np.ndarray, cand: np.ndarray, t: int) -> np.ndarray:
    """The walk-choice hash, identical to the SQL oracle's _mix_ctes chain
    over the expression cur*K1 + cand*K2 + t (values far below 2^63, so
    int64 SQL arithmetic and uint64 numpy arithmetic agree)."""
    x = (
        cur.astype(np.uint64) * np.uint64(WALK_K1)
        + cand.astype(np.uint64) * np.uint64(WALK_K2)
        + np.uint64(t)
    )
    return mix64(x)


def _best_per_seed(
    seed: np.ndarray, key: np.ndarray, cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """First (key, cand) per seed under the (key, cand) order — vectorized
    lexsort + run-head pick."""
    order = np.lexsort((cand, key, seed))
    s, k, c = seed[order], key[order], cand[order]
    heads = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    return s[heads], k[heads], c[heads]


def deterministic_walks(
    sym_edges: ray.data.Dataset,
    seeds: np.ndarray,
    steps: int = 4,
) -> pa.Table:
    """(seed, step, vid): the vertex each seed's walk occupies after step
    1..steps. A walk whose current vertex has no neighbors emits no
    further rows (dead end). ``sym_edges`` must hold BOTH directions of
    every undirected edge (graph.build.symmetrize output)."""
    seeds = np.asarray(seeds, np.int64)
    active_seed = seeds.copy()
    cur = seeds.copy()
    out_seed: list[np.ndarray] = []
    out_step: list[np.ndarray] = []
    out_vid: list[np.ndarray] = []

    for t in range(1, steps + 1):
        if active_seed.shape[0] == 0:
            break
        order = np.argsort(cur, kind="stable")
        fref = ray.put((cur[order], active_seed[order], t))

        def partials(batch: pa.Table) -> pa.Table:
            cs, ss, step_t = ray.get(fref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(cs, src, side="left")
            hi = np.searchsorted(cs, src, side="right")
            cnt = hi - lo
            rows = np.flatnonzero(cnt)
            empty = pa.table(
                {
                    "seed": pa.array([], pa.int64()),
                    "key": pa.array([], pa.uint64()),
                    "cand": pa.array([], pa.int64()),
                }
            )
            if rows.shape[0] == 0:
                return empty
            reps = cnt[rows]
            r_idx = np.repeat(rows, reps)
            t_off = np.arange(r_idx.shape[0]) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            w_idx = np.repeat(lo[rows], reps) + t_off
            seed_e = ss[w_idx]
            cand = dst[r_idx]
            key = _step_key(src[r_idx], cand, step_t)
            s, k, c = _best_per_seed(seed_e, key, cand)
            return pa.table({"seed": s, "key": k, "cand": c})

        parts = [
            pa.table(b)
            for b in sym_edges.map_batches(
                partials, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
        if not parts:
            break
        part = pa.concat_tables(parts)
        if part.num_rows == 0:
            break
        s, _, c = _best_per_seed(
            part.column("seed").to_numpy(zero_copy_only=False),
            part.column("key").to_numpy(zero_copy_only=False),
            part.column("cand").to_numpy(zero_copy_only=False),
        )
        out_seed.append(s)
        out_step.append(np.full(s.shape[0], t, np.int64))
        out_vid.append(c)
        active_seed, cur = s, c

    if not out_seed:
        z = np.empty(0, np.int64)
        return pa.table({"seed": z, "step": z, "vid": z})
    return pa.table(
        {
            "seed": np.concatenate(out_seed),
            "step": np.concatenate(out_step),
            "vid": np.concatenate(out_vid),
        }
    )
