"""HyperANF — approximate neighborhood function (Boldi-Rosa-Vigna 2011):
every vertex carries a HyperLogLog register set; R synchronous max-merge
rounds over the edges leave each vertex with the sketch of its <=R-hop
ball, from which per-vertex neighborhood sizes / effective-diameter
curves follow at O(V x m) memory instead of O(V^2) reachability.

Hash-exactness discipline: the per-vertex seed hash is the engine's
counter-based splitmix64 (`sources/kronecker.py:mix64`, salted like the
Bloom/CMS family), bucket/rho use the HLL bit layout (`ops/sketch.py`),
and register MERGE is max — associative, commutative, idempotent — so
after exactly R Jacobi rounds every register is an integer a SQL oracle
reproduces verbatim from the <=R-hop reachability closure. The estimate
step (harmonic mean of the registers) is the piece already proven
SQL-replicable by `hll_distinct_tokens`; the ANF query ships the
registers themselves so the correctness gate stays integer-only.

Tiers: the register matrix is O(V x m) int8 — broadcast-tier state
(`ray.put` once per round; per-edge-chunk tasks return partial max
matrices, the driver folds max over O(tasks) of them). The joined tier
is a max-plus SpMV wave on `state/spmv_pool.py`, the same shape LPA and
min-label CC already run there.

No counterpart in /root/reference; SURVEY §2.5/2.6 sketch + link-graph
extension family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.algos.kcore import undirected_dedup
from parallel_louvain_method_ray.ops.bloom import _salt
from parallel_louvain_method_ray.sources.kronecker import mix64

ANF_B = 5
ANF_M = 1 << ANF_B
_SUFFIX_BITS = 64 - ANF_B
_SUFFIX_MASK = np.uint64((1 << _SUFFIX_BITS) - 1)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (float log2 is off-by-one near
    2^53+; mirror of ops/sketch's ladder semantics)."""
    out = np.zeros(x.shape[0], np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        v[big] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


def seed_registers(n: int, seed: int = 1) -> np.ndarray:
    """(n, ANF_M) int8: each vertex's own-hash register set."""
    vids = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = mix64(vids + _salt(seed))
    bucket = (h >> np.uint64(_SUFFIX_BITS)).astype(np.int64)
    suffix = h & _SUFFIX_MASK
    rho = (_SUFFIX_BITS + 1) - _bit_length_u64(suffix)
    regs = np.zeros((n, ANF_M), np.int8)
    regs[np.arange(n), bucket] = rho.astype(np.int8)
    return regs


def anf_registers(
    edges: ray.data.Dataset,
    n: int,
    rounds: int = 2,
    seed: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
    tasks: int = 0,
) -> tuple[np.ndarray, dict]:
    """Register matrix (n, ANF_M) int8 after exactly `rounds` synchronous
    max-merge sweeps over the undirected edge set, + metrics. `tasks` > 0
    fans each round's merge out as that many edge-chunk Ray tasks."""
    und = undirected_dedup(edges, src_col, dst_col).materialize()
    ats, bts = [], []
    for batch in und.iter_batches(batch_format="pyarrow"):
        t = pa.table(batch)
        ats.append(t.column("a").to_numpy(zero_copy_only=False))
        bts.append(t.column("b").to_numpy(zero_copy_only=False))
    a = np.concatenate(ats) if ats else np.empty(0, np.int64)
    b = np.concatenate(bts) if bts else np.empty(0, np.int64)
    s = np.concatenate([a, b])
    d = np.concatenate([b, a])
    regs = seed_registers(n, seed)

    def merge(regs_, lo, hi):
        out = regs_.copy()
        np.maximum.at(out, d[lo:hi], regs_[s[lo:hi]])
        return out

    for _ in range(rounds):
        if s.shape[0] == 0:
            break
        if tasks <= 1:
            regs = merge(regs, 0, s.shape[0])
        else:
            regs_ref = ray.put(regs)
            cuts = np.linspace(0, s.shape[0], tasks + 1).astype(np.int64)

            @ray.remote(num_cpus=1)
            def part(lo, hi, rr, ss, dd):
                out = rr.copy()
                np.maximum.at(out, dd[lo:hi], rr[ss[lo:hi]])
                return out

            s_ref, d_ref = ray.put(s), ray.put(d)
            parts = ray.get(
                [
                    part.remote(int(lo), int(hi), regs_ref, s_ref, d_ref)
                    for lo, hi in zip(cuts, cuts[1:])
                    if hi > lo
                ]
            )
            regs = np.maximum.reduce(parts)
    return regs, {"pairs": int(a.shape[0]), "rounds_run": rounds}


def anf_register_table(regs: np.ndarray) -> pa.Table:
    """Non-zero registers as (vid, bucket, rho) rows."""
    v, bk = np.nonzero(regs)
    return pa.table(
        {
            "vid": v.astype(np.int64),
            "bucket": bk.astype(np.int64),
            "rho": regs[v, bk].astype(np.int64),
        }
    )
