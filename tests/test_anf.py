"""HyperANF registers: seed-hash scalar parity, <=R-hop ball semantics
vs brute-force reachability, task-fanout parity."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.anf import (
    ANF_M,
    anf_register_table,
    anf_registers,
    seed_registers,
)
from parallel_louvain_method_ray.ops.bloom import _salt


def _scalar_seed(vid: int, seed: int) -> tuple[int, int]:
    x = (vid + int(_salt(seed))) & 0xFFFFFFFFFFFFFFFF
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    bucket = x >> 59
    suffix = x & ((1 << 59) - 1)
    rho = 60 - suffix.bit_length()
    return bucket, rho


def _edges(pairs, parts=2):
    a, b = zip(*pairs) if pairs else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(list(a), pa.int64()),
                "dst": pa.array(list(b), pa.int64()),
            }
        )
    ).repartition(parts)


def test_seed_registers_scalar_parity():
    regs = seed_registers(50, seed=3)
    for v in range(50):
        bucket, rho = _scalar_seed(v, 3)
        assert regs[v, bucket] == rho
        assert (regs[v] != 0).sum() == 1


def _brute(pairs, n, rounds, seed):
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    regs = seed_registers(n, seed)
    ref = np.zeros_like(regs)
    for v in range(n):
        ball = {v}
        frontier = {v}
        for _ in range(rounds):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
        ref[v] = np.max(regs[sorted(ball)], axis=0)
    return ref


def test_registers_are_r_hop_ball_sketches(ray_session):
    rng = np.random.default_rng(31)
    n = 40
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, (70, 2))
            if a != b
        }
    )
    for rounds in (0, 1, 2, 3):
        regs, _ = anf_registers(_edges(pairs), n, rounds=rounds, seed=1)
        assert (regs == _brute(pairs, n, rounds, 1)).all()


def test_task_fanout_parity(ray_session):
    rng = np.random.default_rng(41)
    n = 30
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, (60, 2))
            if a != b
        }
    )
    inline, _ = anf_registers(_edges(pairs), n, rounds=2, seed=2, tasks=0)
    fanned, _ = anf_registers(_edges(pairs), n, rounds=2, seed=2, tasks=4)
    assert (inline == fanned).all()


def test_register_table_shape(ray_session):
    regs, _ = anf_registers(_edges([(0, 1)]), 3, rounds=1)
    t = anf_register_table(regs)
    assert t.column_names == ["vid", "bucket", "rho"]
    # isolated vertex 2 keeps exactly its own register
    rows = {
        (v, bk): r
        for v, bk, r in zip(*[t.column(i).to_pylist() for i in range(3)])
    }
    assert sum(1 for (v, _) in rows if v == 2) == 1
    assert regs.shape == (3, ANF_M)
