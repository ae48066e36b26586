"""k-truss bounded peel: golden fixtures, Jacobi round semantics,
driver-vs-task-fanout parity, block invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.ktruss import _support, ktruss_bounded


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


def _k4_minus_edge():
    return [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]


def test_k4_is_a_4_truss(ray_session):
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    alive, m = ktruss_bounded(_edges(k4), n=4, k=4, rounds=8)
    assert alive.num_rows == 6
    assert m["pairs_out"] == 6


def test_k4_minus_edge_dissolves(ray_session):
    # support: (0,1)=2, all others 1 -> round 1 keeps only (0,1),
    # round 2 removes it (support 0)
    alive, m = ktruss_bounded(_edges(_k4_minus_edge()), n=4, k=4, rounds=8)
    assert alive.num_rows == 0
    assert m["rounds_run"] >= 2


def test_bounded_rounds_jacobi_semantics(ray_session):
    # with rounds=1 only the simultaneous first peel applies
    alive, _ = ktruss_bounded(_edges(_k4_minus_edge()), n=4, k=4, rounds=1)
    got = sorted(zip(alive.column("a").to_pylist(), alive.column("b").to_pylist()))
    assert got == [(0, 1)]


def test_3_truss_keeps_triangle_edges_only(ray_session):
    # a triangle with a pendant edge and an isolated edge
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (4, 5)]
    alive, _ = ktruss_bounded(_edges(pairs), n=6, k=3, rounds=8)
    got = sorted(zip(alive.column("a").to_pylist(), alive.column("b").to_pylist()))
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_support_task_fanout_parity(ray_session):
    rng = np.random.default_rng(13)
    raw = {(int(min(x, y)), int(max(x, y))) for x, y in rng.integers(0, 60, (400, 2)) if x != y}
    pairs = sorted(raw)
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    inline = _support(a, b, 60, tasks=0)
    fanned = _support(a, b, 60, tasks=5)
    assert (inline == fanned).all()
    # cross-check against a brute-force common-neighbor count
    adj = {v: set() for v in range(60)}
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    brute = np.array([len(adj[x] & adj[y]) for x, y in pairs], np.int64)
    assert (inline == brute).all()


def test_block_invariance(ray_session):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
    ref = None
    for parts in (1, 3, 7):
        alive, _ = ktruss_bounded(_edges(pairs, parts), n=6, k=3, rounds=8)
        got = sorted(
            zip(alive.column("a").to_pylist(), alive.column("b").to_pylist())
        )
        if ref is None:
            ref = got
        else:
            assert got == ref
