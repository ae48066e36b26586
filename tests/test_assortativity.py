"""Degree assortativity: closed-form fixtures, brute-force parity,
block-count invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.assortativity import (
    assortativity_stats,
    degree_vector,
)


def _edges(pairs, parts=2):
    a, b = zip(*pairs) if pairs else ((), ())
    t = pa.table(
        {
            "src": pa.array(list(a), pa.int64()),
            "dst": pa.array(list(b), pa.int64()),
            "weight": pa.array([1.0] * len(pairs), pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(parts)


def _brute(pairs):
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = sx = sx2 = sxy = 0
    for u, v in pairs:
        for x, y in ((deg[u], deg[v]), (deg[v], deg[u])):
            m += 1
            sx += x
            sx2 += x * x
            sxy += x * y
    den = m * sx2 - sx * sx
    r = float(m * sxy - sx * sx) / float(den) if den else 0.0
    return m, sx, sx2, sxy, r


def test_star_graph_is_disassortative(ray_session):
    # star K1,5: hub deg 5 <-> leaves deg 1, r = -1
    pairs = [(0, i) for i in range(1, 6)]
    t = assortativity_stats(_edges(pairs))
    assert t.column("m")[0].as_py() == 10
    assert t.column("assortativity")[0].as_py() == -1.0


def test_regular_graph_degenerate(ray_session):
    # 4-cycle: all degrees equal -> zero variance -> r defined as 0
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]
    t = assortativity_stats(_edges(pairs))
    assert t.column("assortativity")[0].as_py() == 0.0


def test_brute_force_parity_across_blocks(ray_session):
    rng = np.random.default_rng(7)
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, 40, size=(120, 2))
            if a != b
        }
    )
    m, sx, sx2, sxy, r = _brute(pairs)
    for parts in (1, 3, 9):
        t = assortativity_stats(_edges(pairs, parts))
        assert t.column("m")[0].as_py() == m
        assert t.column("sx")[0].as_py() == sx
        assert t.column("sx2")[0].as_py() == sx2
        assert t.column("sxy")[0].as_py() == sxy
        assert abs(t.column("assortativity")[0].as_py() - r) < 1e-6


def test_degree_vector(ray_session):
    pairs = [(0, 1), (0, 2), (0, 3), (2, 3)]
    deg = degree_vector(_edges(pairs, 2))
    assert deg.tolist() == [3, 1, 2, 2]
