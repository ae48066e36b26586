"""Graph500 surface: Kronecker/R-MAT generator + top-down BFS parents
(the reference's dead `main_distributed_bfs.cpp:77-89` API, rebuilt on
Ray Data; SQL-oracle parity runs in driver_sim/test_queries_oracle)."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.bfs import bfs_parents
from parallel_louvain_method_ray.config import EngineConfig
from parallel_louvain_method_ray.graph.build import build_graph
from parallel_louvain_method_ray.sources.kronecker import kronecker_edges


def _collect(ds):
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).to_pandas()


def test_kronecker_shape_determinism_and_skew():
    a = _collect(kronecker_edges(scale=9, edgefactor=8, seed=7))
    b = _collect(kronecker_edges(scale=9, edgefactor=8, seed=7))
    assert len(a) == 8 * 512  # edgefactor * 2^scale rows, duplicates kept
    assert a.src.between(0, 511).all() and a.dst.between(0, 511).all()
    # deterministic across runs and partitionings
    assert a.sort_values(["src", "dst"], ignore_index=True).equals(
        b.sort_values(["src", "dst"], ignore_index=True)
    )
    # different seed -> different graph
    c = _collect(kronecker_edges(scale=9, edgefactor=8, seed=8))
    assert not a.sort_values(["src", "dst"], ignore_index=True).equals(
        c.sort_values(["src", "dst"], ignore_index=True)
    )
    # R-MAT skew: the A-quadrant bias concentrates degree on low vids
    counts = a.src.value_counts()
    assert counts.iloc[0] > 20 * len(a) / 512


def _numpy_bfs(src, dst, n, root):
    adj = [[] for _ in range(n)]
    for u, v in zip(src, dst):
        if u != v:
            adj[u].append(v)
            adj[v].append(u)
    dist = np.full(n, n, dtype=np.int64)
    dist[root] = 0
    frontier = [root]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if dist[v] == n:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_parents_graph500_validation():
    ds = kronecker_edges(scale=8, edgefactor=8, seed=3)
    df = _collect(ds)
    n = 256
    graph = build_graph(ds, EngineConfig(num_partitions=4), n_vertices=n)
    parent, dist, _ = bfs_parents(graph, root=0)

    gold = _numpy_bfs(df.src.to_numpy(), df.dst.to_numpy(), n, 0)
    np.testing.assert_array_equal(dist, gold)

    # Graph500 validation: parent edges exist and drop dist by exactly 1
    adj = set()
    for u, v in zip(df.src.tolist(), df.dst.tolist()):
        adj.add((u, v))
        adj.add((v, u))
    assert parent[0] == 0
    for v in range(1, n):
        if dist[v] < n:
            p = parent[v]
            assert p >= 0 and (p, v) in adj, (v, p)
            assert dist[p] == dist[v] - 1, (v, p)
            # deterministic tie-break: p is the SMALLEST valid parent
            better = [
                u
                for (u, w) in adj
                if w == v and u < p and dist[u] == dist[v] - 1
            ]
            assert not better, (v, p, better)
        else:
            assert parent[v] == -1


def test_fixed_kron_graph_eccentricity_below_oracle_bound():
    """The graph500_bfs_parents SQL oracle truncates its walk at depth
    16 — valid only while the fixed query graph's eccentricity from root
    0 stays below that."""
    from parallel_louvain_method_ray.pipelines.queries import _KRON

    n = 1 << _KRON["scale"]
    graph = build_graph(
        kronecker_edges(**_KRON), EngineConfig(num_partitions=4), n_vertices=n
    )
    _, dist, _ = bfs_parents(graph, root=0)
    reached = dist[dist < n]
    assert reached.max() < 16, int(reached.max())
