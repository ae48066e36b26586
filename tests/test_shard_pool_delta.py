"""Delta-broadcast sweep rounds must be move-for-move identical to
full-broadcast rounds: the delta path replaces the O(V) assignment put +
per-worker bincounts with an O(moves) in-place update, and on integer
edge weights the incremental tot/csize updates are float-exact, so the
two protocols must produce the same sweep trajectory bit for bit."""

import numpy as np

from parallel_louvain_method_ray.config import EngineConfig
from parallel_louvain_method_ray.graph.build import graph_from_entry_arrays
from parallel_louvain_method_ray.state.shard_pool import ShardPool
from tests.fixtures import planted_partition_graph


def _trajectory(graph, use_delta: bool, n_sweeps: int = 6):
    pool = ShardPool(graph, num_workers=2)
    try:
        assign = np.arange(graph.n, dtype=np.int64)
        m2 = 2.0 * graph.m
        traj = []
        pending = None
        for _ in range(n_sweeps):
            cv, cc, moves, _ = pool.sweep(
                assign, None, None, m2, "canonical",
                delta=pending if use_delta else None,
            )
            order = np.argsort(cv)
            traj.append((cv[order].copy(), cc[order].copy()))
            if moves:
                assign[cv] = cc
            pending = (cv, cc) if moves else None
        return traj, assign
    finally:
        pool.shutdown()


def test_delta_sweep_matches_full_broadcast():
    src, dst, w, _ = planted_partition_graph(160, 4, 6, 1, seed=5)
    g = graph_from_entry_arrays(
        np.asarray(src, np.int64), np.asarray(dst, np.int64),
        np.ones(len(src)), EngineConfig(num_partitions=4),
    )
    t_full, a_full = _trajectory(g, use_delta=False)
    t_delta, a_delta = _trajectory(g, use_delta=True)
    assert len(t_full) == len(t_delta)
    for (v1, c1), (v2, c2) in zip(t_full, t_delta):
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(a_full, a_delta)
