"""deterministic_walks vs a scalar brute-force reference."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.walks import (
    WALK_K1,
    WALK_K2,
    deterministic_walks,
)
from parallel_louvain_method_ray.sources.kronecker import mix64


def _brute(undirected: list[tuple[int, int]], seeds, steps):
    adj: dict[int, set[int]] = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for s in seeds:
        cur = s
        for t in range(1, steps + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                break
            keys = mix64(
                np.array(
                    [cur * WALK_K1 + u * WALK_K2 + t for u in nbrs], np.uint64
                )
            )
            cur = nbrs[int(np.lexsort((np.array(nbrs), keys))[0])]
            rows.append((s, t, cur))
    return sorted(rows)


def _sym_ds(undirected, blocks=3):
    src, dst = [], []
    for a, b in undirected:
        src += [a, b]
        dst += [b, a]
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array([1.0] * len(src), pa.float64()),
            }
        )
    ).repartition(blocks)


def _run(undirected, seeds, steps, blocks=3):
    t = deterministic_walks(
        _sym_ds(undirected, blocks), np.array(seeds, np.int64), steps=steps
    )
    return sorted(
        zip(
            t.column("seed").to_pylist(),
            t.column("step").to_pylist(),
            t.column("vid").to_pylist(),
        )
    )


def test_random_graph_parity_across_blocks():
    rng = np.random.default_rng(13)
    edges = list(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, 40, size=(300, 2))
            if a != b
        }
    )
    seeds = [0, 1, 2, 3, 4, 17]
    want = _brute(edges, seeds, 5)
    for blocks in (1, 4, 9):
        assert _run(edges, seeds, 5, blocks) == want
    assert len(want) == len(seeds) * 5  # no dead ends on this graph


def test_dead_end_stops_walk():
    # 7 is isolated; 5-6 is a pendant pair that ping-pongs
    edges = [(0, 1), (1, 2), (5, 6)]
    got = _run(edges, [0, 5, 7], 3, blocks=2)
    want = _brute(edges, [0, 5, 7], 3)
    assert got == want
    assert not any(s == 7 for s, _, _ in got)  # isolated seed emits nothing
    assert sum(1 for s, _, _ in got if s == 5) == 3  # pendant ping-pong


def test_two_walkers_on_same_vertex_diverge_only_by_seed():
    # seeds 0 and 1 both reach the hub 9 -> identical choices afterwards
    edges = [(0, 9), (1, 9), (9, 2), (9, 3), (2, 4), (3, 4)]
    got = _run(edges, [0, 1], 4, blocks=2)
    want = _brute(edges, [0, 1], 4)
    assert got == want
