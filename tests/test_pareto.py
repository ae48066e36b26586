"""Distributed 2-D Pareto frontier: domination semantics, ties on one
and both coordinates, block invariance vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.ops.analytics import pareto_frontier_2d


def _ds(rows, parts=3):
    i, x, y = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(i), pa.int64()),
                "x": pa.array(list(x), pa.int64()),
                "y": pa.array(list(y), pa.int64()),
            }
        )
    ).repartition(parts)


def _brute(rows):
    out = []
    for i1, x1, y1 in rows:
        dominated = any(
            x2 >= x1 and y2 >= y1 and (x2 > x1 or y2 > y1)
            for _, x2, y2 in rows
        )
        if not dominated:
            out.append((i1, x1, y1))
    return sorted(out)


def test_pareto_matches_brute_force_across_partitionings(ray_session):
    rng = np.random.RandomState(41)
    rows = [
        (i, int(rng.randint(50)), int(rng.randint(50))) for i in range(400)
    ]
    want = _brute(rows)
    for parts in (1, 4, 13):
        got = pareto_frontier_2d(_ds(rows, parts), "x", "y", "id")
        got_rows = sorted(
            zip(
                got.column("id").to_pylist(),
                got.column("x").to_pylist(),
                got.column("y").to_pylist(),
            )
        )
        assert got_rows == want


def test_pareto_ties_on_both_coordinates_all_survive(ray_session):
    rows = [(0, 10, 10), (1, 10, 10), (2, 5, 20), (3, 4, 4)]
    got = pareto_frontier_2d(_ds(rows, 2), "x", "y", "id")
    assert sorted(got.column("id").to_pylist()) == [0, 1, 2]


def test_pareto_dominated_by_equal_x_higher_y(ray_session):
    rows = [(0, 10, 10), (1, 10, 12), (2, 12, 1)]
    got = pareto_frontier_2d(_ds(rows, 1), "x", "y", "id")
    assert sorted(got.column("id").to_pylist()) == [1, 2]
