"""Given-partition modularity: brute-force parity, weighted edges,
driver-vs-groupby tier equality, block-count invariance, degenerate
inputs."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.partition_quality import (
    partition_modularity,
    round9_sql,
)


def _ds(rows, parts=2):
    cs, cd, w = zip(*rows) if rows else ((), (), ())
    t = pa.table(
        {
            "cs": pa.array(list(cs), pa.int64()),
            "cd": pa.array(list(cd), pa.int64()),
            "w": pa.array(list(w), pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(parts)


def _brute(rows):
    m = sum(w for _, _, w in rows)
    iw = sum(w for a, b, w in rows if a == b)
    dc = {}
    for a, b, w in rows:
        dc[a] = dc.get(a, 0) + w
        dc[b] = dc.get(b, 0) + w
    ssq = sum(d * d for d in dc.values())
    q = 0.0 if m == 0 else round9_sql(iw / m - ssq / (4.0 * m * m))
    return q, iw, m, len(dc), ssq


def _check(tab, rows):
    q, iw, m, nc, ssq = _brute(rows)
    assert tab.column("q").to_pylist() == [q]
    assert tab.column("intra_w").to_pylist() == [iw]
    assert tab.column("total_w").to_pylist() == [m]
    assert tab.column("n_communities").to_pylist() == [nc]
    assert tab.column("endpoint_sumsq").to_pylist() == [ssq]


ROWS = [
    (0, 0, 3),
    (0, 1, 1),
    (1, 1, 2),
    (1, 2, 1),
    (2, 2, 4),
    (2, 0, 2),
    (3, 3, 5),
]


def test_weighted_brute_parity():
    _check(partition_modularity(_ds(ROWS), "cs", "cd", weight_col="w"), ROWS)


def test_unweighted_default():
    rows1 = [(a, b, 1) for a, b, _ in ROWS]
    tab = partition_modularity(_ds(rows1), "cs", "cd")
    _check(tab, rows1)


def test_block_count_invariance():
    for parts in (1, 3, 7):
        _check(
            partition_modularity(
                _ds(ROWS, parts=parts), "cs", "cd", weight_col="w"
            ),
            ROWS,
        )


def test_groupby_scale_path_matches_driver_tier():
    lo = partition_modularity(
        _ds(ROWS, parts=3), "cs", "cd", weight_col="w",
        max_driver_communities=0,
    )
    hi = partition_modularity(
        _ds(ROWS, parts=3), "cs", "cd", weight_col="w",
    )
    assert lo.to_pylist() == hi.to_pylist()


def test_perfect_partition_positive_q():
    # two cliques with only intra edges -> strongly positive Q
    rows = [(0, 0, 1)] * 5 + [(1, 1, 1)] * 5
    tab = partition_modularity(_ds(rows), "cs", "cd", weight_col="w")
    assert tab.column("q").to_pylist()[0] == round9_sql(1.0 - 0.5)
    assert tab.column("intra_w").to_pylist() == [10]


def test_empty_edges():
    tab = partition_modularity(_ds([]), "cs", "cd", weight_col="w")
    assert tab.column("q").to_pylist() == [0.0]
    assert tab.column("total_w").to_pylist() == [0]
    assert tab.column("n_communities").to_pylist() == [0]


def test_round9_half_away():
    assert round9_sql(0.0000000005) == 1e-9
    assert round9_sql(-0.0000000005) == -1e-9
    assert round9_sql(0.25) == 0.25
