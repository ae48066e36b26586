"""Ordered per-key running totals: scan order, integer contract, block
invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from parallel_louvain_method_ray.ops.analytics import running_total


def _ds(rows, parts=3):
    k, o, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(k), pa.int64()),
                "o": pa.array(list(o), pa.int64()),
                "v": pa.array(list(v), pa.int64()),
            }
        )
    ).repartition(parts)


def test_cumsum_in_order_per_key(ray_session):
    rows = [(1, 3, 30), (1, 1, 10), (1, 2, 20), (2, 1, 5), (2, 2, -7)]
    out = (
        running_total(_ds(rows), "k", ["o"], "v")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert out["running_total"].tolist() == [10, 30, 60, 5, -2]
    # input columns survive
    assert out["v"].tolist() == [10, 20, 30, 5, -7]


def test_block_invariance(ray_session):
    rng = np.random.default_rng(9)
    rows = [
        (int(k), int(o), int(v))
        for k, o, v in zip(
            rng.integers(0, 5, 300),
            rng.permutation(300),
            rng.integers(-50, 50, 300),
        )
    ]
    expected = None
    for parts in (1, 4, 13):
        out = (
            running_total(_ds(rows, parts), "k", ["o"], "v")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        if expected is None:
            expected = out
        else:
            assert out.equals(expected)


def test_sort_vs_groups_mode_parity(ray_session):
    rng = np.random.default_rng(17)
    rows = [
        (int(k), int(o), int(v))
        for k, o, v in zip(
            rng.integers(0, 8, 500),
            rng.permutation(500),
            rng.integers(-9, 9, 500),
        )
    ]
    a = (
        running_total(_ds(rows, 9), "k", ["o"], "v", mode="sort")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    b = (
        running_total(_ds(rows, 9), "k", ["o"], "v", mode="groups")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert a[["k", "o", "v", "running_total"]].equals(
        b[["k", "o", "v", "running_total"]]
    )


def test_single_key_spanning_many_blocks(ray_session):
    # one key across every block exercises the carry chain, including
    # whole-block single-run extension
    rows = [(1, i, 1) for i in range(1000)]
    out = (
        running_total(_ds(rows, 16), "k", ["o"], "v", mode="sort")
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert out["running_total"].tolist() == list(range(1, 1001))


def test_rejects_float_values(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "o": pa.array([1], pa.int64()),
                "v": pa.array([1.5], pa.float64()),
            }
        )
    )
    with pytest.raises(Exception, match="integer value column"):
        running_total(ds, "k", ["o"], "v").materialize()
