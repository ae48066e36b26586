"""lag_diff: per-key gaps, block-boundary carry, first-row drop, tie
invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.ops.analytics import lag_diff


def _ds(rows, parts):
    k, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(k), pa.int64()),
                "v": pa.array(list(v), pa.int64()),
            }
        )
    ).repartition(parts)


def _ref(rows):
    """Sequential reference: gaps per key over sorted values."""
    from collections import defaultdict

    byk = defaultdict(list)
    for k, v in rows:
        byk[k].append(v)
    out = set()
    gaps = []
    for k, vs in byk.items():
        vs.sort()
        for a, b in zip(vs, vs[1:]):
            gaps.append((k, b, b - a))
    return sorted(gaps)


def test_gaps_match_reference_across_partitionings(ray_session):
    rng = np.random.RandomState(11)
    rows = [
        (int(rng.randint(7)), int(rng.randint(10_000))) for _ in range(400)
    ]
    want = _ref(rows)
    for parts in (1, 3, 13):
        got = sorted(
            (r["k"], r["v"], r["gap"])
            for r in lag_diff(_ds(rows, parts), "k", "v").take_all()
        )
        assert got == want


def test_single_row_keys_dropped(ray_session):
    rows = [(1, 10), (2, 5), (2, 9)]
    got = lag_diff(_ds(rows, 2), "k", "v").take_all()
    assert len(got) == 1
    assert got[0]["k"] == 2 and got[0]["gap"] == 4


def test_duplicate_values_give_zero_gaps(ray_session):
    rows = [(1, 5), (1, 5), (1, 5)]
    got = sorted(r["gap"] for r in lag_diff(_ds(rows, 3), "k", "v").take_all())
    assert got == [0, 0]
