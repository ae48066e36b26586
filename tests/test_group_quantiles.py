"""Per-group exact quantiles: picked-not-interpolated semantics, rank
arithmetic at the double-rounding edge, tiny groups."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.ops.analytics import group_quantiles


def _ds(rows, parts=3):
    k, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(k), pa.string()),
                "v": pa.array(list(v), pa.float64()),
            }
        )
    ).repartition(parts)


def test_percentile_disc_semantics(ray_session):
    rows = [("a", float(x)) for x in range(1, 11)] + [("b", 7.0)]
    out = (
        group_quantiles(_ds(rows), "k", "v", [0.25, 0.5, 0.75, 0.9])
        .to_pandas()
        .set_index(["k", "q"])["value"]
    )
    # n=10: ranks ceil(2.5)=3, ceil(5)=5, ceil(7.5)=8; 0.9*10 rounds to
    # exactly 9.0 in doubles (offset below half-ulp), so ceil gives 9
    assert out[("a", 0.25)] == 3.0
    assert out[("a", 0.5)] == 5.0
    assert out[("a", 0.75)] == 8.0
    assert out[("a", 0.9)] == 9.0
    # single-element group: every q picks that element
    for q in (0.25, 0.5, 0.75, 0.9):
        assert out[("b", q)] == 7.0


def test_values_are_members_of_the_group(ray_session):
    rng = np.random.default_rng(5)
    rows = [("g" + str(i % 4), float(x)) for i, x in enumerate(rng.normal(size=200))]
    out = group_quantiles(_ds(rows, 5), "k", "v", [0.1, 0.5, 0.99]).to_pandas()
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for _, r in out.iterrows():
        assert r["value"] in by_k[r["k"]]
    assert len(out) == 4 * 3
