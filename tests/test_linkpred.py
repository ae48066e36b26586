"""Link prediction (Adamic-Adar / Jaccard): brute-force parity, the
hub-middle degree cap, and the no-driver-materialization contract
(VERDICT r3 #1: no O(E)/O(V) driver arrays, no 32-bit key packing)."""

import inspect
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from parallel_louvain_method_ray.algos import linkpred
from parallel_louvain_method_ray.algos.linkpred import adamic_adar, jaccard_links
from tests.fixtures import LOUVAIN16_EDGES


def _edges_ds(pairs):
    arr = np.asarray(pairs, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table({"src": arr[:, 0], "dst": arr[:, 1]})
    )


def _collect(ds):
    parts = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(parts) if parts else pa.table({})
    return t.to_pandas()


def _brute(pairs, cap=None):
    """Reference AA + Jaccard by dense adjacency."""
    arr = np.asarray(pairs, dtype=np.int64)
    n = int(arr.max()) + 1
    adj = [set() for _ in range(n)]
    for a, b in arr:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = [len(s) for s in adj]
    aa, jac = {}, {}
    for a in range(n):
        for b in range(a + 1, n):
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if cap is not None:
                common = {w for w in common if deg[w] <= cap}
            if not common:
                continue
            aa[(a, b)] = round(sum(1.0 / math.log(deg[w]) for w in common), 9)
            # engine union semantics: deg(a) + deg(b) - |capped common|
            # (== exact |N(a) ∪ N(b)| when uncapped)
            union = deg[a] + deg[b] - len(common)
            jac[(a, b)] = round(len(common) / union, 9)
    return aa, jac


@pytest.mark.parametrize("cap", [None, 4])
def test_adamic_adar_matches_bruteforce(cap):
    golden_aa, _ = _brute(LOUVAIN16_EDGES, cap=cap)
    out = _collect(adamic_adar(_edges_ds(LOUVAIN16_EDGES), max_middle_degree=cap))
    got = {
        (int(r.src), int(r.dst)): round(float(r.score), 9)
        for r in out.itertuples()
    }
    assert got == golden_aa


@pytest.mark.parametrize("cap", [None, 4])
def test_jaccard_matches_bruteforce(cap):
    _, golden_j = _brute(LOUVAIN16_EDGES, cap=cap)
    out = _collect(jaccard_links(_edges_ds(LOUVAIN16_EDGES), max_middle_degree=cap))
    got = {
        (int(r.src), int(r.dst)): round(float(r.jaccard), 9)
        for r in out.itertuples()
    }
    assert got == golden_j


def test_hub_cap_bounds_wedges():
    """Star hub (degree 40) + one clean wedge. Capped run must exclude
    every hub-middle pair and keep the clean wedge's score."""
    hub = 0
    leaves = list(range(1, 41))
    pairs = [(hub, v) for v in leaves]
    # clean wedge: 41-42-43 (middle 42, degree 2)
    pairs += [(41, 42), (42, 43)]
    ds = _edges_ds(pairs)
    out = _collect(adamic_adar(ds, max_middle_degree=8))
    got = {(int(r.src), int(r.dst)) for r in out.itertuples()}
    # no leaf-leaf pair survives (only common neighbor is the capped hub)
    assert all(not (a in leaves and b in leaves) for a, b in got)
    assert (41, 43) in got
    row = out[(out.src == 41) & (out.dst == 43)]
    assert abs(float(row.score.iloc[0]) - round(1.0 / math.log(2), 9)) < 1e-12
    # uncapped: all 780 leaf pairs + the clean wedge
    full = _collect(adamic_adar(ds))
    assert len(full) == len(leaves) * (len(leaves) - 1) // 2 + 1


def test_all_hubs_graph_returns_empty_capped():
    """Cap below every degree: no wedges survive; must not crash on the
    emptied spoke table (sentinel reseed path)."""
    pairs = [(0, 1), (0, 2), (1, 2)]  # triangle, all degrees 2
    out = _collect(adamic_adar(_edges_ds(pairs), max_middle_degree=1))
    assert len(out) == 0


def test_no_driver_materialization_in_source():
    """The r3 scale defect: O(E) edge-key collect + O(V) degree map on
    the driver, packed as a<<32|b. The rewrite must keep every operand a
    Dataset — no driver collection, no broadcast puts, no key packing."""
    src = inspect.getsource(linkpred)
    for banned in ("iter_batches", "to_pandas", "take_all", "ray.put", "<< "):
        assert banned not in src, f"driver-side materialization: {banned!r}"


def test_auto_cap_exact_below_threshold():
    """max_middle_degree="auto" must resolve to the EXACT plan below
    AUTO_CAP_MIN_EDGES (oracle hashes depend on it)."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    exact = _collect(adamic_adar(_edges_ds(pairs))).sort_values(
        ["src", "dst"]
    )
    auto = _collect(
        adamic_adar(_edges_ds(pairs), max_middle_degree="auto")
    ).sort_values(["src", "dst"])
    assert exact.reset_index(drop=True).equals(auto.reset_index(drop=True))


def test_derive_middle_degree_cap_hub_fixture():
    """The histogram-derived cap must (a) return None when the exact plan
    fits the wedge budget and (b) pick a cap BELOW a planted hub's degree
    when the hub dominates sum d^2."""
    from parallel_louvain_method_ray.algos.degree_stats import (
        derive_middle_degree_cap,
    )

    # tail-degree table: all degrees 4 -> sum d^2 = 16n fits any sane budget
    tail = ray.data.from_arrow(
        pa.table(
            {
                "w": np.arange(1000, dtype=np.int64),
                "d": np.full(1000, 4, dtype=np.int64),
            }
        )
    )
    assert derive_middle_degree_cap(tail, n_spokes=4000) is None

    # one 100k-degree hub over a 4-degree tail: sum d^2 = 1e10 blows the
    # 32 x n_spokes budget; the cap must land between the tail and the hub
    hub = ray.data.from_arrow(
        pa.table(
            {
                "w": np.arange(1001, dtype=np.int64),
                "d": np.concatenate(
                    [np.full(1000, 4, dtype=np.int64), [100_000]]
                ),
            }
        )
    )
    cap = derive_middle_degree_cap(hub, n_spokes=104_000)
    assert cap is not None
    assert 4 <= cap < 100_000

    # capped-run under-count bound on the star fixture: dropping the hub
    # middle removes exactly 1/ln(hub_deg) per leaf pair (the documented
    # bound); every surviving wedge is exact
    leaves = list(range(1, 9))
    star = [(0, leaf) for leaf in leaves]
    star += [(1, 2)]  # one non-hub wedge via middle 1/2
    # pendant path 2-9-10: middle 9 (deg 2) survives the cap and yields
    # the non-adjacent pair (2, 10), so the capped output is non-empty
    star += [(2, 9), (9, 10)]
    ds = _edges_ds(star)
    capped = _collect(adamic_adar(ds, max_middle_degree=4))
    full = _collect(adamic_adar(ds))
    hub_deg = len(leaves)
    merged = full.merge(
        capped, on=["src", "dst"], how="left", suffixes=("_f", "_c")
    )
    merged["score_c"] = merged["score_c"].fillna(0.0)
    under = merged["score_f"] - merged["score_c"]
    # scores are rounded to 9 decimals on both sides -> 1e-8 tolerance
    assert (under >= -1e-8).all()
    assert (under <= 1.0 / math.log(hub_deg) + 1e-8).all()
