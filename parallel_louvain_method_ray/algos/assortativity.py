"""Degree assortativity — the mixing diagnostic (Newman 2002) a link-spam
/ crawl-quality pipeline computes next to the degree histogram: the
Pearson correlation of endpoint degrees over directed edge stubs.

Hash-exactness discipline: every accumulator is an INTEGER (edge-stub
count M, Σx, Σx², Σxy over stub degree pairs; the symmetric marginals
make Σy ≡ Σx), and the coefficient is ONE exactly-rounded division
  r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)
so numpy and DuckDB produce the identical double (then the shared
half-away round at 6 dp, `textops.analysis.round6_sql`).

Shape: one streaming pass builds the O(V) degree vector from per-block
bincount partials (broadcast tier — same `max_broadcast_vertices`
contract as the pool engines; the joined tier would replace the lookup
with two hash joins against a degree table, exactly like
`algos/linkpred.py`), a second pass emits ONE partial-sums row per
block, and the driver adds O(blocks) rows of 4 integers.

Reference parity: /root/reference has no assortativity; its degree
machinery is the CSR fold (`src/graph.cpp:51-63`). This extends the
SURVEY §2.6 link-graph analytics the same way triangles/k-core do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def degree_vector(edges: ray.data.Dataset) -> np.ndarray:
    """Unweighted degree per vertex id from an undirected edge table
    (src < dst, no self-loops): per-block bincount partials -> driver
    sum. O(V) driver state (broadcast tier)."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        both = np.concatenate([s, d])
        if both.shape[0] == 0:
            return pa.table(
                {"v": np.empty(0, np.int64), "d": np.empty(0, np.int64)}
            )
        c = np.bincount(both)
        nz = np.flatnonzero(c)
        return pa.table({"v": nz.astype(np.int64), "d": c[nz].astype(np.int64)})

    rows = pa.concat_tables(
        [
            pa.table(b)
            for b in edges.map_batches(
                partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    if rows.num_rows == 0:
        return np.zeros(0, np.int64)
    v = rows.column("v").to_numpy(zero_copy_only=False)
    d = rows.column("d").to_numpy(zero_copy_only=False)
    deg = np.zeros(int(v.max()) + 1, np.int64)
    np.add.at(deg, v, d)
    return deg


def assortativity_stats(edges: ray.data.Dataset) -> pa.Table:
    """One row: (m, sx, sx2, sxy, assortativity) over directed edge
    stubs of an undirected (src < dst) edge table."""
    from parallel_louvain_method_ray.textops.analysis import round6_sql

    deg = degree_vector(edges)
    deg_ref = ray.put(deg)

    def sums(batch: pa.Table) -> pa.Table:
        dv = ray.get(deg_ref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        x = dv[s]
        y = dv[d]
        # each undirected edge contributes both (x,y) and (y,x) stubs
        return pa.table(
            {
                "m": pa.array([2 * s.shape[0]], pa.int64()),
                "sx": pa.array([int(x.sum() + y.sum())], pa.int64()),
                "sx2": pa.array(
                    [int((x * x).sum() + (y * y).sum())], pa.int64()
                ),
                "sxy": pa.array([2 * int((x * y).sum())], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        [
            pa.table(b)
            for b in edges.map_batches(
                sums, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    m = int(pa.compute.sum(parts.column("m")).as_py() or 0)
    sx = int(pa.compute.sum(parts.column("sx")).as_py() or 0)
    sx2 = int(pa.compute.sum(parts.column("sx2")).as_py() or 0)
    sxy = int(pa.compute.sum(parts.column("sxy")).as_py() or 0)
    den = m * sx2 - sx * sx
    # float() each exact-integer side FIRST (== the oracle's CAST(...
    # AS DOUBLE)) — above 2^53 Python's exact int/int division would
    # round differently than DuckDB's double/double
    r = (
        float(round6_sql(np.array([float(m * sxy - sx * sx) / float(den)]))[0])
        if den
        else 0.0
    )
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sx2": pa.array([sx2], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )
