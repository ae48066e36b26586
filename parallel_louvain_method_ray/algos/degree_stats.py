"""Distributed degree-distribution statistics used for plan decisions.

The only driver-side state here is a fixed 64-bucket log2 histogram
(O(blocks x 64) tiny rows through iter_batches, never O(V) or O(E)) —
this module exists so scale-sensitive modules like algos/linkpred.py can
keep a strict no-driver-materialization source contract while still
deriving data-dependent plan parameters."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# auto cap targets: wedge table <= multiplier x |spokes| rows, cap never
# below min_cap (so tail-degree graphs stay exact).
AUTO_CAP_WEDGE_MULTIPLIER = 32.0
AUTO_CAP_MIN = 64


def derive_middle_degree_cap(
    deg: ray.data.Dataset,
    n_spokes: int,
    wedge_multiplier: float = AUTO_CAP_WEDGE_MULTIPLIER,
    min_cap: int = AUTO_CAP_MIN,
    degree_col: str = "d",
) -> int | None:
    """Derive a hub cap from the degree histogram: the largest power-of-two
    boundary c such that the wedge estimate sum_{d<=c} d^2 stays within
    `wedge_multiplier` x n_spokes rows. Returns None when even the exact
    plan fits the budget (no hubs worth dropping).

    Distributed: one map_batches over the (vertex, degree) table emitting a
    64-bucket log2 histogram of sum d^2 per block; the driver sums
    O(blocks x 64) tiny rows — never O(V)."""

    def hist(batch: pa.Table) -> pa.Table:
        d = (
            batch.column(degree_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        b = np.floor(np.log2(np.maximum(d, 1.0))).astype(np.int64)
        sumd2 = np.bincount(b, weights=d * d, minlength=64)[:64]
        return pa.table(
            {"bucket": np.arange(64, dtype=np.int64), "sumd2": sumd2}
        )

    acc = np.zeros(64, dtype=np.float64)
    for batch in deg.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(batch)
        acc[t.column("bucket").to_numpy(zero_copy_only=False)] += t.column(
            "sumd2"
        ).to_numpy(zero_copy_only=False)

    budget = wedge_multiplier * max(n_spokes, 1)
    if acc.sum() <= budget:
        return None
    cum = np.cumsum(acc)
    # largest power-of-two bucket boundary whose cumulative d^2 fits
    ok = np.flatnonzero(cum <= budget)
    cap = int(2 ** (ok[-1] + 1)) - 1 if ok.size else min_cap
    return max(cap, min_cap)
