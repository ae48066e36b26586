"""Modularity of a GIVEN partition — the "are these labels communities?"
diagnostic (Newman 2004). Louvain (`algos/louvain.py`) SEARCHES for a
high-Q partition; this scores a partition the caller already has (domain
assignment, crawl shard, an external classifier) without running any
search. The canonical web use: score the URL-domain partition of the
link graph to ask how community-like domains are before trusting
domain-level contraction.

Hash-exactness discipline (same as `algos/assortativity.py`): every
accumulator is an INTEGER — total directed-link weight m, intra-community
weight iw, per-community endpoint-weight sums D_c and their square sum
ssq = sum D_c^2 — and

    Q = iw/m - ssq/(4*m*m)

is evaluated as the identical double expression in numpy and DuckDB
(two exact-integer-to-double divisions and one subtraction), then
half-away-rounded at 9 dp. Every product stays under 2^53 at gate
scales, so the compare is exact.

Derivation: with each directed multigraph link (weight w) read as one
undirected edge, 2m = 2*sum(w), in_c = 2*iw_c, D_c = sum of endpoint
weights in c, so  Q = sum_c [in_c/2m - (D_c/2m)^2] = iw/m - ssq/4m^2.

Shape: ONE streaming pass emits per-block pre-combined rows — one row
per (community seen in the block) carrying its endpoint-weight partial,
plus one scalar row per block carrying (iw, m) partials. Below
`max_driver_communities` the driver np.add.at-merges them (O(C) driver
state, the broadcast-tier contract); above it the partials go through a
groupby(comm).sum shuffle and only O(blocks) square-sum partials reach
the driver — no O(C) driver state on the scale path.

Reference parity: /root/reference computes Q only for partitions its own
Louvain produced (`community.cpp:49-60`); scoring an EXTERNAL partition
is the same formula with `assign` supplied by the caller.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_SCALAR_SENTINEL = np.int64(np.iinfo(np.int64).min)


def round9_sql(x: float) -> float:
    """Half-away-from-zero at 9 dp — DuckDB round() semantics (np.round
    is half-even; see textops.analysis.round6_sql for the 6-dp twin)."""
    return float(np.sign(x) * np.floor(np.abs(x) * 1e9 + 0.5) / 1e9)


def partition_modularity(
    edges: ray.data.Dataset,
    src_comm_col: str,
    dst_comm_col: str,
    weight_col: str | None = None,
    max_driver_communities: int = 4_000_000,
) -> pa.Table:
    """One summary row over a directed edge table whose rows already
    carry integer community ids for both endpoints:

      (q, intra_w, total_w, n_communities, endpoint_sumsq)

    `weight_col=None` treats every row as weight 1. Weights must be
    integers (the exact-hash contract); non-integer weights belong to
    the float modularity in `algos/louvain.py`.
    """

    def partial(batch: pa.Table) -> pa.Table:
        cs = batch.column(src_comm_col).to_numpy(zero_copy_only=False)
        cd = batch.column(dst_comm_col).to_numpy(zero_copy_only=False)
        if weight_col is None:
            w = np.ones(len(cs), np.int64)
        else:
            w = batch.column(weight_col).to_numpy(zero_copy_only=False)
            w = w.astype(np.int64, copy=False)
        m_p = int(w.sum())
        iw_p = int(w[cs == cd].sum()) if len(cs) else 0
        # endpoint-weight partials per community seen in this block
        both = np.concatenate([cs, cd])
        uc, inv = np.unique(both, return_inverse=True)
        dsum = np.zeros(uc.shape[0], np.int64)
        np.add.at(dsum, inv, np.concatenate([w, w]))
        comm = np.concatenate([uc.astype(np.int64), [_SCALAR_SENTINEL]])
        dsum = np.concatenate([dsum, [np.int64(0)]])
        iw = np.zeros(comm.shape[0], np.int64)
        m = np.zeros(comm.shape[0], np.int64)
        iw[-1] = iw_p
        m[-1] = m_p
        return pa.table({"comm": comm, "dsum": dsum, "iw": iw, "m": m})

    # materialize the PRE-COMBINED partials once (blocks x (C_block + 1)
    # rows — far smaller than the edge table, and it is the shuffle input
    # on the scale path anyway), then pick the combine tier by its size
    parts = edges.map_batches(partial, batch_format="pyarrow").materialize()

    if parts.count() <= max_driver_communities:
        tabs = [pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")]
        tab = (
            pa.concat_tables(tabs)
            if tabs
            else pa.table(
                {
                    "comm": pa.array([], pa.int64()),
                    "dsum": pa.array([], pa.int64()),
                    "iw": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                }
            )
        )
        comm = tab.column("comm").to_numpy(zero_copy_only=False)
        scal = comm == _SCALAR_SENTINEL
        iw = int(tab.column("iw").to_numpy(zero_copy_only=False)[scal].sum())
        m = int(tab.column("m").to_numpy(zero_copy_only=False)[scal].sum())
        crow = comm[~scal]
        drow = tab.column("dsum").to_numpy(zero_copy_only=False)[~scal]
        uc, inv = np.unique(crow, return_inverse=True)
        dc = np.zeros(uc.shape[0], np.int64)
        np.add.at(dc, inv, drow)
        n_comms = int(uc.shape[0])
        # int64 bound: ssq <= (2m)^2 — exact below m ~ 2^31 total weight;
        # beyond that the q division no longer needs exact ints anyway,
        # but the hash contract documents the 2^63 accumulator bound
        ssq = int((dc * dc).sum()) if n_comms else 0
    else:  # scale path: shuffle the pre-combined partials, square in blocks

        def split_scalar(b: pa.Table, want_scalar: bool) -> pa.Table:
            c = b.column("comm").to_numpy(zero_copy_only=False)
            mask = (c == _SCALAR_SENTINEL) == want_scalar
            return b.filter(pa.array(mask))

        sc_tabs = [
            pa.table(b)
            for b in parts.map_batches(
                lambda b: split_scalar(b, True), batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
        sc = pa.concat_tables(sc_tabs)
        iw = int(sc.column("iw").to_numpy(zero_copy_only=False).sum())
        m = int(sc.column("m").to_numpy(zero_copy_only=False).sum())

        summed = (
            parts.map_batches(
                lambda b: split_scalar(b, False), batch_format="pyarrow"
            )
            .groupby("comm")
            .sum("dsum")
        )

        def sq(b: pa.Table) -> pa.Table:
            d = b.column("sum(dsum)").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "ssq": pa.array([int((d * d).sum())], pa.int64()),
                    "n": pa.array([len(d)], pa.int64()),
                }
            )

        sq_tab = pa.concat_tables(
            [
                pa.table(b)
                for b in summed.map_batches(
                    sq, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        ssq = int(sq_tab.column("ssq").to_numpy(zero_copy_only=False).sum())
        n_comms = int(sq_tab.column("n").to_numpy(zero_copy_only=False).sum())

    if m == 0:
        q = 0.0
    else:
        q = round9_sql(iw / m - ssq / (4.0 * m * m))
    return pa.table(
        {
            "q": pa.array([q], pa.float64()),
            "intra_w": pa.array([iw], pa.int64()),
            "total_w": pa.array([m], pa.int64()),
            "n_communities": pa.array([n_comms], pa.int64()),
            "endpoint_sumsq": pa.array([ssq], pa.int64()),
        }
    )
