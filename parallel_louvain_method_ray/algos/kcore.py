"""Bounded k-core peeling over an edge Dataset.

Synchronous (Jacobi) peel: round r keeps exactly the vertices with >= k
neighbors alive in round r-1's vertex set — the same per-round semantics
the SQL oracle unrolls, so an exact `rounds` bound gives identical results
on BOTH sides even when peeling has not converged yet (removal is
monotone, so extra rounds past the fixpoint are no-ops).

Execution shape: the undirected distinct edge set is built once with a
groupby dedupe (one shuffle) and materialized; each round is one
shuffle-free map_batches pass emitting per-vertex alive-degree partials
against a broadcast alive bitmap (O(V) driver state — the same contract
as the other broadcast engines; above `max_broadcast_vertices` run the
peel on the join path with alive as a Dataset)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def undirected_dedup(
    edges: ray.data.Dataset, src_col: str = "src", dst_col: str = "dst"
) -> ray.data.Dataset:
    """(src, dst) multiset -> distinct undirected pairs (a < b), self-loops
    dropped. One groupby shuffle."""

    def norm(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d).astype(np.int64)),
                "b": pa.array(np.maximum(s, d).astype(np.int64)),
            }
        )

    return (
        edges.map_batches(norm, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )


def kcore_bounded(
    edges: ray.data.Dataset,
    n: int,
    k: int,
    rounds: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> tuple[np.ndarray, dict]:
    """Returns (alive bool[n] after exactly `rounds` synchronous peels —
    or the earlier fixpoint, which is identical — and metrics)."""
    und = undirected_dedup(edges, src_col, dst_col).materialize()
    alive = np.zeros(n, dtype=bool)
    # round 0: every vertex incident to an edge
    for batch in und.iter_batches(batch_format="pyarrow"):
        t = pa.table(batch)
        alive[t.column("a").to_numpy(zero_copy_only=False)] = True
        alive[t.column("b").to_numpy(zero_copy_only=False)] = True

    done = 0
    for r in range(rounds):
        alive_ref = ray.put(alive)

        def degs(batch: pa.Table) -> pa.Table:
            al = ray.get(alive_ref)
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            live = al[a] & al[b]
            a, b = a[live], b[live]
            acc = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
            nz = np.flatnonzero(acc)
            return pa.table(
                {"vid": nz.astype(np.int64), "d": acc[nz].astype(np.int64)}
            )

        deg = np.zeros(n, dtype=np.int64)
        for batch in und.map_batches(degs, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            t = pa.table(batch)
            np.add.at(
                deg,
                t.column("vid").to_numpy(zero_copy_only=False),
                t.column("d").to_numpy(zero_copy_only=False),
            )
        new_alive = alive & (deg >= k)
        done = r + 1
        if np.array_equal(new_alive, alive):
            break
        alive = new_alive
    return alive, {"rounds": done}
