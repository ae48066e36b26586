"""HITS (hubs & authorities) over a directed edge Dataset.

Fixed-iteration, L1-normalized power iteration:

    a_k = normalize(A^T h_{k-1})        h_k = normalize(A a_k)

Each half-step is one shuffle-free map_batches pass over the edge table
emitting sparse per-vertex partials against a broadcast score vector
(same O(V)-driver-state contract as the other broadcast engines). The
iteration count is fixed so the truncated computation is exactly
reproducible by the unrolled SQL oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _pass(
    edges: ray.data.Dataset,
    x: np.ndarray,
    n: int,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
    reverse: bool,
) -> np.ndarray:
    """out[v] = sum over edges into/out of v of w * x[other end].
    reverse=False: out[dst] += w * x[src] (A^T x, authority update);
    reverse=True:  out[src] += w * x[dst] (A x, hub update)."""
    x_ref = ray.put(x)

    def contrib(batch: pa.Table) -> pa.Table:
        xs = ray.get(x_ref)
        s = batch.column(src_col).to_numpy(zero_copy_only=False)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False)
        if len(s):
            s_min, s_max = s.min(), s.max()
            d_min, d_max = d.min(), d.max()
            if s_max >= n or d_max >= n or s_min < 0 or d_min < 0:
                # bincount(minlength=n) silently GROWS past n on an
                # oversized endpoint and then np.add.at on the size-n
                # driver array dies with an opaque IndexError (ADVICE r3)
                # — fail loud instead
                raise ValueError(
                    f"hits: edge endpoint out of range [0, {n}) "
                    f"(src range [{s_min}, {s_max}], "
                    f"dst range [{d_min}, {d_max}])"
                )
        w = (
            batch.column(weight_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            if weight_col
            else np.ones(s.shape[0])
        )
        if reverse:
            acc = np.bincount(s, weights=w * xs[d], minlength=n)
        else:
            acc = np.bincount(d, weights=w * xs[s], minlength=n)
        nz = np.flatnonzero(acc)
        return pa.table({"vid": nz.astype(np.int64), "p": acc[nz]})

    out = np.zeros(n, dtype=np.float64)
    for b in edges.map_batches(contrib, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        np.add.at(
            out,
            t.column("vid").to_numpy(zero_copy_only=False),
            t.column("p").to_numpy(zero_copy_only=False),
        )
    return out


def hits(
    edges: ray.data.Dataset,
    n: int,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Returns (hubs float64[n], authorities float64[n], metrics)."""
    edges = edges.materialize()  # consumed 2x per iteration
    h = np.ones(n, dtype=np.float64)
    a = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        a = _pass(edges, h, n, src_col, dst_col, weight_col, reverse=False)
        s = a.sum()
        if s > 0:
            a = a / s
        h = _pass(edges, a, n, src_col, dst_col, weight_col, reverse=True)
        s = h.sum()
        if s > 0:
            h = h / s
    return h, a, {"iterations": iters}
