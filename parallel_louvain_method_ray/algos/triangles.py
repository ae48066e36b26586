"""Triangle counting (per-vertex + global) with degree orientation.

Mandated extension (SURVEY §2.6). Orientation trick: each undirected edge
{u, v} is kept only as u->v where (deg(u), u) < (deg(v), v) — out-degrees
are then bounded by O(sqrt(E)), which is the skew defense for hub vertices
(a hub's CSR row is never intersected against another hub's full row).

For an oriented edge (u, v): every common out-neighbor w of u and v closes
a triangle {u, v, w}; counts are credited to all three vertices.

Execution: the oriented adjacency (indptr, cols — O(E/2) ints) is built
once and broadcast via ray.put; the counting pass is a shuffle-free
map_batches over the oriented entries with per-edge sorted-array
intersections. Scale note: broadcast of the oriented CSR assumes E fits a
worker (sandbox scale); the 100 TB path partitions oriented adjacency by
vertex and joins wedge candidates against the edge set — same orientation
bound, one extra shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from parallel_louvain_method_ray.graph.build import GraphHandle
from parallel_louvain_method_ray.graph.csr import unpack_shards


def _oriented_csr(graph: GraphHandle) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collect oriented (deg, id)-ordered adjacency from the shards.
    Returns (indptr[n+1], cols, unweighted_degrees)."""
    n = graph.n
    # unweighted degree = CSR row entry count (dedup'd, self-loops excluded)
    def deg_batch(batch: pa.Table) -> pa.Table:
        out_v, out_d = [], []
        for shard in unpack_shards(batch):
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            nonself = src != shard.cols
            d = np.bincount(
                np.searchsorted(shard.vids, src[nonself]),
                minlength=shard.vids.shape[0],
            )
            out_v.append(shard.vids)
            out_d.append(d.astype(np.int64))
        return pa.table(
            {
                "vid": np.concatenate(out_v) if out_v else np.empty(0, np.int64),
                "deg": np.concatenate(out_d) if out_d else np.empty(0, np.int64),
            }
        )

    deg = np.zeros(n, dtype=np.int64)
    for b in graph.shards.map_batches(deg_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        deg[t.column("vid").to_numpy(zero_copy_only=False)] = t.column(
            "deg"
        ).to_numpy(zero_copy_only=False)

    deg_ref = ray.put(deg)

    def orient(batch: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        out_s, out_d = [], []
        for shard in unpack_shards(batch):
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            dst = shard.cols
            keep = (src != dst) & (
                (d[src] < d[dst]) | ((d[src] == d[dst]) & (src < dst))
            )
            out_s.append(src[keep])
            out_d.append(dst[keep])
        return pa.table(
            {
                "src": np.concatenate(out_s) if out_s else np.empty(0, np.int64),
                "dst": np.concatenate(out_d) if out_d else np.empty(0, np.int64),
            }
        )

    srcs, dsts = [], []
    for b in graph.shards.map_batches(orient, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        srcs.append(t.column("src").to_numpy(zero_copy_only=False))
        dsts.append(t.column("dst").to_numpy(zero_copy_only=False))
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    # dedup (src, dst) PAIRS: the entry list dedups triples, so one pair can
    # appear with two weights — a multigraph edge is still one triangle edge
    key = np.unique(src * np.int64(n) + dst)
    src, dst = key // np.int64(n), key % np.int64(n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=indptr[1:])
    return indptr, dst, deg


def triangle_counts(graph: GraphHandle) -> tuple[np.ndarray, int]:
    """Returns (per-vertex triangle counts int64[n], global triangle count)."""
    n = graph.n
    indptr, cols, deg = _oriented_csr(graph)
    adj_ref = ray.put((indptr, cols, deg))

    def count_kernel(batch: pa.Table) -> pa.Table:
        # each task walks the pair-deduped oriented rows OWNED by its shard
        # (the shard supplies row ownership; adjacency comes from the
        # broadcast so duplicate multigraph pairs are already collapsed)
        ip, cl, d = ray.get(adj_ref)
        acc = np.zeros(n, dtype=np.int64)
        for shard in unpack_shards(batch):
            for u in shard.vids.tolist():
                a = cl[ip[u] : ip[u + 1]]
                for v in a.tolist():
                    b = cl[ip[v] : ip[v + 1]]
                    common = np.intersect1d(a, b, assume_unique=True)
                    if common.shape[0]:
                        acc[u] += common.shape[0]
                        acc[v] += common.shape[0]
                        acc[common] += 1
        nz = np.flatnonzero(acc)
        return pa.table({"vid": nz.astype(np.int64), "count": acc[nz]})

    per_vertex = np.zeros(n, dtype=np.int64)
    for b in graph.shards.map_batches(
        count_kernel, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        cnt = t.column("count").to_numpy(zero_copy_only=False)
        np.add.at(per_vertex, vid, cnt)
    return per_vertex, int(per_vertex.sum() // 3)


def triangles_oracle(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Dense-matrix oracle (tests only, small graphs)."""
    A = np.zeros((n, n), dtype=np.int64)
    A[src, dst] = 1
    A[dst, src] = 1
    np.fill_diagonal(A, 0)
    return np.diag(A @ A @ A) // 2
