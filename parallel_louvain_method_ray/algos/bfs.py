"""Multi-source BFS hop distances over CSR shards.

Same BSP shape as connected components (algos/components.py, reference
parity note there): each global round is one shuffle-free map_batches pass
over the shards; inside a shard the kernel relaxes `dist[v] =
min(dist[v], min_u dist[u] + 1)` to a LOCAL fixpoint with
`np.minimum.reduceat` before emitting changes, so the number of global
rounds is roughly the number of cross-partition hops, not the graph
diameter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from parallel_louvain_method_ray.graph.build import GraphHandle
from parallel_louvain_method_ray.graph.csr import unpack_shards

# below this entry count the whole traversal runs on the driver: each
# distributed round is a full Ray Data execution (~1 s of operator fixed
# cost regardless of data size), so a handful of rounds on a toy graph
# costs 10x the actual work. Mirrors EngineConfig.driver_local_entries
# (the broadcast tier already holds O(V) driver state either way; final
# distances are the same unique min-plus fixpoint on both paths).
_DRIVER_LOCAL_ENTRIES = 200_000


def _local_csr(graph: GraphHandle):
    """Driver-side CSR (indptr, cols, weights) of a SMALL graph."""
    from parallel_louvain_method_ray.algos.louvain import _collect_entries

    src, dst, w = _collect_entries(graph)
    n = graph.n
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=indptr[1:])
    return indptr, dst, w


def _row_gather(indptr: np.ndarray, rows: np.ndarray):
    """Indices of every CSR entry of `rows`, concatenated (vectorized)."""
    counts = indptr[rows + 1] - indptr[rows]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), counts
    out = (
        np.repeat(indptr[rows], counts)
        + np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(counts) - counts, counts)
    )
    return out, counts


def bfs_distances(
    graph: GraphHandle,
    seeds: np.ndarray,
    max_rounds: int = 200,
) -> tuple[np.ndarray, dict]:
    """Hop distance from the nearest seed (symmetrized graph).

    Returns (dist int64[n], metrics); unreachable vertices keep
    dist == n (the INF sentinel — strictly larger than any real hop
    count)."""
    n = graph.n
    inf = np.int64(n)
    dist = np.full(n, inf, dtype=np.int64)
    dist[np.asarray(seeds, dtype=np.int64)] = 0
    if graph.n_entries <= _DRIVER_LOCAL_ENTRIES:
        # frontier BFS on a driver-local CSR (same unique fixpoint)
        indptr, cols, _ = _local_csr(graph)
        frontier = np.unique(np.asarray(seeds, dtype=np.int64))
        level = np.int64(0)
        while frontier.size and level < max_rounds:
            gather, _ = _row_gather(indptr, frontier)
            nbr = cols[gather]
            new = np.unique(nbr[dist[nbr] > level + 1])
            dist[new] = level + 1
            frontier = new
            level += 1
        return dist, {"rounds": int(level)}
    rounds = 0
    while rounds < max_rounds:
        dist_ref = ray.put(dist)

        def kernel(batch: pa.Table) -> pa.Table:
            out_v, out_d = [], []
            for shard in unpack_shards(batch):
                d = np.array(ray.get(dist_ref))  # fresh copy per shard
                ip = shard.indptr
                while True:
                    row_min = (
                        np.minimum.reduceat(d[shard.cols], ip[:-1]) + 1
                    )
                    cur = d[shard.vids]
                    better = row_min < cur
                    if not better.any():
                        break
                    d[shard.vids[better]] = row_min[better]
                snap = ray.get(dist_ref)
                ch = d[shard.vids] != snap[shard.vids]
                out_v.append(shard.vids[ch])
                out_d.append(d[shard.vids[ch]])
            return pa.table(
                {
                    "vid": np.concatenate(out_v)
                    if out_v
                    else np.empty(0, np.int64),
                    "dist": np.concatenate(out_d)
                    if out_d
                    else np.empty(0, np.int64),
                }
            )

        changed = 0
        for b in graph.shards.map_batches(
            kernel, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            vid = t.column("vid").to_numpy(zero_copy_only=False)
            d = t.column("dist").to_numpy(zero_copy_only=False)
            if vid.shape[0]:
                np.minimum.at(dist, vid, d)
                changed += vid.shape[0]
        rounds += 1
        if changed == 0:
            break
    return dist, {"rounds": rounds}


def sssp_hops(
    graph: GraphHandle,
    seeds: np.ndarray,
    hops: int,
) -> tuple[np.ndarray, dict]:
    """Hop-bounded weighted shortest paths (exact Bellman-Ford semantics):
    dist after round r = cheapest path from any seed using AT MOST r edges.

    Unlike `bfs_distances`, the kernel does EXACTLY ONE relaxation per
    global round (no local fixpoint — a fixpoint would relax multi-hop
    paths inside a shard and break the hop bound the SQL oracle unrolls).
    Returns float64 dists; unreachable-in-`hops` keeps +inf."""
    n = graph.n
    dist = np.full(n, np.inf, dtype=np.float64)
    dist[np.asarray(seeds, dtype=np.int64)] = 0.0
    if graph.n_entries <= _DRIVER_LOCAL_ENTRIES:
        # the SAME one-relaxation-per-round Jacobi loop, driver-local
        indptr, cols, w = _local_csr(graph)
        if cols.size == 0:
            return dist, {"hops": hops}
        nonempty = np.diff(indptr) > 0
        # reduceat quirks: an empty row reads the NEXT slice's first
        # element, and a trailing empty row's start == len(cols) is out
        # of bounds — clamp the starts and mask empty rows afterwards
        starts = np.minimum(indptr[:-1], cols.size - 1)
        for _ in range(hops):
            cand = np.minimum.reduceat(dist[cols] + w, starts)
            cand[~nonempty] = np.inf
            better = cand < dist
            if not better.any():
                break
            dist[better] = cand[better]
        return dist, {"hops": hops}

    for _ in range(hops):
        dist_ref = ray.put(dist)

        def kernel(batch: pa.Table) -> pa.Table:
            out_v, out_d = [], []
            for shard in unpack_shards(batch):
                d = ray.get(dist_ref)
                cand = np.minimum.reduceat(
                    d[shard.cols] + shard.weights, shard.indptr[:-1]
                )
                # reduceat on an empty row yields the NEXT slice's first
                # element — mask rows with zero entries
                row_len = np.diff(shard.indptr)
                cand[row_len == 0] = np.inf
                better = cand < d[shard.vids]
                out_v.append(shard.vids[better])
                out_d.append(cand[better])
            return pa.table(
                {
                    "vid": np.concatenate(out_v)
                    if out_v
                    else np.empty(0, np.int64),
                    "dist": np.concatenate(out_d)
                    if out_d
                    else np.empty(0, np.float64),
                }
            )

        changed = 0
        new_dist = dist.copy()
        for b in graph.shards.map_batches(
            kernel, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            vid = t.column("vid").to_numpy(zero_copy_only=False)
            d = t.column("dist").to_numpy(zero_copy_only=False)
            if vid.shape[0]:
                np.minimum.at(new_dist, vid, d)
                changed += vid.shape[0]
        dist = new_dist
        if changed == 0:
            break
    return dist, {"hops": hops}


def bfs_oracle(
    src: np.ndarray, dst: np.ndarray, n: int, seeds: np.ndarray
) -> np.ndarray:
    """Sequential BFS oracle (tests only). dist == n for unreachable."""
    from collections import deque

    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in zip(src.tolist(), dst.tolist()):
        adj[u].append(v)
    dist = np.full(n, n, dtype=np.int64)
    q = deque()
    for s in np.asarray(seeds, dtype=np.int64).tolist():
        dist[s] = 0
        q.append(s)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if dist[v] > dist[u] + 1:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def bfs_parents(
    graph: GraphHandle,
    root: int,
    max_rounds: int = 200,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Graph500-style top-down BFS parent tree from `root` — the output
    contract of the reference's dead `top_down_bfs(0)` driver
    (`/root/reference/src/main_distributed_bfs.cpp:87-89`, declared but
    never implemented).

    Returns (parent int64[n], dist int64[n], metrics): parent[root] ==
    root, unreachable == -1; deterministic tie-break parent[v] = the
    SMALLEST-vid neighbor u with dist[u] == dist[v] - 1 (any such u is a
    valid Graph500 parent; the min makes runs and engines comparable).
    One distance fixpoint + ONE extra shuffle-free pass."""
    dist, meta = bfs_distances(graph, np.array([root]), max_rounds=max_rounds)
    n = graph.n
    if graph.n_entries <= _DRIVER_LOCAL_ENTRIES:
        # same min-vid parent rule on a driver-local CSR (one pass)
        parent = np.full(n, -1, dtype=np.int64)
        parent[root] = root
        indptr, cols, _ = _local_csr(graph)
        if cols.size:
            nonempty = np.diff(indptr) > 0
            starts = np.minimum(indptr[:-1], cols.size - 1)
            cur = np.repeat(dist, np.diff(indptr))
            cand = np.where(dist[cols] == cur - 1, cols, np.int64(n))
            row_min = np.minimum.reduceat(cand, starts)
            row_min[~nonempty] = n
            has = (row_min < n) & (dist > 0) & (dist < n)
            parent[has] = row_min[has]
        return parent, dist, meta
    dist_ref = ray.put(dist)

    def kernel(batch: pa.Table) -> pa.Table:
        out_v, out_p = [], []
        d = ray.get(dist_ref)
        for shard in unpack_shards(batch):
            ip = shard.indptr
            cur = d[shard.vids]
            # neighbor dist must equal cur - 1; mask others to the INF
            # sentinel n (never a real vid) and take the row-min vid
            nbr_ok = d[shard.cols] == np.repeat(cur, np.diff(ip)) - 1
            cand = np.where(nbr_ok, shard.cols.astype(np.int64), np.int64(n))
            row_min = np.minimum.reduceat(cand, ip[:-1])
            row_len = np.diff(ip)
            row_min[row_len == 0] = n
            has = (row_min < n) & (cur > 0) & (cur < n)
            out_v.append(shard.vids[has])
            out_p.append(row_min[has])
        return pa.table(
            {
                "vid": np.concatenate(out_v) if out_v else np.empty(0, np.int64),
                "parent": np.concatenate(out_p) if out_p else np.empty(0, np.int64),
            }
        )

    best = np.full(n, n, dtype=np.int64)  # INF sentinel, then min-merge
    for b in graph.shards.map_batches(kernel, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        p = t.column("parent").to_numpy(zero_copy_only=False)
        if vid.shape[0]:
            # a vertex's rows may be hub-split across shards: keep the min
            np.minimum.at(best, vid, p)
    parent = np.where(best < n, best, np.int64(-1))
    parent[root] = root
    return parent, dist, meta
