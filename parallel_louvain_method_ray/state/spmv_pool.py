"""Hash-partitioned BSP SpMV engine for the joined (beyond-broadcast) tier.

The r4 all-Dataset HITS/Katz paid 2-3 Ray Data operator executions PER
half-step (edges ⋈ state join, groupby-sum, universe left_outer merge);
each join execution spins fresh aggregator actors (~1-2 s) and the
sort-based groupby has a per-distinct-key Python combine (~7 s at 50k
keys measured at 32 cpu), so 3 HITS iterations cost ~31 s at sf0.01
regardless of data size — pure fixed cost (VERDICT r4 #7, same disease
as the k-core peel fixed in state/peel_pool.py).

This module is the sparse-matrix-vector (SpMV) analogue of the peel
pool — the one primitive behind HITS, Katz, and any fixed-iteration
y = A^T x / y = A x loop (the reference's ghost-exchange machinery,
`/root/reference/src/distcommunity.cpp:387-545`, dissolves into exactly
this partial-sum exchange):

- the DIRECTED edge table is hash-partitioned ONCE: a by-src copy on
  actor `src % P` (serves forward waves: y[dst] += w * x[src] — x is
  locally owned there) and, when reverse waves are needed, a by-dst
  copy on actor `dst % P` (serves reverse waves: y[src] += w * x[dst]);
- every named vector lives sharded: actor p owns the values for vids
  {p, p+P, p+2P, ...} as one dense slice — vector state NEVER moves
  between actors and the driver NEVER holds an O(V) array;
- one wave = two RPC rounds: (1) each actor multiplies its edge
  partition against its own vector slice and emits per-bucket partial
  sums keyed by the output vid's hash (P tiny Arrow tables, shipped as
  object refs); (2) each actor sums its bucket's partials into the
  destination slice and returns only that slice's scalar sum (for L1
  normalization) to the driver.

Driver state: P actor handles, P*P refs per wave, P floats. Input-side
scaling (`scale`) folds L1 normalization into the NEXT wave's read, so
normalizing never touches the stored raw vectors.

Partitioning assumption (documented per the brief): vids are dense
0..n-1 and `v % P` spreads vector state evenly. A high-in-degree hub's
incoming edges are spread across the by-src partitions of their
sources, so its partial sums arrive pre-combined per actor — skew costs
bandwidth on one combine, not Python time. At 256 nodes, P = cluster
cores and edge partitions stream from the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _split_edges(
    block: pa.Table,
    P: int,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
    reverse: bool,
):
    """Bucket one edge block by `src % P` (reverse=False) or `dst % P`
    (reverse=True). Returns P tables (None for empty buckets)."""
    s = block.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d = block.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if weight_col is not None:
        w = (
            block.column(weight_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
    else:
        w = np.ones(len(s), dtype=np.float64)
    key = d if reverse else s
    hk = key % P
    out = []
    for p in range(P):
        sel = hk == p
        if not sel.any():
            out.append(None)
            continue
        out.append(pa.table({"s": s[sel], "d": d[sel], "w": w[sel]}))
    return tuple(out) if P > 1 else out[0]


@ray.remote
class SpmvShard:
    """One vid-partition of the vector state + the edge partitions whose
    input endpoint is homed here. See module docstring for the wave
    protocol."""

    def __init__(self, pid: int, P: int, n: int) -> None:
        self.pid = pid
        self.P = P
        self.n = n
        # vids owned here: pid, pid+P, ... — dense local slice
        self.n_owned = max(0, (n - pid + P - 1) // P) if n > pid else 0
        self.vecs: dict[str, np.ndarray] = {}
        # forward partition (src % P == pid): local src index, global dst
        self.f_src = np.empty(0, dtype=np.int64)
        self.f_dst = np.empty(0, dtype=np.int64)
        self.f_w = np.empty(0, dtype=np.float64)
        # reverse partition (dst % P == pid): local dst index, global src
        self.r_dst = np.empty(0, dtype=np.int64)
        self.r_src = np.empty(0, dtype=np.int64)
        self.r_w = np.empty(0, dtype=np.float64)

    def _concat(self, parts):
        tabs = [t for t in ray.get(list(parts)) if t is not None]
        if not tabs:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.float64)
        t = pa.concat_tables(tabs)
        return (
            t.column("s").to_numpy(zero_copy_only=False),
            t.column("d").to_numpy(zero_copy_only=False),
            t.column("w").to_numpy(zero_copy_only=False),
        )

    def ingest_forward(self, parts) -> int:
        s, d, w = self._concat(parts)
        self.f_src = (s - self.pid) // self.P  # s % P == pid by routing
        self.f_dst, self.f_w = d, w
        return len(d)

    def ingest_reverse(self, parts) -> int:
        s, d, w = self._concat(parts)
        self.r_dst = (d - self.pid) // self.P
        self.r_src, self.r_w = s, w
        return len(s)

    def init_vec(self, name: str, value: float) -> None:
        self.vecs[name] = np.full(self.n_owned, float(value))

    def _emit(self, key: np.ndarray, c: np.ndarray):
        """Group-sum contributions c by output vid and bucket by its
        hash: P small (v, c) tables."""
        out = []
        hk = key % self.P
        for q in range(self.P):
            sel = hk == q
            if not sel.any():
                out.append(None)
                continue
            uu, inv = np.unique(key[sel], return_inverse=True)
            sums = np.bincount(inv, weights=c[sel])
            out.append(pa.table({"v": uu, "c": sums}))
        return tuple(out) if self.P > 1 else out[0]

    def fwd_wave(self, src_name: str, scale: float):
        """Partials of y[dst] += w * (scale * x[src]) over my by-src
        edges, bucketed by dst % P."""
        x = self.vecs[src_name]
        xv = x[self.f_src]
        if scale != 1.0:
            xv = xv * scale
        return self._emit(self.f_dst, self.f_w * xv)

    def rev_wave(self, dst_name: str, scale: float):
        """Partials of y[src] += w * (scale * x[dst]) over my by-dst
        edges, bucketed by src % P."""
        x = self.vecs[dst_name]
        xv = x[self.r_dst]
        if scale != 1.0:
            xv = xv * scale
        return self._emit(self.r_src, self.r_w * xv)

    def combine(self, dst_name: str, parts) -> float:
        """Sum my bucket's partials into the named slice; return the
        slice's scalar sum (the L1-normalization input)."""
        y = np.zeros(self.n_owned, dtype=np.float64)
        tabs = [t for t in ray.get(list(parts)) if t is not None]
        if tabs:
            t = pa.concat_tables(tabs)
            v = t.column("v").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            np.add.at(y, (v - self.pid) // self.P, c)
        self.vecs[dst_name] = y
        return float(y.sum())

    def axpb(self, src_name: str, alpha: float, beta: float, out_name: str):
        """out = alpha * src + beta (the Katz update; no exchange)."""
        self.vecs[out_name] = alpha * self.vecs[src_name] + beta

    def collect(self, spec: list[tuple[str, float, str]]) -> pa.Table:
        """My slice as (vid, *cols): spec = [(vec_name, scale, col)]."""
        vids = np.arange(self.pid, self.n, self.P, dtype=np.int64)
        cols: dict[str, np.ndarray] = {"vid": vids}
        for name, scale, col in spec:
            x = self.vecs[name]
            cols[col] = x * scale if scale != 1.0 else x
        return pa.table(cols)


class SpmvPool:
    """Driver-side handle: builds the actors, ingests the edge
    partitions, exposes the wave/combine protocol plus collection into a
    Dataset. Callers must `shutdown()` (or use as a context manager)."""

    def __init__(
        self,
        edges: ray.data.Dataset,
        n: int,
        src_col: str = "src",
        dst_col: str = "dst",
        weight_col: str | None = None,
        partitions: int | None = None,
        need_reverse: bool = False,
    ) -> None:
        eds = edges.materialize()
        n_input = eds.count()  # metadata-only on a materialized dataset
        if partitions is not None:
            P = max(1, int(partitions))
        else:
            cpus = (
                int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized()
                else 8
            )
            # ~500k edges per actor; never more actors than CPUs//2
            P = max(1, min(cpus // 2 or 1, n_input // 500_000 + 1))
        self.P = P
        self.n = n
        self.actors = [SpmvShard.remote(p, P, n) for p in range(P)]
        block_refs = []
        for rb in eds.iter_internal_ref_bundles():
            block_refs.extend(r for r, _ in rb.blocks)
        waves = [self._ingest(block_refs, src_col, dst_col, weight_col, False)]
        if need_reverse:
            waves.append(
                self._ingest(block_refs, src_col, dst_col, weight_col, True)
            )
        for w in waves:
            ray.get(w)

    def _ingest(self, block_refs, src_col, dst_col, weight_col, reverse):
        P = self.P
        method = "ingest_reverse" if reverse else "ingest_forward"
        if P > 1:
            splits = [
                _split_edges.options(num_returns=P).remote(
                    br, P, src_col, dst_col, weight_col, reverse
                )
                for br in block_refs
            ]
            return [
                getattr(self.actors[p], method).remote([s[p] for s in splits])
                for p in range(P)
            ]
        splits = [
            _split_edges.remote(br, P, src_col, dst_col, weight_col, reverse)
            for br in block_refs
        ]
        return [getattr(self.actors[0], method).remote(splits)]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    def init_vec(self, name: str, value: float) -> None:
        ray.get([a.init_vec.remote(name, value) for a in self.actors])

    def _wave(self, method: str, src_name: str, scale: float, dst_name: str):
        P = self.P
        if P > 1:
            partials = [
                getattr(a, method)
                .options(num_returns=P)
                .remote(src_name, scale)
                for a in self.actors
            ]
            sums = ray.get(
                [
                    self.actors[q].combine.remote(
                        dst_name, [partials[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
            )
        else:
            partial = getattr(self.actors[0], method).remote(src_name, scale)
            sums = ray.get([self.actors[0].combine.remote(dst_name, [partial])])
        return float(sum(sums))

    def fwd(self, src_name: str, dst_name: str, scale: float = 1.0) -> float:
        """y[dst] = sum_src w * (scale * x[src]); returns sum(y)."""
        return self._wave("fwd_wave", src_name, scale, dst_name)

    def rev(self, dst_name: str, out_name: str, scale: float = 1.0) -> float:
        """y[src] = sum_dst w * (scale * x[dst]); returns sum(y)."""
        return self._wave("rev_wave", dst_name, scale, out_name)

    def axpb(
        self, src_name: str, alpha: float, beta: float, out_name: str
    ) -> None:
        ray.get(
            [a.axpb.remote(src_name, alpha, beta, out_name) for a in self.actors]
        )

    def collect(self, spec: list[tuple[str, float, str]]) -> ray.data.Dataset:
        """Gather the named slices into a (vid, *cols) Dataset. Blocks are
        materialized before the pool dies (from_arrow_refs blocks live in
        the owning actor's object-store lifetime)."""
        tabs = [a.collect.remote(list(spec)) for a in self.actors]
        return ray.data.from_arrow_refs(tabs).materialize()

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def hits_partitioned(
    edges: ray.data.Dataset,
    n: int,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """HITS on the BSP SpMV pool — semantics identical to
    `algos.hits.hits` / the r4 all-Dataset hits_joined (fixed-iteration
    L1-normalized half-steps over the DIRECTED edge table, sum>0 guard).
    Normalization is folded into the next wave's input scale, so stored
    vectors stay raw; the driver sees only P floats per half-step."""
    if iters < 1:
        raise ValueError(f"hits_partitioned: iters must be >= 1, got {iters}")
    pool = SpmvPool(
        edges,
        n,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
        partitions=partitions,
        need_reverse=True,
    )
    try:
        pool.init_vec("hub", 1.0)
        hub_name, inv_h = "hub", 1.0
        inv_a = 1.0
        for _ in range(iters):
            s_a = pool.fwd(hub_name, "auth_raw", scale=inv_h)
            inv_a = 1.0 / s_a if s_a > 0 else 1.0
            s_h = pool.rev("auth_raw", "hub_raw", scale=inv_a)
            inv_h = 1.0 / s_h if s_h > 0 else 1.0
            hub_name = "hub_raw"
        out = pool.collect(
            [("hub_raw", inv_h, "hub"), ("auth_raw", inv_a, "authority")]
        )
    finally:
        pool.shutdown()
    return out, {"iterations": iters}


def katz_partitioned(
    edges: ray.data.Dataset,
    n: int,
    alpha: float = 0.005,
    beta: float = 1.0,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Katz centrality on the BSP SpMV pool — the same truncated power
    series as `algos.pagerank.katz_centrality` / the r4 all-Dataset
    katz_joined: x_k = alpha * A^T x_{k-1} + beta, x_0 = beta."""
    pool = SpmvPool(
        edges,
        n,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
        partitions=partitions,
        need_reverse=False,
    )
    try:
        pool.init_vec("x", beta)
        for _ in range(iters):
            pool.fwd("x", "y", scale=1.0)
            pool.axpb("y", alpha, beta, "x")
        out = pool.collect([("x", 1.0, "katz")])
    finally:
        pool.shutdown()
    return out, {"iterations": iters}
