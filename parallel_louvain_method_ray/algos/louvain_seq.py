"""Sequential Louvain oracle — a faithful Python re-expression of the
reference's `Communities` over a single-process CSR
(`/root/reference/src/community.cpp`, `src/graph.cpp`).

This is the correctness anchor for the distributed engine: it reproduces the
reference's golden values (`/root/reference/tests/main_test.cpp:54-82`:
initial modularity -0.0714286, post-level 0.346301, 4 communities after
coarsening) and generates per-vertex golden assignments for arbitrary test
graphs. It is NOT used in the scale path.
"""

from __future__ import annotations

import numpy as np

from parallel_louvain_method_ray.algos._local_move import local_move_sweep
from parallel_louvain_method_ray.graph.csr import dedup_sorted_entries


class SequentialCSR:
    """CSR over dense ids 0..n-1, built exactly like the reference:
    symmetrize both directions, set-dedup triples, sort by (src, dst, w),
    `m = n_entries // 2` (`src/graph.cpp:51-85`)."""

    def __init__(self, src, dst, w, already_symmetrized: bool = False):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)
        if not already_symmetrized:
            keep = src != dst
            src, dst, w = (
                np.concatenate([src, dst[keep]]),
                np.concatenate([dst, src[keep]]),
                np.concatenate([w, w[keep]]),
            )
        self.src, self.cols, self.weights = dedup_sorted_entries(src, dst, w)
        self.n = int(max(self.src.max(), self.cols.max())) + 1 if self.src.size else 0
        counts = np.bincount(self.src, minlength=self.n)
        self.indptr = np.zeros(self.n + 1, dtype=np.int64)
        np.cumsum(counts, out=self.indptr[1:])
        self.m = int(self.src.shape[0]) // 2

    def degrees(self) -> np.ndarray:
        return np.bincount(self.src, weights=self.weights, minlength=self.n)


class SequentialLouvain:
    def __init__(self, csr: SequentialCSR, tie_break: str = "reference"):
        self.csr = csr
        self.tie_break = tie_break
        self.deg = csr.degrees()
        # singleton init: comm(v)=v, tot[v]=deg(v), in[v]=0 (`community.cpp:24-30`)
        self.comm = np.arange(csr.n, dtype=np.int64)
        self.tot = self.deg.copy()

    def _intra_weight(self) -> float:
        """sum over CSR entries (u != w, same community) — equals the
        reference's incrementally maintained `in` summed over communities
        (self-loops are never added to `in`: `community.cpp:134`)."""
        c = self.csr
        mask = (c.src != c.cols) & (self.comm[c.src] == self.comm[c.cols])
        return float(c.weights[mask].sum())

    def modularity(self) -> float:
        """Q = sum_c in_c/2m - (tot_c/2m)^2 over comms with tot > 0
        (`community.cpp:49-60`; 2m = 2 * edge COUNT, `community.cpp:51`)."""
        m2 = 2.0 * self.csr.m
        if m2 <= 0:
            return 0.0
        tot = self.tot
        q = self._intra_weight() / m2
        nz = tot > 0
        q -= float(((tot[nz] / m2) ** 2).sum())
        return q

    def iterate(self) -> bool:
        """One Louvain level: ascending-order Gauss-Seidel sweeps until a
        sweep makes 0 moves (`community.cpp:64-102`). Returns whether any
        move happened."""
        c = self.csr
        vids = np.arange(c.n, dtype=np.int64)
        improvement = False
        # canonical mode includes the singleton-swap guard (see
        # _local_move.py) so the engine's P=1 path stays bit-identical
        csize = (
            np.bincount(self.comm, minlength=c.n)
            if self.tie_break == "canonical"
            else None
        )
        while True:
            moves = local_move_sweep(
                vids,
                c.indptr,
                c.cols,
                c.weights,
                self.comm,
                self.tot,
                self.deg,
                2.0 * c.m,
                tie_break=self.tie_break,
                csize=csize,
            )
            if moves > 0:
                improvement = True
            if moves == 0:
                return improvement

    def coarsen(self) -> tuple["SequentialCSR", np.ndarray]:
        """Contract communities into a new graph (`community.cpp:162-201`),
        with DETERMINISTIC dense renumbering by sorted old community id
        (the reference iterates an unordered_map — nondeterministic; we
        canonicalize). Returns (coarse_csr, vid -> new community id).

        All CSR entries are aggregated (including self-loops —
        `community.cpp:181-191` has no u != w filter), so intra-community
        weight appears as coarse self-loops (doubled, once per endpoint).
        """
        c = self.csr
        old = np.unique(self.comm)
        dense = np.searchsorted(old, self.comm)
        cs = dense[c.src]
        cd = dense[c.cols]
        ncomms = old.shape[0]
        key = cs * ncomms + cd
        uk, inv = np.unique(key, return_inverse=True)
        wsum = np.zeros(uk.shape[0], dtype=np.float64)
        np.add.at(wsum, inv, c.weights)
        coarse = SequentialCSR(
            uk // ncomms, uk % ncomms, wsum, already_symmetrized=True
        )
        return coarse, dense


def louvain_reference(
    src, dst, w, max_levels: int = 32, tie_break: str = "reference"
) -> tuple[np.ndarray, float, list[dict]]:
    """Multi-level sequential Louvain: repeat (iterate, coarsen) until a
    level makes no move (the reference's `community` binary does one level
    per invocation and the user re-runs it on the written coarse graph —
    `src/main_distributed_community.cpp:41-69`; this automates that loop).

    Returns (assignments over original vids, final modularity, level
    metrics). Final modularity is computed on the ORIGINAL graph under the
    composed assignments (per-level Q uses each level's own m — reference
    ecount semantics — and is not comparable across levels).
    """
    csr = SequentialCSR(src, dst, w)
    csr0 = csr
    membership = np.arange(csr.n, dtype=np.int64)
    levels = []
    mod = None
    for level in range(max_levels):
        lv = SequentialLouvain(csr, tie_break=tie_break)
        q0 = lv.modularity()
        improved = lv.iterate()
        q1 = lv.modularity()
        if not improved and level > 0:
            # no moves: this level's singleton-init modularity is a
            # per-level quantity of the coarse graph, not the result
            break
        coarse, dense = lv.coarsen()
        levels.append(
            {
                "level": level,
                "modularity_before": q0,
                "modularity_after": q1,
                "n_vertices": csr.n,
                "m": csr.m,
                "n_communities": int(np.unique(dense).shape[0]),
            }
        )
        membership = dense[membership]
        mod = q1
        if not improved:
            break
        csr = coarse
    # final Q on the original graph under the composed assignments
    m2 = 2.0 * csr0.m
    if m2 <= 0:
        return membership, 0.0, levels
    mask = (csr0.src != csr0.cols) & (membership[csr0.src] == membership[csr0.cols])
    intra = float(csr0.weights[mask].sum())
    tot = np.bincount(membership, weights=csr0.degrees(), minlength=csr0.n)
    nz = tot > 0
    final_q = intra / m2 - float(((tot[nz] / m2) ** 2).sum())
    return membership, final_q, levels
