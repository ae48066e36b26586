"""Hash-partitioned BSP peel engine for the joined (beyond-broadcast) tier.

The r4 all-Dataset k-core peel re-materialized the full alive set through
two hash joins + one groupby PER ROUND; Ray Data's sort-based aggregate
has a per-distinct-key Python combine (~7 s for 50k keys measured at
32 cpu) and each join execution spins fresh aggregator actors (~1 s), so
a 16-round peel cost ~50 s at sf0.01 regardless of data size — pure fixed
cost (VERDICT r4 #7).

This module replaces the per-round Dataset plumbing with the structure a
real distributed peel has (the brief's option (b): an actor-pool stage
holding the needed state):

- spokes (both directions of the distinct undirected edge set) are
  hash-partitioned ONCE by `v % P` across P actors; the pair dedup is
  absorbed into the partition build (duplicates of a pair land on the
  same actor by construction);
- the survivor set for the vids homed at partition p lives ON actor p —
  and because spokes are partitioned by the same hash of v, the prune of
  partition p's spokes needs exactly actor p's own survivor set: the
  survivor state NEVER moves between actors;
- one peel round = two RPC waves: (1) every actor prunes its spokes
  against its own survivors and emits per-bucket partial degree counts
  keyed by `u % P` (P tiny Arrow tables, shipped as object refs); (2)
  every actor sums its bucket's partials and keeps `deg >= k` as its next
  survivor set, returning only a COUNT to the driver.

Driver state: P actor handles, P*P object refs per round, and scalar
survivor counts — never O(V) or O(E) (the joined tier's contract).

Round semantics are bit-identical to `algos.kcore.kcore_bounded` (Jacobi:
round r keeps vertices with >= k neighbors alive in round r-1's set;
round 0's set = every edge-incident vertex). Dead vertices stay dead
WITHOUT an explicit alive intersection: survivor sets shrink
monotonically, so a vertex removed at round s has deg_r <= deg_s < k for
every later r (its countable neighbors only shrink).

Partitioning assumption (documented per the brief): `v % P` must spread
high-in-degree hubs' spoke lists acceptably — a hub's incoming spokes all
land on one actor; per-round work there is a vectorized searchsorted
over that partition, so skew costs bandwidth, not Python time. At 256
nodes, P = cluster cores and partitions stream from the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _split_spokes(block: pa.Table, P: int, src_col: str, dst_col: str):
    """Normalize one edge block to undirected spokes and bucket by v % P.
    Returns P tables (or None for empty buckets). Self-loops dropped; pair
    dedup is deferred to the owning actor (same bucket by construction)."""
    s = block.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d = block.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    hv = v % P
    out = []
    for p in range(P):
        sel = hv == p
        if not sel.any():
            out.append(None)
            continue
        out.append(pa.table({"u": u[sel], "v": v[sel]}))
    return tuple(out) if P > 1 else out[0]


@ray.remote
class PeelShard:
    """One v-partition of the spoke table + the survivor set for the vids
    homed here (same hash). See module docstring for the round protocol."""

    def __init__(self, pid: int, P: int, k: int) -> None:
        self.pid = pid
        self.P = P
        self.k = int(k)
        self.u = np.empty(0, dtype=np.int64)
        self.v = np.empty(0, dtype=np.int64)
        # None = "every vid is alive" (the round-0 state: prune is a no-op)
        self.surv: np.ndarray | None = None

    def ingest(self, parts: list) -> int:
        """Concatenate my bucket's split outputs and dedup (u, v) pairs —
        the undirected distinct-edge semantics of kcore's
        `undirected_dedup`, without a Ray groupby."""
        tabs = [t for t in ray.get(list(parts)) if t is not None]
        if tabs:
            t = pa.concat_tables(tabs)
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            first = np.ones(len(u), dtype=bool)
            first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            self.u, self.v = u[first], v[first]
        return len(self.u)

    def count_wave(self):
        """Prune my spokes by my own survivor set, then emit per-bucket
        partial degree counts keyed by u % P (P small tables)."""
        if self.surv is not None:
            if self.surv.size == 0:
                self.u = self.u[:0]
                self.v = self.v[:0]
            else:
                idx = np.searchsorted(self.surv, self.v)
                idx[idx >= self.surv.size] = 0
                keep = self.surv[idx] == self.v
                self.u, self.v = self.u[keep], self.v[keep]
        out = []
        hu = self.u % self.P
        for q in range(self.P):
            sel = self.u[hu == q]
            if sel.size == 0:
                out.append(None)
                continue
            uu, cc = np.unique(sel, return_counts=True)
            out.append(pa.table({"u": uu, "c": cc.astype(np.int64)}))
        return tuple(out) if self.P > 1 else out[0]

    def combine_wave(self, parts: list, thresh: int | None = None) -> tuple[int, int]:
        """Sum my bucket's partials; survivors = {u: deg >= thresh}
        (thresh defaults to k; rounds<1 callers pass 1 to recover round
        0's edge-incident set). Returns (#vids with any live spoke,
        #survivors) — the first is round 0's alive count on the first
        call."""
        if thresh is None:
            thresh = self.k
        tabs = [t for t in ray.get(list(parts)) if t is not None]
        if not tabs:
            self.surv = np.empty(0, dtype=np.int64)
            return 0, 0
        t = pa.concat_tables(tabs)
        u = t.column("u").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        uu = np.unique(u)
        deg = np.zeros(uu.size, dtype=np.int64)
        np.add.at(deg, np.searchsorted(uu, u), c)
        self.surv = uu[deg >= thresh]
        return int(uu.size), int(self.surv.size)

    def survivors_table(self) -> pa.Table:
        surv = self.surv if self.surv is not None else np.empty(0, np.int64)
        return pa.table({"vid": surv.astype(np.int64)})


def kcore_peel_partitioned(
    edges: ray.data.Dataset,
    k: int,
    rounds: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Full peel: returns (alive vid Dataset, {"rounds", "n_alive"}).
    Semantics identical to kcore_bounded / the r4 kcore_joined (Jacobi
    peel, early exit at the fixpoint, `rounds` bound)."""
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
        # ~500k spokes per actor; never more actors than CPUs//2
        P = max(1, min(cpus // 2 or 1, (2 * n_input) // 500_000 + 1))

    block_refs = []
    for rb in eds.iter_internal_ref_bundles():
        block_refs.extend(r for r, _ in rb.blocks)
    actors = [PeelShard.remote(p, P, k) for p in range(P)]
    try:
        if P > 1:
            splits = [
                _split_spokes.options(num_returns=P).remote(
                    br, P, src_col, dst_col
                )
                for br in block_refs
            ]
            ingests = [
                actors[p].ingest.remote([s[p] for s in splits])
                for p in range(P)
            ]
        else:
            splits = [
                _split_spokes.remote(br, P, src_col, dst_col)
                for br in block_refs
            ]
            ingests = [actors[0].ingest.remote(splits)]
        ray.get(ingests)

        def run_wave(thresh: int | None) -> list[tuple[int, int]]:
            if P > 1:
                partials = [
                    a.count_wave.options(num_returns=P).remote()
                    for a in actors
                ]
                return ray.get(
                    [
                        actors[q].combine_wave.remote(
                            [partials[p][q] for p in range(P)], thresh
                        )
                        for q in range(P)
                    ]
                )
            partial = actors[0].count_wave.remote()
            return ray.get([actors[0].combine_wave.remote([partial], thresh)])

        n_prev: int | None = None
        n_alive = 0
        done = 0
        counts: list[tuple[int, int]] = []
        if rounds < 1:
            # round 0's alive set (edge-incident vids): one wave at
            # threshold 1 — every incident vid has >= 1 spoke
            counts = run_wave(1)
            n_alive = sum(c[1] for c in counts)
        for r in range(rounds):
            counts = run_wave(None)
            n_before = sum(c[0] for c in counts)
            n_alive = sum(c[1] for c in counts)
            if n_prev is None:
                n_prev = n_before  # round 0's alive set: edge-incident vids
            done = r + 1
            if n_alive == n_prev:
                break
            n_prev = n_alive

        alive_tabs = [
            a.survivors_table.remote()
            for a, c in zip(actors, counts)
            if c[1] > 0
        ]
        if alive_tabs:
            alive = ray.data.from_arrow_refs(alive_tabs)
        else:
            alive = ray.data.from_arrow(
                pa.table({"vid": np.empty(0, dtype=np.int64)})
            )
        # survivors must outlive the actors: from_arrow_refs blocks live in
        # the owning actor's object store lifetime — materialize first
        alive = alive.materialize()
    finally:
        for a in actors:
            ray.kill(a)
    return alive, {"rounds": done, "n_alive": n_alive}
