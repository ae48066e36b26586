"""Distributed multi-level Louvain on Ray Data.

Replaces the reference's `DistCommunities` fine-grained MPI messaging
(`/root/reference/src/distcommunity.cpp`: per-vertex MPI_Barrier + probe
drains, `:326-353` — its scalability killer) with BSP sweeps:

- one Louvain SWEEP = one shuffle-free `map_batches` pass over the
  materialized CSR shards; every task runs the shared Gauss-Seidel
  local-move kernel over its partition against a snapshot of the global
  state (assignments + community totals, broadcast via ray.put, read
  zero-copy);
- between sweeps the driver applies the (small) set of changed vertices and
  recomputes community totals exactly (bincount over degrees) — the
  reference's `CommunityUpdate`/`CommunityInfo`/`DegreeInfo` message machinery
  (`distcommunity.cpp:387-503`) dissolves into this;
- convergence: a sweep with 0 moves ends the level (`community.cpp:98`);
  a modularity stall detector guards against cross-partition oscillation
  (the reference damps this with a temperature, `distcommunity.cpp:549-562`;
  our kernel is deterministic so a stall cap suffices);
- with num_partitions=1 the engine IS the sequential reference algorithm
  (same kernel), which is how golden parity is tested.

Coarsening (`community.cpp:162-201`, `distcommunity.cpp:766-915`) is one
shuffle: per-shard partial contraction (numpy groupby) -> global
groupby(src,dst).sum -> rebuild shards. Community renumbering is
deterministic (sorted old id) instead of the reference's unordered-hash
iteration order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.algos._local_move import local_move_sweep
from parallel_louvain_method_ray.config import DEFAULT_CONFIG, EngineConfig
from parallel_louvain_method_ray.graph.build import GraphHandle, build_graph
from parallel_louvain_method_ray.graph.csr import unpack_shards


# ---------------------------------------------------------------------------
# per-sweep distributed passes
# ---------------------------------------------------------------------------


def _sweep_pass(
    graph: GraphHandle,
    assign_ref,
    tot_ref,
    tie_break: str,
    m2: float | None = None,
    csize_ref=None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Run the local-move kernel on every shard; returns (changed_vids,
    new_comms, moves). Each task copies the broadcast state (its snapshot)
    and mutates only the copy — Grappolo-style BSP."""
    deg_ref = graph.degrees_ref
    if m2 is None:
        m2 = 2.0 * graph.m

    def kernel(batch: pa.Table) -> pa.Table:
        deg = ray.get(deg_ref)
        out_v, out_c = [], []
        for shard in unpack_shards(batch):
            # fresh snapshot PER SHARD: partition semantics must not depend
            # on how shards happen to be packed into blocks/batches
            assign = np.array(ray.get(assign_ref))
            tot = np.array(ray.get(tot_ref))
            csize = (
                np.array(ray.get(csize_ref)) if csize_ref is not None else None
            )
            before = assign[shard.vids].copy()
            local_move_sweep(
                shard.vids,
                shard.indptr,
                shard.cols,
                shard.weights,
                assign,
                tot,
                deg,
                m2,
                tie_break=tie_break,
                csize=csize,
            )
            changed = assign[shard.vids] != before
            out_v.append(shard.vids[changed])
            out_c.append(assign[shard.vids][changed])
        return pa.table(
            {
                "vid": np.concatenate(out_v) if out_v else np.empty(0, np.int64),
                "comm": np.concatenate(out_c) if out_c else np.empty(0, np.int64),
            }
        )

    vids, comms, total_moves = [], [], 0
    for b in graph.shards.map_batches(kernel, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        vids.append(t.column("vid").to_numpy(zero_copy_only=False))
        comms.append(t.column("comm").to_numpy(zero_copy_only=False))
    cv = np.concatenate(vids) if vids else np.empty(0, np.int64)
    cc = np.concatenate(comms) if comms else np.empty(0, np.int64)
    return cv, cc, int(cv.shape[0])


def intra_community_weight(graph: GraphHandle, assign_ref) -> float:
    """Global sum of entry weights (src != dst, same community) — the
    sum_c in_c of the modularity formula (self-loops excluded, matching the
    reference's `in` bookkeeping: `community.cpp:134`)."""

    def part(batch: pa.Table) -> pa.Table:
        assign = ray.get(assign_ref)
        s = 0.0
        for shard in unpack_shards(batch):
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            mask = (src != shard.cols) & (assign[src] == assign[shard.cols])
            s += float(shard.weights[mask].sum())
        return pa.table({"intra": [s]})

    total = 0.0
    for b in graph.shards.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        total += float(pa.compute.sum(pa.table(b).column("intra")).as_py() or 0.0)
    return total


def _m2(graph: GraphHandle, m_mode: str) -> float:
    """2m for the modularity/gain formulas.

    - "count" (default): 2 * edge COUNT — the reference's quirk
      (`community.cpp:51` uses `g.ecount`, an entry count, not the weight
      sum; required for golden parity);
    - "weight": the standard Louvain 2m = total entry weight (use for
      weighted graphs where the count quirk distorts the scale).
    For unit-weight level-0 graphs the two are identical.
    """
    return 2.0 * graph.m if m_mode == "count" else graph.total_weight


def modularity(graph: GraphHandle, assign: np.ndarray, m_mode: str = "count") -> float:
    """Q = intra/2m - sum_{tot_c>0} (tot_c/2m)^2  (`community.cpp:49-60`)."""
    m2 = _m2(graph, m_mode)
    deg = graph.degrees()
    tot = np.bincount(assign, weights=deg, minlength=graph.n)
    assign_ref = ray.put(assign)
    intra = intra_community_weight(graph, assign_ref)
    nz = tot > 0
    return intra / m2 - float(((tot[nz] / m2) ** 2).sum())


def coarsen(
    graph: GraphHandle, assign: np.ndarray
) -> tuple[GraphHandle, np.ndarray]:
    """Contract communities: entries grouped by (comm[src], comm[dst]) with
    weights summed — including self-loops (`community.cpp:181-191`).
    Deterministic dense renumbering by sorted old community id.
    Returns (coarse graph, old vid -> new community id)."""
    old = np.unique(assign)
    dense = np.searchsorted(old, assign).astype(np.int64)
    ncomms = int(old.shape[0])
    dense_ref = ray.put(dense)

    def contract(batch: pa.Table) -> pa.Table:
        d = ray.get(dense_ref)
        keys, ws = [], []
        for shard in unpack_shards(batch):
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            key = d[src] * np.int64(ncomms) + d[shard.cols]
            uk, inv = np.unique(key, return_inverse=True)
            wsum = np.zeros(uk.shape[0], dtype=np.float64)
            np.add.at(wsum, inv, shard.weights)
            keys.append(uk)
            ws.append(wsum)
        k = np.concatenate(keys) if keys else np.empty(0, np.int64)
        w = np.concatenate(ws) if ws else np.empty(0, np.float64)
        return pa.table(
            {
                "src": (k // ncomms).astype(np.int64),
                "dst": (k % ncomms).astype(np.int64),
                "weight": w,
            }
        )

    coarse_entries = (
        graph.shards.map_batches(contract, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .sum("weight")
        .map_batches(
            lambda b: b.rename_columns(["src", "dst", "weight"]),
            batch_format="pyarrow",
        )
    )
    coarse = build_graph(
        coarse_entries,
        graph.config,
        already_symmetrized=True,
        n_vertices=ncomms,
    )
    return coarse, dense


# ---------------------------------------------------------------------------
# level + multi-level drivers
# ---------------------------------------------------------------------------


@dataclass
class LevelMetrics:
    level: int
    n_vertices: int
    m: int
    sweeps: int = 0
    moves: int = 0
    modularity_before: float = 0.0
    modularity_after: float = 0.0
    n_communities: int = 0


@dataclass
class LouvainResult:
    assignments: np.ndarray  # original vid -> final community (canonical)
    modularity: float
    levels: list[LevelMetrics] = field(default_factory=list)


def louvain_level(
    graph: GraphHandle,
    config: EngineConfig | None = None,
    tie_break: str = "canonical",
    on_sweep=None,
    start_assign: np.ndarray | None = None,
    start_sweep: int = 0,
    m_mode: str = "count",
    prior_improved: bool = False,
) -> tuple[np.ndarray, bool, LevelMetrics]:
    """One Louvain level (the reference's `iterate()`,
    `community.cpp:64-102`): BSP sweeps until 0 moves. Returns
    (assignments, improved, metrics). `on_sweep(sweep_idx, assign, moves)`
    is the checkpoint hook."""
    cfg = config or graph.config or DEFAULT_CONFIG
    n = graph.n
    deg = graph.degrees()
    assign = (
        start_assign.copy()
        if start_assign is not None
        else np.arange(n, dtype=np.int64)
    )
    metrics = LevelMetrics(level=-1, n_vertices=n, m=graph.m)
    metrics.modularity_before = modularity(graph, assign, m_mode)
    improved = prior_improved
    best_q = metrics.modularity_before
    best_assign = assign.copy()
    stall = 0
    prev_moves = np.iinfo(np.int64).max
    for sweep in range(start_sweep, cfg.max_sweeps):
        tot = np.bincount(assign, weights=deg, minlength=n)
        csize_ref = (
            ray.put(np.bincount(assign, minlength=n))
            if tie_break == "canonical"
            else None
        )
        cv, cc, moves = _sweep_pass(
            graph,
            ray.put(assign),
            ray.put(tot),
            tie_break,
            _m2(graph, m_mode),
            csize_ref=csize_ref,
        )
        if moves:
            assign[cv] = cc
            improved = True
        metrics.sweeps += 1
        metrics.moves += moves
        if on_sweep is not None:
            on_sweep(sweep, assign, moves)
        if moves == 0:
            break
        # Oscillation guard (P>1 only; at P=1 the kernel is exactly the
        # sequential algorithm and terminates via moves==0). Tracks the
        # BEST modularity seen — an up/down 2-cycle never beats its own
        # peak, so it stalls out; on abort the best snapshot is restored.
        # The (exact, one-pass) modularity check only runs when the move
        # count stops strictly decreasing — while moves shrink the sweep is
        # converging and the extra pass would be pure overhead.
        if moves >= prev_moves:
            q = modularity(graph, assign, m_mode)
            if q > best_q + cfg.stall_eps:
                best_q = q
                best_assign = assign.copy()
                stall = 0
            else:
                stall += 1
                if stall >= cfg.stall_sweeps:
                    assign = best_assign
                    break
        else:
            best_assign = assign.copy()
            stall = 0
        prev_moves = moves
    metrics.modularity_after = modularity(graph, assign, m_mode)
    metrics.n_communities = int(np.unique(assign).shape[0])
    return assign, improved, metrics


def canonicalize_labels(labels: np.ndarray) -> np.ndarray:
    """Relabel communities densely in order of their smallest member vid —
    the tie-break canonicalization BASELINE.json licenses for comparing
    against the reference."""
    _, first_idx, inv = np.unique(labels, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.shape[0])
    return rank[inv]


def louvain(
    edges: ray.data.Dataset | GraphHandle,
    config: EngineConfig | None = None,
    tie_break: str = "canonical",
    checkpointer=None,
    m_mode: str = "count",
) -> LouvainResult:
    """Multi-level Louvain: (level sweeps -> coarsen) until a level makes no
    move. Assignment composition across levels is maintained driver-side.

    The reported `modularity` is computed on the ORIGINAL (level-0) graph
    under the composed assignments — per-level Q values (in `levels`) use
    each level's own `m` (reference ecount semantics, `community.cpp:51`)
    and are NOT comparable across levels: the count-m quirk plus the
    reference's self-loop-free `in` make coarse-level Q a different scale.
    """
    cfg = config or DEFAULT_CONFIG
    graph = (
        edges
        if isinstance(edges, GraphHandle)
        else build_graph(edges, cfg)
    )
    graph0 = graph
    membership = np.arange(graph.n, dtype=np.int64)
    levels: list[LevelMetrics] = []
    final_q = 0.0
    start_level, start_sweep, start_assign = 0, 0, None
    resumed_improved = False
    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            (graph, membership, levels, start_level, start_sweep,
             start_assign, resumed_improved) = resumed
            if start_level > 0:
                graph0 = checkpointer.load_level_graph(0) or graph
            else:
                graph0 = graph
    for level in range(start_level, cfg.max_levels):
        on_sweep = None
        if checkpointer is not None:
            checkpointer.begin_level(level, graph, membership)
            on_sweep = lambda s, a, mv: checkpointer.on_sweep(level, s, a, mv)
        assign, improved, metrics = louvain_level(
            graph,
            cfg,
            tie_break,
            on_sweep=on_sweep,
            start_assign=start_assign if level == start_level else None,
            start_sweep=start_sweep if level == start_level else 0,
            m_mode=m_mode,
            prior_improved=resumed_improved if level == start_level else False,
        )
        metrics.level = level
        if not improved and level > 0:
            # no moves: keep the previous level's converged modularity —
            # per-level Q is relative to that level's m (reference ecount
            # semantics), so an unimproved coarse level's singleton Q is
            # not the result
            break
        coarse, dense = coarsen(graph, assign)
        membership = dense[membership]
        levels.append(metrics)
        final_q = metrics.modularity_after
        if not improved:
            break
        graph = coarse
    return LouvainResult(
        assignments=canonicalize_labels(membership),
        modularity=modularity(graph0, membership, m_mode),
        levels=levels,
    )
