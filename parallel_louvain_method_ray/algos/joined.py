"""Ghost-restricted (join-based) iterative algorithms — SURVEY §4.3.

The broadcast engine (louvain.py / pagerank.py / components.py / lpa.py)
ships one dense O(V) state array per sweep via ray.put and keeps another
on the driver. At web scale (10^12 pages) V alone is terabytes, so this
module re-expresses every iterative algorithm with ALL state resident in
Datasets; per-round cross-partition exchange is the `edges ⋈ state(dst)`
hash join plus groupby-aggregates — the Ray-Data translation of the
reference's ghost machinery (`/root/reference/src/distcommunity.cpp:37-128,
387-545`: DegreeInfo/CommunityUpdate/CommunityInfo messages all dissolve
into these shuffles). The driver holds only scalars (move counts, deltas,
modularity) and O(num_blocks) offsets.

Louvain semantics here are the PURE-JACOBI sweep: every decision is made
against the sweep-start snapshot (assignments + community totals), with
the same gain formula, keep-on-tie / min-comm-id tie-break and
singleton-swap guard as `chunked_local_move_sweep` run as a single chunk.
`louvain_jacobi_numpy` below is that exact kernel loop in numpy; the
Dataset pipeline is tested BIT-FOR-BIT against it on P>1 fixtures
(integer-weight graphs: all float sums are exact, so groupby-Sum order
cannot perturb gains; on arbitrary float weights parity holds to the
last ulp of the sum order).

Since r5, every per-round exchange in this module runs on the
hash-partitioned BSP pools (state/spmv_pool.py, state/peel_pool.py):
vertex state lives sharded by vid % P on P actors and a round is 2-4
RPC waves of tiny pre-combined partial tables, replacing the per-round
join + groupby pipelines whose operator fixed cost (~1-2 s per join
execution, per-key Python combine in the sort-based groupby) dominated
at every scale. The Dataset plumbing below remains for the per-LEVEL
steps (coarsen, modularity, membership composition) where one join per
level is the right tool. Driver state stays O(P) scalars per round —
the tier's contract; the broadcast path remains the default below
`EngineConfig.max_broadcast_vertices`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from parallel_louvain_method_ray.algos._local_move import chunked_local_move_sweep
from parallel_louvain_method_ray.graph.build import join_partitions


# ---------------------------------------------------------------------------
# dataset plumbing helpers
# ---------------------------------------------------------------------------


def _blockwise(ds: ray.data.Dataset, fn) -> ray.data.Dataset:
    """map_batches for per-block ops that PRESERVE row counts (rename,
    select, add/scale columns — not filters): the `_plm_tight` no-empty-
    blocks marker rides along, so a tight loop-state dataset stays tight
    through the per-round column plumbing and `_join` skips its
    materialize+compact pass on it."""
    out = ds.map_batches(fn, batch_format="pyarrow")
    if getattr(ds, "_plm_tight", False):
        out._plm_tight = True
    return out


def _rename(ds: ray.data.Dataset, names: list[str]) -> ray.data.Dataset:
    return _blockwise(ds, lambda b, _n=tuple(names): b.rename_columns(list(_n)))


def _select(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    return _blockwise(ds, lambda b, _c=tuple(cols): b.select(list(_c)))


def _filter(ds: ray.data.Dataset, fn) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b, _f=fn: b.filter(_f(b)), batch_format="pyarrow"
    )


def _scalar_sum(ds: ray.data.Dataset, col: str) -> float:
    out = ds.aggregate(Sum(col))
    return float(out[f"sum({col})"] or 0.0)


def _seeded(ds: ray.data.Dataset, **sentinel_row) -> ray.data.Dataset:
    """Union with a single SENTINEL row (key = -1, impossible for real
    vids/comms): Ray's hash join errors when one side contributes zero
    rows (the empty side materializes schema-less); one unmatched row
    keeps the join well-formed and falls out of inner/left joins.
    (Used by algos/linkpred.py's wedge joins.)"""
    seed = ray.data.from_arrow(
        pa.table({k: pa.array([v], None) for k, v in sentinel_row.items()})
    )
    return ds.union(seed)


def _tight(ds: ray.data.Dataset, P: int) -> ray.data.Dataset:
    """Materialize + repartition to min(P, rows) NONEMPTY blocks.

    Ray 2.49's hash-join aggregator mishandles operands whose block list
    contains several empty blocks (the empty partition builds a
    schema-less table and pyarrow's Table.join raises ArrowInvalid).
    Filter- and aggregate-derived datasets routinely carry empty blocks,
    so every join operand in this module is compacted first. Blocks after
    an even repartition(nb<=rows) are all nonempty. Results are memoized
    (marker attribute) so a dataset joined several times per sweep is
    compacted once."""
    if getattr(ds, "_plm_tight", False):
        return ds
    ds = ds.materialize()
    # block-level row counts from the materialized bundles' METADATA (no
    # block fetch): when every block is already nonempty the repartition
    # pass (a second full materialization) is skipped entirely
    sizes: list[int] | None = []
    try:
        for rb in ds.iter_internal_ref_bundles():
            for _, meta in rb.blocks:
                if meta.num_rows is None:
                    raise ValueError("no row metadata")
                sizes.append(meta.num_rows)
    except Exception:
        sizes = None
    if sizes is not None:
        rows = sum(sizes)
        if sizes and all(s > 0 for s in sizes):
            ds._plm_tight = True
            return ds
    else:
        rows = ds.count()
    nb = max(1, min(P, rows))
    out = ds.repartition(nb).materialize()
    out._plm_tight = True
    return out


def _join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple,
    right_on: tuple | None = None,
    how: str = "inner",
    P: int | None = None,
) -> ray.data.Dataset:
    """Hash join with BOTH operands compacted via _tight (operands whose
    block lists contain empty blocks crash Ray 2.49's join finalize)."""
    P = join_partitions(P)
    return _tight(left, P).join(
        _tight(right, P),
        join_type=how,
        num_partitions=P,
        on=on,
        right_on=right_on,
    )


def _collect(ds: ray.data.Dataset) -> pa.Table:
    parts = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else pa.table({})


# ---------------------------------------------------------------------------
# the dataset-resident graph
# ---------------------------------------------------------------------------


@dataclass
class JoinedGraph:
    """Graph state as Datasets only — no dense driver arrays.

    edges: symmetrized, triple-deduped entries (src, dst, weight),
    materialized once. degrees: (vid, deg) for EVERY vid 0..n-1 (zero for
    isolated). m = n_entries // 2 (reference sparsify semantics,
    `/root/reference/src/graph.cpp:62`). P: the SIZE-AWARE join fan-out
    every per-round pipeline over this graph defaults to — tiny graphs
    (coarse Louvain levels, test fixtures) get 1-2 join partitions instead
    of cpus//2, because each hash-join execution spins up P aggregator
    actors and at small working sets that spin-up IS the round cost."""

    edges: ray.data.Dataset
    degrees: ray.data.Dataset
    n: int
    m: int
    n_entries: int
    total_weight: float
    max_out_degree: int = 0  # max per-src entry count (hub detector)
    P: int = 0  # size-aware default join fan-out (0 = unset, use cap)


# target CSR entries per join partition: below this, extra join aggregator
# actors cost more in spin-up than they save in parallelism
_ROWS_PER_JOIN_PARTITION = 262_144


def _size_aware_P(rows: int, partitions: int | None = None) -> int:
    cap = join_partitions(partitions)
    if partitions is not None:
        return cap
    return max(1, min(cap, (rows // _ROWS_PER_JOIN_PARTITION) + 1))


def _jg_P(jg: JoinedGraph, partitions: int | None) -> int:
    """Per-call fan-out: explicit override > the graph's size-aware P."""
    if partitions is not None:
        return partitions
    return jg.P or join_partitions(None)


def joined_graph_from_entries(
    entries: ray.data.Dataset, n: int, partitions: int | None = None
) -> JoinedGraph:
    """`entries` must already be symmetrized + deduped with dense vids
    0..n-1 (what `build_graph` feeds its CSR pack).

    Metadata (n_entries, total_weight, max out-degree) and the dense degree
    table all come out of ONE per-block partial-aggregate + ONE groupby +
    ONE scalar aggregate — the naive shape (count, degree groupby, weight
    sum, count groupby, max aggregate as five separate executions) spent
    ~25 s of pure executor/actor spin-up on a 100-vertex graph."""
    mat = entries.materialize()
    rows = mat.count()  # metadata-only on a materialized dataset
    P = _size_aware_P(rows, partitions)
    edges = _tight(mat, max(P, 2))

    def partials(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        return pa.table(
            {
                "vid": uniq.astype(np.int64),
                "cnt": np.bincount(inv).astype(np.int64),
                "wsum": np.bincount(inv, weights=w.astype(np.float64)),
            }
        )

    zeros = ray.data.range(n, override_num_blocks=P).map_batches(
        lambda b: pa.table(
            {
                "vid": b.column("id"),
                "cnt": np.zeros(b.num_rows, dtype=np.int64),
                "wsum": np.zeros(b.num_rows, dtype=np.float64),
            }
        ),
        batch_format="pyarrow",
    )
    persrc = _tight(
        _rename(
            edges.map_batches(partials, batch_format="pyarrow")
            .union(zeros)
            .groupby("vid")
            .aggregate(Sum("cnt"), Sum("wsum")),
            ["vid", "cnt", "deg"],
        ),
        P,
    )
    from ray.data.aggregate import Max

    scal = persrc.aggregate(Sum("cnt"), Max("cnt"), Sum("deg"))
    n_entries = int(scal.get("sum(cnt)") or 0)
    max_out = int(scal.get("max(cnt)") or 0)
    total_weight = float(scal.get("sum(deg)") or 0.0)
    deg_all = _tight(persrc.select_columns(["vid", "deg"]), P)
    return JoinedGraph(
        edges=edges,
        degrees=deg_all,
        n=n,
        m=n_entries // 2,
        n_entries=n_entries,
        total_weight=total_weight,
        max_out_degree=max_out,
        P=P,
    )


def joined_graph_from_handle(graph) -> JoinedGraph:
    """Flatten a GraphHandle's CSR shards back to an entry Dataset (for
    tests / queries that already built the dense graph)."""
    from parallel_louvain_method_ray.graph.csr import shard_to_entries, unpack_shards

    def expand(batch: pa.Table) -> pa.Table:
        out = []
        for shard in unpack_shards(batch):
            s, d, w = shard_to_entries(shard)
            out.append(pa.table({"src": s, "dst": d, "weight": w}))
        return (
            pa.concat_tables(out)
            if out
            else pa.table(
                {
                    "src": np.empty(0, np.int64),
                    "dst": np.empty(0, np.int64),
                    "weight": np.empty(0, np.float64),
                }
            )
        )

    entries = graph.shards.map_batches(expand, batch_format="pyarrow")
    return joined_graph_from_entries(entries, graph.n)


def singleton_assignment(jg: JoinedGraph) -> ray.data.Dataset:
    """(vid, comm=vid) — reference init (`src/community.cpp:16-30`)."""
    P = _jg_P(jg, None)
    return _tight(
        _rename(
            ray.data.range(jg.n, override_num_blocks=P).map_batches(
                lambda b: pa.table({"vid": b.column("id"), "comm": b.column("id")}),
                batch_format="pyarrow",
            ),
            ["vid", "comm"],
        ),
        P,
    )


# ---------------------------------------------------------------------------
# Louvain: one pure-Jacobi sweep as a join/groupby pipeline
# ---------------------------------------------------------------------------


def louvain_sweep_joined(
    jg: JoinedGraph,
    assign: ray.data.Dataset,
    m2: float,
    partitions: int | None = None,
    hub_salts: int | None = None,
) -> tuple[ray.data.Dataset, int]:
    """One synchronous local-move sweep; returns (assign', moves).

    Exactly `chunked_local_move_sweep(chunk=n)` — snapshot community
    stats, neighbor-community weights k_{v,c} (self-loops excluded,
    `src/community.cpp:134`), gain = kw - tot_c * (dv / m2) argmax with
    the min-comm tie-break, remove-before-gain own threshold and the
    singleton-swap guard.

    Implementation: the BSP SpMV pool (`state.spmv_pool.LouvainLevel`) —
    assignment/degree vectors sharded by vid % P, one sweep = a stats
    wave + a neighbor-weight wave (concurrent) + a distinct-comm stats
    gather + a local decide. The all-Dataset version (5+ shuffles per
    sweep) cost ~2 s/sweep at sf0.01 in operator fixed cost. `hub_salts`
    is accepted for API compatibility: per-(src, comm) partials are
    pre-combined on each partition before the exchange, so hub skew
    needs no salting pass."""
    del hub_salts
    from parallel_louvain_method_ray.state.spmv_pool import LouvainLevel

    lvl = LouvainLevel(jg.edges, jg.n, partitions=partitions)
    try:
        lvl.load_assign(assign)
        moves = lvl.sweep(m2)
        out = lvl.assign_dataset() if moves else assign
    finally:
        lvl.shutdown()
    return out, moves


def modularity_joined(
    jg: JoinedGraph,
    assign: ray.data.Dataset,
    m2: float,
    partitions: int | None = None,
) -> float:
    """Q = intra/m2 - Σ (tot_c/m2)^2 over comms with tot > 0
    (`src/community.cpp:49-60`), all as joins/aggregates."""
    if m2 <= 0:
        return 0.0
    P = _jg_P(jg, partitions)
    a_src = _rename(assign, ["vid", "c_src"])
    a_dst = _rename(assign, ["vid", "c_dst"])
    both = _join(
        _join(
            _filter(
                jg.edges,
                lambda b: pc.invert(pc.equal(b.column("src"), b.column("dst"))),
            ),
            a_src, on=("src",), right_on=("vid",), P=P,
        ),
        a_dst, on=("dst",), right_on=("vid",), P=P,
    )
    intra_ds = _filter(
        both, lambda b: pc.equal(b.column("c_src"), b.column("c_dst"))
    )
    intra = _scalar_sum(intra_ds, "weight")
    ad = _join(assign, jg.degrees, on=("vid",), P=P)
    tot = _rename(ad.groupby("comm").sum("deg"), ["comm", "tot"])

    # Σ tot² summed RAW and divided by m2² once: for integer-weight graphs
    # every tot² is an exact float (< 2^53) so the distributed sum is
    # order-independent — block order (partition count) cannot perturb Q,
    # keeping the bit-parity contract with `louvain_jacobi_numpy`.
    def sq(batch: pa.Table) -> pa.Table:
        t = batch.column("tot").to_numpy(zero_copy_only=False)
        t = t[t > 0]
        return pa.table({"term": t * t})

    sq_sum = _scalar_sum(tot.map_batches(sq, batch_format="pyarrow"), "term")
    return intra / m2 - sq_sum / (m2 * m2)


def coarsen_joined(
    jg: JoinedGraph,
    assign: ray.data.Dataset,
    partitions: int | None = None,
) -> tuple[JoinedGraph, ray.data.Dataset]:
    """Contract communities (`src/community.cpp:162-201` mapping): new
    entries = groupby(comm_src, comm_dst).sum(weight); dense renumber by
    sorted old comm id via the scale-path ranking (no driver id set).
    Returns (coarse JoinedGraph, comm_map Dataset (comm, new_id))."""
    from parallel_louvain_method_ray.graph.build import assign_dense_ids

    P = _jg_P(jg, partitions)
    distinct = assign.groupby("comm").count().select_columns(["comm"]).materialize()
    ncomms = distinct.count()
    comm_map = assign_dense_ids(distinct, "comm").materialize()  # (comm, vid=new)
    comm_map = _rename(comm_map, ["comm", "new_id"])

    a_new = _join(assign, comm_map, on=("comm",), P=P).select_columns(
        ["vid", "new_id"]
    )
    a_new = _tight(a_new, P)
    a_src = _rename(a_new, ["vid", "c_src"])
    a_dst = _rename(a_new, ["vid", "c_dst"])
    ce = (
        _join(
            _join(jg.edges, a_src, on=("src",), right_on=("vid",), P=P),
            a_dst, on=("dst",), right_on=("vid",), P=P,
        )
        .groupby(["c_src", "c_dst"])
        .sum("weight")
    )
    ce = _rename(ce, ["src", "dst", "weight"])
    coarse = joined_graph_from_entries(ce, ncomms, partitions)
    return coarse, comm_map


def louvain_joined(
    jg: JoinedGraph,
    max_sweeps: int = 64,
    max_levels: int = 32,
    m_mode: str = "count",
    partitions: int | None = None,
    hub_degree_threshold: int | None = 100_000,
) -> tuple[ray.data.Dataset, float, list[dict]]:
    """Multi-level pure-Jacobi Louvain, all state in Datasets. Returns
    (membership Dataset (vid, comm) over ORIGINAL vids with canonical-ish
    dense labels, final Q on the original graph, per-level info).

    `louvain_jacobi_numpy` is the bit-parity reference for this loop.
    Sweeps run on one BSP SpMV pool per level (state/spmv_pool.py);
    `hub_degree_threshold` is accepted for API compatibility — the
    pool's pre-combined per-(src, comm) partials make salting moot."""
    del hub_degree_threshold
    jg0 = jg
    membership = singleton_assignment(jg)  # (vid, comm) comm in current level space
    levels: list[dict] = []
    for level in range(max_levels):
        # per-level fan-out: coarse levels shrink, so does their join P
        P = _jg_P(jg, partitions)
        m2 = 2.0 * jg.m if m_mode == "count" else jg.total_weight
        # one BSP pool per level: the assignment stays sharded on the
        # actors across sweeps (singleton init is the pool's index vec),
        # and only the converged level result is collected to a Dataset
        # for the coarsen join. hub_degree_threshold is moot here: the
        # pool pre-combines per-(src, comm) partials on each partition.
        from parallel_louvain_method_ray.state.spmv_pool import LouvainLevel

        lvl_pool = LouvainLevel(jg.edges, jg.n, partitions=P)
        sweeps = 0
        total_moves = 0
        try:
            for _ in range(max_sweeps):
                moves = lvl_pool.sweep(m2)
                sweeps += 1
                total_moves += moves
                if moves == 0:
                    break
            assign = lvl_pool.assign_dataset()
        finally:
            lvl_pool.shutdown()
        improved = total_moves > 0
        if not improved and level > 0:
            break
        coarse, comm_map = coarsen_joined(jg, assign, P)
        # membership: orig vid -> level comm; compose with assign then map
        membership = _join(
            membership,
            _rename(assign, ["lvl_vid", "lvl_comm"]),
            on=("comm",),
            right_on=("lvl_vid",),
            P=P,
        ).select_columns(["vid", "lvl_comm"])
        membership = _join(
            membership,
            _rename(comm_map, ["lvl_comm", "new_id"]),
            on=("lvl_comm",),
            P=P,
        ).select_columns(["vid", "new_id"])
        membership = _tight(_rename(membership, ["vid", "comm"]), P)
        levels.append(
            {"level": level, "n": jg.n, "m": jg.m, "sweeps": sweeps,
             "moves": total_moves}
        )
        if not improved:
            break
        jg = coarse
    m2_0 = 2.0 * jg0.m if m_mode == "count" else jg0.total_weight
    q = modularity_joined(jg0, membership, m2_0, P)
    return membership, q, levels


def louvain_jacobi_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    max_sweeps: int = 64,
    max_levels: int = 32,
    m_mode: str = "count",
) -> tuple[np.ndarray, float]:
    """Driver-side reference with IDENTICAL semantics to louvain_joined
    (pure-Jacobi sweeps from fresh per-sweep stats, sorted-comm coarsen).
    Input: symmetrized deduped entries. Returns (membership, Q)."""
    membership = np.arange(n, dtype=np.int64)
    src0, dst0, w0 = src, dst, w
    n0 = n
    for level in range(max_levels):
        m = src.shape[0] // 2
        m2 = 2.0 * m if m_mode == "count" else float(w.sum())
        order = np.lexsort((w, dst, src))
        src, dst, w = src[order], dst[order], w[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(src, minlength=n), out=indptr[1:])
        deg = np.bincount(src, weights=w, minlength=n)
        assign = np.arange(n, dtype=np.int64)
        total_moves = 0
        for _ in range(max_sweeps):
            tot = np.bincount(assign, weights=deg, minlength=n)
            csize = np.bincount(assign, minlength=n)
            moves = chunked_local_move_sweep(
                np.arange(n, dtype=np.int64), indptr, dst, w,
                assign, tot, deg, m2, csize=csize, chunk=n,
            )
            total_moves += moves
            if moves == 0:
                break
        improved = total_moves > 0
        if not improved and level > 0:
            break
        old = np.unique(assign)
        dense = np.searchsorted(old, assign).astype(np.int64)
        ncomms = int(old.shape[0])
        key = dense[src] * np.int64(ncomms) + dense[dst]
        uk, inv = np.unique(key, return_inverse=True)
        wsum = np.zeros(uk.shape[0], dtype=np.float64)
        np.add.at(wsum, inv, w)
        membership = dense[membership]
        if not improved:
            break
        src = (uk // ncomms).astype(np.int64)
        dst = (uk % ncomms).astype(np.int64)
        w = wsum
        n = ncomms
    m2_0 = 2.0 * (src0.shape[0] // 2) if m_mode == "count" else float(w0.sum())
    if m2_0 <= 0:
        return membership, 0.0
    mask = (src0 != dst0) & (membership[src0] == membership[dst0])
    intra = float(w0[mask].sum())
    tot0 = np.bincount(membership, weights=np.bincount(src0, weights=w0, minlength=n0), minlength=n0)
    nz = tot0 > 0
    # raw Σ tot², one division — same order-independent form as
    # modularity_joined (bit-parity contract)
    q = intra / m2_0 - float((tot0[nz] * tot0[nz]).sum()) / (m2_0 * m2_0)
    return membership, q


# ---------------------------------------------------------------------------
# PageRank / CC / LPA on the join path
# ---------------------------------------------------------------------------


def pagerank_joined(
    jg: JoinedGraph,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 100,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Power iteration with ranks as a Dataset. Same published semantics
    as `pagerank` (damping, uniform init, dangling mass redistributed).

    The loop state is (vid, deg, rank) — the per-vertex degree rides INSIDE
    the state dataset, so each iteration is exactly two joins (scaled-state
    ⋈ edges for the contribution shuffle, state ⟕ incoming for the update)
    instead of three: the old per-iteration ranks ⋈ degrees join was ~1/3
    of the round's fixed cost and carried no information the state can't.

    Fixed-cost trims: with `tol <= 0` (fixed-iteration mode — what the
    unrolled SQL oracle runs) the per-iteration L1-delta pass is skipped
    entirely, and the per-iteration dangling-mass aggregate is skipped
    when the graph has no dangling vertices (counted ONCE and cached on
    the JoinedGraph) — together 2 of the 5 dataset executions per round."""
    from parallel_louvain_method_ray.state.spmv_pool import (
        pagerank_partitioned,
    )

    # BSP SpMV pool implementation (state/spmv_pool.py): ranks sharded by
    # vid % P, one exchange wave per iteration, scale/dangling/update all
    # local — the per-iteration joins and groupby above are gone (they
    # cost ~2 s/iter of operator fixed cost at sf0.01, VERDICT r4 #7
    # family). Driver per round: summing 2P floats.
    return pagerank_partitioned(
        jg.edges,
        jg.n,
        damping=damping,
        tol=tol,
        max_iter=max_iter,
        weight_col="weight",
        partitions=partitions,
    )


def connected_components_joined(
    jg: JoinedGraph,
    max_rounds: int = 200,
    partitions: int | None = None,
    pointer_doubling_after: int | None = 2,
) -> tuple[ray.data.Dataset, dict]:
    """Min-label propagation, labels as a Dataset (vid, label); exact.

    `pointer_doubling_after`: from that round on, each neighbor-min round
    is followed by a pointer-jump `label <- label(label)` (labels are vids,
    so the label table doubles as the jump lookup) — total rounds drop
    from O(diameter) to O(log diameter) on high-diameter graphs (the 100 TB
    regime's defense against chain-shaped components). Low-diameter graphs
    converge before the threshold and never pay for the extra join. None
    disables. Converged labels are identical either way (min vid per
    component); only the round count differs."""
    from parallel_louvain_method_ray.state.spmv_pool import cc_partitioned

    # BSP SpMV pool implementation (state/spmv_pool.py): labels sharded
    # by vid % P across P actors, one neighbor-min exchange wave per
    # round, pointer jumps as a 3-wave distinct-label gather. The r4
    # all-Dataset version (join + groupby + left_outer merge PER ROUND,
    # plus a self-join per jump) was ~15 s at sf0.01 in operator fixed
    # cost (VERDICT r4 #7 family); driver state stays O(P) scalars.
    return cc_partitioned(
        jg.edges,
        jg.n,
        max_rounds=max_rounds,
        partitions=partitions,
        pointer_doubling_after=pointer_doubling_after,
    )


def bfs_joined(
    jg: JoinedGraph,
    seeds,
    max_rounds: int = 200,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Multi-source BFS, distances as a Dataset (vid, dist); exact.

    Same min-plus loop as `connected_components_joined` with the
    relaxation `dist(v) <- min(dist(v), min_u dist(u) + 1)`; rounds =
    graph eccentricity from the seed set (no local fixpoint like the
    broadcast engine, so high-diameter graphs prefer `algos/bfs.py`
    below `max_broadcast_vertices`). Unreachable vertices keep the INF
    sentinel dist == n."""
    from parallel_louvain_method_ray.state.spmv_pool import bfs_partitioned

    # BSP SpMV pool implementation (state/spmv_pool.py): min-plus waves
    # with +1 hops and the int64 INF==n sentinel; see
    # connected_components_joined for the rationale.
    return bfs_partitioned(
        jg.edges,
        jg.n,
        seeds,
        max_rounds=max_rounds,
        partitions=partitions,
    )


def katz_joined(
    jg: JoinedGraph,
    alpha: float = 0.005,
    beta: float = 1.0,
    iters: int = 5,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Katz centrality with the score vector as a Dataset (vid, katz) —
    the beyond-broadcast tier of `algos.pagerank.katz_centrality` (same
    truncated power series x_k = alpha * A^T x_{k-1} + beta).

    Implementation: the hash-partitioned BSP SpMV pool
    (`state.spmv_pool.katz_partitioned`) — the score vector lives
    sharded by vid % P across P actors, one iteration = one
    partial-sum exchange wave plus a local affine update. The r4
    all-Dataset version (contribution join + groupby + left_outer
    merge PER ITERATION) spent seconds of operator fixed cost per
    round (VERDICT r4 #7); this one still moves no O(V) data through
    the driver (the tier's contract). See state/spmv_pool.py for the
    partitioning assumption."""
    from parallel_louvain_method_ray.state.spmv_pool import katz_partitioned

    out, info = katz_partitioned(
        jg.edges,
        jg.n,
        alpha=alpha,
        beta=beta,
        iters=iters,
        weight_col="weight",
        partitions=partitions,
    )
    return out, info


def sssp_joined(
    jg: JoinedGraph,
    seeds,
    hops: int,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Hop-bounded weighted shortest paths with dists as a Dataset —
    the beyond-broadcast tier of `algos.bfs.sssp_hops` (exact Bellman-Ford
    semantics: dist after round r = cheapest path using AT MOST r edges;
    exactly one Jacobi relaxation per round). Unreachable keeps +inf."""
    from parallel_louvain_method_ray.state.spmv_pool import sssp_partitioned

    # BSP SpMV pool implementation (state/spmv_pool.py): one synchronous
    # min-plus exchange wave per Bellman-Ford round; see
    # connected_components_joined for the rationale vs the r4
    # all-Dataset per-round join pipeline.
    return sssp_partitioned(
        jg.edges,
        jg.n,
        seeds,
        hops=hops,
        weight_col="weight",
        partitions=partitions,
    )


def hits_joined(
    edges: ray.data.Dataset,
    n: int,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """HITS with hub/authority vectors as Datasets — the beyond-broadcast
    tier of `algos.hits.hits` (same fixed-iteration L1-normalized
    half-steps over the DIRECTED edge table). Returns one Dataset
    (vid, hub, authority) over vids 0..n-1.

    Implementation: the hash-partitioned BSP SpMV pool
    (`state.spmv_pool.hits_partitioned`) — hub/authority vectors live
    sharded by vid % P across P actors; a half-step is one partial-sum
    exchange wave with L1 normalization folded into the next wave's
    input scale. The r4 all-Dataset version (join + groupby +
    left_outer universe merge PER HALF-STEP) cost ~31 s for 3
    iterations at sf0.01 in pure operator fixed cost (VERDICT r4 #7);
    this one still moves no O(V) data through the driver (the tier's
    contract). See state/spmv_pool.py for the partitioning assumption."""
    if iters < 1:
        raise ValueError(f"hits_joined: iters must be >= 1, got {iters}")
    from parallel_louvain_method_ray.state.spmv_pool import hits_partitioned

    return hits_partitioned(
        edges,
        n,
        iters=iters,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
        partitions=partitions,
    )


def label_propagation_joined(
    jg: JoinedGraph,
    max_sweeps: int = 25,
    partitions: int | None = None,
    hub_degree_threshold: int | None = 100_000,
) -> tuple[ray.data.Dataset, dict]:
    """Label propagation, labels as a Dataset (vid, label) — the
    beyond-broadcast tier of `algos.lpa.label_propagation` (singleton
    init; synchronous sweeps; adopt the max-incident-weight neighbor
    label, keep current unless strictly better or tied with a smaller
    label; self-loops ignored).

    Implementation: the BSP SpMV pool (`state.spmv_pool.lpa_partitioned`)
    — labels sharded by vid % P, one sweep = one exchange wave of
    per-(src, label) weight partials pre-combined on each source
    partition. That pre-combine is also the hub defense the all-Dataset
    version needed `hub_salts` for (a hub's per-label sums arrive
    aggregated per partition), so `hub_degree_threshold` is accepted for
    API compatibility but no salting pass exists to arm."""
    del hub_degree_threshold  # pre-combined partials need no salting
    from parallel_louvain_method_ray.state.spmv_pool import lpa_partitioned

    return lpa_partitioned(
        jg.edges,
        jg.n,
        max_sweeps=max_sweeps,
        weight_col="weight",
        partitions=partitions,
    )


# ---------------------------------------------------------------------------
# routing
# ---------------------------------------------------------------------------


def louvain_auto(
    edges: ray.data.Dataset,
    n: int,
    config=None,
) -> tuple[ray.data.Dataset, float, list]:
    """Route Louvain by vertex count: the broadcast engine (fast, O(V)
    driver state) below `config.max_broadcast_vertices`, the join path
    (all-Dataset state) above. Returns (membership Dataset (vid, comm),
    final Q, per-level info) either way. `edges` is a RAW (un-symmetrized)
    edge table with dense vids."""
    from parallel_louvain_method_ray.config import DEFAULT_CONFIG
    from parallel_louvain_method_ray.graph.build import (
        build_graph,
        dedup_entries,
        symmetrize,
    )

    cfg = config or DEFAULT_CONFIG
    if n <= cfg.max_broadcast_vertices:
        from dataclasses import asdict

        from parallel_louvain_method_ray.algos.louvain import louvain

        res = louvain(build_graph(edges, cfg, n_vertices=n), cfg)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vid": np.arange(n, dtype=np.int64),
                    "comm": res.assignments,
                }
            )
        )
        return ds, res.modularity, [asdict(lv) for lv in res.levels]
    entries = dedup_entries(symmetrize(edges))
    jg = joined_graph_from_entries(entries, n)
    return louvain_joined(jg, max_sweeps=cfg.max_sweeps, max_levels=cfg.max_levels)
