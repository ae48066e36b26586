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


def _resolve_parts(parts) -> list:
    """Partial tables arrive as ObjectRefs from the cross-actor wave
    path, or as plain Arrow tables when a P==1 sweep is FUSED into one
    actor call (no exchange needed — see the *_fused methods). Returns
    the non-None tables either way."""
    parts = list(parts)
    if parts and isinstance(parts[0], ray.ObjectRef):
        parts = ray.get(parts)
    return [t for t in parts if t is not None]


def _resolve_parts_keep_none(parts) -> list:
    """Like _resolve_parts but preserves None entries — the serve-style
    methods answer requester k with response k, so positions matter."""
    parts = list(parts)
    if parts and isinstance(parts[0], ray.ObjectRef):
        parts = ray.get(parts)
    return parts


@ray.remote
def _split_vec(block: pa.Table, P: int, vid_col: str, val_col: str):
    """Bucket one (vid, value) block by vid % P for SpmvShard.ingest_vec."""
    v = block.column(vid_col).to_numpy(zero_copy_only=False).astype(np.int64)
    x = (
        block.column(val_col)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    hv = v % P
    out = []
    for p in range(P):
        sel = hv == p
        out.append(pa.table({"v": v[sel], "x": x[sel]}) if sel.any() else None)
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
        tabs = _resolve_parts(parts)
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
        tabs = _resolve_parts(parts)
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

    # -- min-propagation (CC / BFS / Bellman-Ford SSSP) ------------------

    def init_index_vec(self, name: str) -> None:
        """x[v] = v for my owned vids (the CC singleton labelling)."""
        self.vecs[name] = np.arange(
            self.pid, self.n, self.P, dtype=np.int64
        ).astype(np.float64)

    def init_seed_vec(self, name: str, seeds: np.ndarray, default: float) -> None:
        """x = default everywhere, 0 at the seed vids homed here."""
        x = np.full(self.n_owned, float(default))
        s = np.asarray(seeds, dtype=np.int64)
        mine = s[s % self.P == self.pid]
        x[(mine - self.pid) // self.P] = 0.0
        self.vecs[name] = x

    def _emit_min(self, key: np.ndarray, c: np.ndarray):
        """Group-MIN contributions by output vid, bucketed by its hash."""
        out = []
        hk = key % self.P
        for q in range(self.P):
            sel = hk == q
            if not sel.any():
                out.append(None)
                continue
            uu, inv = np.unique(key[sel], return_inverse=True)
            mins = np.full(uu.size, np.inf)
            np.minimum.at(mins, inv, c[sel])
            out.append(pa.table({"v": uu, "c": mins}))
        return tuple(out) if self.P > 1 else out[0]

    def min_wave(self, src_name: str, plus: str):
        """Partials of cand[dst] = min over my by-src edges of
        x[src] (+ w | + 1 | + 0 per `plus` in {"weight","one","zero"}).
        Infinite sources are dropped (they can relax nothing)."""
        x = self.vecs[src_name]
        xv = x[self.f_src]
        if plus == "weight":
            xv = xv + self.f_w
        elif plus == "one":
            xv = xv + 1.0
        finite = np.isfinite(xv)
        return self._emit_min(self.f_dst[finite], xv[finite])

    def combine_min(self, name: str, parts) -> int:
        """x = min(x, partial mins); returns #strictly-improved slots
        (the Jacobi `changed` count — partials were computed against the
        wave-start snapshot, so this is one synchronous relaxation)."""
        cur = self.vecs[name]
        tabs = _resolve_parts(parts)
        if not tabs:
            return 0
        t = pa.concat_tables(tabs)
        v = t.column("v").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        new = cur.copy()
        np.minimum.at(new, (v - self.pid) // self.P, c)
        changed = int((new < cur).sum())
        self.vecs[name] = new
        return changed

    # -- PageRank (power iteration, dangling redistribution) -------------

    def local_weighted_outdegree(self, name: str) -> None:
        """deg[v] = sum of w over v's out-entries — local: the by-src
        partition holds EVERY out-edge of the vids owned here."""
        deg = np.zeros(self.n_owned, dtype=np.float64)
        np.add.at(deg, self.f_src, self.f_w)
        self.vecs[name] = deg

    def pr_prep(self, x_name: str, deg_name: str, s_name: str) -> float:
        """s = x / deg (0 where deg <= 0); returns this slice's dangling
        mass (sum of x where deg <= 0)."""
        x = self.vecs[x_name]
        deg = self.vecs[deg_name]
        pos = deg > 0
        s = np.zeros_like(x)
        s[pos] = x[pos] / deg[pos]
        self.vecs[s_name] = s
        return float(x[~pos].sum())

    def pr_finish(
        self,
        y_name: str,
        x_name: str,
        damping: float,
        base: float,
        want_delta: bool,
    ) -> float:
        """x <- base + damping * y; returns the slice's L1 delta vs the
        previous x (0.0 when not requested)."""
        new = base + damping * self.vecs[y_name]
        d = (
            float(np.abs(new - self.vecs[x_name]).sum())
            if want_delta
            else 0.0
        )
        self.vecs[x_name] = new
        return d

    # -- label propagation (max-weight label adoption) -------------------

    def lpa_wave(self, name: str):
        """Per-bucket partial neighbor-label weights over my by-dst
        edges: contributions (src, label[dst], w) with self-loops
        dropped, group-summed locally by (src, label)."""
        lbl = self.vecs[name]
        # reconstruct the global dst vid to drop self-loops
        gdst = self.pid + self.r_dst * self.P
        keep = self.r_src != gdst
        s = self.r_src[keep]
        l = lbl[self.r_dst[keep]]
        w = self.r_w[keep]
        out = []
        hk = s % self.P
        for q in range(self.P):
            sel = hk == q
            if not sel.any():
                out.append(None)
                continue
            sq, lq, wq = s[sel], l[sel], w[sel]
            order = np.lexsort((lq, sq))
            sq, lq, wq = sq[order], lq[order], wq[order]
            bnd = np.ones(len(sq), dtype=bool)
            bnd[1:] = (sq[1:] != sq[:-1]) | (lq[1:] != lq[:-1])
            starts = np.flatnonzero(bnd)
            out.append(
                pa.table(
                    {
                        "s": sq[starts],
                        "l": lq[starts],
                        "w": np.add.reduceat(wq, starts),
                    }
                )
            )
        return tuple(out) if self.P > 1 else out[0]

    def lpa_combine(self, name: str, parts) -> int:
        """Finish the sweep for my owned srcs: sum (src, label) partials,
        then per src adopt the max-weight label (min label on weight
        ties) iff strictly better than — or tied with a smaller label
        than — the current label's own weight. Returns #adoptions (the
        lpa.py / lpa_sweep_joined decision rule, Jacobi: `name` was
        snapshotted by the wave before any combine mutates it)."""
        tabs = _resolve_parts(parts)
        if not tabs:
            return 0
        t = pa.concat_tables(tabs)
        s = t.column("s").to_numpy(zero_copy_only=False)
        l = t.column("l").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        si = (s - self.pid) // self.P
        order = np.lexsort((l, si))
        si, l, w = si[order], l[order], w[order]
        bnd = np.ones(len(si), dtype=bool)
        bnd[1:] = (si[1:] != si[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(bnd)
        kw = np.add.reduceat(w, starts)
        ks, kl = si[starts], l[starts]
        seg_bnd = np.ones(len(ks), dtype=bool)
        seg_bnd[1:] = ks[1:] != ks[:-1]
        seg_starts = np.flatnonzero(seg_bnd)
        seg_id = np.cumsum(seg_bnd) - 1
        wmax = np.maximum.reduceat(kw, seg_starts)
        # best = smallest label among the argmax pairs: pairs are sorted
        # by label within a segment, so the FIRST max-weight pair wins
        is_max = np.flatnonzero(kw == wmax[seg_id])
        _, first = np.unique(seg_id[is_max], return_index=True)
        best = kl[is_max[first]]
        lbl = self.vecs[name]
        seg_src = ks[seg_starts]
        cur = lbl[seg_src]
        # curw = the current label's own incident weight (0 if absent)
        curw = np.zeros(len(seg_starts))
        match = np.flatnonzero(kl == cur[seg_id])
        curw[seg_id[match]] = kw[match]
        better = (wmax > curw) | ((wmax == curw) & (best < cur))
        lbl[seg_src[better]] = best[better]
        return int(better.sum())

    # -- Louvain local-move sweep (pure Jacobi) --------------------------

    def local_weighted_indegree(self, name: str) -> None:
        """deg[v] = sum of w over v's entries — local on the by-dst
        partition (the entry table is symmetric, so in-entries ==
        out-entries per vid; self-loop weight counts once)."""
        deg = np.zeros(self.n_owned, dtype=np.float64)
        np.add.at(deg, self.r_dst, self.r_w)
        self.vecs[name] = deg

    def ingest_vec(self, name: str, parts, default: float) -> None:
        """Load a sharded vector from split (v, x) tables."""
        x = np.full(self.n_owned, float(default))
        for t in _resolve_parts_keep_none(parts):
            if t is None:
                continue
            v = t.column("v").to_numpy(zero_copy_only=False)
            x[(v - self.pid) // self.P] = t.column("x").to_numpy(
                zero_copy_only=False
            )
        self.vecs[name] = x

    def stats_wave(self, asn_name: str, deg_name: str):
        """Per-bucket partial community stats (comm, tot=sum deg,
        csize=count) over ALL my owned vids, bucketed by comm % P."""
        c = self.vecs[asn_name].astype(np.int64)
        deg = self.vecs[deg_name]
        out = []
        hk = c % self.P
        for q in range(self.P):
            sel = hk == q
            if not sel.any():
                out.append(None)
                continue
            uu, inv = np.unique(c[sel], return_inverse=True)
            tot = np.zeros(uu.size)
            np.add.at(tot, inv, deg[sel])
            csize = np.bincount(inv, minlength=uu.size)
            out.append(
                pa.table(
                    {"c": uu, "t": tot, "s": csize.astype(np.int64)}
                )
            )
        return tuple(out) if self.P > 1 else out[0]

    def stats_combine(self, parts) -> None:
        """Sum my bucket's stats partials into dense (tot, csize) slices
        over my owned comm ids (comm ids ARE vids)."""
        tot = np.zeros(self.n_owned)
        csize = np.zeros(self.n_owned, dtype=np.int64)
        for t in _resolve_parts_keep_none(parts):
            if t is None:
                continue
            idx = (
                t.column("c").to_numpy(zero_copy_only=False) - self.pid
            ) // self.P
            np.add.at(tot, idx, t.column("t").to_numpy(zero_copy_only=False))
            np.add.at(
                csize, idx, t.column("s").to_numpy(zero_copy_only=False)
            )
        self.vecs["_lv_tot"] = tot
        self.vecs["_lv_csize"] = csize.astype(np.float64)

    def louvain_k_combine(self, asn_name: str, parts):
        """Sum my bucket's (src, comm, w) partials into the per-vertex
        neighbor-community weight table k (kept as actor state for the
        decide step) and return per-bucket distinct-comm stat requests
        (candidate comms plus my vertices' own comms)."""
        tabs = _resolve_parts(parts)
        if tabs:
            t = pa.concat_tables(tabs)
            s = t.column("s").to_numpy(zero_copy_only=False)
            l = t.column("l").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            si = (s - self.pid) // self.P
            order = np.lexsort((l, si))
            si, l, w = si[order], l[order], w[order]
            bnd = np.ones(len(si), dtype=bool)
            bnd[1:] = (si[1:] != si[:-1]) | (l[1:] != l[:-1])
            starts = np.flatnonzero(bnd)
            self._lv_k = (
                si[starts],
                l[starts].astype(np.int64),
                np.add.reduceat(w, starts),
            )
        else:
            e = np.empty(0, dtype=np.int64)
            self._lv_k = (e, e, np.empty(0))
        req = np.unique(
            np.concatenate(
                [self._lv_k[1], self.vecs[asn_name].astype(np.int64)]
            )
        )
        out = []
        hk = req % self.P
        for q in range(self.P):
            sel = req[hk == q]
            out.append(pa.table({"l": sel}) if sel.size else None)
        return tuple(out) if self.P > 1 else out[0]

    def stats_serve(self, parts):
        """Answer each requester's bucket with (c, tot, csize) from my
        combined stats slices — one response table per requester."""
        tot = self.vecs["_lv_tot"]
        csize = self.vecs["_lv_csize"]
        resp = []
        for t in _resolve_parts_keep_none(parts):
            if t is None:
                resp.append(None)
                continue
            c = t.column("l").to_numpy(zero_copy_only=False)
            idx = (c - self.pid) // self.P
            resp.append(
                pa.table({"c": c, "t": tot[idx], "s": csize[idx]})
            )
        return tuple(resp) if self.P > 1 else resp[0]

    def louvain_decide(
        self, asn_name: str, deg_name: str, m2: float, parts
    ) -> int:
        """Finish the sweep for my owned vertices: the
        chunked_local_move_sweep decision against the snapshot stats —
        gain = kw - tot_c * (dv / m2) per candidate comm, argmax with the
        min-comm tie-break, remove-before-gain own threshold
        max(k_own - (tot_own - dv) * dv / m2, 0), singleton-swap guard.
        Mutates the assignment slice; returns #moves."""
        tabs = _resolve_parts(parts)
        si, c, kw = self._lv_k
        del self._lv_k
        if si.size == 0:
            return 0
        carr = np.concatenate(
            [t.column("c").to_numpy(zero_copy_only=False) for t in tabs]
        )
        tarr = np.concatenate(
            [t.column("t").to_numpy(zero_copy_only=False) for t in tabs]
        )
        sarr = np.concatenate(
            [t.column("s").to_numpy(zero_copy_only=False) for t in tabs]
        )
        order = np.argsort(carr)
        carr, tarr, sarr = carr[order], tarr[order], sarr[order]
        asn = self.vecs[asn_name]
        deg = self.vecs[deg_name]
        # pairs are sorted by (si, c); segment = one vertex
        seg_bnd = np.ones(len(si), dtype=bool)
        seg_bnd[1:] = si[1:] != si[:-1]
        seg_starts = np.flatnonzero(seg_bnd)
        sid = np.cumsum(seg_bnd) - 1
        nseg = len(seg_starts)
        seg_si = si[seg_starts]
        own_s = asn[seg_si].astype(np.int64)
        dv_s = deg[seg_si]
        own_pair = own_s[sid]
        cand = c != own_pair
        tot_pair = tarr[np.searchsorted(carr, c)]
        gain = kw - tot_pair * (deg[si] / m2)
        gmax = np.full(nseg, -np.inf)
        np.maximum.at(gmax, sid[cand], gain[cand])
        has_cand = gmax > -np.inf
        is_best = np.flatnonzero(cand & (gain == gmax[sid]))
        # first max-gain candidate per segment = smallest comm (pairs
        # sorted by comm within a segment)
        bseg, first = np.unique(sid[is_best], return_index=True)
        best = np.full(nseg, -1, dtype=np.int64)
        best[bseg] = c[is_best[first]]
        ko = np.zeros(nseg)
        m = np.flatnonzero(c == own_pair)
        ko[sid[m]] = kw[m]
        oi = np.searchsorted(carr, own_s)
        tot_own = tarr[oi]
        cs_own = sarr[oi]
        gain_own = ko - (tot_own - dv_s) * dv_s / m2
        thr = np.maximum(gain_own, 0.0)
        accept = has_cand & (gmax > thr)
        bi = np.searchsorted(carr, np.where(best >= 0, best, 0))
        cs_b = sarr[bi]
        guard = (best > own_s) & (cs_own == 1.0) & (cs_b == 1.0)
        accept &= ~guard
        asn[seg_si[accept]] = best[accept].astype(np.float64)
        return int(accept.sum())

    # -- P==1 fusions: the identical wave methods chained inside ONE
    # actor call (partials passed as plain tables — no exchange, no
    # object-store round trips; a P=1 sweep was 6 RPCs of pure latency)

    def louvain_sweep_fused(self, m2: float) -> int:
        sp = self.stats_wave("asn", "deg")
        self.stats_combine([sp])
        kp = self.lpa_wave("asn")
        req = self.louvain_k_combine("asn", [kp])
        resp = self.stats_serve([req])
        return self.louvain_decide("asn", "deg", m2, [resp])

    def lpa_sweep_fused(self, name: str) -> int:
        return self.lpa_combine(name, [self.lpa_wave(name)])

    def min_fwd_fused(self, name: str, plus: str) -> int:
        return self.combine_min(name, [self.min_wave(name, plus)])

    def pointer_jump_fused(self, name: str) -> int:
        req = self.jump_request(name)
        resp = self.jump_serve(name, [req])
        return self.jump_apply(name, [resp])

    # -- pointer-jump gather (CC doubling: label <- label(label)) --------

    def jump_request(self, name: str):
        """Distinct label values my slice points at, bucketed by the
        OWNER's hash (labels are vids, so label % P owns label's label)."""
        lbl = self.vecs[name].astype(np.int64)
        uu = np.unique(lbl)
        out = []
        hk = uu % self.P
        for q in range(self.P):
            sel = uu[hk == q]
            out.append(pa.table({"l": sel}) if sel.size else None)
        return tuple(out) if self.P > 1 else out[0]

    def jump_serve(self, name: str, parts):
        """Answer each requester's bucket with (l, label[l]) pairs from
        my slice — one response table per requester."""
        lbl = self.vecs[name]
        resp = []
        for t in _resolve_parts_keep_none(parts):
            if t is None:
                resp.append(None)
                continue
            l = t.column("l").to_numpy(zero_copy_only=False)
            ll = lbl[(l - self.pid) // self.P]
            resp.append(pa.table({"l": l, "ll": ll}))
        return tuple(resp) if self.P > 1 else resp[0]

    def jump_apply(self, name: str, parts) -> int:
        """label <- min(label, label(label)) using the gathered map. The
        vector is untouched between request and apply, so every label is
        present in the map by construction."""
        tabs = _resolve_parts(parts)
        if not tabs:
            return 0
        t = pa.concat_tables(tabs)
        l = t.column("l").to_numpy(zero_copy_only=False)
        ll = t.column("ll").to_numpy(zero_copy_only=False)
        order = np.argsort(l)
        l, ll = l[order], ll[order]
        cur = self.vecs[name]
        mapped = ll[np.searchsorted(l, cur.astype(np.int64))]
        new = np.minimum(cur, mapped)
        changed = int((new < cur).sum())
        self.vecs[name] = new
        return changed

    def collect(self, spec: list[tuple]) -> pa.Table:
        """My slice as (vid, *cols): spec entries are (vec_name, scale,
        col) for float64 output or (vec_name, scale, col, "i8") to cast
        the column to int64 (CC labels, BFS hop counts)."""
        vids = np.arange(self.pid, self.n, self.P, dtype=np.int64)
        cols: dict[str, np.ndarray] = {"vid": vids}
        for entry in spec:
            name, scale, col = entry[0], entry[1], entry[2]
            x = self.vecs[name]
            x = x * scale if scale != 1.0 else x
            if len(entry) > 3 and entry[3] == "i8":
                x = x.astype(np.int64)
            cols[col] = x
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
        need_forward: bool = True,
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
        waves = []
        if need_forward:
            waves.append(
                self._ingest(block_refs, src_col, dst_col, weight_col, False)
            )
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

    def init_index_vec(self, name: str) -> None:
        ray.get([a.init_index_vec.remote(name) for a in self.actors])

    def init_seed_vec(self, name: str, seeds, default: float) -> None:
        s = np.asarray(seeds, dtype=np.int64)
        ray.get(
            [a.init_seed_vec.remote(name, s, default) for a in self.actors]
        )

    def min_fwd(self, name: str, plus: str = "zero") -> int:
        """One synchronous min-relaxation wave over the by-src edges;
        returns the number of strictly-improved vector slots."""
        P = self.P
        if P > 1:
            partials = [
                a.min_wave.options(num_returns=P).remote(name, plus)
                for a in self.actors
            ]
            changed = ray.get(
                [
                    self.actors[q].combine_min.remote(
                        name, [partials[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
            )
        else:
            changed = ray.get([self.actors[0].min_fwd_fused.remote(name, plus)])
        return int(sum(changed))

    def load_vec(
        self,
        ds: ray.data.Dataset,
        name: str,
        vid_col: str,
        val_col: str,
        default: float = 0.0,
    ) -> None:
        """Scatter a (vid, value) Dataset into the sharded vector."""
        P = self.P
        eds = ds.materialize()
        block_refs = []
        for rb in eds.iter_internal_ref_bundles():
            block_refs.extend(r for r, _ in rb.blocks)
        if P > 1:
            splits = [
                _split_vec.options(num_returns=P).remote(
                    br, P, vid_col, val_col
                )
                for br in block_refs
            ]
            ray.get(
                [
                    self.actors[p].ingest_vec.remote(
                        name, [s[p] for s in splits], default
                    )
                    for p in range(P)
                ]
            )
        else:
            splits = [
                _split_vec.remote(br, P, vid_col, val_col)
                for br in block_refs
            ]
            ray.get([self.actors[0].ingest_vec.remote(name, splits, default)])

    def louvain_sweep(self, m2: float) -> int:
        """One pure-Jacobi local-move sweep over the sharded assignment
        ("asn") + degree ("deg") vectors: stats wave and neighbor-weight
        wave (both from the sweep-start snapshot, launched concurrently),
        a distinct-comm stats gather, then the local decide. Returns the
        move count."""
        P = self.P
        A = self.actors
        if P > 1:
            stats_p = [
                a.stats_wave.options(num_returns=P).remote("asn", "deg")
                for a in A
            ]
            k_p = [
                a.lpa_wave.options(num_returns=P).remote("asn") for a in A
            ]
            stats_c = [
                A[q].stats_combine.remote([stats_p[p][q] for p in range(P)])
                for q in range(P)
            ]
            reqs = [
                A[p]
                .louvain_k_combine.options(num_returns=P)
                .remote("asn", [k_p[q2][p] for q2 in range(P)])
                for p in range(P)
            ]
            ray.get(stats_c)
            resp = [
                A[q]
                .stats_serve.options(num_returns=P)
                .remote([reqs[p][q] for p in range(P)])
                for q in range(P)
            ]
            moves = ray.get(
                [
                    A[p].louvain_decide.remote(
                        "asn", "deg", m2, [resp[q][p] for q in range(P)]
                    )
                    for p in range(P)
                ]
            )
        else:
            # one fused actor call — the 6-RPC wave chain is pure
            # latency when there is no one to exchange with
            moves = ray.get([A[0].louvain_sweep_fused.remote(m2)])
        return int(sum(moves))

    def lpa_sweep(self, name: str) -> int:
        """One synchronous LPA sweep over the by-dst edges; returns the
        number of label adoptions."""
        P = self.P
        if P > 1:
            partials = [
                a.lpa_wave.options(num_returns=P).remote(name)
                for a in self.actors
            ]
            changed = ray.get(
                [
                    self.actors[q].lpa_combine.remote(
                        name, [partials[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
            )
        else:
            changed = ray.get([self.actors[0].lpa_sweep_fused.remote(name)])
        return int(sum(changed))

    def pointer_jump(self, name: str) -> int:
        """label <- min(label, label(label)) across the pool: a request /
        serve / apply gather (3 RPC waves of tiny distinct-label tables)."""
        P = self.P
        if P > 1:
            reqs = [
                a.jump_request.options(num_returns=P).remote(name)
                for a in self.actors
            ]
            resps = [
                self.actors[q]
                .jump_serve.options(num_returns=P)
                .remote(name, [reqs[p][q] for p in range(P)])
                for q in range(P)
            ]
            changed = ray.get(
                [
                    self.actors[p].jump_apply.remote(
                        name, [resps[q][p] for q in range(P)]
                    )
                    for p in range(P)
                ]
            )
        else:
            changed = ray.get([self.actors[0].pointer_jump_fused.remote(name)])
        return int(sum(changed))

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


def cc_partitioned(
    edges: ray.data.Dataset,
    n: int,
    max_rounds: int = 200,
    src_col: str = "src",
    dst_col: str = "dst",
    partitions: int | None = None,
    pointer_doubling_after: int | None = 2,
) -> tuple[ray.data.Dataset, dict]:
    """Min-label connected components on the BSP SpMV pool — same
    semantics as the r4 all-Dataset connected_components_joined (labels
    init to own vid; one synchronous neighbor-min relaxation per round;
    from round `pointer_doubling_after` on, each round is chased with a
    pointer jump label <- label(label), dropping O(diameter) rounds to
    O(log diameter) on chain-shaped components). Converged labels are
    the unique min-vid-per-component fixpoint either way. `edges` must
    be symmetrized (both directions present)."""
    pool = SpmvPool(
        edges,
        n,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=None,
        partitions=partitions,
        need_reverse=False,
    )
    try:
        pool.init_index_vec("lbl")
        rounds = jumps = 0
        while rounds < max_rounds:
            changed = pool.min_fwd("lbl", plus="zero")
            rounds += 1
            if changed == 0:
                break
            if (
                pointer_doubling_after is not None
                and rounds >= pointer_doubling_after
            ):
                pool.pointer_jump("lbl")
                jumps += 1
        out = pool.collect([("lbl", 1.0, "label", "i8")])
    finally:
        pool.shutdown()
    return out, {"rounds": rounds, "jumps": jumps}


def sssp_partitioned(
    edges: ray.data.Dataset,
    n: int,
    seeds,
    hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Hop-bounded Bellman-Ford on the BSP SpMV pool — same semantics as
    the r4 all-Dataset sssp_joined (dist after round r = cheapest path
    using AT MOST r edges; exactly one synchronous Jacobi relaxation per
    round, early exit at the fixpoint; unreachable keeps +inf). `edges`
    must be symmetrized for undirected distances."""
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
        pool.init_seed_vec("dist", seeds, default=np.inf)
        rounds = 0
        for _ in range(hops):
            changed = pool.min_fwd("dist", plus="weight")
            rounds += 1
            if changed == 0:
                break
        out = pool.collect([("dist", 1.0, "dist")])
    finally:
        pool.shutdown()
    return out, {"hops": hops, "rounds": rounds}


class LouvainLevel:
    """One Louvain level on the BSP SpMV pool: the assignment and degree
    vectors live sharded across the actors for the whole level, so a
    multi-sweep loop pays the edge ingest exactly once. Sweep semantics
    are `chunked_local_move_sweep(chunk=n)` — the same pure-Jacobi
    decision (fresh snapshot stats per sweep, gain argmax with min-comm
    tie-break, remove-before-gain threshold, singleton-swap guard) the
    all-Dataset louvain_sweep_joined implemented, bit-for-bit on
    integer-weight graphs. `edges` must be symmetrized deduped entries."""

    def __init__(
        self,
        edges: ray.data.Dataset,
        n: int,
        weight_col: str = "weight",
        partitions: int | None = None,
    ) -> None:
        self.pool = SpmvPool(
            edges,
            n,
            weight_col=weight_col,
            partitions=partitions,
            need_reverse=True,
            need_forward=False,  # all sweep reads happen at the dst side
        )
        ray.get(
            [
                a.local_weighted_indegree.remote("deg")
                for a in self.pool.actors
            ]
        )
        self.pool.init_index_vec("asn")  # reference singleton init

    def load_assign(self, assign: ray.data.Dataset) -> None:
        self.pool.load_vec(assign, "asn", "vid", "comm")

    def sweep(self, m2: float) -> int:
        return self.pool.louvain_sweep(m2)

    def assign_dataset(self) -> ray.data.Dataset:
        return self.pool.collect([("asn", 1.0, "comm", "i8")])

    def shutdown(self) -> None:
        self.pool.shutdown()


def pagerank_partitioned(
    edges: ray.data.Dataset,
    n: int,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """PageRank power iteration on the BSP SpMV pool — same published
    semantics as `algos.pagerank.pagerank` / the r4 all-Dataset
    pagerank_joined (uniform init, rank/deg scaling with the weighted
    degree, dangling mass redistributed uniformly, `tol <= 0` = fixed
    iteration count). One iteration = a local prep (scale + dangling
    mass), one exchange wave, a local affine finish — the driver sums
    2P floats. `edges` must be symmetrized."""
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
        ray.get(
            [a.local_weighted_outdegree.remote("deg") for a in pool.actors]
        )
        pool.init_vec("x", 1.0 / n)
        compute_delta = tol > 0
        delta = np.inf
        iters = 0
        for it in range(max_iter):
            dm = float(
                sum(
                    ray.get(
                        [
                            a.pr_prep.remote("x", "deg", "s")
                            for a in pool.actors
                        ]
                    )
                )
            )
            pool.fwd("s", "y", scale=1.0)
            base = (1.0 - damping) / n + damping * dm / n
            deltas = ray.get(
                [
                    a.pr_finish.remote("y", "x", damping, base, compute_delta)
                    for a in pool.actors
                ]
            )
            iters = it + 1
            if compute_delta:
                delta = float(sum(deltas))
                if delta < tol:
                    break
        out = pool.collect([("x", 1.0, "rank")])
    finally:
        pool.shutdown()
    return out, {"iterations": iters, "l1_delta": delta}


def lpa_partitioned(
    edges: ray.data.Dataset,
    n: int,
    max_sweeps: int = 25,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Label propagation on the BSP SpMV pool — singleton init, then
    synchronous sweeps with the lpa.py decision rule (adopt the
    max-incident-weight neighbor label; keep current unless strictly
    better, or tied with a smaller label; self-loops ignored). Hub skew
    needs no salting here: a hub's per-label sums are pre-combined on
    each source partition before the exchange. `edges` must be
    symmetrized."""
    pool = SpmvPool(
        edges,
        n,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
        partitions=partitions,
        need_reverse=True,
        need_forward=False,  # LPA reads labels at the dst side only
    )
    try:
        pool.init_index_vec("lbl")
        sweeps = 0
        for _ in range(max_sweeps):
            changed = pool.lpa_sweep("lbl")
            sweeps += 1
            if changed == 0:
                break
        out = pool.collect([("lbl", 1.0, "label", "i8")])
    finally:
        pool.shutdown()
    return out, {"sweeps": sweeps}


def bfs_partitioned(
    edges: ray.data.Dataset,
    n: int,
    seeds,
    max_rounds: int = 200,
    src_col: str = "src",
    dst_col: str = "dst",
    partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Multi-source BFS hop distances on the BSP SpMV pool — same
    semantics as the r4 all-Dataset bfs_joined (dist(v) <- min(dist(v),
    min_u dist(u) + 1) to the fixpoint; unreachable keeps the INF
    sentinel dist == n, int64 output)."""
    pool = SpmvPool(
        edges,
        n,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=None,
        partitions=partitions,
        need_reverse=False,
    )
    try:
        pool.init_seed_vec("dist", seeds, default=float(n))
        rounds = 0
        while rounds < max_rounds:
            changed = pool.min_fwd("dist", plus="one")
            rounds += 1
            if changed == 0:
                break
        out = pool.collect([("dist", 1.0, "dist", "i8")])
    finally:
        pool.shutdown()
    return out, {"rounds": rounds}
