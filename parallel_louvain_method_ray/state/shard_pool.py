"""Persistent CSR shard actors for the iterative phases.

Graph CONSTRUCTION is Dataset-shaped (one shuffle, streaming); the
ITERATIVE phases (Louvain sweeps, PageRank power iterations, CC rounds,
LPA sweeps) are BSP loops whose per-round work is tiny compared to a fresh
Dataset execution's task-graph overhead. This is the case SURVEY §7.3
reserves for raw Ray actors: each `ShardWorker` ray.gets its share of the
materialized shard BLOCKS once (zero-copy from the object store) and then
serves per-round kernel calls; a round is one `ray.remote` call per worker
plus small broadcast refs — no scheduling of a new task graph.

The kernels are the SAME functions the Dataset path uses
(`algos/_local_move.py` etc.), so both paths produce identical results;
the Dataset path remains as the streaming/one-shot fallback and is what
`build_graph` uses for construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from parallel_louvain_method_ray.algos._local_move import local_move_sweep
from parallel_louvain_method_ray.graph.csr import unpack_shards


@ray.remote
class ShardWorker:
    def __init__(self, block_refs: list):
        self.load(block_refs)

    def load(self, block_refs: list) -> bool:
        """(Re)load this worker's shard blocks — lets one pool of warm
        actor processes serve successive Louvain levels / algorithms
        without paying actor cold-start again."""
        self.shards = []
        for ref in block_refs:
            block = ray.get(ref)
            if not isinstance(block, pa.Table):
                block = pa.table(block)
            self.shards.extend(unpack_shards(block))
        return True

    def louvain_sweep(
        self, assign_in, tot_in, csize_in, deg, m2: float, tie_break: str
    ):
        # ObjectRef args are auto-resolved by Ray before the method runs;
        # the arrays arrive plasma-backed and read-only -> copy per shard
        out_v, out_c = [], []
        for shard in self.shards:
            assign = np.array(assign_in)
            tot = np.array(tot_in)
            csize = np.array(csize_in) if csize_in is not None else None
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
        return (
            np.concatenate(out_v) if out_v else np.empty(0, np.int64),
            np.concatenate(out_c) if out_c else np.empty(0, np.int64),
        )

    def intra_weight(self, assign) -> float:
        s = 0.0
        for shard in self.shards:
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            mask = (src != shard.cols) & (assign[src] == assign[shard.cols])
            s += float(shard.weights[mask].sum())
        return s

    def pagerank_iter(self, s, n: int):
        acc = np.zeros(n, dtype=np.float64)
        for shard in self.shards:
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            acc += np.bincount(
                shard.cols, weights=s[src] * shard.weights, minlength=n
            )
        nz = np.flatnonzero(acc)
        return nz.astype(np.int64), acc[nz]

    def cc_round(self, lab_in):
        out_v, out_l = [], []
        for shard in self.shards:
            lab = np.array(lab_in)
            ip = shard.indptr
            while True:
                row_min = np.minimum.reduceat(lab[shard.cols], ip[:-1])
                cur = lab[shard.vids]
                better = row_min < cur
                if not better.any():
                    break
                lab[shard.vids[better]] = row_min[better]
            ch = lab[shard.vids] != lab_in[shard.vids]
            out_v.append(shard.vids[ch])
            out_l.append(lab[shard.vids[ch]])
        return (
            np.concatenate(out_v) if out_v else np.empty(0, np.int64),
            np.concatenate(out_l) if out_l else np.empty(0, np.int64),
        )

    def lpa_sweep(self, lab):
        from parallel_louvain_method_ray.algos.lpa import _best_labels_for_shard

        out_v, out_l = [], []
        for shard in self.shards:
            best, bw = _best_labels_for_shard(shard, lab)
            cur = lab[shard.vids]
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            m = (src != shard.cols) & (lab[shard.cols] == np.repeat(cur, counts))
            curw = np.bincount(
                np.repeat(np.arange(shard.vids.shape[0]), counts)[m],
                weights=shard.weights[m],
                minlength=shard.vids.shape[0],
            )
            better = (best >= 0) & ((bw > curw) | ((bw == curw) & (best < cur)))
            out_v.append(shard.vids[better])
            out_l.append(best[better])
        return (
            np.concatenate(out_v) if out_v else np.empty(0, np.int64),
            np.concatenate(out_l) if out_l else np.empty(0, np.int64),
        )

    def contract(self, d, ncomms: int):
        keys, ws = [], []
        for shard in self.shards:
            counts = np.diff(shard.indptr)
            src = np.repeat(shard.vids, counts)
            key = d[src] * np.int64(ncomms) + d[shard.cols]
            uk, inv = np.unique(key, return_inverse=True)
            wsum = np.zeros(uk.shape[0], dtype=np.float64)
            np.add.at(wsum, inv, shard.weights)
            keys.append(uk)
            ws.append(wsum)
        if not keys:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        k = np.concatenate(keys)
        w = np.concatenate(ws)
        # combine duplicate keys across this worker's shards
        uk, inv = np.unique(k, return_inverse=True)
        wsum = np.zeros(uk.shape[0], dtype=np.float64)
        np.add.at(wsum, inv, w)
        return uk, wsum


def _block_groups(graph, num_workers: int | None):
    refs = graph.shards.get_internal_block_refs()
    if num_workers is None:
        avail = int(ray.available_resources().get("CPU", 8))
        num_workers = max(1, min(len(refs), int(avail) or 1))
    groups: list[list] = [[] for _ in range(num_workers)]
    for i, r in enumerate(refs):
        groups[i % num_workers].append(r)
    return [g for g in groups if g]


class ShardPool:
    """One ShardWorker per group of shard blocks. `reload(graph)` swaps the
    loaded level without respawning actor processes."""

    def __init__(self, graph, num_workers: int | None = None):
        self._max_workers = num_workers
        groups = _block_groups(graph, num_workers)
        self.workers = [ShardWorker.remote(g) for g in groups]
        self.graph = graph

    def reload(self, graph) -> "ShardPool":
        groups = _block_groups(graph, len(self.workers) or None)
        n = min(len(groups), len(self.workers))
        refs = [self.workers[i].load.remote(groups[i]) for i in range(n)]
        # idle extra workers get no blocks
        refs += [
            self.workers[i].load.remote([]) for i in range(n, len(self.workers))
        ]
        ray.get(refs)
        # workers loaded with [] simply return empty results; keeping them
        # lets a later (larger) level reuse the full pool
        self.graph = graph
        return self

    def sweep(self, assign, tot, csize, m2, tie_break):
        assign_ref = ray.put(assign)
        tot_ref = ray.put(tot)
        csize_ref = ray.put(csize) if csize is not None else None
        outs = ray.get(
            [
                w.louvain_sweep.remote(
                    assign_ref, tot_ref, csize_ref, self.graph.degrees_ref, m2, tie_break
                )
                for w in self.workers
            ]
        )
        vids = np.concatenate([o[0] for o in outs]) if outs else np.empty(0, np.int64)
        comms = np.concatenate([o[1] for o in outs]) if outs else np.empty(0, np.int64)
        return vids, comms, int(vids.shape[0])

    def intra_weight(self, assign) -> float:
        ref = ray.put(assign)
        return float(sum(ray.get([w.intra_weight.remote(ref) for w in self.workers])))

    def pagerank_iter(self, scaled) -> np.ndarray:
        ref = ray.put(scaled)
        n = self.graph.n
        incoming = np.zeros(n, dtype=np.float64)
        for nz, part in ray.get(
            [w.pagerank_iter.remote(ref, n) for w in self.workers]
        ):
            incoming[nz] += part
        return incoming

    def cc_round(self, labels):
        ref = ray.put(labels)
        outs = ray.get([w.cc_round.remote(ref) for w in self.workers])
        return outs

    def lpa_sweep(self, labels):
        ref = ray.put(labels)
        return ray.get([w.lpa_sweep.remote(ref) for w in self.workers])

    def contract(self, dense, ncomms: int):
        ref = ray.put(dense)
        outs = ray.get([w.contract.remote(ref, ncomms) for w in self.workers])
        k = np.concatenate([o[0] for o in outs]) if outs else np.empty(0, np.int64)
        w = np.concatenate([o[1] for o in outs]) if outs else np.empty(0, np.float64)
        uk, inv = np.unique(k, return_inverse=True)
        wsum = np.zeros(uk.shape[0], dtype=np.float64)
        np.add.at(wsum, inv, w)
        src = (uk // ncomms).astype(np.int64)
        dst = (uk % ncomms).astype(np.int64)
        return src, dst, wsum

    def shutdown(self):
        for w in self.workers:
            ray.kill(w)
        self.workers = []
