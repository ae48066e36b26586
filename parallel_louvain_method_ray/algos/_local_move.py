"""The Louvain local-move kernel (Gauss-Seidel sweep over one CSR range).

Semantics transcribed from the reference's sequential `Communities`
(`/root/reference/src/community.cpp`):

- per vertex v (ascending id order, `community.cpp:72`):
  - neighbor-community weights k_{v,c} exclude self-loops
    (`node != neighbor`, `community.cpp:134`);
  - v is REMOVED from its community before evaluating gains
    (`community.cpp:79`): tot[own] is seen without deg(v);
  - gain(v, c) = k_{v,c} - tot[c] * deg(v) / 2m (`community.cpp:158`;
    constant factors dropped — valid for argmax);
  - scan starts at the own community with best_increase = 0.0 and uses
    strict `>` (`community.cpp:106-118`): non-positive gains and ties keep
    the current community; among tied positive gains the FIRST-SCANNED
    community wins. Scan order is own community first, then neighbor
    communities in first-seen CSR order (`community.cpp:122-148`).

`tie_break` selects the winner among candidates attaining the maximal gain:
- "reference": first-seen CSR order (bit-exact vs the C++ oracle);
- "canonical": smallest community id — the deterministic rule the
  distributed engine uses (BASELINE.json licenses tie-break
  canonicalization; the reference's own distributed mode is
  rank-RNG/message-timing dependent, `src/distcommunity.cpp:221-234`).

This module is pure numpy so the same kernel runs inside the sequential
oracle AND inside Ray map_batches tasks over CSR shards.
"""

from __future__ import annotations

import numpy as np


def local_move_sweep(
    vids: np.ndarray,
    indptr: np.ndarray,
    cols: np.ndarray,
    weights: np.ndarray,
    comm: np.ndarray,
    tot: np.ndarray,
    deg: np.ndarray,
    m2: float,
    tie_break: str = "canonical",
    csize: np.ndarray | None = None,
) -> int:
    """One Gauss-Seidel sweep over the local vertices `vids` (ascending).

    Mutates `comm` and `tot` in place; returns the number of moves.
    `comm`, `tot`, `deg` are dense arrays over the GLOBAL id space.
    """
    moves = 0
    reference_order = tie_break == "reference"
    for i in range(vids.shape[0]):
        v = int(vids[i])
        s, e = indptr[i], indptr[i + 1]
        nbrs = cols[s:e]
        ws = weights[s:e]
        mask = nbrs != v
        if not mask.all():
            nbrs = nbrs[mask]
            ws = ws[mask]
        c_own = int(comm[v])
        dv = deg[v]

        ncomms = comm[nbrs]
        uniq, first_idx, inv = np.unique(
            ncomms, return_index=True, return_inverse=True
        )
        ksum = np.zeros(uniq.shape[0], dtype=np.float64)
        np.add.at(ksum, inv, ws)

        own_pos = np.searchsorted(uniq, c_own)
        cand_mask = np.ones(uniq.shape[0], dtype=bool)
        if own_pos < uniq.shape[0] and uniq[own_pos] == c_own:
            k_own = ksum[own_pos]
            cand_mask[own_pos] = False
        else:
            k_own = 0.0
        if reference_order and c_own != v:
            # Reference quirk (`community.cpp:125`): `edges_to_other_comms[node]`
            # is pre-set to 0, so a community whose id equals the vertex id is
            # never appended to `neighbor_comms` — it silently drops out of the
            # candidate scan. Replicated only in bit-exact oracle mode.
            vpos = np.searchsorted(uniq, v)
            if vpos < uniq.shape[0] and uniq[vpos] == v:
                cand_mask[vpos] = False
        cands = uniq[cand_mask]
        cand_k = ksum[cand_mask]
        cand_first = first_idx[cand_mask]

        # remove v from its community before gain evaluation
        tot[c_own] -= dv

        best = c_own
        if cands.shape[0]:
            gains = cand_k - tot[cands] * (dv / m2)
            gain_own = k_own - tot[c_own] * (dv / m2)
            thr = gain_own if gain_own > 0.0 else 0.0
            maxg = gains.max()
            if maxg > thr:
                winners = np.flatnonzero(gains == maxg)
                if reference_order:
                    best = int(cands[winners[np.argmin(cand_first[winners])]])
                else:
                    best = int(cands[winners[0]])  # uniq sorted -> min comm id
                    # Singleton-swap guard (Lu/Halappanavar/Kalyanaraman,
                    # "Parallel heuristics for scalable community detection",
                    # 2015): in a synchronous sweep two singleton vertices can
                    # endlessly swap into each other's community; allow a
                    # singleton -> singleton move only toward the SMALLER
                    # community id. Disabled in reference mode (sequential
                    # Gauss-Seidel has no concurrent moves).
                    if (
                        csize is not None
                        and best > c_own
                        and csize[c_own] == 1
                        and csize[best] == 1
                    ):
                        best = c_own

        comm[v] = best
        tot[best] += dv
        if best != c_own:
            moves += 1
            if csize is not None:
                csize[c_own] -= 1
                csize[best] += 1
    return moves
