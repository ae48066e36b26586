"""Link prediction: Adamic-Adar scores over an edge Dataset.

score(a, b) = sum over common neighbors w of 1 / ln(deg(w)), for pairs
(a, b) NOT already adjacent. Classic link-prediction baseline; on a web
graph it surfaces pages that share many low-fanout co-citers.

Plan shape (all Datasets, no driver O(E) state):
  distinct undirected edges (one groupby dedupe)
  -> wedge enumeration: sym2 ⋈ sym2 on the middle vertex (hash join,
     the same bounded fan-out `_join` the joined engines use)
  -> ⋈ degrees for the 1/ln(d) weight
  -> groupby (a, b) sum
  -> existing-edge anti filter (broadcast distinct-edge key set — the
     dimension-side contract; swap for a shuffle anti-join when the edge
     list itself is the fact table)

The wedge table is O(sum deg^2) — the same blow-up triangle counting
manages; at web-graph sparsity it is ~avg_deg x |E|. Hub middles inflate
it quadratically: cap or sample hub neighborhoods upstream if max-degree
is unbounded (same hub defense as the triangle/LSH stages)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from parallel_louvain_method_ray.algos.joined import (
    _join,
    _rename,
    _size_aware_P,
)
from parallel_louvain_method_ray.algos.kcore import undirected_dedup


def jaccard_links(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Jaccard link prediction: |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for
    non-adjacent pairs with >= 1 common neighbor. Same wedge plan as
    `adamic_adar`; the degree table is broadcast (O(V)) for the union
    size instead of a second join."""
    und = undirected_dedup(edges, src_col, dst_col).materialize()
    n_edges = und.count()
    P = _size_aware_P(n_edges * 2)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.table(
            {
                "w": pa.concat_arrays([a, b]),
                "v": pa.concat_arrays([b, a]),
            }
        )

    sym2 = und.map_batches(both_dirs, batch_format="pyarrow")

    common = (
        _join(
            _rename(sym2, ["w", "va"]),
            _rename(sym2, ["w", "vb"]),
            on=("w",),
            P=P,
        )
        .filter(expr="va < vb")
        .groupby(["va", "vb"])
        .count()
    )

    # O(V) degree map + O(E) edge-key set, broadcast once
    deg_t = sym2.groupby("w").count().to_pandas()
    max_v = int(deg_t["w"].max()) + 1 if len(deg_t) else 1
    deg = np.zeros(max_v, dtype=np.int64)
    deg[deg_t["w"].to_numpy()] = deg_t["count()"].to_numpy()
    deg_ref = ray.put(deg)
    keys = []
    for batch in und.iter_batches(batch_format="pyarrow"):
        t = pa.table(batch)
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        keys.append(a << np.int64(32) | b)
    edge_keys_ref = ray.put(
        np.sort(np.concatenate(keys)) if keys else np.empty(0, np.int64)
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        ek = ray.get(edge_keys_ref)
        a = batch.column("va").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("vb").to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch.column("count()").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        key = a << np.int64(32) | b
        if ek.shape[0] == 0:
            adjacent = np.zeros(key.shape[0], dtype=bool)
        else:
            idx = np.searchsorted(ek, key)
            adjacent = (idx < ek.shape[0]) & (
                ek[np.clip(idx, 0, ek.shape[0] - 1)] == key
            )
        sel = ~adjacent
        a, b, c = a[sel], b[sel], c[sel]
        union = d[a] + d[b] - c
        return pa.table(
            {
                "src": pa.array(a),
                "dst": pa.array(b),
                "common": pa.array(c),
                "jaccard": pa.array(np.round(c / union, 9)),
            }
        )

    return common.map_batches(finish, batch_format="pyarrow")


def adamic_adar(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """-> (src, dst, score) for non-adjacent pairs with >= 1 common
    neighbor; src < dst; score rounded to 9 decimals."""
    und = undirected_dedup(edges, src_col, dst_col).materialize()
    n_edges = und.count()
    P = _size_aware_P(n_edges * 2)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a")
        b = batch.column("b")
        return pa.table(
            {
                "w": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                     b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]
                ),
                "v": pa.concat_arrays(
                    [b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                     a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]
                ),
            }
        )

    sym2 = und.map_batches(both_dirs, batch_format="pyarrow")
    deg = _rename(sym2.groupby("w").count(), ["w", "d"])

    # wedge enumeration: two spokes sharing the middle vertex w
    wedges = _join(
        _rename(sym2, ["w", "va"]),
        _rename(sym2, ["w", "vb"]),
        on=("w",),
        P=P,
    ).filter(expr="va < vb")

    scored = (
        _join(wedges, deg, on=("w",), P=P)
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("va"),
                    "dst": b.column("vb"),
                    "c": 1.0
                    / np.log(
                        b.column("d").to_numpy(zero_copy_only=False).astype(
                            np.float64
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["src", "dst"])
        .sum("c")
    )

    # drop already-adjacent pairs: broadcast the distinct-edge key set
    keys = []
    for batch in und.iter_batches(batch_format="pyarrow"):
        t = pa.table(batch)
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        keys.append(a << np.int64(32) | b)
    edge_keys_ref = ray.put(
        np.sort(np.concatenate(keys)) if keys else np.empty(0, np.int64)
    )

    def finish(batch: pa.Table) -> pa.Table:
        ek = ray.get(edge_keys_ref)
        a = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        key = a << np.int64(32) | b
        if ek.shape[0] == 0:
            adjacent = np.zeros(key.shape[0], dtype=bool)
        else:
            idx = np.searchsorted(ek, key)
            adjacent = (idx < ek.shape[0]) & (
                ek[np.clip(idx, 0, ek.shape[0] - 1)] == key
            )
        sel = pa.array(~adjacent)
        return pa.table(
            {
                "src": batch.column("src").filter(sel),
                "dst": batch.column("dst").filter(sel),
                "score": pc.round(
                    batch.column("sum(c)").filter(sel), ndigits=9
                ),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")
