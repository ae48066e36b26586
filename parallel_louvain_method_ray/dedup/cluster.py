"""Near-duplicate clustering + canonical-document selection — the
end-to-end dedup step every training-data pipeline runs after pair
generation: connected components over the near-dup pair graph, one
keeper per component (min doc_id), every other member dropped.

Composition, not new machinery: pairs come from the existing exact
shingle-jaccard generator (`dedup/jaccard.py`, oracle-green) or any
other (doc_a, doc_b) pair table; components reuse the graph engine's
renumber -> build_graph -> connected_components path
(`graph/build.py`, `algos/components.py`) above a driver budget, and a
numpy min-label/pointer-halving loop below it (identical labels — the
parity test forces both paths onto the same input).

Scale contract: the CLUSTER side is O(pair-involved docs), which in the
dedup regime is a small fraction of the corpus (that is the point of
near-dup filtering); the final labeling pass broadcasts the
(doc_id -> cluster) map once via `ray.put` and streams the full corpus
through `map_batches` — the corpus itself is never collected.

No counterpart in /root/reference (it clusters a link graph, not a
document corpus); the reference's community semantics are in
`algos/louvain.py` — this file is the dedup-pipeline analogue.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _cluster_driver(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Min-label propagation with pointer halving over pair endpoints ->
    (member_ids_sorted, cluster_label_per_member). Label = min doc_id of
    the component (dense rank order == sorted raw order)."""
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    labels = np.arange(ids.shape[0], dtype=np.int64)
    while True:
        prev = labels.copy()
        m = np.minimum(labels[ai], labels[bi])
        np.minimum.at(labels, ai, m)
        np.minimum.at(labels, bi, m)
        labels = labels[labels]  # pointer halving
        if (labels == prev).all():
            break
    return ids, ids[labels]


def _cluster_distributed(pairs: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Same labels via the graph engine: renumber -> CSR shards ->
    distributed min-label CC. Driver state is O(pair-involved docs)."""
    from parallel_louvain_method_ray.algos.components import connected_components
    from parallel_louvain_method_ray.graph.build import build_graph, renumber

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pairs.column("doc_a"),
                "dst": pairs.column("doc_b"),
                "weight": pa.array(
                    np.ones(pairs.num_rows, np.float64), pa.float64()
                ),
            }
        )
    )
    edges_dense, vertices, n = renumber(edges)
    raw_ids = np.sort(
        pa.concat_tables(
            [pa.table(t) for t in vertices.iter_batches(batch_format="pyarrow")]
        )
        .column("raw_id")
        .to_numpy(zero_copy_only=False)
    )
    graph = build_graph(edges_dense, n_vertices=n)
    labels, _ = connected_components(graph)
    # dense CC label = min dense vid in component; dense rank order is the
    # sorted raw-id order, so raw_ids[label] = min raw doc_id in component
    return raw_ids, raw_ids[labels]


def near_dup_clusters(
    docs: ray.data.Dataset,
    threshold: float = 0.6,
    k: int = 3,
    driver_budget: int = 200_000,
    pairs: pa.Table | None = None,
) -> ray.data.Dataset:
    """(doc_id, cluster_id, keep) for EVERY doc: cluster_id = min doc_id
    of its near-dup component (own id when it has no near-dups), keep = 1
    exactly for the canonical member. `pairs` overrides the default exact
    shingle-jaccard pair source (column contract: doc_a, doc_b)."""
    if pairs is None:
        from parallel_louvain_method_ray.dedup.jaccard import shingle_jaccard_pairs

        pairs = shingle_jaccard_pairs(docs, threshold=threshold, k=k)

    if pairs.num_rows == 0:
        ids = np.empty(0, np.int64)
        cl = np.empty(0, np.int64)
    elif pairs.num_rows <= driver_budget:
        ids, cl = _cluster_driver(
            pairs.column("doc_a").to_numpy(zero_copy_only=False),
            pairs.column("doc_b").to_numpy(zero_copy_only=False),
        )
    else:
        ids, cl = _cluster_distributed(pairs)

    map_ref = ray.put((ids, cl))

    def label(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mids, mcl = ray.get(map_ref)
        idx = np.searchsorted(mids, d)
        idx_c = np.minimum(idx, max(mids.shape[0] - 1, 0))
        found = (
            (mids[idx_c] == d) if mids.shape[0] else np.zeros(d.shape[0], bool)
        )
        cluster = np.where(found, mcl[idx_c] if mids.shape[0] else d, d)
        return pa.table(
            {
                "doc_id": d,
                "cluster_id": cluster,
                "keep": (cluster == d).astype(np.int64),
            }
        )

    return docs.select_columns(["doc_id"]).map_batches(
        label, batch_format="pyarrow"
    )
