"""Exact n-gram Jaccard similarity via an inverted shingle index.

Fully distributed shape (no driver-side pairwise loop):
    docs -> (shingle_hash, doc_id) postings        [map_batches]
         -> groupby(shingle) -> co-occurring pairs [postings join]
         -> groupby(pair).count = |A ∩ B|
         -> jaccard = inter / (|A| + |B| - inter)  [broadcast sizes]

Hot shingles (appearing in > max_posting docs) are dropped from pair
generation — the standard stop-shingle skew defense; they only reduce
reported similarity marginally and symmetrically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.dedup.minhash import _shingle_hashes
from parallel_louvain_method_ray.textops.analysis import round6_sql


def shingle_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    k: int = 3,
    max_posting: int = 500,
) -> pa.Table:
    """(doc_a, doc_b, jaccard) for pairs with exact shingle-set jaccard >=
    threshold (doc_a < doc_b)."""

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh_list = [_shingle_hashes(t, k) for t in batch.column("text").to_pylist()]
        counts = [s.shape[0] for s in sh_list]
        return pa.table(
            {
                "shingle": np.concatenate(sh_list)
                if sh_list
                else np.empty(0, np.uint64),
                "doc_id": np.repeat(ids, counts),
            }
        )

    post = docs.map_batches(postings, batch_format="pyarrow")

    # |A| per doc (broadcast for the final jaccard)
    sizes_t = pa.concat_tables(
        [
            pa.table(b)
            for b in post.groupby("doc_id")
            .count()
            .iter_batches(batch_format="pyarrow")
        ]
    )
    size_ids = sizes_t.column("doc_id").to_numpy(zero_copy_only=False)
    size_vals = sizes_t.column("count()").to_numpy(zero_copy_only=False)
    order = np.argsort(size_ids)
    sizes_ref = ray.put((size_ids[order], size_vals[order]))

    def shingle_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
        n = ids.shape[0]
        if n > max_posting:
            # stop-shingle: sentinel row (doc_a = -n) -> counted + logged by
            # the driver instead of a silent drop
            sent = int(group.column("shingle")[0].as_py()) & ((1 << 62) - 1)
            return pa.table(
                {
                    "doc_a": pa.array([-n], pa.int64()),
                    "doc_b": pa.array([sent], pa.int64()),
                }
            )
        if n < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        i, j = np.triu_indices(n, k=1)
        return pa.table({"doc_a": ids[i], "doc_b": ids[j]})

    inter = (
        post.groupby("shingle")
        .map_groups(shingle_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids_sorted, vals_sorted = ray.get(sizes_ref)
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        inter_n = batch.column("count()").to_numpy(zero_copy_only=False)
        sentinel = a < 0  # capped-bucket markers: pass through for the
        hi = ids_sorted.shape[0] - 1  # driver-side log
        sa = vals_sorted[np.minimum(np.searchsorted(ids_sorted, np.abs(a)), hi)]
        sb = vals_sorted[np.minimum(np.searchsorted(ids_sorted, np.abs(b)), hi)]
        jac = inter_n / np.maximum(sa + sb - inter_n, 1)
        jac[sentinel] = 1.0
        t = pa.table({"doc_a": a, "doc_b": b, "jaccard": round6_sql(jac)})
        return t.filter(pa.compute.greater_equal(t.column("jaccard"), threshold))

    out = inter.map_batches(finish, batch_format="pyarrow")
    from parallel_louvain_method_ray.dedup.simhash import _split_dropped_sentinels

    return _split_dropped_sentinels(
        pa.concat_tables(
            [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
        ),
        "jaccard",
    )
