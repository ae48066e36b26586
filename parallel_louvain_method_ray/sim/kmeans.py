"""Distributed k-means (one exact Lloyd iteration) over an embedding
column — the clustering shape for training-data curation (topic bucketing,
dedup blocking, curriculum mixing).

Exactness contract: embeddings are quantized once to int64
(floor(x * 2^20 + 0.5), float->double exact, one correctly-rounded
multiply) and ALL distance / centroid arithmetic runs on those integers —
squared-L2 sums and centroid partial sums are associative, so the result
is bit-identical to the SQL oracle under any batch split or reduction
order. Max magnitude: |x| <= ~8 -> q <= 2^23, per-dim diff^2 <= 2^47,
x 64 dims < 2^53 — exact in int64 (and in the oracle's BIGINT).

Distribution shape:
  - assign: centroids are K rows broadcast in the task closure (K x D
    ints); each batch computes K vectorized (B x D) diff-square sums —
    data streams, nothing materializes.
  - update: fused into the same pass — each batch emits K x D partial
    (centroid, dim, sum, n) rows, one tiny groupby merges them. At
    100 TB each Lloyd iteration is ONE streaming pass + an O(K x D)
    shuffle, the textbook combiner pattern.

No counterpart in /root/reference; extends SURVEY §2.5's similarity /
clustering operators alongside `sim/search.py`'s IVF quantizer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.sim.search import _batch_matrix

QUANT = 1048576.0  # 2^20


def quantize_matrix(m: np.ndarray) -> np.ndarray:
    """float embedding matrix -> int64, floor(x * 2^20 + 0.5)."""
    return np.floor(m.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def load_centroids(
    embeddings: ray.data.Dataset, centroid_vec_ids: list[int]
) -> tuple[np.ndarray, np.ndarray]:
    """(cids, C): the K seed rows, quantized. K is tiny — the filter
    collects K rows, never the table."""
    want = np.asarray(sorted(centroid_vec_ids), dtype=np.int64)

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(ids, want)))

    rows = embeddings.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    cids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    C = quantize_matrix(np.array([r["embedding"] for r in rows]))
    return cids, C


def _assign_block(Q: np.ndarray, cids: np.ndarray, C: np.ndarray):
    """Exact argmin over K centroids, ties -> lowest centroid id.
    Returns (best_cid, best_d2). Centroid ids ascend, so a strict-less
    scan implements the tie rule."""
    n = Q.shape[0]
    best_d = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    best_c = np.empty(n, dtype=np.int64)
    for k in range(len(cids)):
        diff = Q - C[k]
        d2 = np.einsum("ij,ij->i", diff, diff)
        better = d2 < best_d
        best_d[better] = d2[better]
        best_c[better] = cids[k]
    return best_c, best_d


def kmeans_assign(
    embeddings: ray.data.Dataset, cids: np.ndarray, C: np.ndarray
) -> ray.data.Dataset:
    """(vec_id, centroid_id, dist2) per vector."""

    def assign(batch: pa.Table) -> pa.Table:
        Q = quantize_matrix(_batch_matrix(batch))
        best_c, best_d = _assign_block(Q, cids, C)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "centroid_id": pa.array(best_c),
                "dist2": pa.array(best_d),
            }
        )

    return embeddings.map_batches(assign, batch_format="pyarrow")


def kmeans_update(
    embeddings: ray.data.Dataset, cids: np.ndarray, C: np.ndarray
) -> ray.data.Dataset:
    """(centroid_id, dim, sum_q, n): integer centroid-update partials,
    assign fused into the same streaming pass (the mean is sum_q / n —
    left as exact integers so the oracle hash is division-free)."""
    D = C.shape[1]

    def partial(batch: pa.Table) -> pa.Table:
        Q = quantize_matrix(_batch_matrix(batch))
        best_c, _ = _assign_block(Q, cids, C)
        out_c, out_dim, out_sum, out_n = [], [], [], []
        for k in cids:
            sel = best_c == k
            nk = int(sel.sum())
            if nk == 0:
                continue
            s = Q[sel].sum(axis=0)
            out_c.extend([int(k)] * D)
            out_dim.extend(range(D))
            out_sum.extend(s.tolist())
            out_n.extend([nk] * D)
        return pa.table(
            {
                "centroid_id": pa.array(out_c, pa.int64()),
                "dim": pa.array(out_dim, pa.int64()),
                "sum_q": pa.array(out_sum, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby(["centroid_id", "dim"])
        .aggregate(Sum("sum_q"), Sum("n"))
    )
    return agg.rename_columns({"sum(sum_q)": "sum_q", "sum(n)": "n"})
