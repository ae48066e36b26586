"""Embedding-cosine near-duplicate detection over the embeddings table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _collect_matrix(embeddings: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix) — collected once; at scale this is the
    broadcast side of a block-wise matmul (each batch vs the broadcast)."""
    parts_id, parts_v = [], []
    for b in embeddings.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        col = t.column("embedding")
        combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(combined[0])
        flat = np.asarray(combined.flatten(), dtype=np.float64).reshape(len(ids), dim)
        parts_id.append(ids)
        parts_v.append(flat)
    ids = np.concatenate(parts_id)
    mat = np.concatenate(parts_v)
    order = np.argsort(ids)
    return ids[order], mat[order]


def embedding_near_dups(
    embeddings: ray.data.Dataset, threshold: float = 0.95
) -> pa.Table:
    """(vec_a, vec_b, cosine) for pairs with cosine >= threshold, vec_a <
    vec_b. Block-wise: each batch of rows is multiplied against the
    broadcast (normalized) matrix — O(N*D) per batch, no pairwise Python."""
    ids, mat = _collect_matrix(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    ref = ray.put((ids, unit))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        col = batch.column("embedding")
        combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = all_unit.shape[1]
        bm = np.asarray(combined.flatten(), dtype=np.float64).reshape(len(bids), dim)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        sims = (bm / bn[:, None]) @ all_unit.T  # (B, N)
        out_a, out_b, out_s = [], [], []
        for r in range(len(bids)):
            hits = np.flatnonzero(sims[r] >= threshold)
            for h in hits:
                if bids[r] < all_ids[h]:
                    out_a.append(int(bids[r]))
                    out_b.append(int(all_ids[h]))
                    out_s.append(float(sims[r, h]))
        return pa.table(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(np.round(np.array(out_s, np.float64), 6)),
            }
        )

    out = embeddings.map_batches(block, batch_format="pyarrow")
    return pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
