"""Embedding-cosine near-duplicate detection over the embeddings table.

Scale shape (no driver-side matrix, no all-pairs matmul): random-hyperplane
LSH blocking — each vector is bucketed by its sign pattern under
`n_planes` seeded hyperplanes, independently in `n_tables` tables; only
vectors sharing a (table, bucket) key are compared, via one small dense
matmul per bucket inside a `groupby(table, bucket).map_groups`. Duplicate
hits across tables collapse in a final pair-level groupby. Vectors ride
the shuffle as float64 byte blobs (binary column).

Recall is the standard LSH trade: a pair at cosine c collides in one
table with prob (1 - acos(c)/pi)^n_planes; tables multiply the chance.
With the defaults (4 tables x 8 planes), cosine 0.95 pairs are found with
~0.9 probability and near-identical pairs (the dedup target) with ~1.
Oversized buckets are capped + logged (sentinel rows), never silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

N_TABLES = 4
N_PLANES = 8
_PLANE_SEED = 9177


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    c = batch.column(col)
    combined = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    n = len(combined)
    flat = np.asarray(combined.flatten(), dtype=np.float64)
    return flat.reshape(n, flat.shape[0] // n) if n else flat.reshape(0, 0)


def _planes(dim: int, table: int) -> np.ndarray:
    """Deterministic hyperplanes, regenerated from the seed inside each
    task (cheaper than broadcasting an (n_planes, dim) float block)."""
    rng = np.random.default_rng(_PLANE_SEED + table)
    return rng.standard_normal((N_PLANES, dim))


def embedding_near_dups(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_tables: int = N_TABLES,
    max_bucket_size: int = 4000,
) -> pa.Table:
    """(vec_a, vec_b, cosine) for pairs with cosine >= threshold, vec_a <
    vec_b. LSH-blocked (approximate, see module docstring)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if ids.shape[0] == 0:
            return pa.table(
                {
                    "table_idx": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.large_binary()),
                }
            )
        mat = _batch_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        blobs = [unit[i].tobytes() for i in range(unit.shape[0])]
        out_t, out_b, out_i, out_v = [], [], [], []
        weights = 1 << np.arange(N_PLANES, dtype=np.int64)
        for t in range(n_tables):
            codes = (unit @ _planes(unit.shape[1], t).T) > 0
            buckets = (codes * weights).sum(axis=1)
            out_t.append(np.full(ids.shape[0], t, dtype=np.int64))
            out_b.append(buckets)
            out_i.append(ids)
            out_v.extend(blobs)
        return pa.table(
            {
                "table_idx": np.concatenate(out_t),
                "bucket": np.concatenate(out_b),
                "vec_id": np.concatenate(out_i),
                "vec": pa.array(out_v, pa.large_binary()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        # a vector can appear twice in a bucket if its id recurs; dedup ids
        order = np.argsort(ids)
        keep = np.ones(ids.shape[0], dtype=bool)
        keep[order[1:]] = ids[order[1:]] != ids[order[:-1]]
        k = int(keep.sum())
        if k > max_bucket_size:
            # sentinel (doc_a = -k): counted + logged by the driver
            sent = int(
                group.column("table_idx")[0].as_py() * (1 << 32)
                + group.column("bucket")[0].as_py()
            )
            return pa.table(
                {
                    "vec_a": pa.array([-k], pa.int64()),
                    "vec_b": pa.array([sent], pa.int64()),
                    "cosine": pa.array([2.0], pa.float64()),
                }
            )
        if k < 2:
            return empty
        sub_ids = ids[keep]
        blobs = group.column("vec").to_pylist()
        unit = np.stack(
            [np.frombuffer(blobs[i], dtype=np.float64) for i in np.flatnonzero(keep)]
        )
        sims = unit @ unit.T
        iu, ju = np.triu_indices(k, k=1)
        hit = sims[iu, ju] >= threshold
        if not hit.any():
            return empty
        a, b = sub_ids[iu[hit]], sub_ids[ju[hit]]
        s = sims[iu[hit], ju[hit]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table(
            {"vec_a": a2, "vec_b": b2, "cosine": np.round(s, 6)}
        )

    pairs = (
        embeddings.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table_idx", "bucket"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .min("cosine")
    )
    t = pa.concat_tables(
        [pa.table(b) for b in pairs.iter_batches(batch_format="pyarrow")]
    ).rename_columns(["vec_a", "vec_b", "cosine"])
    a = t.column("vec_a").to_numpy(zero_copy_only=False)
    dropped = a < 0
    if dropped.any():
        import logging

        logging.getLogger("parallel_louvain_method_ray").warning(
            "embedding_near_dups: %d bucket(s) over the size cap skipped "
            "(total %d member vectors)",
            int(dropped.sum()),
            int(-a[dropped].sum()),
        )
        t = t.filter(pa.array(~dropped))
    return t


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def embedding_near_dups_exact(
    embeddings: ray.data.Dataset, threshold: float = 0.42
) -> pa.Table:
    """(vec_a, vec_b, cosine) for ALL pairs with round(cosine, 6) >=
    threshold, vec_a < vec_b — the brute-force exactness BASELINE for
    `embedding_near_dups` (which is LSH-blocked and approximate).

    Shape: the normalized matrix is assembled once from a streaming pass
    and broadcast via `ray.put`; data batches stream through a matmul
    against it, each emitting only its own rows' pairs (i < j), so no
    batch ever holds more than (B x n) similarities. O(n^2) compute by
    definition of exact all-pairs — use the LSH variant at scale; this
    one exists for recall measurement and oracle checking."""
    ids_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    for b in embeddings.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if t.num_rows == 0:
            continue
        ids_parts.append(t.column("vec_id").to_numpy(zero_copy_only=False))
        mat_parts.append(_normalize_rows(_batch_matrix(t)))
    if not ids_parts:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    all_ids = np.concatenate(ids_parts).astype(np.int64)
    ref = ray.put((all_ids, np.vstack(mat_parts)))

    def pairs(batch: pa.Table) -> pa.Table:
        aids, au = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.shape[0] == 0:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        u = _normalize_rows(_batch_matrix(batch))
        sims = np.round(u @ au.T, 6)  # (B, n)
        keep = (sims >= threshold) & (ids[:, None] < aids[None, :])
        bi, aj = np.nonzero(keep)
        return pa.table(
            {
                "vec_a": ids[bi],
                "vec_b": aids[aj],
                "cosine": sims[bi, aj],
            }
        )

    out = embeddings.map_batches(pairs, batch_format="pyarrow")
    return pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
