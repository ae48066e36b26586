"""Approximate-nearest-neighbor search over an embedding column.

- `cosine_topk`: brute-force baseline — the QUERY matrix is broadcast
  (ray.put once), each data batch computes a (B x Q) matmul and emits its
  local top-k per query; a final small groupby-merge keeps the global top-k.
  This is the scale shape: data streams, queries are the small side.
- `cosine_topk_lsh`: random-hyperplane LSH variant — data is bucketed by
  sign-pattern; only buckets matching a query's pattern (and its 1-bit
  neighbors) are scanned. Recall/throughput trade documented in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    c = batch.column(col)
    combined = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    n = len(combined)
    flat = np.asarray(combined.flatten(), dtype=np.float64)
    return flat.reshape(n, flat.shape[0] // n) if n else flat.reshape(0, 0)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def cosine_topk(
    embeddings: ray.data.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    exclude_ids: bool = True,
) -> pa.Table:
    """(query_id, vec_id, score): global top-k by cosine per query,
    deterministic tie-break (score desc, vec_id asc). `exclude_ids` drops
    hits whose vec_id equals the query_id (self-matches)."""
    q_unit = _normalize_rows(np.asarray(query_vecs, np.float64))
    q_ref = ray.put((np.asarray(query_ids, np.int64), q_unit))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if ids.shape[0] == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        dm = _normalize_rows(_batch_matrix(batch))
        sims = qm @ dm.T  # (Q, B)
        out_q, out_v, out_s = [], [], []
        kk = min(k + (1 if exclude_ids else 0), ids.shape[0])
        for qi in range(qids.shape[0]):
            row = sims[qi]
            # partial top-k then deterministic ordering
            cand = np.argpartition(-row, kk - 1)[:kk]
            order = np.lexsort((ids[cand], -row[cand]))
            sel = cand[order]
            if exclude_ids:
                sel = sel[ids[sel] != qids[qi]][:k]
            out_q.append(np.full(sel.shape[0], qids[qi], dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(row[sel])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "score": np.concatenate(out_s),
            }
        )

    parts = [
        pa.table(b)
        for b in embeddings.map_batches(local_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    t = pa.concat_tables(parts)
    # final merge (small: P * Q * k rows)
    qs = t.column("query_id").to_numpy(zero_copy_only=False)
    vs = t.column("vec_id").to_numpy(zero_copy_only=False)
    ss = t.column("score").to_numpy(zero_copy_only=False)
    out_q, out_v, out_s = [], [], []
    for q in np.unique(qs):
        m = qs == q
        order = np.lexsort((vs[m], -ss[m]))[:k]
        out_q.append(np.full(order.shape[0], q, dtype=np.int64))
        out_v.append(vs[m][order])
        out_s.append(ss[m][order])
    return pa.table(
        {
            "query_id": np.concatenate(out_q),
            "vec_id": np.concatenate(out_v),
            "score": np.round(np.concatenate(out_s), 6),
        }
    )


def queries_from_dataset(
    embeddings: ray.data.Dataset, ids: list[int]
) -> tuple[np.ndarray, np.ndarray]:
    """Fetch specific vec_ids as the query matrix (small side)."""
    want = set(ids)

    def pick(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = [i for i, x in enumerate(v.tolist()) if x in want]
        return batch.take(pa.array(keep, type=pa.int64()))

    t = pa.concat_tables(
        [
            pa.table(b)
            for b in embeddings.map_batches(pick, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    got = t.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.argsort(got)
    mat = _batch_matrix(t)[order]
    return got[order], mat


def cosine_topk_lsh(
    embeddings: ray.data.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    exclude_ids: bool = True,
) -> pa.Table:
    """LSH-bucketed ANN: random-hyperplane sign buckets (seeded planes);
    each query scans only its bucket and the n_planes 1-bit-flip neighbor
    buckets. Approximate — recall measured in tests against cosine_topk."""
    rng = np.random.default_rng(777)
    dim = np.asarray(query_vecs).shape[1]
    planes = rng.standard_normal((n_planes, dim))
    planes_ref = ray.put(planes)
    q_unit = _normalize_rows(np.asarray(query_vecs, np.float64))
    q_codes = ((q_unit @ planes.T) > 0).astype(np.uint32)
    q_buckets = (q_codes * (1 << np.arange(n_planes, dtype=np.uint32))).sum(axis=1)
    wanted: set[int] = set()
    for b in q_buckets.tolist():
        wanted.add(int(b))
        for j in range(n_planes):
            wanted.add(int(b) ^ (1 << j))
    wanted_ref = ray.put(wanted)
    q_ref = ray.put((np.asarray(query_ids, np.int64), q_unit, q_buckets))

    def bucket_filter(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        want = ray.get(wanted_ref)
        dm = _normalize_rows(_batch_matrix(batch))
        codes = ((dm @ pl.T) > 0).astype(np.uint32)
        buckets = (codes * (1 << np.arange(pl.shape[0], dtype=np.uint32))).sum(axis=1)
        keep = np.fromiter(
            (int(b) in want for b in buckets.tolist()), bool, buckets.shape[0]
        )
        return batch.filter(pa.array(keep))

    filtered = embeddings.map_batches(bucket_filter, batch_format="pyarrow")
    return cosine_topk(
        filtered, query_vecs, query_ids, k=k, exclude_ids=exclude_ids
    )
