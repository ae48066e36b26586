"""SimHash near-duplicate detection.

64-bit SimHash over token hashes (Charikar): each token contributes its
blake2b-64 bit pattern weighted by its count; the signature is the sign
vector of the summed columns. Near-dup candidates come from banding the
64-bit signature into four 16-bit chunks (two docs within Hamming distance
3 share at least one exact chunk); verification is exact Hamming distance.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.textops.analysis import _TOKEN, _normalize

_N_CHUNKS = 4


def _simhash64(text: str) -> int:
    counts: dict[str, int] = {}
    for tok in _TOKEN.findall(_normalize(text)):
        counts[tok] = counts.get(tok, 0) + 1
    if not counts:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    bits = np.arange(63, -1, -1, dtype=np.uint64)
    for tok, c in counts.items():
        h = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
        )
        v = (np.uint64(h) >> bits) & np.uint64(1)
        acc += np.where(v.astype(bool), c, -c)
    sig = np.uint64(0)
    for b in range(64):
        if acc[b] > 0:
            sig |= np.uint64(1) << np.uint64(63 - b)
    return int(sig)


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            _simhash64(t) for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(sigs, pa.uint64()),
            }
        )


def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(SimHasher), batch_format="pyarrow", batch_size=128
    )


def _simhash64_md5(text: str) -> int:
    """SimHash with the SQL-replicable token hash (`md5_lower64`, DuckDB's
    md5_number_lower): bit p of the signature is set iff the count-weighted
    sum of (±1 per token, + when bit p of the token hash is set) is > 0 —
    the same Charikar rule as `_simhash64`, hash swapped."""
    from parallel_louvain_method_ray.dedup.minhash import md5_lower64

    counts: dict[str, int] = {}
    for tok in _TOKEN.findall(_normalize(text)):
        counts[tok] = counts.get(tok, 0) + 1
    if not counts:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    bits = np.arange(64, dtype=np.uint64)
    for tok, c in counts.items():
        v = (np.uint64(md5_lower64(tok)) >> bits) & np.uint64(1)
        acc += np.where(v.astype(bool), c, -c)
    sig = 0
    for p in range(64):
        if acc[p] > 0:
            sig |= 1 << p
    return sig


class SimHasherMD5:
    """Long-form (doc_id, chunk_idx, chunk_val) signatures — the 64-bit
    simhash split into four 16-bit chunks (the same chunks the LSH banding
    uses) so every value is a small int64 a SQL oracle can reproduce."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = ids.shape[0]
        sigs = np.fromiter(
            (_simhash64_md5(t) for t in batch.column("text").to_pylist()),
            dtype=np.uint64,
            count=n,
        )
        shifts = (np.uint64(16) * np.arange(_N_CHUNKS, dtype=np.uint64))[None, :]
        vals = ((sigs[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "doc_id": np.repeat(ids, _N_CHUNKS),
                "chunk_idx": np.tile(np.arange(_N_CHUNKS, dtype=np.int64), n),
                "chunk_val": vals.reshape(-1),
            }
        )


def simhash_chunks_md5(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(SimHasherMD5), batch_format="pyarrow", batch_size=128
    )


def near_dup_pairs_simhash(
    docs: ray.data.Dataset, max_hamming: int = 3, max_bucket_size: int = 200
) -> pa.Table:
    """(doc_a, doc_b, hamming) pairs with Hamming distance <= max_hamming."""
    sigs = simhash_signatures(docs)

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = batch.column("simhash").to_numpy(zero_copy_only=False)
        out_id, out_chunk, out_val, out_sig = [], [], [], []
        for j in range(_N_CHUNKS):
            val = (s >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            out_id.append(ids)
            out_chunk.append(np.full(ids.shape[0], j, dtype=np.int64))
            out_val.append(val.astype(np.int64))
            out_sig.append(s)
        return pa.table(
            {
                "doc_id": np.concatenate(out_id),
                "chunk_idx": np.concatenate(out_chunk),
                "chunk_val": np.concatenate(out_val),
                "simhash": np.concatenate(out_sig),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sigs_ = group.column("simhash").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, sigs_ = ids[order], sigs_[order]
        keep = np.concatenate([[True], ids[1:] != ids[:-1]])
        ids, sigs_ = ids[keep], sigs_[keep]
        n = ids.shape[0]
        if n > max_bucket_size:
            # capped bucket: emit a SENTINEL row (doc_a = -n) so the driver
            # can count/log the drop instead of silently losing recall
            sent = int(
                group.column("chunk_idx")[0].as_py() * (1 << 32)
                + group.column("chunk_val")[0].as_py()
            )
            return pa.table(
                {
                    "doc_a": pa.array([-n], pa.int64()),
                    "doc_b": pa.array([sent], pa.int64()),
                    "hamming": pa.array([0], pa.int64()),
                }
            )
        if n < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        i, j = np.triu_indices(n, k=1)
        x = np.bitwise_xor(sigs_[i], sigs_[j])
        ham = np.zeros(x.shape[0], dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        keep2 = ham <= max_hamming
        return pa.table(
            {
                "doc_a": ids[i[keep2]],
                "doc_b": ids[j[keep2]],
                "hamming": ham[keep2],
            }
        )

    pairs = (
        sigs.map_batches(chunks, batch_format="pyarrow")
        .groupby(["chunk_idx", "chunk_val"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .min("hamming")
    )
    t = pa.concat_tables(
        [pa.table(b) for b in pairs.iter_batches(batch_format="pyarrow")]
    ).rename_columns(["doc_a", "doc_b", "hamming"])
    return _split_dropped_sentinels(t, "simhash")


def _split_dropped_sentinels(t: pa.Table, what: str) -> pa.Table:
    """Strip (and log) the capped-bucket sentinel rows (doc_a < 0)."""
    import logging

    a = t.column("doc_a").to_numpy(zero_copy_only=False)
    dropped = a < 0
    if dropped.any():
        logging.getLogger("parallel_louvain_method_ray").warning(
            "%s: %d bucket(s) over the size cap were skipped "
            "(total %d member docs) — raise max_bucket_size for full recall",
            what,
            int(dropped.sum()),
            int(-a[dropped].sum()),
        )
        t = t.filter(pa.array(~dropped))
    return t
