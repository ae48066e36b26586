"""MinHash + LSH near-duplicate detection.

Pipeline (the classic shingle -> minhash -> band -> bucket-groupby shape):
1. signatures: word 3-shingles of the normalized text, each hashed to a
   stable 64-bit integer (blake2b — NOT Python's salted hash()); P=64
   universal-hash permutations h_i(x) = (a_i*x + b_i) mod p minimized over
   the shingle set. Stateful actor: permutation table built once per actor.
2. banding: the signature is split into B=16 bands of r=4 rows; each band
   hashes to a bucket key. Docs sharing any band bucket become candidates
   (prob ~ jaccard^r per band — the standard S-curve).
3. candidate pairs come from a groupby on (band_idx, bucket) — the shuffle
   is keyed on buckets so a hot bucket is one group, never one task per
   pair; groups are capped (`max_bucket_size`) to bound quadratic blowup.
4. verification: exact shingle-set jaccard for candidates, threshold filter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.textops.analysis import _TOKEN, _normalize

# Mersenne prime 2^31-1: with 31-bit shingle hashes, a*x + b stays < 2^63,
# so the permutation sweep is a single vectorized int64 matrix op.
_P31 = (1 << 31) - 1
N_PERMS = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS


def _perm_params(n_perms: int = N_PERMS) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) universal-hash parameters (seeded PCG64)."""
    rng = np.random.default_rng(20240614)
    a = rng.integers(1, _P31, n_perms, dtype=np.int64)
    b = rng.integers(0, _P31, n_perms, dtype=np.int64)
    return a, b


def _shingle_strings(text: str, k: int = 3) -> list[str]:
    toks = _TOKEN.findall(_normalize(text))
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    shingles = _shingle_strings(text, k)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return np.unique(out)


def md5_lower64(s: str) -> int:
    """Lower 64 bits of md5 exactly as DuckDB's `md5_number_lower`: the
    LAST 8 digest bytes, little-endian — a SQL-replicable 64-bit hash."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


class MinHasher:
    """Actor stage: permutation table in __init__, signatures per batch."""

    def __init__(self) -> None:
        self.a, self.b = _perm_params()

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text)
        if sh.shape[0] == 0:
            return np.full(N_PERMS, _P31, dtype=np.int64)
        x = (sh % _P31).astype(np.int64)
        # (P, S) int64 matrix — fully vectorized permutation sweep
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _P31
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": ids,
                "signature": pa.array(
                    [s.tolist() for s in sigs], pa.large_list(pa.int64())
                ),
            }
        )


def minhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(MinHasher), batch_format="pyarrow", batch_size=128
    )


class MinHasherMD5(MinHasher):
    """Oracle-checkable MinHash: identical shingling and permutation sweep
    to `MinHasher`, but the shingle hash is `md5_lower64 % p` (replicable
    in DuckDB as `md5_number_lower(shingle) % 2147483647`) and signatures
    come out LONG — one (doc_id, perm_idx, sig) row per permutation — so a
    SQL oracle can recompute the whole signature matrix row for row. The
    blake2b production path stays the default (faster digest); this
    variant pins the permutation/min logic under the driver's hash gate."""

    def signature(self, text: str) -> np.ndarray:
        shingles = _shingle_strings(text)
        if not shingles:
            return np.full(N_PERMS, _P31, dtype=np.int64)
        x = np.fromiter(
            (md5_lower64(s) % _P31 for s in shingles),
            dtype=np.int64,
            count=len(shingles),
        )
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _P31
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = ids.shape[0]
        sigs = (
            np.stack([self.signature(t) for t in batch.column("text").to_pylist()])
            if n
            else np.empty((0, N_PERMS), np.int64)
        )
        return pa.table(
            {
                "doc_id": np.repeat(ids, N_PERMS),
                "perm_idx": np.tile(np.arange(N_PERMS, dtype=np.int64), n),
                "sig": sigs.reshape(-1),
            }
        )


def minhash_signatures_md5(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(MinHasherMD5), batch_format="pyarrow", batch_size=128
    )


def _bands(batch: pa.Table) -> pa.Table:
    """signature row -> N_BANDS (doc_id, band_idx, bucket) rows."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    col = batch.column("signature")
    combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(combined.flatten()).reshape(len(ids), N_PERMS)
    out_id, out_band, out_bucket = [], [], []
    for j in range(N_BANDS):
        band = flat[:, j * ROWS_PER_BAND : (j + 1) * ROWS_PER_BAND]
        for i in range(len(ids)):
            bucket = hashlib.blake2b(
                band[i].tobytes(), digest_size=8
            ).hexdigest()
            out_id.append(int(ids[i]))
            out_band.append(j)
            out_bucket.append(bucket)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band_idx": pa.array(out_band, pa.int64()),
            "bucket": pa.array(out_bucket, pa.string()),
        }
    )


def near_dup_pairs_minhash(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    max_bucket_size: int = 200,
    join_partitions: int = 4,
) -> pa.Table:
    """(doc_a, doc_b, jaccard) for verified near-duplicate pairs
    (doc_a < doc_b, exact shingle jaccard >= threshold).

    Verification is fully DISTRIBUTED: the candidate-doc shingle sets are a
    Dataset (semi-join of docs against the candidate ids) attached to the
    pair table with two hash joins — no driver-side shingle map, so a high
    duplicate rate cannot blow the driver heap. Capped buckets are counted
    and logged (sentinel rows), never silently dropped."""
    sigs = minhash_signatures(docs)
    bands = sigs.map_batches(_bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
        n = ids.shape[0]
        if n > max_bucket_size:
            # sentinel row (doc_a = -n): the driver logs the capped bucket
            sent = int.from_bytes(
                hashlib.blake2b(
                    group.column("bucket")[0].as_py().encode(), digest_size=7
                ).digest(),
                "big",
            )
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

    cand = (
        bands.groupby(["band_idx", "bucket"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
        .select_columns(["doc_a", "doc_b"])
        .materialize()
    )
    # The candidate-PAIR table stays a DATASET end-to-end (pair counts are
    # O(dup-rate^2) per bucket and unbounded globally — collecting them to
    # the driver was the round-2 scale-killer). Capped-bucket sentinel rows
    # (doc_a < 0) are counted with a tiny aggregate, logged once, and
    # stripped inside map_batches.
    from ray.data.aggregate import Sum

    sent_counts = cand.map_batches(
        lambda b: pa.table(
            {
                "n_buckets": pa.array(
                    [int((b.column("doc_a").to_numpy(zero_copy_only=False) < 0).sum())],
                    pa.int64(),
                ),
                "n_docs": pa.array(
                    [
                        int(
                            -b.column("doc_a")
                            .to_numpy(zero_copy_only=False)
                            .clip(max=0)
                            .sum()
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("n_buckets"), Sum("n_docs"))
    n_capped = int(sent_counts.get("sum(n_buckets)") or 0)
    if n_capped:
        import logging

        logging.getLogger("parallel_louvain_method_ray").warning(
            "minhash: %d bucket(s) over the size cap were skipped "
            "(total %d member docs) — raise max_bucket_size for full recall",
            n_capped,
            int(sent_counts.get("sum(n_docs)") or 0),
        )
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    cand_ds = cand.map_batches(
        lambda b: b.filter(
            pa.compute.greater_equal(b.column("doc_a"), pa.scalar(0))
        ),
        batch_format="pyarrow",
    ).materialize()
    if cand_ds.count() == 0:
        return empty

    # distinct candidate ids as a Dataset -> semi-join filters docs
    def both_sides(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": np.concatenate(
                    [
                        batch.column("doc_a").to_numpy(zero_copy_only=False),
                        batch.column("doc_b").to_numpy(zero_copy_only=False),
                    ]
                )
            }
        )

    members = (
        cand_ds.map_batches(both_sides, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .select_columns(["doc_id"])
    )
    relevant = docs.join(
        members, join_type="left_semi", num_partitions=join_partitions,
        on=("doc_id",),
    ).materialize()

    def shingles_of(batch: pa.Table) -> pa.Table:
        # shingle sets ride the hash joins as BINARY blobs (uint64 bytes) —
        # Acero joins reject list-typed non-key fields
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sh": pa.array(
                    [
                        _shingle_hashes(t).tobytes()
                        for t in batch.column("text").to_pylist()
                    ],
                    pa.large_binary(),
                ),
            }
        )

    sh_ds = relevant.map_batches(shingles_of, batch_format="pyarrow")
    sh_a = sh_ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "sh_a"]), batch_format="pyarrow"
    )
    sh_b = sh_ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "sh_b"]), batch_format="pyarrow"
    )
    j1 = cand_ds.join(
        sh_a, join_type="inner", num_partitions=join_partitions,
        on=("doc_a",), right_on=("doc_id",),
    ).select_columns(["doc_a", "doc_b", "sh_a"]).materialize()
    j2 = j1.join(
        sh_b, join_type="inner", num_partitions=join_partitions,
        on=("doc_b",), right_on=("doc_id",),
    ).select_columns(["doc_a", "doc_b", "sh_a", "sh_b"])

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        col_a = batch.column("sh_a").to_pylist()
        col_b = batch.column("sh_b").to_pylist()
        jac = np.empty(a.shape[0], dtype=np.float64)
        for i in range(a.shape[0]):
            sa = np.frombuffer(col_a[i], dtype=np.uint64)
            sb = np.frombuffer(col_b[i], dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
            union = sa.shape[0] + sb.shape[0] - inter
            jac[i] = inter / union if union else 0.0
        t = pa.table({"doc_a": a, "doc_b": b, "jaccard": np.round(jac, 6)})
        return t.filter(pa.compute.greater_equal(t.column("jaccard"), threshold))

    out = j2.map_batches(verify, batch_format="pyarrow")
    parts = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else empty
