"""Distributed Bloom-filter build + semi-join pre-filter.

The classic 100 TB shuffle-avoidance tool: build a compact bit array over
the small side's join keys in ONE streaming pass (per-block packed-bit
partials OR-reduced at the driver — O(blocks x m/8) driver bytes, key
rows never leave their blocks), broadcast it once via ``ray.put``, and
drop probe-side rows inside ``map_batches`` BEFORE any shuffle join ever
sees them. False negatives are impossible by construction; false
positives are DETERMINISTIC because the k bit positions come from the
same counter-based splitmix64 hash the Kronecker generator uses
(`sources/kronecker.py:mix64`), so a DuckDB oracle can recompute the
exact pass/fail set — the filter itself is hash-checkable, not just the
downstream join.

At real scale m grows to GBs for billions of build keys; the driver OR
then becomes a tree reduce over the per-block partials (same associative
merge, log-depth) — the partial layout here is already that merge's leaf
format. The reference has no join machinery at all (its only "join" is
the CSR adjacency fold, `src/graph.cpp:51-63`); this is engine
infrastructure for fact-vs-dimension filtering at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.sources.kronecker import SEED_K, mix64

# counter layout: ctr = key * BLOOM_PAD + j  (hash index j < k <= PAD),
# plus a seed-folded salt — mirrored verbatim in the SQL oracle.
BLOOM_PAD = 8


def _salt(seed: int) -> np.uint64:
    return np.uint64((int(seed) * SEED_K) & 0xFFFFFFFFFFFFFFFF)


def _positions(keys_u64: np.ndarray, m_bits: int, k: int, salt: np.uint64) -> np.ndarray:
    """(len(keys), k) uint64 bit positions in [0, m_bits)."""
    with np.errstate(over="ignore"):
        ctr = (
            keys_u64[:, None] * np.uint64(BLOOM_PAD)
            + np.arange(k, dtype=np.uint64)[None, :]
            + salt
        )
        return (mix64(ctr.ravel()) & np.uint64(m_bits - 1)).reshape(-1, k)


def _as_u64(keys: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(keys.astype(np.int64)).view(np.uint64)


# above this many bytes per bitmap the driver OR-loop is replaced by a
# log-depth tree reduce over the per-block partials (a 1 GiB filter over
# thousands of blocks would otherwise stream every partial through the
# driver serially)
TREE_REDUCE_MIN_BYTES = 1 << 20
_TREE_FAN_IN = 8


@ray.remote
def _or_reduce(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out |= p
    return out


def build_bloom_bits(
    ds: ray.data.Dataset,
    key: str,
    m_bits: int = 1 << 13,
    k: int = 3,
    seed: int = 1,
) -> np.ndarray:
    """Packed big-endian bitmap (uint8[m_bits/8]) over the distinct values
    of ``ds[key]`` — per-block partials, then a driver OR for small
    bitmaps or a fan-in-8 tree reduce above TREE_REDUCE_MIN_BYTES (the
    merge is associative+commutative, so both orders are identical)."""
    if m_bits & (m_bits - 1) or m_bits < 8:
        raise ValueError(f"m_bits must be a power of two >= 8, got {m_bits}")
    if not (1 <= k <= BLOOM_PAD):
        raise ValueError(f"k must be in [1, {BLOOM_PAD}], got {k}")
    salt = _salt(seed)

    def partial(batch: pa.Table) -> pa.Table:
        keys = _as_u64(batch.column(key).to_numpy(zero_copy_only=False))
        bits = np.zeros(m_bits, np.uint8)
        if keys.shape[0]:
            bits[_positions(np.unique(keys), m_bits, k, salt).ravel()] = 1
        return pa.table(
            {"bits": pa.array([np.packbits(bits).tobytes()], pa.binary())}
        )

    parts_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    if m_bits // 8 < TREE_REDUCE_MIN_BYTES:
        out = np.zeros(m_bits // 8, np.uint8)
        for b in parts_ds.iter_batches(batch_format="pyarrow"):
            for raw in b.column("bits").to_pylist():
                out |= np.frombuffer(raw, np.uint8)
        return out
    # tree path: partials never transit the driver — each Dataset block is
    # OR-collapsed where it lives, then the refs tree-reduce
    @ray.remote
    def block_or(block) -> np.ndarray:
        t = block if isinstance(block, pa.Table) else pa.table(block)
        out = np.zeros(m_bits // 8, np.uint8)
        if "bits" not in t.column_names:  # schema-less empty block
            return out
        for raw in t.column("bits").to_pylist():
            out |= np.frombuffer(raw, np.uint8)
        return out

    refs = [
        block_or.remote(r)
        for r in parts_ds.materialize().get_internal_block_refs()
    ]
    if not refs:
        return np.zeros(m_bits // 8, np.uint8)
    while len(refs) > 1:
        refs = [
            _or_reduce.remote(*refs[i : i + _TREE_FAN_IN])
            for i in range(0, len(refs), _TREE_FAN_IN)
        ]
    return ray.get(refs[0])


def bloom_contains(
    bits: np.ndarray, keys_u64: np.ndarray, m_bits: int, k: int, salt: np.uint64
) -> np.ndarray:
    """Vectorized membership test against a packed bitmap -> bool array."""
    if keys_u64.shape[0] == 0:
        return np.zeros(0, bool)
    pos = _positions(keys_u64, m_bits, k, salt)
    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
    hit = (byte >> (np.uint64(7) - (pos & np.uint64(7))).astype(np.uint8)) & 1
    return hit.all(axis=1)


def bloom_semi_join(
    probe: ray.data.Dataset,
    probe_key: str,
    build: ray.data.Dataset,
    build_key: str,
    m_bits: int = 1 << 13,
    k: int = 3,
    seed: int = 1,
    with_true_match: bool = False,
) -> ray.data.Dataset:
    """Probe rows whose key passes the Bloom filter of the build side's
    keys (supserset of the exact semi-join by deterministic false
    positives). With ``with_true_match`` an extra int64 column marks the
    exact-member rows — the build keys are broadcast alongside the bitmap
    (sound only while the build side is the small side, which is the
    Bloom precondition anyway)."""
    salt = _salt(seed)
    bits_ref = ray.put(build_bloom_bits(build, build_key, m_bits, k, seed))
    true_ref = None
    if with_true_match:
        uniq = [
            np.unique(
                _as_u64(b.column(build_key).to_numpy(zero_copy_only=False))
            )
            for b in build.select_columns([build_key]).iter_batches(
                batch_format="pyarrow"
            )
        ]
        true_ref = ray.put(
            np.unique(np.concatenate(uniq)) if uniq else np.empty(0, np.uint64)
        )

    def filt(batch: pa.Table) -> pa.Table:
        keys = _as_u64(batch.column(probe_key).to_numpy(zero_copy_only=False))
        mask = bloom_contains(ray.get(bits_ref), keys, m_bits, k, salt)
        kept = batch.filter(pa.array(mask))
        if true_ref is None:
            return kept
        tk = ray.get(true_ref)
        kk = _as_u64(kept.column(probe_key).to_numpy(zero_copy_only=False))
        idx = np.searchsorted(tk, kk)
        idx[idx >= tk.shape[0]] = 0
        exact = (tk[idx] == kk) if tk.shape[0] else np.zeros(kk.shape[0], bool)
        return kept.append_column(
            "true_match", pa.array(exact.astype(np.int64), pa.int64())
        )

    return probe.map_batches(filt, batch_format="pyarrow")
