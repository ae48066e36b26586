"""Bloom-filter build / probe: no false negatives ever, deterministic
false positives, block-count invariance, scalar-reference parity."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.ops.bloom import (
    BLOOM_PAD,
    _positions,
    _salt,
    bloom_contains,
    bloom_semi_join,
    build_bloom_bits,
)


def _scalar_positions(key: int, m_bits: int, k: int, seed: int) -> list[int]:
    """Independent scalar reference for the k bit positions."""
    out = []
    salt = int(_salt(seed))
    for j in range(k):
        x = (key * BLOOM_PAD + j + salt) & 0xFFFFFFFFFFFFFFFF
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        out.append(x & (m_bits - 1))
    return out


def test_positions_match_scalar_reference():
    keys = np.array([0, 1, 17, 2**40 + 3], np.uint64)
    got = _positions(keys, 4096, 3, _salt(7))
    for i, kv in enumerate(keys.tolist()):
        assert got[i].tolist() == _scalar_positions(kv, 4096, 3, 7)


def test_no_false_negatives_and_deterministic_fp():
    rng = np.random.default_rng(3)
    build_keys = rng.choice(100_000, size=400, replace=False).astype(np.int64)
    probe_keys = np.arange(5_000, dtype=np.int64)
    build = ray.data.from_arrow(pa.table({"k": build_keys})).repartition(3)
    m, k, seed = 4096, 3, 1
    bits = build_bloom_bits(build, "k", m, k, seed)

    got = bloom_contains(bits, probe_keys.view(np.uint64), m, k, _salt(seed))
    # every true member passes
    member = np.isin(probe_keys, build_keys)
    assert got[member].all()
    # pass set identical to the scalar-reference filter (fp included)
    ref_bits = np.zeros(m, np.uint8)
    for kv in build_keys.tolist():
        for p in _scalar_positions(kv, m, k, seed):
            ref_bits[p] = 1
    ref = np.array(
        [
            all(ref_bits[p] for p in _scalar_positions(kv, m, k, seed))
            for kv in probe_keys.tolist()
        ]
    )
    assert (got == ref).all()
    # the fixture is sized so fp exist but are rare
    n_fp = int(got.sum() - member.sum())
    assert 0 < n_fp < 500


def test_block_count_invariance_and_semi_join(ray_session):
    build_keys = np.arange(0, 900, 3, dtype=np.int64)
    probe = pa.table(
        {"pk": np.arange(1_000, dtype=np.int64), "payload": np.arange(1_000)}
    )
    expected = None
    for parts in (1, 4, 11):
        build = ray.data.from_arrow(
            pa.table({"bk": build_keys})
        ).repartition(parts)
        out = (
            bloom_semi_join(
                ray.data.from_arrow(probe).repartition(parts),
                "pk",
                build,
                "bk",
                m_bits=2048,
                k=4,
                seed=2,
                with_true_match=True,
            )
            .to_pandas()
            .sort_values("pk")
            .reset_index(drop=True)
        )
        if expected is None:
            expected = out
            # true members all present and flagged
            assert set(build_keys) <= set(out["pk"])
            tm = out.set_index("pk")["true_match"]
            assert (tm.loc[build_keys] == 1).all()
            assert (tm[~tm.index.isin(build_keys)] == 0).all()
        else:
            assert out.equals(expected)


def test_empty_build_side(ray_session):
    build = ray.data.from_arrow(pa.table({"bk": np.empty(0, np.int64)}))
    probe = ray.data.from_arrow(pa.table({"pk": np.arange(10, dtype=np.int64)}))
    out = bloom_semi_join(probe, "pk", build, "bk", m_bits=512, k=2)
    assert out.count() == 0
