"""Bloom tree-reduce path: identical bitmap to the driver-OR path."""

import numpy as np
import pyarrow as pa
import ray.data

import parallel_louvain_method_ray.ops.bloom as bloom


def test_tree_reduce_matches_driver_or(ray_session, monkeypatch):
    keys = np.arange(0, 3000, 7, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(9)
    small = bloom.build_bloom_bits(ds, "k", m_bits=1 << 14, k=4, seed=3)
    # force the tree path for the same (tiny) bitmap
    monkeypatch.setattr(bloom, "TREE_REDUCE_MIN_BYTES", 1)
    tree = bloom.build_bloom_bits(ds, "k", m_bits=1 << 14, k=4, seed=3)
    assert (small == tree).all()


def test_tree_reduce_empty_input(ray_session, monkeypatch):
    monkeypatch.setattr(bloom, "TREE_REDUCE_MIN_BYTES", 1)
    ds = ray.data.from_arrow(pa.table({"k": np.empty(0, np.int64)}))
    bits = bloom.build_bloom_bits(ds, "k", m_bits=1 << 10, k=2)
    assert bits.sum() == 0
