"""Stratified hash sampling: per-stratum thresholds, determinism,
hash_sample consistency, key-type validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from parallel_louvain_method_ray.dedup.minhash import md5_lower64
from parallel_louvain_method_ray.ops.analytics import (
    hash_sample,
    stratified_hash_sample,
)


def _ds(n=400, parts=3):
    langs = ["en", "de", "fr", "zh"]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": [langs[i % 4] for i in range(n)],
            }
        )
    ).repartition(parts)


def test_per_stratum_thresholds(ray_session):
    out = stratified_hash_sample(
        _ds(), "doc_id", "lang", rates={"en": 5}, default=40
    ).to_pandas()
    for _, r in out.iterrows():
        lim = 5 if r["lang"] == "en" else 40
        assert md5_lower64(str(r["doc_id"])) % 100 < lim
    # everything passing the predicate is present
    expect = sum(
        1
        for i in range(400)
        if md5_lower64(str(i)) % 100 < (5 if i % 4 == 0 else 40)
    )
    assert len(out) == expect
    # the en stratum is visibly downsampled vs the others
    en = (out["lang"] == "en").sum()
    de = (out["lang"] == "de").sum()
    assert en < de


def test_uniform_rates_equal_hash_sample(ray_session):
    a = (
        stratified_hash_sample(_ds(), "doc_id", "lang", rates={}, default=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        hash_sample(_ds(), "doc_id", num=10, denom=100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_determinism_across_blocks(ray_session):
    a = stratified_hash_sample(
        _ds(parts=1), "doc_id", "lang", rates={"en": 5, "de": 25}, default=50
    ).to_pandas()
    b = stratified_hash_sample(
        _ds(parts=7), "doc_id", "lang", rates={"en": 5, "de": 25}, default=50
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_rejects_non_key_types(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1.5], pa.float64()), "s": ["x"]})
    )
    with pytest.raises(Exception, match="integer or string"):
        stratified_hash_sample(ds, "k", "s", rates={}).materialize()
