"""Skew-aware aggregation primitives (SURVEY §4.2 "Skew" row).

`salted_groupby_sum` is the salted two-stage aggregate: hot keys are split
into `n_salts` sub-keys for the first (wide) shuffle, then a second (tiny)
groupby merges the partials. Identical result to a direct groupby — the
salting only changes the shuffle's key distribution so no single reducer
receives a hub key's entire row group. `degree_histogram` picks hub keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def degree_histogram(
    edges: ray.data.Dataset, key: str = "src"
) -> pa.Table:
    """(degree_bucket_pow2, n_keys): log2-bucketed key-frequency histogram —
    one pass + tiny groupby; used to choose the hub threshold."""
    counts = edges.groupby(key).count()

    def bucketize(batch: pa.Table) -> pa.Table:
        c = batch.column("count()").to_numpy(zero_copy_only=False)
        bucket = np.floor(np.log2(np.maximum(c, 1))).astype(np.int64)
        return pa.table({"bucket": bucket})

    hist = counts.map_batches(bucketize, batch_format="pyarrow").groupby(
        "bucket"
    ).count()
    t = pa.concat_tables(
        [pa.table(b) for b in hist.iter_batches(batch_format="pyarrow")]
    )
    return t.rename_columns(["degree_bucket_pow2", "n_keys"])


def salted_groupby_sum(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    n_salts: int = 16,
) -> ray.data.Dataset:
    """groupby(key).sum(value) with per-row salting:

        stage 1: groupby(key, salt = row_position % n_salts).sum  (wide)
        stage 2: groupby(key).sum                                  (tiny)

    Result identical to the direct groupby (float-sum association aside);
    the wide shuffle sees each hot key split across n_salts reducers.
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salt = (np.arange(n) % n_salts).astype(np.int64)
        return pa.table(
            {
                key: batch.column(key),
                "salt": salt,
                value: batch.column(value),
            }
        )

    stage1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "salt"])
        .sum(value)
    )

    def drop_salt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key: batch.column(key), value: batch.column(f"sum({value})")}
        )

    final = (
        stage1.map_batches(drop_salt, batch_format="pyarrow")
        .groupby(key)
        .sum(value)
    )
    return final.map_batches(
        lambda b: b.rename_columns([key, f"sum_{value}"]), batch_format="pyarrow"
    )
