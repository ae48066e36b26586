"""Count-min sketch over the document token stream — the second
mergeable sketch next to HyperLogLog (`ops/sketch.py`): approximate
frequencies in O(depth x width) space with one-sided error
(estimate >= true count, overcount bounded by ~2e/width of the stream
length per row, min over depth rows).

Same register-exactness discipline as HLL: every cell value is a plain
COUNT of token occurrences whose splitmix64 cell index landed there, so a
DuckDB oracle recomputes the whole sketch cell-for-cell — and the
heavy-hitter estimates (min over depth cells) are exact integers on both
sides. Cell indices come from the Kronecker generator's counter-based
mix64 (`sources/kronecker.py`) over `md5_lower64(token) * PAD + row`,
the same counter layout the Bloom filter uses (`ops/bloom.py`).

Distribution shape: per-batch dense partial vectors collapse the token
stream locally (combiner), then ONE groupby over depth x width packed
cell keys — the shuffle never sees a token. Sketches from disjoint
shards merge by cell-wise addition, which is exactly what the groupby
sum does; at 100 TB the same partials tree-reduce.

No counterpart in /root/reference (no sketches there; SURVEY §2.5 lists
them as absent) — this is training-data-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.dedup.minhash import md5_lower64
from parallel_louvain_method_ray.ops.sketch import _token_hashes
from parallel_louvain_method_ray.sources.kronecker import mix64

from parallel_louvain_method_ray.ops.bloom import BLOOM_PAD as CMS_PAD
from parallel_louvain_method_ray.ops.bloom import _salt

CMS_DEPTH = 4
CMS_WIDTH = 1 << 12


def _cell_indices(
    hashes: np.ndarray, depth: int, width: int, salt: np.uint64
) -> np.ndarray:
    """(len(hashes), depth) int64 cell indices in [0, width)."""
    with np.errstate(over="ignore"):
        ctr = (
            hashes[:, None] * np.uint64(CMS_PAD)
            + np.arange(depth, dtype=np.uint64)[None, :]
            + salt
        )
        return (mix64(ctr.ravel()) & np.uint64(width - 1)).reshape(
            -1, depth
        ).astype(np.int64)


def cms_cells(
    docs: ray.data.Dataset,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = 1,
) -> ray.data.Dataset:
    """(r, cell, n) — the non-zero count-min cells over the whitespace
    token stream of `docs.text` (md5_lower64 token hashing, as HLL)."""
    if width & (width - 1) or width < 2:
        raise ValueError(f"width must be a power of two >= 2, got {width}")
    if not (1 <= depth <= CMS_PAD):
        raise ValueError(f"depth must be in [1, {CMS_PAD}], got {depth}")
    salt = _salt(seed)

    def partials(batch: pa.Table) -> pa.Table:
        acc = np.zeros(depth * width, np.int64)
        hs = [_token_hashes(t) for t in batch.column("text").to_pylist()]
        hs = [h for h in hs if h.shape[0]]
        if hs:
            cells = _cell_indices(np.concatenate(hs), depth, width, salt)
            # pack (row, cell) -> row * width + cell, count in one bincount
            packed = cells + np.arange(depth, dtype=np.int64)[None, :] * width
            acc += np.bincount(packed.ravel(), minlength=depth * width)
        nz = np.flatnonzero(acc)
        return pa.table({"rc": nz, "n": acc[nz]})

    merged = docs.map_batches(partials, batch_format="pyarrow").groupby(
        "rc"
    ).sum("n")

    def unpack(b: pa.Table) -> pa.Table:
        rc = b.column("rc").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r": rc // width,
                "cell": rc % width,
                "n": b.column("sum(n)"),
            }
        )

    return merged.map_batches(unpack, batch_format="pyarrow")


def cms_dense(
    docs: ray.data.Dataset,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = 1,
) -> np.ndarray:
    """Driver-side dense sketch (depth, width) int64 — O(depth x width)
    rows through the driver, independent of the stream length."""
    sk = np.zeros((depth, width), np.int64)
    for b in cms_cells(docs, depth, width, seed).iter_batches(
        batch_format="pyarrow"
    ):
        r = b.column("r").to_numpy(zero_copy_only=False)
        c = b.column("cell").to_numpy(zero_copy_only=False)
        sk[r, c] = b.column("n").to_numpy(zero_copy_only=False)
    return sk


def cms_heavy_hitters(
    docs: ray.data.Dataset,
    threshold: int = 50,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = 1,
) -> pa.Table:
    """(token, n_exact, cms_est) for tokens with exact global count >=
    threshold, next to their count-min point estimate (min over depth
    cells; always >= n_exact). Exact counts ride the same combiner ->
    groupby pipeline as `textops.top_tokens`; the candidate set is small
    by the threshold, so the estimate lookup is a driver-side dense-array
    min over the O(depth x width) sketch."""
    salt = _salt(seed)
    sketch = cms_dense(docs, depth, width, seed)

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for tok in t.split():
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
    )
    hot = agg.map_batches(
        lambda b: b.rename_columns(["token", "n_exact"]).filter(
            pa.compute.greater_equal(b.column("sum(n)"), threshold)
        ),
        batch_format="pyarrow",
    )
    t = pa.concat_tables(
        [pa.table(b) for b in hot.iter_batches(batch_format="pyarrow")]
    )
    if t.num_rows == 0:
        return pa.table(
            {
                "token": pa.array([], pa.string()),
                "n_exact": pa.array([], pa.int64()),
                "cms_est": pa.array([], pa.int64()),
            }
        )
    toks = t.column("token").to_pylist()
    hashes = np.fromiter(
        (md5_lower64(s) for s in toks), np.uint64, count=len(toks)
    )
    cells = _cell_indices(hashes, depth, width, salt)
    est = sketch[np.arange(depth)[None, :], cells].min(axis=1)
    out = pa.table(
        {
            "token": t.column("token"),
            "n_exact": t.column("n_exact"),
            "cms_est": pa.array(est, pa.int64()),
        }
    )
    return out.sort_by([("n_exact", "descending"), ("token", "ascending")])
