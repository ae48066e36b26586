"""Sort-based exact count-by-key — a shuffle-equal, combine-free
alternative to ``ds.groupby(key).count()``.

Ray Data's sort-based groupby pays a per-distinct-key Python combine
(measured on this box: ~7 s at 50k distinct keys, ~0.5 s at 5k, while a
full ``ds.sort`` of the same rows is 0.14 s — NOTES_ROUND5 "Numbers").
For count-style aggregates the sort already did all the work: after
``ds.sort(key)`` every key's rows are globally contiguous, so each batch
counts its interior runs vectorized, and only the BOUNDARY runs (each
batch's first and last key, which may continue in a neighboring batch)
need a driver-side merge — O(2 x batches) driver rows, O(1) per row.

The correctness argument needs only two facts, both guaranteed by a
global sort regardless of how blocks are split into batches:
  (a) a key that appears in more than one batch is the first or last key
      of EVERY batch it touches (its rows are globally contiguous);
  (b) a key strictly interior to a batch appears in no other batch.
So interior runs are final as computed, and summing the boundary rows by
key at the driver yields exact global totals for the rest.

At 100 TB this performs the same all-to-all range shuffle the groupby
would; it removes only the per-key combine. Driver state stays
O(batches), independent of the key-domain size.

No counterpart in /root/reference (its only aggregation is the CSR
adjacency fold, `src/graph.cpp:51-63`); this is engine infrastructure
for the large-key-domain text/dedup operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _runs_sorted(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_start_indices, run_lengths) of a key-sorted 1-D array."""
    if keys.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    lens = np.diff(np.r_[starts, keys.shape[0]])
    return starts, lens


def boundary_run_totals(
    sorted_ds: ray.data.Dataset, key: str
) -> tuple[np.ndarray, np.ndarray]:
    """Global totals for every key that is the first or last key of any
    batch of a key-sorted dataset: ``(keys_sorted, totals)`` driver-side
    arrays. Keys strictly interior to one batch are absent by design —
    their batch-local run length already equals their global total."""

    def boundary_rows(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        if k.shape[0] == 0:
            return pa.table({key: k, "n": np.empty(0, np.int64)})
        if k[0] == k[-1]:  # whole batch is one run
            return pa.table(
                {key: k[:1], "n": np.array([k.shape[0]], np.int64)}
            )
        head = int(np.searchsorted(k, k[0], side="right"))
        tail = k.shape[0] - int(np.searchsorted(k, k[-1], side="left"))
        return pa.table(
            {key: np.array([k[0], k[-1]]), "n": np.array([head, tail], np.int64)}
        )

    parts = [
        pa.table(b)
        for b in sorted_ds.map_batches(
            boundary_rows, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts or (rows := pa.concat_tables(parts)).num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    bk = rows.column(key).to_numpy(zero_copy_only=False)
    bn = rows.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(bk, kind="stable")
    bk, bn = bk[order], bn[order]
    starts, _ = _runs_sorted(bk)
    totals = np.add.reduceat(bn, starts)
    return bk[starts], totals.astype(np.int64)


def count_by_key_sorted(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """Exact ``(key, n)`` per distinct key — identical rows to
    ``ds.groupby(key).count()`` (column named ``n``), via one range
    shuffle (sort) + vectorized run counting. Numeric key columns only
    (the run scan works on numpy views)."""
    s = ds.sort(key).materialize()
    bkeys, btotals = boundary_run_totals(s, key)

    def interior_runs(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        starts, lens = _runs_sorted(k)
        # first and last runs are boundary keys (merged at the driver)
        starts, lens = starts[1:-1], lens[1:-1]
        return pa.table({key: k[starts], "n": lens.astype(np.int64)})

    inter = s.map_batches(interior_runs, batch_format="pyarrow", batch_size=None)
    # bkeys carries the key column's numpy dtype (it was sliced from the
    # sorted batches), so type inference matches the interior-run tables
    btable = pa.table({key: pa.array(bkeys), "n": pa.array(btotals, pa.int64())})
    return inter.union(ray.data.from_arrow(btable))


def sum_by_key_sorted(
    ds: ray.data.Dataset, key: str, value_cols: list[str]
) -> ray.data.Dataset:
    """Exact ``(key, n, sum(<v>)...)`` per distinct key — the rows of
    ``ds.groupby(key).aggregate(Count(), Sum(v)...)`` with columns named
    ``n`` and ``sum_<v>``, via the same sort + run-scan machinery as
    `count_by_key_sorted` (no per-distinct-key Python combine). INTEGER
    value columns only — integer addition is associative, so partials
    merge exactly under any block split.

    Boundary handling generalizes `boundary_run_totals`: each batch
    ships its first/last run's (key, n, partial sums) to the driver; the
    driver reduceat-merges runs of the same key — O(2 x batches) driver
    rows regardless of key-domain size."""
    s = ds.sort(key).materialize()

    def boundary_rows(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        vs = {
            c: batch.column(c).to_numpy(zero_copy_only=False)
            for c in value_cols
        }
        for c, v in vs.items():
            if not np.issubdtype(v.dtype, np.integer):
                raise TypeError(
                    f"sum_by_key_sorted needs integer values, {c} is {v.dtype}"
                )
        if k.shape[0] == 0:
            return pa.table(
                {
                    key: k,
                    "n": np.empty(0, np.int64),
                    **{
                        f"sum_{c}": np.empty(0, np.int64) for c in value_cols
                    },
                }
            )
        if k[0] == k[-1]:
            return pa.table(
                {
                    key: k[:1],
                    "n": np.array([k.shape[0]], np.int64),
                    **{
                        f"sum_{c}": np.array([int(v.sum())], np.int64)
                        for c, v in vs.items()
                    },
                }
            )
        head = int(np.searchsorted(k, k[0], side="right"))
        tail = k.shape[0] - int(np.searchsorted(k, k[-1], side="left"))
        return pa.table(
            {
                key: np.array([k[0], k[-1]]),
                "n": np.array([head, tail], np.int64),
                **{
                    f"sum_{c}": np.array(
                        [int(v[:head].sum()), int(v[k.shape[0] - tail:].sum())],
                        np.int64,
                    )
                    for c, v in vs.items()
                },
            }
        )

    parts = [
        pa.table(b)
        for b in s.map_batches(
            boundary_rows, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ]
    sum_names = [f"sum_{c}" for c in value_cols]
    if parts and (rows := pa.concat_tables(parts)).num_rows > 0:
        bk = rows.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        starts, _ = _runs_sorted(bk)
        merged = {key: pa.array(bk[starts])}
        bn = rows.column("n").to_numpy(zero_copy_only=False)[order]
        merged["n"] = pa.array(
            np.add.reduceat(bn, starts).astype(np.int64), pa.int64()
        )
        for c in sum_names:
            bv = rows.column(c).to_numpy(zero_copy_only=False)[order]
            merged[c] = pa.array(
                np.add.reduceat(bv, starts).astype(np.int64), pa.int64()
            )
        btable = pa.table(merged)
    else:
        btable = pa.table(
            {
                key: pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                **{c: pa.array([], pa.int64()) for c in sum_names},
            }
        )

    def interior_runs(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        starts, lens = _runs_sorted(k)
        if starts.shape[0] <= 2:
            # whole batch is boundary runs
            return pa.table(
                {
                    key: k[:0],
                    "n": np.empty(0, np.int64),
                    **{c: np.empty(0, np.int64) for c in sum_names},
                }
            )
        out = {key: k[starts[1:-1]]}
        out["n"] = lens[1:-1].astype(np.int64)
        # reduceat over ALL runs, then drop the boundary first/last
        for c in value_cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            sums = np.add.reduceat(v, starts)
            out[f"sum_{c}"] = sums[1:-1].astype(np.int64)
        return pa.table(out)

    inter = s.map_batches(interior_runs, batch_format="pyarrow", batch_size=None)
    return inter.union(ray.data.from_arrow(btable))
