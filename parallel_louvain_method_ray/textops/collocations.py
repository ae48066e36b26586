"""Bigram collocation mining — phrase discovery for training-data
pipelines: global top-k adjacent word pairs ranked by count, scored with
association lift  p(w1 w2) / (p(w1) p(w2))  =  (c12 * T) / (c1 * c2).

Lift, not PMI: lift is PMI's argument before the log. The log is
dropped deliberately — `ln` is not correctly-rounded in IEEE, so numpy
and DuckDB could disagree in the last ulp and break the value-hash gate;
lift is one exactly-rounded division over exact integers (< 2^53), so
the engine float and the oracle float are bit-identical (then rounded
half-away-from-zero at 6 dp on both sides, `analysis.round6_sql`).

Distribution shape: the bigram stream is collapsed per batch (combiner
dicts keyed by the bigram's md5_lower64 — the shuffle carries 64-bit
hashes, never strings), one small groupby merges partials, and a
distributed (count desc, hash asc) sort + limit keeps only k rows on the
driver. Strings and unigram counts for the k winners come from one
broadcast-filtered second pass — O(k) driver rows, corpus never
collected. For key domains where even the hashed groupby's per-key
combine hurts, swap in `ops/fastgroup.count_by_key_sorted` (same rows).

Tokens are whitespace-split, matching the HLL / CMS convention
(`regexp_extract_all(text, '\\S+')` on the SQL side). The bigram key is
``w1 + chr(31) + w2``; chr(31) is assumed absent from tokens.

No counterpart in /root/reference (no text surface there); this extends
SURVEY §2.5's training-data operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.dedup.minhash import md5_lower64
from parallel_louvain_method_ray.textops.analysis import round6_sql

SEP = "\x1f"

_BIAS = np.uint64(1 << 63)


def _bias(h: np.ndarray) -> np.ndarray:
    """uint64 -> int64, order-preserving (x ^ 2^63 reinterpreted)."""
    return (h ^ _BIAS).view(np.int64)


def _unbias(h: np.ndarray) -> np.ndarray:
    return h.view(np.uint64) ^ _BIAS


def bigram_lift_topk(
    docs: ray.data.Dataset, k_top: int = 20, min_count: int = 5
) -> pa.Table:
    """(w1, w2, c12, c1, c2, lift) for the k_top bigrams by (count desc,
    md5 hash asc), count >= min_count."""

    def bi_partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        total = 0
        for t in batch.column("text").to_pylist():
            toks = t.split()
            total += len(toks)
            for w1, w2 in zip(toks, toks[1:]):
                key = w1 + SEP + w2
                counts[key] = counts.get(key, 0) + 1
        hs = np.fromiter(
            (md5_lower64(s) for s in counts), np.uint64, count=len(counts)
        )
        return pa.table(
            {
                # uint64 values above 2^63 fall off Arrow's fast path in
                # Ray Data's groupby (pickled-object blocks); the XOR-bias
                # view is an ORDER-PRESERVING remap into int64, so the
                # (n desc, h asc) tie-break still matches the oracle's
                # unsigned md5 ordering
                "h": pa.array(_bias(hs)),
                "n": pa.array(list(counts.values()), pa.int64()),
                # total-token rows are flagged by their own column, not a
                # sentinel hash value
                "is_total": pa.array(np.zeros(len(counts), np.int64)),
            }
        )

    def tot_partial(batch: pa.Table) -> pa.Table:
        total = sum(
            len(t.split()) for t in batch.column("text").to_pylist()
        )
        return pa.table(
            {
                "h": pa.array([0], pa.int64()),
                "n": pa.array([total], pa.int64()),
                "is_total": pa.array([1], pa.int64()),
            }
        )

    parts = docs.map_batches(bi_partial, batch_format="pyarrow").union(
        docs.map_batches(tot_partial, batch_format="pyarrow")
    )
    merged = parts.groupby(["h", "is_total"]).sum("n")

    def split_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": b.column("h"),
                "is_total": b.column("is_total"),
                "n": b.column("sum(n)"),
            }
        )

    # materialize: the merged table is tiny (distinct bigrams), and both
    # the total lookup and the top-k sort consume it — without this the
    # whole union+groupby DAG executes twice
    merged = merged.map_batches(split_cols, batch_format="pyarrow").materialize()
    total_rows = merged.filter(expr="is_total == 1").take_all()
    T = int(sum(r["n"] for r in total_rows))
    top = (
        merged.filter(expr=f"is_total == 0 and n >= {int(min_count)}")
        .sort(["n", "h"], descending=[True, False])
        .limit(k_top)
    )
    tabs = [pa.table(b) for b in top.iter_batches(batch_format="pyarrow")]
    top_t = pa.concat_tables(tabs) if tabs else None
    if top_t is None or top_t.num_rows == 0:
        return pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c12": pa.array([], pa.int64()),
                "c1": pa.array([], pa.int64()),
                "c2": pa.array([], pa.int64()),
                "lift": pa.array([], pa.float64()),
            }
        )
    top_h = np.sort(
        _unbias(top_t.column("h").to_numpy(zero_copy_only=False))
    )
    top_ref = ray.put(top_h)

    # second pass: recover the winning bigrams' strings — per-batch dedup,
    # O(k_top) rows per batch to the driver
    def recover_lean(batch: pa.Table) -> pa.Table:
        th = ray.get(top_ref)
        seen: dict[int, tuple[str, str]] = {}
        for t in batch.column("text").to_pylist():
            toks = t.split()
            for w1, w2 in zip(toks, toks[1:]):
                h = md5_lower64(w1 + SEP + w2)
                i = np.searchsorted(th, np.uint64(h))
                if i < th.shape[0] and th[i] == np.uint64(h):
                    seen[h] = (w1, w2)
        return pa.table(
            {
                "h": pa.array(
                    np.fromiter(seen.keys(), np.uint64, count=len(seen)),
                    pa.uint64(),
                ),
                "w1": pa.array([v[0] for v in seen.values()], pa.string()),
                "w2": pa.array([v[1] for v in seen.values()], pa.string()),
            }
        )

    rec = pa.concat_tables(
        [
            pa.table(b)
            for b in docs.map_batches(
                recover_lean, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    h2w: dict[int, tuple[str, str]] = {
        int(h): (w1, w2)
        for h, w1, w2 in zip(
            rec.column("h").to_pylist(),
            rec.column("w1").to_pylist(),
            rec.column("w2").to_pylist(),
        )
    }
    words = sorted({w for pair in h2w.values() for w in pair})
    words_ref = ray.put(np.array(words, dtype=object))

    def uni_partial(batch: pa.Table) -> pa.Table:
        want = set(ray.get(words_ref).tolist())
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for w in t.split():
                if w in want:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    uni_t = pa.concat_tables(
        [
            pa.table(b)
            for b in docs.map_batches(uni_partial, batch_format="pyarrow")
            .groupby("w")
            .sum("n")
            .iter_batches(batch_format="pyarrow")
        ]
    )
    uni = dict(
        zip(uni_t.column("w").to_pylist(), uni_t.column("sum(n)").to_pylist())
    )

    hs = _unbias(top_t.column("h").to_numpy(zero_copy_only=False)).tolist()
    c12 = top_t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    w1s = [h2w[int(h)][0] for h in hs]
    w2s = [h2w[int(h)][1] for h in hs]
    c1 = np.array([uni[w] for w in w1s], np.int64)
    c2 = np.array([uni[w] for w in w2s], np.int64)
    lift = round6_sql(
        (c12 * T).astype(np.float64) / (c1 * c2).astype(np.float64)
    )
    return pa.table(
        {
            "w1": pa.array(w1s, pa.string()),
            "w2": pa.array(w2s, pa.string()),
            "c12": c12,
            "c1": c1,
            "c2": c2,
            "lift": lift,
        }
    )
