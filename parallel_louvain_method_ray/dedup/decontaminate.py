"""Benchmark decontamination — the eval-leakage filter every serious
training-data pipeline runs (GPT-3 appendix C style): flag corpus
documents sharing any exact word n-gram with a benchmark set.

Shape: the benchmark side is SMALL by definition (eval suites, not the
corpus), so its distinct shingle hashes collapse per block and broadcast
once via `ray.put`; the corpus streams through one `map_batches` scoring
pass — zero shuffles, resumable, O(benchmark grams) driver state. The
gram vocabulary is `dedup.minhash._shingle_strings` (normalized word
k-grams, whole-text fallback under k tokens) so the oracle reuses the
jaccard family's SQL shingling verbatim; the engine joins on blake2b-64
hashes while SQL joins the strings themselves (same result — the hash is
injective at any realistic gram count, the same assumption `exact_dedup`
makes of md5).

Counts are PER POSITION (a gram hit twice in a doc counts twice): the
score is "how much of this document is benchmark text", not set overlap.

No counterpart in /root/reference; SURVEY §2.5 training-data family.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from parallel_louvain_method_ray.dedup.minhash import _shingle_strings


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """Per-POSITION shingle hashes (no dedup), blake2b-64 big-endian."""
    sh = _shingle_strings(text, k)
    out = np.empty(len(sh), np.uint64)
    for i, s in enumerate(sh):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out


def benchmark_gram_set(
    benchmark: ray.data.Dataset, k: int, text_col: str = "text"
) -> np.ndarray:
    """Sorted distinct gram hashes of the benchmark side — per-block
    unique partials, driver union."""
    def partial(batch: pa.Table) -> pa.Table:
        hs = [
            _gram_hashes(t, k) for t in batch.column(text_col).to_pylist()
        ]
        u = (
            np.unique(np.concatenate(hs))
            if hs
            else np.empty(0, np.uint64)
        )
        return pa.table({"h": pa.array(u, pa.uint64())})

    parts = [
        pa.table(b).column("h").to_numpy(zero_copy_only=False)
        for b in benchmark.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


def ngram_decontaminate(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    k: int = 5,
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_hits, contaminated) for every corpus doc: n_hits =
    number of gram POSITIONS whose gram appears anywhere in the
    benchmark set."""
    bench_ref = ray.put(benchmark_gram_set(benchmark, k, text_col))

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        hits = np.zeros(ids.shape[0], np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            g = _gram_hashes(t, k)
            if g.shape[0] == 0 or bench.shape[0] == 0:
                continue
            idx = np.searchsorted(bench, g)
            idx[idx >= bench.shape[0]] = 0
            hits[i] = int((bench[idx] == g).sum())
        return pa.table(
            {
                "doc_id": ids,
                "n_hits": hits,
                "contaminated": (hits > 0).astype(np.int64),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
