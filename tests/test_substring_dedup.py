"""duplicate_ngram_stats vs a brute-force in-process reference on planted
duplicate substrings."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.dedup.substring import (
    _doc_gram_hashes,
    duplicate_ngram_stats,
)


def _brute(docs: list[tuple[int, str]], k: int, stride: int):
    grams = {
        i: {t[p : p + k] for p in range(0, len(t) - k + 1, stride)}
        if len(t) >= k
        else set()
        for i, t in docs
    }
    out = {}
    for i, g in grams.items():
        dup = sum(
            1
            for x in g
            if any(x in go for j, go in grams.items() if j != i)
        )
        tot = len(g)
        ratio = np.floor(dup / max(tot, 1) * 1e6 + 0.5) / 1e6
        out[i] = (tot, dup, ratio)
    return out


def _run(docs, k, stride, blocks=3):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    ).repartition(blocks)
    res = pa.concat_tables(
        [
            pa.table(b)
            for b in duplicate_ngram_stats(ds, k=k, stride=stride).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    return {
        int(d): (int(t), int(u), float(r))
        for d, t, u, r in zip(
            res.column("doc_id").to_pylist(),
            res.column("ngrams_total").to_pylist(),
            res.column("dup_ngrams").to_pylist(),
            res.column("dup_ratio").to_pylist(),
        )
    }


def test_planted_duplicate_block():
    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, "unique preamble zero " + shared + " unique suffix zero"),
        (1, "another lead-in here " + shared + " and a different tail"),
        (2, "totally unrelated text with no overlap whatsoever in it"),
        (3, "short"),  # shorter than k -> zero grams
        (4, ""),  # empty
    ]
    k, stride = 12, 4
    got = _run(docs, k, stride)
    want = _brute(docs, k, stride)
    assert got == want
    # the planted block must actually register as duplication
    assert got[0][1] > 0 and got[1][1] > 0
    assert got[2][1] == 0
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_exact_copies_are_fully_duplicated():
    text = "word " * 40
    docs = [(0, text), (1, text), (2, "something else entirely " * 5)]
    got = _run(docs, 20, 5, blocks=2)
    want = _brute(docs, 20, 5)
    assert got == want
    assert got[0][2] == 1.0 and got[1][2] == 1.0


def test_hash_sampling_positions():
    # window starts are 0, stride, ... <= len-k (last partial window excluded)
    t = "abcdefghijklmnopqrstuvwxyz"  # len 26
    hs = _doc_gram_hashes(t, k=10, stride=8)
    # positions 0, 8, 16 -> 3 distinct grams
    assert hs.shape[0] == 3


def test_many_docs_cross_block_runs():
    # one gram shared by EVERY doc -> its posting run spans sorted batches
    rng = np.random.default_rng(3)
    shared = "communal sentence fragment shared by every document"
    docs = []
    for i in range(60):
        filler = " ".join(
            f"tok{rng.integers(0, 10_000)}" for _ in range(12)
        )
        docs.append((i, f"{filler} {shared} {filler[::-1]}"))
    k, stride = 16, 8
    got = _run(docs, k, stride, blocks=7)
    want = _brute(docs, k, stride)
    assert got == want
    assert all(got[i][1] > 0 for i in range(60))
