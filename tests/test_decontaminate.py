"""Benchmark decontamination: exact-gram semantics, per-position counts,
short-doc fallback, block invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.dedup.decontaminate import ngram_decontaminate


def _ds(texts, parts=2, id0=0):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(id0, id0 + len(texts), dtype=np.int64),
                "text": texts,
            }
        )
    ).repartition(parts)


def test_exact_gram_overlap_flags(ray_session):
    bench = _ds(["the quick brown fox jumps over the lazy dog"])
    corpus = _ds(
        [
            "quick brown fox jumps over cliffs",  # shares 5-gram? check below
            "totally unrelated words in this doc",
            "a the quick brown fox jumps over the lazy dog b",  # full overlap
            "",
        ],
        parts=3,
        id0=100,
    )
    out = (
        ngram_decontaminate(corpus, bench, k=5)
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 100: its only shared 5-gram candidates: "quick brown fox jumps
    # over" — present in benchmark
    assert out.loc[100, "contaminated"] == 1
    assert out.loc[101, "contaminated"] == 0
    # doc 102 contains the whole benchmark sentence: 5 positions of its
    # 5-grams (11 tokens -> 7 grams, 5 of them inside the quote) hit
    assert out.loc[102, "n_hits"] == 5
    assert out.loc[103, "n_hits"] == 0


def test_per_position_counts_repeats(ray_session):
    bench = _ds(["a b c d e"])
    corpus = _ds(["a b c d e x a b c d e"], id0=7)  # the gram appears twice
    out = ngram_decontaminate(corpus, bench, k=5).to_pandas()
    assert out.loc[0, "n_hits"] == 2


def test_short_doc_whole_text_fallback(ray_session):
    bench = _ds(["tiny doc"])
    corpus = _ds(["tiny doc", "tiny", "some other thing"], id0=0)
    out = ngram_decontaminate(corpus, bench, k=5).to_pandas().set_index("doc_id")
    # "tiny doc" < k tokens -> whole-text shingle on both sides
    assert out.loc[0, "contaminated"] == 1
    assert out.loc[1, "contaminated"] == 0
    assert out.loc[2, "contaminated"] == 0


def test_block_invariance(ray_session):
    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=20)) for _ in range(40)
    ]
    bench = _ds(texts[:3])
    ref = None
    for parts in (1, 4, 9):
        out = (
            ngram_decontaminate(_ds(texts, parts), bench, k=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if ref is None:
            ref = out
            assert (ref.loc[:2, "contaminated"] == 1).all()
        else:
            assert out.equals(ref)
