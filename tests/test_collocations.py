"""Bigram collocation mining: brute-force parity, block invariance,
tie-break determinism, lift arithmetic."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.dedup.minhash import md5_lower64
from parallel_louvain_method_ray.textops.analysis import round6_sql
from parallel_louvain_method_ray.textops.collocations import SEP, bigram_lift_topk


def _docs(texts, parts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    ).repartition(parts)


def _brute(texts, k_top, min_count):
    bi: dict[tuple, int] = {}
    uni: dict[str, int] = {}
    total = 0
    for t in texts:
        toks = t.split()
        total += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for p in zip(toks, toks[1:]):
            bi[p] = bi.get(p, 0) + 1
    rows = [
        (w1, w2, c, uni[w1], uni[w2])
        for (w1, w2), c in bi.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[2], md5_lower64(r[0] + SEP + r[1])))
    rows = rows[:k_top]
    return [
        (
            w1,
            w2,
            c,
            c1,
            c2,
            float(round6_sql(np.array([c * total / (c1 * c2)]))[0]),
        )
        for w1, w2, c, c1, c2 in rows
    ]


TEXTS = [
    "new york new york city",
    "the big apple is new york",
    "new york has a big apple scene",
    "big apple big apple",
    "",
    "one token",
]


def test_matches_brute_force_across_blocks(ray_session):
    ref = _brute(TEXTS, k_top=5, min_count=2)
    for parts in (1, 2, 5):
        got = bigram_lift_topk(_docs(TEXTS, parts), k_top=5, min_count=2)
        rows = list(
            zip(*[got.column(i).to_pylist() for i in range(got.num_columns)])
        )
        assert sorted(rows) == sorted(ref)


def test_counts_and_lift_values(ray_session):
    got = bigram_lift_topk(_docs(TEXTS, 2), k_top=10, min_count=2)
    d = {
        (r["w1"], r["w2"]): r
        for r in [
            {c: got.column(c)[i].as_py() for c in got.column_names}
            for i in range(got.num_rows)
        ]
    }
    assert d[("new", "york")]["c12"] == 4
    assert d[("big", "apple")]["c12"] == 4
    T = sum(len(t.split()) for t in TEXTS)
    r = d[("new", "york")]
    assert r["lift"] == float(
        round6_sql(np.array([r["c12"] * T / (r["c1"] * r["c2"])]))[0]
    )
    # collocated pairs associate far above independence
    assert r["lift"] > 1.0


def test_min_count_filters_and_empty_corpus(ray_session):
    got = bigram_lift_topk(_docs(TEXTS, 2), k_top=10, min_count=100)
    assert got.num_rows == 0
    got2 = bigram_lift_topk(_docs(["", "   "], 1), k_top=5, min_count=1)
    assert got2.num_rows == 0


def test_topk_boundary_tiebreak_is_hash_order(ray_session):
    # four bigrams with the SAME count; k_top=2 must take the two with the
    # smallest md5 hash — the oracle's exact rule
    texts = ["a b", "c d", "e f", "g h"] * 3
    got = bigram_lift_topk(_docs(texts, 3), k_top=2, min_count=1)
    pairs = list(zip(got.column("w1").to_pylist(), got.column("w2").to_pylist()))
    ranked = sorted(
        [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")],
        key=lambda p: md5_lower64(p[0] + SEP + p[1]),
    )[:2]
    assert sorted(pairs) == sorted(ranked)
