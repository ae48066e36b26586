"""Count-min sketch: cell-exact parity with a scalar reference, merge
(=block-count) invariance, one-sided heavy-hitter error."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.dedup.minhash import md5_lower64
from parallel_louvain_method_ray.ops.bloom import _salt
from parallel_louvain_method_ray.ops.cms import (
    CMS_PAD,
    cms_cells,
    cms_dense,
    cms_heavy_hitters,
)


def _scalar_cells(tok: str, depth: int, width: int, seed: int) -> list[int]:
    th = md5_lower64(tok)
    salt = int(_salt(seed))
    out = []
    for r in range(depth):
        x = (th * CMS_PAD + r + salt) & 0xFFFFFFFFFFFFFFFF
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        out.append(x & (width - 1))
    return out


def _docs(texts, parts):
    t = pa.table(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    return ray.data.from_arrow(t).repartition(parts)


TEXTS = [
    "a b c a a",
    "b b c d",
    "",
    "   ",
    "e a e",
    "f " * 40,
]


def _ref_sketch(texts, depth, width, seed):
    sk = np.zeros((depth, width), np.int64)
    for t in texts:
        for tok in t.split():
            for r, c in enumerate(_scalar_cells(tok, depth, width, seed)):
                sk[r, c] += 1
    return sk


def test_cells_match_scalar_reference_across_blocks(ray_session):
    ref = _ref_sketch(TEXTS, 3, 64, 5)
    for parts in (1, 2, 6):
        got = cms_dense(_docs(TEXTS, parts), depth=3, width=64, seed=5)
        assert (got == ref).all()


def test_cells_dataset_rows_are_nonzero_cells(ray_session):
    rows = cms_cells(_docs(TEXTS, 2), depth=3, width=64, seed=5).to_pandas()
    ref = _ref_sketch(TEXTS, 3, 64, 5)
    assert len(rows) == int((ref > 0).sum())
    for _, row in rows.iterrows():
        assert ref[int(row.r), int(row.cell)] == int(row.n)


def test_heavy_hitters_one_sided_and_exact_on_wide_sketch(ray_session):
    texts = ["x " * 30 + "y " * 10 + "z", "x x y rare"]
    hh = cms_heavy_hitters(
        _docs(texts, 2), threshold=5, depth=4, width=4096, seed=1
    )
    d = {t: (e, c) for t, e, c in zip(*[hh.column(i).to_pylist() for i in range(3)])}
    assert set(d) == {"x", "y"}
    assert d["x"][0] == 32 and d["y"][0] == 11
    # one-sided error, and on a 4096-wide sketch with 4 tokens: exact
    for e, c in d.values():
        assert c >= e
        assert c == e


def test_heavy_hitters_overcount_under_forced_collisions(ray_session):
    # width=2: every token collides; estimate must still be >= exact
    texts = ["p q r s " * 5]
    hh = cms_heavy_hitters(
        _docs(texts, 1), threshold=3, depth=2, width=2, seed=1
    )
    ref = _ref_sketch(texts, 2, 2, 1)
    for t, e, c in zip(*[hh.column(i).to_pylist() for i in range(3)]):
        assert e == 5
        assert c >= e
        cells = _scalar_cells(t, 2, 2, 1)
        assert c == min(ref[r, cells[r]] for r in range(2))
