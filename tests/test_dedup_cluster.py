"""Near-dup clustering: transitive closure, canonical keeper, driver vs
distributed path parity, singleton handling."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.dedup.cluster import (
    _cluster_driver,
    near_dup_clusters,
)


def _docs(n, parts=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [f"doc {i} body" for i in range(n)],
            }
        )
    ).repartition(parts)


def _pairs(*ab):
    a, b = zip(*ab) if ab else ((), ())
    return pa.table(
        {
            "doc_a": pa.array(list(a), pa.int64()),
            "doc_b": pa.array(list(b), pa.int64()),
        }
    )


def test_transitive_closure_and_keep(ray_session):
    # chain 1-3-5, pair 7-8, singleton everything else
    out = (
        near_dup_clusters(_docs(10), pairs=_pairs((1, 3), (3, 5), (7, 8)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cl = dict(zip(out.doc_id, out.cluster_id))
    assert cl[1] == cl[3] == cl[5] == 1
    assert cl[7] == cl[8] == 7
    for i in (0, 2, 4, 6, 9):
        assert cl[i] == i
    keep = dict(zip(out.doc_id, out.keep))
    assert [i for i in range(10) if keep[i] == 1] == [0, 1, 2, 4, 6, 7, 9]


def test_driver_vs_distributed_parity(ray_session):
    rng = np.random.default_rng(11)
    n = 60
    edges = [
        (int(x), int(y))
        for x, y in rng.integers(0, n, size=(80, 2))
        if x != y
    ]
    pairs = _pairs(*[(min(a, b), max(a, b)) for a, b in edges])
    a = near_dup_clusters(_docs(n), pairs=pairs, driver_budget=10**6)
    b = near_dup_clusters(_docs(n), pairs=pairs, driver_budget=0)
    pa_df = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pb_df = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert pa_df.equals(pb_df)


def test_no_pairs_all_singletons(ray_session):
    out = near_dup_clusters(_docs(5), pairs=_pairs()).to_pandas()
    assert (out.cluster_id == out.doc_id).all()
    assert (out.keep == 1).all()


def test_cluster_driver_pointer_halving_long_chain():
    # worst case for propagation: a long path entered in reverse order
    n = 200
    a = np.arange(n - 1, 0, -1, dtype=np.int64)
    b = a - 1
    ids, cl = _cluster_driver(a, b)
    assert (cl == 0).all()
    assert (ids == np.arange(n)).all()


def test_real_pair_source_on_duplicate_texts(ray_session):
    texts = ["alpha beta gamma delta epsilon"] * 3 + [
        "zeta eta theta iota kappa",
        "completely different words here now",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {"doc_id": np.arange(5, dtype=np.int64), "text": texts}
        )
    ).repartition(2)
    out = near_dup_clusters(docs, threshold=0.9).to_pandas()
    cl = dict(zip(out.doc_id, out.cluster_id))
    assert cl[0] == cl[1] == cl[2] == 0
    assert cl[3] == 3 and cl[4] == 4
    assert int(out.keep.sum()) == 3
