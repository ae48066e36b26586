"""Wave-5 operators: transition counts (boundary carries, tie
determinism), exact 2-hop ball sizes vs a sequential reference."""

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.algos.scc import ball2_sizes
from parallel_louvain_method_ray.ops.analytics import transition_counts


def _events(rows, parts=3):
    k, t, i, lab = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(k), pa.int64()),
                "t": pa.array(list(t), pa.int64()),
                "i": pa.array(list(i), pa.int64()),
                "lab": pa.array(list(lab), pa.string()),
            }
        )
    ).repartition(parts)


def _ref_transitions(rows):
    from collections import Counter, defaultdict

    byk = defaultdict(list)
    for k, t, i, lab in rows:
        byk[k].append((t, i, lab))
    c = Counter()
    for vs in byk.values():
        vs.sort()
        for (_, _, a), (_, _, b) in zip(vs, vs[1:]):
            c[(a, b)] += 1
    return dict(c)


def test_transitions_match_reference_across_partitionings(ray_session):
    rng = np.random.RandomState(17)
    labels = ["a", "b", "c"]
    rows = [
        (
            int(rng.randint(5)),
            int(rng.randint(1000)),
            idx,  # unique id -> deterministic order even with t ties
            labels[rng.randint(3)],
        )
        for idx in range(300)
    ]
    want = _ref_transitions(rows)
    for parts in (1, 4, 11):
        got = {
            (r["prev_label"], r["next_label"]): r["n"]
            for r in transition_counts(
                _events(rows, parts), "k", ["t", "i"], "lab"
            ).take_all()
        }
        assert got == want


def test_transitions_single_event_users_contribute_nothing(ray_session):
    rows = [(1, 10, 0, "a"), (2, 5, 1, "b"), (2, 9, 2, "c")]
    got = {
        (r["prev_label"], r["next_label"]): r["n"]
        for r in transition_counts(
            _events(rows, 2), "k", ["t", "i"], "lab"
        ).take_all()
    }
    assert got == {("b", "c"): 1}


def _edges_ds(pairs, parts=2):
    s, d = zip(*pairs)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(list(s), pa.int64()),
                "dst": pa.array(list(d), pa.int64()),
            }
        )
    ).repartition(parts)


def test_ball2_sizes_match_reference(ray_session):
    rng = np.random.RandomState(23)
    n = 25
    pairs = list(
        {(int(rng.randint(n)), int(rng.randint(n))) for _ in range(60)}
    )
    adj = [set() for _ in range(n)]
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
    want = {}
    for u in range(n):
        r = {u} | adj[u]
        for v in list(adj[u]):
            r |= adj[v]
        want[u] = len(r)
    got = {
        r["vid"]: r["ball2"]
        for r in ball2_sizes(_edges_ds(pairs), n, num_partitions=2).take_all()
    }
    assert got == want
