"""Hopping-window aggregate (ops/joins.py:hopping_window): brute-force
per-event window-membership parity, overlap accounting, block invariance,
and the window/hop validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from parallel_louvain_method_ray.ops.joins import hopping_window

W = 100
H = 25  # k = 4


def brute(rows):
    # every event belongs to the k windows whose [start, start+W) covers it
    out = {}
    k = W // H
    for key, ts, v in rows:
        cents = int(np.floor(v * 100.0 + 0.5))
        base = (ts // H) * H
        for i in range(k):
            ws = base - i * H
            cur = out.setdefault((key, ws), [0, 0])
            cur[0] += 1
            cur[1] += cents
    return {
        kk: (n, c) for kk, (n, c) in out.items()
    }


def _run(rows, nblocks):
    items = [{"k": key, "ts": ts, "v": v} for key, ts, v in rows]
    ds = ray.data.from_items(items, override_num_blocks=nblocks)
    got = hopping_window(
        ds, ts_col="ts", key_col="k", value_col="v", window_us=W, hop_us=H
    ).to_pandas()
    return {
        (r.k, r.window_start): (r.n_events, r.sum_value_cents)
        for r in got.itertuples()
    }


def test_matches_brute_force(ray_session):
    rng = np.random.RandomState(7)
    rows = [
        (f"t{rng.randint(3)}", int(rng.randint(0, 1000)), float(rng.randn() * 9))
        for _ in range(300)
    ]
    want = brute(rows)
    for nblocks in (1, 6):
        assert _run(rows, nblocks) == want


def test_each_event_counted_k_times(ray_session):
    rows = [("a", t, 1.0) for t in range(0, 500, 7)]
    got = _run(rows, 3)
    assert sum(n for n, _ in got.values()) == (W // H) * len(rows)
    # every window's sum is exactly 100 cents per contained event
    assert all(c == 100 * n for n, c in got.values())


def test_window_boundary_membership(ray_session):
    # an event at ts=H*j is in windows starting H*j, H*(j-1), ..., down
    # k-1 hops; an event one tick earlier shifts the whole set down one hop
    got = _run([("a", 100, 2.0), ("b", 99, 2.0)], 1)
    a_windows = sorted(ws for (k, ws), _ in got.items() if k == "a")
    b_windows = sorted(ws for (k, ws), _ in got.items() if k == "b")
    assert a_windows == [25, 50, 75, 100]
    assert b_windows == [0, 25, 50, 75]


def test_validation():
    ds = ray.data.from_items([{"k": "a", "ts": 0, "v": 0.0}])
    with pytest.raises(ValueError):
        hopping_window(
            ds, ts_col="ts", key_col="k", value_col="v",
            window_us=100, hop_us=33,
        )
