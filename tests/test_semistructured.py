"""Semi-structured JSON-field extraction: vectorized extract parity with
json.loads, miss accounting, all-miss groups, block invariance."""

import json

import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.ops.semistructured import (
    extract_json_int,
    json_field_stats,
)


def _events(rows, parts=2):
    g, p = zip(*rows) if rows else ((), ())
    t = pa.table(
        {
            "event_type": pa.array(list(g), pa.string()),
            "props": pa.array(list(p), pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(parts)


ROWS = [
    ("a", '{"k": 7}'),
    ("a", '{"k": -3, "x": 1}'),
    ("a", '{"x": 9}'),  # miss
    ("b", '{"k":0}'),
    ("b", '{ "k" : 41 }'),
    ("c", '{"other": 1}'),  # group with ONLY misses
]


def test_extract_matches_json_loads():
    out = pa.concat_tables(
        pa.table(b)
        for b in extract_json_int(_events(ROWS), "props", "k", "v")
        .iter_batches(batch_format="pyarrow")
    )
    got = dict(zip(out.column("props").to_pylist(), out.column("v").to_pylist()))
    for _, p in ROWS:
        want = json.loads(p).get("k")
        assert got[p] == want


def test_group_stats():
    out = pa.concat_tables(
        pa.table(b)
        for b in json_field_stats(
            _events(ROWS), "props", "k", "event_type"
        ).iter_batches(batch_format="pyarrow")
    )
    rows = {r["event_type"]: r for r in out.to_pylist()}
    assert rows["a"]["n_events"] == 2
    assert rows["a"]["sum_v"] == 4
    assert rows["a"]["min_v"] == -3
    assert rows["a"]["max_v"] == 7
    assert rows["a"]["n_missing"] == 1
    assert rows["a"]["avg_v"] == 2.0
    assert rows["b"]["n_events"] == 2
    assert rows["b"]["sum_v"] == 41
    assert rows["b"]["avg_v"] == 20.5
    # all-miss group: min/max/avg NULL, misses counted
    assert rows["c"]["n_events"] == 0
    assert rows["c"]["n_missing"] == 1
    assert rows["c"]["min_v"] is None
    assert rows["c"]["max_v"] is None
    assert rows["c"]["avg_v"] is None


def test_block_invariance():
    outs = []
    for parts in (1, 3, 6):
        out = pa.concat_tables(
            pa.table(b)
            for b in json_field_stats(
                _events(ROWS, parts=parts), "props", "k", "event_type"
            ).iter_batches(batch_format="pyarrow")
        )
        outs.append(sorted(out.to_pylist(), key=lambda r: r["event_type"]))
    assert outs[0] == outs[1] == outs[2]
