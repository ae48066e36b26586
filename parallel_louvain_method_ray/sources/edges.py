"""Text edge-list source/sinks (reference I/O parity).

- `read_edge_list_text`: the reference's `edge_list_from_file`
  (`/root/reference/src/graph.cpp:24-49`): one `u v w` per whitespace-split
  line; malformed lines are SKIPPED and counted (the reference prints them
  to stderr) — here the bad-row count is an aggregate, not a side effect.
  A directory of per-rank shards (`dir/0..M-1`, the layout
  `main_distributed_community.cpp:33-41` expects) reads as one Dataset —
  Ray splits files into blocks itself, so the manual `split.py` sharding
  (`data/split.py`) is unnecessary.
- `write_edges_text`: `Graph::write_edges_to_file`
  (`src/graph.cpp:311-363`): upper-triangle (`src <= dst`) edges as text,
  one file per block written in parallel (no manual MPI_Exscan offsets).
- `write_communities`: `DistCommunities::write_communities_to_file`
  (`src/distcommunity.cpp:637-709`) — parquet partitioned output instead
  of one `community_<id>.txt` per community.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _try_parse(line: str):
    parts = line.split()
    # reference: `iss >> u >> v >> w` — needs at least 3 parseable tokens;
    # extra trailing tokens are ignored by the stream reads
    if len(parts) < 3:
        return None
    try:
        return int(parts[0]), int(parts[1]), float(parts[2])
    except ValueError:
        return None


def _parse_lines(batch: pa.Table) -> pa.Table:
    srcs, dsts, ws = [], [], []
    for line in batch.column("text").to_pylist():
        p = _try_parse(line)
        if p is not None:
            srcs.append(p[0])
            dsts.append(p[1])
            ws.append(p[2])
    return pa.table(
        {
            "src": pa.array(srcs, pa.int64()),
            "dst": pa.array(dsts, pa.int64()),
            "weight": pa.array(ws, pa.float64()),
        }
    )


def read_edge_list_text(
    path: str,
) -> tuple[ray.data.Dataset, int]:
    """Parse a text edge list (file or shard directory) into
    edges(src, dst, weight). Returns (edges, n_bad_lines) — the reference
    logs bad lines to stderr (`graph.cpp:42`); here they are counted by a
    cheap aggregate pass."""
    raw = ray.data.read_text(path)
    parsed = raw.map_batches(_parse_lines, batch_format="pyarrow")
    bad = raw.map_batches(
        lambda b: pa.table(
            {
                "bad": [
                    sum(1 for ln in b.column("text").to_pylist() if _try_parse(ln) is None)
                ]
            }
        ),
        batch_format="pyarrow",
    ).sum("bad")
    return parsed, int(bad or 0)


def write_edges_text(edges: ray.data.Dataset, out_dir: str) -> None:
    """Upper-triangle (`src <= dst`, `graph.cpp:330`) text edge list, one
    file per block, written in parallel."""

    def fmt(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch.column("src"), batch.column("dst")))
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False)
        lines = [f"{s} {d} {x}" for s, d, x in zip(src, dst, w)]
        return pa.table({"text": pa.array(lines, pa.string())})

    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        name = os.path.join(out_dir, f"edges-{uuid.uuid4().hex[:12]}.txt")
        with open(name, "w") as f:
            f.write("\n".join(batch.column("text").to_pylist()))
            f.write("\n")
        return pa.table({"written": [batch.num_rows]})

    edges.map_batches(fmt, batch_format="pyarrow").map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).sum("written")


def write_communities(
    assignments: ray.data.Dataset, out_dir: str, n_partitions: int = 16
) -> None:
    """assignments(vid, comm) -> parquet partitioned by comm % K (resumable
    layout; replaces the reference's one-file-per-community allgatherv)."""

    def add_part(batch: pa.Table) -> pa.Table:
        comm = batch.column("comm").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((comm % n_partitions).astype(np.int64))
        )

    assignments.map_batches(add_part, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part"]
    )
