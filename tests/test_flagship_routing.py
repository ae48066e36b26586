"""Flagship scale routing (VERDICT r3 #2): shrinking
`max_broadcast_vertices` must route BOTH Louvain and PageRank through the
joined (all-Dataset-state) path, and the output must still be a valid
(url, vid, comm, rank) table — identical vertex universe, bit-close
PageRank (same power iteration either way), and a community partition of
real modularity (the joined engine is pure Jacobi, the broadcast engine
chunked Gauss-Seidel, so assignments legitimately differ).

Runs on a 60-page synthetic table: the joined path pays a multi-second
fixed join cost PER ROUND regardless of data size (it is the 10^12-vertex
fallback, not the small-graph engine), so the test input and sweep budget
are kept minimal."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parallel_louvain_method_ray.config import EngineConfig
from parallel_louvain_method_ray.pipelines.web_graph import (
    flagship,
    pages_from_documents,
    web_edge_table,
)

N_DOCS = 60
N_DOMAINS = 6


@pytest.fixture(scope="module")
def tiny_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_sf")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(N_DOCS), pa.int64())}),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def _collect(ds):
    parts = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(parts).to_pandas()


def _weighted_modularity(src, dst, w, comm, n):
    """Q with m_mode='weight' (m2 = total symmetrized entry weight) —
    the flagship's convention on anchor-weighted edges."""
    keep = src != dst
    s2 = np.concatenate([src[keep], dst[keep]])
    d2 = np.concatenate([dst[keep], src[keep]])
    w2 = np.concatenate([w[keep], w[keep]])
    m2 = w2.sum()
    deg = np.bincount(s2, weights=w2, minlength=n)
    nc = int(comm.max()) + 1
    tot = np.bincount(comm, weights=deg, minlength=nc)
    internal = comm[s2] == comm[d2]
    in_c = np.bincount(comm[s2[internal]], weights=w2[internal], minlength=nc)
    return float(np.sum(in_c / m2 - (tot / m2) ** 2))


def test_flagship_joined_route_parity(tiny_sf_dir):
    budget = dict(max_sweeps=6, max_levels=2)
    broadcast = _collect(
        flagship(
            tiny_sf_dir,
            config=EngineConfig(**budget),
            n_domains=N_DOMAINS,
            pagerank_iters=6,
        )
    ).sort_values("vid", ignore_index=True)
    joined = _collect(
        flagship(
            tiny_sf_dir,
            config=EngineConfig(max_broadcast_vertices=1, **budget),
            n_domains=N_DOMAINS,
            pagerank_iters=6,
        )
    ).sort_values("vid", ignore_index=True)

    assert list(joined.columns) == ["url", "vid", "comm", "rank"]
    assert len(joined) == len(broadcast)
    assert (joined["url"] == broadcast["url"]).all()
    assert (joined["vid"] == broadcast["vid"]).all()
    # PageRank: identical published semantics on both routes
    np.testing.assert_allclose(
        joined["rank"].to_numpy(), broadcast["rank"].to_numpy(), atol=1e-9
    )

    # Louvain: same edge table -> a real partition of comparable quality
    pages = pages_from_documents(tiny_sf_dir, n_domains=N_DOMAINS)
    edges, _, n = web_edge_table(pages, concurrency=2)
    et = _collect(edges)
    src = et["src"].to_numpy()
    dst = et["dst"].to_numpy()
    w = et["weight"].to_numpy()
    q_b = _weighted_modularity(
        src, dst, w, broadcast["comm"].to_numpy().astype(np.int64), n
    )
    q_j = _weighted_modularity(
        src, dst, w, joined["comm"].to_numpy().astype(np.int64), n
    )
    assert q_j > 0.5 * q_b and q_j > 0.05, (q_b, q_j)
