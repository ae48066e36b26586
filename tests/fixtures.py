"""Golden toy graphs ported from the reference's tests (FIXTURES.md §3)."""

import numpy as np

# 5-vertex / 5-edge CSR fixture (/root/reference/tests/main_test.cpp:18-31)
CSR5_EDGES = np.array(
    [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)], dtype=np.int64
)
CSR5_GOLDEN_ROW_INDEX = [0, 2, 5, 8, 9, 10]
CSR5_GOLDEN_COLUMN_INDEX = [1, 2, 0, 2, 3, 0, 1, 4, 1, 2]
CSR5_GOLDEN_ECOUNT = 5

# 16-vertex / 28-edge Louvain fixture (/root/reference/tests/main_test.cpp:54-59)
LOUVAIN16_EDGES = np.array(
    [
        (1, 2), (1, 4), (1, 7), (2, 0), (2, 4), (2, 5), (2, 6), (3, 0),
        (3, 7), (4, 0), (4, 10), (5, 0), (5, 7), (5, 11), (6, 7), (6, 11),
        (8, 9), (8, 10), (8, 11), (8, 14), (8, 15), (9, 12), (9, 14),
        (10, 11), (10, 12), (10, 13), (10, 14), (11, 13),
    ],
    dtype=np.int64,
)
LOUVAIN16_INITIAL_MODULARITY = -0.0714286  # main_test.cpp:70
LOUVAIN16_FINAL_MODULARITY = 0.346301  # main_test.cpp:76
LOUVAIN16_N_COMMUNITIES = 4  # main_test.cpp:78-81


def edges_xyz(edge_array):
    src = edge_array[:, 0].astype(np.int64)
    dst = edge_array[:, 1].astype(np.int64)
    w = np.ones(len(src), dtype=np.float64)
    return src, dst, w


def random_graph(n, avg_deg, seed, weights=False):
    """Seeded Erdos-Renyi-ish multigraph for oracle-vs-engine tests."""
    rng = np.random.default_rng(seed)
    n_edges = n * avg_deg // 2
    src = rng.integers(0, n, n_edges, dtype=np.int64)
    dst = rng.integers(0, n, n_edges, dtype=np.int64)
    w = (
        rng.integers(1, 5, n_edges).astype(np.float64)
        if weights
        else np.ones(n_edges, dtype=np.float64)
    )
    # ensure density of ids 0..n-1 (isolated ids allowed in algos but the
    # oracle indexes rows positionally like the reference)
    src[:n] = np.arange(n)
    dst[:n] = (np.arange(n) + 1) % n
    return src, dst, w


def planted_partition_graph(n, k, p_in_deg, p_out_deg, seed):
    """k planted communities: each vertex gets p_in_deg intra-block and
    p_out_deg inter-block edges (seeded, deterministic)."""
    rng = np.random.default_rng(seed)
    block = np.arange(n, dtype=np.int64) % k
    srcs, dsts = [], []
    for v in range(n):
        same = np.flatnonzero(block == block[v])
        other = np.flatnonzero(block != block[v])
        srcs.append(np.full(p_in_deg, v, dtype=np.int64))
        dsts.append(rng.choice(same, p_in_deg))
        if p_out_deg:
            srcs.append(np.full(p_out_deg, v, dtype=np.int64))
            dsts.append(rng.choice(other, p_out_deg))
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    keep = src != dst
    return src[keep], dst[keep], np.ones(keep.sum(), dtype=np.float64), block
