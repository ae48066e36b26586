"""Graph500-style Kronecker (R-MAT) edge generator as a Ray Data source.

Closes the reference's dead graph500 surface
(`/root/reference/src/main_distributed_bfs.cpp:77-89`:
`Graph::from_kronecker(scale, edgefactor, seed)` + `top_down_bfs(0)` —
declared but never implemented or built, `src/CMakeLists.txt:10-11`).
Semantics follow the public Graph500 specification's Kronecker generator:
2^scale vertices, edgefactor * 2^scale edges, each edge's bit at level L
drawn from the R-MAT quadrant distribution (A, B, C, D) =
(0.57, 0.19, 0.19, 0.05).

Distribution-ready by construction: instead of the spec's SEQUENTIAL RNG
stream (meaningless across partitions — the reference's own seed handling
is rank-dependent), every (edge, level) decision derives from a
counter-based splitmix64 hash, so any worker can generate any block of
edges independently and the result is bit-stable across partitioning,
retries and cluster sizes. The identical hash is reproducible in SQL
(pipelines/queries.py `_mix_ctes`), which makes the generator itself
hash-oracle-checkable end to end.

Quadrant thresholds are EXACT 64-bit integers computed once here and
injected verbatim into the SQL oracle — a single source of truth, immune
to float-rounding drift between engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# R-MAT quadrant cumulative thresholds over the full uint64 range.
# (0.57, 0.76, 0.95) of 2^64, frozen as exact integers.
A_T = int(0.57 * 2**64)
AB_T = int(0.76 * 2**64)
ABC_T = int(0.95 * 2**64)
# seed folding constant (any odd 64-bit constant; mirrored in the oracle)
SEED_K = 0x517CC1B727220A95
# counter layout: i = edge_index * LEVEL_PAD + level (scale <= 63 < PAD)
LEVEL_PAD = 64


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wrap == the SQL modular
    arithmetic of `_mix_ctes`)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def kronecker_edges(
    scale: int,
    edgefactor: int = 16,
    seed: int = 1,
) -> ray.data.Dataset:
    """-> edges(src:int64, dst:int64, weight:float64=1.0), M = edgefactor
    * 2^scale rows over vertex ids [0, 2^scale). Duplicate edges and
    self-loops occur, per the spec; downstream symmetrize+dedup handles
    them like any other edge table."""
    if not (1 <= scale <= 62):
        raise ValueError(f"scale must be in [1, 62], got {scale}")
    n = np.uint64(1) << np.uint64(scale)
    m = int(edgefactor) * (1 << scale)
    seed_add = np.uint64((int(seed) * SEED_K) & 0xFFFFFFFFFFFFFFFF)

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        src = np.zeros(e.shape[0], dtype=np.uint64)
        dst = np.zeros(e.shape[0], dtype=np.uint64)
        with np.errstate(over="ignore"):
            for lvl in range(scale):
                h = mix64(e * np.uint64(LEVEL_PAD) + np.uint64(lvl) + seed_add)
                q = (
                    (h >= np.uint64(A_T)).astype(np.uint64)
                    + (h >= np.uint64(AB_T)).astype(np.uint64)
                    + (h >= np.uint64(ABC_T)).astype(np.uint64)
                )
                src |= (q >> np.uint64(1)) << np.uint64(lvl)
                dst |= (q & np.uint64(1)) << np.uint64(lvl)
        return pa.table(
            {
                "src": src.astype(np.int64),
                "dst": dst.astype(np.int64),
                "weight": np.ones(e.shape[0], dtype=np.float64),
            }
        )

    return ray.data.range(m).map_batches(gen, batch_format="pyarrow")


def kronecker_ctes(scale: int, edgefactor: int = 16, seed: int = 1) -> str:
    """DuckDB CTE chain regenerating the identical edge list (one row per
    edge index e, so duplicate edges survive exactly). Terminal CTE:
    `kredges(src, dst)` — embeddable inside larger (incl. RECURSIVE)
    oracle queries."""
    from parallel_louvain_method_ray.pipelines.queries import _mix_ctes

    m = int(edgefactor) * (1 << scale)
    seed_add = (int(seed) * SEED_K) & 0xFFFFFFFFFFFFFFFF
    mix = _mix_ctes(
        {"h": f"i + {seed_add}"}, "krgrid", prefix="kr", carry=("e", "lvl")
    )
    return f"""
        kres AS (SELECT range AS e FROM range({m})),
        krls AS (SELECT range AS lvl FROM range({scale})),
        krgrid AS (
            SELECT CAST(e * {LEVEL_PAD} + lvl AS UBIGINT) AS i, e, lvl
            FROM kres CROSS JOIN krls
        ),
        {mix},
        krbits AS (
            SELECT e, lvl,
                CASE WHEN h >= CAST('{ABC_T}' AS UBIGINT) THEN 3
                     WHEN h >= CAST('{AB_T}' AS UBIGINT) THEN 2
                     WHEN h >= CAST('{A_T}' AS UBIGINT) THEN 1
                     ELSE 0 END AS q
            FROM krmixed
        ),
        kredges AS (
            SELECT CAST(sum((q // 2) * (CAST(1 AS BIGINT) << lvl)) AS BIGINT)
                       AS src,
                   CAST(sum((q % 2) * (CAST(1 AS BIGINT) << lvl)) AS BIGINT)
                       AS dst
            FROM krbits GROUP BY e
        )
    """


def kronecker_edges_sql(scale: int, edgefactor: int = 16, seed: int = 1) -> str:
    """Standalone oracle query for the raw generated edge list."""
    return (
        f"WITH {kronecker_ctes(scale, edgefactor, seed)} "
        "SELECT src, dst, 1.0 AS weight FROM kredges"
    )
