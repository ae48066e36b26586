"""Edge-table derivations from the testdata tables.

The graph queries need a deterministic, SQL-expressible edge table over the
sf dir so the DuckDB oracle can check them end-to-end. The canonical one is
the SUPPLIER CO-OCCURRENCE GRAPH: an undirected edge {s1, s2} for every
pair of suppliers that ship lineitems of the same order, weighted by the
number of distinct co-occurring orders. Unipartite (triangles exist),
skewed (popular suppliers are hubs), and derivable in one groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def read_table(sf_dir: str, name: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def supplier_cograph_edges(sf_dir: str) -> ray.data.Dataset:
    """edges(src:int64, dst:int64, weight:float64), src < dst, sorted keys.

    Column pruning at the read: only (l_orderkey, l_suppkey) leave storage.
    The pair expansion runs per order group (orders have a handful of
    lineitems, so the blow-up is bounded); the groupby pre-aggregates.
    """
    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def pairs(group: pa.Table) -> pa.Table:
        s = np.unique(group.column("l_suppkey").to_numpy(zero_copy_only=False))
        if s.shape[0] < 2:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )
        i, j = np.triu_indices(s.shape[0], k=1)
        return pa.table({"src": s[i].astype(np.int64), "dst": s[j].astype(np.int64)})

    return (
        lineitem.groupby("l_orderkey")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "dst": b.column("dst"),
                    "weight": b.column("count()").cast(pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


SUPPLIER_COGRAPH_SQL = """
WITH pairs AS (
    SELECT DISTINCT a.l_orderkey, a.l_suppkey AS s1, b.l_suppkey AS s2
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
)
SELECT s1 AS src, s2 AS dst, CAST(count(*) AS DOUBLE) AS weight
FROM pairs
GROUP BY s1, s2
"""

# symmetrized entry list of the co-graph (both directions; triples are
# unique already, matching the engine's set-dedup)
SUPPLIER_SYM_SQL = f"""
WITH cograph AS ({SUPPLIER_COGRAPH_SQL})
SELECT src, dst, weight FROM cograph
UNION ALL
SELECT dst AS src, src AS dst, weight FROM cograph
"""
