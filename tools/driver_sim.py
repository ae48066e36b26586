"""Simulate the driver's correctness gate: run every `queries()` entry at
the driver's shape (sf0.01, all CPUs) and compare against its DuckDB oracle
(row count, schema, order-insensitive values), with per-query timing.

Usage:  python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--cpus 32]
                                   [--only name1,name2]

Prints one status line per query and a final JSON summary. Unlike the
pytest version (tests/test_queries_oracle.py, sf0.001/4cpu) this matches
the shape that hid the round-2 joined-LPA deadlock.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        tabs = [pa.table(b) for b in res.iter_batches(batch_format="pyarrow")]
        if tabs:
            res = pa.concat_tables(tabs)
        else:  # zero-batch dataset: build an empty table from the schema
            res = pa.Table.from_pylist([], schema=res.schema().base_schema)
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    assert isinstance(res, pd.DataFrame)
    return res


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)

    import duckdb
    import numpy as np

    import __ray_entry__ as entrymod
    from parallel_louvain_method_ray.pipelines.queries import oracle_sql_for_sf

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = oracle_sql_for_sf(args.sf)
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        status = "ok"
        detail = ""
        try:
            ray_df = _canon(_to_pandas(queries[name](args.sf)))
            if name in oracles:
                sql_df = _canon(con.sql(oracles[name]).df())
                if list(ray_df.columns) != list(sql_df.columns):
                    status = "schema_mismatch"
                    detail = f"{list(ray_df.columns)} vs {list(sql_df.columns)}"
                elif len(ray_df) != len(sql_df):
                    status = "rowcount_mismatch"
                    detail = f"{len(ray_df)} vs {len(sql_df)}"
                else:
                    for col in ray_df.columns:
                        a = ray_df[col].to_numpy()
                        b = sql_df[col].to_numpy()
                        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(
                            np.asarray(b).dtype, np.floating
                        ):
                            if not np.allclose(
                                a.astype(float), b.astype(float), atol=1e-8
                            ):
                                status = "value_mismatch"
                                detail = col
                                break
                        elif not (np.asarray(a) == np.asarray(b)).all():
                            status = "value_mismatch"
                            detail = col
                            break
                    else:
                        status = "hash_green"
            else:
                status = "rows_only" if len(ray_df) >= 1 else "empty_result"
        except Exception as exc:  # noqa: BLE001
            status = "error"
            detail = f"{type(exc).__name__}: {exc}"
            traceback.print_exc()
        sec = round(time.time() - t0, 2)
        results[name] = {"status": status, "sec": sec, "detail": detail}
        print(f"{name:36s} {status:18s} {sec:8.2f}s {detail[:80]}", flush=True)

    counts: dict[str, int] = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {
        "sf": args.sf,
        "cpus": args.cpus,
        "n_queries": len(results),
        "counts": counts,
        "slowest": sorted(
            ((r["sec"], n) for n, r in results.items()), reverse=True
        )[:5],
        "bad": {
            n: r for n, r in results.items()
            if r["status"] not in ("hash_green", "rows_only")
        },
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if not summary["bad"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
