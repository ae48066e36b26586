"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline on /root/testdata/sf0.001 — synthesize the
  Common-Crawl-style pages table over the documents id universe, extract
  HTML -> text (byte-identical invariant) + anchors via the actor pool,
  build the link graph, run multi-level Louvain + PageRank; returns the
  per-vertex (url, vid, comm, rank) table.
- queries(): one callable per implemented operator (SURVEY.md §2 + §2.6 +
  training-data extensions), each over the given sf_dir.
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query
  (graph queries run over the supplier co-occurrence graph so that even
  PageRank/CC/triangles are oracle-checked; iterative Louvain and the
  HTML pipeline are rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import parallel_louvain_method_ray  # noqa: F401  (registers pickle-by-value)
from parallel_louvain_method_ray._pickle import ensure_registered
from parallel_louvain_method_ray.pipelines import queries as _q
from parallel_louvain_method_ray.pipelines.web_graph import flagship

ensure_registered()


def entry() -> Any:
    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    # Side-effect-free and instant: louvain_quality's oracle recomputes Q
    # from the engine's emitted assignment (an sf-keyed /tmp parquet
    # bridge) which the `louvain_quality` queries() callable writes when
    # it runs — no Louvain is executed inside this metadata call.
    return dict(_q.ORACLE_SQL)
