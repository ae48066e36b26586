"""Link prediction: Adamic-Adar and Jaccard scores over an edge Dataset.

score_AA(a, b) = sum over common neighbors w of 1 / ln(deg(w)), for pairs
(a, b) NOT already adjacent. Classic link-prediction baseline; on a web
graph it surfaces pages that share many low-fanout co-citers.

Plan shape — ALL state stays in Datasets (no O(E) / O(V) driver arrays,
no 32-bit key packing, so vids up to 2^63 are safe):

  distinct undirected edges (one groupby dedupe)
  -> degrees (one groupby over the 2-direction view)
  -> spoke join: sym2 ⋈ degrees on the middle vertex, so every spoke
     carries deg(middle) — one join instead of a separate wedge⋈deg pass
  -> optional HUB CAP: spokes whose middle degree exceeds
     `max_middle_degree` are dropped BEFORE the wedge join (a hub middle
     makes O(d^2) wedges; its per-wedge AA weight 1/ln(d) is the smallest
     of any middle, so exclusion is the standard bounded-error defense —
     same spirit as the triangle engine's degree orientation,
     algos/triangles.py:1-27)
  -> wedge enumeration: spokes ⋈ sym2 on the middle (bounded fan-out
     `_join`, the joined engines' discipline)
  -> groupby (src, dst) aggregate
  -> existing-edge ANTI JOIN: left_outer join of the scored pairs against
     the marked undirected edge set on (src, dst) + null filter — a
     distributed shuffle anti-join, never a broadcast key set.

The wedge table is O(sum deg^2) uncapped — ~avg_deg x |E| at web-graph
sparsity; with the cap it is O(cap x |E|)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from parallel_louvain_method_ray.algos.joined import (
    _blockwise,
    _join,
    _rename,
    _seeded,
    _select,
    _size_aware_P,
)
from parallel_louvain_method_ray.algos.kcore import undirected_dedup


# `max_middle_degree="auto"` derives a cap from the degree histogram only
# above this many undirected edges — below it the exact (cap=None) plan is
# cheap and keeps the oracle hashes exact at test scale.
AUTO_CAP_MIN_EDGES = 2_000_000


def _both_dirs(batch: pa.Table) -> pa.Table:
    a = batch.column("a").combine_chunks()
    b = batch.column("b").combine_chunks()
    return pa.table(
        {
            "w": pa.concat_arrays([a, b]),
            "v": pa.concat_arrays([b, a]),
        }
    )


def _wedge_plan(
    edges: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    max_middle_degree: int | None | str,
):
    """Shared front half: returns (und, sym2, deg, wedges, P).

    und: distinct (a < b) pairs. sym2: both directions (w, v).
    deg: (w, d) middle degrees. wedges: (w, va, d, vb) with va < vb,
    deg(middle) carried on every row.

    max_middle_degree: int cap, None (exact), or "auto" — exact below
    AUTO_CAP_MIN_EDGES, histogram-derived cap above it (the default-path
    O(sum d^2) defense on hub-heavy graphs)."""
    und = undirected_dedup(edges, src_col, dst_col).materialize()
    n_edges = und.count()
    P = _size_aware_P(n_edges * 2)

    sym2 = und.map_batches(_both_dirs, batch_format="pyarrow")
    deg = _rename(sym2.groupby("w").count(), ["w", "d"])

    if max_middle_degree == "auto":
        if n_edges <= AUTO_CAP_MIN_EDGES:
            max_middle_degree = None
        else:
            from parallel_louvain_method_ray.algos.degree_stats import (
                derive_middle_degree_cap,
            )

            max_middle_degree = derive_middle_degree_cap(deg, n_edges * 2)

    spokes = _select(
        _join(_rename(sym2, ["w", "va"]), deg, on=("w",), P=P),
        ["w", "va", "d"],
    )
    if max_middle_degree is not None:
        spokes = spokes.filter(expr=f"d <= {int(max_middle_degree)}")
        # the filter may empty whole blocks (or the dataset, on an
        # all-hubs graph); reseed so the wedge join stays well-formed
        # (sentinel middle w=-1 matches no sym2 row, drops in the join)
        spokes = _seeded(spokes, w=-1, va=-1, d=1)
    wedges = _join(
        spokes, _rename(sym2, ["w", "vb"]), on=("w",), P=P
    ).filter(expr="va < vb")
    return und, deg, wedges, P


def _anti_adjacent(
    pairs: ray.data.Dataset, und: ray.data.Dataset, P: int
) -> ray.data.Dataset:
    """Distributed anti-join: drop pairs already present as undirected
    edges. pairs must carry (src, dst); emits pairs + a null-filtered
    left_outer marker (column `adj` dropped by the caller's finisher)."""
    marked = _blockwise(
        und,
        lambda b: b.append_column(
            "adj", pa.array(np.ones(b.num_rows, dtype=np.int8))
        ),
    )
    return _join(
        pairs,
        marked,
        on=("src", "dst"),
        right_on=("a", "b"),
        how="left_outer",
        P=P,
    )


def adamic_adar(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_middle_degree: int | None | str = None,
) -> ray.data.Dataset:
    """-> (src, dst, score) for non-adjacent pairs with >= 1 common
    neighbor; src < dst; score rounded to 9 decimals.

    `max_middle_degree`: exclude common-neighbor middles with degree
    above the cap (None = exact; "auto" = exact below AUTO_CAP_MIN_EDGES,
    histogram-derived above). Capped runs under-count each affected pair
    by at most (wedges via hubs) x 1/ln(cap+1)."""
    und, _deg, wedges, P = _wedge_plan(
        edges, src_col, dst_col, max_middle_degree
    )

    scored = (
        wedges.map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("va"),
                    "dst": b.column("vb"),
                    "c": 1.0
                    / np.log(
                        b.column("d")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["src", "dst"])
        .sum("c")
    )
    # sentinel keeps the left side non-empty on wedge-free graphs; it
    # never matches an edge (vids >= 0) and is dropped in the finisher
    seeded = _seeded(scored, src=-1, dst=-1, **{"sum(c)": 0.0})
    j = _anti_adjacent(seeded, und, P)

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_null(batch.column("adj")),
            pc.greater_equal(batch.column("src"), pa.scalar(0)),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "score": pc.round(t.column("sum(c)"), ndigits=9),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def jaccard_links(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_middle_degree: int | None | str = None,
) -> ray.data.Dataset:
    """Jaccard link prediction: |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for
    non-adjacent pairs with >= 1 common neighbor. Same wedge plan as
    `adamic_adar`; the endpoint degrees for the union size are attached
    with two joins against the (small) pair table — no broadcast map."""
    und, deg, wedges, P = _wedge_plan(
        edges, src_col, dst_col, max_middle_degree
    )

    common = (
        wedges.map_batches(
            lambda b: pa.table(
                {"src": b.column("va"), "dst": b.column("vb")}
            ),
            batch_format="pyarrow",
        )
        .groupby(["src", "dst"])
        .count()
    )
    pairs = _seeded(
        _rename(common, ["src", "dst", "common"]),
        src=-1,
        dst=-1,
        common=0,
    )
    # attach endpoint degrees (left_outer so the sentinel row survives;
    # every REAL pair endpoint has a degree row by construction)
    pairs = _join(
        pairs,
        _rename(deg, ["wa", "da"]),
        on=("src",),
        right_on=("wa",),
        how="left_outer",
        P=P,
    )
    pairs = _join(
        pairs,
        _rename(deg, ["wb", "db"]),
        on=("dst",),
        right_on=("wb",),
        how="left_outer",
        P=P,
    )
    j = _anti_adjacent(pairs, und, P)

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_null(batch.column("adj")),
            pc.greater_equal(batch.column("src"), pa.scalar(0)),
        )
        t = batch.filter(keep)
        c = t.column("common").to_numpy(zero_copy_only=False).astype(np.int64)
        da = t.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        union = np.maximum(da + db - c, 1)
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "common": pa.array(c),
                "jaccard": pa.array(np.round(c / union, 9)),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")
