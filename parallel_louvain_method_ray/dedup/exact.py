"""Exact deduplication: hash-partition on the normalized-text fingerprint,
keep the smallest doc_id per group (deterministic keeper)."""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from parallel_louvain_method_ray.textops.analysis import fingerprints


def exact_dup_groups(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(fp, keeper_doc_id, n_docs): one row per distinct normalized text;
    n_docs > 1 marks duplicate groups. The groupby IS the hash partition —
    dedup scales as one shuffle keyed on the 128-bit fingerprint."""
    agg = (
        fingerprints(docs)
        .groupby("fp")
        .aggregate(Min("doc_id"), Count())
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "fp": b.column("fp"),
                "keeper_doc_id": b.column("min(doc_id)"),
                "n_docs": b.column("count()"),
            }
        ),
        batch_format="pyarrow",
    )
