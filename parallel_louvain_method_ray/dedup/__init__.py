from parallel_louvain_method_ray.dedup.exact import exact_dup_groups
from parallel_louvain_method_ray.dedup.minhash import (
    minhash_signatures,
    near_dup_pairs_minhash,
)
from parallel_louvain_method_ray.dedup.simhash import simhash_signatures, near_dup_pairs_simhash
from parallel_louvain_method_ray.dedup.jaccard import shingle_jaccard_pairs
from parallel_louvain_method_ray.dedup.embedding import embedding_near_dups

__all__ = [
    "exact_dup_groups",
    "minhash_signatures",
    "near_dup_pairs_minhash",
    "simhash_signatures",
    "near_dup_pairs_simhash",
    "shingle_jaccard_pairs",
    "embedding_near_dups",
]
