from parallel_louvain_method_ray.algos.louvain_seq import SequentialLouvain
from parallel_louvain_method_ray.algos.louvain import (
    LouvainResult,
    louvain,
    louvain_level,
    modularity,
    coarsen,
    canonicalize_labels,
)

__all__ = [
    "SequentialLouvain",
    "LouvainResult",
    "louvain",
    "louvain_level",
    "modularity",
    "coarsen",
    "canonicalize_labels",
]
