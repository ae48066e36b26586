from parallel_louvain_method_ray.sim.search import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_assign,
    train_coarse_quantizer,
)

__all__ = [
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "ivf_assign",
    "train_coarse_quantizer",
]
