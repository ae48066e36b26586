from parallel_louvain_method_ray.sim.search import cosine_topk, cosine_topk_lsh

__all__ = ["cosine_topk", "cosine_topk_lsh"]
