from parallel_louvain_method_ray.ckpt.manifest import LouvainCheckpointer, PageRankCheckpointer

__all__ = ["LouvainCheckpointer", "PageRankCheckpointer"]
