from parallel_louvain_method_ray.ops.agg import salted_groupby_sum, degree_histogram

__all__ = ["salted_groupby_sum", "degree_histogram"]
