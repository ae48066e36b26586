from parallel_louvain_method_ray.sources.tpch import (
    supplier_cograph_edges,
    read_table,
)

__all__ = ["supplier_cograph_edges", "read_table"]
