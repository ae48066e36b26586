from parallel_louvain_method_ray.pipelines.web_graph import (
    pages_from_documents,
    web_edge_table,
    flagship,
)

__all__ = ["pages_from_documents", "web_edge_table", "flagship"]
