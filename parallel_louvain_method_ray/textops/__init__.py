from parallel_louvain_method_ray.textops.analysis import (
    text_stats,
    fingerprints,
    top_tokens,
    lang_id,
)

__all__ = ["text_stats", "fingerprints", "top_tokens", "lang_id"]
