from parallel_louvain_method_ray.mm.media import (
    MEDIA_SCHEMA,
    synthesize_media,
    MediaDecoder,
    decode_features,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthesize_media",
    "MediaDecoder",
    "decode_features",
    "sample_frames",
]
