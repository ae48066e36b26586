from parallel_louvain_method_ray.mm.media import (
    MEDIA_SCHEMA,
    synthesize_media,
    synthesize_media_real,
    MediaDecoder,
    decode_features,
    decode_image_features,
    decode_audio_features,
    decode_video_frame_features,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthesize_media",
    "synthesize_media_real",
    "MediaDecoder",
    "decode_features",
    "decode_image_features",
    "decode_audio_features",
    "decode_video_frame_features",
    "sample_frames",
]
