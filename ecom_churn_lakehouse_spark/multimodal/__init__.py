from .decode import (
    DECODED_AUDIO_SCHEMA,
    DECODED_IMAGE_SCHEMA,
    IMAGE_FEATURE_DIM,
    IMAGE_FEATURE_SCHEMA,
    RESIZED_IMAGE_SCHEMA,
    decode_audio,
    decode_images,
    extract_binary_metadata,
    image_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "DECODED_AUDIO_SCHEMA",
    "DECODED_IMAGE_SCHEMA",
    "IMAGE_FEATURE_DIM",
    "IMAGE_FEATURE_SCHEMA",
    "RESIZED_IMAGE_SCHEMA",
    "decode_audio",
    "decode_images",
    "extract_binary_metadata",
    "image_features",
    "resize_images",
    "sample_frames",
]
