from .decode import (
    DECODED_IMAGE_SCHEMA,
    decode_images,
    extract_binary_metadata,
    sample_frames,
)

__all__ = [
    "DECODED_IMAGE_SCHEMA",
    "decode_images",
    "extract_binary_metadata",
    "sample_frames",
]
