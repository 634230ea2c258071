from .text import (
    doc_fingerprint_cols,
    lang_guess_col,
    quality_cols,
    token_count_col,
)
from .vectors import cosine_similarity, l2_norm, to_double_array

__all__ = [
    "token_count_col",
    "quality_cols",
    "lang_guess_col",
    "doc_fingerprint_cols",
    "cosine_similarity",
    "l2_norm",
    "to_double_array",
]
