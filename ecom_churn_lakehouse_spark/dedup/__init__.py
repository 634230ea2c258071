from .exact import exact_duplicate_groups
from .minhash import MINHASH_A, MINHASH_B, MINHASH_P, lsh_candidate_pairs, minhash_signatures
from .shingles import doc_shingles, doc_tokens
from .simhash import simhash_candidate_pairs, simhash_signatures

__all__ = [
    "exact_duplicate_groups",
    "doc_shingles",
    "doc_tokens",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash_signatures",
    "simhash_candidate_pairs",
    "MINHASH_P",
    "MINHASH_A",
    "MINHASH_B",
]
