from .ann import brute_force_topk, hyperplane_lsh_buckets

__all__ = ["brute_force_topk", "hyperplane_lsh_buckets"]
