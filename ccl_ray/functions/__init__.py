from ccl_ray.functions.hashing import rolling_hash_shingles, stable_hash64_np

__all__ = ["stable_hash64_np", "rolling_hash_shingles"]
