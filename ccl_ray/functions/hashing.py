"""Stable, vectorized hashing helpers.

All hashes here are deterministic across processes and platforms (no
PYTHONHASHSEED dependence) — required because hash-partitioned stages must
agree on placement across workers, iterations and resumed runs.
"""

from __future__ import annotations

import numpy as np

# Mersenne prime 2^61-1: multiplicative hashing in uint64 without overflow
# issues (we reduce mod P after each multiply-add using python-free numpy ops).
_P61 = np.uint64((1 << 61) - 1)
_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _mod_p61(x: np.ndarray) -> np.ndarray:
    # fast partial reduction mod 2^61-1 for uint64 inputs
    with np.errstate(over="ignore"):  # the unselected where-branch may wrap
        x = (x & _P61) + (x >> np.uint64(61))
        return np.where(x >= _P61, x - _P61, x)


def stable_hash64_np(arr: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit mix hash of an integer array (splitmix64 finalizer)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = arr.astype(np.uint64, copy=True)
        x += np.uint64(seed) * _MULT + _MULT
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x


def hash_strings_np(strs, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash per string (vector of python strs / numpy object)."""
    import zlib

    s32 = np.fromiter(
        (zlib.crc32(s.encode("utf-8", "surrogatepass")) for s in strs),
        dtype=np.uint64,
        count=len(strs),
    )
    l64 = np.fromiter((len(s) for s in strs), dtype=np.uint64, count=len(strs))
    # crc32 alone is 32-bit; mix with adler32-free length + seed through splitmix
    return stable_hash64_np(s32 ^ (l64 << np.uint64(32)), seed=seed)


def rolling_hash_shingles(text: str, k: int = 8) -> np.ndarray:
    """All k-byte shingle hashes of ``text``, fully vectorized.

    Polynomial rolling hash over the utf-8 bytes using a sliding window view —
    no per-shingle Python loop. Returns the *unique* shingle hashes (uint64).
    Used by MinHash / n-gram Jaccard / document fingerprinting.
    """
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if b.size < k:
        if b.size == 0:
            return np.empty(0, dtype=np.uint64)
        b = np.pad(b, (0, k - b.size))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    p = np.uint64(1)
    base = np.uint64(1315423911)
    for i in range(k):
        powers[i] = p
        p = _mod_p61(p * base)
    h = _mod_p61((win * powers[None, :]).sum(axis=1, dtype=np.uint64))
    return np.unique(stable_hash64_np(h))


def minhash_signature(shingle_hashes: np.ndarray, num_perms: int, seed: int = 7) -> np.ndarray:
    """MinHash signature (uint64[num_perms]) of a shingle-hash set, vectorized."""
    if shingle_hashes.size == 0:
        return np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=num_perms).astype(np.uint64)
    b = rng.randint(0, 1 << 61, size=num_perms).astype(np.uint64)
    h = _mod_p61(shingle_hashes)
    # (num_perms, n) — fine for n up to a few thousand shingles per doc
    vals = _mod_p61(_mod_p61(a[:, None] * h[None, :]) + b[:, None])
    return vals.min(axis=1)
