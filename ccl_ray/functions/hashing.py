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
    """Stable 64-bit content hash per string (vectorized, full 64-bit entropy).

    Uses pandas' C-vectorized SipHash-1-3 of the utf-8 bytes with a fixed
    key — deterministic across processes and platforms (no PYTHONHASHSEED
    dependence), with genuine 64-bit content entropy: distinct-string
    collision odds are ~n^2/2^64. (A crc32-based mix caps at 2^32 content
    states no matter how it is finalized — splitmix is bijective — which
    silently merges distinct texts at multi-million-doc scale.)
    """
    import pandas as pd

    if isinstance(strs, np.ndarray) and strs.dtype == object:
        arr = strs
    else:
        arr = np.array(list(strs), dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return stable_hash64_np(h, seed=seed) if seed else h


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


def _mulmod_p61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Exact (a*h) mod 2^61-1 for a,h < 2^61, via 32-bit split (no wraparound).

    2^64 ≡ 8 and 2^61 ≡ 1 (mod p), so with a = aH·2^32+aL, h = hH·2^32+hL:
    a·h ≡ 8·aH·hH + aL·hL + 2^32·(aH·hL + aL·hH). Each partial product fits
    uint64, giving the true universal-family value rather than a wrapped one.
    """
    M32 = np.uint64(0xFFFFFFFF)
    aH, aL = a >> np.uint64(32), a & M32
    hH, hL = h >> np.uint64(32), h & M32
    t = _mod_p61(aH * hH * np.uint64(8))
    t = _mod_p61(t + _mod_p61(aL * hL))
    mid = _mod_p61(aH * hL + aL * hH)
    # mid·2^32 = (mid>>29)·2^61 + (mid&(2^29-1))·2^32 ≡ (mid>>29) + low<<32
    t = _mod_p61(t + (mid >> np.uint64(29)))
    return _mod_p61(t + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32)))


def minhash_coeffs(num_perms: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficient vectors for the MinHash permutation family.
    Compute ONCE per actor (stateful stage) — not per document."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=num_perms).astype(np.uint64)
    b = rng.randint(0, 1 << 61, size=num_perms).astype(np.uint64)
    return a, b


def minhash_signature(
    shingle_hashes: np.ndarray, num_perms: int, seed: int = 7, coeffs=None
) -> np.ndarray:
    """MinHash signature (uint64[num_perms]) of a shingle-hash set, vectorized."""
    if shingle_hashes.size == 0:
        return np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    a, b = coeffs if coeffs is not None else minhash_coeffs(num_perms, seed)
    h = _mod_p61(shingle_hashes)
    # (num_perms, n) — fine for n up to a few thousand shingles per doc
    vals = _mod_p61(_mulmod_p61(a[:, None], h[None, :]) + b[:, None])
    return vals.min(axis=1)


def hash_part_np(kcol, key_type, P: int) -> np.ndarray:
    """Partition ids (int64) for an Arrow key column: THE string-vs-int
    dispatch every hash-fan-in route() stage shares (window functions,
    sessionize, grouped z-scores/quantiles) — one definition, not five."""
    import pyarrow as pa

    if pa.types.is_string(key_type) or pa.types.is_large_string(key_type):
        h = hash_strings_np(kcol.to_numpy(zero_copy_only=False))
    else:
        h = stable_hash64_np(
            kcol.cast("int64").to_numpy(zero_copy_only=False).view(np.uint64)
        )
    return (h % np.uint64(P)).astype(np.int64)
