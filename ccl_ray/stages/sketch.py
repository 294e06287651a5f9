"""HyperLogLog distinct-count sketch — cardinality estimation WITHOUT a
shuffle.

The exact distinct counts in this engine (aggregates.partial_sum_agg over
the key) pay one hash-partitioned exchange of the distinct keys; at 100 TB
a cardinality ESTIMATE is usually wanted long before the exact number, and
HLL gets it with a fixed 2^p-byte register array per block and a tiny
max-merge — no key ever leaves its block:

1. per batch (vectorized): h = splitmix64(key); register index = low p
   bits; rank = #leading-zeros of the remaining 64−p bits + 1; per-batch
   register maxima via np.maximum.at — one row of 2^p uint8 out per block;
2. per partition: max-merge the block rows (map_batches over a coalesced
   partial set);
3. driver: max-merge ≤ num_blocks tiny rows, apply the standard
   bias-corrected estimator (Flajolet et al. 2007 constants; linear
   counting below 2.5·m — no large-range correction needed with 64-bit
   hashes). Deterministic: fixed hash, max-merge is order-free.

Standard error ≈ 1.04/√m (p=14 → m=16384 → ~0.8%). The gate query pairs
the estimate with the engine's exact distinct count and asserts the
relative error bound engine-side (a SQL oracle cannot reproduce another
implementation's estimator bit-for-bit, so the exact count carries the
value check — DuckDB's approx_count_distinct has the same limitation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.functions.hashing import stable_hash64_np


def _registers_for(h: np.ndarray, p: int) -> np.ndarray:
    """2^p uint8 register maxima for a batch of 64-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if not len(h):
        return regs
    h = h.astype(np.uint64)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = leading zeros of the (64-p)-bit remainder + 1; a zero
    # remainder ranks (64-p)+1. bit_length via log2 on the uint64 view is
    # unsafe at the top bit — use a loop-free comparison ladder instead.
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, np.uint8)
    nz = rest != 0
    if nz.any():
        # floor(log2(rest)) for nonzero values, computed exactly in uint64
        bl = np.zeros(len(h), np.int64)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            v[big] >>= np.uint64(shift)
        rank[nz] = (nbits - 1 - bl[nz] + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting (small range)
    return float(est)


def hll_distinct(
    ds: "rd.Dataset",
    col: str,
    *,
    p: int = 14,
    num_partitions: int | None = None,
) -> float:
    """HLL estimate of count(distinct col). One pass, no key exchange —
    per-block 2^p-byte partials, max-merged per partition then on the
    driver (≤ P tiny rows). Deterministic for a given dataset."""
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)
    m = 1 << p

    def partial(df: pd.DataFrame) -> pa.Table:
        vals = df[col]
        if vals.dtype == object or str(vals.dtype) in ("string", "str"):
            h = stable_hash64_np(
                pd.util.hash_array(vals.to_numpy(dtype=object)).astype(np.uint64)
            )
        else:
            h = stable_hash64_np(vals.to_numpy().astype(np.int64).view(np.uint64))
        regs = _registers_for(h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge(df: pd.DataFrame) -> pa.Table:
        acc = np.zeros(m, np.uint8)
        for b in df["regs"]:
            acc = np.maximum(acc, np.frombuffer(b, np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    # block partials -> P-way repartition (tiny fixed-size rows) -> one
    # merged row per partition -> driver max-merge of <= P rows
    partials = ds.select_columns([col]).map_batches(partial, batch_format="pandas")
    merged = (
        partials.select_columns(["regs"])
        .repartition(P)
        .map_batches(merge, batch_format="pandas")
        .to_pandas()
    )
    acc = np.zeros(m, np.uint8)
    # an all-empty input yields no partial rows (and no schema); all-zero
    # registers estimate 0 via linear counting
    if len(merged) and "regs" in merged.columns:
        for b in merged["regs"]:
            acc = np.maximum(acc, np.frombuffer(b, np.uint8))
    return _estimate(acc)


def hll_distinct_by(
    ds: "rd.Dataset",
    key_col: str,
    col: str,
    *,
    p: int = 14,
) -> "rd.Dataset":
    """Per-group HLL distinct estimates: Dataset (key, est float64).

    Same one-pass shape as hll_distinct, per group: each block emits ONE
    2^p-byte register row per key PRESENT in that block (one vectorized
    _registers_for call per present key — present-key count per block is
    bounded by the block, not the key space), then register rows max-merge
    by key. The merge groupby moves only the tiny blob rows (key-cardinality
    × block-count), never the raw rows — the per-key analog of the global
    sketch. Caller contract: meaningful for key cardinalities where a
    2^p-byte row per key per block is cheap (categorical keys).
    """
    m = 1 << p

    def _hash_col(vals) -> np.ndarray:
        if vals.dtype == object or str(vals.dtype) in ("string", "str"):
            return stable_hash64_np(
                pd.util.hash_array(vals.to_numpy(dtype=object)).astype(np.uint64)
            )
        return stable_hash64_np(vals.to_numpy().astype(np.int64).view(np.uint64))

    def partial(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {key_col: pa.array([], pa.string()), "regs": pa.array([], pa.binary())}
            )
        k = df[key_col].to_numpy(dtype=object).astype(str)
        h = _hash_col(df[col])
        order = np.argsort(k, kind="stable")
        k, h = k[order], h[order]
        uniq, starts = np.unique(k, return_index=True)
        bounds = np.concatenate([starts, [len(k)]])
        regs = [
            _registers_for(h[bounds[i] : bounds[i + 1]], p).tobytes()
            for i in range(len(uniq))
        ]
        return pa.table(
            {key_col: pa.array(uniq, pa.string()), "regs": pa.array(regs, pa.binary())}
        )

    def merge(df: pd.DataFrame) -> pa.Table:
        acc = np.zeros(m, np.uint8)
        for b in df["regs"]:
            acc = np.maximum(acc, np.frombuffer(b, np.uint8))
        key = df[key_col].iloc[0] if len(df) else ""
        return pa.table(
            {
                key_col: pa.array([key], pa.string()),
                "est": pa.array([_estimate(acc)], pa.float64()),
            }
        )

    partials = ds.select_columns([key_col, col]).map_batches(partial, batch_format="pandas")
    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


# ------------------------------------------------------------- count-min

_CMS_SEEDS = (101, 211, 307, 401)


def cms_counts(
    ds: "rd.Dataset",
    col: str,
    *,
    w: int = 8192,
    num_partitions: int | None = None,
) -> np.ndarray:
    """Count-min sketch of ``col``'s frequencies: a (d, w) int64 table.

    One pass, no key exchange — per block a fixed d×w partial (np.add.at
    per seed row), sum-merged per partition then on the driver (≤ P tiny
    rows; d×w×8 bytes each, 256 KB at the default). Point estimates come
    from cms_estimate (min over rows — never an underestimate); the
    classic ε = e/w additive overcount bound holds in expectation, checked
    engine-side by the gate query (a SQL oracle cannot replicate another
    implementation's sketch, the HLL pairing pattern).
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)
    d = len(_CMS_SEEDS)

    def partial(df: pd.DataFrame) -> pa.Table:
        vals = df[col]
        if vals.dtype == object or str(vals.dtype) in ("string", "str"):
            base = pd.util.hash_array(vals.to_numpy(dtype=object)).astype(np.uint64)
        else:
            base = vals.to_numpy().astype(np.int64).view(np.uint64)
        tbl = np.zeros((d, w), np.int64)
        for r, seed in enumerate(_CMS_SEEDS):
            idx = (stable_hash64_np(base, seed=seed) % np.uint64(w)).astype(np.int64)
            np.add.at(tbl[r], idx, 1)
        return pa.table({"cms": pa.array([tbl.tobytes()], pa.binary())})

    def merge(df: pd.DataFrame) -> pa.Table:
        acc = np.zeros((d, w), np.int64)
        for b in df["cms"]:
            acc += np.frombuffer(b, np.int64).reshape(d, w)
        return pa.table({"cms": pa.array([acc.tobytes()], pa.binary())})

    partials = ds.select_columns([col]).map_batches(partial, batch_format="pandas")
    merged = (
        partials.select_columns(["cms"])
        .repartition(P)
        .map_batches(merge, batch_format="pandas")
        .to_pandas()
    )
    acc = np.zeros((d, w), np.int64)
    if len(merged) and "cms" in merged.columns:
        for b in merged["cms"]:
            acc += np.frombuffer(b, np.int64).reshape(d, w)
    return acc


def cms_estimate(cms: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-query the sketch: min over rows (vectorized over ``values``)."""
    d, w = cms.shape
    base = np.asarray(values).astype(np.int64).view(np.uint64)
    ests = np.empty((d, len(base)), np.int64)
    for r, seed in enumerate(_CMS_SEEDS[:d]):
        idx = (stable_hash64_np(base, seed=seed) % np.uint64(w)).astype(np.int64)
        ests[r] = cms[r, idx]
    return ests.min(axis=0)


# ------------------------------------------------------------- bloom

_BLOOM_SEEDS = (17, 29, 43, 59)


def _bloom_hash_base(vals) -> np.ndarray:
    if vals.dtype == object or str(vals.dtype) in ("string", "str"):
        return pd.util.hash_array(vals.to_numpy(dtype=object)).astype(np.uint64)
    return vals.to_numpy().astype(np.int64).view(np.uint64)


def bloom_build(
    ds: "rd.Dataset",
    col: str,
    *,
    m_bits: int = 1 << 23,
    num_partitions: int | None = None,
) -> np.ndarray:
    """Bloom filter of ``col``'s value set: a uint64 word array (m_bits
    total). One pass, no key exchange — per-block word partials OR-merged
    per partition then on the driver (≤ P rows, m_bits/8 bytes each; 1 MB
    at the default). k = 4 set bits per value (_BLOOM_SEEDS); at the
    classic operating point m ≈ 10 bits/key this gives ~2% false positives
    and — by construction — zero false negatives, so a broadcast bloom is
    a sound FACT-STREAM PREFILTER in front of an exact semi-join: the
    filter prunes ~98% of non-matching rows for 1 MB shipped once, and the
    exact join only ever sees survivors. Deterministic for a given value
    set (OR is order-free).
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)
    assert m_bits % 64 == 0
    words = m_bits // 64

    def partial(df: pd.DataFrame) -> pa.Table:
        w = np.zeros(words, np.uint64)
        if len(df):
            base = _bloom_hash_base(df[col])
            for seed in _BLOOM_SEEDS:
                idx = (stable_hash64_np(base, seed=seed) % np.uint64(m_bits)).astype(np.int64)
                np.bitwise_or.at(w, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
        return pa.table({"bloom": pa.array([w.tobytes()], pa.binary())})

    def merge(df: pd.DataFrame) -> pa.Table:
        acc = np.zeros(words, np.uint64)
        for b in df["bloom"]:
            acc |= np.frombuffer(b, np.uint64)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    partials = ds.select_columns([col]).map_batches(partial, batch_format="pandas")
    merged = (
        partials.select_columns(["bloom"])
        .repartition(P)
        .map_batches(merge, batch_format="pandas")
        .to_pandas()
    )
    acc = np.zeros(words, np.uint64)
    if len(merged) and "bloom" in merged.columns:
        for b in merged["bloom"]:
            acc |= np.frombuffer(b, np.uint64)
    return acc


def bloom_might_contain(bloom: np.ndarray, vals) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False = certainly
    absent (the no-false-negatives guarantee callers rely on)."""
    m_bits = len(bloom) * 64
    base = _bloom_hash_base(pd.Series(vals) if not hasattr(vals, "dtype") else vals)
    ok = np.ones(len(base), bool)
    for seed in _BLOOM_SEEDS:
        idx = (stable_hash64_np(base, seed=seed) % np.uint64(m_bits)).astype(np.int64)
        ok &= (bloom[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1) != 0
    return ok


def bloom_prefilter(
    big: "rd.Dataset", bloom: np.ndarray, col: str
) -> "rd.Dataset":
    """Drop big-side rows whose ``col`` is certainly absent from the bloom
    (ships the word array once via ray.put; survivors still need the exact
    join — this stage only prunes the stream)."""
    import ray

    ref = ray.put(bloom)

    class Probe:
        def __init__(self):
            self.bloom = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return df[bloom_might_contain(self.bloom, df[col])]

    return big.map_batches(Probe, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


# ------------------------------------------------------------- t-digest

def _k_scale(q: np.ndarray, delta: int) -> np.ndarray:
    """Dunning's k1 scale function: k(q) = δ/(2π)·asin(2q−1). Its slope
    diverges at q→0,1, so k-space bins shrink toward the tails — the
    property that gives t-digests their near-exact tail quantiles."""
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _cluster(means: np.ndarray, weights: np.ndarray, delta: int):
    """Re-cluster SORTED centroids into ≤ ~δ/2 centroids by integer
    k-space bins (the one-pass vectorized merging variant): centroids
    whose mid-quantiles fall in the same k bin merge by weighted mean."""
    W = weights.sum()
    if W <= 0 or len(means) == 0:
        return means[:0], weights[:0]
    cum = np.cumsum(weights)
    qmid = (cum - weights / 2) / W
    buckets = np.floor(_k_scale(qmid, delta)).astype(np.int64)
    newb = np.empty(len(buckets), dtype=bool)
    newb[0] = True
    newb[1:] = buckets[1:] != buckets[:-1]
    starts = np.nonzero(newb)[0]
    w = np.add.reduceat(weights, starts)
    m = np.add.reduceat(means * weights, starts) / w
    return m, w


def _td_encode(m: np.ndarray, w: np.ndarray, lo: float, hi: float) -> bytes:
    head = np.array([len(m), lo, hi], np.float64)
    return np.concatenate([head, m, w]).tobytes()


def _td_decode(b: bytes):
    a = np.frombuffer(b, np.float64)
    n = int(a[0])
    return a[3 : 3 + n], a[3 + n : 3 + 2 * n], a[1], a[2]


def tdigest_build(
    ds: "rd.Dataset",
    col: str,
    *,
    delta: int = 400,
    num_partitions: int | None = None,
) -> dict:
    """One-pass mergeable t-digest of ``col`` (float): per-block digests
    (sort + k-space clustering, ≤ ~δ/2 centroids each), per-partition
    merges, then a driver merge of ≤ P tiny rows — no value ever leaves
    its block, the HLL/bloom exchange shape. Returns
    {"mean", "weight", "min", "max", "n"}.

    Accuracy: rank error per quantile is bounded by half the local k-bin
    width — O(q(1−q)/δ) mid-range and near-exact at the tails (k1 scale).
    The digest depends (boundedly) on the block partitioning — unlike HLL
    or CMS the merge is not bit-invariant; tests assert rank-error bounds
    at several partitionings rather than equality. Null/NaN values are
    rejected loudly (a silent drop would skew every quantile).
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def block_digest(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"td": pa.array([], pa.binary())})
        v = df[col].to_numpy(np.float64)
        assert not np.isnan(v).any(), "tdigest_build: null/NaN values"
        v = np.sort(v)
        m, w = _cluster(v, np.ones(len(v), np.float64), delta)
        return pa.table({"td": pa.array([_td_encode(m, w, v[0], v[-1])], pa.binary())})

    def merge_digests(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"td": pa.array([], pa.binary())})
        parts = [_td_decode(b) for b in df["td"]]
        m = np.concatenate([p[0] for p in parts])
        w = np.concatenate([p[1] for p in parts])
        lo = min(p[2] for p in parts)
        hi = max(p[3] for p in parts)
        order = np.lexsort((w, m))
        m2, w2 = _cluster(m[order], w[order], delta)
        return pa.table({"td": pa.array([_td_encode(m2, w2, lo, hi)], pa.binary())})

    partials = ds.select_columns([col]).map_batches(block_digest, batch_format="pandas")
    merged = (
        partials.repartition(P)
        .map_batches(merge_digests, batch_format="pandas")
        .to_pandas()
    )
    if not len(merged):
        return {"mean": np.empty(0), "weight": np.empty(0), "min": np.nan,
                "max": np.nan, "n": 0}
    parts = [_td_decode(b) for b in merged["td"]]
    m = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    if len(m) == 0:
        return {"mean": m, "weight": w, "min": np.nan, "max": np.nan, "n": 0}
    lo = min(p[2] for p in parts)
    hi = max(p[3] for p in parts)
    order = np.lexsort((w, m))
    m, w = _cluster(m[order], w[order], delta)
    return {"mean": m, "weight": w, "min": lo, "max": hi, "n": float(w.sum())}


def tdigest_quantile(td: dict, qs) -> np.ndarray:
    """Estimate quantiles by midpoint interpolation over the centroid
    cumulative weights, clamped to the tracked exact [min, max]."""
    qs = np.asarray(qs, np.float64)
    m, w, n = td["mean"], td["weight"], td["n"]
    if n == 0:
        return np.full(len(qs), np.nan)
    cum = np.cumsum(w) - w / 2
    xs = np.concatenate([[0.0], cum, [n]])
    ys = np.concatenate([[td["min"]], m, [td["max"]]])
    return np.interp(qs * n, xs, ys)


def tdigest_by(
    ds: "rd.Dataset",
    key_col: str,
    col: str,
    *,
    delta: int = 400,
) -> "rd.Dataset":
    """Per-group t-digests: Dataset (key, td binary) — one mergeable
    digest blob per key, the per-key analog of tdigest_build and the
    same exchange shape as hll_distinct_by: each block emits ONE ≤ ~δ/2-
    centroid blob per key PRESENT in that block, then blob rows merge by
    key (the groupby moves key-cardinality × block-count tiny rows, never
    values). Caller contract: categorical keys (a blob per key per block
    must be cheap). Decode estimates with tdigest_quantile on
    {"mean", "weight", "min", "max", "n"} from _td_unpack."""

    def partial(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {key_col: pa.array([], pa.string()), "td": pa.array([], pa.binary())}
            )
        k = df[key_col].to_numpy(dtype=object).astype(str)
        v = df[col].to_numpy(np.float64)
        assert not np.isnan(v).any(), "tdigest_by: null/NaN values"
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        uniq, starts = np.unique(k, return_index=True)
        bounds = np.concatenate([starts, [len(k)]])
        blobs = []
        for i in range(len(uniq)):
            seg = v[bounds[i]: bounds[i + 1]]
            m, w = _cluster(seg, np.ones(len(seg), np.float64), delta)
            blobs.append(_td_encode(m, w, seg[0], seg[-1]))
        return pa.table({key_col: pa.array(uniq, pa.string()), "td": pa.array(blobs, pa.binary())})

    def merge(df: pd.DataFrame) -> pa.Table:
        parts = [_td_decode(b) for b in df["td"]]
        m = np.concatenate([p[0] for p in parts])
        w = np.concatenate([p[1] for p in parts])
        lo = min(p[2] for p in parts)
        hi = max(p[3] for p in parts)
        order = np.lexsort((w, m))
        m2, w2 = _cluster(m[order], w[order], delta)
        return pa.table(
            {
                key_col: pa.array([str(df[key_col].iloc[0])], pa.string()),
                "td": pa.array([_td_encode(m2, w2, lo, hi)], pa.binary()),
            }
        )

    return (
        ds.select_columns([key_col, col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
    )


def td_unpack(blob: bytes) -> dict:
    """Decode one td blob into the tdigest_quantile input dict."""
    m, w, lo, hi = _td_decode(blob)
    return {"mean": m, "weight": w, "min": lo, "max": hi, "n": float(w.sum())}
