"""Deterministic sampling and per-group top-N selection.

Training-data pipelines need reproducible subsetting: the same corpus and
rate must yield the same sample on any cluster size, partitioning, or run
(re-runs of a 100 TB job must not re-shuffle the sample). Both operators
here are pure per-batch decisions with no cross-partition state:

- ``stratified_sample``: keep a row iff the low 64 bits of md5(id) mod a
  fixed denominator fall below the stratum's rate — the classic hash-
  bucket sample. Exactly reproducible in SQL via DuckDB's
  ``md5_number_lower``; per-stratum rates let under-represented sources
  keep more. Embarrassingly parallel (a filter), no shuffle at any scale.
- ``top_n_per_group``: newest N rows per key, the row_number()-window
  shape. Partition-grouped like window.sessionize: keys route by
  hash(key) % P and ONE vectorized lexsort pass per partition ranks all
  its keys (never a Python group per key). One shuffle on the group key.

Reference parity note: the reference (michaelleerilee/CCL) has no sampling
operators; these are part of the training-data extension suite (SURVEY.md
§2 "beyond-reference" operators).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MD5_DENOM = 10_000


def _md5_low64(vals) -> np.ndarray:
    """Low 64 bits (little-endian bytes 8..16) of md5(str(v)) — the exact
    value of DuckDB's md5_number_lower(CAST(v AS VARCHAR))."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16], "little")
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


def stratified_sample(
    docs: "object",
    *,
    id_col: str = "doc_id",
    strata_col: str = "source",
    rates: dict | None = None,
    default_rate: float = 0.1,
    columns: list | None = None,
) -> "object":
    """Deterministic hash-bucket sample, stratified by ``strata_col``.

    Keeps a row iff md5_low64(id) % 10000 < round(rate * 10000), where rate
    is ``rates[stratum]`` or ``default_rate``. The decision depends only on
    the row itself — identical output for any partitioning / cluster size.
    """
    rates = rates or {}
    thresholds = {s: int(round(r * _MD5_DENOM)) for s, r in rates.items()}
    default_thr = int(round(default_rate * _MD5_DENOM))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df if columns is None else df[columns]
        h = _md5_low64(df[id_col].values) % np.uint64(_MD5_DENOM)
        thr = df[strata_col].map(thresholds).fillna(default_thr).values.astype(np.uint64)
        out = df[h < thr]
        return out if columns is None else out[columns]

    return docs.map_batches(keep, batch_format="pandas")


def top_n_per_group(
    ds: "object",
    n: int,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> "object":
    """Newest ``n`` rows per key: (key, id, ts, rn) with rn = row_number()
    ordered by (ts DESC, id ASC) within the key.

    Partition-grouped: one hash shuffle on ``key``, then a single vectorized
    lexsort + segmented rank per partition covers all its keys.
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_strings_np, stable_hash64_np

    P = resolve_partitions(num_partitions)
    in_schema = ds.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [
            (key, key_type),
            (id_col, pa.int64()),
            (ts_col, pa.timestamp("us")),
            ("rn", pa.int64()),
        ]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        if pa.types.is_string(key_type) or pa.types.is_large_string(key_type):
            h = hash_strings_np(kcol.to_numpy(zero_copy_only=False))
        else:
            h = stable_hash64_np(
                kcol.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
            )
        return pa.table(
            {
                key: kcol,
                id_col: batch.column(id_col),
                ts_col: batch.column(ts_col),
                "part": pa.array((h % np.uint64(P)).astype(np.int64)),
            }
        )

    def rank_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        keys = df[key].values
        ts = df[ts_col].values.astype("datetime64[us]")
        ids = df[id_col].values
        kcodes, _ = pd.factorize(keys, sort=True)
        order = np.lexsort((ids, -ts.astype(np.int64), kcodes))
        keys, ts, ids, kcodes = keys[order], ts[order], ids[order], kcodes[order]
        m = len(keys)
        grp_start = np.empty(m, bool)
        grp_start[0] = True
        grp_start[1:] = kcodes[1:] != kcodes[:-1]
        rn = np.arange(m) - np.maximum.accumulate(np.where(grp_start, np.arange(m), 0))
        kept = rn < n
        out = pd.DataFrame(
            {
                key: keys[kept],
                id_col: ids[kept],
                ts_col: ts[kept],
                "rn": (rn[kept] + 1).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
    )


def weighted_bernoulli_sample(
    ds: "object",
    *,
    id_col: str,
    weight_col: str,
    scale: float = 10.0,
    columns: list | None = None,
) -> "object":
    """Deterministic weight-proportional Bernoulli sample.

    Keeps a row iff md5_low64(id) % 10000 < clip(floor(w*scale + 0.5), 0,
    10000) — inclusion probability min(1, w·scale/10000), exactly
    reproducible at any partitioning (pure per-row decision, no shuffle)
    and exactly mirrorable in SQL (DuckDB md5_number_lower + the same
    floor(x+0.5) fixed-point rounding — np.round would bankers-round .5
    boundaries differently). The Poisson-sampling workhorse for
    importance-weighted corpus subsetting; for fixed-k weighted reservoirs
    the ranking key u^(1/w) is NOT used here because pow()'s last-ulp
    behavior differs across engines and would break exact SQL twinning.
    """

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df if columns is None else df[columns]
        h = _md5_low64(df[id_col].values) % np.uint64(_MD5_DENOM)
        thr = np.floor(df[weight_col].to_numpy(np.float64) * scale + 0.5)
        thr = np.clip(thr, 0, _MD5_DENOM).astype(np.uint64)
        out = df[h < thr]
        return out if columns is None else out[columns]

    return ds.map_batches(keep, batch_format="pandas")


def bottomk_sample(
    ds: "object",
    k: int,
    *,
    id_col: str = "doc_id",
    columns: list | None = None,
) -> "object":
    """EXACT-size-k uniform sample without order or randomness state: keep
    the k rows with the smallest md5_low64(id) — "bottom-k by hash", the
    mergeable fixed-size counterpart of the rate-based hash-bucket sample
    (a reservoir sample is order-dependent and irreproducible across
    partitionings; bottom-k is a pure function of the id set).

    Scale shape: per-block partial k-selection (each block emits ≤ k rows),
    then ONE tiny final block merges ≤ P·k candidates — the top-k exchange
    shape (aggregates.topk / top_revenue_orders); the data never shuffles.
    Exactly mirrorable in SQL: ORDER BY md5_number_lower(CAST(id AS
    VARCHAR)), id LIMIT k (the id tie-break makes hash collisions — and
    therefore the row set — deterministic on both sides).
    """
    assert k > 0

    def block_bottom(df: pd.DataFrame) -> pd.DataFrame:
        if columns is not None:
            df = df[columns]
        if not len(df):
            return df
        h = _md5_low64(df[id_col].values)
        order = np.lexsort((df[id_col].to_numpy(), h))[:k]
        return df.iloc[order]

    return (
        ds.map_batches(block_bottom, batch_format="pandas")
        .repartition(1)
        .map_batches(block_bottom, batch_format="pandas")
    )


def group_bottomk(
    ds: "object",
    k: int,
    *,
    id_col: str = "doc_id",
    group_col: str = "lang",
    columns: list | None = None,
) -> "object":
    """EXACT-size-k-per-group deterministic sample: within each value of
    ``group_col`` keep the k rows with the smallest md5_low64(id), id
    tie-break — the stratified counterpart of :func:`bottomk_sample`
    (same reproducibility argument: a pure function of the id set per
    stratum, identical on any partitioning or cluster size).

    Scale shape: per-block partial selection first (each block emits ≤ k
    rows PER GROUP PRESENT — the only rows that can survive the global
    cut), then ONE hash shuffle of those ≤ P·k·G survivors on the group
    key and a per-partition final selection (the top_n_per_group route +
    rank shape). Neither step materializes the input; the big table never
    shuffles. SQL twin: row_number() OVER (PARTITION BY group ORDER BY
    md5_number_lower(CAST(id AS VARCHAR)), id) <= k.
    """
    assert k > 0

    def block_bottom(df: pd.DataFrame) -> pd.DataFrame:
        if columns is not None:
            df = df[columns]
        if not len(df):
            return df
        h = _md5_low64(df[id_col].values)
        gcodes, _ = pd.factorize(df[group_col].values, sort=True)
        order = np.lexsort((df[id_col].to_numpy(), h, gcodes))
        return df.iloc[order].groupby(group_col, sort=False).head(k)

    partial = ds.map_batches(block_bottom, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return block_bottom(df)

    return partial.groupby(group_col).map_groups(final, batch_format="pandas")
