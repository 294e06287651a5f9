"""Fuzzy key dedup: exact edit-distance-1 pairs over a string key column.

Deletion-neighborhood blocking (the public FastSS / SymSpell family):
for lev(s, t) <= 1 the two strings share a member of
D(x) = {x} ∪ {x with one char deleted} — substitution pairs share the
deletion at the substituted position, indel pairs share the shorter string
itself. Sharing an element of D(s) ∩ D(t) only bounds lev <= 2, so every
candidate is verified with a closed-form vectorized check (no DP needed at
distance 1). No false negatives, exact output.

Scale shape (100 TB): the row domain collapses to DISTINCT keys first
(partial-agg — the same move exact_dedup makes), so everything downstream
is bounded by key cardinality, not row count; signatures fan out ~len+1
rows per distinct key and route by hash(signature) — deletion buckets are
naturally tiny (strings within one deletion of each other), so the
partition-grouped pair emission reuses the LSH machinery's lexsort pass
(dedup._emit_bucket_pairs) without its hot-bucket cap ever binding.

Reference analog: key-equivalence classes (ccl_marker_stack translation
tables) generalized to near-equality on string keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ccl_ray.config import EngineConfig, resolve_partitions
from ccl_ray.functions.hashing import hash_strings_np
from ccl_ray.stages.dedup import _emit_bucket_pairs

# deletion buckets hold strings within one deletion of one another; 256 is
# far above any real bucket and exists only as the same memory guard the
# LSH path uses
_FUZZY_CAP = 256


def _editdist_le1(a_names, b_names) -> np.ndarray:
    """Vectorized levenshtein(a, b) <= 1 for pairs of DISTINCT strings.

    Closed form at distance 1: equal lengths need exactly one mismatching
    byte; lengths differing by one need longer-minus-one-char (deleted at
    the first mismatch) to equal the shorter. Operates on a padded byte
    matrix — candidate pair counts are deletion-bucket-bounded, so the
    per-call matrix stays small.
    """
    n = len(a_names)
    if n == 0:
        return np.zeros(0, bool)
    ab = [s.encode() for s in a_names]
    bb = [s.encode() for s in b_names]
    la = np.array([len(x) for x in ab], np.int64)
    lb = np.array([len(x) for x in bb], np.int64)
    L = int(max(la.max(), lb.max())) + 1
    A = np.frombuffer(b"".join(x.ljust(L, b"\0") for x in ab), np.uint8).reshape(n, L)
    B = np.frombuffer(b"".join(x.ljust(L, b"\0") for x in bb), np.uint8).reshape(n, L)
    out = np.zeros(n, bool)
    same = la == lb
    if same.any():
        out[same] = (A[same] != B[same]).sum(1) == 1
    d1 = np.abs(la - lb) == 1
    if d1.any():
        idx = np.nonzero(d1)[0]
        a_short = (la < lb)[idx, None]
        S = np.where(a_short, A[idx], B[idx])
        T = np.where(a_short, B[idx], A[idx])
        ls = np.minimum(la, lb)[idx]
        neq = S != T
        first = np.where(neq.any(1), neq.argmax(1), ls)
        cols = np.arange(L)[None, :]
        gat = np.minimum(cols + (cols >= first[:, None]), L - 1)
        Tdel = np.take_along_axis(T, gat, axis=1)
        out[idx] = (Tdel == S).all(1)
    return out


def editdist1_pairs(
    ds: "rd.Dataset", col: str, *, cfg: EngineConfig | None = None
) -> "rd.Dataset":
    """Distinct-value pairs (name_a < name_b) of ``col`` at edit distance
    exactly 1. Output columns: name_a, name_b (strings)."""
    cfg = cfg or EngineConfig()
    P = resolve_partitions(cfg.num_partitions)

    from ccl_ray.stages.aggregates import partial_sum_agg

    def clean(t: pa.Table) -> pa.Table:
        # drop null/empty keys BEFORE the distinct agg: an all-null block
        # would otherwise type its column `null` and break Arrow concat
        c = t.column(col)
        keep = pc.and_(pc.is_valid(c), pc.greater(pc.utf8_length(pc.cast(c, pa.string())), 0))
        return pa.table({col: pc.cast(c.filter(keep), pa.string())})

    names = partial_sum_agg(
        ds.map_batches(clean, batch_format="pyarrow"), [col], {}, count_as="_n"
    ).select_columns([col])

    def sigs(df: pd.DataFrame) -> pa.Table:
        # all-Rust polars pass: one row per (name, deletion-signature)
        import polars as pl

        s = pl.from_pandas(df[[col]]).rename({col: "name"})
        s = s.filter(pl.col("name").is_not_null() & (pl.col("name").str.len_bytes() > 0))
        full = s.select(pl.col("name"), pl.col("name").alias("sig"))
        dels = (
            s.with_columns(pl.int_ranges(0, pl.col("name").str.len_chars()).alias("_i"))
            .explode("_i")
            .filter(pl.col("_i").is_not_null())
            .with_columns(
                (
                    pl.col("name").str.slice(0, pl.col("_i"))
                    + pl.col("name").str.slice(pl.col("_i") + 1)
                ).alias("sig")
            )
            .select("name", "sig")
        )
        both = pl.concat([full, dels])
        sig_h = hash_strings_np(both["sig"].to_numpy(), seed=11).astype(np.int64)
        name_h = hash_strings_np(both["name"].to_numpy(), seed=0).astype(np.int64)
        part = (sig_h.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "name": pa.array(both["name"].to_list(), pa.string()),
                "sig_h": pa.array(sig_h),
                "name_h": pa.array(name_h),
                "part": pa.array(part),
            }
        )

    def pairs_part(df: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"name_a": pa.array([], pa.string()), "name_b": pa.array([], pa.string())}
        )
        if len(df) < 2:
            return empty
        sig_h = df["sig_h"].values.astype(np.int64)
        name_h = df["name_h"].values.astype(np.int64)
        nm = df["name"].values
        order = np.lexsort((name_h, sig_h))
        sig_h, name_h, nm = sig_h[order], name_h[order], nm[order]
        ai, bi, keep = _emit_bucket_pairs(name_h, [sig_h], _FUZZY_CAP)
        if not len(ai):
            return empty
        nm = nm[keep]
        na, nb = nm[ai], nm[bi]
        swap = na > nb  # canonical string order (ids were hash-ordered)
        na, nb = np.where(swap, nb, na), np.where(swap, na, nb)
        return pa.table({"name_a": pa.array(na, pa.string()), "name_b": pa.array(nb, pa.string())})

    def route_pair(batch: pa.Table) -> pa.Table:
        a = batch.column("name_a").to_pandas().values
        b = batch.column("name_b").to_pandas().values
        key = hash_strings_np(pd.Series(a).str.cat(pd.Series(b), sep="\x00").values)
        part = (key % np.uint64(P)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def verify_part(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["name_a", "name_b"])
        ok = _editdist_le1(df["name_a"].values, df["name_b"].values)
        sub = df[ok]
        return pa.table(
            {
                "name_a": pa.array(sub["name_a"].values, pa.string()),
                "name_b": pa.array(sub["name_b"].values, pa.string()),
            }
        )

    buckets = names.map_batches(sigs, batch_format="pandas")
    cand = buckets.groupby("part").map_groups(pairs_part, batch_format="pandas")
    routed = cand.map_batches(route_pair, batch_format="pyarrow")
    return routed.groupby("part").map_groups(verify_part, batch_format="pandas")
