"""Partitioned hash join built from Ray Data primitives (union + groupby).

Ray 2.49's ``Dataset.join`` is experimental: its aggregator actors crash on
empty partitions (pyarrow FieldRef error) and chained joins in one plan can
stall the streaming executor. This module implements the portable pattern
instead: add a stable ``part = hash(key) % P`` column to both sides, tag the
side, union, ``groupby(part)`` (task-based sort shuffle — no actor pools to
starve), and run a vectorized in-memory ``pyarrow.Table.join`` per partition.
P (``num_partitions``) bounds per-partition memory at scale; hot keys can be
salted by the caller before joining.

Join keys must be non-null; column names of the two sides must be disjoint
(rename before calling). Payload columns may be any Arrow type. Dtype
integrity through Ray's shuffle (which may round-trip blocks via pandas):
the tagged union zero-fills the other side's columns (null-free int64
stays int64 — see _pad) and join_part casts back to the declared schema.
Remaining caveat: an int64 PAYLOAD column whose own data contains nulls
still promotes to float64 in a pandas round-trip and values above 2^53
would lose precision — keep full-range int64 payloads non-null (keys
already are by contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.functions.hashing import stable_hash64_np

_PART = "__part"
_SIDE = "__side"


def _partition_ids(key_arr: pa.ChunkedArray | pa.Array, P: int) -> pa.Array:
    t = key_arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        from ccl_ray.functions.hashing import hash_strings_np

        h = hash_strings_np(key_arr.to_numpy(zero_copy_only=False))
        part = (h % np.uint64(P)).astype(np.int32)
        return pa.array(part)
    np_keys = key_arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    part = (stable_hash64_np(np_keys.view(np.uint64)) % np.uint64(P)).astype(np.int32)
    return pa.array(part)


def _pad(n: int, t: pa.DataType) -> pa.Array:
    """Null-FREE filler for the other side's columns in the tagged union.

    Ray's sort shuffle may round-trip blocks through pandas, where an int64
    column containing nulls promotes to float64 — int64 values above 2^53
    would then lose low bits SILENTLY (a later cast back to int64 cannot
    recover them). Zero-filling instead of null-filling keeps integer
    columns integer through the shuffle; join_part filters by _SIDE before
    reading any column, so the filler values are never observed."""
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pa.array(np.zeros(n, np.int64)).cast(t)
    if pa.types.is_boolean(t):
        return pa.array(np.zeros(n, bool))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.array([""] * n, t)
    if pa.types.is_timestamp(t):
        return pa.array(np.zeros(n, np.int64)).cast(t)
    return pa.nulls(n, t)  # nested/other types: pandas keeps them as objects


def _tagged(ds: "rd.Dataset", on: str, P: int, side: int, schema: pa.Schema) -> "rd.Dataset":
    names = [f.name for f in schema]

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        cols[_PART] = _partition_ids(batch.column(on), P)
        cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
        for f in schema:
            if f.name in batch.column_names:
                cols[f.name] = batch.column(f.name).cast(f.type)
            else:
                cols[f.name] = _pad(n, f.type)
        return pa.table({k: cols[k] for k in [_PART, _SIDE] + names})

    return ds.map_batches(tag, batch_format="pyarrow")


def hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_partitions: int | None = None,
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
) -> "rd.Dataset":
    """Hash-partitioned equi-join; ``how`` in {"inner", "left outer"}.

    Output columns: all left columns then all right columns except the right
    key (like pyarrow's join). Left/right column names must be disjoint.
    ``left_schema``/``right_schema``: explicit Arrow schemas for sides that
    may be ALL-empty — Ray 2.49 returns ``schema() is None`` for an empty
    dataset downstream of map_batches, so a caller that can produce an
    empty side must pass its statically-known schema.
    """
    assert how in ("inner", "left outer")

    def _side_schema(ds, override, name):
        if override is not None:
            return pa.schema(override)
        s = ds.schema()
        if s is None:
            raise ValueError(
                f"hash_join: {name} side has no schema (all-empty dataset after "
                "map_batches — Ray 2.49 quirk); pass "
                f"{name}_schema= with the statically-known schema"
            )
        return pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])

    ls = _side_schema(left, left_schema, "left")
    rs = _side_schema(right, right_schema, "right")
    overlap = set(ls.names) & set(rs.names)
    if overlap:
        raise ValueError(f"join sides share column names {overlap}; rename first")
    combined = pa.schema(list(ls) + list(rs))
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    tagged = _tagged(left, left_on, P, 0, combined).union(_tagged(right, right_on, P, 1, combined))

    l_names = list(ls.names)
    r_names = list(rs.names)
    out_names = l_names + [n for n in r_names if n != right_on]

    def join_part(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy(zero_copy_only=False)
        # Restore declared types: Ray's sort shuffle may round-trip blocks
        # through pandas, where the union's cross-side nulls promote int64
        # columns to float64 — without this cast every int key/payload
        # column comes out double (and joins/groupbys downstream see
        # mismatched key dtypes). Values are exact (they started as ints).
        lt = group.filter(pa.array(side == 0)).select(l_names).cast(
            pa.schema([combined.field(n) for n in l_names])
        )
        rt = group.filter(pa.array(side == 1)).select(r_names).cast(
            pa.schema([combined.field(n) for n in r_names])
        )
        if lt.num_rows == 0:
            return pa.table({n: pa.nulls(0, combined.field(n).type) for n in out_names})
        if rt.num_rows == 0:
            if how == "inner":
                return pa.table({n: pa.nulls(0, combined.field(n).type) for n in out_names})
            out = {n: lt.column(n) for n in l_names}
            for n in r_names:
                if n != right_on:
                    out[n] = pa.nulls(lt.num_rows, combined.field(n).type)
            return pa.table({n: out[n] for n in out_names})
        # Join on (key, row-index) then take payload columns: pyarrow's
        # Table.join rejects nested payload types (e.g. list<int64> shingle
        # columns), while take supports every Arrow type — and take with a
        # null index (unmatched left-outer row) yields null, as required.
        import pyarrow.compute as pc

        lt_keys = pa.table(
            {left_on: lt.column(left_on), "__li": pa.array(np.arange(lt.num_rows, dtype=np.int64))}
        )
        rt_keys = pa.table(
            {right_on: rt.column(right_on), "__ri": pa.array(np.arange(rt.num_rows, dtype=np.int64))}
        )
        j = lt_keys.join(
            rt_keys,
            keys=[left_on],
            right_keys=[right_on],
            join_type="inner" if how == "inner" else "left outer",
        )
        li, ri = j.column("__li"), j.column("__ri")
        out = {n: pc.take(lt.column(n), li) for n in l_names}
        for n in r_names:
            if n != right_on:
                out[n] = pc.take(rt.column(n), ri)
        return pa.table({n: out[n] for n in out_names})

    return tagged.groupby(_PART).map_groups(join_part, batch_format="pyarrow")


# dimension sides up to this many rows ship once via ray.put; above it the
# "small" side isn't small and the hash-partitioned join runs instead (same
# guard rationale as relabel._LABEL_BROADCAST_LIMIT / aggregates' keep-sets)
_DIM_BROADCAST_LIMIT = 2_000_000


def broadcast_lookup_join(
    big: "rd.Dataset",
    small: "rd.Dataset",
    *,
    big_key: str,
    small_key: str,
    value_cols: list[str],
    how: str = "inner",
    limit: int = _DIM_BROADCAST_LIMIT,
) -> "rd.Dataset":
    """Dimension join: put the small side in the object store ONCE and map
    it into the big side's batches — the fact table never shuffles (the
    star-schema shape every TPC-H-like pipeline needs at 100 TB: a shuffle
    join would move every fact row for a dimension thousands of times
    smaller). ``value_cols=[]`` is a semi-join (pure key filter).

    ``how``: "inner" drops unmatched big rows; "left outer" keeps them with
    value columns as float64 NaN (the pandas-native missing encoding — use
    inner when exact dtypes matter for unmatched rows). The small side's
    keys must be unique (a dimension contract, asserted). Sides over
    ``limit`` rows fall back to the hash-partitioned join.
    """
    assert how in ("inner", "left outer")
    import ray

    small = small.materialize()
    if small.count() > limit:
        return hash_join(big, small, left_on=big_key, right_on=small_key, how=how)

    small_df = small.to_pandas()
    assert small_df[small_key].is_unique, "broadcast_lookup_join: dimension keys must be unique"
    ref = ray.put(small_df)

    class Lookup:
        def __init__(self):
            df = ray.get(ref)
            self.idx = pd.Index(df[small_key])
            self.vals = {c: df[c].to_numpy() for c in value_cols}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pos = self.idx.get_indexer(df[big_key].to_numpy())
            if how == "inner":
                hit = pos >= 0
                df = df.loc[hit].reset_index(drop=True)
                pos = pos[hit]
                for c, v in self.vals.items():
                    df[c] = v[pos]
            else:
                miss = pos < 0
                for c, v in self.vals.items():
                    col = v[np.maximum(pos, 0)].astype(np.float64, copy=True)
                    col[miss] = np.nan
                    df[c] = col
            return df

    return big.map_batches(Lookup, batch_format="pandas", concurrency=(1, 8), max_restarts=0)
