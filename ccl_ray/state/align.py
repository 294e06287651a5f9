"""Route per-vertex values (keyed by ORIGINAL vid) into shard-aligned vectors.

The seed loader for BSP algorithms that take external per-vertex input —
personalized PageRank restart weights, multi-source BFS seed distances,
user markers. One routed exchange, no driver materialization:

- non-dense bundle: (vid, value) rows split by ``hash(vid) % P`` directly
  (the same routing that built the vid shards).
- dense bundle: rows split by the bundle's range splitters, renumbered to
  the dense domain by the owning range task, then split by
  ``hash(dense) % P`` — mirroring exactly how the dense vid shards were
  routed, so ``searchsorted`` alignment inside each shard is total.

Rows whose vid is not a graph vertex are dropped (the graph defines the
domain). Duplicate vids combine by ``combine`` ("add" or "min"), applied
with sort + reduceat so float summation order is deterministic.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.state.shards import as_arrow_block, part_of


def _hash_split(v: np.ndarray, w: np.ndarray, P: int):
    parts = part_of(v.astype(np.int64), P)
    order = np.argsort(parts, kind="stable")
    v, w, parts = v[order], w[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    return tuple(
        (v[bounds[p] : bounds[p + 1]], w[bounds[p] : bounds[p + 1]]) for p in range(P)
    )


def _block_vid_values(block, vcol, wcol, default_weight, dtype):
    block = as_arrow_block(block)
    if block.num_rows == 0 or vcol not in block.column_names:
        return np.empty(0, np.int64), np.empty(0, dtype)
    v = block.column(vcol).to_numpy(zero_copy_only=False).astype(np.int64)
    if wcol is not None and wcol in block.column_names:
        w = block.column(wcol).to_numpy(zero_copy_only=False).astype(dtype)
    else:
        w = np.full(len(v), default_weight, dtype)
    return v, w


@ray.remote
def _split_values_hash(block, vcol, wcol, P, default_weight, dtype_str):
    v, w = _block_vid_values(block, vcol, wcol, default_weight, np.dtype(dtype_str))
    out = _hash_split(v, w, P)
    return out[0] if P == 1 else out


@ray.remote
def _split_values_range(block, vcol, wcol, splitters, R, default_weight, dtype_str):
    v, w = _block_vid_values(block, vcol, wcol, default_weight, np.dtype(dtype_str))
    r = np.searchsorted(splitters, v, side="right")
    order = np.argsort(r, kind="stable")
    v, w, r = v[order], w[order], r[order]
    bounds = np.searchsorted(r, np.arange(R + 1))
    out = tuple(
        (v[bounds[i] : bounds[i + 1]], w[bounds[i] : bounds[i + 1]]) for i in range(R)
    )
    return out[0] if R == 1 else out


@ray.remote
def _range_to_dense_hash(vids_r, off_r, P, dtype, *pieces):
    """Renumber this range's rows to dense ids (dropping vids not in the
    graph), then route by hash(dense) like _dense_vids_route did."""
    vs = [p[0] for p in pieces]
    ws = [p[1] for p in pieces]
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, np.float64)
    if v.size and len(vids_r):
        idx = np.searchsorted(vids_r, v)
        idx_c = np.minimum(idx, len(vids_r) - 1)
        present = vids_r[idx_c] == v
        dense = (off_r + idx_c[present]).astype(np.int64)
        w = w[present]
    else:
        dense, w = np.empty(0, np.int64), w[:0]
    out = _hash_split(dense, w, P)
    return out[0] if P == 1 else out


@ray.remote
def _build_aligned(vids_p, combine, default, dtype_str, *pieces):
    dtype = np.dtype(dtype_str)
    vec = np.full(len(vids_p), default, dtype)
    vs = [np.asarray(p[0]) for p in pieces]
    ws = [np.asarray(p[1]) for p in pieces]
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, dtype)
    if not v.size or not len(vids_p):
        return vec
    idx = np.searchsorted(vids_p, v)
    idx_c = np.minimum(idx, len(vids_p) - 1)
    present = np.asarray(vids_p)[idx_c] == v
    i, ww = idx_c[present], w[present].astype(dtype)
    if not i.size:
        return vec
    order = np.argsort(i, kind="stable")
    i, ww = i[order], ww[order]
    pos, starts = np.unique(i, return_index=True)
    if combine == "add":
        vec[pos] = np.add.reduceat(ww, starts)
    elif combine == "min":
        vec[pos] = np.minimum(vec[pos], np.minimum.reduceat(ww, starts))
    elif combine == "max":
        vec[pos] = np.maximum(vec[pos], np.maximum.reduceat(ww, starts))
    else:
        raise ValueError(f"unknown combine {combine!r}")
    return vec


def align_vertex_values(
    shards: dict,
    values_ds,
    *,
    value_col: str | None = None,
    vid_col: str = "vid",
    default=0.0,
    default_weight=1.0,
    combine: str = "add",
    dtype=np.float64,
) -> list:
    """P refs of ``dtype`` arrays aligned to ``shards["vids"]``.

    ``values_ds``: Dataset with ``vid_col`` in the ORIGINAL vid domain and
    optionally ``value_col`` (missing → ``default_weight`` per row).
    Positions with no row get ``default``; duplicates combine by ``combine``.
    """
    P = shards["P"]
    dts = np.dtype(dtype).str
    block_refs = values_ds.to_arrow_refs()
    dense = shards.get("dense")
    if dense is not None:
        range_vids = dense["range_vids"]
        R = len(range_vids)
        split = _split_values_range.options(num_returns=R)
        m1 = [
            split.remote(b, vid_col, value_col, dense["splitters"], R, default_weight, dts)
            for b in block_refs
        ]
        if R == 1:
            m1 = [[m] for m in m1]
        to_dense = _range_to_dense_hash.options(num_returns=P)
        m2 = [
            to_dense.remote(range_vids[r], int(dense["offsets"][r]), P,
                            dense["dtype"], *[row[r] for row in m1])
            for r in range(R)
        ]
        if P == 1:
            m2 = [[m] for m in m2]
        rows = m2
    else:
        split = _split_values_hash.options(num_returns=P)
        rows = [
            split.remote(b, vid_col, value_col, P, default_weight, dts) for b in block_refs
        ]
        if P == 1:
            rows = [[m] for m in rows]
    return [
        _build_aligned.remote(shards["vids"][p], combine, default, dts,
                              *[row[p] for row in rows])
        for p in range(P)
    ]
