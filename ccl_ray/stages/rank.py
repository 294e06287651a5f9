"""Exact global row_number / ntile under a total key order.

The distributed-rank classic: one range-partitioned sort (Ray Data's
push-based shuffle), then per-block ranks = exclusive-prefix block sizes +
local arange. The driver touches exactly P integers (the block sizes) —
values never leave the object store, and the second pass is zero-copy per
block. Generalizes the reference's sorted deterministic iteration (O1,
ccl_marker_stack's sorted label scans) into a reusable primitive.

Ntile uses the explicit formula tile = ((rank−1)·B) // n + 1 (NOT SQL's
NTILE remainder rule) so the SQL twin is the same one-line expression on
both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.state.shards import as_arrow_block


@ray.remote
def _blk_rows(b) -> int:
    return as_arrow_block(b).num_rows


@ray.remote
def _add_rank(b, offset, n_total, ntile, out, tile_out):
    t = as_arrow_block(b)
    r = offset + np.arange(1, t.num_rows + 1, dtype=np.int64)
    t = t.append_column(out, pa.array(r))
    if ntile:
        t = t.append_column(tile_out, pa.array(((r - 1) * ntile) // n_total + 1))
    return t


def global_rank(
    ds,
    keys: list[str],
    *,
    out: str = "rnk",
    ntile: int | None = None,
    tile_out: str = "tile",
) -> "ray.data.Dataset":
    """All input columns plus ``out`` = exact 1-based global rank under
    ascending ``keys`` (callers must make the order total — add a
    tie-break key). With ``ntile``, also ``tile_out`` =
    ((rank−1)·ntile)//n + 1 ∈ [1, ntile]."""
    import ray.data as rd

    srt = ds.sort(keys).materialize()
    refs = srt.to_arrow_refs()
    sizes = ray.get([_blk_rows.remote(b) for b in refs])
    n_total = int(sum(sizes))
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    tables = [
        _add_rank.remote(b, int(off), n_total, ntile or 0, out, tile_out)
        for b, off in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(tables)
