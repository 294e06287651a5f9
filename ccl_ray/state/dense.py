"""Dense global vertex renumbering for the BSP engines.

Order-preserving map vid -> rank (0..N-1, int32 when N < 2^31). The CC
fixpoint then iterates over int32 labels instead of int64 vids, halving the
bytes moved by the dominant per-iteration operation (the per-edge label
gather) — measured on this machine (tools/probe_roofline.py) the bare
kernel's 8→32-process scaling efficiency moves 0.56 → 0.69 and aggregate
throughput 1.58× at 32 procs, because the kernel is DRAM-bandwidth-bound.
Order preservation keeps min-label semantics: the min dense id of a
component maps back to the min original vid.

Distributed build (no driver data path; all exchanges are O(P) grouped
objects, each task holds ~N/P vids):
  1. hash-exchange vids (reuses state.shards.shard_vertices);
  2. sample each shard -> driver picks P-1 range splitters (tiny);
  3. range-exchange vids -> per-range sorted unique arrays; counts -> the
     (P+1)-entry offsets table (the only driver-held state);
  4. dense id of v = offsets[r] + index of v within range r;
  5. edges renumber via two routed exchanges (by src range, then dst
     range), the second fused with the hash(src_dense) routing that feeds
     the normal CSR build;
  6. the hash-partitioned dense vid shards feed the unchanged scatter /
     combine / jump machinery.

Translate-back is one resolve wave (route unique dense ids to their range
owner, answer with the original vid) — the same shape as the CC pointer
jump.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.state.shards import (
    as_piece_list,
    _build_csr,
    combine_plans,
    part_of,
    scatter_plans,
    shard_vertices,
)

_SAMPLES_PER_SHARD = 256


_as_list = as_piece_list


# ------------------------------------------------------------- rank build

@ray.remote
def _sample_sorted(vids: np.ndarray, s: int) -> np.ndarray:
    if len(vids) == 0:
        return np.empty(0, np.int64)
    idx = np.linspace(0, len(vids) - 1, min(s, len(vids))).astype(np.int64)
    return vids[idx]


@ray.remote
def _range_split_vids(vids: np.ndarray, splitters: np.ndarray, P: int):
    bounds = np.searchsorted(vids, splitters)
    out = tuple(np.split(vids, bounds))
    return out[0] if P == 1 else out


@ray.remote
def _range_merge(*pieces):
    arrs = [np.asarray(p) for p in pieces]
    if not arrs:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(arrs))


@ray.remote
def _len_of(a) -> int:
    return len(a)


def _pick_splitters(sample_refs: list, P: int) -> np.ndarray:
    """P-1 range boundaries from per-shard samples (driver-side, tiny)."""
    s = np.sort(np.concatenate(ray.get(sample_refs))) if sample_refs else np.empty(0, np.int64)
    if s.size == 0 or P == 1:
        return np.empty(0, np.int64)
    qs = np.linspace(0, s.size, P + 1)[1:-1].astype(np.int64)
    return np.unique(s[np.minimum(qs, s.size - 1)])


# --------------------------------------------------------- edge renumber

@ray.remote
def _split_edges_by_range(block: pa.Table, src_col: str, dst_col: str,
                          splitters: np.ndarray, P: int):
    """Route (src,dst) pairs of one edge block by range(src).

    Symmetrization is DEFERRED to the final hash-routing step so the two
    renumber exchanges carry half the pairs."""
    from ccl_ray.state.shards import as_arrow_block

    block = as_arrow_block(block)
    if block.num_rows == 0 or src_col not in block.column_names:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return empty if P == 1 else tuple(empty for _ in range(P))
    s = block.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d = block.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
    r = np.searchsorted(splitters, s, side="right")
    order = np.argsort(r, kind="stable")
    s, d, r = s[order], d[order], r[order]
    bounds = np.searchsorted(r, np.arange(P + 1))
    out = tuple((s[bounds[p] : bounds[p + 1]], d[bounds[p] : bounds[p + 1]]) for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _renumber_src_route_dst(vids_r: np.ndarray, off_r: int,
                            splitters: np.ndarray, P: int, dtype, *pieces):
    """src -> dense (this range owns all srcs here), then route by range(dst)."""
    ss = [po[0] for po in pieces]
    ds = [po[1] for po in pieces]
    s = np.concatenate(ss) if ss else np.empty(0, np.int64)
    d = np.concatenate(ds) if ds else np.empty(0, np.int64)
    sd = (off_r + np.searchsorted(vids_r, s)).astype(dtype)
    rr = np.searchsorted(splitters, d, side="right")
    order = np.argsort(rr, kind="stable")
    sd, d, rr = sd[order], d[order], rr[order]
    bounds = np.searchsorted(rr, np.arange(P + 1))
    out = tuple((sd[bounds[p] : bounds[p + 1]], d[bounds[p] : bounds[p + 1]]) for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _renumber_dst_route_hash(vids_r: np.ndarray, off_r: int, P: int,
                             dtype, symmetrize: bool, *pieces):
    """dst -> dense, then route (src_dense, dst_dense) by hash(src_dense)
    into the normal CSR-build exchange. Symmetrization (both directions)
    happens HERE — after renumbering — so earlier exchanges carry half."""
    ss = [po[0] for po in pieces]
    ds = [po[1] for po in pieces]
    sd = np.concatenate(ss) if ss else np.empty(0, dtype)
    d = np.concatenate(ds) if ds else np.empty(0, np.int64)
    dd = (off_r + np.searchsorted(vids_r, d)).astype(dtype)
    if symmetrize:
        sd, dd = np.concatenate([sd, dd]), np.concatenate([dd, sd])
    parts = part_of(sd.astype(np.int64), P)
    order = np.argsort(parts, kind="stable")
    sd, dd, parts = sd[order], dd[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((sd[bounds[p] : bounds[p + 1]], dd[bounds[p] : bounds[p + 1]]) for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _dense_vids_route(vids_r: np.ndarray, off_r: int, P: int, dtype):
    """This range's dense ids, routed by hash(dense) to the BSP shards."""
    dense = (off_r + np.arange(len(vids_r))).astype(dtype)
    parts = part_of(dense.astype(np.int64), P)
    order = np.argsort(parts, kind="stable")
    dense, parts = dense[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(dense[bounds[p] : bounds[p + 1]] for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _merge_sorted_pieces(*pieces):
    arrs = [np.asarray(p) for p in pieces]
    if not arrs:
        return np.empty(0, np.int32)
    return np.sort(np.concatenate(arrs))


# --------------------------------------------------------- bundle build

def build_dense_graph_shards(edges_ds, P: int, *, vertices_ds=None,
                             symmetrize: bool = True) -> dict:
    """Like state.shards.build_graph_shards, but in the dense int32 domain.

    Returns the standard bundle plus ``dense`` metadata:
    {"offsets": np.ndarray[P+1], "range_vids": [P refs], "dtype": np.dtype}.
    """
    # 1-3: global order-preserving rank structure
    hash_vids = shard_vertices(edges_ds, P, vertices_ds=vertices_ds)
    samples = [_sample_sorted.remote(v, _SAMPLES_PER_SHARD) for v in hash_vids]
    splitters = _pick_splitters(samples, P)
    R = len(splitters) + 1  # actual range count (may be < P on tiny inputs)
    rsplit = _range_split_vids.options(num_returns=R)
    vid_pieces = [rsplit.remote(v, splitters, R) for v in hash_vids]
    if R == 1:
        vid_pieces = [[m] for m in vid_pieces]
    range_vids = [_range_merge.remote(*[row[r] for row in vid_pieces]) for r in range(R)]
    counts = ray.get([_len_of.remote(v) for v in range_vids])
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    n_total = int(offsets[-1])
    dtype = np.int32 if n_total < (1 << 31) else np.int64

    # 5: edges -> dense, fused into the hash(src_dense) CSR exchange
    block_refs = edges_ds.to_arrow_refs()
    esplit = _split_edges_by_range.options(num_returns=R)
    m1 = [esplit.remote(b, "src", "dst", splitters, R) for b in block_refs]
    if R == 1:
        m1 = [[m] for m in m1]
    step2 = _renumber_src_route_dst.options(num_returns=R)
    m2 = [
        step2.remote(range_vids[r], int(offsets[r]), splitters, R, dtype,
                     *[row[r] for row in m1])
        for r in range(R)
    ]
    if R == 1:
        m2 = [[m] for m in m2]
    step3 = _renumber_dst_route_hash.options(num_returns=P)
    m3 = [
        step3.remote(range_vids[r], int(offsets[r]), P, dtype, symmetrize,
                     *[row[r] for row in m2])
        for r in range(R)
    ]
    if P == 1:
        m3 = [[m] for m in m3]
    csr = [_build_csr.remote(False, False, False, *[row[p] for row in m3]) for p in range(P)]

    # 6: dense vid shards by hash(dense)
    vroute = _dense_vids_route.options(num_returns=P)
    mv = [vroute.remote(range_vids[r], int(offsets[r]), P, dtype) for r in range(R)]
    if P == 1:
        mv = [[m] for m in mv]
    vids = [_merge_sorted_pieces.remote(*[row[p] for row in mv]) for p in range(P)]

    plans = scatter_plans(csr, vids, P)
    cplans = combine_plans(vids, plans, P)
    return {
        "csr": csr,
        "vids": vids,
        "plans": plans,
        "cplans": cplans,
        "P": P,
        "symmetrize": symmetrize,
        "dense": {"offsets": offsets, "range_vids": range_vids, "dtype": dtype,
                  "splitters": splitters},
    }


# --------------------------------------------------------- translate back

@ray.remote
def _xlate_request(offsets: np.ndarray, R: int, *id_arrays):
    """Unique dense ids of this shard, routed by owning range."""
    u = np.unique(np.concatenate([np.asarray(a) for a in id_arrays]))
    r = np.searchsorted(offsets[1:], u.astype(np.int64), side="right")
    order = np.argsort(r, kind="stable")
    u, r = u[order], r[order]
    bounds = np.searchsorted(r, np.arange(R + 1))
    # grouped-style: ALWAYS a tuple (one plasma object; consumers slice)
    return tuple(u[bounds[i] : bounds[i + 1]] for i in range(R))


@ray.remote
def _xlate_resolve(r: int, vids_r: np.ndarray, off_r: int, *req_objs):
    """Answer (dense_query, original_vid) for every requesting shard."""
    return [
        (q, vids_r[np.asarray(q, dtype=np.int64) - off_r]) for q in (ro[r] for ro in req_objs)
    ]


@ray.remote
def _xlate_table(p: int, vids_dense, values, value_is_dense: bool, value_col: str, *resp_objs):
    """Final per-shard Arrow table in the ORIGINAL vid domain."""
    pieces = [ro[p] for ro in resp_objs]
    q = np.concatenate([pc[0] for pc in pieces]) if pieces else np.empty(0, np.int64)
    orig = np.concatenate([pc[1] for pc in pieces]) if pieces else np.empty(0, np.int64)
    order = np.argsort(q, kind="stable")
    q, orig = q[order], orig[order]
    v_orig = orig[np.searchsorted(q, vids_dense)]
    if value_is_dense:
        vals = orig[np.searchsorted(q, values)]
    else:
        vals = values
    return pa.table({"vid": pa.array(v_orig, pa.int64()), value_col: pa.array(vals)})


def translate_shard_tables(dense_meta: dict, vid_refs: list, value_refs: list,
                           *, value_is_dense: bool, value_col: str) -> list:
    """One resolve wave: per-shard (vid, value) tables in the original domain.

    ``value_is_dense``: True for CC labels (dense ids that must map back),
    False for PageRank scores (pass-through floats).
    """
    offsets = dense_meta["offsets"]
    range_vids = dense_meta["range_vids"]
    R = len(range_vids)
    P = len(vid_refs)
    if value_is_dense:
        reqs = [
            _xlate_request.remote(offsets, R, vid_refs[p], value_refs[p]) for p in range(P)
        ]
    else:
        reqs = [_xlate_request.remote(offsets, R, vid_refs[p]) for p in range(P)]
    resolved = [
        _xlate_resolve.remote(r, range_vids[r], int(offsets[r]), *reqs) for r in range(R)
    ]
    return [
        _xlate_table.remote(p, vid_refs[p], value_refs[p], value_is_dense, value_col, *resolved)
        for p in range(P)
    ]
