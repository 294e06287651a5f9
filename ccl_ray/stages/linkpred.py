"""Common-neighbors link prediction over the BSP CSR shards.

For every non-adjacent vertex pair (a, b) that shares at least one
neighbor, count the shared neighbors and return the global top-k pairs
(score DESC, then (a, b) ascending — fully deterministic ties).

Shape (the triangle counter's sibling — wedges are ENUMERATED per pair
instead of closed against an oriented edge):

1. wedge generation — per CSR shard (symmetrized, deduped, loop-free;
   every center's full neighbor list is co-located by hash(src)): all
   neighbor pairs (nb[i], nb[j]) i<j per center, generated with one
   repeat/cumsum index computation per shard — no Python loop over
   centers. Neighbor lists are sorted, so a < b by construction.
2. local partial count (lexsort + reduceat) → route by hash(a) % P.
3. per-partition finalize: merge partial counts, drop adjacent pairs with
   an Arrow multi-key LEFT ANTI join against the shard's own edge list
   (the CSR at hash(a) holds every (a, *) edge — the pair's edge test is
   partition-local by construction), then partition top-k.
4. driver merges P small top-k tables (≤ P·k rows).

Scale guard: centers with degree > ``max_center_degree`` emit no wedges
(hub pairs are the classic quadratic blowup; the cap bounds total wedges
by E·cap/2). The number of skipped centers is returned so callers whose
oracle assumes full enumeration can assert it is zero (the minhash
hot-bucket contract, dedup.py, is the precedent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import part_of, shard_edges_csr


@ray.remote
def _wedge_partials(csr, P, cap):
    """(pieces routed by hash(a), n_skipped_centers) for one shard."""
    dst, indptr, outdeg = csr["dst"], csr["indptr"], csr["outdeg"]
    n_e = len(dst)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if n_e == 0:
        out = tuple(empty for _ in range(P))
        return (out[0] if P == 1 else out), 0
    skipped = int((outdeg > cap).sum())
    # per-edge count of partners AFTER it in its (non-capped) segment
    seg_end = np.repeat(indptr[1:], outdeg)
    counts = seg_end - np.arange(n_e) - 1
    counts[np.repeat(outdeg > cap, outdeg)] = 0
    total = int(counts.sum())
    if total == 0:
        out = tuple(empty for _ in range(P))
        return (out[0] if P == 1 else out), skipped
    first = np.repeat(np.arange(n_e), counts)
    within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    a = dst[first]
    b = dst[first + 1 + within]
    # local partial count: one lexsort pass, then unique-pair reduceat
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.concatenate([starts, [len(a)]]))
    a, b = a[starts], b[starts]
    parts = part_of(a, P)
    order = np.argsort(parts, kind="stable")
    a, b, cnt, parts = a[order], b[order], cnt[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(
        (a[bounds[p] : bounds[p + 1]], b[bounds[p] : bounds[p + 1]],
         cnt[bounds[p] : bounds[p + 1]])
        for p in range(P)
    )
    return (out[0] if P == 1 else out), skipped


@ray.remote
def _finalize_topk(q, csr, k, P, *piece_objs):
    """Merge partial counts for partition q, anti-join edges, local top-k."""
    pieces = [po[q] for po in piece_objs] if P > 1 else list(piece_objs)
    a = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    if a.size == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "common_neighbors": pa.array([], pa.int64())})
    b = np.concatenate([p[1] for p in pieces])
    c = np.concatenate([p[2] for p in pieces])
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(new)[0]
    cn = np.add.reduceat(c, starts)
    a, b = a[starts], b[starts]
    # adjacency test is partition-local: this shard's CSR holds every (a,*)
    # edge for hash(a) == q; Arrow multi-key anti join keeps non-edges only
    es = np.repeat(csr["srcs"], csr["outdeg"])
    cand = pa.table({"a": pa.array(a), "b": pa.array(b), "common_neighbors": pa.array(cn)})
    edges_t = pa.table({"a": pa.array(es), "b": pa.array(csr["dst"])})
    non_adj = cand.join(edges_t, keys=["a", "b"], join_type="left anti")
    a = non_adj.column("a").to_numpy(zero_copy_only=False)
    b = non_adj.column("b").to_numpy(zero_copy_only=False)
    cn = non_adj.column("common_neighbors").to_numpy(zero_copy_only=False)
    if len(a) > k:
        top = np.lexsort((b, a, -cn))[:k]
        a, b, cn = a[top], b[top], cn[top]
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
                     "common_neighbors": pa.array(cn, pa.int64())})


def common_neighbors_topk(
    edges,
    k: int = 50,
    *,
    cfg: EngineConfig | None = None,
    max_center_degree: int = 512,
    require_complete: bool = False,
) -> pa.Table:
    """Top-k non-adjacent pairs by shared-neighbor count.

    Returns a small pa.Table (a, b, common_neighbors) sorted by
    (common_neighbors DESC, a, b), ≤ k rows. ``require_complete=True``
    raises if any center exceeded ``max_center_degree`` (wedges from that
    center would be missing — oracle-parity callers need the assert)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    parts = [_wedge_partials.options(num_returns=2).remote(c, P, max_center_degree)
             for c in csr]
    piece_objs = [p[0] for p in parts]
    skipped = sum(ray.get([p[1] for p in parts]))
    if require_complete and skipped:
        raise AssertionError(
            f"{skipped} centers exceeded max_center_degree={max_center_degree}; "
            "top-k would be incomplete vs a full-enumeration oracle"
        )
    tops = ray.get([
        _finalize_topk.remote(q, csr[q], k, P, *piece_objs) for q in range(P)
    ])
    merged = pa.concat_tables(tops)
    a = merged.column("a").to_numpy(zero_copy_only=False)
    b = merged.column("b").to_numpy(zero_copy_only=False)
    cn = merged.column("common_neighbors").to_numpy(zero_copy_only=False)
    top = np.lexsort((b, a, -cn))[:k]
    return pa.table({"a": pa.array(a[top], pa.int64()),
                     "b": pa.array(b[top], pa.int64()),
                     "common_neighbors": pa.array(cn[top], pa.int64())})
