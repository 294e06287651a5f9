"""Exact 4-clique (K4) counting over the undirected simple graph.

Motif census one level above triangles: the degree-ordered orientation
trick extended one hop. Let ≺ be the (degree, vid) total order. Every K4
{a ≺ b ≺ c ≺ d} is counted exactly once as

    triangle (a, b, c) in orientation order  +  x = d ∈ outadj(c)
    with oriented edges a→x and b→x.

Waves (all P-sharded, oriented adjacency stays put where triangles built):
  1. The triangle machinery of stages/triangles.py (degree resolve →
     orient → wedges routed by hash(b), matched at the shard owning b's
     oriented edges) — but emitting the matched (a, b, c) LIST routed by
     hash(c) instead of a count.
  2. EXPAND at hash(c): x ranges over outadj(c) (out-degree is O(√E)
     under degree orientation, so expansion is bounded even at hubs);
     candidates (a, b, x) route by hash(b).
  3. CHECK b→x at hash(b) (vectorized pandas pair merge); survivors
     (a, x) route by hash(a).
  4. CHECK a→x at hash(a); the survivor count per shard is the answer
     piece — only P ints reach the driver.

Scale notes: candidate volume is Σ_triangles outdeg(c) ≤ (#triangles)·√E
worst case; each wave is an all-to-all of candidate tuples (int64
columns), never adjacency. Reference parity: the reference has no motif
ops — this extends SURVEY §2's triangle row (O4-adjacent analytics).
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import as_piece_list, part_of, shard_edges_csr, shard_vertices
from ccl_ray.stages.triangles import (
    _deg_request,
    _deg_resolve,
    _degrees,
    _orient_and_wedges,
)

_EMPTY3 = tuple(np.empty(0, np.int64) for _ in range(3))
_EMPTY2 = tuple(np.empty(0, np.int64) for _ in range(2))


def _route3(a, b, c, key, P):
    parts = part_of(key, P)
    o = np.argsort(parts, kind="stable")
    a, b, c, parts = a[o], b[o], c[o], parts[o]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    return tuple(
        (a[bounds[p]: bounds[p + 1]], b[bounds[p]: bounds[p + 1]],
         c[bounds[p]: bounds[p + 1]])
        for p in range(P)
    )


@ray.remote
def _tri_route(P, oriented, *wedge_pieces):
    """Matched triangles (a, b, c) of this shard, routed by hash(c)."""
    import pandas as pd

    lo, hi = oriented
    wl = np.concatenate([w[0] for w in wedge_pieces])
    wh = np.concatenate([w[1] for w in wedge_pieces])
    wa = np.concatenate([w[2] for w in wedge_pieces])
    if lo.size == 0 or wl.size == 0:
        out = tuple(_EMPTY3 for _ in range(P))
        return out[0] if P == 1 else out
    edges = pd.DataFrame({"b": lo, "c": hi, "_e": 1})
    m = pd.DataFrame({"b": wl, "c": wh, "a": wa}).merge(
        edges, on=["b", "c"], how="inner"
    )
    out = _route3(
        m["a"].to_numpy(np.int64), m["b"].to_numpy(np.int64),
        m["c"].to_numpy(np.int64), m["c"].to_numpy(np.int64), P,
    )
    return out[0] if P == 1 else out


@ray.remote
def _k4_expand(P, oriented, *tri_pieces):
    """x over outadj(c) for each incoming triangle; (a, b, x) by hash(b)."""
    lo, hi = oriented
    a = np.concatenate([t[0] for t in tri_pieces])
    b = np.concatenate([t[1] for t in tri_pieces])
    c = np.concatenate([t[2] for t in tri_pieces])
    if a.size == 0 or lo.size == 0:
        out = tuple(_EMPTY3 for _ in range(P))
        return out[0] if P == 1 else out
    o = np.argsort(lo, kind="stable")
    lo, hi = lo[o], hi[o]
    start = np.searchsorted(lo, c, side="left")
    end = np.searchsorted(lo, c, side="right")
    cnt = end - start
    total = int(cnt.sum())
    if total == 0:
        out = tuple(_EMPTY3 for _ in range(P))
        return out[0] if P == 1 else out
    # global gather: position r of candidate row i is start[i] + local rank
    rep_start = np.repeat(start, cnt)
    rep_cum = np.repeat(np.cumsum(cnt) - cnt, cnt)
    pos = rep_start + (np.arange(total) - rep_cum)
    xa = np.repeat(a, cnt)
    xb = np.repeat(b, cnt)
    xx = hi[pos]
    out = _route3(xa, xb, xx, xb, P)
    return out[0] if P == 1 else out


@ray.remote
def _k4_check_b(P, oriented, *cand_pieces):
    """Keep candidates whose (b, x) is an oriented edge; (a, x) by hash(a)."""
    import pandas as pd

    lo, hi = oriented
    a = np.concatenate([t[0] for t in cand_pieces])
    b = np.concatenate([t[1] for t in cand_pieces])
    x = np.concatenate([t[2] for t in cand_pieces])
    if a.size == 0 or lo.size == 0:
        out = tuple(_EMPTY2 for _ in range(P))
        return out[0] if P == 1 else out
    edges = pd.DataFrame({"b": lo, "x": hi})
    m = pd.DataFrame({"b": b, "x": x, "a": a}).merge(
        edges, on=["b", "x"], how="inner"
    )
    a, x = m["a"].to_numpy(np.int64), m["x"].to_numpy(np.int64)
    parts = part_of(a, P)
    o = np.argsort(parts, kind="stable")
    a, x, parts = a[o], x[o], parts[o]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(
        (a[bounds[p]: bounds[p + 1]], x[bounds[p]: bounds[p + 1]])
        for p in range(P)
    )
    return out[0] if P == 1 else out


@ray.remote
def _k4_count_a(oriented, *cand_pieces):
    """Survivors whose (a, x) is an oriented edge — this shard's K4 count."""
    import pandas as pd

    lo, hi = oriented
    a = np.concatenate([t[0] for t in cand_pieces])
    x = np.concatenate([t[1] for t in cand_pieces])
    if a.size == 0 or lo.size == 0:
        return 0
    edges = pd.DataFrame({"a": lo, "x": hi})
    return int(len(pd.DataFrame({"a": a, "x": x}).merge(edges, on=["a", "x"])))


def k4_count(edges, *, cfg: EngineConfig | None = None) -> int:
    """Exact number of 4-cliques in the simple graph underlying ``edges``."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [
        as_piece_list(_deg_request.options(num_returns=P).remote(csr[p], P), P)
        for p in range(P)
    ]
    resolved = [
        as_piece_list(
            _deg_resolve.options(num_returns=P).remote(
                vid_refs[p], deg[p], P, *[reqs[q][p] for q in range(P)]
            ),
            P,
        )
        for p in range(P)
    ]
    ow = [
        list(
            _orient_and_wedges.options(num_returns=P + 1).remote(
                csr[p], vid_refs[p], deg[p], P, *[resolved[q][p] for q in range(P)]
            )
        )
        for p in range(P)
    ]
    oriented = [ow[p][P] for p in range(P)]
    tris = [
        as_piece_list(
            _tri_route.options(num_returns=P).remote(
                P, oriented[q], *[ow[p][q] for p in range(P)]
            ),
            P,
        )
        for q in range(P)
    ]
    cands = [
        as_piece_list(
            _k4_expand.options(num_returns=P).remote(
                P, oriented[r], *[tris[q][r] for q in range(P)]
            ),
            P,
        )
        for r in range(P)
    ]
    checked = [
        as_piece_list(
            _k4_check_b.options(num_returns=P).remote(
                P, oriented[s], *[cands[r][s] for r in range(P)]
            ),
            P,
        )
        for s in range(P)
    ]
    counts = [
        _k4_count_a.remote(oriented[t], *[checked[s][t] for s in range(P)])
        for t in range(P)
    ]
    return int(sum(ray.get(counts)))
