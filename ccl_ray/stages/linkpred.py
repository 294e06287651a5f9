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

Scale guard: centers with degree > ``max_center_degree`` are EXCLUDED
from the per-shard pass (hub pairs are the classic quadratic blowup) and
routed to the exact hub path instead: each hub's sorted neighbor list is
split into ranges of ≤ cap ids, and every (range_i, range_j) block of
its wedge cross-product is enumerated by a budget-bounded task
(``_hub_wedges``) emitting the same routed pair partials. Results are
therefore exact at ANY skew; the cap only bounds per-task memory
(≤ cap² wedges per block, ~4M per task). Total work stays O(Σ deg(c)²)
— that is the cost of the exact answer, paid as more tasks, never as a
bigger task. (Same salted-range trick as the star builders in
sources/transcripts.py.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import part_of, shard_edges_csr


def _pair_reduce(a, b, v, op):
    """Collapse duplicate (a, b) rows with ``op`` — one lexsort + reduceat."""
    order = np.lexsort((b, a))
    a, b, v = a[order], b[order], v[order]
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(new)[0]
    return a[starts], b[starts], op.reduceat(v, starts)


def _route_by_a(a, b, v, P):
    parts = part_of(a, P)
    order = np.argsort(parts, kind="stable")
    a, b, v, parts = a[order], b[order], v[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    return tuple(
        (a[bounds[p] : bounds[p + 1]], b[bounds[p] : bounds[p + 1]],
         v[bounds[p] : bounds[p + 1]])
        for p in range(P)
    )


@ray.remote
def _wedge_partials(csr, P, cap, aa=False):
    """Pieces routed by hash(a) for one shard's NON-HUB centers.

    ``aa=False``: wedge value 1 per pair → partial common-neighbor counts.
    ``aa=True``: wedge value 1/ln(deg(center)) → partial Adamic-Adar sums
    (centers with degree < 2 emit no wedges, so ln(deg) ≥ ln 2 > 0).
    Centers with degree > ``cap`` emit nothing here — their full wedge set
    comes from the budget-bounded hub tasks (``_hub_wedges``).
    """
    dst, indptr, outdeg = csr["dst"], csr["indptr"], csr["outdeg"]
    n_e = len(dst)
    vdt = np.float64 if aa else np.int64
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, vdt))
    if n_e == 0:
        out = tuple(empty for _ in range(P))
        return out[0] if P == 1 else out
    # per-edge count of partners AFTER it in its (non-hub) segment
    seg_end = np.repeat(indptr[1:], outdeg)
    counts = seg_end - np.arange(n_e) - 1
    counts[np.repeat(outdeg > cap, outdeg)] = 0
    total = int(counts.sum())
    if total == 0:
        out = tuple(empty for _ in range(P))
        return out[0] if P == 1 else out
    first = np.repeat(np.arange(n_e), counts)
    within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    a = dst[first]
    b = dst[first + 1 + within]
    if aa:
        # center degree per wedge: expand per-center 1/ln(deg) to edges, take
        # at the wedge's first-edge position (both edges share the center)
        w_center = np.zeros(len(outdeg), np.float64)
        ok = outdeg >= 2
        w_center[ok] = 1.0 / np.log(outdeg[ok])
        v = np.repeat(w_center, outdeg)[first]
        a2, b2, red = _pair_reduce(a, b, v, np.add)
    else:
        a2, b2, red = _pair_reduce(a, b, np.ones(len(a), np.int64), np.add)
    out = _route_by_a(a2, b2, red, P)
    return out[0] if P == 1 else out


@ray.remote
def _hub_info(csr, cap):
    """(row indices, degrees) of this shard's hub centers (deg > cap) —
    a tiny table the driver uses to pack hub wedge blocks into tasks."""
    hub = np.flatnonzero(csr["outdeg"] > cap)
    return hub.astype(np.int64), csr["outdeg"][hub].astype(np.int64)


@ray.remote
def _hub_wedges(csr, P, cap, aa, rows, iis, jjs):
    """Exact wedge partials for a budgeted batch of hub range-blocks.

    Each (row, i, j) names one block of the hub's wedge cross-product:
    range_i × range_j of its sorted neighbor list (ranges of ≤ cap ids;
    i == j is the triangular within-range block, i < j the full rectangle
    — a < b holds by construction because the list is sorted). The Python
    loop is over BLOCKS (≥ ~cap²/2 wedges each), with every block
    generated vectorized, so per-wedge cost matches the non-hub pass.
    Output shape is identical to ``_wedge_partials``.
    """
    dst, indptr, outdeg = csr["dst"], csr["indptr"], csr["outdeg"]
    A, B, V = [], [], []
    for r, i, j in zip(rows, iis, jjs):
        nb = dst[indptr[r] : indptr[r + 1]]
        ci = nb[i * cap : (i + 1) * cap]
        if i == j:
            ai, bi = np.triu_indices(len(ci), k=1)
            a, b = ci[ai], ci[bi]
        else:
            cj = nb[j * cap : (j + 1) * cap]
            a = np.repeat(ci, len(cj))
            b = np.tile(cj, len(ci))
        A.append(a)
        B.append(b)
        if aa:
            V.append(np.full(len(a), 1.0 / np.log(outdeg[r]), np.float64))
    vdt = np.float64 if aa else np.int64
    if not A:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, vdt))
        out = tuple(empty for _ in range(P))
        return out[0] if P == 1 else out
    a = np.concatenate(A)
    b = np.concatenate(B)
    v = np.concatenate(V) if aa else np.ones(len(a), np.int64)
    a2, b2, red = _pair_reduce(a, b, v, np.add)
    out = _route_by_a(a2, b2, red, P)
    return out[0] if P == 1 else out


def _hub_groups(rows: np.ndarray, degs: np.ndarray, cap: int, budget: int):
    """Pack one shard's hub wedge blocks into task groups of ≤ ~budget wedges.

    Yields (rows, iis, jjs) triples per group. Driver-side cost is
    O(#blocks) = O(Σ ceil(deg/cap)²) small ints — proportional to total
    wedge work / cap², never to the wedges themselves.
    """
    if not len(rows):
        return
    g_rows, g_ii, g_jj, g_w = [], [], [], []
    for r, d in zip(rows, degs):
        nc = int(-(-d // cap))
        sizes = np.full(nc, cap, np.int64)
        sizes[-1] = d - cap * (nc - 1)
        ii, jj = np.triu_indices(nc)
        w = np.where(ii == jj, sizes[ii] * (sizes[ii] - 1) // 2, sizes[ii] * sizes[jj])
        keep = w > 0
        g_rows.append(np.full(int(keep.sum()), r, np.int64))
        g_ii.append(ii[keep].astype(np.int64))
        g_jj.append(jj[keep].astype(np.int64))
        g_w.append(w[keep])
    rows_c = np.concatenate(g_rows)
    ii_c = np.concatenate(g_ii)
    jj_c = np.concatenate(g_jj)
    w_c = np.concatenate(g_w)
    # greedy pack by running wedge count; a group can overshoot by at most
    # one block (≤ cap² wedges), which the budget dwarfs
    gid = (np.cumsum(w_c) - w_c) // budget
    bounds = np.searchsorted(gid, np.arange(gid[-1] + 2) if len(gid) else [0])
    for g in range(len(bounds) - 1):
        lo, hi = bounds[g], bounds[g + 1]
        if lo < hi:
            yield rows_c[lo:hi], ii_c[lo:hi], jj_c[lo:hi]


_HUB_WEDGE_BUDGET = 1 << 22  # ~4M wedges per hub task


def _wedge_piece_objs(csr, P, cap, aa):
    """All routed wedge-partial refs for a sharded graph: one non-hub task
    per shard plus budget-bounded exact hub tasks (empty when no center
    exceeds ``cap``). Downstream merges are additive, so hub pieces simply
    append to the piece list."""
    piece_objs = [_wedge_partials.remote(c, P, cap, aa) for c in csr]
    hubinfo = ray.get([_hub_info.remote(c, cap) for c in csr])
    for shard_idx, (rows, degs) in enumerate(hubinfo):
        for rows_g, ii_g, jj_g in _hub_groups(rows, degs, cap, _HUB_WEDGE_BUDGET):
            piece_objs.append(
                _hub_wedges.remote(csr[shard_idx], P, cap, aa, rows_g, ii_g, jj_g)
            )
    return piece_objs


@ray.remote
def _finalize_topk(q, csr, k, P, col, round_to, *piece_objs):
    """Merge partial values for partition q, anti-join edges, local top-k.

    ``round_to``: round scores before ranking (None = exact ints). Rounding
    happens BEFORE the top-k lexsort so float-summation-order noise (~1e-15)
    cannot flip ties vs a SQL oracle that ranks rounded values.
    """
    vdt = pa.int64() if round_to is None else pa.float64()
    pieces = [po[q] for po in piece_objs] if P > 1 else list(piece_objs)
    a = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    if a.size == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         col: pa.array([], vdt)})
    b = np.concatenate([p[1] for p in pieces])
    c = np.concatenate([p[2] for p in pieces])
    a, b, cn = _pair_reduce(a, b, c, np.add)
    # adjacency test is partition-local: this shard's CSR holds every (a,*)
    # edge for hash(a) == q; Arrow multi-key anti join keeps non-edges only
    es = np.repeat(csr["srcs"], csr["outdeg"])
    cand = pa.table({"a": pa.array(a), "b": pa.array(b), col: pa.array(cn)})
    edges_t = pa.table({"a": pa.array(es), "b": pa.array(csr["dst"])})
    non_adj = cand.join(edges_t, keys=["a", "b"], join_type="left anti")
    a = non_adj.column("a").to_numpy(zero_copy_only=False)
    b = non_adj.column("b").to_numpy(zero_copy_only=False)
    cn = non_adj.column(col).to_numpy(zero_copy_only=False)
    if round_to is not None:
        cn = np.round(cn, round_to)
    if len(a) > k:
        top = np.lexsort((b, a, -cn))[:k]
        a, b, cn = a[top], b[top], cn[top]
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
                     col: pa.array(cn, vdt)})


def _pairs_topk(edges, k, cfg, max_center_degree, *, aa, col, round_to) -> pa.Table:
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    piece_objs = _wedge_piece_objs(csr, P, max_center_degree, aa)
    tops = ray.get([
        _finalize_topk.remote(q, csr[q], k, P, col, round_to, *piece_objs)
        for q in range(P)
    ])
    merged = pa.concat_tables(tops)
    a = merged.column("a").to_numpy(zero_copy_only=False)
    b = merged.column("b").to_numpy(zero_copy_only=False)
    cn = merged.column(col).to_numpy(zero_copy_only=False)
    top = np.lexsort((b, a, -cn))[:k]
    vdt = pa.int64() if round_to is None else pa.float64()
    return pa.table({"a": pa.array(a[top], pa.int64()),
                     "b": pa.array(b[top], pa.int64()),
                     col: pa.array(cn[top], vdt)})


@ray.remote
def _jaccard_stage2(q, csr, P, *piece_objs):
    """Partition q = hash(a): merge wedge partials, anti-join adjacency,
    attach deg(a) from the LOCAL CSR, route survivors by hash(b).

    deg(a) is the symmetrized/deduped/loop-free outdeg — the distinct-
    neighbor degree. a is always present in this shard's srcs (it reached
    us as some center's neighbor, so edge (a, center) lives here)."""
    pieces = [po[q] for po in piece_objs] if P > 1 else list(piece_objs)
    a = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    empty = (np.empty(0, np.int64),) * 4
    if a.size == 0:
        out = tuple(empty for _ in range(P))
        return out[0] if P == 1 else out
    b = np.concatenate([p[1] for p in pieces])
    c = np.concatenate([p[2] for p in pieces])
    a, b, cn = _pair_reduce(a, b, c, np.add)
    es = np.repeat(csr["srcs"], csr["outdeg"])
    cand = pa.table({"a": pa.array(a), "b": pa.array(b), "c": pa.array(cn)})
    edges_t = pa.table({"a": pa.array(es), "b": pa.array(csr["dst"])})
    non_adj = cand.join(edges_t, keys=["a", "b"], join_type="left anti")
    a = non_adj.column("a").to_numpy(zero_copy_only=False)
    b = non_adj.column("b").to_numpy(zero_copy_only=False)
    cn = non_adj.column("c").to_numpy(zero_copy_only=False)
    deg_a = csr["outdeg"][np.searchsorted(csr["srcs"], a)]
    parts = part_of(b, P)
    order = np.argsort(parts, kind="stable")
    a, b, cn, deg_a, parts = a[order], b[order], cn[order], deg_a[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(
        (a[bounds[p] : bounds[p + 1]], b[bounds[p] : bounds[p + 1]],
         cn[bounds[p] : bounds[p + 1]], deg_a[bounds[p] : bounds[p + 1]])
        for p in range(P)
    )
    return out[0] if P == 1 else out


@ray.remote
def _jaccard_topk_at_b(r, csr, k, P, *stage2_objs):
    """Partition r = hash(b): attach deg(b) locally, score, local top-k.
    Each (a, b) pair arrives exactly once (reduced at its hash(a) owner)."""
    pieces = [so[r] for so in stage2_objs] if P > 1 else list(stage2_objs)
    a = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    if a.size == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    b = np.concatenate([p[1] for p in pieces])
    cn = np.concatenate([p[2] for p in pieces]).astype(np.float64)
    deg_a = np.concatenate([p[3] for p in pieces]).astype(np.float64)
    deg_b = csr["outdeg"][np.searchsorted(csr["srcs"], b)].astype(np.float64)
    jac = np.round(cn / (deg_a + deg_b - cn), 6)
    if len(a) > k:
        top = np.lexsort((b, a, -jac))[:k]
        a, b, jac = a[top], b[top], jac[top]
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
                     "jaccard": pa.array(jac, pa.float64())})


def jaccard_topk(
    edges,
    k: int = 50,
    *,
    cfg: EngineConfig | None = None,
    max_center_degree: int = 512,
) -> pa.Table:
    """Top-k non-adjacent pairs by neighborhood Jaccard
    |N(a)∩N(b)| / |N(a)∪N(b)|, ties (score DESC, a, b).

    Same wedge enumeration as common_neighbors_topk (exact at any skew via
    the hub path); the union size needs both endpoint degrees, each of
    which is partition-local in a DIFFERENT partition — so survivors take
    one extra routed exchange (hash(a) → hash(b)) instead of any degree-map
    broadcast. Scores round to 6 before ranking (same determinism contract
    as adamic_adar_topk)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    piece_objs = _wedge_piece_objs(csr, P, max_center_degree, False)
    stage2 = [_jaccard_stage2.remote(q, csr[q], P, *piece_objs) for q in range(P)]
    tops = ray.get([
        _jaccard_topk_at_b.remote(r, csr[r], k, P, *stage2) for r in range(P)
    ])
    merged = pa.concat_tables(tops)
    a = merged.column("a").to_numpy(zero_copy_only=False)
    b = merged.column("b").to_numpy(zero_copy_only=False)
    jac = merged.column("jaccard").to_numpy(zero_copy_only=False)
    top = np.lexsort((b, a, -jac))[:k]
    return pa.table({"a": pa.array(a[top], pa.int64()),
                     "b": pa.array(b[top], pa.int64()),
                     "jaccard": pa.array(jac[top], pa.float64())})


@ray.remote
def _twohop_route(q, csr, P, *piece_objs):
    """Partition q = hash(a): wedge pairs (2-hop) + this shard's own edges
    (1-hop), emitted as (x, partner) in BOTH orientations for the wedge
    pairs (the (b, a) view must reach hash(b)); locally deduped then routed
    by hash(x). The symmetric CSR already holds both edge orientations
    across partitions, so local edges emit only (src, dst)."""
    pieces = [po[q] for po in piece_objs] if P > 1 else list(piece_objs)
    a = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    b = np.concatenate([p[1] for p in pieces]) if pieces else np.empty(0, np.int64)
    es = np.repeat(csr["srcs"], csr["outdeg"])
    x = np.concatenate([a, b, es])
    y = np.concatenate([b, a, csr["dst"]])
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if x.size == 0:
        out = tuple(empty for _ in range(P))
        return out[0] if P == 1 else out
    x, y, _ = _pair_reduce(x, y, np.ones(len(x), np.int64), np.add)
    parts = part_of(x, P)
    o = np.argsort(parts, kind="stable")
    x, y, parts = x[o], y[o], parts[o]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((x[bounds[p] : bounds[p + 1]], y[bounds[p] : bounds[p + 1]])
                for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _twohop_count(r, vids, P, *routed_objs):
    """Partition r: distinct (x, partner) pairs -> per-x partner count;
    vertices with no pairs report 0 (vids defines the domain)."""
    pieces = [ro[r] for ro in routed_objs] if P > 1 else list(routed_objs)
    x = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    y = np.concatenate([p[1] for p in pieces]) if pieces else np.empty(0, np.int64)
    n = np.zeros(len(vids), np.int64)
    if x.size:
        x, y, _ = _pair_reduce(x, y, np.ones(len(x), np.int64), np.add)
        uniq, counts = np.unique(x, return_counts=True)
        n[np.searchsorted(vids, uniq)] = counts
    return pa.table({"vid": pa.array(vids), "n_within_2": pa.array(n)})


def two_hop_neighborhood(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_center_degree: int = 512,
):
    """(vid, n_within_2): distinct vertices within ≤2 hops, excluding self —
    the neighborhood-growth statistic (friend-of-friend reach).

    Reuses the wedge enumeration (2-hop pairs through each center; exact at
    any skew via the hub path) plus the 1-hop edges; distinct-partner
    counting happens at each vertex's hash owner after a pair-deduped
    exchange, so no vertex's 2-hop set is ever materialized outside its
    owner task."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    from ccl_ray.state.shards import shard_vertices

    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    piece_objs = _wedge_piece_objs(csr, P, max_center_degree, False)
    routed = [_twohop_route.remote(q, csr[q], P, *piece_objs) for q in range(P)]
    tables = [_twohop_count.remote(r, vid_refs[r], P, *routed) for r in range(P)]
    return rd.from_arrow_refs(tables)


def common_neighbors_topk(
    edges,
    k: int = 50,
    *,
    cfg: EngineConfig | None = None,
    max_center_degree: int = 512,
) -> pa.Table:
    """Top-k non-adjacent pairs by shared-neighbor count.

    Returns a small pa.Table (a, b, common_neighbors) sorted by
    (common_neighbors DESC, a, b), ≤ k rows. Exact at any degree skew:
    ``max_center_degree`` only sets the hub-path range size (per-task
    memory bound), never drops wedges."""
    return _pairs_topk(
        edges, k, cfg, max_center_degree,
        aa=False, col="common_neighbors", round_to=None,
    )


def adamic_adar_topk(
    edges,
    k: int = 50,
    *,
    cfg: EngineConfig | None = None,
    max_center_degree: int = 512,
) -> pa.Table:
    """Top-k non-adjacent pairs by Adamic-Adar index Σ_{c∈N(a)∩N(b)} 1/ln(deg c).

    Same wedge enumeration as common_neighbors_topk (exact at any skew) with
    the wedge valued at 1/ln(center degree); scores are rounded to 6
    decimals BEFORE ranking so the (score DESC, a, b) order is deterministic
    and matches a SQL oracle that ranks rounded sums (float-order noise is
    ~1e-15 per pair)."""
    return _pairs_topk(
        edges, k, cfg, max_center_degree,
        aa=True, col="aa_score", round_to=6,
    )


@ray.remote
def _square_partial(q, P, *piece_objs):
    """Partition q = hash(a): merge wedge partials into exact codegrees and
    return (Σ C(codeg, 2), #pairs with codeg ≥ 1) for this partition's
    pairs. ADJACENT pairs count too (a square's diagonal may be chorded),
    so no adjacency anti-join here — squares need every diagonal pair."""
    pieces = [po[q] for po in piece_objs] if P > 1 else list(piece_objs)
    a = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    if a.size == 0:
        return 0, 0
    b = np.concatenate([p[1] for p in pieces])
    c = np.concatenate([p[2] for p in pieces])
    _, _, cn = _pair_reduce(a, b, c, np.add)
    cn = cn.astype(np.int64)
    return int((cn * (cn - 1) // 2).sum()), int(len(cn))


def square_count(
    edges,
    *,
    cfg: EngineConfig | None = None,
    max_center_degree: int = 512,
) -> tuple[int, int]:
    """(n_squares, n_codeg_pairs): exact 4-cycle count plus the number of
    vertex pairs sharing ≥1 neighbor.

    Every 4-cycle u-x-v-y-u is counted once per diagonal pair ({u,v} and
    {x,y} each contribute C(codeg,2) choices of the opposite corners), so
    n_squares = Σ_{unordered pairs} C(codeg, 2) / 2 — the rectangle
    analogue of wedge-based triangle counting. Reuses the skew-exact wedge
    enumeration (hub centers take the budget-bounded range path), with
    per-pair codegrees reduced at hash(a) owners; only two ints leave each
    partition. All arithmetic is exact int64."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    piece_objs = _wedge_piece_objs(csr, P, max_center_degree, False)
    parts = ray.get([_square_partial.remote(q, P, *piece_objs) for q in range(P)])
    paired_sum = sum(p[0] for p in parts)
    assert paired_sum % 2 == 0, "square diagonals must pair up"
    return paired_sum // 2, sum(p[1] for p in parts)
