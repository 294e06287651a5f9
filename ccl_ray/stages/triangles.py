"""Wedge-based triangle counting with degree orientation (north-star op).

No reference precedent (the reference computes only components/lifetimes);
this is the standard distributed algorithm: orient every undirected edge
from its lower-(degree, vid) endpoint to the higher one — bounding oriented
out-degree by O(sqrt(m)), the skew defense for hub vertices — generate
wedges (b, c) from each vertex's oriented neighbor list, and count wedges
whose closing edge exists.

Execution: the same shard machinery as cc_bsp. Waves:
  1. symmetric deduped CSR shards (hash(src)) → per-vertex degree
  2. degree request/resolve exchange (each shard learns deg(dst) for its
     edge targets, routed by hash(dst))
  3. per-shard orientation filter + vectorized wedge generation (one
     triu_indices gather per distinct-degree class — no per-pair loops)
  4. wedge → owner-of-lo exchange; per-shard pandas merge against the
     oriented edge set; sum of matches = triangle count

Wedges are never globally materialized — each wave streams shard-to-shard
through the object store.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import as_piece_list, part_of, shard_edges_csr, shard_vertices


_as_list = as_piece_list


@ray.remote
def _degrees(csr, vids):
    """Degree per vid of this shard (CSR is symmetric+deduped → outdeg=degree)."""
    deg = np.zeros(len(vids), dtype=np.int64)
    if csr["srcs"].size:
        deg[np.searchsorted(vids, csr["srcs"])] = csr["outdeg"]
    return deg


@ray.remote
def _deg_request(csr, P):
    """Unique dst vids this shard needs degrees for, routed by hash(dst)."""
    uniq = np.unique(csr["dst"])
    parts = part_of(uniq, P)
    order = np.argsort(parts, kind="stable")
    uniq, parts = uniq[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(uniq[bounds[p] : bounds[p + 1]] for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _deg_resolve(vids, deg, P, *requests):
    out = []
    for q in requests:
        out.append((q, deg[np.searchsorted(vids, q)]))
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _orient_and_wedges(csr, vids, deg, P, *resp_pieces):
    """Orient edges + generate wedges.

    Called with num_returns=P+1: P wedge pieces routed by hash(lo) — each
    downstream matcher fetches only its own piece — plus this shard's
    oriented edge set as the final return.
    """
    empty_pair = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    empty_wedge = (*empty_pair, np.empty(0, np.int64))
    if csr["srcs"].size == 0:
        return (*[empty_wedge] * P, empty_pair)

    # degree lookup for dst endpoints (from the resolve wave)
    q = np.concatenate([r[0] for r in resp_pieces])
    qd = np.concatenate([r[1] for r in resp_pieces])
    order = np.argsort(q, kind="stable")
    q, qd = q[order], qd[order]

    src = np.repeat(csr["srcs"], csr["outdeg"])
    dst = csr["dst"]
    deg_s = np.repeat(deg[np.searchsorted(vids, csr["srcs"])], csr["outdeg"])
    deg_d = qd[np.searchsorted(q, dst)]

    # orient lower (deg, vid) -> higher; each undirected edge appears twice in
    # the symmetric CSR, so exactly one direction survives
    keep = (deg_s < deg_d) | ((deg_s == deg_d) & (src < dst))
    lo, hi = src[keep], dst[keep]
    lo_deg, hi_deg = deg_s[keep], deg_d[keep]

    # group by lo (already sorted by src within CSR, keep preserves order)
    srcs_u, start = np.unique(lo, return_index=True)
    counts = np.diff(np.concatenate([start, [len(lo)]]))

    # vectorized wedge generation: one gather per distinct out-degree class
    wb_parts, wc_parts, wa_parts = [], [], []
    for k in np.unique(counts):
        if k < 2:
            continue
        sel = counts == k
        starts_k = start[sel]
        gather = starts_k[:, None] + np.arange(k)[None, :]
        nb = hi[gather]          # (g, k) neighbor vids
        nbd = hi_deg[gather]     # neighbor degrees
        apex = lo[starts_k]      # wedge apex vertex per group
        ii, jj = np.triu_indices(k, 1)
        b, c = nb[:, ii].ravel(), nb[:, jj].ravel()
        bd, cd = nbd[:, ii].ravel(), nbd[:, jj].ravel()
        swap = (cd < bd) | ((cd == bd) & (c < b))
        wb_parts.append(np.where(swap, c, b))
        wc_parts.append(np.where(swap, b, c))
        wa_parts.append(np.repeat(apex, len(ii)))
    if wb_parts:
        wlo = np.concatenate(wb_parts)
        whi = np.concatenate(wc_parts)
        wap = np.concatenate(wa_parts)
    else:
        wlo, whi = empty_pair
        wap = np.empty(0, np.int64)

    parts = part_of(wlo, P)
    o = np.argsort(parts, kind="stable")
    wlo, whi, wap, parts = wlo[o], whi[o], wap[o], parts[o]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    wedge_out = tuple(
        (
            wlo[bounds[p] : bounds[p + 1]],
            whi[bounds[p] : bounds[p + 1]],
            wap[bounds[p] : bounds[p + 1]],
        )
        for p in range(P)
    )
    return (*wedge_out, (lo, hi))


@ray.remote
def _count_matches(oriented, *wedge_pieces):
    """Triangles closed in this shard: wedges whose (lo,hi) is an oriented edge."""
    import pandas as pd

    lo, hi = oriented
    if lo.size == 0:
        return 0
    wl = np.concatenate([w[0] for w in wedge_pieces])
    wh = np.concatenate([w[1] for w in wedge_pieces])
    if wl.size == 0:
        return 0
    edges = pd.DataFrame({"lo": lo, "hi": hi})
    wedges = pd.DataFrame({"lo": wl, "hi": wh})
    return int(len(wedges.merge(edges, on=["lo", "hi"], how="inner")))


@ray.remote
def _match_per_vertex(P, oriented, *wedge_pieces):
    """Matched triangles -> per-vertex increments routed by hash(vid).

    Each matched wedge (lo,hi,apex) is one triangle: +1 to all three
    vertices. Returns P (vids, counts) pieces (num_returns=P)."""
    import pandas as pd

    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    lo, hi = oriented
    wl = np.concatenate([w[0] for w in wedge_pieces]) if wedge_pieces else np.empty(0, np.int64)
    if lo.size == 0 or wl.size == 0:
        return empty if P == 1 else tuple(empty for _ in range(P))
    wh = np.concatenate([w[1] for w in wedge_pieces])
    wa = np.concatenate([w[2] for w in wedge_pieces])
    edges = pd.DataFrame({"lo": lo, "hi": hi, "e": 1})
    wedges = pd.DataFrame({"lo": wl, "hi": wh, "a": wa})
    m = wedges.merge(edges, on=["lo", "hi"], how="inner")
    tri_v = np.concatenate([m["lo"].values, m["hi"].values, m["a"].values]).astype(np.int64)
    vids, cnts = np.unique(tri_v, return_counts=True)
    parts = part_of(vids, P)
    o = np.argsort(parts, kind="stable")
    vids, cnts, parts = vids[o], cnts[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((vids[b[p] : b[p + 1]], cnts[b[p] : b[p + 1]].astype(np.int64)) for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _match_per_edge(P, oriented, *wedge_pieces):
    """Matched triangles -> per-EDGE increments routed by hash(min endpoint).

    Each matched wedge (lo, hi, apex) is one triangle whose three edges
    (apex,lo), (apex,hi), (lo,hi) each gain +1 support. Pairs are
    canonicalized (min, max) — the oriented order is by (degree, vid), not
    vid. Returns P ((a, b, counts)) pieces (num_returns=P)."""
    import pandas as pd

    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    lo, hi = oriented
    wl = np.concatenate([w[0] for w in wedge_pieces]) if wedge_pieces else np.empty(0, np.int64)
    if lo.size == 0 or wl.size == 0:
        return empty if P == 1 else tuple(empty for _ in range(P))
    wh = np.concatenate([w[1] for w in wedge_pieces])
    wa = np.concatenate([w[2] for w in wedge_pieces])
    edges = pd.DataFrame({"lo": lo, "hi": hi})
    wedges = pd.DataFrame({"lo": wl, "hi": wh, "a": wa})
    m = wedges.merge(edges, on=["lo", "hi"], how="inner")
    if not len(m):
        return empty if P == 1 else tuple(empty for _ in range(P))
    ml, mh, ma = m["lo"].values, m["hi"].values, m["a"].values
    u = np.concatenate([np.minimum(ma, ml), np.minimum(ma, mh), np.minimum(ml, mh)])
    v = np.concatenate([np.maximum(ma, ml), np.maximum(ma, mh), np.maximum(ml, mh)])
    # local pre-reduce before routing
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    new = np.empty(len(u), bool)
    new[0] = True
    new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.add.reduceat(np.ones(len(u), np.int64), starts)
    u, v = u[starts], v[starts]
    parts = part_of(u, P)
    o = np.argsort(parts, kind="stable")
    u, v, cnt, parts = u[o], v[o], cnt[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((u[b[p] : b[p + 1]], v[b[p] : b[p + 1]], cnt[b[p] : b[p + 1]])
                for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _reduce_pair_counts(*pieces):
    import pyarrow as pa

    u = np.concatenate([p[0] for p in pieces])
    v = np.concatenate([p[1] for p in pieces])
    c = np.concatenate([p[2] for p in pieces])
    if u.size == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    order = np.lexsort((v, u))
    u, v, c = u[order], v[order], c[order]
    new = np.empty(len(u), bool)
    new[0] = True
    new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(new)[0]
    return pa.table({"src": pa.array(u[starts]), "dst": pa.array(v[starts]),
                     "support": pa.array(np.add.reduceat(c, starts))})


def edge_triangle_support(edges, *, cfg: EngineConfig | None = None):
    """(src, dst, support) per canonical undirected edge in ≥1 triangle —
    support = number of triangles through the edge (the k-truss invariant;
    a k-truss keeps edges with support ≥ k−2).

    Same four waves as triangle_count; matched wedges fan out +1 to each of
    their triangle's three canonical edges, routed by hash(min endpoint)
    and pair-reduced per partition — never a global edge materialization."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
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
    routed = [
        _as_list(
            _match_per_edge.options(num_returns=P).remote(
                P, ow[q][P], *[ow[p][q] for p in range(P)]
            ),
            P,
        )
        for q in range(P)
    ]
    tables = [_reduce_pair_counts.remote(*[routed[q][r] for q in range(P)]) for r in range(P)]
    return rd.from_arrow_refs(tables)


# ------------------------------------------------------- decremental k-truss
#
# Peel rounds after the first do NOT recompute supports over the surviving
# graph (the full oriented-wedge sweep, O(E·sqrt(E)/P) per round). Instead
# the engine keeps per-shard edge/adjacency state and, when a batch D of
# edges peels, enumerates ONLY the triangles containing a D-edge (common-
# neighbor expansion from each deleted edge's lower-degree endpoint, cost
# Σ_{(u,v)∈D} min(deg u, deg v)), dedupes them by canonical vertex triple,
# and decrements the surviving edges' supports. Invariant: after the round,
# support(e) = #triangles in the surviving graph containing e — identical
# to a full recompute, so peel sets and round counts match the old
# implementation (and its unrolled SQL twins) exactly.
#
# State layout (all hash-partitioned, pinned in plasma):
# - edge shards by hash(min endpoint): STATIC (u, v, du, dv, rank-packed
#   lookup keys) + MUTABLE (support int64, state uint8 ALIVE/DYING/DEAD).
#   Only the two mutable arrays are copied per round.
# - adjacency shards by hash(vertex): STATIC symmetric CSR (verts, indptr,
#   nbrs, keys) + MUTABLE slot_state uint8. alive ∪ dying slots = the
#   graph the current round's triangles must exist in; a slot dies one
#   round after its edge peels, exactly when decrements from it finish.
#
# Pair lookup: per-shard rank packing — key = rank(u)·|uniq_v| + rank(v)
# over the shard's own unique endpoint sets. Valid for any vid magnitude
# (no (u<<32)|v packing); requires per-shard rows < 2^31, which the
# partitioning guarantees at any realistic shard size.

_KT_ALIVE, _KT_DYING, _KT_DEAD = np.uint8(0), np.uint8(1), np.uint8(2)


def _rank_in(uniq: np.ndarray, q: np.ndarray):
    """(rank, present) of q in sorted unique array uniq."""
    r = np.searchsorted(uniq, q)
    ok = r < len(uniq)
    r = np.minimum(r, max(len(uniq) - 1, 0))
    ok &= uniq[r] == q if len(uniq) else False
    return r, ok


def _pair_pos(uniq_a, uniq_b, keys, qa, qb):
    """Positions of query pairs in the shard's lexsorted pair arrays
    (−1 where absent)."""
    if len(keys) == 0 or len(qa) == 0:
        return np.full(len(qa), -1, np.int64)
    ra, oka = _rank_in(uniq_a, qa)
    rb, okb = _rank_in(uniq_b, qb)
    qk = ra.astype(np.int64) * np.int64(len(uniq_b)) + rb
    pos = np.searchsorted(keys, qk)
    ok = oka & okb & (pos < len(keys))
    pos = np.minimum(pos, len(keys) - 1)
    ok &= keys[pos] == qk
    return np.where(ok, pos, np.int64(-1))


@ray.remote
def _kt_base(csr, vids, deg, P, *resp_pieces):
    """STATIC edge-state shard: canonical (u < v) pairs of this CSR shard
    (co-routed: hash(src)=hash(u)), original endpoint degrees, lookup keys."""
    empty = {
        "u": np.empty(0, np.int64), "v": np.empty(0, np.int64),
        "du": np.empty(0, np.int64), "dv": np.empty(0, np.int64),
        "uniq_u": np.empty(0, np.int64), "uniq_v": np.empty(0, np.int64),
        "keys": np.empty(0, np.int64),
    }
    if csr["srcs"].size == 0:
        return empty
    src = np.repeat(csr["srcs"], csr["outdeg"])
    dst = csr["dst"]
    deg_s = np.repeat(deg[np.searchsorted(vids, csr["srcs"])], csr["outdeg"])
    q = np.concatenate([r[0] for r in resp_pieces])
    qd = np.concatenate([r[1] for r in resp_pieces])
    order = np.argsort(q, kind="stable")
    q, qd = q[order], qd[order]
    deg_d = qd[np.searchsorted(q, dst)]
    m = src < dst  # canonical orientation; CSR is (s, d)-lexsorted
    u, v, du, dv = src[m], dst[m], deg_s[m], deg_d[m]
    if u.size == 0:
        return empty
    uniq_u = np.unique(u)
    uniq_v = np.unique(v)
    ru = np.searchsorted(uniq_u, u)
    rv = np.searchsorted(uniq_v, v)
    keys = ru.astype(np.int64) * np.int64(len(uniq_v)) + rv
    return {"u": u, "v": v, "du": du, "dv": dv,
            "uniq_u": uniq_u, "uniq_v": uniq_v, "keys": keys}


@ray.remote(num_returns=3)
def _kt_init(st, need, *match_pieces):
    """MUTABLE edge state: supports from the round-1 match pieces (0 for
    triangle-free edges), below-threshold edges marked DYING.
    → (mut dict, n_alive, n_dying)."""
    n = len(st["u"])
    support = np.zeros(n, np.int64)
    for mu, mv, mc in match_pieces:
        if len(mu):
            pos = _pair_pos(st["uniq_u"], st["uniq_v"], st["keys"], mu, mv)
            support[pos] += mc  # every matched pair is a real edge (pos ≥ 0)
    state = np.where(support < need, _KT_DYING, _KT_ALIVE).astype(np.uint8)
    n_dying = int((state == _KT_DYING).sum())
    return (
        {"support": support, "state": state},
        int(n - n_dying),
        n_dying,
    )


@ray.remote
def _kt_adj_static(csr):
    """STATIC adjacency shard: symmetric CSR + rank-packed slot keys."""
    if csr["srcs"].size == 0:
        return {"verts": np.empty(0, np.int64), "indptr": np.zeros(1, np.int64),
                "nbrs": np.empty(0, np.int64), "uniq_nbrs": np.empty(0, np.int64),
                "keys": np.empty(0, np.int64)}
    rows = np.repeat(np.arange(len(csr["srcs"]), dtype=np.int64), csr["outdeg"])
    uniq_nbrs = np.unique(csr["dst"])
    rd_ = np.searchsorted(uniq_nbrs, csr["dst"])
    keys = rows * np.int64(len(uniq_nbrs)) + rd_
    return {"verts": csr["srcs"], "indptr": csr["indptr"], "nbrs": csr["dst"],
            "uniq_nbrs": uniq_nbrs, "keys": keys}


@ray.remote
def _kt_adj_state0(csr):
    return np.zeros(int(csr["dst"].shape[0]), np.uint8)


@ray.remote
def _kt_route_dying(st, mut, P):
    """DYING edges → (apex, other) pairs routed by hash(apex); apex = the
    lower-ORIGINAL-degree endpoint (tie → min vid), bounding the common-
    neighbor expansion by min(deg u, deg v) per peeled edge."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    m = mut["state"] == _KT_DYING
    if not m.any():
        return [empty] * P
    u, v, du, dv = st["u"][m], st["v"][m], st["du"][m], st["dv"][m]
    pick_u = (du < dv) | (du == dv)  # tie → u (= min vid, u < v canonical)
    apex = np.where(pick_u, u, v)
    other = np.where(pick_u, v, u)
    parts = part_of(apex, P)
    o = np.argsort(parts, kind="stable")
    apex, other, parts = apex[o], other[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    return [(apex[b[p]:b[p + 1]], other[b[p]:b[p + 1]]) for p in range(P)]


@ray.remote
def _kt_candidates(me, adj, slot_state, P, *dying_objs):
    """Common-neighbor expansion: for each routed (apex, other), every
    non-dead neighbor w of apex yields candidate triangle {apex, other, w}
    with closing pair (min(other,w), max(other,w)); routed by hash(min).
    → P pieces (cu, cv, apex). Cost O(Σ deg(apex))."""
    empty = tuple(np.empty(0, np.int64) for _ in range(3))
    pair_pieces = [o[me] for o in dying_objs]
    apexs = [p[0] for p in pair_pieces if len(p[0])]
    if not apexs or adj["nbrs"].size == 0:
        return [empty] * P
    apex = np.concatenate(apexs)
    other = np.concatenate([p[1] for p in pair_pieces if len(p[0])])
    rows = np.searchsorted(adj["verts"], apex)
    indptr = adj["indptr"]
    starts = indptr[rows]
    counts = indptr[rows + 1] - starts
    ends = np.cumsum(counts)
    total = int(ends[-1]) if len(ends) else 0
    if total == 0:
        return [empty] * P
    sel = np.repeat(starts - (ends - counts), counts) + np.arange(total)
    w = adj["nbrs"][sel]
    ok = (slot_state[sel] != _KT_DEAD)
    oth = np.repeat(other, counts)
    apx = np.repeat(apex, counts)
    ok &= w != oth
    if not ok.any():
        return [empty] * P
    w, oth, apx = w[ok], oth[ok], apx[ok]
    cu = np.minimum(oth, w)
    cv = np.maximum(oth, w)
    parts = part_of(cu, P)
    o = np.argsort(parts, kind="stable")
    cu, cv, apx, parts = cu[o], cv[o], apx[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    return [(cu[b[p]:b[p + 1]], cv[b[p]:b[p + 1]], apx[b[p]:b[p + 1]])
            for p in range(P)]


@ray.remote(num_returns=2)
def _kt_match(me, st, mut, P, *cand_objs):
    """Candidates whose closing pair is a non-dead edge here → canonical
    vertex triples (t1<t2<t3) routed by hash(t1) for cross-shard dedupe.
    Also returns this shard's candidate count (work accounting)."""
    empty = tuple(np.empty(0, np.int64) for _ in range(3))
    cand_pieces = [o[me] for o in cand_objs]
    cus = [p[0] for p in cand_pieces if len(p[0])]
    if not cus:
        return [empty] * P, 0
    cu = np.concatenate(cus)
    cv = np.concatenate([p[1] for p in cand_pieces if len(p[0])])
    apx = np.concatenate([p[2] for p in cand_pieces if len(p[0])])
    n_cand = int(len(cu))
    pos = _pair_pos(st["uniq_u"], st["uniq_v"], st["keys"], cu, cv)
    ok = pos >= 0
    ok[ok] = mut["state"][pos[ok]] != _KT_DEAD
    if not ok.any():
        return [empty] * P, n_cand
    cu, cv, apx = cu[ok], cv[ok], apx[ok]
    # sorted triple of {apx, cu, cv} with cu < cv already
    t1 = np.minimum(apx, cu)
    t3 = np.maximum(apx, cv)
    t2 = np.where(apx < cu, cu, np.where(apx > cv, cv, apx))
    parts = part_of(t1, P)
    o = np.argsort(parts, kind="stable")
    t1, t2, t3, parts = t1[o], t2[o], t3[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    out = [(t1[b[p]:b[p + 1]], t2[b[p]:b[p + 1]], t3[b[p]:b[p + 1]])
           for p in range(P)]
    return out, n_cand


@ray.remote
def _kt_decrements(me, P, *tri_objs):
    """Dedupe triples (a triangle with ≥2 peeled edges is found once per
    peeled edge), then −1 per triple to each of its three canonical pairs,
    pre-reduced and routed by hash(min endpoint). → P (eu, ev, cnt)."""
    empty = tuple(np.empty(0, np.int64) for _ in range(3))
    tri_pieces = [o[me] for o in tri_objs]
    t1s = [p[0] for p in tri_pieces if len(p[0])]
    if not t1s:
        return [empty] * P
    t1 = np.concatenate(t1s)
    t2 = np.concatenate([p[1] for p in tri_pieces if len(p[0])])
    t3 = np.concatenate([p[2] for p in tri_pieces if len(p[0])])
    o = np.lexsort((t3, t2, t1))
    t1, t2, t3 = t1[o], t2[o], t3[o]
    first = np.empty(len(t1), bool)
    first[0] = True
    first[1:] = (t1[1:] != t1[:-1]) | (t2[1:] != t2[:-1]) | (t3[1:] != t3[:-1])
    t1, t2, t3 = t1[first], t2[first], t3[first]
    eu = np.concatenate([t1, t1, t2])
    ev = np.concatenate([t2, t3, t3])
    o = np.lexsort((ev, eu))
    eu, ev = eu[o], ev[o]
    new = np.empty(len(eu), bool)
    new[0] = True
    new[1:] = (eu[1:] != eu[:-1]) | (ev[1:] != ev[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.add.reduceat(np.ones(len(eu), np.int64), starts)
    eu, ev = eu[starts], ev[starts]
    parts = part_of(eu, P)
    o = np.argsort(parts, kind="stable")
    eu, ev, cnt, parts = eu[o], ev[o], cnt[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    return [(eu[b[p]:b[p + 1]], ev[b[p]:b[p + 1]], cnt[b[p]:b[p + 1]])
            for p in range(P)]


@ray.remote(num_returns=4)
def _kt_apply(me, st, mut, need, P, *dec_objs):
    """Apply decrements to ALIVE edges, retire DYING → DEAD, mark the new
    below-threshold ALIVE edges DYING. → (new mut, dead pairs routed by
    hash(endpoint) for adjacency slot-kill, n_alive, n_new_dying)."""
    support = mut["support"].copy()
    state = mut["state"].copy()
    for eu, ev, cnt in (o[me] for o in dec_objs):
        if len(eu):
            pos = _pair_pos(st["uniq_u"], st["uniq_v"], st["keys"], eu, ev)
            ok = pos >= 0
            ok[ok] = state[pos[ok]] == _KT_ALIVE
            np.subtract.at(support, pos[ok], cnt[ok])
    dead_now = state == _KT_DYING
    state[dead_now] = _KT_DEAD
    new_dying = (state == _KT_ALIVE) & (support < need)
    state[new_dying] = _KT_DYING
    du, dv = st["u"][dead_now], st["v"][dead_now]
    x = np.concatenate([du, dv])
    y = np.concatenate([dv, du])
    parts = part_of(x, P)
    o = np.argsort(parts, kind="stable")
    x, y, parts = x[o], y[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    dead_out = [(x[b[p]:b[p + 1]], y[b[p]:b[p + 1]]) for p in range(P)]
    return (
        {"support": support, "state": state},
        dead_out,
        int((state == _KT_ALIVE).sum()),
        int(new_dying.sum()),
    )


@ray.remote
def _kt_adj_kill(me, adj, slot_state, *dead_objs):
    """Mark adjacency slots of retired edges DEAD (both directions arrive
    here routed by their own source endpoint)."""
    dead_pieces = [o[me] for o in dead_objs]
    xs = [p[0] for p in dead_pieces if len(p[0])]
    if not xs:
        return slot_state
    x = np.concatenate(xs)
    y = np.concatenate([p[1] for p in dead_pieces if len(p[0])])
    rows = np.searchsorted(adj["verts"], x)
    ry, _oky = _rank_in(adj["uniq_nbrs"], y)
    qk = rows.astype(np.int64) * np.int64(len(adj["uniq_nbrs"])) + ry
    pos = np.searchsorted(adj["keys"], qk)  # every killed pair is a real slot
    new = slot_state.copy()
    new[pos] = _KT_DEAD
    return new


@ray.remote
def _kt_alive_table(st, mut):
    import pyarrow as pa

    m = mut["state"] == _KT_ALIVE
    return pa.table({"src": pa.array(st["u"][m]), "dst": pa.array(st["v"][m])})


def ktruss(edges, k: int = 3, *, cfg: EngineConfig | None = None,
           max_rounds: int | None = None, stats: dict | None = None):
    """k-truss of the undirected simple graph: the maximal subgraph whose
    every edge closes ≥ k−2 triangles WITHIN the subgraph. Returns
    (edges Dataset of canonical (src, dst), rounds).

    Round 1 computes exact supports with the full oriented-wedge sweep;
    every later peel round is DECREMENTAL (see the block comment above):
    only triangles containing a just-peeled edge are enumerated, so a deep
    peel costs O(Σ min-degree of peeled edges) per round instead of a full
    O(E·sqrt(E)/P) recompute. Peel sets and round counts are identical to
    the recompute formulation (same supports each round). ``max_rounds``
    raises beyond an oracle's unrolled cap. ``stats`` (optional dict) is
    filled with work counters: per-round candidate counts and alive sizes.
    """
    import pyarrow as pa

    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    need = k - 2
    assert need >= 1, "ktruss requires k >= 3"

    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
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
    routed = [
        _as_list(
            _match_per_edge.options(num_returns=P).remote(
                P, ow[q][P], *[ow[p][q] for p in range(P)]
            ),
            P,
        )
        for q in range(P)
    ]
    st = [
        _kt_base.remote(csr[p], vid_refs[p], deg[p], P,
                        *[resolved[q][p] for q in range(P)])
        for p in range(P)
    ]
    init = [
        _kt_init.remote(st[r], need, *[routed[q][r] for q in range(P)])
        for r in range(P)
    ]
    mut = [i[0] for i in init]
    adj = [_kt_adj_static.remote(csr[p]) for p in range(P)]
    slot = [_kt_adj_state0.remote(csr[p]) for p in range(P)]

    cand_per_round: list[int] = []
    alive_per_round: list[int] = []
    rounds = 1
    n = int(sum(ray.get([i[1] for i in init])))
    alive_per_round.append(n)
    prev_n: int | None = None
    while True:
        if prev_n is not None and n == prev_n:
            break
        if n == 0:
            break
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(f"ktruss did not stabilize within {max_rounds} rounds")
        prev_n = n
        # decremental round: triangles through the DYING set only.
        # Grouped exchange throughout (one object of P pieces per producer;
        # consumers read their piece zero-copy), like _contract/cc_bsp.
        dying = [_kt_route_dying.remote(st[p], mut[p], P) for p in range(P)]
        cands = [
            _kt_candidates.remote(p, adj[p], slot[p], P, *dying)
            for p in range(P)
        ]
        matched = [
            _kt_match.remote(p, st[p], mut[p], P, *cands) for p in range(P)
        ]
        tris = [m[0] for m in matched]
        cand_per_round.append(int(sum(ray.get([m[1] for m in matched]))))
        decs = [_kt_decrements.remote(p, P, *tris) for p in range(P)]
        applied = [
            _kt_apply.remote(p, st[p], mut[p], need, P, *decs)
            for p in range(P)
        ]
        mut = [a[0] for a in applied]
        dead = [a[1] for a in applied]
        slot = [
            _kt_adj_kill.remote(p, adj[p], slot[p], *dead) for p in range(P)
        ]
        rounds += 1
        n = int(sum(ray.get([a[2] for a in applied])))
        alive_per_round.append(n)

    if stats is not None:
        stats["rounds"] = rounds
        stats["candidates_per_round"] = cand_per_round
        stats["alive_per_round"] = alive_per_round

    if n == 0:
        cur = rd.from_arrow(
            pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        )
        return cur, rounds
    return rd.from_arrow_refs([_kt_alive_table.remote(st[p], mut[p]) for p in range(P)]), rounds


@ray.remote
def _reduce_counts(*pieces):
    import pyarrow as pa

    vids = np.concatenate([p[0] for p in pieces])
    cnts = np.concatenate([p[1] for p in pieces])
    if vids.size == 0:
        return pa.table({"vid": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())})
    order = np.argsort(vids, kind="stable")
    vids, cnts = vids[order], cnts[order]
    uniq, start = np.unique(vids, return_index=True)
    sums = np.add.reduceat(cnts, start)
    return pa.table({"vid": pa.array(uniq), "n_triangles": pa.array(sums)})


def triangle_count(edges, *, cfg: EngineConfig | None = None) -> int:
    """Exact triangle count of the undirected simple graph underlying ``edges``."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]

    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
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
    counts = [
        _count_matches.remote(ow[q][P], *[ow[p][q] for p in range(P)]) for q in range(P)
    ]
    return int(sum(ray.get(counts)))


def triangle_counts_per_vertex(edges, *, cfg: EngineConfig | None = None):
    """(vid, n_triangles) per vertex with >=1 triangle.

    Same waves as triangle_count, but matched wedges carry their apex so
    each triangle credits all three vertices; per-vertex increments are
    exchanged by hash(vid) and reduced per partition.
    """
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
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
    routed = [
        _as_list(
            _match_per_vertex.options(num_returns=P).remote(
                P, ow[q][P], *[ow[p][q] for p in range(P)]
            ),
            P,
        )
        for q in range(P)
    ]
    tables = [_reduce_counts.remote(*[routed[q][r] for q in range(P)]) for r in range(P)]
    import ray.data as rd

    return rd.from_arrow_refs(tables)


def clustering_coefficient(edges, *, vertices=None, cfg: EngineConfig | None = None):
    """(vid, degree, n_triangles, lcc) — local clustering coefficient.

    lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, else 0.0; T from
    triangle_counts_per_vertex (vertices in no triangle → 0), deg = distinct
    neighbors (aggregates.degrees). One hash-partitioned left join; lcc is
    rounded to 6 decimals (both factors are exact ints, so the rounding only
    normalizes the float division for oracle comparison).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ccl_ray.stages.aggregates import degrees
    from ccl_ray.stages.exchange import hash_join

    cfg = cfg or EngineConfig()
    deg = degrees(edges, vertices)
    tri = triangle_counts_per_vertex(edges, cfg=cfg).rename_columns({"vid": "tvid"})
    # right side is ALL-empty on triangle-free graphs (sf0.001 events), where
    # Ray 2.49 loses the schema — pass it statically; hash_join's _tagged
    # pass normalizes block types, so no to_arrow_blocks needed
    joined = hash_join(
        deg, tri,
        left_on="vid", right_on="tvid", how="left outer",
        num_partitions=cfg.num_partitions,
        right_schema=[("tvid", pa.int64()), ("n_triangles", pa.int64())],
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.fill_null(batch.column("n_triangles"), 0).to_numpy(zero_copy_only=False)
        denom = d.astype(np.float64) * (d - 1)
        lcc = np.where(d >= 2, 2.0 * t / np.where(denom == 0, 1.0, denom), 0.0)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "degree": pa.array(d),
                "n_triangles": pa.array(t.astype(np.int64)),
                "lcc": pa.array(np.round(lcc, 6)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
