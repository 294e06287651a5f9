"""Deterministic maximal matching (mutual-minimum edge priority rounds).

Edge priorities are a per-shard-injective mixing of the canonical endpoint
pair: prio(u,v) = a·K1 + b·K2 mod 2⁶⁴ with a=min, b=max and K1, K2 odd —
valid at ANY vid magnitude (transcript vids exceed 2³², so a packed
(a<<32)|b form would overflow; only nonnegativity is asserted). For edges
sharing the first endpoint, b ↦ b·K2 is a bijection, so two alive edges at
the same vertex can never tie (asserted per shard each round) and every
round is a pure function of the graph. Each round an alive edge (both
endpoints unmatched) matches iff its priority is the strict minimum among
the alive edges at BOTH endpoints; the globally minimum alive edge always
qualifies, so every round makes progress and the loop ends exactly when no
alive edge remains — a maximal matching (the classic parallel greedy, cf.
Blelloch-Fineman-Shun 2012), expected O(log E) rounds under hash-mixed
priorities. Determinism is what lets the SQL oracle unroll the identical
rounds (the MIS pattern, stages/mis.py).

Distributed shape per round (plan machinery from state/shards.py; the
symmetrized CSR holds BOTH directed copies of every undirected edge, so
per-vertex state never needs a remote mirror):
1. vmin wave: per shard, min edge priority over copies whose SOURCE is
   unmatched, routed by hash(dst) — the owner of v ends up with the min
   priority over v's ALIVE edges (a copy from a matched source never
   ships; the owner ignores vmin when v itself is matched);
2. claim wave: per shard, copies whose source is unmatched and whose
   priority equals vmin[source] ship (dst, prio, src); the owner of an
   unmatched v accepts the min-priority claim iff it equals vmin[v] —
   both owners of an edge reach the same verdict, and each vertex
   records its mate.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    part_of,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)

PRIO_K = np.uint64(0x9E3779B97F4A7C15)
_PMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_NO_MATE = np.int64(-1)


# second odd mixing constant (xxhash64 prime 2 — public domain); the
# canonical-pair priority is a·K1 + b·K2 mod 2⁶⁴, which works at ANY vid
# magnitude (a packed (a<<32)|b bijection would cap vids at 2³² — the
# transcript layout conv·2²² + turn exceeds that). For a fixed canonical
# first endpoint the map b ↦ b·K2 is a bijection, so two edges sharing
# their canonical MIN endpoint can never tie; the remaining (rare) tie
# shapes are caught by a complete per-shard assert — every edge incident
# to a vertex lives in that vertex's shard as a src=v row, and a tie only
# matters between edges sharing a vertex (it would deadlock the
# mutual-minimum rule).
PRIO_K2 = np.uint64(0xC2B2AE3D27D4EB4F)

# weighted priorities pack the (quantized) weight rank into the top 3
# bits: prio = (levels−1−w) << 61 | mix >> 3 — heavier edges sort first,
# the 61-bit mix remainder breaks ties.
_W_LEVELS = 8
_W_SHIFT = np.uint64(61)


@ray.remote
def _edge_prio(vids, csr, plan, weighted):
    """Static per-edge priority for one shard: mix(canonical pair),
    optionally weight-ranked (greedy MAX-weight order) in the top bits."""
    if plan["n_edges"] == 0:
        return np.empty(0, np.uint64)
    src = vids[plan["edge_src_idx"].astype(np.int64)]
    dst = csr["dst"]
    assert (src >= 0).all() and (dst >= 0).all(), "matching requires nonnegative vids"
    a = np.minimum(src, dst).astype(np.uint64)
    b = np.maximum(src, dst).astype(np.uint64)
    prio = a * PRIO_K + b * PRIO_K2
    if weighted:
        w = csr["w"]
        wi = w.astype(np.int64)
        assert (wi == w).all() and (wi >= 0).all() and (wi < _W_LEVELS).all(), (
            f"weighted matching requires integer weights in [0, {_W_LEVELS})"
        )
        prio = ((np.uint64(_W_LEVELS - 1) - wi.astype(np.uint64)) << _W_SHIFT) | (
            prio >> np.uint64(3)
        )
    # complete tie check (see PRIO_K2 note): no two edges sharing a SOURCE
    # may collide
    sidx = plan["edge_src_idx"].astype(np.int64)
    order = np.lexsort((dst, prio, sidx))
    ss, pp, dd = sidx[order], prio[order], dst[order]
    dup = (ss[1:] == ss[:-1]) & (pp[1:] == pp[:-1]) & (dd[1:] != dd[:-1])
    assert not dup.any(), "matching priority collision"
    return prio


def _vmin_pieces(plan, prio_e, unmatched, P):
    """Per-dst min alive-edge priority (sources filtered), routed."""
    empty = (np.empty(0, np.int64), np.empty(0, np.uint64))
    if plan["n_edges"] == 0:
        return [empty] * P
    mask = unmatched[plan["edge_src_idx"]]
    if not mask.any():
        return [empty] * P
    u = plan["edge_uniq"][mask]
    vals = prio_e[mask]
    order = np.argsort(u, kind="stable")
    u, vals = u[order], vals[order]
    new = np.empty(len(u), bool)
    new[0] = True
    new[1:] = u[1:] != u[:-1]
    starts = np.nonzero(new)[0]
    u_r = u[starts]
    v_r = np.minimum.reduceat(vals, starts)
    parts = plan["uniq_part"][u_r]
    o2 = np.argsort(parts, kind="stable")
    u_r, v_r, parts = u_r[o2], v_r[o2], parts[o2]
    b = np.searchsorted(parts, np.arange(P + 1))
    ids = plan["uniq_dst"][u_r]
    return [(ids[b[p] : b[p + 1]], v_r[b[p] : b[p + 1]]) for p in range(P)]


@ray.remote
def _vmin_scatter(plan, prio_e, unmatched, P):
    return _vmin_pieces(plan, prio_e, unmatched, P)


@ray.remote
def _vmin_scatter_f(plan, prio_e, unmatched, P):
    out = _vmin_pieces(plan, prio_e, unmatched, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=2)
def _vmin_combine(q, grouped, vids, *msg_objs):
    """(vmin, seen) over this owner's vid domain."""
    acc = np.full(len(vids), _PMAX, np.uint64)
    seen = np.zeros(len(vids), bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    for dst, vals in pieces:
        if len(dst):
            pos = np.searchsorted(vids, dst)
            np.minimum.at(acc, pos, vals)
            seen[pos] = True
    return acc, seen


def _claim_pieces(plan, csr, vids, prio_e, unmatched, vmin, seen, P):
    """(dst, prio, src) for copies whose priority wins at their source,
    min-reduced per dst (keeping the argmin source), routed."""
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.uint64),
        np.empty(0, np.int64),
    )
    if plan["n_edges"] == 0:
        return [empty] * P
    sidx = plan["edge_src_idx"]
    mask = unmatched[sidx] & seen[sidx] & (prio_e == vmin[sidx])
    if not mask.any():
        return [empty] * P
    u = plan["edge_uniq"][mask]
    vals = prio_e[mask]
    srcs = vids[sidx[mask].astype(np.int64)]
    order = np.lexsort((vals, u))
    u, vals, srcs = u[order], vals[order], srcs[order]
    new = np.empty(len(u), bool)
    new[0] = True
    new[1:] = u[1:] != u[:-1]
    starts = np.nonzero(new)[0]
    u, vals, srcs = u[starts], vals[starts], srcs[starts]
    parts = plan["uniq_part"][u]
    o2 = np.argsort(parts, kind="stable")
    u, vals, srcs, parts = u[o2], vals[o2], srcs[o2], parts[o2]
    b = np.searchsorted(parts, np.arange(P + 1))
    ids = plan["uniq_dst"][u]
    return [
        (ids[b[p] : b[p + 1]], vals[b[p] : b[p + 1]], srcs[b[p] : b[p + 1]])
        for p in range(P)
    ]


@ray.remote
def _claim_scatter(plan, csr, vids, prio_e, unmatched, vmin, seen, P):
    return _claim_pieces(plan, csr, vids, prio_e, unmatched, vmin, seen, P)


@ray.remote
def _claim_scatter_f(plan, csr, vids, prio_e, unmatched, vmin, seen, P):
    out = _claim_pieces(plan, csr, vids, prio_e, unmatched, vmin, seen, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=3)
def _claim_combine(q, grouped, vids, unmatched, mate, vmin, seen, *msg_objs):
    """(new unmatched, new mate, n new matches): accept the min claim iff
    it equals this owner's alive-edge minimum."""
    if len(vids) == 0:
        return unmatched, mate, 0
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    pieces = [p for p in pieces if len(p[0])]
    if not pieces:
        return unmatched, mate, 0
    ids = np.concatenate([p[0] for p in pieces])
    vals = np.concatenate([p[1] for p in pieces])
    srcs = np.concatenate([p[2] for p in pieces])
    idx = np.searchsorted(vids, ids)
    order = np.lexsort((vals, idx))
    idx, vals, srcs = idx[order], vals[order], srcs[order]
    new = np.empty(len(idx), bool)
    new[0] = True
    new[1:] = idx[1:] != idx[:-1]
    starts = np.nonzero(new)[0]
    pos, vals, srcs = idx[starts], vals[starts], srcs[starts]
    ok = unmatched[pos] & seen[pos] & (vals == vmin[pos])
    pos, srcs = pos[ok], srcs[ok]
    new_un = unmatched.copy()
    new_un[pos] = False
    new_mate = mate.copy()
    new_mate[pos] = srcs
    return new_un, new_mate, int(len(pos))


@ray.remote
def _match_table(vids, mate):
    """Each matched pair emitted ONCE, canonically (src < dst)."""
    import pyarrow as pa

    sel = (mate != _NO_MATE) & (vids < mate)
    return pa.table(
        {"src": pa.array(vids[sel]), "dst": pa.array(mate[sel])}
    )


def maximal_matching(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 64,
    weight_col: str | None = None,
):
    """((src, dst) matched-pair Dataset (canonical src < dst), rounds run)
    — deterministic maximal matching of the undirected simple graph of
    ``edges`` (deduped, loop-free). Raises past ``max_rounds`` (callers
    pairing this with an unrolled SQL twin pass the twin's depth).

    ``weight_col``: integer weights in [0, 8) — the greedy then prefers
    HEAVIER edges (descending weight, hash tie-break), the classic
    ½-approximation of maximum-weight matching; parallel edges keep the
    MIN weight (the CSR dedupe rule), so weights that are a pure function
    of the endpoints are unaffected."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True,
                          weight_col=weight_col)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)
    prio = [
        _edge_prio.remote(vid_refs[p], csr[p], plans[p], weight_col is not None)
        for p in range(P)
    ]

    @ray.remote(num_returns=2)
    def _init(vids):
        return np.ones(len(vids), bool), np.full(len(vids), _NO_MATE, np.int64)

    init = [_init.remote(vid_refs[p]) for p in range(P)]
    unmatched = [i[0] for i in init]
    mate = [i[1] for i in init]

    rounds = 0
    while True:
        rounds += 1
        if grouped:
            outs = [
                _vmin_scatter.remote(plans[p], prio[p], unmatched[p], P)
                for p in range(P)
            ]
            vm = [
                _vmin_combine.remote(q, True, vid_refs[q], *outs) for q in range(P)
            ]
        else:
            outs = [
                ([o] if P == 1 else list(o))
                for o in (
                    _vmin_scatter_f.options(num_returns=P).remote(
                        plans[p], prio[p], unmatched[p], P
                    )
                    for p in range(P)
                )
            ]
            vm = [
                _vmin_combine.remote(
                    q, False, vid_refs[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        vmin = [v[0] for v in vm]
        seen = [v[1] for v in vm]
        if grouped:
            claims = [
                _claim_scatter.remote(
                    plans[p], csr[p], vid_refs[p], prio[p], unmatched[p],
                    vmin[p], seen[p], P,
                )
                for p in range(P)
            ]
            res = [
                _claim_combine.remote(
                    q, True, vid_refs[q], unmatched[q], mate[q], vmin[q], seen[q],
                    *claims,
                )
                for q in range(P)
            ]
        else:
            claims = [
                ([o] if P == 1 else list(o))
                for o in (
                    _claim_scatter_f.options(num_returns=P).remote(
                        plans[p], csr[p], vid_refs[p], prio[p], unmatched[p],
                        vmin[p], seen[p], P,
                    )
                    for p in range(P)
                )
            ]
            res = [
                _claim_combine.remote(
                    q, False, vid_refs[q], unmatched[q], mate[q], vmin[q], seen[q],
                    *[claims[p][q] for p in range(P)],
                )
                for q in range(P)
            ]
        unmatched = [r[0] for r in res]
        mate = [r[1] for r in res]
        new_matches = int(sum(ray.get([r[2] for r in res])))
        if new_matches == 0:
            break
        if rounds >= max_rounds:
            raise AssertionError(f"matching exceeded max_rounds={max_rounds}")

    tables = [_match_table.remote(vid_refs[p], mate[p]) for p in range(P)]
    return rd.from_arrow_refs(tables), rounds
