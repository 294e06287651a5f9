"""Minimum spanning forest via distributed Borůvka with edge contraction.

Classic Borůvka: each round every component selects its minimum outgoing
edge under a STRICT TOTAL ORDER on edges — key (w, min(u,v), max(u,v)) —
then all selected edges join the forest and their endpoint components
merge. The strict total order makes the MSF unique (the standard
distinct-weights uniqueness proof applies to any strict order compatible
with the weights), so the output is exactly Kruskal's result under the
same order — the property the gate's numpy twin checks edge-for-edge.
Selected-edge cycles longer than 2 are impossible under a strict order
(the cycle's max-key edge would beat neither endpoint's minimum); the
2-cycles (both endpoints choose the same edge) dedupe at output assembly.

Distributed shape — the graph CONTRACTS between rounds, so round r runs on
the component multigraph left by round r-1 (components at least halve →
≤ log₂V rounds, and the edge set shrinks as intra-component and parallel
edges collapse; later rounds cost O(surviving edges), not O(E)):

1. SELECT — edges live as flat (s_comp, d_comp, w, a, b) arrays routed by
   hash(s_comp), with (a, b) the ORIGINAL canonical endpoints carried for
   forest output. Because routing keys on the source COMPONENT, every
   component's full outgoing edge list is local to one shard after each
   rebuild — selection is one lexsort + first-per-group pass with NO
   exchange at all (the static-plan resolve wave of the pre-contraction
   design is gone entirely);
2. CONTRACT — the selected edges form a tiny component-graph; the SAME
   propagate/jump waves that power the main CC engine (cc_bsp) run on a
   freshly built mini CSR until fixpoint, yielding min-label merges;
3. APPLY — per-vertex component labels resolve through the (old comp →
   new comp) map with the cc_bsp jump-wave machinery (identity off the
   contracted set);
4. REBUILD — edge endpoints relabel through the same map (source side is
   shard-local by routing; destination side via one request/resolve
   exchange over the round's unique d_comps), intra-component edges drop,
   parallel component edges dedupe to their min-(w, a, b) representative
   (selection only ever takes the min, so dedupe preserves the chosen
   set exactly), and survivors reroute by hash(new s_comp).

Labels stay min-vid canonical by induction (mini-CC takes mins of mins),
so the final labels equal connected_components_bsp's — asserted in tests.

Reference analog: none (the reference has no weighted-graph operators);
this extends its equivalence-merge loop (ccl_relabel semantics) with
per-class argmin selection. At transcript scale round 1 touches O(E) and
every later round touches only the surviving contracted multigraph — the
full 64M-row transcript completes without subsampling (BENCH/BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    _build_csr,
    as_piece_list,
    combine_plans,
    part_of,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)
from ccl_ray.stages.cc_bsp import (
    _init_labels,
    _jump_apply,
    _jump_request_g,
    _jump_resolve_g,
    jump_wave,
    propagate_wave,
)

_CAND_DTYPES = (np.int64, np.float64, np.int64, np.int64, np.int64)
_EDGE_DTYPES = (np.int64, np.int64, np.float64, np.int64, np.int64)


def _empty_cand():
    return tuple(np.empty(0, t) for t in _CAND_DTYPES)


def _empty_earr():
    return tuple(np.empty(0, t) for t in _EDGE_DTYPES)


def _first_per_group(keys: np.ndarray, order: np.ndarray):
    srt = keys[order]
    first = np.empty(len(srt), bool)
    first[0] = True
    first[1:] = srt[1:] != srt[:-1]
    return order[first]


@ray.remote
def _edge_arrays(csr):
    """CSR shard → flat contracted-edge arrays (s, d, w, a, b). Round 1's
    component ids ARE the vids, and (a, b) = canonical original endpoints."""
    if csr["srcs"].size == 0:
        return _empty_earr()
    s = np.repeat(csr["srcs"], csr["outdeg"])
    d = csr["dst"]
    w = csr["w"]
    return s, d, w, np.minimum(s, d), np.maximum(s, d)


@ray.remote(num_returns=2)
def _select_local(earr):
    """Per-component min outgoing edge — fully shard-local (all of a
    component's outgoing edges are co-routed by hash(s_comp)).
    Returns ((comp, w, a, b, comp_other), count)."""
    s, d, w, a, b = earr
    if s.size == 0:
        return _empty_cand(), 0
    keep = _first_per_group(s, np.lexsort((b, a, w, s)))
    return (s[keep], w[keep], a[keep], b[keep], d[keep]), int(len(keep))


@ray.remote
def _mini_split(chosen, P):
    """Selected edges → symmetric (src, dst) pieces routed by hash(src)."""
    cs, _w, _a, _b, cd = chosen
    s = np.concatenate([cs, cd])
    d = np.concatenate([cd, cs])
    parts = part_of(s, P)
    o = np.argsort(parts, kind="stable")
    s, d, parts = s[o], d[o], parts[o]
    bnd = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((s[bnd[q] : bnd[q + 1]], d[bnd[q] : bnd[q + 1]]) for q in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _mini_vids(*pieces):
    arrs = [p[0] for p in pieces if len(p[0])]
    return np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)


@ray.remote
def _mk_map(vids, mini_vids, mini_labels):
    """(old comp → new comp) over this owner's vid domain; identity off
    the contracted set."""
    arr = vids.copy()
    if mini_vids.size:
        arr[np.searchsorted(vids, mini_vids)] = mini_labels
    return arr


@ray.remote
def _dmap_request(earr, P):
    """Unique destination comps of this edge shard, routed by hash(comp)."""
    uniq = np.unique(earr[1])
    parts = part_of(uniq, P)
    order = np.argsort(parts, kind="stable")
    uniq, parts = uniq[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(uniq[bounds[q] : bounds[q + 1]] for q in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _dmap_resolve(vids, maparr, P, *requests):
    """Owner-side (req comps, new comps) answers, one per requesting shard."""
    out = [(r, maparr[np.searchsorted(vids, r)]) for r in requests]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _rebuild(earr, vids_p, map_p, P, *resp_pieces):
    """Relabel endpoints through the contraction map, drop intra-component
    edges, dedupe parallel component edges to min-(w, a, b), and reroute
    survivors by hash(new s_comp). Returns P edge-array pieces."""
    s, d, w, a, b = earr
    empty = _empty_earr() if P == 1 else tuple(_empty_earr() for _ in range(P))
    if s.size == 0:
        return empty
    s2 = map_p[np.searchsorted(vids_p, s)]
    rq = np.concatenate([r[0] for r in resp_pieces])
    rm = np.concatenate([r[1] for r in resp_pieces])
    order = np.argsort(rq, kind="stable")
    rq, rm = rq[order], rm[order]
    d2 = rm[np.searchsorted(rq, d)]
    keep = s2 != d2
    if not keep.any():
        return empty
    s2, d2, w, a, b = s2[keep], d2[keep], w[keep], a[keep], b[keep]
    # parallel component edges → min under the strict order (w, a, b)
    o = np.lexsort((b, a, w, d2, s2))
    s2, d2, w, a, b = s2[o], d2[o], w[o], a[o], b[o]
    first = np.empty(len(s2), bool)
    first[0] = True
    first[1:] = (s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1])
    s2, d2, w, a, b = s2[first], d2[first], w[first], a[first], b[first]
    parts = part_of(s2, P)
    o = np.argsort(parts, kind="stable")
    s2, d2, w, a, b, parts = s2[o], d2[o], w[o], a[o], b[o], parts[o]
    bnd = np.searchsorted(parts, np.arange(P + 1))
    out = [
        tuple(arr[bnd[q] : bnd[q + 1]] for arr in (s2, d2, w, a, b))
        for q in range(P)
    ]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _concat_earr(*pieces):
    if not pieces:
        return _empty_earr()
    return tuple(
        np.concatenate([p[i] for p in pieces]) for i in range(len(_EDGE_DTYPES))
    )


@ray.remote
def _earr_len(earr) -> int:
    return int(len(earr[0]))


@ray.remote
def _chosen_route(chosen, P):
    """Chosen forest edges routed by hash(a) for the output dedupe (both
    endpoint components may pick the same edge; hash(a) co-locates the
    duplicates). → P (a, b, w) pieces."""
    _cs, w, a, b, _cd = chosen
    parts = part_of(a, P)
    o = np.argsort(parts, kind="stable")
    a, b, w, parts = a[o], b[o], w[o], parts[o]
    bnd = np.searchsorted(parts, np.arange(P + 1))
    return [
        (a[bnd[q] : bnd[q + 1]], b[bnd[q] : bnd[q + 1]], w[bnd[q] : bnd[q + 1]])
        for q in range(P)
    ]


@ray.remote
def _forest_table(me, *route_objs):
    """Vectorized per-shard (a, b) dedupe + sort → one Arrow forest shard.
    Replaces a Dataset groupby("a").map_groups pass, which pays per-GROUP
    pandas overhead — at transcript scale the forest has ~15M groups of
    size 1-2 and the groupby dominated the whole MSF wall."""
    pieces = [o[me] for o in route_objs]
    arrs = [p for p in pieces if len(p[0])]
    if not arrs:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "w": pa.array([], pa.float64())}
        )
    a = np.concatenate([p[0] for p in arrs])
    b = np.concatenate([p[1] for p in arrs])
    w = np.concatenate([p[2] for p in arrs])
    o = np.lexsort((b, a))
    a, b, w = a[o], b[o], w[o]
    keep = np.empty(len(a), bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table(
        {"a": pa.array(a[keep]), "b": pa.array(b[keep]),
         "w": pa.array(w[keep], pa.float64())}
    )


@ray.remote
def _label_table(vids, comp):
    return pa.table({"vid": pa.array(vids), "label": pa.array(comp)})


def _contract(chosen_refs, P, max_waves=64):
    """Mini-CC (min-label fixpoint) over the selected component edges.
    Returns (mini_vids refs, mini_labels refs). Always grouped exchange:
    the component graph is tiny relative to the corpus."""
    split = _mini_split.options(num_returns=P) if P > 1 else _mini_split
    matrix = [as_piece_list(split.remote(c, P), P) for c in chosen_refs]
    csr = [
        _build_csr.remote(True, True, False, *[row[q] for row in matrix])
        for q in range(P)
    ]
    vids = [_mini_vids.remote(*[row[q] for row in matrix]) for q in range(P)]
    plans = scatter_plans(csr, vids, P)
    cplans = combine_plans(vids, plans, P)
    labels = [_init_labels.remote(v) for v in vids]
    for _ in range(max_waves):
        labels, changed, _m = propagate_wave(plans, cplans, labels, P, True)
        labels, jumped, _m = jump_wave(vids, labels, P, True)
        if int(sum(ray.get(changed + jumped))) == 0:
            return vids, labels
    raise AssertionError("MSF contraction exceeded max_waves")


def minimum_spanning_forest(
    edges,
    *,
    weight_col: str = "w",
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 64,
):
    """Borůvka MSF of the undirected graph of ``edges`` (parallel edges
    keep the min weight; self-loops drop). Returns (forest Dataset
    (a, b, w), labels Dataset (vid, label — min-vid component ids),
    rounds run)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(
        edges, P, symmetrize=True, dedupe=True, drop_self=True,
        weight_col=weight_col,
    )
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    earr = [_edge_arrays.remote(csr[p]) for p in range(P)]

    comp = [_init_labels.remote(v) for v in vid_refs]
    chosen_routed: list = []  # per round: grouped (a, b, w) route objects
    rounds = 0
    while True:
        rounds += 1
        res = [_select_local.remote(earr[p]) for p in range(P)]
        chosen = [r[0] for r in res]
        n_chosen = int(sum(ray.get([r[1] for r in res])))
        if n_chosen == 0:
            break
        chosen_routed.extend(_chosen_route.remote(c, P) for c in chosen)
        mini_vids, mini_labels = _contract(chosen, P)
        maparr = [
            _mk_map.remote(vid_refs[q], mini_vids[q], mini_labels[q])
            for q in range(P)
        ]
        # per-vertex labels resolve through the map (hash(label) routing)
        creqs = [_jump_request_g.remote(comp[p], P) for p in range(P)]
        resolved = [
            _jump_resolve_g.remote(q, vid_refs[q], maparr[q], *creqs)
            for q in range(P)
        ]
        comp = [
            _jump_apply.remote(p, True, comp[p], None, *resolved)[0]
            for p in range(P)
        ]
        # contract the edge multigraph for the next round
        dreqs = [
            as_piece_list(
                _dmap_request.options(num_returns=P).remote(earr[p], P), P
            )
            for p in range(P)
        ]
        dresp = [
            as_piece_list(
                _dmap_resolve.options(num_returns=P).remote(
                    vid_refs[q], maparr[q], P, *[dreqs[p][q] for p in range(P)]
                ),
                P,
            )
            for q in range(P)
        ]
        rebuilt = [
            as_piece_list(
                _rebuild.options(num_returns=P).remote(
                    earr[p], vid_refs[p], maparr[p], P,
                    *[dresp[q][p] for q in range(P)],
                ),
                P,
            )
            for p in range(P)
        ]
        earr = [
            _concat_earr.remote(*[rebuilt[p][q] for p in range(P)])
            for q in range(P)
        ]
        if rounds >= max_rounds:
            raise AssertionError(f"MSF exceeded max_rounds={max_rounds}")

    label_ds = rd.from_arrow_refs(
        [_label_table.remote(vid_refs[p], comp[p]) for p in range(P)]
    )
    if not chosen_routed:
        forest = rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.float64())})
        )
        return forest, label_ds, rounds

    # both-endpoint picks of the same edge dedupe per hash(a) shard
    forest = rd.from_arrow_refs(
        [_forest_table.remote(q, *chosen_routed) for q in range(P)]
    )
    return forest, label_ds, rounds
