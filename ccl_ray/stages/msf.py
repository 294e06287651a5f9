"""Minimum spanning forest via distributed Borůvka over the BSP shard engine.

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

Distributed shape per round (components at least halve → ≤ log₂V rounds):
1. RESOLVE — each shard fetches the current component label of its edge
   destinations. The request side is fully static (the scatter plan's
   routed unique-dst layout), so owners precompute the gather positions
   ONCE and each round ships values only;
2. SELECT — per shard, one lexsort + first-per-group pass finds each local
   component's min outgoing edge among inter-component edges; partials
   route by hash(component), owners merge to the global min per component
   (message volume ≤ one row per (component, shard) — pre-reduced);
3. CONTRACT — the selected edges form a tiny component-graph; the SAME
   propagate/jump waves that power the main CC engine (cc_bsp) run on a
   freshly built mini CSR until fixpoint, yielding min-label merges;
4. APPLY — vertex component labels resolve through the (old comp → new
   comp) map with the cc_bsp jump-wave machinery (identity off the map).

Labels stay min-vid canonical by induction (mini-CC takes mins of mins),
so the final labels equal connected_components_bsp's — asserted in tests.

Reference analog: none (the reference has no weighted-graph operators);
this extends its equivalence-merge loop (ccl_relabel semantics) with
per-class argmin selection. At transcript scale the per-round payload is
O(unique dst) resolve values + O(components) candidates — the O(E) work
stays inside shard-local vectorized kernels.
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


def _empty_cand():
    return tuple(np.empty(0, t) for t in _CAND_DTYPES)


@ray.remote
def _static_reqs(plan, P):
    """The per-owner slices of this shard's routed unique dsts (STATIC)."""
    b = plan["bounds"]
    return tuple(plan["uniq_dst_routed"][b[q] : b[q + 1]] for q in range(P))


@ray.remote
def _req_positions(q, vids, *req_objs):
    """Owner-side gather positions for every shard's static request."""
    return [np.searchsorted(vids, r[q]) for r in req_objs]


@ray.remote
def _resolve_vals(pos_list, comp):
    """comp values for each requesting shard, in shard order (grouped)."""
    return [comp[ix] for ix in pos_list]


def _first_per_group(keys: np.ndarray, order: np.ndarray):
    srt = keys[order]
    first = np.empty(len(srt), bool)
    first[0] = True
    first[1:] = srt[1:] != srt[:-1]
    return order[first]


@ray.remote
def _cand_scatter(p, plan, csr, comp, P, *val_objs):
    """Per-local-component min outgoing edge, routed by hash(component).

    Pieces: (comp, w, a, b, comp_other) with (a, b) the canonical
    undirected endpoints — the strict-total-order key is (w, a, b)."""
    if plan["n_edges"] == 0:
        return [_empty_cand()] * P
    val_pieces = [v[p] for v in val_objs]
    nat = np.empty(len(plan["uniq_dst"]), np.int64)
    nat[plan["uniq_perm"]] = (
        np.concatenate(val_pieces) if val_pieces else np.empty(0, np.int64)
    )
    comp_dst = nat[plan["edge_uniq"]]
    comp_src = comp[plan["edge_src_idx"]]
    m = comp_src != comp_dst
    if not m.any():
        return [_empty_cand()] * P
    w = csr["w"][m]
    u = np.repeat(csr["srcs"], csr["outdeg"])[m]
    v = csr["dst"][m]
    cs, cd = comp_src[m], comp_dst[m]
    a, b = np.minimum(u, v), np.maximum(u, v)
    keep = _first_per_group(cs, np.lexsort((b, a, w, cs)))
    cs, w, a, b, cd = cs[keep], w[keep], a[keep], b[keep], cd[keep]
    parts = part_of(cs, P)
    o = np.argsort(parts, kind="stable")
    cs, w, a, b, cd, parts = cs[o], w[o], a[o], b[o], cd[o], parts[o]
    bnd = np.searchsorted(parts, np.arange(P + 1))
    return [
        tuple(arr[bnd[q] : bnd[q + 1]] for arr in (cs, w, a, b, cd))
        for q in range(P)
    ]


@ray.remote(num_returns=2)
def _choose(q, *cand_objs):
    """Global min outgoing edge per owned component → (chosen, count)."""
    pieces = [c[q] for c in cand_objs]
    cs = np.concatenate([p[0] for p in pieces])
    if cs.size == 0:
        return _empty_cand(), 0
    w = np.concatenate([p[1] for p in pieces])
    a = np.concatenate([p[2] for p in pieces])
    b = np.concatenate([p[3] for p in pieces])
    cd = np.concatenate([p[4] for p in pieces])
    keep = _first_per_group(cs, np.lexsort((b, a, w, cs)))
    return (cs[keep], w[keep], a[keep], b[keep], cd[keep]), int(len(keep))


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
def _chosen_table(chosen):
    _cs, w, a, b, _cd = chosen
    return pa.table(
        {"a": pa.array(a), "b": pa.array(b), "w": pa.array(w, pa.float64())}
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
    plans = scatter_plans(csr, vid_refs, P)

    # static resolve layout: owners precompute gather positions once
    reqs = [_static_reqs.remote(plans[p], P) for p in range(P)]
    pos = [_req_positions.remote(q, vid_refs[q], *reqs) for q in range(P)]

    comp = [_init_labels.remote(v) for v in vid_refs]
    forest_tables: list = []
    rounds = 0
    while True:
        rounds += 1
        vals = [_resolve_vals.remote(pos[q], comp[q]) for q in range(P)]
        cands = [
            _cand_scatter.remote(p, plans[p], csr[p], comp[p], P, *vals)
            for p in range(P)
        ]
        res = [_choose.remote(q, *cands) for q in range(P)]
        chosen = [r[0] for r in res]
        n_chosen = int(sum(ray.get([r[1] for r in res])))
        if n_chosen == 0:
            break
        forest_tables.extend(_chosen_table.remote(c) for c in chosen)
        mini_vids, mini_labels = _contract(chosen, P)
        maparr = [
            _mk_map.remote(vid_refs[q], mini_vids[q], mini_labels[q])
            for q in range(P)
        ]
        creqs = [_jump_request_g.remote(comp[p], P) for p in range(P)]
        resolved = [
            _jump_resolve_g.remote(q, vid_refs[q], maparr[q], *creqs)
            for q in range(P)
        ]
        comp = [
            _jump_apply.remote(p, True, comp[p], None, *resolved)[0]
            for p in range(P)
        ]
        if rounds >= max_rounds:
            raise AssertionError(f"MSF exceeded max_rounds={max_rounds}")

    label_ds = rd.from_arrow_refs(
        [_label_table.remote(vid_refs[p], comp[p]) for p in range(P)]
    )
    if not forest_tables:
        forest = rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.float64())})
        )
        return forest, label_ds, rounds

    def dedupe_group(df):
        import pandas as pd  # noqa: F401

        out = df.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"])
        return pa.table(
            {
                "a": pa.array(out["a"].values.astype(np.int64)),
                "b": pa.array(out["b"].values.astype(np.int64)),
                "w": pa.array(out["w"].values.astype(np.float64)),
            }
        )

    # both-endpoint picks of the same edge dedupe here; groupby("a")
    # collocates every (a, b) duplicate pair (canonical a = min endpoint)
    forest = (
        rd.from_arrow_refs(forest_tables)
        .groupby("a")
        .map_groups(dedupe_group, batch_format="pandas")
    )
    return forest, label_ds, rounds
