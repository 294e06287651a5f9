"""Strongly connected components over DIRECTED hash-partitioned CSR shards.

The engine's connected components (cc_bsp) is weakly-connected — it
symmetrizes. Directed pipelines (link graphs, event-transition graphs)
need SCC. Algorithm: multi-root forward-backward COLORING (the Orzan
2004 / Hong et al. FB-Trim family — the standard distributed SCC scheme;
Tarjan's stack is inherently sequential), expressed on the same one-time
shard-plan machinery as cc_bsp, with every wave O(frontier edges):

  outer round:
    1. TRIM — iteratively settle active vertices with zero active
       in-degree or zero active out-degree (their SCC is trivially {v}).
       Degree bookkeeping is INCREMENTAL: vertices that settle send -1
       deltas along both edge directions, so a trim wave costs
       O(settled-frontier edges), never O(E).
    2. COLOR — min-vid propagation along FORWARD edges restricted to the
       active set, run to fixpoint on the sparse frontier exchange:
       c(v) = min over {active u that reach v} ∪ {v}.
    3. MARK — roots are active vertices with c(r) = r. A backward
       multi-source BFS from all roots at once, restricted to vertices
       of the SAME color, marks exactly the members of each root's SCC.
       (Lossless restriction: for u ∈ SCC(r), every vertex w on a path
       u→…→r satisfies r reaches w — via u — and w reaches r, so
       w ∈ SCC(r) and c(w) = r. Conversely c(w) = r means r reaches w,
       so a marked w — which reaches r — is in SCC(r).)
    4. SETTLE — marked vertices take label = color and leave the active
       set; the root r is the MIN VID of its SCC (r ∈ SCC(r) and every
       member's min-reacher ≤ its own vid), so labels are canonical
       min-vid-per-SCC, the same label algebra as CC. Settled vertices
       feed step 1's delta queue next round.

Progress: the minimum active vid is always its own min-reacher, so at
least its whole SCC settles every outer round; in practice every
min-reacher root's SCC settles per round and TRIM removes DAG-like
regions wholesale. Outer rounds are bounded by long chains in the
condensation — the same reach-bounded behavior as every BSP SCC scheme.

Messages: colors ride the generic sparse (dst, value) exchange with
np.minimum (reduce_routed_sparse); marks ship deduped (dst, color) PAIRS
(route_pairs_sparse — a reduction would lose one of two distinct colors
converging on a dst); degree deltas ride the sparse exchange with
np.add. Runs in the ORIGINAL int64 vid domain (labels are vids).

Reference parity: the reference (michaelleerilee/CCL) has no directed
connectivity; this is part of the link-graph extension suite.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    apply_combine_plan,
    apply_sparse_pieces,
    as_piece_list,
    combine_plans,
    reduce_routed,
    reduce_routed_sparse,
    route_pairs_sparse,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@dataclass
class SCCResult:
    labels: "object"        # ray.data.Dataset (vid:int64, label:int64 = min vid of SCC)
    outer_rounds: int
    waves: int
    metrics: list = field(default_factory=list)


# ----------------------------------------------------------------- tasks

@ray.remote
def _init_state(vids):
    n = len(vids)
    return {
        "vids": vids,
        "label": np.full(n, -1, np.int64),
        "active": np.ones(n, dtype=bool),
        "color": vids.copy(),
        "indeg": np.zeros(n, np.int64),
        "outdeg": np.zeros(n, np.int64),
        "marked": np.zeros(n, dtype=bool),
    }


@ray.remote
def _scatter(plan, state, kind, aux, P, fanout):
    """One shard's outgoing pieces for a wave.

    kind: "deg"   — dense per-edge ones, np.add (degree init; aux unused)
          "delta" — sparse ones from settled frontier aux, np.add
          "color" — sparse color from dirty mask aux, np.minimum
          "mark"  — deduped (dst, color) pairs from mark frontier aux
    """
    if kind == "deg":
        pieces = reduce_routed(plan, np.ones(plan["n_edges"], np.int64), np.add)
    elif kind == "delta":
        ones = np.ones(len(state["vids"]), np.int64)
        pieces = reduce_routed_sparse(plan, ones, aux, np.add, P)
    elif kind == "color":
        pieces = reduce_routed_sparse(plan, state["color"], aux, np.minimum, P)
    else:  # mark
        pieces = route_pairs_sparse(plan, state["color"], aux, P)
    if fanout:
        return pieces[0] if P == 1 else tuple(pieces)
    return pieces


@ray.remote(num_returns=3)
def _apply(q, grouped, state, kind, cplan, *msg_objs):
    """Apply one wave's incoming pieces to shard q → (state, n, mask).

    kind: "deg_in"/"deg_out" — dense count assignment (cplan required)
          "delta_in"/"delta_out" — sparse subtraction
          "color" — masked min combine; mask = changed (next dirty)
          "mark"  — color-equality predicate; mask = newly marked
    """
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    st = dict(state)
    vids = st["vids"]
    zero = np.zeros(len(vids), dtype=bool)
    if len(vids) == 0:
        return st, 0, zero
    if kind in ("deg_in", "deg_out"):
        which = "indeg" if kind == "deg_in" else "outdeg"
        pos, red = apply_combine_plan(cplan, pieces, np.add)
        deg = np.zeros(len(vids), np.int64)
        if pos.size:
            deg[pos] = red
        st[which] = deg
        return st, 0, zero
    if kind in ("delta_in", "delta_out"):
        which = "indeg" if kind == "delta_in" else "outdeg"
        deg = st[which].copy()
        for d, v in pieces:
            if len(d):
                np.subtract.at(deg, np.searchsorted(vids, d), v)
        st[which] = deg
        return st, 0, zero
    if kind == "color":
        cur = st["color"]
        new, mask = apply_sparse_pieces(vids, cur, pieces, np.minimum)
        changed = mask & st["active"]
        if changed.any():
            out = cur.copy()
            out[changed] = new[changed]
            st["color"] = out
        return st, int(changed.sum()), changed
    # mark
    color, active, marked = st["color"], st["active"], st["marked"]
    newf = zero.copy()
    for d, v in pieces:
        if len(d):
            idx = np.searchsorted(vids, d)
            ok = active[idx] & ~marked[idx] & (color[idx] == v)
            newf[idx[ok]] = True
    if newf.any():
        m = marked.copy()
        m[newf] = True
        st["marked"] = m
    return st, int(newf.sum()), newf


@ray.remote(num_returns=3)
def _settle_trim(state):
    """Settle active vertices with zero active in- or out-degree."""
    st = dict(state)
    elig = st["active"] & ((st["indeg"] <= 0) | (st["outdeg"] <= 0))
    n = int(elig.sum())
    if n:
        lab = st["label"].copy()
        act = st["active"].copy()
        lab[elig] = st["vids"][elig]
        act[elig] = False
        st["label"], st["active"] = lab, act
    return st, n, elig


@ray.remote(num_returns=3)
def _reset_round(state):
    """New outer round: color = vid, marks cleared; dirty = active."""
    st = dict(state)
    st["color"] = st["vids"].copy()
    st["marked"] = np.zeros(len(st["vids"]), dtype=bool)
    return st, int(st["active"].sum()), st["active"].copy()


@ray.remote(num_returns=3)
def _init_marks(state):
    """Mark the roots (active, color == vid) — the initial backward frontier."""
    st = dict(state)
    roots = st["active"] & (st["color"] == st["vids"])
    if roots.any():
        m = st["marked"].copy()
        m[roots] = True
        st["marked"] = m
    return st, int(roots.sum()), roots


@ray.remote(num_returns=3)
def _settle_marked(state):
    """Marked vertices take label = color (their SCC's min vid) and retire."""
    st = dict(state)
    m = st["marked"]
    n = int(m.sum())
    if n:
        lab = st["label"].copy()
        act = st["active"].copy()
        lab[m] = st["color"][m]
        act[m] = False
        st["label"], st["active"] = lab, act
    return st, n, m


@ray.remote
def _restore_state(vids, loaded):
    """Rebuild a shard's live state from a checkpointed column dict.

    color/marked are per-outer-round scratch (reset_round reinitializes
    them before use), so only label/active/degrees persist."""
    return {
        "vids": vids,
        "label": loaded["label"].astype(np.int64, copy=False),
        "active": loaded["active"].astype(bool, copy=False),
        "color": vids.copy(),
        "indeg": loaded["indeg"].astype(np.int64, copy=False),
        "outdeg": loaded["outdeg"].astype(np.int64, copy=False),
        "marked": np.zeros(len(vids), dtype=bool),
    }


@ray.remote
def _scc_table(state):
    import pyarrow as pa

    return pa.table(
        {"vid": pa.array(state["vids"]), "label": pa.array(state["label"])}
    )


# ----------------------------------------------------------------- waves

def _wave(plans, cplans, states, kind_s, kind_a, aux_refs, P, grouped):
    """One exchange: scatter `kind_s` along `plans`, apply `kind_a`.

    Returns (states, n_refs, mask_refs). aux_refs may be [None]*P.
    """
    aux = aux_refs if aux_refs is not None else [None] * P
    if grouped:
        outs = [
            _scatter.remote(plans[p], states[p], kind_s, aux[p], P, False)
            for p in range(P)
        ]
        res = [
            _apply.remote(q, True, states[q], kind_a,
                          cplans[q] if cplans else None, *outs)
            for q in range(P)
        ]
    else:
        outs = [
            as_piece_list(
                _scatter.options(num_returns=P).remote(
                    plans[p], states[p], kind_s, aux[p], P, True
                ),
                P,
            )
            for p in range(P)
        ]
        res = [
            _apply.remote(q, False, states[q], kind_a,
                          cplans[q] if cplans else None,
                          *[outs[p][q] for p in range(P)])
            for q in range(P)
        ]
    return [r[0] for r in res], [r[1] for r in res], [r[2] for r in res]


# ----------------------------------------------------------------- driver

def strongly_connected_components(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    max_outer: int = 512,
    max_inner: int = 100_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> SCCResult:
    """Exact SCC labels (min vid per SCC) of a DIRECTED edge Dataset.

    ``edges``: (src, dst) int64 — each row one directed edge src→dst
    (parallel duplicates deduped, self-loops dropped: neither changes SCC
    membership). ``vertices``: optional explicit vid Dataset (isolated
    vertices are their own SCCs). Runs in the original int64 vid domain.

    ``checkpoint_dir``: per-outer-round StateCheckpoint of the persistent
    shard state (label/active/indeg/outdeg — color and marks are per-round
    scratch), written at the post-TRIM consistency point with the usual
    atomic-manifest commit; a killed run resumes from the newest complete
    round after the resume validates partition count and vid fingerprint
    against the rebuilt shards. Deterministic waves → bitwise-identical
    labels on resume.
    """
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    vid_refs = shard_vertices(edges, P, vertices_ds=vertices,
                              src_col=src_col, dst_col=dst_col)
    fwd_csr = shard_edges_csr(edges, P, symmetrize=False, dedupe=True,
                              drop_self=True, src_col=src_col, dst_col=dst_col)
    bwd_csr = shard_edges_csr(edges, P, symmetrize=False, dedupe=True,
                              drop_self=True, src_col=dst_col, dst_col=src_col)
    fwd_plans = scatter_plans(fwd_csr, vid_refs, P)
    bwd_plans = scatter_plans(bwd_csr, vid_refs, P)
    fwd_cplans = combine_plans(vid_refs, fwd_plans, P)
    bwd_cplans = combine_plans(vid_refs, bwd_plans, P)

    ckpt = None
    resumed = None
    if checkpoint_dir is not None:
        from ccl_ray.state.checkpoint import StateCheckpoint, vid_fingerprint

        ckpt = StateCheckpoint(checkpoint_dir, ["label", "active", "indeg", "outdeg"])
        resumed = ckpt.latest(expected_parts=P, expected_vid_fp=vid_fingerprint(vid_refs))

    metrics: list[dict] = []
    pending = None  # settled-this-step frontier pending degree deltas
    if resumed is not None:
        outer, loaded_refs, extra = resumed
        states = [_restore_state.remote(vid_refs[p], loaded_refs[p]) for p in range(P)]
        waves = int(extra.get("waves", 0))
    else:
        states = [_init_state.remote(v) for v in vid_refs]
        waves = 0
        # dense degree init: fwd edges deliver to dsts (in-degree), bwd to
        # srcs (out-degree)
        states, _, _ = _wave(fwd_plans, fwd_cplans, states, "deg", "deg_in", None, P, grouped)
        states, _, _ = _wave(bwd_plans, bwd_cplans, states, "deg", "deg_out", None, P, grouped)
        waves += 2
        outer = 0

    while outer < max_outer:
        # ---- TRIM to fixpoint (incremental degree deltas)
        n_trim = 0
        for _ in range(max_inner):
            if pending is not None:
                states, _, _ = _wave(fwd_plans, None, states, "delta", "delta_in",
                                     pending, P, grouped)
                states, _, _ = _wave(bwd_plans, None, states, "delta", "delta_out",
                                     pending, P, grouped)
                waves += 2
            res = [_settle_trim.remote(s) for s in states]
            states = [r[0] for r in res]
            counts = ray.get([r[1] for r in res])
            settled = sum(counts)
            n_trim += settled
            if settled == 0:
                pending = None
                break
            pending = [r[2] for r in res]
        # ---- post-TRIM consistency point: persistent state is exactly
        # (label, active, indeg, outdeg); color/marks are not yet live
        if ckpt is not None and outer % checkpoint_every == 0:
            ckpt.save(outer, vid_refs, states, extra={"waves": waves, "trimmed": n_trim})
        # ---- any active left?
        res = [_reset_round.remote(s) for s in states]
        states = [r[0] for r in res]
        n_active = sum(ray.get([r[1] for r in res]))
        dirty = [r[2] for r in res]
        if n_active == 0:
            metrics.append({"outer": outer, "trimmed": n_trim, "active": 0})
            break
        # ---- COLOR fixpoint (min along fwd, sparse frontier)
        color_waves = 0
        for _ in range(max_inner):
            states, n_refs, dirty = _wave(fwd_plans, None, states, "color", "color",
                                          dirty, P, grouped)
            waves += 1
            color_waves += 1
            if sum(ray.get(n_refs)) == 0:
                break
        # ---- MARK fixpoint (backward, same-color, pair exchange)
        res = [_init_marks.remote(s) for s in states]
        states = [r[0] for r in res]
        frontier = [r[2] for r in res]
        ray.get([r[1] for r in res])
        mark_waves = 0
        for _ in range(max_inner):
            states, n_refs, frontier = _wave(bwd_plans, None, states, "mark", "mark",
                                             frontier, P, grouped)
            waves += 1
            mark_waves += 1
            if sum(ray.get(n_refs)) == 0:
                break
        # ---- SETTLE marked SCCs; their removal feeds next round's trim
        res = [_settle_marked.remote(s) for s in states]
        states = [r[0] for r in res]
        n_settled = sum(ray.get([r[1] for r in res]))
        pending = [r[2] for r in res]
        metrics.append({
            "outer": outer, "trimmed": n_trim, "active": n_active,
            "color_waves": color_waves, "mark_waves": mark_waves,
            "settled": n_settled,
        })
        assert n_settled > 0, "SCC coloring round settled nothing (bug)"
        outer += 1

    import ray.data as rd

    tables = ray.get([_scc_table.remote(s) for s in states])
    labels = rd.from_arrow(tables)
    return SCCResult(labels=labels, outer_rounds=outer, waves=waves, metrics=metrics)
