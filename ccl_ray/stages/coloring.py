"""Deterministic greedy graph coloring (Jones-Plassmann rounds).

Priorities are the injective vid mixing prio(v) = (v · K) mod 2⁶⁴ (K odd,
no ties — the MIS constant). A vertex colors itself the round after its
last HIGHER-priority neighbor colored, taking the mex (smallest unused
color) of its already-colored neighbors; a lower-priority neighbor can
never be colored first (it waits on this vertex), so the result is exactly
the sequential greedy coloring in DESCENDING priority order — the
equivalence both the test oracle and the unrolled SQL twin rely on.
Expected O(log n / log log n)-ish rounds under hash-mixed priorities
(bounded by the longest decreasing-priority path). Colors used ≤
degeneracy + 1 is NOT guaranteed by this order (that needs a degeneracy
order), but the count is deterministic.

Distributed shape (plan machinery from state/shards.py):
- init wave: every vertex's priority ships along edges once; owners count
  higher-priority neighbors (hp_remaining).
- per round: the fire set (uncolored, hp_remaining == 0) takes the mex of
  its accumulated used-color set; the new colors ship (dst, src_prio,
  color) along the firing vertices' edges; receivers decrement
  hp_remaining for each higher-priority sender and merge the colors into
  their per-vertex used set (a sorted (pos, color) CSR per shard —
  merge + dedup is one lexsort over new pairs per round, sized by the
  FRONTIER's edges, not E).
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.stages.mis import PRIO_K
from ccl_ray.state.shards import (
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)

_UNCOLORED = np.int64(-1)


@ray.remote
def _init_prio(vids):
    assert (vids >= 0).all(), "coloring priorities require nonnegative vids"
    return vids.astype(np.uint64) * PRIO_K


def _route_triplets(plan, mask, prio_vals, color_vals, P):
    """Ship (dst, sender prio, sender color) for edges whose source is in
    ``mask`` — deduped per (dst, prio) (parallel copies collapse)."""
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.uint64),
        np.empty(0, np.int64),
    )
    if plan["n_edges"] == 0:
        return [empty] * P
    sidx = plan["edge_src_idx"]
    sel = mask[sidx]
    if not sel.any():
        return [empty] * P
    u = plan["edge_uniq"][sel]
    pr = prio_vals[sidx[sel]]
    co = color_vals[sidx[sel]]
    order = np.lexsort((pr, u))
    u, pr, co = u[order], pr[order], co[order]
    keep = np.empty(len(u), bool)
    keep[0] = True
    keep[1:] = (u[1:] != u[:-1]) | (pr[1:] != pr[:-1])
    u, pr, co = u[keep], pr[keep], co[keep]
    parts = plan["uniq_part"][u]
    o2 = np.argsort(parts, kind="stable")
    u, pr, co, parts = u[o2], pr[o2], co[o2], parts[o2]
    b = np.searchsorted(parts, np.arange(P + 1))
    ids = plan["uniq_dst"][u]
    return [
        (ids[b[p] : b[p + 1]], pr[b[p] : b[p + 1]], co[b[p] : b[p + 1]])
        for p in range(P)
    ]


@ray.remote
def _color_scatter(plan, mask, prio, colors, P):
    return _route_triplets(plan, mask, prio, colors, P)


@ray.remote
def _color_scatter_f(plan, mask, prio, colors, P):
    out = _route_triplets(plan, mask, prio, colors, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _init_hp(q, grouped, vids, prio, *msg_objs):
    """Count of higher-priority neighbors per vertex (init wave; the color
    payload is ignored here)."""
    hp = np.zeros(len(vids), np.int64)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    for ids, pr, _co in pieces:
        if len(ids):
            pos = np.searchsorted(vids, ids)
            np.add.at(hp, pos, (pr > prio[pos]).astype(np.int64))
    return hp


def _mex_per_segment(pos_sorted, col_sorted, starts):
    """mex of each segment of SORTED UNIQUE colors: the first rank where
    color != rank, else the segment length."""
    n = len(pos_sorted)
    seg_id = np.cumsum(np.isin(np.arange(n), starts))
    lens = np.diff(np.append(starts, n))
    rank = np.arange(n) - np.repeat(starts, lens)
    ok = col_sorted == rank
    # within each segment: mex = length of the maximal ok-prefix
    pref = np.cumsum(ok)
    base = np.repeat(pref[starts] - ok[starts], lens)
    runlen = pref - base
    # prefix is broken at first not-ok; mask ranks past the break
    good = runlen == rank + 1
    mex = np.zeros(len(starts), np.int64)
    if n:
        np.maximum.at(mex, seg_id - 1, np.where(good, rank + 1, 0))
    return mex


@ray.remote(num_returns=5)
def _color_round(q, grouped, vids, prio, colors, hp, used_pos, used_col, *msg_objs):
    """Apply last round's messages, then fire this round's ready vertices.

    Returns (colors, hp, used_pos, used_col, n fired). The used set is the
    per-shard sorted (vertex pos, color) pair store."""
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    pieces = [p for p in pieces if len(p[0])]
    if pieces:
        ids = np.concatenate([p[0] for p in pieces])
        pr = np.concatenate([p[1] for p in pieces])
        co = np.concatenate([p[2] for p in pieces])
        pos = np.searchsorted(vids, ids)
        hp = hp.copy()  # plasma arrays arrive read-only (zero-copy)
        np.subtract.at(hp, pos, (pr > prio[pos]).astype(np.int64))
        # merge new (pos, color) pairs into the sorted used store, dedup
        allp = np.concatenate([used_pos, pos])
        allc = np.concatenate([used_col, co])
        order = np.lexsort((allc, allp))
        allp, allc = allp[order], allc[order]
        keep = np.empty(len(allp), bool)
        if len(allp):
            keep[0] = True
            keep[1:] = (allp[1:] != allp[:-1]) | (allc[1:] != allc[:-1])
        used_pos, used_col = allp[keep], allc[keep]
    fire = (colors == _UNCOLORED) & (hp == 0)
    n_fire = int(fire.sum())
    if n_fire:
        new_colors = colors.copy()
        fire_pos = np.flatnonzero(fire)
        # mex over each firing vertex's used colors
        sel = fire[used_pos] if len(used_pos) else np.zeros(0, bool)
        up, uc = used_pos[sel], used_col[sel]
        if len(up):
            seg_new = np.empty(len(up), bool)
            seg_new[0] = True
            seg_new[1:] = up[1:] != up[:-1]
            starts = np.nonzero(seg_new)[0]
            seg_pos = up[starts]
            mex = _mex_per_segment(up, uc, starts)
            m = np.zeros(len(colors), np.int64)
            m[seg_pos] = mex
            new_colors[fire_pos] = m[fire_pos]
        else:
            new_colors[fire_pos] = 0
        colors = new_colors
    return colors, hp, used_pos, used_col, n_fire


@ray.remote
def _color_table(vids, colors):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "color": pa.array(colors)})


def greedy_coloring(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 128,
):
    """((vid, color) Dataset, rounds run) — the deterministic greedy
    coloring of the undirected simple graph of ``edges`` in descending
    injective-priority order (Jones-Plassmann schedule)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)

    prio = [_init_prio.remote(vid_refs[p]) for p in range(P)]

    @ray.remote(num_returns=4)
    def _init_state(vids):
        return (
            np.full(len(vids), _UNCOLORED, np.int64),
            np.zeros(len(vids), np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )

    init = [_init_state.remote(vid_refs[p]) for p in range(P)]
    colors = [i[0] for i in init]
    used_pos = [i[2] for i in init]
    used_col = [i[3] for i in init]

    def scatter(mask_refs):
        if grouped:
            outs = [
                _color_scatter.remote(plans[p], mask_refs[p], prio[p], colors[p], P)
                for p in range(P)
            ]
            return outs
        return [
            ([o] if P == 1 else list(o))
            for o in (
                _color_scatter_f.options(num_returns=P).remote(
                    plans[p], mask_refs[p], prio[p], colors[p], P
                )
                for p in range(P)
            )
        ]

    @ray.remote
    def _all_mask(vids):
        return np.ones(len(vids), bool)

    # init wave: every priority ships once; owners count higher-prio nbrs
    all_masks = [_all_mask.remote(vid_refs[p]) for p in range(P)]
    outs = scatter(all_masks)
    if grouped:
        hp = [
            _init_hp.remote(q, True, vid_refs[q], prio[q], *outs) for q in range(P)
        ]
    else:
        hp = [
            _init_hp.remote(
                q, False, vid_refs[q], prio[q], *[outs[p][q] for p in range(P)]
            )
            for q in range(P)
        ]

    @ray.remote
    def _fired_mask(old_colors, new_colors):
        return (old_colors == _UNCOLORED) & (new_colors != _UNCOLORED)

    rounds = 0
    # round 1 consumes no messages (empty pieces) — fire = hp==0 roots
    msgs: list | None = None
    while True:
        rounds += 1
        old_colors = colors
        if msgs is None:
            msg_args = [[] for _ in range(P)]
        elif grouped:
            msg_args = [msgs for _ in range(P)]
        else:
            msg_args = [[msgs[p][q] for p in range(P)] for q in range(P)]
        res = [
            _color_round.remote(
                q, grouped and msgs is not None, vid_refs[q], prio[q], colors[q],
                hp[q], used_pos[q], used_col[q], *msg_args[q],
            )
            for q in range(P)
        ]
        colors = [r[0] for r in res]
        hp = [r[1] for r in res]
        used_pos = [r[2] for r in res]
        used_col = [r[3] for r in res]
        n_fire = int(sum(ray.get([r[4] for r in res])))
        if n_fire == 0:
            done = all(
                ray.get(
                    [
                        _count_uncolored.remote(colors[p]) for p in range(P)
                    ]
                )
            )
            assert done, "coloring stalled with uncolored vertices"
            break
        if rounds >= max_rounds:
            raise AssertionError(f"coloring exceeded max_rounds={max_rounds}")
        fired = [_fired_mask.remote(old_colors[p], colors[p]) for p in range(P)]
        msgs = scatter(fired)

    tables = [_color_table.remote(vid_refs[p], colors[p]) for p in range(P)]
    return rd.from_arrow_refs(tables), rounds


@ray.remote
def _count_uncolored(colors) -> bool:
    return bool((colors != _UNCOLORED).all())
