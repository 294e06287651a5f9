"""Deterministic Maximal Independent Set (Luby-style) over the BSP engine.

Priorities are an INJECTIVE mixing of the vid: prio(v) = (v · K) mod 2⁶⁴
with K odd (multiplication by an odd constant is a bijection on 64-bit
ints), so there are never ties and the algorithm is fully deterministic —
the property that lets a SQL oracle unroll the exact same rounds. Each
round, every undecided vertex whose priority is strictly below the minimum
priority of its undecided neighbors joins the set (vertices with no
undecided neighbors join unconditionally); neighbors of joiners leave.
Adjacent vertices can never both join (strict minimum), and the loop ends
only when no vertex is undecided, so the result is a maximal independent
set. Expected O(log n) rounds under the hash-mixed priorities.

Distributed shape per round (same plan machinery as LPA — original-vid
domain, simple graph):
1. per shard: min priority over UNDECIDED sources per destination, one
   lexsort + reduceat, routed by hash(dst) — message volume pre-reduces to
   ≤ one row per (dst, shard) before it ships;
2. per owner: merge mins, mark joiners (prio < min, or no undecided
   neighbor at all);
3. a second, much sparser wave flags neighbors of the new joiners as out.

Generalizes the reference's per-slice symbolic passes to a classic
distributed-coordination primitive the raster engine has no analog for.
Requires nonnegative vids (asserted) so the numpy uint64 and SQL HUGEINT
priority arithmetic agree bit-for-bit.
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

# golden-ratio odd constant: prio(v) = (v * K) mod 2^64 is a bijection
PRIO_K = np.uint64(0x9E3779B97F4A7C15)
_PMAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_UNDECIDED, _IN, _OUT = np.int8(0), np.int8(1), np.int8(2)
# joiners are FRESH for one round so the knockout wave ships only the new
# joiners' messages (an old joiner's undecided neighbors are already out)
_FRESH = np.int8(3)


@ray.remote(num_returns=2)
def _init_state(vids):
    assert (vids >= 0).all(), "MIS priorities require nonnegative vids"
    prio = vids.astype(np.uint64) * PRIO_K
    return prio, np.full(len(vids), _UNDECIDED, np.int8)


def _min_pieces(plan, csr, prio, status, P, from_status):
    """Per-dst min priority over sources with ``from_status``, routed."""
    empty = (np.empty(0, np.int64), np.empty(0, np.uint64))
    if plan["n_edges"] == 0:
        return [empty] * P
    mask = status[plan["edge_src_idx"]] == from_status
    if not mask.any():
        return [empty] * P
    dst = csr["dst"][mask]
    vals = prio[plan["edge_src_idx"][mask]]
    order = np.argsort(dst, kind="stable")
    dst, vals = dst[order], vals[order]
    new = np.empty(len(dst), bool)
    new[0] = True
    new[1:] = dst[1:] != dst[:-1]
    starts = np.nonzero(new)[0]
    dst = dst[starts]
    vals = np.minimum.reduceat(vals, starts)
    parts = part_of(dst, P)
    o = np.argsort(parts, kind="stable")
    dst, vals, parts = dst[o], vals[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    return [(dst[b[p] : b[p + 1]], vals[b[p] : b[p + 1]]) for p in range(P)]


@ray.remote
def _mis_scatter(plan, csr, prio, status, P, from_status):
    return _min_pieces(plan, csr, prio, status, P, from_status)


@ray.remote
def _mis_scatter_f(plan, csr, prio, status, P, from_status):
    out = _min_pieces(plan, csr, prio, status, P, from_status)
    return out[0] if P == 1 else tuple(out)


def _nbr_min(vids, pieces):
    """(min over received values, presence mask). Presence is tracked
    separately: the sentinel default is itself a REPRESENTABLE priority
    (the one vid with prio == 2^64−1), so 'received nothing' must not be
    conflated with 'received the max value'."""
    acc = np.full(len(vids), _PMAX, np.uint64)
    seen = np.zeros(len(vids), bool)
    for dst, vals in pieces:
        if len(dst):
            pos = np.searchsorted(vids, dst)
            np.minimum.at(acc, pos, vals)
            seen[pos] = True
    return acc, seen


@ray.remote(num_returns=2)
def _mis_join(q, grouped, vids, prio, status, *msg_objs):
    """Undecided vertices with prio strictly below every undecided
    neighbor's (or with no undecided neighbor) join the set."""
    if status.size == 0:
        return status, 0
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    nbr_min, seen = _nbr_min(vids, pieces)
    # no undecided neighbor → join unconditionally (matches the SQL twin's
    # "m.mp IS NULL" branch even for the vid whose priority == the sentinel)
    join = (status == _UNDECIDED) & (~seen | (prio < nbr_min))
    new = status.copy()
    new[join] = _FRESH
    return new, int(join.sum())


@ray.remote(num_returns=2)
def _mis_knockout(q, grouped, vids, status, *msg_objs):
    """Undecided neighbors of this round's joiners leave the set."""
    if status.size == 0:
        return status, 0
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    # presence, not min: a joiner's priority could in principle equal the
    # sentinel, so "received anything" is the correct knockout signal
    has_fresh_nbr = np.zeros(len(vids), bool)
    for dst, _vals in pieces:
        if len(dst):
            has_fresh_nbr[np.searchsorted(vids, dst)] = True
    out = (status == _UNDECIDED) & has_fresh_nbr
    new = status.copy()
    new[out] = _OUT
    new[new == _FRESH] = _IN
    remaining = int((new == _UNDECIDED).sum())
    return new, remaining


@ray.remote
def _mis_table(vids, status):
    import pyarrow as pa

    return pa.table(
        {"vid": pa.array(vids), "in_mis": pa.array(status == _IN)}
    )


def maximal_independent_set(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 64,
):
    """((vid, in_mis) Dataset, rounds run) — deterministic MIS of the
    undirected simple graph of ``edges`` (deduped, loop-free)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)

    init = [_init_state.remote(vid_refs[p]) for p in range(P)]
    prio = [i[0] for i in init]
    status = [i[1] for i in init]

    def wave(from_status, combiner, extra):
        if grouped:
            outs = [
                _mis_scatter.remote(plans[p], csr[p], prio[p], status[p], P, from_status)
                for p in range(P)
            ]
            return [
                combiner.remote(q, True, vid_refs[q], *extra(q), *outs)
                for q in range(P)
            ]
        outs = [
            ([o] if P == 1 else list(o))
            for o in (
                _mis_scatter_f.options(num_returns=P).remote(
                    plans[p], csr[p], prio[p], status[p], P, from_status
                )
                for p in range(P)
            )
        ]
        return [
            combiner.remote(
                q, False, vid_refs[q], *extra(q), *[outs[p][q] for p in range(P)]
            )
            for q in range(P)
        ]

    rounds = 0
    while True:
        rounds += 1
        res = wave(_UNDECIDED, _mis_join, lambda q: (prio[q], status[q]))
        status = [r[0] for r in res]
        joined = int(sum(ray.get([r[1] for r in res])))
        # a round with no joiner is impossible while anyone is undecided
        # (the global minimum among undecided always joins)
        assert joined > 0, "MIS round produced no joiner with undecided left"
        res = wave(_FRESH, _mis_knockout, lambda q: (status[q],))
        status = [r[0] for r in res]
        remaining = int(sum(ray.get([r[1] for r in res])))
        if remaining == 0:
            break
        if rounds >= max_rounds:
            raise AssertionError(f"MIS exceeded max_rounds={max_rounds}")

    tables = [_mis_table.remote(vid_refs[p], status[p]) for p in range(P)]
    return rd.from_arrow_refs(tables), rounds
