"""Temporal (time-respecting) reachability: earliest-arrival BSP.

arr[v] = the earliest time v can be reached from the seed set along a
time-respecting path — a sequence of edges whose timestamps are
nondecreasing and start at/after the seed's own activation time. Each
round is the sssp.py scatter/exchange/combine wave with the relaxation
``dist[src] + w`` replaced by the TEMPORAL gate::

    cand(u→v over edge at time t) = t   if t >= arr[u]   else +inf

i.e. an edge is traversable only once its source is already reached, and
crossing it lands at the edge's own timestamp (Xuan-Ferreira-Jarry
foremost-journey semantics). arr values only ever decrease and live in a
finite lattice (edge timestamps ∪ seed times), so the fixpoint terminates;
``max_rounds`` raises beyond an oracle's unrolled cap.

Timestamps ride the CSR weight slot as float64 (exact for epoch-µs up to
2^53); +inf = unreached. Generalizes the reference's forward-sweep age
propagation (ccl_marker_stack.py ages: labels carry their first-seen slice
index forward) from slice-index time to arbitrary edge timestamps.

Parallel edges: pass ``dedupe=False`` (default) when copies of an edge can
carry DIFFERENT timestamps — min-weight dedupe would drop a later, still
traversable copy. Callers whose edge timestamps are endpoint-derived (all
copies equal, e.g. q_temporal_reach) set dedupe=True for the cheaper CSR.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    apply_combine_plan,
    as_piece_list,
    combine_plans,
    reduce_routed,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@dataclass
class TemporalResult:
    arrivals: "object"  # ray.data.Dataset (vid:int64, arr:int64 nullable)
    iterations: int
    metrics: list = field(default_factory=list)


@ray.remote
def _ea_scatter_g(plan, csr, arr, P):
    t = csr["w"]
    cand = np.where(t >= arr[plan["edge_src_idx"]], t, np.inf)
    return reduce_routed(plan, cand, np.minimum)


@ray.remote
def _ea_scatter_f(plan, csr, arr, P):
    t = csr["w"]
    cand = np.where(t >= arr[plan["edge_src_idx"]], t, np.inf)
    out = reduce_routed(plan, cand, np.minimum)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=2)
def _ea_combine(q, grouped, cplan, arr, *msg_objs):
    if arr.size == 0:
        return arr, 0
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new = arr.copy()
    pos, red = apply_combine_plan(cplan, pieces, np.minimum)
    if pos.size:
        new[pos] = np.minimum(new[pos], red)
    return new, int((new != arr).sum())


@ray.remote
def _ea_table(vids, arr):
    import pyarrow as pa

    mask = np.isinf(arr)
    out = np.where(mask, 0, arr).astype(np.int64).astype(object)
    return pa.table(
        {
            "vid": pa.array(vids),
            "arr": pa.array(
                np.where(mask, None, out), type=pa.int64(), from_pandas=True
            ),
        }
    )


def earliest_arrival(
    edges,
    seeds,
    *,
    ts_col: str = "t",
    seed_ts_col: str = "arr",
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int | None = None,
    dedupe: bool = False,
) -> TemporalResult:
    """Earliest time-respecting arrival from a seed set.

    ``edges``: Dataset (src, dst, <ts_col>) — integer or float timestamps,
    each edge usable in BOTH directions at its own time. ``seeds``: Dataset
    (vid, <seed_ts_col>) — a seed is active from its own timestamp
    (duplicate seed rows combine by min). Output arr is int64 (timestamps
    are assumed integral, e.g. epoch-µs); NULL = unreachable."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    csr = shard_edges_csr(
        edges, P, symmetrize=True, dedupe=dedupe, drop_self=True,
        weight_col=ts_col,
    )
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)
    cplans = combine_plans(vid_refs, plans, P)
    bundle = {"csr": csr, "vids": vid_refs, "plans": plans, "cplans": cplans,
              "P": P, "symmetrize": True}

    from ccl_ray.state.align import align_vertex_values

    arr = align_vertex_values(
        bundle, seeds, value_col=seed_ts_col, default=np.inf,
        combine="min", dtype=np.float64,
    )

    metrics: list[dict] = []
    it = 0
    while True:
        t0 = time.perf_counter()
        if grouped:
            outs = [_ea_scatter_g.remote(plans[p], csr[p], arr[p], P) for p in range(P)]
            comb = [
                _ea_combine.remote(q, True, cplans[q], arr[q], *outs)
                for q in range(P)
            ]
        else:
            outs = [
                as_piece_list(
                    _ea_scatter_f.options(num_returns=P).remote(
                        plans[p], csr[p], arr[p], P
                    ),
                    P,
                )
                for p in range(P)
            ]
            comb = [
                _ea_combine.remote(
                    q, False, cplans[q], arr[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        arr = [c[0] for c in comb]
        changed_total = int(sum(ray.get([c[1] for c in comb])))
        it += 1
        metrics.append({"iter": it, "changed": changed_total,
                        "wall_s": time.perf_counter() - t0})
        if changed_total == 0:
            break
        if max_rounds is not None and it >= max_rounds:
            raise RuntimeError(
                f"earliest_arrival did not converge within max_rounds={max_rounds}"
            )

    import ray.data as rd

    tables = [_ea_table.remote(vid_refs[p], arr[p]) for p in range(P)]
    return TemporalResult(arrivals=rd.from_arrow_refs(tables), iterations=it,
                          metrics=metrics)
