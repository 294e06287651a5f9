"""Weighted single-source-set shortest paths (synchronous Bellman-Ford BSP).

dist[v] = min total edge weight from v to the nearest seed (0 at seeds,
null when unreachable), over the undirected weighted graph. Each round is
the same scatter/exchange/combine wave as BFS (bfs.py) with the unit hop
cost replaced by the per-edge weight carried in the CSR shards
(state.shards ``weight_col``): gather dist at each edge's src, add the edge
weight, min-reduce by destination.

Rounds = depth (in hops) of the weighted shortest-path tree — bounded by
V−1 in theory, small on hub-chained graphs in practice; ``max_rounds``
raises beyond an oracle's unrolled-relaxation cap. Non-negative weights
required (asserted per shard); float64 distances, +inf = unreached (no
saturation arithmetic needed: inf + w = inf).

Runs in the ORIGINAL int64 vid domain (dense renumbering would have to
re-align the weight array through three exchanges for a pipeline that
typically converges in < 40 waves; the dense path pays off on the
100+-round CC/PageRank loops, not here).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    as_piece_list,
    apply_combine_plan,
    combine_plans,
    reduce_routed,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@dataclass
class SSSPResult:
    dists: "object"  # ray.data.Dataset (vid:int64, dist:float64 nullable)
    iterations: int
    metrics: list = field(default_factory=list)


@ray.remote
def _check_weights(csr) -> bool:
    """One-time validation (weights are static; the per-round scatters must
    not rescan them every wave)."""
    w = csr.get("w")
    assert w is not None and (w >= 0).all(), "sssp requires non-negative weights"
    return True


@ray.remote
def _sssp_scatter_g(plan, csr, dist, P):
    """Grouped mode: ONE object holding all P value pieces; each combiner
    slices its piece zero-copy (the piece list is the protocol — do not
    unpack even at P=1)."""
    vals = dist[plan["edge_src_idx"]] + csr["w"]
    return reduce_routed(plan, vals, np.minimum)


@ray.remote
def _sssp_scatter_f(plan, csr, dist, P):
    vals = dist[plan["edge_src_idx"]] + csr["w"]
    out = reduce_routed(plan, vals, np.minimum)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=2)
def _sssp_combine(q, grouped, cplan, dist, *msg_objs):
    if dist.size == 0:
        return dist, 0
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new = dist.copy()
    pos, red = apply_combine_plan(cplan, pieces, np.minimum)
    if pos.size:
        new[pos] = np.minimum(new[pos], red)
    return new, int((new != dist).sum())


@ray.remote
def _sssp_table(vids, dist):
    import pyarrow as pa

    mask = np.isinf(dist)
    return pa.table(
        {
            "vid": pa.array(vids),
            "dist": pa.array(
                np.where(mask, None, dist.astype(object)), type=pa.float64(),
                from_pandas=True,
            ),
        }
    )


_pieces = as_piece_list


def sssp_weighted(
    edges,
    seeds,
    *,
    weight_col: str = "w",
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int | None = None,
) -> SSSPResult:
    """Weighted shortest-path distance to the nearest seed.

    ``edges``: Dataset (src, dst, <weight_col>); ``seeds``: Dataset with
    column ``vid`` (seed vids not in the graph are ignored; duplicate seed
    rows combine by min). ``max_rounds`` raises if the fixpoint is not
    reached within the cap (oracle-parity callers)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    csr = shard_edges_csr(
        edges, P, symmetrize=True, dedupe=True, drop_self=True, weight_col=weight_col
    )
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    ray.get([_check_weights.remote(c) for c in csr])  # once, not per round
    plans = scatter_plans(csr, vid_refs, P)
    cplans = combine_plans(vid_refs, plans, P)
    bundle = {"csr": csr, "vids": vid_refs, "plans": plans, "cplans": cplans,
              "P": P, "symmetrize": True}

    from ccl_ray.state.align import align_vertex_values

    dist = align_vertex_values(
        bundle, seeds, value_col=None, default_weight=0.0, default=np.inf,
        combine="min", dtype=np.float64,
    )

    metrics: list[dict] = []
    it = 0
    while True:
        t0 = time.perf_counter()
        if grouped:
            outs = [_sssp_scatter_g.remote(plans[p], csr[p], dist[p], P) for p in range(P)]
            comb = [
                _sssp_combine.remote(q, True, cplans[q], dist[q], *outs)
                for q in range(P)
            ]
        else:
            outs = [
                _pieces(
                    _sssp_scatter_f.options(num_returns=P).remote(
                        plans[p], csr[p], dist[p], P
                    ),
                    P,
                )
                for p in range(P)
            ]
            comb = [
                _sssp_combine.remote(
                    q, False, cplans[q], dist[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        dist = [c[0] for c in comb]
        changed_total = int(sum(ray.get([c[1] for c in comb])))
        it += 1
        metrics.append({"iter": it, "changed": changed_total,
                        "wall_s": time.perf_counter() - t0})
        if changed_total == 0:
            break
        if max_rounds is not None and it >= max_rounds:
            raise RuntimeError(
                f"sssp_weighted did not converge within max_rounds={max_rounds}"
            )

    import ray.data as rd

    tables = [_sssp_table.remote(vid_refs[p], dist[p]) for p in range(P)]
    return SSSPResult(dists=rd.from_arrow_refs(tables), iterations=it, metrics=metrics)
