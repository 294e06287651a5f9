"""Multi-source BFS hop distances over the BSP shard engine.

dist[v] = length of the shortest path from v to the nearest seed (0 for
seeds, null for unreachable vertices). Classic frontier-less synchronous
Bellman-Ford specialization for unit weights:

    dist ← 0 at seeds, +∞ elsewhere
    repeat: dist[v] ← min(dist[v], 1 + min_{u∈N(v)} dist[u])   until stable

Rounds = eccentricity of the seed set (small on hub-chained graphs; the
events co-occurrence graph measures diameter 8 at sf0.01). Each round is
the same scatter/exchange/combine wave as CC — gather dist per edge,
saturating +1, min-reduce by destination — over the SAME precomputed
plans, so a shard bundle built for CC/PageRank is reused as-is (including
the dense int32 domain; distances stay int64 messages).

Seeds arrive as a Dataset (vid) in the ORIGINAL vid domain and are routed
to owning shards by state.align (range→dense→hash in the dense bundle) —
never materialized on the driver.
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
    apply_sparse_pieces,
    reduce_routed,
    reduce_routed_sparse,
)

# unreachable sentinel: far above any path length, far below int64 overflow
# under the saturating +1
_UNREACHED = np.int64(1) << np.int64(62)

# below this changed-vertex fraction a round switches to the sparse
# (frontier) exchange: only messages from changed vertices ship, so the
# shrinking tail of a BFS costs O(frontier) instead of O(E) per wave
_SPARSE_FRAC = 0.10


@dataclass
class BFSResult:
    dists: "object"  # ray.data.Dataset (vid:int64, dist:int64 nullable)
    iterations: int
    metrics: list = field(default_factory=list)


@ray.remote
def _bfs_scatter_g(plan, dist, P):
    d = dist[plan["edge_src_idx"]]
    return reduce_routed(plan, np.minimum(d, _UNREACHED - 1) + 1, np.minimum)


@ray.remote
def _bfs_scatter_f(plan, dist, P):
    d = dist[plan["edge_src_idx"]]
    out = reduce_routed(plan, np.minimum(d, _UNREACHED - 1) + 1, np.minimum)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=3)
def _bfs_combine(q, grouped, cplan, dist, *msg_objs):
    if dist.size == 0:
        return dist, 0, np.zeros(0, dtype=bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new = dist.copy()
    pos, red = apply_combine_plan(cplan, pieces, np.minimum)
    if pos.size:
        new[pos] = np.minimum(new[pos], red)
    mask = new != dist
    return new, int(mask.sum()), mask


@ray.remote
def _bfs_scatter_sparse_g(plan, dist, dirty, P):
    out = reduce_routed_sparse(plan, dist, dirty, np.minimum, P)
    # min(d)+1 == min(d+1): saturate+increment the tiny reduced pieces
    return [(ids, np.minimum(v, _UNREACHED - 1) + 1) for ids, v in out]


@ray.remote
def _bfs_scatter_sparse_f(plan, dist, dirty, P):
    out = reduce_routed_sparse(plan, dist, dirty, np.minimum, P)
    out = [(ids, np.minimum(v, _UNREACHED - 1) + 1) for ids, v in out]
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=3)
def _bfs_combine_sparse(q, grouped, vids, dist, *msg_objs):
    if dist.size == 0:
        return dist, 0, np.zeros(0, dtype=bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new, mask = apply_sparse_pieces(vids, dist, pieces, np.minimum)
    return new, int(mask.sum()), mask


@ray.remote
def _vid_len(vids) -> int:
    return len(vids)


@ray.remote
def _mask_count(mask) -> int:
    return int(mask.sum())


@ray.remote
def _seed_dirty(dist):
    """Round-1 frontier: exactly the seeds (everything else is +inf and its
    messages saturate to no-ops, so skipping them is also an optimization
    the dense path cannot make)."""
    return dist < _UNREACHED


@ray.remote
def _bfs_table(vids, dist):
    import pyarrow as pa

    mask = dist >= _UNREACHED
    return pa.table(
        {
            "vid": pa.array(vids),
            "dist": pa.array(
                np.where(mask, None, dist.astype(object)), type=pa.int64(),
                from_pandas=True,
            ),
        }
    )


def bfs_hops(
    edges,
    seeds,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    shards: dict | None = None,
    max_rounds: int | None = None,
    cap_ok: bool = False,
) -> BFSResult:
    """Hop distance to the nearest seed on the undirected graph of ``edges``.

    ``seeds``: Dataset with column ``vid`` (original domain); seed vids not
    in the graph are ignored. ``max_rounds`` bounds the wave count (raises
    if the fixpoint is not reached — used by oracle-capped queries)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, P, vertices_ds=vertices, symmetrize=True, dense=cfg.dense_ids
        )
    assert shards["P"] == P and shards["symmetrize"]
    vid_refs, plans, cplans = shards["vids"], shards["plans"], shards["cplans"]

    from ccl_ray.state.align import align_vertex_values

    dist = align_vertex_values(
        shards, seeds, value_col=None, default_weight=0, default=int(_UNREACHED),
        combine="min", dtype=np.int64,
    )

    n = int(sum(ray.get([_vid_len.remote(v) for v in vid_refs])))
    dirty = [_seed_dirty.remote(d) for d in dist]
    changed_total = int(sum(ray.get([_mask_count.remote(m) for m in dirty])))

    metrics: list[dict] = []
    it = 0
    while True:
        t0 = time.perf_counter()
        sparse = n > 0 and changed_total / n < _SPARSE_FRAC
        if sparse:
            if grouped:
                outs = [
                    _bfs_scatter_sparse_g.remote(plans[p], dist[p], dirty[p], P)
                    for p in range(P)
                ]
                comb = [
                    _bfs_combine_sparse.remote(q, True, vid_refs[q], dist[q], *outs)
                    for q in range(P)
                ]
            else:
                outs = [
                    _pieces(
                        _bfs_scatter_sparse_f.options(num_returns=P).remote(
                            plans[p], dist[p], dirty[p], P
                        ),
                        P,
                    )
                    for p in range(P)
                ]
                comb = [
                    _bfs_combine_sparse.remote(
                        q, False, vid_refs[q], dist[q], *[outs[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
        elif grouped:
            outs = [_bfs_scatter_g.remote(plans[p], dist[p], P) for p in range(P)]
            comb = [
                _bfs_combine.remote(q, True, cplans[q], dist[q], *outs) for q in range(P)
            ]
        else:
            outs = [
                _pieces(_bfs_scatter_f.options(num_returns=P).remote(plans[p], dist[p], P), P)
                for p in range(P)
            ]
            comb = [
                _bfs_combine.remote(
                    q, False, cplans[q], dist[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        dist = [c[0] for c in comb]
        dirty = [c[2] for c in comb]
        changed_total = int(sum(ray.get([c[1] for c in comb])))
        it += 1
        metrics.append({"iter": it, "changed": changed_total, "sparse": sparse,
                        "wall_s": time.perf_counter() - t0})
        if changed_total == 0:
            break
        if max_rounds is not None and it >= max_rounds:
            if cap_ok:
                # capped sweep: after k waves every vertex with true
                # distance <= k is settled (min-plus waves settle distance d
                # at wave d); farther vertices stay unreached. Well-defined
                # k-hop-bounded distances, no convergence demanded.
                break
            raise RuntimeError(
                f"bfs_hops did not converge within max_rounds={max_rounds}"
            )

    import ray.data as rd

    if shards.get("dense") is not None:
        from ccl_ray.state.dense import translate_shard_tables

        tables = translate_shard_tables(
            shards["dense"], vid_refs, dist, value_is_dense=False, value_col="dist"
        )
        ds = rd.from_arrow_refs(tables)

        def nullify(batch):
            import pyarrow as pa

            d = batch.column("dist").to_numpy(zero_copy_only=False)
            mask = d >= _UNREACHED
            return pa.table(
                {
                    "vid": batch.column("vid"),
                    "dist": pa.array(
                        np.where(mask, None, d.astype(object)), type=pa.int64(),
                        from_pandas=True,
                    ),
                }
            )

        return BFSResult(
            dists=ds.map_batches(nullify, batch_format="pyarrow"),
            iterations=it, metrics=metrics,
        )
    tables = [_bfs_table.remote(vid_refs[p], dist[p]) for p in range(P)]
    return BFSResult(dists=rd.from_arrow_refs(tables), iterations=it, metrics=metrics)


_pieces = as_piece_list
