"""k-core decomposition by synchronous peeling over the BSP shard engine.

The k-core of an undirected graph is the maximal subgraph in which every
vertex has degree ≥ k. Computed as a fixpoint of synchronous peeling:

    alive ← 1 for every vertex
    repeat: alive[v] ← alive[v] AND (Σ_{u∈N(v)} alive[u] ≥ k)   until stable

Round 1 reuses the SAME precomputed scatter/combine plans as CC and
PageRank (state.shards): scatter gathers the alive indicator per edge and
partial-sums by destination inside the task (int32 — the count is bounded
by degree), the exchange ships value-only pieces in the static routed
layout, and the combine applies the ≥ k threshold, keeping the resulting
alive-neighbor COUNT as per-shard state.

Every later round is DELTA-BASED: only vertices that died in the previous
round send, each shipping a −1 decrement to its neighbors through the
sparse frontier exchange (reduce_routed_sparse with op=add). This is exact
— a vertex dies exactly once, so each neighbor receives exactly one
decrement per dead neighbor and the running counts always equal the
alive-subgraph degrees — and strictly cheaper than recounting: a peeling
round costs O(edges incident to the newly dead), so deep peelings with
small layers are nearly free. Convergence is P change-count scalars per
round; rounds needed = number of peeling layers.

At scale this is the standard distributed k-core shape (Montresor et al.,
"Distributed k-Core Decomposition", 2011 — simplified to fixed k
membership): no driver-side data path.

Reference parity note: the reference (michaelleerilee/CCL) has no k-core
operator; this is part of the link-graph extension suite alongside
PageRank (SURVEY.md §2 "beyond-reference" operators).
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


@dataclass
class KCoreResult:
    membership: "object"  # ray.data.Dataset (vid:int64, in_core:bool)
    iterations: int
    metrics: list = field(default_factory=list)


@ray.remote
def _kc_scatter_g(plan, alive, P):
    return reduce_routed(plan, alive[plan["edge_src_idx"]], np.add)


@ray.remote
def _kc_scatter_f(plan, alive, P):
    out = reduce_routed(plan, alive[plan["edge_src_idx"]], np.add)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=4)
def _kc_combine(q, grouped, cplan, alive, k, *msg_objs):
    """Round 1: full alive-neighbor count → threshold.

    Returns (alive, cnt, n_changed, dead_mask); cnt becomes the running
    per-shard state the delta rounds decrement. Vertices receiving no
    messages (no alive in-neighbors) count 0 and die for any k ≥ 1 —
    including isolated explicit vertices."""
    if alive.size == 0:
        return alive, np.zeros(0, np.int32), 0, np.zeros(0, dtype=bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    cnt = np.zeros(len(alive), dtype=np.int32)
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        cnt[pos] = red
    new = ((alive > 0) & (cnt >= k)).astype(np.int32)
    mask = new != alive
    return new, cnt, int(mask.sum()), mask


@ray.remote
def _kc_scatter_delta_g(plan, dead, P):
    neg = np.full(len(dead), -1, np.int32)
    return reduce_routed_sparse(plan, neg, dead, np.add, P)


@ray.remote
def _kc_scatter_delta_f(plan, dead, P):
    neg = np.full(len(dead), -1, np.int32)
    out = reduce_routed_sparse(plan, neg, dead, np.add, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=4)
def _kc_combine_delta(q, grouped, vids, alive, cnt, k, *msg_objs):
    """Delta round: apply −1-per-dead-neighbor decrements to the running
    counts, then re-threshold. Exact because every vertex dies exactly once
    and therefore decrements each neighbor exactly once."""
    if alive.size == 0:
        return alive, cnt, 0, np.zeros(0, dtype=bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new_cnt, _ = apply_sparse_pieces(vids, cnt, pieces, np.add)
    new = ((alive > 0) & (new_cnt >= k)).astype(np.int32)
    mask = new != alive
    return new, new_cnt, int(mask.sum()), mask


@ray.remote
def _kc_init(vids):
    return np.ones(len(vids), dtype=np.int32)


@ray.remote
def _kc_bool(alive):
    return alive > 0


@ray.remote
def _kc_table(vids, alive):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "in_core": pa.array(alive > 0)})


def kcore_bsp(
    edges,
    k: int,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    shards: dict | None = None,
) -> KCoreResult:
    """k-core membership on the undirected simple graph of ``edges``.

    Duplicate edges and self-loops are removed in the CSR build when the
    bundle is built here (a shared prebuilt bundle must have been built the
    same way for counts to equal subgraph degrees)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    if shards is None:
        # NOT build_graph_shards(dense=True): the dense CSR exchange does no
        # duplicate-edge/self-loop removal (harmless for CC/PR's idempotent
        # min, wrong for degree counts). The int64 path dedupes per
        # partition AFTER symmetrization, so alive-neighbor sums equal
        # subgraph degrees exactly. Callers reusing a prebuilt bundle must
        # hand one built from a distinct, loop-free edge table.
        from ccl_ray.state.shards import (
            combine_plans,
            scatter_plans,
            shard_edges_csr,
            shard_vertices,
        )

        csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
        vids = shard_vertices(edges, P, vertices_ds=vertices)
        plans = scatter_plans(csr, vids, P)
        cplans = combine_plans(vids, plans, P)
        shards = {"csr": csr, "vids": vids, "plans": plans, "cplans": cplans,
                  "P": P, "symmetrize": True}
    assert shards["P"] == P and shards["symmetrize"]
    vid_refs, plans, cplans = shards["vids"], shards["plans"], shards["cplans"]

    alive = [_kc_init.remote(v) for v in vid_refs]
    cnts = [None] * P
    dead = [None] * P  # newly-dead mask from the previous round
    metrics: list[dict] = []
    it = 0
    while True:
        t0 = time.perf_counter()
        if it == 0:
            if grouped:
                outs = [_kc_scatter_g.remote(plans[p], alive[p], P) for p in range(P)]
                comb = [
                    _kc_combine.remote(q, True, cplans[q], alive[q], k, *outs)
                    for q in range(P)
                ]
            else:
                outs = [
                    _as_pieces(_kc_scatter_f.options(num_returns=P).remote(plans[p], alive[p], P), P)
                    for p in range(P)
                ]
                comb = [
                    _kc_combine.remote(
                        q, False, cplans[q], alive[q], k, *[outs[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
        else:
            if grouped:
                outs = [_kc_scatter_delta_g.remote(plans[p], dead[p], P) for p in range(P)]
                comb = [
                    _kc_combine_delta.remote(q, True, vid_refs[q], alive[q], cnts[q], k, *outs)
                    for q in range(P)
                ]
            else:
                outs = [
                    _as_pieces(
                        _kc_scatter_delta_f.options(num_returns=P).remote(plans[p], dead[p], P), P
                    )
                    for p in range(P)
                ]
                comb = [
                    _kc_combine_delta.remote(
                        q, False, vid_refs[q], alive[q], cnts[q], k,
                        *[outs[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
        alive = [c[0] for c in comb]
        cnts = [c[1] for c in comb]
        dead = [c[3] for c in comb]
        changed = int(sum(ray.get([c[2] for c in comb])))
        it += 1
        metrics.append({"iter": it, "changed": changed,
                        "wall_s": time.perf_counter() - t0})
        if changed == 0:
            break

    import ray.data as rd

    if shards.get("dense") is not None:
        from ccl_ray.state.dense import translate_shard_tables

        bools = [_kc_bool.remote(a) for a in alive]
        tables = translate_shard_tables(
            shards["dense"], vid_refs, bools, value_is_dense=False, value_col="in_core"
        )
    else:
        tables = [_kc_table.remote(vid_refs[p], alive[p]) for p in range(P)]
    return KCoreResult(membership=rd.from_arrow_refs(tables), iterations=it,
                       metrics=metrics)


_as_pieces = as_piece_list
