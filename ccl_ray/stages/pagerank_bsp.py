"""PageRank via gather-scatter over hash-partitioned CSR shards.

The north-star operator with no reference precedent (the reference computes
only component labels + lifetimes): power iteration where each round is a
wave of P scatter tasks (per-shard SpMV: score/outdeg fan-out along the
precomputed scatter plan, partial-summed by destination inside the task —
the combiner that keeps the exchange at O(distinct dst) instead of
O(edges)), an exchange routed by hash(dst) (grouped or fanout — see
cc_bsp docstring), and P combine tasks applying damping + dangling-mass
redistribution. Convergence = global L1 delta < tol (P scalars per round).

Per-iteration work is pure gather + reduceat + slice: the sort permutation,
segment starts and routing layout are precomputed once in the scatter plan.

Dangling vertices (no out-edges — e.g. isolated turns) keep their mass in
the system: pooled each round, redistributed uniformly; scores match the
dense numpy oracle to 1e-6 (BASELINE.md target).

Determinism: message pieces are combined in fixed partition order with
sort+reduceat, so summation order — and the float result — is identical
across runs at the same P.
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
class PRResult:
    scores: "object"  # ray.data.Dataset (vid:int64, score:float64)
    iterations: int
    metrics: list = field(default_factory=list)


_as_list = as_piece_list


@ray.remote
def _outdeg_aligned(csr, vids):
    """STATIC per-shard auxiliaries, computed once: reciprocal out-degree
    (the per-iteration kernel multiplies, never divides) and the dangling
    vertex index (mask allocation hoisted out of the loop)."""
    deg = np.zeros(len(vids), dtype=np.float64)
    if csr["srcs"].size:
        deg[np.searchsorted(vids, csr["srcs"])] = csr["outdeg"].astype(np.float64)
    inv = np.zeros_like(deg)
    nz = deg > 0.0
    inv[nz] = 1.0 / deg[nz]
    return {"inv": inv, "didx": np.nonzero(~nz)[0].astype(np.int32)}


@ray.remote
def _init_scores(vids, n):
    return np.full(len(vids), 1.0 / n, dtype=np.float64)


@ray.remote
def _pr_scatter_g(plan, scores, aux, P):
    """One grouped object: (list of P value pieces, this shard's dangling).

    Dangling mass rides the exchange instead of a driver round-trip: every
    combine task sees all scatter outputs in grouped mode, so the global
    dangling sum is computed task-side — the iteration has NO driver sync."""
    dangling = float(scores[aux["didx"]].sum())
    per_edge = (scores * aux["inv"])[plan["edge_src_idx"]]
    return reduce_routed(plan, per_edge, np.add), dangling


@ray.remote
def _pr_scatter_f(plan, scores, aux, P):
    """Fanout: num_returns=P+1 — P pieces + dangling scalar."""
    dangling = float(scores[aux["didx"]].sum())
    per_edge = (scores * aux["inv"])[plan["edge_src_idx"]]
    pieces = reduce_routed(plan, per_edge, np.add)
    return (*pieces, dangling)


@ray.remote(num_returns=2)
def _pr_combine(q, grouped, cplan, scores, n, damping, restart, *msg_objs):
    """``restart``: None → uniform teleport 1/n (classic PageRank); else a
    shard-aligned restart-probability vector (personalized PageRank —
    teleport AND dangling mass both land on the restart distribution)."""
    if grouped:
        pieces = [m[0][q] for m in msg_objs]
        dangling_total = float(sum(m[1] for m in msg_objs))
    else:
        # fanout: first P args are this part's pieces, last P are the
        # per-shard dangling scalars
        P = len(msg_objs) // 2
        pieces = list(msg_objs[:P])
        dangling_total = float(sum(msg_objs[P:]))
    agg = np.zeros(len(scores), dtype=np.float64)
    # static layout + fixed piece order → deterministic summation
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        agg[pos] = red
    if restart is None:
        new = (1.0 - damping) / n + damping * (agg + dangling_total / n)
    else:
        new = (1.0 - damping) * restart + damping * (agg + dangling_total * restart)
    l1 = float(np.abs(new - scores).sum())
    return new, l1


@ray.remote
def _shard_table(vids, scores):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "score": pa.array(scores)})


@ray.remote
def _plan_edges(plan):
    return plan["n_edges"]


@ray.remote
def _vec_sum(vec) -> float:
    return float(np.asarray(vec).sum())


@ray.remote
def _vec_scale(vec, s: float):
    return np.asarray(vec) * s


def pagerank_bsp(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    checkpoint=None,
    symmetrize: bool = False,
    shards: dict | None = None,
    personalization=None,
    init_scores=None,
) -> PRResult:
    """PageRank on directed edges (src->dst). ``symmetrize=True`` treats the
    edge table as undirected (each edge contributes both directions).
    ``shards``: optional prebuilt bundle (state.shards.build_graph_shards)
    with matching symmetrize — reused across algorithms on one graph.

    ``personalization``: optional Dataset (vid [, weight:float]) in the
    ORIGINAL vid domain → personalized PageRank: the teleport distribution
    (and the dangling-mass sink) becomes the normalized seed weights instead
    of uniform 1/n, and iteration starts AT that distribution (so a
    fixed-iteration run computes the exact same operator power as the
    recursive-SQL oracle). Seeds are routed to owning shards by the same
    exchange that built the vid shards (state.align) — never materialized
    on the driver. Vids not in the graph are dropped; total weight must be
    positive.

    ``init_scores``: optional Dataset (vid, score) to WARM-START the power
    iteration from (normalized to total mass 1; vids absent from the graph
    dropped, graph vertices absent from the set start at 0 — the teleport
    term re-injects their mass). The incremental-recompute path: after a
    small edge delta, converging from the previous fixpoint takes far fewer
    iterations than from uniform. Ignored when a checkpoint resume wins."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, P, vertices_ds=vertices, symmetrize=symmetrize, dense=cfg.dense_ids
        )
    assert shards["symmetrize"] == symmetrize and shards["P"] == P
    csr, vid_refs, plans, cplans = (
        shards["csr"], shards["vids"], shards["plans"], shards["cplans"],
    )
    outdeg = [_outdeg_aligned.remote(csr[p], vid_refs[p]) for p in range(P)]
    counts = ray.get([ray.remote(lambda v: len(v)).remote(v) for v in vid_refs])
    n = int(sum(counts))
    n_edges = int(sum(ray.get([_plan_edges.remote(p) for p in plans])))

    restart_refs = [None] * P
    if personalization is not None:
        from ccl_ray.state.align import align_vertex_values

        raw = align_vertex_values(
            shards, personalization, value_col="weight", default=0.0, combine="add"
        )
        total = float(sum(ray.get([_vec_sum.remote(r) for r in raw])))
        if total <= 0.0:
            raise ValueError(
                "personalization has no positive weight on any graph vertex"
            )
        restart_refs = [_vec_scale.remote(r, 1.0 / total) for r in raw]

    start_iter = 0
    score_refs = None
    if checkpoint is not None:
        from ccl_ray.state.checkpoint import vid_fingerprint

        resumed = checkpoint.latest_shards(
            expected_parts=P, expected_vid_fp=vid_fingerprint(vid_refs)
        )
        if resumed is not None:
            start_iter, score_refs = resumed
    if score_refs is None and init_scores is not None:
        from ccl_ray.state.align import align_vertex_values

        raw = align_vertex_values(
            shards, init_scores, value_col="score", default=0.0, combine="add"
        )
        total = float(sum(ray.get([_vec_sum.remote(r) for r in raw])))
        if total <= 0.0:
            raise ValueError("init_scores has no positive mass on any graph vertex")
        score_refs = [_vec_scale.remote(r, 1.0 / total) for r in raw]
    if score_refs is None:
        if personalization is not None:
            score_refs = list(restart_refs)
        else:
            score_refs = [_init_scores.remote(v, n) for v in vid_refs]

    metrics: list[dict] = []
    it = start_iter
    # checkpointing wants per-iteration state on disk; otherwise batch K
    # iterations per driver sync so the whole block pipelines as one DAG
    K = 1 if checkpoint is not None else max(cfg.check_every, 1)
    while it < cfg.pr_max_iters:
        t0 = time.perf_counter()
        block_l1: list = []
        block_scores: list = []
        block_iters = min(K, cfg.pr_max_iters - it)
        for _ in range(block_iters):
            if grouped:
                outs = [
                    _pr_scatter_g.remote(plans[p], score_refs[p], outdeg[p], P) for p in range(P)
                ]
                comb = [
                    _pr_combine.remote(
                        q, True, cplans[q], score_refs[q], n, cfg.pr_damping,
                        restart_refs[q], *outs
                    )
                    for q in range(P)
                ]
            else:
                outs = [
                    list(
                        _pr_scatter_f.options(num_returns=P + 1).remote(
                            plans[p], score_refs[p], outdeg[p], P
                        )
                    )
                    for p in range(P)
                ]
                comb = [
                    _pr_combine.remote(
                        q,
                        False,
                        cplans[q],
                        score_refs[q],
                        n,
                        cfg.pr_damping,
                        restart_refs[q],
                        *[outs[p][q] for p in range(P)],
                        *[outs[p][P] for p in range(P)],
                    )
                    for q in range(P)
                ]
            score_refs = [c[0] for c in comb]
            block_l1.append([c[1] for c in comb])
            block_scores.append(score_refs)
        l1s = [float(sum(ray.get(refs))) for refs in block_l1]
        wall = time.perf_counter() - t0
        converged = False
        for i, l1 in enumerate(l1s):
            it += 1
            metrics.append(
                {
                    "iter": it,
                    "l1": l1,
                    "edges": n_edges,
                    "wall_s": wall / block_iters,
                    "edges_per_sec": n_edges * block_iters / wall if wall > 0 else 0.0,
                }
            )
            if l1 < cfg.pr_tol:
                # stop at the exact first-converged iteration (deterministic
                # regardless of block boundaries, e.g. after a resume)
                score_refs = block_scores[i]
                converged = True
                break
        if checkpoint is not None and (it % cfg.checkpoint_every == 0 or converged):
            checkpoint.save_shards(it, vid_refs, score_refs, extra=metrics[-1])
        if converged:
            break

    import ray.data as rd

    if shards.get("dense") is not None:
        # map dense int32 vids back to originals; scores pass through
        from ccl_ray.state.dense import translate_shard_tables

        tables = translate_shard_tables(
            shards["dense"], vid_refs, score_refs, value_is_dense=False, value_col="score"
        )
    else:
        tables = [_shard_table.remote(vid_refs[p], score_refs[p]) for p in range(P)]
    scores_ds = rd.from_arrow_refs(tables)
    return PRResult(scores=scores_ds, iterations=it - start_iter, metrics=metrics)
