"""Edge-weighted PageRank (fixed-iteration) over weight-carrying CSR shards.

Transition mass flows proportional to edge weight: with W(u) = Σ_w out of
u (the weighted out-degree on the symmetrized, deduped, loop-free graph),

    new[v] = (1−d)/n + d·( Σ_{u→v} score[u]·w(u,v)/W(u) + dangling/n )

where dangling = Σ score over vertices with no edges (isolated vertices
from an explicit vertex table). The per-edge normalized weight w/W is
precomputed ONCE per shard (it is state-independent), so each iteration
is the same gather·multiply → routed add-reduce wave as classic PageRank
— per-edge bytes identical except the extra float multiply.

Fixed iteration count = exact-twin contract with the recursive-SQL oracle
(the pagerank_fixed precedent, queries.py): both sides compute the same
operator power; scores round to 10 before hashing. The classic engine
(pagerank_bsp) keeps its converged/checkpointed path; this stage is the
weighted sibling used where relevance weights (not topology alone) drive
the walk."""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    apply_combine_plan,
    combine_plans,
    l1_delta as _l1_delta,
    reduce_routed,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@ray.remote
def _wnorm(csr):
    """w(u,v)/W(u) aligned with the CSR edge order (one-time)."""
    w = csr.get("w")
    assert w is not None, "weighted pagerank requires weight_col edges"
    if w.size == 0:
        return w
    assert (w >= 0).all(), "weighted pagerank requires non-negative weights"
    W = np.add.reduceat(w, csr["indptr"][:-1])
    # a vertex whose edges all weigh 0 has no defined distribution — fail
    # loudly (mirrors sssp's _check_weights) instead of emitting NaN scores
    assert (W > 0).all(), "weighted pagerank: vertex with zero total out-weight"
    return w / np.repeat(W, csr["outdeg"])


@ray.remote
def _has_edge(csr, vids):
    mask = np.zeros(len(vids), bool)
    if csr["srcs"].size:
        mask[np.searchsorted(vids, csr["srcs"])] = True
    return mask


@ray.remote
def _init(vids, n):
    return np.full(len(vids), 1.0 / n, np.float64)


@ray.remote
def _wpr_scatter_g(plan, wnorm, score, has_edge):
    """Grouped: one object of P pieces + this shard's dangling mass."""
    if plan["n_edges"] == 0:
        pieces = reduce_routed(plan, np.empty(0, np.float64), np.add)
    else:
        pieces = reduce_routed(plan, score[plan["edge_src_idx"]] * wnorm, np.add)
    return pieces, float(score[~has_edge].sum())


@ray.remote
def _wpr_scatter_f(plan, wnorm, score, has_edge, P):
    if plan["n_edges"] == 0:
        pieces = reduce_routed(plan, np.empty(0, np.float64), np.add)
    else:
        pieces = reduce_routed(plan, score[plan["edge_src_idx"]] * wnorm, np.add)
    dang = float(score[~has_edge].sum())
    return (*pieces, dang)


@ray.remote
def _wpr_combine(q, cplan, score, n, damping, *msg_objs):
    """Grouped mode: each msg is (P value pieces, dangling scalar)."""
    if score.size == 0:
        return score
    pieces = [m[0][q] for m in msg_objs]
    dang = float(sum(m[1] for m in msg_objs))
    agg = np.zeros_like(score)
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        agg[pos] = red
    return (1.0 - damping) / n + damping * (agg + dang / n)


@ray.remote
def _wpr_combine_f(q, cplan, score, n, damping, P, *flat):
    """Fanout: ``flat`` is P value pieces (this partition's) then P dangling
    scalars."""
    if score.size == 0:
        return score
    pieces = list(flat[:P])
    dang = float(sum(flat[P:]))
    agg = np.zeros_like(score)
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        agg[pos] = red
    return (1.0 - damping) / n + damping * (agg + dang / n)


@ray.remote
def _wpr_table(vids, score, round_to):
    import pyarrow as pa

    return pa.table(
        {"vid": pa.array(vids), "score": pa.array(np.round(score, round_to))}
    )


@ray.remote
def _vid_len(vids) -> int:
    return len(vids)


def _wpr_run(edges, weight_col, damping, vertices, cfg, round_to, *,
             iterations=None, tol=None, max_iters=None):
    """Shared driver: fixed-count (``iterations``) or run-to-convergence
    (``tol``/``max_iters``; L1 delta as P scalar partials per round — the
    same sync pagerank_bsp pays)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    csr = shard_edges_csr(
        edges, P, symmetrize=True, dedupe=True, drop_self=True, weight_col=weight_col
    )
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)
    cplans = combine_plans(vid_refs, plans, P)
    wnorm = [_wnorm.remote(csr[p]) for p in range(P)]
    has_edge = [_has_edge.remote(csr[p], vid_refs[p]) for p in range(P)]
    n = int(sum(ray.get([_vid_len.remote(v) for v in vid_refs])))

    score = [_init.remote(vid_refs[p], n) for p in range(P)]
    it = 0
    while True:
        old = score
        if grouped:
            outs = [
                _wpr_scatter_g.remote(plans[p], wnorm[p], score[p], has_edge[p])
                for p in range(P)
            ]
            score = [
                _wpr_combine.remote(q, cplans[q], score[q], n, damping, *outs)
                for q in range(P)
            ]
        else:
            outs = [
                list(
                    _wpr_scatter_f.options(num_returns=P + 1).remote(
                        plans[p], wnorm[p], score[p], has_edge[p], P
                    )
                )
                for p in range(P)
            ]
            score = [
                _wpr_combine_f.remote(
                    q, cplans[q], score[q], n, damping, P,
                    *[outs[p][q] for p in range(P)],
                    *[outs[p][P] for p in range(P)],
                )
                for q in range(P)
            ]
        it += 1
        if iterations is not None:
            if it >= iterations:
                break
        else:
            l1 = sum(ray.get([_l1_delta.remote(score[p], old[p]) for p in range(P)]))
            if l1 < tol or it >= max_iters:
                break

    tables = [_wpr_table.remote(vid_refs[p], score[p], round_to) for p in range(P)]
    return rd.from_arrow_refs(tables), it


def pagerank_weighted_fixed(
    edges,
    *,
    weight_col: str = "w",
    iterations: int = 20,
    damping: float = 0.85,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """(vid, score) after exactly ``iterations`` weighted-PageRank rounds
    on the undirected (symmetrized, deduped, loop-free) weighted graph;
    uniform 1/n start; scores rounded to ``round_to``."""
    ds, _ = _wpr_run(
        edges, weight_col, damping, vertices, cfg, round_to, iterations=iterations
    )
    return ds


def pagerank_weighted(
    edges,
    *,
    weight_col: str = "w",
    tol: float = 1e-10,
    max_iters: int = 100,
    damping: float = 0.85,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """Run-to-convergence weighted PageRank: iterate until the L1 score
    delta falls below ``tol`` (or ``max_iters``). Returns ((vid, score)
    Dataset, iterations run) — the tol twin of pagerank_weighted_fixed,
    mirroring pagerank_bsp's convergence contract."""
    return _wpr_run(
        edges, weight_col, damping, vertices, cfg, round_to,
        tol=tol, max_iters=max_iters,
    )
