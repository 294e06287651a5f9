"""PageRank via gather-scatter over hash-partitioned CSR shards.

The north-star operator with no reference precedent (the reference computes
only component labels + lifetimes): power iteration where each round is a
wave of P scatter tasks (per-shard SpMV: score/outdeg fan-out along CSR,
partial-summed by destination inside the task — the combiner that keeps the
all-to-all exchange at O(distinct dst) instead of O(edges)), an exchange
routed by hash(dst), and P combine tasks applying damping + dangling-mass
redistribution. Convergence = global L1 delta < tol (P scalars to the
driver per round).

Dangling vertices (no out-edges — e.g. isolated turns) keep their mass in
the system: their score is pooled each round and redistributed uniformly,
so total mass stays 1 and scores match the dense numpy oracle to 1e-6
(BASELINE.md target).

Determinism: message pieces are concatenated in fixed partition order and
reduced with sort+np.add.reduceat, so summation order — and therefore the
float result — is identical across runs at the same P.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import part_of, shard_edges_csr, shard_vertices


@dataclass
class PRResult:
    scores: "object"  # ray.data.Dataset (vid:int64, score:float64)
    iterations: int
    metrics: list = field(default_factory=list)


@ray.remote
def _outdeg_aligned(csr, vids):
    deg = np.zeros(len(vids), dtype=np.float64)
    if csr["srcs"].size:
        deg[np.searchsorted(vids, csr["srcs"])] = csr["outdeg"].astype(np.float64)
    return deg


@ray.remote
def _init_scores(vids, n):
    return np.full(len(vids), 1.0 / n, dtype=np.float64)


@ray.remote
def _pr_scatter(csr, vids, scores, outdeg, P):
    """P routed (dst, partial-sum) pieces + this shard's dangling mass.

    Called with num_returns=P+1 so each destination partition fetches ONLY
    its own piece (true all-to-all exchange, O(E/P^2) per piece), and the
    driver fetches only the scalar.
    """
    dangling = float(scores[outdeg == 0.0].sum())
    if csr["srcs"].size == 0:
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        return (*[empty] * P, dangling)
    idx = np.searchsorted(vids, csr["srcs"])
    per_src = scores[idx] / csr["outdeg"].astype(np.float64)
    contrib = np.repeat(per_src, csr["outdeg"])
    dst = csr["dst"]
    order = np.argsort(dst, kind="stable")
    dst_s, contrib_s = dst[order], contrib[order]
    uniq, start = np.unique(dst_s, return_index=True)
    sums = np.add.reduceat(contrib_s, start)
    parts = part_of(uniq, P)
    o2 = np.argsort(parts, kind="stable")
    uniq, sums, parts = uniq[o2], sums[o2], parts[o2]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    pieces = tuple(
        (uniq[bounds[p] : bounds[p + 1]], sums[bounds[p] : bounds[p + 1]]) for p in range(P)
    )
    return (*pieces, dangling)


@ray.remote(num_returns=2)
def _pr_combine(vids, scores, n, damping, dangling_total, *msg_pieces):
    agg = np.zeros(len(vids), dtype=np.float64)
    for dsts, partial in msg_pieces:  # fixed partition order → deterministic sums
        if dsts.size:
            agg[np.searchsorted(vids, dsts)] += partial
    new = (1.0 - damping) / n + damping * (agg + dangling_total / n)
    l1 = float(np.abs(new - scores).sum())
    return new, l1


@ray.remote
def _shard_table(vids, scores):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "score": pa.array(scores)})


def pagerank_bsp(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    checkpoint=None,
    symmetrize: bool = False,
) -> PRResult:
    """PageRank on directed edges (src->dst). ``symmetrize=True`` treats the
    edge table as undirected (each edge contributes both directions)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=symmetrize)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    outdeg = [_outdeg_aligned.remote(csr[p], vid_refs[p]) for p in range(P)]
    counts = ray.get([ray.remote(lambda v: len(v)).remote(v) for v in vid_refs])
    n = int(sum(counts))
    n_edges = int(sum(ray.get([ray.remote(lambda c: len(c["dst"])).remote(r) for r in csr])))

    start_iter = 0
    score_refs = None
    if checkpoint is not None:
        resumed = checkpoint.latest_shards()
        if resumed is not None:
            start_iter, score_refs = resumed
    if score_refs is None:
        score_refs = [_init_scores.remote(v, n) for v in vid_refs]

    metrics: list[dict] = []
    it = start_iter
    while it < cfg.pr_max_iters:
        t0 = time.perf_counter()
        outs = [
            list(
                _pr_scatter.options(num_returns=P + 1).remote(
                    csr[p], vid_refs[p], score_refs[p], outdeg[p], P
                )
            )
            for p in range(P)
        ]
        dangling_total = float(sum(ray.get([o[P] for o in outs])))
        comb = [
            _pr_combine.remote(
                vid_refs[q],
                score_refs[q],
                n,
                cfg.pr_damping,
                dangling_total,
                *[outs[p][q] for p in range(P)],
            )
            for q in range(P)
        ]
        score_refs = [c[0] for c in comb]
        l1 = float(sum(ray.get([c[1] for c in comb])))
        it += 1
        wall = time.perf_counter() - t0
        metrics.append(
            {
                "iter": it,
                "l1": l1,
                "edges": n_edges,
                "wall_s": wall,
                "edges_per_sec": n_edges / wall if wall > 0 else 0.0,
            }
        )
        if checkpoint is not None and (it % cfg.checkpoint_every == 0 or l1 < cfg.pr_tol):
            checkpoint.save_shards(it, vid_refs, score_refs, extra=metrics[-1])
        if l1 < cfg.pr_tol:
            break

    import ray.data as rd

    scores_ds = rd.from_arrow_refs(
        [_shard_table.remote(vid_refs[p], score_refs[p]) for p in range(P)]
    )
    return PRResult(scores=scores_ds, iterations=it - start_iter, metrics=metrics)
