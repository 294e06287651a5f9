"""Katz centrality: x ← α·A·x + β·1 to an L1 fixpoint.

The attenuation α must satisfy α·λ_max < 1 or the series diverges; since
λ_max ≤ max degree for an undirected graph, the default picks
α = damping / max_degree (damping < 1) from the graph itself — the same
integer max degree is computable by the numpy twin, so both sides run the
identical recurrence. Unlike eigenvector centrality there is no per-round
normalization; the fixpoint is x* = β (I − αA)⁻¹ 1.

Same BSP shape as the other spectral loops (hits.py): one-time
scatter/combine plans, per-round value-only exchange of Σ_nbr x, 2P-scalar
convergence sync (per-shard L1 deltas).
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.stages.hits import _hits_scatter_f, _hits_scatter_g
from ccl_ray.state.shards import (
    apply_combine_plan,
    as_piece_list,
    combine_plans,
    l1_delta,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@ray.remote
def _zeros(vids):
    return np.zeros(len(vids), np.float64)


@ray.remote
def _max_outdeg(csr) -> int:
    return int(csr["outdeg"].max()) if csr["outdeg"].size else 0


@ray.remote(num_returns=2)
def _katz_combine(q, grouped, cplan, x, alpha, beta, *msg_objs):
    """(new x = α·(Ax) + β, L1 delta vs the previous x)."""
    out = np.full(len(x), beta, np.float64)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        out[pos] += alpha * red
    return out, float(np.abs(out - x).sum())


@ray.remote
def _katz_table(vids, x, round_to):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "katz": pa.array(np.round(x, round_to))})


def katz_centrality(
    edges,
    *,
    damping: float = 0.5,
    beta: float = 1.0,
    tol: float = 1e-8,
    max_iters: int = 100,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """((vid, katz) Dataset, iterations, alpha) over the undirected simple
    graph of ``edges`` (deduped, loop-free). α = damping / max_degree
    (graph-derived, so α·λ_max ≤ damping < 1 — always convergent);
    isolated vertices hold x = β."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vids = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vids, P)
    cplans = combine_plans(vids, plans, P)

    max_deg = max(ray.get([_max_outdeg.remote(c) for c in csr]), default=0)
    alpha = damping / max_deg if max_deg else 0.0

    x = [_zeros.remote(vids[p]) for p in range(P)]
    it = 0
    while True:
        if grouped:
            outs = [_hits_scatter_g.remote(plans[p], x[p]) for p in range(P)]
            comb = [
                _katz_combine.remote(q, True, cplans[q], x[q], alpha, beta, *outs)
                for q in range(P)
            ]
        else:
            outs = [
                as_piece_list(
                    _hits_scatter_f.options(num_returns=P).remote(plans[p], x[p], P),
                    P,
                )
                for p in range(P)
            ]
            comb = [
                _katz_combine.remote(
                    q, False, cplans[q], x[q], alpha, beta,
                    *[outs[p][q] for p in range(P)],
                )
                for q in range(P)
            ]
        x = [c[0] for c in comb]
        it += 1
        delta = float(sum(ray.get([c[1] for c in comb])))
        if delta < tol or it >= max_iters:
            break

    tables = [_katz_table.remote(vids[p], x[p], round_to) for p in range(P)]
    return rd.from_arrow_refs(tables), it, alpha


def katz_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    vids: np.ndarray,
    *,
    damping: float = 0.5,
    beta: float = 1.0,
    tol: float = 1e-8,
    max_iters: int = 100,
) -> tuple[dict[int, float], int, float]:
    """Dense numpy twin — identical recurrence, α rule and stop test.
    Returns (scores, iters, alpha)."""
    vids = np.asarray(sorted(set(np.asarray(vids).tolist())), dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    pairs = set()
    for a, b in zip(src, dst):
        if a != b:
            pairs.add((idx[int(a)], idx[int(b)]))
            pairs.add((idx[int(b)], idx[int(a)]))
    s = np.array([p[0] for p in pairs], np.int64)
    d = np.array([p[1] for p in pairs], np.int64)
    deg = np.bincount(d, minlength=n) if len(d) else np.zeros(n, np.int64)
    max_deg = int(deg.max()) if n else 0
    alpha = damping / max_deg if max_deg else 0.0
    x = np.zeros(n, np.float64)
    it = 0
    while True:
        new = np.full(n, beta, np.float64)
        if len(s):
            new += alpha * np.bincount(d, weights=x[s], minlength=n)
        delta = np.abs(new - x).sum()
        x = new
        it += 1
        if delta < tol or it >= max_iters:
            break
    return {int(v): float(x[i]) for i, v in enumerate(vids)}, it, alpha
