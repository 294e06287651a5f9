"""HITS hubs & authorities (fixed-iteration, L1-normalized) on the DIRECTED
edge graph.

Per iteration (Kleinberg's mutual reinforcement):

    auth(v) ← Σ_{(u,v)∈E} hub(u)   then auth ← auth / Σ auth
    hub(u)  ← Σ_{(u,v)∈E} auth(v)  then hub  ← hub  / Σ hub

The auth step is exactly the PageRank scatter shape over the forward
directed CSR (gather hub at src, sum-reduce by dst); the hub step is the
same wave over the REVERSED CSR. Both bundles share one hash(vid) vertex
partitioning (original int64 domain), so the two state vectors stay
aligned to the same per-partition vid arrays and no re-alignment exchange
is needed between half-steps. Normalizers are P partial sums reduced on
the driver — one scalar sync per half-iteration, the same cost PageRank
pays for its convergence check.

Fixed iteration count (no tolerance loop) makes the operator an exact
linear-algebra twin of an unrolled SQL oracle — the pagerank_fixed
precedent (queries.py): float64 sums differ only by association order,
measured ≤1e-15 relative, and rounding to 10 decimals hashes identically.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    as_piece_list,
    apply_combine_plan,
    combine_plans,
    l1_delta as _l1_delta,
    reduce_routed,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@ray.remote
def _ones(vids):
    return np.ones(len(vids), np.float64)


@ray.remote
def _hits_scatter_g(plan, state):
    """Grouped mode: one object of P value pieces; combiners slice."""
    if plan["n_edges"] == 0:
        return reduce_routed(plan, np.empty(0, np.float64), np.add)
    return reduce_routed(plan, state[plan["edge_src_idx"]], np.add)


@ray.remote
def _hits_scatter_f(plan, state, P):
    if plan["n_edges"] == 0:
        out = reduce_routed(plan, np.empty(0, np.float64), np.add)
    else:
        out = reduce_routed(plan, state[plan["edge_src_idx"]], np.add)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=2)
def _hits_combine(q, grouped, cplan, vids, *msg_objs):
    """Sum-combine into a zero base (a vertex with no in-edges scores 0 —
    HITS has no teleport/self mass). Returns (unnormalized vector, its sum)."""
    out = np.zeros(len(vids), np.float64)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        out[pos] = red
    return out, float(out.sum())


@ray.remote
def _scale(x, s):
    return x / s


@ray.remote
def _hits_table(vids, auth, hub, round_to):
    import pyarrow as pa

    return pa.table(
        {
            "vid": pa.array(vids),
            "auth": pa.array(np.round(auth, round_to)),
            "hub": pa.array(np.round(hub, round_to)),
        }
    )


_pieces = as_piece_list


def _wave(state, plans, cplans, vids, P, grouped):
    if grouped:
        outs = [_hits_scatter_g.remote(plans[p], state[p]) for p in range(P)]
        comb = [
            _hits_combine.remote(q, True, cplans[q], vids[q], *outs) for q in range(P)
        ]
    else:
        outs = [
            _pieces(_hits_scatter_f.options(num_returns=P).remote(plans[p], state[p], P), P)
            for p in range(P)
        ]
        comb = [
            _hits_combine.remote(
                q, False, cplans[q], vids[q], *[outs[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
    vec = [c[0] for c in comb]
    total = float(sum(ray.get([c[1] for c in comb])))
    if total == 0.0:  # edgeless graph: keep zeros rather than dividing by 0
        return vec
    return [_scale.remote(vec[p], total) for p in range(P)]


def _hits_run(edges, vertices, cfg, round_to, *, iterations=None, tol=None,
              max_iters=None):
    """Shared driver: fixed-count (``iterations``) or run-to-convergence
    (``tol``/``max_iters``; stop when BOTH normalized vectors' L1 deltas
    drop below tol — the per-iteration sync is 2P scalars, the same cost
    pagerank_bsp pays)."""
    import pyarrow as pa

    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    csr_f = shard_edges_csr(edges, P, symmetrize=False, dedupe=True, drop_self=True)

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("dst"), "dst": batch.column("src")})

    csr_r = shard_edges_csr(
        edges.map_batches(swap, batch_format="pyarrow"), P,
        symmetrize=False, dedupe=True, drop_self=True,
    )
    vids = shard_vertices(edges, P, vertices_ds=vertices)
    plans_f = scatter_plans(csr_f, vids, P)
    cplans_f = combine_plans(vids, plans_f, P)
    plans_r = scatter_plans(csr_r, vids, P)
    cplans_r = combine_plans(vids, plans_r, P)

    hub = [_ones.remote(vids[p]) for p in range(P)]
    auth = hub
    it = 0
    while True:
        auth_old, hub_old = auth, hub
        auth = _wave(hub, plans_f, cplans_f, vids, P, grouped)
        hub = _wave(auth, plans_r, cplans_r, vids, P, grouped)
        it += 1
        if iterations is not None:
            if it >= iterations:
                break
        else:
            deltas = ray.get(
                [_l1_delta.remote(auth[p], auth_old[p]) for p in range(P)]
                + [_l1_delta.remote(hub[p], hub_old[p]) for p in range(P)]
            )
            l1 = max(sum(deltas[:P]), sum(deltas[P:]))
            if l1 < tol or it >= max_iters:
                break

    tables = [_hits_table.remote(vids[p], auth[p], hub[p], round_to) for p in range(P)]
    return rd.from_arrow_refs(tables), it


def hits_fixed(
    edges,
    *,
    iterations: int = 12,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """(vid, auth, hub) after exactly ``iterations`` L1-normalized HITS
    rounds on the directed (deduped, loop-free) graph of ``edges``;
    hub starts at 1.0 per vertex. Scores rounded to ``round_to``."""
    ds, _ = _hits_run(edges, vertices, cfg, round_to, iterations=iterations)
    return ds


def hits_converged(
    edges,
    *,
    tol: float = 1e-10,
    max_iters: int = 100,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """Run-to-convergence HITS: iterate until both the auth and hub L1
    deltas fall below ``tol`` (or ``max_iters``). Returns
    ((vid, auth, hub) Dataset, iterations run) — the tol twin of
    hits_fixed, mirroring pagerank_bsp's convergence contract."""
    return _hits_run(
        edges, vertices, cfg, round_to, tol=tol, max_iters=max_iters
    )


@ray.remote(num_returns=2)
def _eig_combine(q, grouped, cplan, x, *msg_objs):
    """(A x + x) combine: neighbor sums plus the +I shift term. The shift
    makes the iteration aperiodic, so it converges to the Perron vector of
    A even on BIPARTITE graphs (plain A-power iteration oscillates there,
    and iterating A² — e.g. running HITS on a symmetric graph — converges
    to a +λ/−λ eigenvector MIXTURE, not the Perron vector; A+I has the
    same eigenvectors as A with eigenvalues shifted +1, so its dominant
    eigenvector is exactly A's Perron vector)."""
    out = x.copy()
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    pos, red = apply_combine_plan(cplan, pieces, np.add)
    if pos.size:
        out[pos] += red
    return out, float(out.sum())


@ray.remote
def _uniform(vids, n):
    return np.full(len(vids), 1.0 / n if n else 0.0, np.float64)


@ray.remote
def _vid_len(vids) -> int:
    return len(vids)


@ray.remote
def _eig_table(vids, x, round_to):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "score": pa.array(np.round(x, round_to))})


def eigenvector_centrality(
    edges,
    *,
    tol: float = 1e-10,
    max_iters: int = 100,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """Eigenvector centrality of the UNDIRECTED simple graph: SHIFTED power
    iteration x ← L1-normalize((A + I) x) from a uniform start — converges
    to the Perron vector of A on any connected non-trivial graph,
    including bipartite ones (see _eig_combine). Components with a smaller
    spectral radius decay to 0, as with any power method. Returns
    ((vid, score) Dataset, iterations run); numpy twin:
    oracle.eigenvector_oracle. Edgeless vertices keep the uniform mass
    (A x = 0 ⇒ x is a fixpoint)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vids = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vids, P)
    cplans = combine_plans(vids, plans, P)

    n = int(sum(ray.get([_vid_len.remote(v) for v in vids])))
    x = [_uniform.remote(vids[p], n) for p in range(P)]
    it = 0
    while True:
        old = x
        if grouped:
            outs = [_hits_scatter_g.remote(plans[p], x[p]) for p in range(P)]
            comb = [
                _eig_combine.remote(q, True, cplans[q], x[q], *outs) for q in range(P)
            ]
        else:
            outs = [
                _pieces(
                    _hits_scatter_f.options(num_returns=P).remote(plans[p], x[p], P), P
                )
                for p in range(P)
            ]
            comb = [
                _eig_combine.remote(
                    q, False, cplans[q], x[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        vec = [c[0] for c in comb]
        total = float(sum(ray.get([c[1] for c in comb])))
        x = vec if total == 0.0 else [_scale.remote(vec[p], total) for p in range(P)]
        it += 1
        l1 = sum(ray.get([_l1_delta.remote(x[p], old[p]) for p in range(P)]))
        if l1 < tol or it >= max_iters:
            break

    tables = [_eig_table.remote(vids[p], x[p], round_to) for p in range(P)]
    return rd.from_arrow_refs(tables), it
