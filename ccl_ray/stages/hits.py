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
def _l1_delta(new, old) -> float:
    return float(np.abs(new - old).sum())


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


def eigenvector_centrality(
    edges,
    *,
    tol: float = 1e-10,
    max_iters: int = 100,
    vertices=None,
    cfg: EngineConfig | None = None,
    round_to: int = 10,
):
    """Power-iteration eigenvector centrality of the UNDIRECTED graph:
    symmetrize the edge table, then run the converged HITS driver — with a
    symmetric adjacency the two half-steps are one application of A² with
    L1 normalization, so auth == hub == the principal eigenvector
    (Perron vector; components with a smaller spectral radius decay to 0,
    same as any power iteration from a uniform start). Returns
    ((vid, score) Dataset, iterations run); the numpy twin is
    oracle.hits_oracle on the symmetrized pairs."""
    import pyarrow as pa

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        d = batch.column("dst")
        return pa.table(
            {
                "src": pa.chunked_array([s, d]).combine_chunks(),
                "dst": pa.chunked_array([d, s]).combine_chunks(),
            }
        )

    sym = edges.select_columns(["src", "dst"]).map_batches(both, batch_format="pyarrow")
    ds, iters = _hits_run(
        sym, vertices, cfg, round_to, tol=tol, max_iters=max_iters
    )

    def score(batch: pa.Table) -> pa.Table:
        return pa.table({"vid": batch.column("vid"), "score": batch.column("auth")})

    return ds.map_batches(score, batch_format="pyarrow"), iters
