"""Source-sampled betweenness centrality (Brandes) over the BSP shard engine.

For each seed s the two Brandes phases run as level-synchronous waves over
the SAME precomputed shard plans every other BSP stage uses:

forward (BFS + path counts): level t ships sigma from the level-(t-1)
    frontier through the sparse exchange (O(frontier edges), never O(E));
    a vertex first reached at level t gets dist=t and
    sigma = Σ sigma(pred). Frontier = one BFS level, so the sparse path is
    exactly right — the dense exchange never runs.
backward (dependency accumulation): for l = L..1, level-l vertices ship
    (1 + delta(w)) / sigma(w); a level-(l-1) vertex v accumulates
    delta(v) = sigma(v) · Σ incoming — each vertex's delta is finalized in
    the single round for its level, so ecc(s) rounds per phase total.

betweenness(v) = Σ_s delta_s(v) over the seed sample, seeds excluded from
their own sums (Brandes' source-sampled estimator; multiply by n/|S| for
the scaled estimate, halve for the undirected pair convention — returned
raw so the numpy oracle comparison is convention-free). sigma/delta are
float64: path counts overflow int64 on dense graphs, and the oracle uses
the identical float formula.

The seed SAMPLE is small by contract (centrality estimation; ≤64 enforced)
— per-seed state is three O(V/P) arrays per shard and one tiny align
exchange, never a driver-side data path. Generalizes the reference's
per-component aggregation passes (ccl_marker_stack.py:986-1010) to a
path-based per-vertex statistic the raster engine has no analog for.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import as_piece_list, reduce_routed_sparse

_UNREACHED = np.int64(1) << np.int64(62)
_MAX_SEEDS = 64


@ray.remote
def _frontier(dist, level):
    return dist == level


@ray.remote
def _fw_scatter_g(plan, sigma, frontier, P):
    return reduce_routed_sparse(plan, sigma, frontier, np.add, P)


@ray.remote
def _fw_scatter_f(plan, sigma, frontier, P):
    out = reduce_routed_sparse(plan, sigma, frontier, np.add, P)
    return out[0] if P == 1 else tuple(out)


def _gather_pieces(q, grouped, msgs):
    pieces = [m[q] for m in msgs] if grouped else list(msgs)
    ids = [p[0] for p in pieces if len(p[0])]
    if not ids:
        return None, None
    d = np.concatenate(ids)
    v = np.concatenate([p[1] for p in pieces if len(p[0])])
    return d, v


def _reduce_by_pos(vids, d, v):
    idx = np.searchsorted(vids, d)
    order = np.argsort(idx, kind="stable")
    idx, v = idx[order], v[order]
    newb = np.empty(len(idx), dtype=bool)
    newb[0] = True
    newb[1:] = idx[1:] != idx[:-1]
    starts = np.nonzero(newb)[0]
    return idx[starts], np.add.reduceat(v, starts)


@ray.remote(num_returns=3)
def _fw_combine(q, grouped, vids, dist, sigma, t, *msgs):
    """Accept sigma sums ONLY at vertices not yet reached → dist=t."""
    d, v = _gather_pieces(q, grouped, msgs)
    if d is None:
        return dist, sigma, 0
    pos, red = _reduce_by_pos(vids, d, v)
    mask = dist[pos] == _UNREACHED
    if not mask.any():
        return dist, sigma, 0
    pos, red = pos[mask], red[mask]
    new_dist = dist.copy()
    new_sigma = sigma.copy()
    new_dist[pos] = t
    new_sigma[pos] = red
    return new_dist, new_sigma, int(len(pos))


@ray.remote
def _bw_msgs(dist, sigma, delta, level):
    """Per-vertex outgoing value for the level-l backward wave:
    (1 + delta)/sigma at level-l vertices (sigma > 0 wherever dist is
    finite by construction), 0 elsewhere (masked out by the frontier)."""
    out = np.zeros(len(dist), np.float64)
    m = dist == level
    if m.any():
        out[m] = (1.0 + delta[m]) / sigma[m]
    return out


@ray.remote
def _bw_scatter_g(plan, msgs_val, frontier, P):
    return reduce_routed_sparse(plan, msgs_val, frontier, np.add, P)


@ray.remote
def _bw_scatter_f(plan, msgs_val, frontier, P):
    out = reduce_routed_sparse(plan, msgs_val, frontier, np.add, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _bw_combine(q, grouped, vids, dist, sigma, delta, level, *msgs):
    """delta(v) = sigma(v) · Σ incoming, finalized at v's own level l-1."""
    d, v = _gather_pieces(q, grouped, msgs)
    if d is None:
        return delta
    pos, red = _reduce_by_pos(vids, d, v)
    mask = dist[pos] == level - 1
    if not mask.any():
        return delta
    pos, red = pos[mask], red[mask]
    new = delta.copy()
    new[pos] = new[pos] + sigma[pos] * red
    return new


@ray.remote
def _acc_bc(bc, delta, dist):
    """Accumulate this seed's dependencies; the seed itself (dist==0)
    contributes nothing to its own sum (Brandes: w != s)."""
    add = np.where(dist == 0, 0.0, delta)
    return bc + add if bc is not None else add


@ray.remote
def _zeros_like_f8(vids):
    return np.zeros(len(vids), np.float64)


@ray.remote
def _max_finite(dist) -> int:
    m = dist[dist < _UNREACHED]
    return int(m.max()) if m.size else 0


@ray.remote
def _bc_table(vids, bc, round_to):
    import pyarrow as pa

    return pa.table(
        {
            "vid": pa.array(vids),
            "betweenness": pa.array(np.round(bc, round_to)),
        }
    )


def betweenness_sample(
    edges,
    seed_vids: list[int],
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    shards: dict | None = None,
    max_rounds: int = 64,
    round_to: int = 6,
):
    """(vid, betweenness) Dataset + per-seed level counts.

    ``seed_vids``: explicit sample of source vertices (original domain,
    ≤64 — this is the sampled estimator; exact betweenness would pass every
    vertex and belongs on a cluster budget, not in one call).
    """
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    assert 0 < len(seed_vids) <= _MAX_SEEDS, "pass 1..64 sampled seed vids"
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, P, vertices_ds=vertices, symmetrize=True, dense=cfg.dense_ids
        )
    assert shards["P"] == P and shards["symmetrize"]
    vid_refs, plans = shards["vids"], shards["plans"]

    from ccl_ray.state.align import align_vertex_values

    bc = [None] * P
    levels_per_seed: list[int] = []
    for sv in seed_vids:
        seed_ds = rd.from_items([{"vid": int(sv)}])
        dist = align_vertex_values(
            shards, seed_ds, value_col=None, default_weight=0,
            default=int(_UNREACHED), combine="min", dtype=np.int64,
        )
        sigma = align_vertex_values(
            shards, seed_ds, value_col=None, default_weight=1.0,
            default=0.0, combine="add", dtype=np.float64,
        )
        # forward: level-synchronous BFS carrying path counts
        t = 1
        while True:
            fr = [_frontier.remote(dist[p], t - 1) for p in range(P)]
            if grouped:
                outs = [
                    _fw_scatter_g.remote(plans[p], sigma[p], fr[p], P) for p in range(P)
                ]
                comb = [
                    _fw_combine.remote(q, True, vid_refs[q], dist[q], sigma[q], t, *outs)
                    for q in range(P)
                ]
            else:
                outs = [
                    as_piece_list(
                        _fw_scatter_f.options(num_returns=P).remote(
                            plans[p], sigma[p], fr[p], P
                        ),
                        P,
                    )
                    for p in range(P)
                ]
                comb = [
                    _fw_combine.remote(
                        q, False, vid_refs[q], dist[q], sigma[q], t,
                        *[outs[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
            dist = [c[0] for c in comb]
            sigma = [c[1] for c in comb]
            n_new = int(sum(ray.get([c[2] for c in comb])))
            if n_new == 0:
                break
            t += 1
            if t > max_rounds:
                raise AssertionError(
                    f"betweenness forward phase exceeded max_rounds={max_rounds}"
                )
        L = max(ray.get([_max_finite.remote(d) for d in dist]))

        # backward: one wave per level, deepest first
        delta = [_zeros_like_f8.remote(vid_refs[p]) for p in range(P)]
        for lvl in range(L, 0, -1):
            fr = [_frontier.remote(dist[p], lvl) for p in range(P)]
            mv = [
                _bw_msgs.remote(dist[p], sigma[p], delta[p], lvl) for p in range(P)
            ]
            if grouped:
                outs = [
                    _bw_scatter_g.remote(plans[p], mv[p], fr[p], P) for p in range(P)
                ]
                delta = [
                    _bw_combine.remote(
                        q, True, vid_refs[q], dist[q], sigma[q], delta[q], lvl, *outs
                    )
                    for q in range(P)
                ]
            else:
                outs = [
                    as_piece_list(
                        _bw_scatter_f.options(num_returns=P).remote(plans[p], mv[p], fr[p], P),
                        P,
                    )
                    for p in range(P)
                ]
                delta = [
                    _bw_combine.remote(
                        q, False, vid_refs[q], dist[q], sigma[q], delta[q], lvl,
                        *[outs[p][q] for p in range(P)]
                    )
                    for q in range(P)
                ]
        bc = [_acc_bc.remote(bc[p], delta[p], dist[p]) for p in range(P)]
        levels_per_seed.append(L)

    if shards.get("dense") is not None:
        from ccl_ray.state.dense import translate_shard_tables

        # round AFTER translation? translation passes values through; round
        # inside the table builder is not available there, so round first
        bc = [
            _round_vals.remote(bc[p], round_to) for p in range(P)
        ]
        tables = translate_shard_tables(
            shards["dense"], vid_refs, bc, value_is_dense=False,
            value_col="betweenness",
        )
    else:
        tables = [_bc_table.remote(vid_refs[p], bc[p], round_to) for p in range(P)]
    return rd.from_arrow_refs(tables), levels_per_seed


@ray.remote
def _round_vals(v, round_to):
    return np.round(v, round_to)
