"""Source-sampled betweenness centrality (batched Brandes) over the BSP shards.

ALL S seeds run as ONE batch: per-shard state is (n_local, S) matrices
(dist int64, sigma/delta float64), and every level-synchronous wave ships
one (frontier rows × S) message matrix through the sparse exchange instead
of S separate scalar waves. The per-wave fixed floor (task dispatch +
plasma round trip, ~0.1 s measured on this host) is the dominant cost of
Brandes at transcript scale — batching amortizes it across seeds, so the
wall is ~max_s ecc(s) waves per phase, not Σ_s ecc(s).

forward (BFS + path counts): wave t ships, from the union frontier
    (any seed at level t-1), the per-seed masked sigma columns
    (sigma[u,j] where dist[u,j]==t-1, else 0); a vertex v first reached at
    level t for seed j (dist[v,j]==UNREACHED and an incoming sum > 0 —
    sigma is ≥1 along genuine paths, so a positive sum certifies a real
    message) gets dist[v,j]=t and sigma[v,j] = Σ sigma(pred).
backward (dependency accumulation): for l = L..1 (L = max seed ecc),
    level-l columns ship (1 + delta)/sigma; a vertex at level l-1 for
    seed j accumulates delta[v,j] += sigma[v,j] · Σ incoming[j]. Columns
    of seeds with ecc < l are all-zero and cost nothing but their width.

betweenness(v) = Σ_j delta_j(v), seeds excluded from their own sums
(Brandes: w != s; multiply by n/|S| for the scaled estimate, halve for the
undirected pair convention — returned raw so the numpy oracle comparison
is convention-free). sigma/delta are float64: path counts overflow int64
on dense graphs, and the oracle uses the identical float formula.

The seed SAMPLE is small by contract (centrality estimation; ≤64 enforced)
— per-seed state is three O(V·S/P) matrices per shard and S tiny align
exchanges at setup, never a driver-side data path. Generalizes the
reference's per-component aggregation passes (ccl_marker_stack.py:986-1010)
to a path-based per-vertex statistic the raster engine has no analog for.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import as_piece_list, reduce_routed_sparse

_UNREACHED = np.int64(1) << np.int64(62)
_MAX_SEEDS = 64


@ray.remote
def _stack_cols(*cols):
    """S per-seed aligned vectors → one (n_local, S) matrix."""
    return np.column_stack(cols)


@ray.remote
def _frontier_any(dist, level):
    """Union frontier: rows where ANY seed sits at ``level``."""
    return (dist == level).any(axis=1)


@ray.remote
def _fw_msgs(dist, sigma, level):
    """Per-seed masked sigma columns for the forward wave."""
    return np.where(dist == level, sigma, 0.0)


@ray.remote
def _scatter_g(plan, msgs, frontier, P):
    return reduce_routed_sparse(plan, msgs, frontier, np.add, P)


@ray.remote
def _scatter_f(plan, msgs, frontier, P):
    out = reduce_routed_sparse(plan, msgs, frontier, np.add, P)
    return out[0] if P == 1 else tuple(out)


def _gather_pieces(q, grouped, msgs):
    pieces = [m[q] for m in msgs] if grouped else list(msgs)
    ids = [p[0] for p in pieces if len(p[0])]
    if not ids:
        return None, None
    d = np.concatenate(ids)
    v = np.concatenate([p[1] for p in pieces if len(p[0])], axis=0)
    return d, v


def _reduce_by_pos(vids, d, v):
    idx = np.searchsorted(vids, d)
    order = np.argsort(idx, kind="stable")
    idx, v = idx[order], v[order]
    newb = np.empty(len(idx), dtype=bool)
    newb[0] = True
    newb[1:] = idx[1:] != idx[:-1]
    starts = np.nonzero(newb)[0]
    return idx[starts], np.add.reduceat(v, starts, axis=0)

@ray.remote(num_returns=3)
def _fw_combine(q, grouped, vids, dist, sigma, t, *msgs):
    """Accept sigma sums per (vertex, seed) ONLY where not yet reached for
    that seed AND the sum is positive (a genuine message) → dist=t."""
    d, v = _gather_pieces(q, grouped, msgs)
    if d is None:
        return dist, sigma, 0
    pos, red = _reduce_by_pos(vids, d, v)
    acc = (dist[pos] == _UNREACHED) & (red > 0)
    if not acc.any():
        return dist, sigma, 0
    new_dist = dist.copy()
    new_sigma = sigma.copy()
    nd, ns = new_dist[pos], new_sigma[pos]
    nd[acc] = t
    ns[acc] = red[acc]
    new_dist[pos] = nd
    new_sigma[pos] = ns
    return new_dist, new_sigma, int(acc.sum())


@ray.remote
def _bw_msgs(dist, sigma, delta, level):
    """Per-seed outgoing values for the level-l backward wave:
    (1 + delta)/sigma at level-l entries (sigma > 0 wherever dist is
    finite by construction), 0 elsewhere."""
    out = np.zeros(dist.shape, np.float64)
    m = dist == level
    if m.any():
        out[m] = (1.0 + delta[m]) / sigma[m]
    return out


@ray.remote
def _bw_combine(q, grouped, vids, dist, sigma, delta, level, *msgs):
    """delta[v,j] += sigma[v,j] · Σ incoming[j], finalized at v's level l-1
    for seed j (other seeds' columns receive only zeros there)."""
    d, v = _gather_pieces(q, grouped, msgs)
    if d is None:
        return delta
    pos, red = _reduce_by_pos(vids, d, v)
    m = dist[pos] == level - 1
    if not m.any():
        return delta
    new = delta.copy()
    nd = new[pos]
    nd[m] = nd[m] + sigma[pos][m] * red[m]
    new[pos] = nd
    return new


@ray.remote
def _finish_bc(dist, delta):
    """Σ over seeds, each seed excluded from its own sum (dist==0)."""
    return np.where(dist == 0, 0.0, delta).sum(axis=1)


@ray.remote
def _max_finite_cols(dist):
    """Per-seed max finite level in this shard → (S,) int64."""
    return np.where(dist < _UNREACHED, dist, -1).max(axis=0, initial=0)


@ray.remote
def _bc_table(vids, bc, round_to):
    import pyarrow as pa

    return pa.table(
        {
            "vid": pa.array(vids),
            "betweenness": pa.array(np.round(bc, round_to)),
        }
    )


def _make_wave(plans, grouped: bool, P: int):
    """The one exchange shape both Brandes phases (and the forward-only
    path-count variant) run: scatter per-shard message matrices along the
    plan, route by destination owner, hand each owner's pieces to
    ``combine``."""

    def _wave(state_msgs, frontier, combine, extra):
        if grouped:
            outs = [
                _scatter_g.remote(plans[p], state_msgs[p], frontier[p], P)
                for p in range(P)
            ]
            return [combine(q, True, outs, extra) for q in range(P)]
        outs = [
            as_piece_list(
                _scatter_f.options(num_returns=P).remote(
                    plans[p], state_msgs[p], frontier[p], P
                ),
                P,
            )
            for p in range(P)
        ]
        return [
            combine(q, False, [outs[p][q] for p in range(P)], extra)
            for q in range(P)
        ]

    return _wave


def _forward_phase(_wave, vid_refs, dist, sigma, P: int, max_rounds: int):
    """Level-synchronous BFS carrying per-seed path counts; returns the
    converged (dist, sigma) shard lists."""
    t = 1
    while True:
        fr = [_frontier_any.remote(dist[p], t - 1) for p in range(P)]
        mv = [_fw_msgs.remote(dist[p], sigma[p], t - 1) for p in range(P)]

        def fw(q, g, outs, tt):
            return _fw_combine.remote(
                q, g, vid_refs[q], dist[q], sigma[q], tt, *outs
            )

        comb = _wave(mv, fr, fw, t)
        dist = [c[0] for c in comb]
        sigma = [c[1] for c in comb]
        n_new = int(sum(ray.get([c[2] for c in comb])))
        if n_new == 0:
            return dist, sigma
        t += 1
        if t > max_rounds:
            raise AssertionError(
                f"Brandes forward phase exceeded max_rounds={max_rounds}"
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

    # per-seed aligned init columns (S tiny exchanges), stacked per shard
    dist_cols: list[list] = [[] for _ in range(P)]
    sigma_cols: list[list] = [[] for _ in range(P)]
    for sv in seed_vids:
        seed_ds = rd.from_items([{"vid": int(sv)}])
        dcol = align_vertex_values(
            shards, seed_ds, value_col=None, default_weight=0,
            default=int(_UNREACHED), combine="min", dtype=np.int64,
        )
        scol = align_vertex_values(
            shards, seed_ds, value_col=None, default_weight=1.0,
            default=0.0, combine="add", dtype=np.float64,
        )
        for p in range(P):
            dist_cols[p].append(dcol[p])
            sigma_cols[p].append(scol[p])
    dist = [_stack_cols.remote(*dist_cols[p]) for p in range(P)]
    sigma = [_stack_cols.remote(*sigma_cols[p]) for p in range(P)]

    _wave = _make_wave(plans, grouped, P)
    dist, sigma = _forward_phase(_wave, vid_refs, dist, sigma, P, max_rounds)
    per_seed = np.maximum.reduce(ray.get([_max_finite_cols.remote(d) for d in dist]))
    levels_per_seed = [int(x) for x in per_seed]
    L = int(per_seed.max()) if len(per_seed) else 0

    # backward: one wave per level, deepest first, all seeds at once
    delta = [
        _stack_cols.remote(*[_zeros_like_f8.remote(vid_refs[p])] * len(seed_vids))
        for p in range(P)
    ]
    for lvl in range(L, 0, -1):
        fr = [_frontier_any.remote(dist[p], lvl) for p in range(P)]
        mv = [_bw_msgs.remote(dist[p], sigma[p], delta[p], lvl) for p in range(P)]

        def bw(q, g, outs, ll):
            return _bw_combine.remote(
                q, g, vid_refs[q], dist[q], sigma[q], delta[q], ll, *outs
            )

        delta = _wave(mv, fr, bw, lvl)
    bc = [_finish_bc.remote(dist[p], delta[p]) for p in range(P)]

    if shards.get("dense") is not None:
        from ccl_ray.state.dense import translate_shard_tables

        bc = [_round_vals.remote(bc[p], round_to) for p in range(P)]
        tables = translate_shard_tables(
            shards["dense"], vid_refs, bc, value_is_dense=False,
            value_col="betweenness",
        )
    else:
        tables = [_bc_table.remote(vid_refs[p], bc[p], round_to) for p in range(P)]
    return rd.from_arrow_refs(tables), levels_per_seed


@ray.remote
def _paths_int64(sigma):
    """(n, 1) float64 sigma column → int64 path counts (0 = unreachable).

    Float64 accumulation is exact for integer-valued sums below 2^53;
    asserted so an overflowing graph fails loudly instead of rounding."""
    s = sigma[:, 0]
    assert float(s.max(initial=0.0)) < 2.0**53, "path counts exceed exact float64 range"
    return s.astype(np.int64)


def shortest_path_counts(
    edges,
    seeds,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    shards: dict | None = None,
    max_rounds: int = 64,
):
    """(vid, paths) Dataset: the number of distinct shortest paths from the
    seed SET to each vertex (multi-source Brandes forward pass — every seed
    starts at level 0 with one trivial path; a vertex first reached at
    level t sums the path counts of its level-(t-1) predecessors).
    paths = 0 marks vertices unreachable from every seed.

    ``seeds``: Dataset with ``vid`` in the original domain (never
    materialized on the driver). One S=1 column through the identical
    batched-Brandes machinery, so the wave cost is the forward half of one
    betweenness seed regardless of |seeds|."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, P, vertices_ds=vertices, symmetrize=True, dense=cfg.dense_ids
        )
    assert shards["P"] == P and shards["symmetrize"]
    vid_refs, plans = shards["vids"], shards["plans"]

    from ccl_ray.state.align import align_vertex_values

    dcol = align_vertex_values(
        shards, seeds, value_col=None, default_weight=0,
        default=int(_UNREACHED), combine="min", dtype=np.int64,
    )
    scol = align_vertex_values(
        shards, seeds, value_col=None, default_weight=1.0,
        default=0.0, combine="max", dtype=np.float64,
    )
    dist = [_stack_cols.remote(dcol[p]) for p in range(P)]
    sigma = [_stack_cols.remote(scol[p]) for p in range(P)]

    _wave = _make_wave(plans, grouped, P)
    dist, sigma = _forward_phase(_wave, vid_refs, dist, sigma, P, max_rounds)
    paths = [_paths_int64.remote(sigma[p]) for p in range(P)]

    if shards.get("dense") is not None:
        from ccl_ray.state.dense import translate_shard_tables

        tables = translate_shard_tables(
            shards["dense"], vid_refs, paths, value_is_dense=False,
            value_col="paths",
        )
    else:
        tables = [_paths_table.remote(vid_refs[p], paths[p]) for p in range(P)]
    return rd.from_arrow_refs(tables)


@ray.remote
def _paths_table(vids, paths):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "paths": pa.array(paths)})


@ray.remote
def _zeros_like_f8(vids):
    return np.zeros(len(vids), np.float64)


@ray.remote
def _round_vals(v, round_to):
    return np.round(v, round_to)
