"""BSP connected components over hash-partitioned CSR shards (default engine).

Semantics identical to ccl_ray.stages.cc (hash-to-min + pointer jumping,
canonical min-vid labels; see that module's docstring for the mapping onto
the reference's label algebra). Execution: edge shards + a per-shard
SCATTER PLAN (gather index, dst sort permutation, reduceat segments,
partition routing — all precomputed ONCE) are pinned in the object store;
each round is a wave of O(P) Ray tasks doing pure gather + reduceat +
slice — no sorting, hashing, or Python row loops in the loop.

Exchange modes (EngineConfig.exchange):
- "grouped" (default, single-node): each scatter task returns ONE object
  holding its P routed pieces; consumers read their piece zero-copy from
  the shared plasma store. O(P) objects per wave.
- "fanout" (multi-node): num_returns=P — each destination fetches only its
  own piece over the network. O(P^2) objects per wave; the right tradeoff
  when shards live on different machines and per-shard compute is large.
The routing split is identical in both; the mode only changes how pieces
are returned.

Convergence = zero label changes across propagate + jump waves (a handful
of scalars to the driver per round — never a full materialization).
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
    combine_plans,
    part_of,
    reduce_routed,
    reduce_routed_sparse,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)

# below this changed-vertex fraction a propagate round switches to the
# sparse (frontier) exchange: only messages from vertices whose label
# changed since their last send ship. Hash-to-min is min-monotone, so a
# clean vertex's message was already applied the round it last changed and
# can never win again — the shrinking tail of a CC run costs O(frontier)
# per round instead of O(E)
_SPARSE_FRAC = 0.10


@dataclass
class CCResult:
    labels: "object"              # ray.data.Dataset (vid:int64, label:int64)
    iterations: int
    metrics: list = field(default_factory=list)


_as_list = as_piece_list


# ----------------------------------------------------------------- tasks

@ray.remote
def _scatter_grouped(plan, labels, P):
    return reduce_routed(plan, labels[plan["edge_src_idx"]], np.minimum)


@ray.remote
def _scatter_fanout(plan, labels, P):
    out = reduce_routed(plan, labels[plan["edge_src_idx"]], np.minimum)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=3)
def _combine(q, grouped, cplan, labels, *msg_objs):
    """new_label[v] = min(old, candidates); returns (labels, n_changed, mask).

    Message pieces carry VALUES ONLY in the static routed layout; the
    combine plan holds the precomputed sort/segments/output positions."""
    if labels.size == 0:
        return labels, 0, np.zeros(0, dtype=bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new = labels.copy()
    pos, red = apply_combine_plan(cplan, pieces, np.minimum)
    if pos.size:
        new[pos] = np.minimum(new[pos], red)
    mask = new != labels
    return new, int(mask.sum()), mask


@ray.remote
def _scatter_sparse_g(plan, labels, dirty, P):
    return reduce_routed_sparse(plan, labels, dirty, np.minimum, P)


@ray.remote
def _scatter_sparse_f(plan, labels, dirty, P):
    out = reduce_routed_sparse(plan, labels, dirty, np.minimum, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=3)
def _combine_sparse(q, grouped, vids, labels, *msg_objs):
    if labels.size == 0:
        return labels, 0, np.zeros(0, dtype=bool)
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    new, mask = apply_sparse_pieces(vids, labels, pieces, np.minimum)
    return new, int(mask.sum()), mask


@ray.remote
def _all_dirty(vids):
    return np.ones(len(vids), dtype=bool)


@ray.remote
def _vid_len(vids) -> int:
    return len(vids)


def _route_unique(vals: np.ndarray, P: int) -> list:
    uniq = np.unique(vals)
    parts = part_of(uniq, P)
    order = np.argsort(parts, kind="stable")
    uniq = uniq[order]
    bounds = np.searchsorted(parts[order], np.arange(P + 1))
    return [uniq[bounds[p] : bounds[p + 1]] for p in range(P)]


@ray.remote
def _jump_request_g(labels, P):
    return _route_unique(labels, P)


@ray.remote
def _jump_request_f(labels, P):
    out = _route_unique(labels, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _jump_resolve_g(p, vids, labels, *req_objs):
    return [(q_arr, labels[np.searchsorted(vids, q_arr)]) for q_arr in (r[p] for r in req_objs)]


@ray.remote
def _jump_resolve_f(P, vids, labels, *req_pieces):
    out = [(q, labels[np.searchsorted(vids, q)]) for q in req_pieces]
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=3)
def _jump_apply(q, grouped, labels, acc_mask, *resp_objs):
    """Resolve labels through the jump map; accumulate the dirty mask.

    ``acc_mask`` (may be None) is the running changed-since-last-send mask
    for the sparse propagate; OR-ing the jump's changes into it here keeps
    the frontier bookkeeping free of extra task waves."""
    if labels.size == 0:
        return labels, 0, np.zeros(0, dtype=bool)
    pieces = [r[q] for r in resp_objs] if grouped else list(resp_objs)
    queries = np.concatenate([p[0] for p in pieces])
    resolved = np.concatenate([p[1] for p in pieces])
    order = np.argsort(queries, kind="stable")
    queries, resolved = queries[order], resolved[order]
    new = resolved[np.searchsorted(queries, labels)]
    mask = new != labels
    if acc_mask is not None:
        mask = mask | acc_mask
    return new, int((new != labels).sum()), mask


@ray.remote
def _init_labels(vids):
    return vids.copy()


@ray.remote
def _init_warm_labels(vids, *seed_pieces):
    """Warm-start init: label(v) = min(v, seed(v)).

    Seed invariant (caller's contract): every seed label must be the vid of
    some vertex in the same component as the seeded vertex — labels from a
    prior CC run over any SUBSET of the current edge set satisfy this, since
    old components are contained in new ones. Seeds for vids no longer in
    the graph are dropped (stale vertices from a prior run are harmless).
    """
    lab = vids.copy()
    for v, s in seed_pieces:
        if v.size:
            idx = np.searchsorted(vids, v)
            ok = idx < len(vids)
            ok[ok] = vids[idx[ok]] == v[ok]
            np.minimum.at(lab, idx[ok], s[ok])
    return lab


@ray.remote
def _shard_table(vids, labels):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "label": pa.array(labels)})


@ray.remote
def _plan_edges(plan):
    return plan["n_edges"]


# ----------------------------------------------------------------- waves

def propagate_wave(plans, cplans, label_refs, P, grouped, *, vid_refs=None, dirty_refs=None):
    """One hash-to-min round → (labels, changed_refs, mask_refs).

    ``dirty_refs`` not None selects the sparse (frontier) exchange: only
    messages from dirty vertices ship, as (dst_ids, values) pieces resolved
    against ``vid_refs`` (required then) instead of the static routed
    layout. mask_refs is per-shard changed-this-round (bool), the next
    round's frontier."""
    if dirty_refs is not None:
        if grouped:
            outs = [
                _scatter_sparse_g.remote(plans[p], label_refs[p], dirty_refs[p], P)
                for p in range(P)
            ]
            comb = [
                _combine_sparse.remote(q, True, vid_refs[q], label_refs[q], *outs)
                for q in range(P)
            ]
        else:
            outs = [
                _as_list(
                    _scatter_sparse_f.options(num_returns=P).remote(
                        plans[p], label_refs[p], dirty_refs[p], P
                    ),
                    P,
                )
                for p in range(P)
            ]
            comb = [
                _combine_sparse.remote(
                    q, False, vid_refs[q], label_refs[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
    elif grouped:
        outs = [_scatter_grouped.remote(plans[p], label_refs[p], P) for p in range(P)]
        comb = [_combine.remote(q, True, cplans[q], label_refs[q], *outs) for q in range(P)]
    else:
        outs = [
            _as_list(_scatter_fanout.options(num_returns=P).remote(plans[p], label_refs[p], P), P)
            for p in range(P)
        ]
        comb = [
            _combine.remote(q, False, cplans[q], label_refs[q], *[outs[p][q] for p in range(P)])
            for q in range(P)
        ]
    return [c[0] for c in comb], [c[1] for c in comb], [c[2] for c in comb]


def jump_wave(vid_refs, label_refs, P, grouped, acc_masks=None):
    """One pointer-jump round → (labels, changed_refs, mask_refs).

    ``acc_masks`` (per-shard bool refs or None) is OR-ed into the returned
    masks so a propagate-then-jump iteration hands the union frontier to
    the next sparse propagate."""
    acc = acc_masks if acc_masks is not None else [None] * P
    if grouped:
        reqs = [_jump_request_g.remote(label_refs[p], P) for p in range(P)]
        resolved = [_jump_resolve_g.remote(p, vid_refs[p], label_refs[p], *reqs) for p in range(P)]
        out = [_jump_apply.remote(q, True, label_refs[q], acc[q], *resolved) for q in range(P)]
    else:
        reqs = [_as_list(_jump_request_f.options(num_returns=P).remote(label_refs[p], P), P) for p in range(P)]
        resolved = [
            _as_list(
                _jump_resolve_f.options(num_returns=P).remote(
                    P, vid_refs[p], label_refs[p], *[reqs[q][p] for q in range(P)]
                ),
                P,
            )
            for p in range(P)
        ]
        out = [
            _jump_apply.remote(q, False, label_refs[q], acc[q], *[resolved[p][q] for p in range(P)])
            for q in range(P)
        ]
    return [o[0] for o in out], [o[1] for o in out], [o[2] for o in out]


# ----------------------------------------------------------------- driver

def connected_components_bsp(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    checkpoint=None,
    shards: dict | None = None,
    seed_labels=None,
) -> CCResult:
    """Exact connected components (labels = min vid per component).

    ``edges``/``vertices``: Ray Data datasets (src,dst int64 / vid int64).
    ``shards``: optional prebuilt bundle from state.shards.build_graph_shards
    (must be symmetric) — reused across algorithms on the same graph.
    ``seed_labels``: optional (vid, label) Dataset warm-starting the fixpoint
    — e.g. yesterday's labels in an incremental run. Each seed label must be
    a vid in the seeded vertex's component (labels from a prior CC over any
    subset of the current edges qualify; old components ⊆ new components).
    The fixpoint converges to the SAME global min-vid labels from any valid
    seeding, just in fewer waves — already-collapsed old components forward
    one label instead of re-running their whole merge tree. Requires the
    original int64 vid domain (cfg.dense_ids=False): incremental workloads
    keep vids stable across daily runs, while the dense rank of a vid
    changes whenever the vertex set grows, which would invalidate stored
    labels. Reference analog: marker seeding across slices
    (ccl_marker_stack.py markers_from_above / user markers).
    Returns labels as a Dataset assembled zero-copy from shard refs.
    """
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, P, vertices_ds=vertices, symmetrize=True, dense=cfg.dense_ids
        )
    assert shards["symmetrize"], "CC requires a symmetric shard bundle"
    assert shards["P"] == P
    vid_refs, plans, cplans = shards["vids"], shards["plans"], shards["cplans"]
    n_edges = int(sum(ray.get([_plan_edges.remote(p) for p in plans])))

    start_iter = 0
    label_refs = None
    if checkpoint is not None:
        from ccl_ray.state.checkpoint import vid_fingerprint

        resumed = checkpoint.latest_shards(
            expected_parts=P, expected_vid_fp=vid_fingerprint(vid_refs)
        )
        if resumed is not None:
            start_iter, label_refs = resumed
    if label_refs is None and seed_labels is not None:
        assert shards.get("dense") is None, (
            "seed_labels requires the original vid domain (dense_ids=False): "
            "dense ranks shift when the vertex set grows, so stored labels "
            "from a prior run are only meaningful as original vids"
        )
        from ccl_ray.state.shards import route_vid_value_pairs

        matrix = route_vid_value_pairs(seed_labels, P, "vid", "label")
        label_refs = [
            _init_warm_labels.remote(vid_refs[p], *[row[p] for row in matrix])
            for p in range(P)
        ]
    if label_refs is None:
        label_refs = [_init_labels.remote(v) for v in vid_refs]

    metrics: list[dict] = []
    it = start_iter
    # frontier bookkeeping for the sparse exchange: start all-dirty (every
    # vertex's initial label is unsent; also the only safe state after a
    # checkpoint resume, which does not persist masks)
    n_total = int(sum(ray.get([_vid_len.remote(v) for v in vid_refs])))
    dirty_refs = [_all_dirty.remote(v) for v in vid_refs]
    last_changed = n_total
    # checkpointing wants per-iteration state; otherwise batch K iterations
    # per driver sync so the block pipelines as one task DAG
    K = 1 if checkpoint is not None else max(cfg.check_every, 1)
    while it < cfg.cc_max_iters:
        t0 = time.perf_counter()
        block: list = []  # (changed_refs, label_refs) per iteration
        sparse_flags: list = []
        block_iters = min(K, cfg.cc_max_iters - it)
        for j in range(block_iters):
            # the changed count is synced once per block, so the dense→
            # sparse switch can lag up to K-1 iterations — a heuristic lag
            # only; both paths are exact
            sparse = n_total > 0 and last_changed / n_total < _SPARSE_FRAC
            label_refs, changed_refs, mask_refs = propagate_wave(
                plans, cplans, label_refs, P, grouped,
                vid_refs=vid_refs, dirty_refs=dirty_refs if sparse else None,
            )
            all_changed = list(changed_refs)
            if (it + j + 1) % max(cfg.cc_jump_every, 1) == 0:
                for _ in range(cfg.cc_jump_rounds):
                    label_refs, jc, mask_refs = jump_wave(
                        vid_refs, label_refs, P, grouped, acc_masks=mask_refs
                    )
                    all_changed.extend(jc)
            dirty_refs = mask_refs
            sparse_flags.append(sparse)
            block.append((all_changed, label_refs))
        changed_per_iter = [int(sum(ray.get(c))) for c, _ in block]
        last_changed = changed_per_iter[-1]
        wall = time.perf_counter() - t0
        converged = False
        for j, changed in enumerate(changed_per_iter):
            it += 1
            metrics.append(
                {
                    "iter": it,
                    "changed": changed,
                    "edges": n_edges,
                    "sparse": sparse_flags[j],
                    "wall_s": wall / block_iters,
                    "edges_per_sec": n_edges * block_iters / wall if wall > 0 else 0.0,
                }
            )
            if changed == 0:
                label_refs = block[j][1]  # deterministic stop point
                converged = True
                break
        if checkpoint is not None and (it % cfg.checkpoint_every == 0 or converged):
            checkpoint.save_shards(it, vid_refs, label_refs, extra=metrics[-1])
        if converged:
            break

    import ray.data as rd

    if shards.get("dense") is not None:
        # one resolve wave maps dense int32 (vid, label) back to original
        # int64 vids; min-dense == min-vid because the rank is order-preserving
        from ccl_ray.state.dense import translate_shard_tables

        tables = translate_shard_tables(
            shards["dense"], vid_refs, label_refs, value_is_dense=True, value_col="label"
        )
    else:
        tables = [_shard_table.remote(vid_refs[p], label_refs[p]) for p in range(P)]
    labels_ds = rd.from_arrow_refs(tables)
    return CCResult(labels=labels_ds, iterations=it - start_iter, metrics=metrics)
