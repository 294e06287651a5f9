"""BSP connected components over hash-partitioned CSR shards (default engine).

Semantics identical to ccl_ray.stages.cc (hash-to-min + pointer jumping,
canonical min-vid labels; see that module's docstring for the mapping onto
the reference's label algebra). Execution differs: edge CSR shards are built
ONCE from the Ray Data edge table and pinned in the object store; each round
is a wave of O(P) Ray tasks — scatter (per-shard vectorized message
generation with per-destination min pre-combining: the combiner that
replaces the reference's O(labels×pixels) scan loops, ccl_marker_stack.py
:74-81), an all-to-all message exchange routed by hash(dst), a combine wave,
and "hop-doubling" pointer-jump exchanges (request/resolve/apply waves keyed
by hash(label)). All per-task math is numpy segment reductions — no Python
row loops anywhere.

Convergence = zero label changes across propagate + jump waves (a handful of
scalars to the driver per round — never a full materialization).
"""

from __future__ import annotations

import time

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.stages.cc import CCResult
from ccl_ray.state.shards import part_of, shard_edges_csr, shard_vertices

_I64MAX = np.int64(np.iinfo(np.int64).max)


def _as_list(out, P):
    return [out] if P == 1 else list(out)


def _min_by_key(keys: np.ndarray, vals: np.ndarray):
    """Vectorized (sort + reduceat) min of vals grouped by keys."""
    if keys.size == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    uniq, start = np.unique(k, return_index=True)
    return uniq, np.minimum.reduceat(v, start)


@ray.remote
def _scatter(csr, vids, labels, P):
    """Emit min-label messages along edges, pre-combined by dst, routed by hash(dst)."""
    if csr["srcs"].size == 0:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return empty if P == 1 else tuple(empty for _ in range(P))
    src_lab = labels[np.searchsorted(vids, csr["srcs"])]
    lab_per_edge = np.repeat(src_lab, csr["outdeg"])
    dsts, cands = _min_by_key(csr["dst"], lab_per_edge)
    parts = part_of(dsts, P)
    order = np.argsort(parts, kind="stable")
    dsts, cands, parts = dsts[order], cands[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(
        (dsts[bounds[p] : bounds[p + 1]], cands[bounds[p] : bounds[p + 1]]) for p in range(P)
    )
    return out[0] if P == 1 else out


@ray.remote(num_returns=2)
def _combine(vids, labels, *msg_pieces):
    """new_label[v] = min(old, incoming candidates); returns (labels, n_changed)."""
    if vids.size == 0:
        return labels, 0
    dsts = np.concatenate([m[0] for m in msg_pieces])
    cands = np.concatenate([m[1] for m in msg_pieces])
    new = labels.copy()
    if dsts.size:
        ud, uc = _min_by_key(dsts, cands)
        idx = np.searchsorted(vids, ud)
        np.minimum.at(new, idx, uc)
    return new, int((new != labels).sum())


@ray.remote
def _jump_request(labels, P):
    """Unique label values this shard needs resolved, routed by hash(label)."""
    uniq = np.unique(labels)
    parts = part_of(uniq, P)
    order = np.argsort(parts, kind="stable")
    uniq, parts = uniq[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(uniq[bounds[p] : bounds[p + 1]] for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _jump_resolve(vids, labels, P, *request_pieces):
    """For each requester: resolve label[x] for its queried vids x."""
    out = []
    for q in request_pieces:
        idx = np.searchsorted(vids, q)
        # every queried label is a real vid of this shard by construction
        out.append((q, labels[idx]))
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=2)
def _jump_apply(labels, *resp_pieces):
    """labels <- resolved(labels): one pointer-doubling step; returns (labels, changed)."""
    queries = np.concatenate([r[0] for r in resp_pieces])
    resolved = np.concatenate([r[1] for r in resp_pieces])
    order = np.argsort(queries, kind="stable")
    queries, resolved = queries[order], resolved[order]
    new = resolved[np.searchsorted(queries, labels)]
    return new, int((new != labels).sum())


def _jump_wave(label_refs, vid_refs, P):
    reqs = [_as_list(_jump_request.options(num_returns=P).remote(label_refs[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
            _jump_resolve.options(num_returns=P).remote(
                vid_refs[p], label_refs[p], P, *[reqs[q][p] for q in range(P)]
            ),
            P,
        )
        for p in range(P)
    ]
    out = [
        _jump_apply.remote(label_refs[q], *[resolved[p][q] for p in range(P)]) for q in range(P)
    ]
    labels = [o[0] for o in out]
    changed = sum(ray.get([o[1] for o in out]))
    return labels, changed


@ray.remote
def _count_edges(csr):
    return len(csr["dst"])


@ray.remote
def _init_labels(vids):
    return vids.copy()


@ray.remote
def _shard_table(vids, labels):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "label": pa.array(labels)})


def connected_components_bsp(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    checkpoint=None,
) -> CCResult:
    """Exact connected components (labels = min vid per component).

    ``edges``/``vertices``: Ray Data datasets (src,dst int64 / vid int64).
    Returns labels as a Dataset assembled zero-copy from shard refs.
    """
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)

    n_edges = int(sum(ray.get([_count_edges.remote(r) for r in csr])))
    start_iter = 0
    label_refs = None
    if checkpoint is not None:
        resumed = checkpoint.latest_shards()
        if resumed is not None:
            start_iter, label_refs = resumed
    if label_refs is None:
        label_refs = [_init_labels.remote(v) for v in vid_refs]

    metrics: list[dict] = []
    it = start_iter
    while it < cfg.cc_max_iters:
        t0 = time.perf_counter()
        outs = [
            _as_list(_scatter.options(num_returns=P).remote(csr[p], vid_refs[p], label_refs[p], P), P)
            for p in range(P)
        ]
        comb = [
            _combine.remote(vid_refs[q], label_refs[q], *[outs[p][q] for p in range(P)])
            for q in range(P)
        ]
        label_refs = [c[0] for c in comb]
        changed = sum(ray.get([c[1] for c in comb]))
        for _ in range(cfg.cc_jump_rounds):
            label_refs, jc = _jump_wave(label_refs, vid_refs, P)
            changed += jc
        it += 1
        wall = time.perf_counter() - t0
        metrics.append(
            {
                "iter": it,
                "changed": int(changed),
                "edges": n_edges,
                "wall_s": wall,
                "edges_per_sec": n_edges / wall if wall > 0 else 0.0,
            }
        )
        if checkpoint is not None and (it % cfg.checkpoint_every == 0 or changed == 0):
            checkpoint.save_shards(it, vid_refs, label_refs, extra=metrics[-1])
        if changed == 0:
            break

    import ray.data as rd

    labels_ds = rd.from_arrow_refs(
        [_shard_table.remote(vid_refs[p], label_refs[p]) for p in range(P)]
    )
    return CCResult(labels=labels_ds, iterations=it - start_iter, metrics=metrics)
