"""Min-label propagation (seeded) — the generalized form of hash-to-min.

Connected components IS min-label propagation with seed = vid (reference
§2.3 C3/C6: the equivalence-closure loop and backward translation sweep are
both fixpoints of "take the min label over the neighborhood"). This module
exposes the seeded variants the engine needs beyond plain CC:

- ``min_label_propagation(..., rounds=k)``: exactly k synchronous rounds of
  neighborhood-min exchange (bounded-hop semantics — e.g. "min seed within
  k hops"). No pointer jumping, because arbitrary seed values are not vertex
  ids and cannot be dereferenced.
- ``min_label_propagation(..., rounds=None)``: run to convergence. Computed
  as CC (fast O(log n) path) followed by a per-component min-seed exchange,
  which is equivalent at the fixpoint: the converged value at v is the min
  seed anywhere in v's component.

Seeds: Dataset (vid:int64, seed:int64). Vertices without a seed row behave
as +inf (INT64_MAX sentinel); components with no seed converge to the
sentinel and are reported as null seed_label.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.stages.cc_bsp import (
    _as_list,
    connected_components_bsp,
    propagate_wave,
)
from ccl_ray.state.shards import (
    combine_plans,
    part_of,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)

_I64MAX = np.int64(np.iinfo(np.int64).max)


@ray.remote
def _split_seed_pairs(block, P):
    import numpy as np

    from ccl_ray.state.shards import as_arrow_block

    block = as_arrow_block(block)
    if block.num_rows == 0 or "vid" not in block.column_names:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return empty if P == 1 else tuple(empty for _ in range(P))
    v = block.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
    s = block.column("seed").to_numpy(zero_copy_only=False).astype(np.int64)
    parts = part_of(v, P)
    order = np.argsort(parts, kind="stable")
    v, s, parts = v[order], s[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((v[bounds[p] : bounds[p + 1]], s[bounds[p] : bounds[p + 1]]) for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _init_seed_labels(vids, *seed_pieces):
    lab = np.full(len(vids), _I64MAX, dtype=np.int64)
    for v, s in seed_pieces:
        if v.size:
            idx = np.searchsorted(vids, v)
            np.minimum.at(lab, idx, s)
    return lab


@ray.remote
def _seeded_dirty(labels):
    """Round-1 frontier: exactly the seeded vertices — every other vertex
    holds the +inf sentinel, whose messages are no-ops under min."""
    return labels != _I64MAX


@ray.remote
def _count_true(mask) -> int:
    return int(mask.sum())


@ray.remote
def _arr_len(arr) -> int:
    return len(arr)


@ray.remote
def _seed_table(vids, labels):
    import pyarrow as pa

    mask = labels == _I64MAX
    out = labels.astype(object)
    return pa.table(
        {
            "vid": pa.array(vids),
            "seed_label": pa.array(
                np.where(mask, None, out), type=pa.int64(), from_pandas=True
            ),
        }
    )


def _route_seeds(seeds, P):
    split = _split_seed_pairs.options(num_returns=P)
    matrix = [split.remote(b, P) for b in seeds.to_arrow_refs()]
    if P == 1:
        matrix = [[m] for m in matrix]
    return matrix


def min_label_propagation(
    edges,
    seeds,
    *,
    vertices=None,
    rounds: int | None = None,
    cfg: EngineConfig | None = None,
):
    """Returns Dataset (vid, seed_label) — min seed within `rounds` hops, or
    min seed in the component when rounds is None (converged)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions

    if rounds is None:
        # converge: CC (dense path fine — _component_min_seed routes label
        # rows by hash(vid) itself), then min-seed per component
        cc = connected_components_bsp(edges, vertices=vertices, cfg=cfg)
        return _component_min_seed(cc.labels, seeds, cfg)

    csr = shard_edges_csr(edges, P, symmetrize=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)
    cplans = combine_plans(vid_refs, plans, P)
    matrix = _route_seeds(seeds, P)
    label_refs = [
        _init_seed_labels.remote(vid_refs[p], *[row[p] for row in matrix]) for p in range(P)
    ]
    grouped = cfg.exchange == "grouped"
    # hybrid dense/sparse rounds, frontier-seeded: with few seeds the early
    # hops touch only the seeds' neighborhoods, so k-hop propagation costs
    # O(frontier) per round instead of O(E). Min-monotone, so skipping
    # clean/sentinel senders is exact (see cc_bsp._SPARSE_FRAC).
    import ccl_ray.stages.cc_bsp as _ccmod

    n_total = int(sum(ray.get([_arr_len.remote(v) for v in vid_refs])))
    dirty_refs = [_seeded_dirty.remote(l) for l in label_refs]
    changed_total = int(sum(ray.get([_count_true.remote(m) for m in dirty_refs])))
    for _ in range(rounds):
        sparse = n_total > 0 and changed_total / n_total < _ccmod._SPARSE_FRAC
        label_refs, changed_refs, mask_refs = propagate_wave(
            plans, cplans, label_refs, P, grouped,
            vid_refs=vid_refs, dirty_refs=dirty_refs if sparse else None,
        )
        dirty_refs = mask_refs
        changed_total = int(sum(ray.get(changed_refs)))
        if changed_total == 0:
            break  # fixpoint: the remaining rounds cannot change anything

    import ray.data as rd

    return rd.from_arrow_refs([_seed_table.remote(vid_refs[p], label_refs[p]) for p in range(P)])


@ray.remote
def _label_seed_pairs(block, P):
    """Route (label, seed_at_vid) rows of a labels⋈seeds shard by hash(label)."""
    import numpy as np

    lab = block.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    sd = block.column("seed_min").to_numpy(zero_copy_only=False).astype(np.int64)
    parts = part_of(lab, P)
    order = np.argsort(parts, kind="stable")
    lab, sd, parts = lab[order], sd[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((lab[bounds[p] : bounds[p + 1]], sd[bounds[p] : bounds[p + 1]]) for p in range(P))
    return out[0] if P == 1 else out


def _component_min_seed(labels_ds, seeds, cfg: EngineConfig):
    """labels (vid,label) + seeds (vid,seed) → (vid, seed_label=min seed in component).

    Three vectorized exchanges: align seeds to label shards by hash(vid),
    min-reduce (label→min seed) by hash(label), then resolve each vertex's
    label through that map — same machinery as the CC pointer-jump waves.
    """
    import pyarrow as pa

    import ray.data as rd

    P = cfg.num_partitions

    # stage 1: route BOTH label rows and seed rows by hash(vid), then attach
    # seed (sentinel if absent) to each vid. Routing the labels explicitly
    # (instead of assuming block p == hash part p) makes this correct for
    # ANY labels_ds provenance — including the dense-renumbered CC engine,
    # whose translated output blocks are partitioned by hash(dense vid).
    lab_blocks = labels_ds.to_arrow_refs()

    @ray.remote
    def _split_label_pairs(block, P):
        from ccl_ray.state.shards import as_arrow_block

        block = as_arrow_block(block)
        if block.num_rows == 0 or "vid" not in block.column_names:
            empty = (np.empty(0, np.int64), np.empty(0, np.int64))
            return empty if P == 1 else tuple(empty for _ in range(P))
        v = block.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        s = block.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        parts = part_of(v, P)
        order = np.argsort(parts, kind="stable")
        v, s, parts = v[order], s[order], parts[order]
        bounds = np.searchsorted(parts, np.arange(P + 1))
        out = tuple((v[bounds[p]:bounds[p + 1]], s[bounds[p]:bounds[p + 1]]) for p in range(P))
        return out[0] if P == 1 else out

    split = _split_label_pairs.options(num_returns=P)
    lab_matrix = [split.remote(b, P) for b in lab_blocks]
    if P == 1:
        lab_matrix = [[m] for m in lab_matrix]
    seed_matrix = _route_seeds(seeds, P)

    @ray.remote
    def align(n_lab, *pieces):
        lab_pieces, seed_pieces = pieces[:n_lab], pieces[n_lab:]
        v = np.concatenate([x[0] for x in lab_pieces]) if lab_pieces else np.empty(0, np.int64)
        l = np.concatenate([x[1] for x in lab_pieces]) if lab_pieces else np.empty(0, np.int64)
        order = np.argsort(v, kind="stable")
        v, l = v[order], l[order]
        sd = np.full(len(v), _I64MAX, dtype=np.int64)
        for sv, ss in seed_pieces:
            if sv.size and len(v):
                # seeds routed by hash(vid); only vids present here apply
                pos = np.searchsorted(v, sv)
                ok = (pos < len(v)) & (v[np.minimum(pos, len(v) - 1)] == sv)
                np.minimum.at(sd, pos[ok], ss[ok])
        return pa.table({"label": pa.array(l), "seed_min": pa.array(sd)})

    aligned = [
        align.remote(
            len(lab_matrix),
            *[row[p] for row in lab_matrix],
            *[row[p] for row in seed_matrix],
        )
        for p in range(P)
    ]

    # stage 2: min seed per label, routed by hash(label)
    routed = [_as_list(_label_seed_pairs.options(num_returns=P).remote(a, P), P) for a in aligned]

    @ray.remote
    def reduce_min(*pieces):
        labs = np.concatenate([p[0] for p in pieces])
        sds = np.concatenate([p[1] for p in pieces])
        if labs.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        order = np.argsort(labs, kind="stable")
        labs, sds = labs[order], sds[order]
        uniq, start = np.unique(labs, return_index=True)
        return uniq, np.minimum.reduceat(sds, start)

    comp_min = [reduce_min.remote(*[routed[b][q] for b in range(len(routed))]) for q in range(P)]

    # stage 3: request/resolve exchange (the cc_bsp jump-wave shape): each
    # label block routes its UNIQUE labels to the hash(label) owners built
    # in stage 2, each owner answers only the labels it was asked for, and
    # the block applies its answers. No task ever holds the full
    # (label -> min seed) map — traffic is O(sum of per-block distinct
    # labels), replacing the old O(P * n_components) full-map fanout.
    @ray.remote
    def request(block, P):
        from ccl_ray.state.shards import as_arrow_block

        block = as_arrow_block(block)
        if block.num_rows == 0 or "label" not in block.column_names:
            e = np.empty(0, np.int64)
            return e if P == 1 else tuple(e for _ in range(P))
        l = np.unique(block.column("label").to_numpy(zero_copy_only=False).astype(np.int64))
        parts = part_of(l, P)
        order = np.argsort(parts, kind="stable")
        l, parts = l[order], parts[order]
        bounds = np.searchsorted(parts, np.arange(P + 1))
        out = tuple(l[bounds[p] : bounds[p + 1]] for p in range(P))
        return out[0] if P == 1 else out

    n_blocks = len(lab_blocks)
    req_matrix = [_as_list(request.options(num_returns=P).remote(b, P), P) for b in lab_blocks]

    @ray.remote
    def answer(cm, n, *reqs):
        lab, sd = cm
        outs = []
        for r in reqs:
            if len(lab) == 0 or len(r) == 0:
                outs.append((r, np.full(len(r), _I64MAX, dtype=np.int64)))
                continue
            pos = np.searchsorted(lab, r)
            pos_c = np.minimum(pos, len(lab) - 1)
            ok = (pos < len(lab)) & (lab[pos_c] == r)
            outs.append((r, np.where(ok, sd[pos_c], _I64MAX).astype(np.int64)))
        return outs[0] if n == 1 else tuple(outs)

    ans_matrix = [
        _as_list(
            answer.options(num_returns=n_blocks).remote(
                comp_min[q], n_blocks, *[req_matrix[b][q] for b in range(n_blocks)]
            ),
            n_blocks,
        )
        for q in range(P)
    ]

    @ray.remote
    def apply_block(block, *answers):
        from ccl_ray.state.shards import as_arrow_block

        block = as_arrow_block(block)
        if block.num_rows == 0 or "vid" not in block.column_names:
            return pa.table(
                {"vid": pa.array([], pa.int64()), "seed_label": pa.array([], pa.int64())}
            )
        v = block.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        l = block.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        all_lab = np.concatenate([a[0] for a in answers])
        all_sd = np.concatenate([a[1] for a in answers])
        order = np.argsort(all_lab, kind="stable")
        all_lab, all_sd = all_lab[order], all_sd[order]
        sd = all_sd[np.searchsorted(all_lab, l)]
        mask = sd == _I64MAX
        return pa.table(
            {
                "vid": pa.array(v),
                "seed_label": pa.array(
                    np.where(mask, None, sd.astype(object)), type=pa.int64(), from_pandas=True
                ),
            }
        )

    out = [
        apply_block.remote(lab_blocks[b], *[ans_matrix[q][b] for q in range(P)])
        for b in range(n_blocks)
    ]
    return rd.from_arrow_refs(out)
