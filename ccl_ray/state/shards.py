"""Hash-partitioned shard state for iterative graph algorithms.

Why raw Ray tasks here and Ray Data everywhere else: a Dataset pipeline pays
a fixed driver-side planning/execution cost per materialization. A BSP
fixpoint (CC / PageRank) runs tens of rounds over *static* edge shards and a
small mutable state table — exactly the "shared index + iteration" case the
Dataset API cannot express without re-planning every round (SURVEY.md §7
"Iteration under a lazy engine"). So: Ray Data builds the edge table, this
module exchanges it ONCE into P hash-partitioned CSR shards pinned in the
object store (zero-copy Arrow/numpy), and the per-round gather/scatter and
label exchanges are plain Ray tasks over those shard refs — O(P) small tasks
per round, no driver bottleneck, linear in edges. This replaces the
reference's Dask-futures orchestration that shipped whole pickled stacks
between workers (ccl_marker_stack.py:1119-1238).

Partition function: part(v) = splitmix64(v) % P — stable across processes,
resumes and cluster sizes (needed for checkpoint/resume and shard reuse).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.functions.hashing import stable_hash64_np


def as_piece_list(out, P: int) -> list:
    """Normalize a task's per-partition output to a list of P pieces.

    ``num_returns=P`` tasks unpack into P refs only when P > 1; at P == 1 Ray
    hands back the single object itself. Every BSP stage consuming routed
    pieces needs this unwrap (single definition here — previously copied in
    cc_bsp/pagerank_bsp/triangles/bfs/hits/sssp/kcore/dense)."""
    return [out] if P == 1 else list(out)


@ray.remote
def l1_delta(new: np.ndarray, old: np.ndarray) -> float:
    """Per-shard L1 delta partial for convergence checks (shared by the
    tol-based HITS / weighted-PageRank / eigenvector loops)."""
    return float(np.abs(new - old).sum())


def part_of(vids: np.ndarray, P: int) -> np.ndarray:
    return (stable_hash64_np(vids.astype(np.int64).view(np.uint64)) % np.uint64(P)).astype(
        np.int64
    )


def as_arrow_block(b) -> pa.Table:
    """Normalize one Dataset block to an Arrow table.

    ``to_arrow_refs`` hands back raw blocks WITHOUT converting: at scale
    Ray's sort/push-based shuffle emits pandas blocks even when every
    upstream stage returned Arrow, so every remote block consumer must
    tolerate both.
    """
    import pandas as pd

    return pa.Table.from_pandas(b, preserve_index=False) if isinstance(b, pd.DataFrame) else b


@ray.remote
def _split_pairs(block: pa.Table, src_col: str, dst_col: str, P: int, symmetrize: bool,
                 weight_col: str | None = None):
    """Split one edge block into P (src,dst[,w]) pair tables routed by
    hash(src). With ``weight_col`` each piece carries a float64 weight array
    (symmetrized edges keep the weight in both directions)."""
    block = as_arrow_block(block)
    if block.num_rows == 0 or src_col not in block.column_names:
        # empty blocks from repartition have an empty schema
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        if weight_col is not None:
            empty = (*empty, np.empty(0, np.float64))
        return empty if P == 1 else tuple(empty for _ in range(P))
    s = block.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d = block.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
    w = (
        block.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if weight_col is not None
        else None
    )
    if symmetrize:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
        if w is not None:
            w = np.concatenate([w, w])
    parts = part_of(s, P)
    order = np.argsort(parts, kind="stable")
    s, d, parts = s[order], d[order], parts[order]
    if w is not None:
        w = w[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    if w is None:
        out = tuple(
            (s[bounds[p] : bounds[p + 1]], d[bounds[p] : bounds[p + 1]]) for p in range(P)
        )
    else:
        out = tuple(
            (s[bounds[p] : bounds[p + 1]], d[bounds[p] : bounds[p + 1]],
             w[bounds[p] : bounds[p + 1]])
            for p in range(P)
        )
    return out[0] if P == 1 else out


@ray.remote
def _split_vid_value_pairs(block, vcol: str, valcol: str, P: int):
    """Split one (vid, value) block into P int64 pair pieces routed by
    hash(vid) — the generic seed/label injection exchange (warm-start CC,
    labelprop-style seeding)."""
    block = as_arrow_block(block)
    if block.num_rows == 0 or vcol not in block.column_names:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return empty if P == 1 else tuple(empty for _ in range(P))
    v = block.column(vcol).to_numpy(zero_copy_only=False).astype(np.int64)
    s = block.column(valcol).to_numpy(zero_copy_only=False).astype(np.int64)
    parts = part_of(v, P)
    order = np.argsort(parts, kind="stable")
    v, s, parts = v[order], s[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((v[bounds[p] : bounds[p + 1]], s[bounds[p] : bounds[p + 1]]) for p in range(P))
    return out[0] if P == 1 else out


def route_vid_value_pairs(ds, P: int, vcol: str, valcol: str) -> list:
    """Hash-exchange a (vid, value) Dataset into a [block][partition] matrix
    of int64 pair pieces (each entry a (vids, values) tuple ref)."""
    split = _split_vid_value_pairs.options(num_returns=P)
    matrix = [split.remote(b, vcol, valcol, P) for b in ds.to_arrow_refs()]
    if P == 1:
        matrix = [[m] for m in matrix]
    return matrix


@ray.remote
def _split_vids(block: pa.Table, cols: list, P: int):
    """Split vertex-id columns of one block into P arrays routed by hash(v)."""
    block = as_arrow_block(block)
    if block.num_rows == 0 or any(c not in block.column_names for c in cols):
        empty = np.empty(0, np.int64)
        return empty if P == 1 else tuple(empty for _ in range(P))
    arrs = [block.column(c).to_numpy(zero_copy_only=False).astype(np.int64) for c in cols]
    v = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
    parts = part_of(v, P)
    order = np.argsort(parts, kind="stable")
    v, parts = v[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(v[bounds[p] : bounds[p + 1]] for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _build_csr(dedupe, drop_self, weighted, *pieces):
    """Concat (src,dst) pieces for one partition into a CSR shard.

    Returns dict: srcs (sorted unique), indptr, dst (edge targets grouped by
    src), outdeg. Stored once in plasma; every round reads it zero-copy.
    ``dedupe`` removes duplicate (src,dst) pairs; ``drop_self`` removes
    self-loops (both required by e.g. triangle counting). ``weighted`` is
    threaded explicitly from the caller (not inferred from piece arity) so a
    weight_col request with zero input blocks still yields an empty "w" —
    downstream weight guards (sssp/_wnorm) then see an empty graph, not a
    missing column.
    """
    s = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    d = np.concatenate([p[1] for p in pieces]) if pieces else np.empty(0, np.int64)
    w = (
        np.concatenate([p[2] for p in pieces]) if pieces else np.empty(0, np.float64)
    ) if weighted else None
    if drop_self and s.size:
        keep = s != d
        s, d = s[keep], d[keep]
        if w is not None:
            w = w[keep]
    if dedupe and s.size:
        # weighted: order by (s, d, w) so the kept first row per (s, d) is
        # the MIN-weight parallel edge (shortest-path semantics)
        order = np.lexsort((w, d, s)) if w is not None else np.lexsort((d, s))
        s, d = s[order], d[order]
        if w is not None:
            w = w[order]
        keep = np.empty(len(s), dtype=bool)
        keep[0] = True
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        s, d = s[keep], d[keep]
        if w is not None:
            w = w[keep]
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    srcs, start = np.unique(s, return_index=True)
    indptr = np.concatenate([start, [len(s)]]).astype(np.int64)
    outdeg = np.diff(indptr)
    out = {"srcs": srcs, "indptr": indptr, "dst": d, "outdeg": outdeg}
    if w is not None:
        out["w"] = w[order]
    return out


@ray.remote
def _build_vids(*pieces):
    v = np.concatenate(list(pieces)) if pieces else np.empty(0, np.int64)
    return np.unique(v)


def shard_edges_csr(edges_ds, P: int, *, symmetrize: bool = False,
                    dedupe: bool = False, drop_self: bool = False,
                    src_col: str = "src", dst_col: str = "dst",
                    weight_col: str | None = None):
    """Exchange a Ray Data edge table into P CSR shard refs (hash(src) -> p).
    ``weight_col``: carry a per-edge float64 weight through the exchange
    (csr dict gains "w" aligned with "dst"; dedupe keeps min weight)."""
    block_refs = edges_ds.to_arrow_refs()
    split = _split_pairs.options(num_returns=P)
    matrix = [split.remote(b, src_col, dst_col, P, symmetrize, weight_col) for b in block_refs]
    if P == 1:
        matrix = [[m] for m in matrix]
    weighted = weight_col is not None
    return [
        _build_csr.remote(dedupe, drop_self, weighted, *[row[p] for row in matrix])
        for p in range(P)
    ]


def shard_vertices(edges_ds, P: int, *, vertices_ds=None,
                   src_col: str = "src", dst_col: str = "dst"):
    """P refs of sorted unique vid arrays (edge endpoints ∪ explicit vertices)."""
    block_refs = edges_ds.to_arrow_refs()
    split = _split_vids.options(num_returns=P)
    matrix = [split.remote(b, [src_col, dst_col], P) for b in block_refs]
    if vertices_ds is not None:
        matrix += [split.remote(b, ["vid"], P) for b in vertices_ds.to_arrow_refs()]
    if P == 1:
        matrix = [[m] for m in matrix]
    return [_build_vids.remote(*[row[p] for row in matrix]) for p in range(P)]


@ray.remote
def _finalize_plan(csr, vids, P):
    """Precompute the per-iteration scatter plan for one shard (ONE TIME).

    Everything that does not depend on the mutable state (labels/scores) is
    hoisted out of the iteration loop: the edge->owner gather index, the
    dst sort permutation, the segment starts for reduceat, and the routing
    layout of unique dsts by destination partition. Each BSP round is then
    pure gather + reduceat + slice — no sorting, no hashing.
    """
    if csr["srcs"].size == 0:
        return {
            "edge_src_idx": np.empty(0, np.int64),
            "dst_order": np.empty(0, np.int64),
            "seg_starts": np.empty(0, np.int64),
            "uniq_dst_routed": np.empty(0, np.int64),
            "uniq_perm": np.empty(0, np.int64),
            "bounds": np.zeros(P + 1, np.int64),
            "n_edges": 0,
            "uniq_dst": np.empty(0, np.int64),
            "edge_uniq": np.empty(0, np.int32),
            "uniq_part": np.empty(0, np.int32),
            "row_src_idx": np.empty(0, np.int32),
            "row_indptr": np.zeros(1, np.int64),
        }
    src_idx = np.searchsorted(vids, csr["srcs"])
    edge_src_idx = np.repeat(src_idx, csr["outdeg"])
    dst = csr["dst"]
    dst_order = np.argsort(dst, kind="stable")
    dst_sorted = dst[dst_order]
    uniq, seg_starts = np.unique(dst_sorted, return_index=True)
    parts = part_of(uniq, P)
    uniq_perm = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[uniq_perm], np.arange(P + 1))
    # sparse (frontier) exchange support: per-edge index into uniq (natural
    # order) and each uniq dst's destination partition — lets a round ship
    # only messages from vertices whose value changed (reduce_routed_sparse)
    seg_len = np.diff(np.append(seg_starts, len(dst)))
    edge_uniq = np.empty(len(dst), np.int32)
    edge_uniq[dst_order] = np.repeat(
        np.arange(len(uniq), dtype=np.int32), seg_len
    )
    # int32 indices: per-shard row counts are far below 2^31, and the hot
    # path is random gathers through these arrays — half the index bytes is
    # materially less memory traffic per round
    return {
        "edge_src_idx": edge_src_idx.astype(np.int32),
        "dst_order": dst_order.astype(np.int32),
        "seg_starts": seg_starts,
        "uniq_dst_routed": uniq[uniq_perm],
        "uniq_perm": uniq_perm.astype(np.int32),
        "bounds": bounds,
        "n_edges": int(len(dst)),
        "uniq_dst": uniq,
        "edge_uniq": edge_uniq,
        "uniq_part": parts.astype(np.int32),
        # row-based frontier selection: CSR rows are unique sources with
        # contiguous edge ranges, so a sparse round can find its frontier
        # edges from O(rows) state instead of an O(E) per-edge mask gather
        "row_src_idx": src_idx.astype(np.int32),
        "row_indptr": np.concatenate(
            ([0], np.cumsum(csr["outdeg"], dtype=np.int64))
        ),
    }


def scatter_plans(csr_refs: list, vid_refs: list, P: int) -> list:
    return [_finalize_plan.remote(c, v, P) for c, v in zip(csr_refs, vid_refs)]


def reduce_routed(plan, per_edge_vals: np.ndarray, op) -> list:
    """Apply the precomputed plan: per-edge values -> per-part VALUE pieces.

    The dst layout of each piece is static (plan["uniq_dst_routed"] sliced by
    plan["bounds"]), identical every iteration — so only the reduced values
    are shipped; destinations never travel with the messages. op is
    np.minimum or np.add.
    """
    if plan["n_edges"] == 0:
        return [np.empty(0, per_edge_vals.dtype)] * (len(plan["bounds"]) - 1)
    vals_sorted = per_edge_vals[plan["dst_order"]]
    red = op.reduceat(vals_sorted, plan["seg_starts"])
    red_routed = red[plan["uniq_perm"]]
    b = plan["bounds"]
    return [red_routed[b[p] : b[p + 1]] for p in range(len(b) - 1)]


def reduce_routed_sparse(plan, vertex_msgs: np.ndarray, dirty: np.ndarray, op, P: int) -> list:
    """Frontier variant of reduce_routed: ship only messages originating at
    DIRTY vertices (``dirty``: bool mask over this shard's vid domain).

    Correct whenever the combine is idempotent-monotone under ``op`` (min-
    plus BFS, hash-to-min CC): a clean vertex's message was already applied
    in the round it last changed and can never win again. Per-round cost is
    O(rows) to find dirty CSR rows plus O(f log f) for the frontier edges f
    (each dirty row's edges are a contiguous range via row_indptr) — no
    O(E) work at all, so late waves with tiny frontiers are nearly free.
    Pieces carry (dst_ids, values) because the static routed layout cannot
    describe a per-round subset.

    ``vertex_msgs``: the per-vertex OUTGOING message value (e.g. dist+1,
    label), indexed by shard-local position like the dense path's state.
    2D payloads (one row per vertex, e.g. HyperBall's HLL registers or
    batched-Brandes per-seed columns) work unchanged: row gathers and
    axis-0 reduceat.
    """
    empty = (
        np.empty(0, plan["uniq_dst"].dtype),
        np.empty((0,) + vertex_msgs.shape[1:], vertex_msgs.dtype),
    )
    if plan["n_edges"] == 0:
        return [empty] * P
    rows = np.flatnonzero(dirty[plan["row_src_idx"]])
    if rows.size == 0:
        return [empty] * P
    indptr = plan["row_indptr"]
    starts = indptr[rows]
    counts = indptr[rows + 1] - starts
    ends = np.cumsum(counts)
    total = int(ends[-1])
    if total == 0:
        return [empty] * P
    # ranges -> flat edge indices: block i covers out positions
    # ends[i-1]..ends[i]-1 with values starts[i] + 0..counts[i]-1
    sel = np.repeat(starts - (ends - counts), counts) + np.arange(total)
    vals = vertex_msgs[np.repeat(plan["row_src_idx"][rows], counts)]
    u = plan["edge_uniq"][sel]
    order = np.argsort(u, kind="stable")
    u, vals = u[order], vals[order]
    newb = np.empty(len(u), dtype=bool)
    newb[0] = True
    newb[1:] = u[1:] != u[:-1]
    starts = np.nonzero(newb)[0]
    u_r = u[starts]
    v_r = op.reduceat(vals, starts)
    parts = plan["uniq_part"][u_r]
    o2 = np.argsort(parts, kind="stable")
    u_r, v_r, parts = u_r[o2], v_r[o2], parts[o2]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    ids = plan["uniq_dst"][u_r]
    return [
        (ids[bounds[p] : bounds[p + 1]], v_r[bounds[p] : bounds[p + 1]])
        for p in range(P)
    ]


def route_pairs_sparse(plan, vertex_vals: np.ndarray, dirty: np.ndarray, P: int) -> list:
    """Frontier PAIR exchange: ship (dst, sender_value) pairs — deduped per
    shard — from dirty rows, for combines that are PREDICATES on the value
    rather than reductions (SCC's color-equality mark wave: two marked
    in-neighbors of one dst may carry different colors, and reducing with
    min/max would lose the one that matches the receiver). Same frontier
    edge selection as reduce_routed_sparse; cost O(frontier edges)."""
    empty = (np.empty(0, plan["uniq_dst"].dtype), np.empty(0, vertex_vals.dtype))
    if plan["n_edges"] == 0:
        return [empty] * P
    rows = np.flatnonzero(dirty[plan["row_src_idx"]])
    if rows.size == 0:
        return [empty] * P
    indptr = plan["row_indptr"]
    starts = indptr[rows]
    counts = indptr[rows + 1] - starts
    ends = np.cumsum(counts)
    total = int(ends[-1])
    if total == 0:
        return [empty] * P
    sel = np.repeat(starts - (ends - counts), counts) + np.arange(total)
    vals = vertex_vals[np.repeat(plan["row_src_idx"][rows], counts)]
    u = plan["edge_uniq"][sel]
    order = np.lexsort((vals, u))
    u, vals = u[order], vals[order]
    keep = np.empty(len(u), dtype=bool)
    keep[0] = True
    keep[1:] = (u[1:] != u[:-1]) | (vals[1:] != vals[:-1])
    u, vals = u[keep], vals[keep]
    parts = plan["uniq_part"][u]
    o2 = np.argsort(parts, kind="stable")
    u, vals, parts = u[o2], vals[o2], parts[o2]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    ids = plan["uniq_dst"][u]
    return [
        (ids[bounds[p] : bounds[p + 1]], vals[bounds[p] : bounds[p + 1]])
        for p in range(P)
    ]


def apply_sparse_pieces(vids_sorted: np.ndarray, cur: np.ndarray, pieces: list, op):
    """(new, changed_mask) from sparse (dst_ids, values) pieces.

    dst ids resolve to shard-local positions via searchsorted on the sorted
    vid array (every shipped dst is owned here by routing); duplicate dsts
    across pieces collapse with one sort + reduceat before the assignment.
    """
    ids = [p[0] for p in pieces if len(p[0])]
    if not ids:
        return cur, np.zeros(len(cur), dtype=bool)
    d = np.concatenate(ids)
    v = np.concatenate([p[1] for p in pieces if len(p[0])])
    idx = np.searchsorted(vids_sorted, d)
    order = np.argsort(idx, kind="stable")
    idx, v = idx[order], v[order]
    newb = np.empty(len(idx), dtype=bool)
    newb[0] = True
    newb[1:] = idx[1:] != idx[:-1]
    starts = np.nonzero(newb)[0]
    pos = idx[starts]
    red = op.reduceat(v, starts)
    new = cur.copy()
    new[pos] = op(new[pos], red)
    return new, new != cur


@ray.remote
def _combine_plan(q, vids, *plans):
    """One-time combine plan for partition q.

    The incoming message layout for q is the concatenation, in source-shard
    order, of each shard's static dst piece for q. Precomputes the sort
    permutation over destination indices, reduceat segment starts and the
    (unique) output positions — per-iteration combining is then pure
    gather + reduceat + one fancy assignment. This removes the dominant
    per-wave cost (re-sorting the full message stream every round).
    """
    piece_idx = []
    for plan in plans:
        b = plan["bounds"]
        piece = plan["uniq_dst_routed"][b[q] : b[q + 1]]
        piece_idx.append(np.searchsorted(vids, piece))
    if not piece_idx:
        concat = np.empty(0, np.int64)
    else:
        concat = np.concatenate(piece_idx)
    if concat.size == 0:
        return {"order": concat.astype(np.int32), "starts": concat, "pos": concat, "total": 0}
    order = np.argsort(concat, kind="stable")
    srt = concat[order]
    pos, starts = np.unique(srt, return_index=True)
    return {
        "order": order.astype(np.int32),
        "starts": starts,
        "pos": pos.astype(np.int64),
        "total": int(concat.size),
    }


def combine_plans(vid_refs: list, plans: list, P: int) -> list:
    return [_combine_plan.remote(q, vid_refs[q], *plans) for q in range(P)]


def apply_combine_plan(cplan, value_pieces: list, op) -> tuple[np.ndarray, np.ndarray]:
    """(positions, reduced values) for this partition from value-only pieces."""
    if cplan["total"] == 0:
        return cplan["pos"], np.empty(0, np.float64)
    vals = np.concatenate(value_pieces)
    red = op.reduceat(vals[cplan["order"]], cplan["starts"])
    return cplan["pos"], red


def build_graph_shards(edges_ds, P: int, *, vertices_ds=None, symmetrize: bool = True,
                       dense: bool = True) -> dict:
    """Build the full shard bundle ONCE for reuse across algorithms.

    CC, PageRank(symmetrize=True) and label propagation all iterate over the
    same symmetric CSR + plans; sharing the bundle halves setup when a
    pipeline runs several algorithms on one graph (e.g. the flagship).

    ``dense=True`` (default): build in the dense int32 vertex domain
    (state.dense) — halves label-gather bytes per BSP iteration; consumers
    translate outputs back to original vids via the bundle's ``dense``
    metadata. ``dense=False`` keeps the original int64 vid domain (needed
    when callers align external per-vid data against the shard layout by
    hash(vid), e.g. label propagation's seed routing).
    """
    if dense:
        from ccl_ray.state.dense import build_dense_graph_shards

        return build_dense_graph_shards(edges_ds, P, vertices_ds=vertices_ds,
                                        symmetrize=symmetrize)
    csr = shard_edges_csr(edges_ds, P, symmetrize=symmetrize)
    vids = shard_vertices(edges_ds, P, vertices_ds=vertices_ds)
    plans = scatter_plans(csr, vids, P)
    cplans = combine_plans(vids, plans, P)
    return {"csr": csr, "vids": vids, "plans": plans, "cplans": cplans, "P": P,
            "symmetrize": symmetrize}


def shards_to_dataset(shard_tables: list) -> "ray.data.Dataset":
    """Wrap per-shard pyarrow tables (refs) as a Dataset without driver copy."""
    import ray.data as rd

    return rd.from_arrow_refs(shard_tables)
