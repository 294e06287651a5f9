"""Deterministic random-walk corpus over a directed edge Dataset.

DeepWalk/node2vec-style training pipelines need a walk corpus: for every
seed vertex, a length-L vertex sequence following out-edges, with the
step choice pseudo-random but REPRODUCIBLE (resumes, reruns and the SQL
oracle must produce the identical corpus). The step rule is a keyed
pseudo-random argmin:

    next(cur, t) = argmin over out-neighbors n of
                   k(cur, n, t) = (cur·K1 + n·K2 + t·K3) mod 2^64

with splitmix64's odd mixing constants — a fixed pseudo-random
permutation of the neighbor ranking, shifted per (cur, t) so revisits at
different steps take different branches. The mod-2^64 linear form is
chosen deliberately: numpy uint64 wraparound equals DuckDB
``(expr::HUGEINT · K) % 2^64``, so the oracle can replay the walk
EXACTLY (the same trick as the MIS priority). Dead ends stop the walk.

Scale shape: the adjacency is exchanged ONCE into hash(src)-partitioned
CSR shards (shard_edges_csr — the cc_bsp machinery) and pinned in
plasma; each step then ships only (wid, cur) FRONTIER pieces between
partitions — a walk's candidates all live in its cur's shard, so the
per-walk argmin completes shard-locally and the step costs
O(Σ outdeg(frontier)) gather + O(frontier) exchange, never a re-shuffle
of the edge table (an earlier hash_join-per-step draft re-exchanged the
full adjacency L times — 7× slower at sf0.01). Corpus pieces stay in
plasma; the result Dataset is assembled from refs, no driver data path.

Reference parity: no counterpart in michaelleerilee/CCL — part of the
training-data extension suite (graph-embedding corpus generation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import as_arrow_block, part_of, shard_edges_csr

K1 = np.uint64(0x9E3779B97F4A7C15)
K2 = np.uint64(0xBF58476D1CE4E5B9)
K3 = np.uint64(0x94D049BB133111EB)

_EMPTY_PIECE = (np.empty(0, np.int64), np.empty(0, np.int64))


def _corpus_table(wid: np.ndarray, step: int, vid: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "wid": pa.array(wid, pa.int64()),
            "step": pa.array(np.full(len(wid), step, np.int64)),
            "vid": pa.array(vid, pa.int64()),
        }
    )


@ray.remote
def _route_seeds(block, P: int, fanout: bool):
    """One seed block → P (wid, cur) pieces routed by part(vid).

    grouped: ONE list object per block, receivers index their slot
    (plasma shared memory makes this zero-copy single-node); fanout:
    P separate returns so only a node's own slice ships to it — the same
    two exchange modes as every BSP stage (cfg.exchange)."""
    t = as_arrow_block(block)
    v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
    assert (v >= 0).all(), "deterministic_walks: negative vid"
    parts = part_of(v, P)
    order = np.argsort(parts, kind="stable")
    v, parts = v[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    pieces = [
        (v[bounds[p]: bounds[p + 1]], v[bounds[p]: bounds[p + 1]]) for p in range(P)
    ]
    if fanout:
        return pieces[0] if P == 1 else tuple(pieces)
    return pieces


@ray.remote
def _seed_corpus(grouped: bool, q: int, *msgs):
    pieces = [m[q] for m in msgs] if grouped else list(msgs)
    wid = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    return _corpus_table(wid, 0, wid)


@ray.remote
def _walk_step(csr, t: int, P: int, grouped: bool, q: int, *msgs):
    """Advance shard q's frontier one step.

    grouped: returns (routed P-list, corpus_table, n_advanced) — 3 refs;
    fanout: returns (*routed pieces, corpus_table, n_advanced) — P+2 refs.
    Walks whose cur has no out-edge here die; survivors' (wid, nxt) route
    by part(nxt).
    """

    def _pack(routed, corpus, n):
        if grouped:
            return routed, corpus, n
        return (*routed, corpus, n)

    pieces = [m[q] for m in msgs] if grouped else list(msgs)
    wid = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    cur = np.concatenate([p[1] for p in pieces]) if pieces else np.empty(0, np.int64)
    if len(wid) == 0 or csr["srcs"].size == 0:
        return _pack([_EMPTY_PIECE] * P, _corpus_table(wid[:0], t, wid[:0]), 0)
    idx = np.searchsorted(csr["srcs"], cur)
    ok = (idx < len(csr["srcs"])) & (csr["srcs"][np.minimum(idx, len(csr["srcs"]) - 1)] == cur)
    wid, cur, idx = wid[ok], cur[ok], idx[ok]
    if len(wid) == 0:
        return _pack([_EMPTY_PIECE] * P, _corpus_table(wid, t, wid), 0)
    starts = csr["indptr"][idx]
    counts = csr["outdeg"][idx]
    live = counts > 0
    wid, cur, starts, counts = wid[live], cur[live], starts[live], counts[live]
    if len(wid) == 0:
        return _pack([_EMPTY_PIECE] * P, _corpus_table(wid, t, wid), 0)
    ends = np.cumsum(counts)
    total = int(ends[-1])
    sel = np.repeat(starts - (ends - counts), counts) + np.arange(total)
    nbr = csr["dst"][sel]
    row = np.repeat(np.arange(len(wid)), counts)
    with np.errstate(over="ignore"):
        k = (
            np.repeat(cur, counts).astype(np.uint64) * K1
            + nbr.astype(np.uint64) * K2
            + np.uint64(t) * K3
        )
    order = np.lexsort((nbr, k, row))
    row_s, nbr_s = row[order], nbr[order]
    first = np.empty(total, dtype=bool)
    first[0] = True
    first[1:] = row_s[1:] != row_s[:-1]
    nxt = nbr_s[first]
    wid = wid[row_s[first]]
    corpus = _corpus_table(wid, t, nxt)
    parts = part_of(nxt, P)
    o2 = np.argsort(parts, kind="stable")
    wid, nxt, parts = wid[o2], nxt[o2], parts[o2]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    routed = [
        (wid[bounds[p]: bounds[p + 1]], nxt[bounds[p]: bounds[p + 1]]) for p in range(P)
    ]
    return _pack(routed, corpus, len(nxt))


def deterministic_walks(
    edges,
    seeds,
    walk_len: int,
    *,
    cfg: EngineConfig | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """Walk corpus Dataset (wid, step, vid): for each seed vertex one walk
    of ≤ ``walk_len`` steps (step 0 = the seed; shorter on dead ends).

    ``edges``: directed (src, dst) int64, duplicates fine (the CSR shards
    dedupe). ``seeds``: Dataset with a ``vid`` column. All vids must be
    non-negative (the SQL-replicable HUGEINT hash contract).
    """
    import ray.data as rd

    from ccl_ray.config import resolve_partitions

    cfg = cfg or EngineConfig()
    P = resolve_partitions(cfg.num_partitions)

    grouped = cfg.exchange == "grouped"

    csr = shard_edges_csr(edges, P, symmetrize=False, dedupe=True,
                          drop_self=False, src_col=src_col, dst_col=dst_col)

    from ccl_ray.state.shards import as_piece_list

    if grouped:
        # msgs: refs, each a P-list of (wid, cur) pieces; receivers index
        # slot q (zero-copy on single-node shared plasma)
        msgs = [[_route_seeds.remote(b, P, False)] for b in seeds.to_arrow_refs()]
        msgs = [m[0] for m in msgs]
        frontier = [list(msgs)] * P  # every shard sees every block's list
        corpus_refs = [_seed_corpus.remote(True, q, *msgs) for q in range(P)]
    else:
        # fanout: each block routes into P separate returns; shard q gets
        # only its own slices (the multi-node mode — value bytes to the
        # owning node only)
        matrix = [
            as_piece_list(
                _route_seeds.options(num_returns=P).remote(b, P, True), P
            )
            for b in seeds.to_arrow_refs()
        ]
        frontier = [[row[q] for row in matrix] for q in range(P)]
        corpus_refs = [_seed_corpus.remote(False, q, *frontier[q]) for q in range(P)]

    for t in range(1, walk_len + 1):
        if grouped:
            outs = [
                _walk_step.options(num_returns=3).remote(
                    csr[q], t, P, True, q, *frontier[q]
                )
                for q in range(P)
            ]
            corpus_refs += [o[1] for o in outs]
            if sum(ray.get([o[2] for o in outs])) == 0:
                break
            nxt_msgs = [o[0] for o in outs]
            frontier = [list(nxt_msgs)] * P
        else:
            outs = [
                _walk_step.options(num_returns=P + 2).remote(
                    csr[q], t, P, False, q, *frontier[q]
                )
                for q in range(P)
            ]
            corpus_refs += [o[P] for o in outs]
            if sum(ray.get([o[P + 1] for o in outs])) == 0:
                break
            frontier = [[outs[p][q] for p in range(P)] for q in range(P)]
    return rd.from_arrow_refs(corpus_refs)
