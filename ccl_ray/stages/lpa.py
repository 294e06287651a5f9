"""Synchronous label-propagation community detection (fixed-iteration,
min-label tie-break) — deterministic LPA.

Each round every vertex adopts the most frequent label among its
neighbors' CURRENT labels (smallest label on frequency ties; vertices with
no neighbors keep their own). Synchronous update + total tie order makes
the algorithm fully deterministic — the property that lets a SQL oracle
unroll the exact same rounds (unlike classic async LPA, whose result
depends on visit order).

Distributed shape per round (the message volume pre-reduces before it
ships — no raw O(E) label stream crosses partitions):

1. per shard: gather label[src] through the precomputed edge index, count
   (dst, label) pairs with one lexsort + run-length pass, route the COUNT
   triples by hash(dst);
2. per owner: merge + re-reduce counts, pick per dst the (max count, min
   label) winner with one (dst, −count, label) lexsort, apply.

Labels start as the vid itself, so community ids are min-style vids and
the whole computation is integer-exact.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    part_of,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@ray.remote
def _init_labels(vids):
    return vids.copy()


def _lpa_pieces(plan, csr, labels, P):
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if plan["n_edges"] == 0:
        return [empty] * P
    lab = labels[plan["edge_src_idx"]]
    dst = csr["dst"]
    order = np.lexsort((lab, dst))
    dst, lab = dst[order], lab[order]
    new = np.empty(len(dst), bool)
    new[0] = True
    new[1:] = (dst[1:] != dst[:-1]) | (lab[1:] != lab[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.concatenate([starts, [len(dst)]]))
    dst, lab = dst[starts], lab[starts]
    parts = part_of(dst, P)
    o = np.argsort(parts, kind="stable")
    dst, lab, cnt, parts = dst[o], lab[o], cnt[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    return [
        (dst[b[p] : b[p + 1]], lab[b[p] : b[p + 1]], cnt[b[p] : b[p + 1]])
        for p in range(P)
    ]


@ray.remote
def _lpa_scatter(plan, csr, labels, P):
    """Grouped protocol: one object of P pieces; combiners slice."""
    return _lpa_pieces(plan, csr, labels, P)


@ray.remote
def _lpa_scatter_f(plan, csr, labels, P):
    """Fanout protocol (num_returns=P): each combiner fetches only its
    piece — the multi-node mode, consistent with the other BSP stages."""
    out = _lpa_pieces(plan, csr, labels, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _lpa_combine(q, grouped, vids, labels, *msg_objs):
    if labels.size == 0:
        return labels
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    dst = np.concatenate([p[0] for p in pieces])
    if dst.size == 0:
        return labels
    lab = np.concatenate([p[1] for p in pieces])
    cnt = np.concatenate([p[2] for p in pieces])
    # merge duplicate (dst, lab) count partials
    order = np.lexsort((lab, dst))
    dst, lab, cnt = dst[order], lab[order], cnt[order]
    new = np.empty(len(dst), bool)
    new[0] = True
    new[1:] = (dst[1:] != dst[:-1]) | (lab[1:] != lab[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.add.reduceat(cnt, starts)
    dst, lab = dst[starts], lab[starts]
    # winner per dst: max count, then min label
    order = np.lexsort((lab, -cnt, dst))
    dst, lab = dst[order], lab[order]
    first = np.empty(len(dst), bool)
    first[0] = True
    first[1:] = dst[1:] != dst[:-1]
    dstw, labw = dst[first], lab[first]
    out = labels.copy()
    out[np.searchsorted(vids, dstw)] = labw
    return out


@ray.remote
def _lpa_table(vids, labels):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "community": pa.array(labels)})


def lpa_communities(
    edges,
    *,
    iterations: int = 5,
    vertices=None,
    cfg: EngineConfig | None = None,
):
    """(vid, community) after exactly ``iterations`` synchronous LPA rounds
    on the undirected simple graph; community ids are vids (start labels)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)

    labels = [_init_labels.remote(vid_refs[p]) for p in range(P)]
    for _ in range(iterations):
        if grouped:
            outs = [_lpa_scatter.remote(plans[p], csr[p], labels[p], P) for p in range(P)]
            labels = [
                _lpa_combine.remote(q, True, vid_refs[q], labels[q], *outs)
                for q in range(P)
            ]
        else:
            outs = [
                ([o] if P == 1 else list(o))
                for o in (
                    _lpa_scatter_f.options(num_returns=P).remote(
                        plans[p], csr[p], labels[p], P
                    )
                    for p in range(P)
                )
            ]
            labels = [
                _lpa_combine.remote(
                    q, False, vid_refs[q], labels[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
    tables = [_lpa_table.remote(vid_refs[p], labels[p]) for p in range(P)]
    return rd.from_arrow_refs(tables)
