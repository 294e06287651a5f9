"""Full core decomposition (per-vertex coreness) via iterated H-index.

c⁰(v) = deg(v); cᵗ(v) = H({cᵗ⁻¹(u) : u ∈ N(v)}), where H is the H-index
of the multiset (the largest h such that at least h values are ≥ h).
The sequence is pointwise non-increasing and converges to the core number
of every vertex (Lü, Chen, Ren, Zhou, Zhang & Zhou, "The H-index of a
network node and its relation to degree and coreness", Nat. Commun. 2016).
Every step is a pure deterministic function of the graph — the property
that lets a SQL oracle unroll the exact same rounds (the MIS pattern).

Distributed shape per round (plan machinery from state/shards.py):
1. per shard: neighbor values c[edge_src_idx] are run-length encoded per
   (dst, value) — one lexsort + RLE — and routed by hash(dst), so message
   volume pre-reduces to the number of DISTINCT (dst, value) pairs per
   shard (≤ E, typically ≪ E once values collapse toward the core
   numbers);
2. per owner: merge the (dst, value, count) pieces, one lexsort by
   (dst, value desc), segmented cumsum of counts, and
   H = max(min(value, cumulative count)) per dst segment — all reduceat,
   no Python loops;
3. new c = min(old c, H); the loop ends when no vertex changed.

Unlike min-label CC the combine is NOT a simple reduction (H needs the
full value multiset), so there is no sparse-frontier shortcut: every
round ships the RLE'd multiset. Rounds are graph-dependent (long induced
paths converge one hop per round); callers that need a hard bound pass
``max_rounds`` and the function raises if exceeded, which is what keeps
the unrolled SQL twin exact.

The reference's raster engine has no coreness analog; this generalizes
its per-slice relabel sweeps (ccl_marker_stack.py) to a degeneracy
decomposition of the transcript graph.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@ray.remote
def _init_core(vids, csr):
    """c⁰ = undirected degree (0 for isolated vertices)."""
    c = np.zeros(len(vids), np.int64)
    if csr["srcs"].size:
        c[np.searchsorted(vids, csr["srcs"])] = csr["outdeg"]
    return c


def _rle_pieces(plan, c, P):
    """Per-(dst, value) counts of neighbor values, routed by hash(dst)."""
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    if plan["n_edges"] == 0:
        return [empty] * P
    vals = c[plan["edge_src_idx"]]
    u = plan["edge_uniq"]
    order = np.lexsort((vals, u))
    u_s, v_s = u[order], vals[order]
    new = np.empty(len(u_s), bool)
    new[0] = True
    new[1:] = (u_s[1:] != u_s[:-1]) | (v_s[1:] != v_s[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, len(u_s)))
    u_r, v_r = u_s[starts], v_s[starts]
    parts = plan["uniq_part"][u_r]
    o2 = np.argsort(parts, kind="stable")
    u_r, v_r, cnt, parts = u_r[o2], v_r[o2], cnt[o2], parts[o2]
    b = np.searchsorted(parts, np.arange(P + 1))
    ids = plan["uniq_dst"][u_r]
    return [
        (ids[b[p] : b[p + 1]], v_r[b[p] : b[p + 1]], cnt[b[p] : b[p + 1]])
        for p in range(P)
    ]


@ray.remote
def _core_scatter(plan, c, P):
    return _rle_pieces(plan, c, P)


@ray.remote
def _core_scatter_f(plan, c, P):
    out = _rle_pieces(plan, c, P)
    return out[0] if P == 1 else tuple(out)


@ray.remote(num_returns=2)
def _core_combine(q, grouped, vids, c, *msg_objs):
    """(new c, changed count): H-index of the merged neighbor multiset."""
    if c.size == 0:
        return c, 0
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    pieces = [p for p in pieces if len(p[0])]
    if not pieces:
        return c, 0
    ids = np.concatenate([p[0] for p in pieces])
    vals = np.concatenate([p[1] for p in pieces])
    cnts = np.concatenate([p[2] for p in pieces])
    idx = np.searchsorted(vids, ids)
    # per dst: values DESC, then cumulative count; H = max(min(val, cum))
    order = np.lexsort((-vals, idx))
    idx, vals, cnts = idx[order], vals[order], cnts[order]
    new_seg = np.empty(len(idx), bool)
    new_seg[0] = True
    new_seg[1:] = idx[1:] != idx[:-1]
    starts = np.nonzero(new_seg)[0]
    cum = np.cumsum(cnts)
    base = np.repeat(cum[starts] - cnts[starts], np.diff(np.append(starts, len(idx))))
    within = cum - base
    h = np.maximum.reduceat(np.minimum(vals, within), starts)
    pos = idx[starts]
    new = c.copy()
    new[pos] = np.minimum(new[pos], h)
    return new, int((new != c).sum())


@ray.remote
def _core_table(vids, c):
    import pyarrow as pa

    return pa.table({"vid": pa.array(vids), "coreness": pa.array(c)})


@ray.remote
def _c_state(c):
    return {"c": c}


@ray.remote
def _c_restore(loaded):
    return loaded["c"].astype(np.int64, copy=False)


def core_decomposition(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 256,
    checkpoint=None,
):
    """((vid, coreness) Dataset, rounds run) for the undirected simple
    graph of ``edges`` (deduped, loop-free). Raises if the H-index
    fixpoint needs more than ``max_rounds`` rounds — callers pairing this
    with an unrolled SQL twin pass the twin's unroll depth here.

    ``checkpoint``: a ``state.checkpoint.StateCheckpoint(root, ["c"])``
    persists the per-shard value vector each round (atomic manifest, vid
    fingerprint validated); a killed run resumes from the newest complete
    round — the H-index iteration is synchronous-deterministic and
    monotone, so the resumed run reaches the identical fixpoint."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)

    rounds = 0
    c = None
    if checkpoint is not None:
        from ccl_ray.state.checkpoint import vid_fingerprint

        resumed = checkpoint.latest(
            expected_parts=P, expected_vid_fp=vid_fingerprint(vid_refs)
        )
        if resumed is not None:
            rounds, refs, _extra = resumed
            c = [_c_restore.remote(r) for r in refs]
            # the newest checkpoint may BE the fixpoint (saved changed==0);
            # re-entering the loop would run one extra no-op round and
            # report rounds+1, breaking the identical-round-count contract
            if _extra and int(_extra.get("changed", 1)) == 0:
                tables = [_core_table.remote(vid_refs[p], c[p]) for p in range(P)]
                return rd.from_arrow_refs(tables), rounds
    if c is None:
        c = [_init_core.remote(vid_refs[p], csr[p]) for p in range(P)]
    while True:
        rounds += 1
        if grouped:
            outs = [_core_scatter.remote(plans[p], c[p], P) for p in range(P)]
            res = [
                _core_combine.remote(q, True, vid_refs[q], c[q], *outs)
                for q in range(P)
            ]
        else:
            outs = [
                ([o] if P == 1 else list(o))
                for o in (
                    _core_scatter_f.options(num_returns=P).remote(plans[p], c[p], P)
                    for p in range(P)
                )
            ]
            res = [
                _core_combine.remote(
                    q, False, vid_refs[q], c[q], *[outs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        c = [r[0] for r in res]
        changed = int(sum(ray.get([r[1] for r in res])))
        if checkpoint is not None:
            checkpoint.save(
                rounds, vid_refs, [_c_state.remote(x) for x in c],
                extra={"changed": changed},
            )
        if changed == 0:
            break
        if rounds >= max_rounds:
            raise AssertionError(f"coreness exceeded max_rounds={max_rounds}")

    tables = [_core_table.remote(vid_refs[p], c[p]) for p in range(P)]
    return rd.from_arrow_refs(tables), rounds
