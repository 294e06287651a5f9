"""Wedge-based triangle counting with degree orientation (north-star op).

No reference precedent (the reference computes only components/lifetimes);
this is the standard distributed algorithm: orient every undirected edge
from its lower-(degree, vid) endpoint to the higher one — bounding oriented
out-degree by O(sqrt(m)), the skew defense for hub vertices — generate
wedges (b, c) from each vertex's oriented neighbor list, and count wedges
whose closing edge exists.

Execution: the same shard machinery as cc_bsp. Waves:
  1. symmetric deduped CSR shards (hash(src)) → per-vertex degree
  2. degree request/resolve exchange (each shard learns deg(dst) for its
     edge targets, routed by hash(dst))
  3. per-shard orientation filter + vectorized wedge generation (one
     triu_indices gather per distinct-degree class — no per-pair loops)
  4. wedge → owner-of-lo exchange; per-shard pandas merge against the
     oriented edge set; sum of matches = triangle count

Wedges are never globally materialized — each wave streams shard-to-shard
through the object store.
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import as_piece_list, part_of, shard_edges_csr, shard_vertices


_as_list = as_piece_list


@ray.remote
def _degrees(csr, vids):
    """Degree per vid of this shard (CSR is symmetric+deduped → outdeg=degree)."""
    deg = np.zeros(len(vids), dtype=np.int64)
    if csr["srcs"].size:
        deg[np.searchsorted(vids, csr["srcs"])] = csr["outdeg"]
    return deg


@ray.remote
def _deg_request(csr, P):
    """Unique dst vids this shard needs degrees for, routed by hash(dst)."""
    uniq = np.unique(csr["dst"])
    parts = part_of(uniq, P)
    order = np.argsort(parts, kind="stable")
    uniq, parts = uniq[order], parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple(uniq[bounds[p] : bounds[p + 1]] for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _deg_resolve(vids, deg, P, *requests):
    out = []
    for q in requests:
        out.append((q, deg[np.searchsorted(vids, q)]))
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _orient_and_wedges(csr, vids, deg, P, *resp_pieces):
    """Orient edges + generate wedges.

    Called with num_returns=P+1: P wedge pieces routed by hash(lo) — each
    downstream matcher fetches only its own piece — plus this shard's
    oriented edge set as the final return.
    """
    empty_pair = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    empty_wedge = (*empty_pair, np.empty(0, np.int64))
    if csr["srcs"].size == 0:
        return (*[empty_wedge] * P, empty_pair)

    # degree lookup for dst endpoints (from the resolve wave)
    q = np.concatenate([r[0] for r in resp_pieces])
    qd = np.concatenate([r[1] for r in resp_pieces])
    order = np.argsort(q, kind="stable")
    q, qd = q[order], qd[order]

    src = np.repeat(csr["srcs"], csr["outdeg"])
    dst = csr["dst"]
    deg_s = np.repeat(deg[np.searchsorted(vids, csr["srcs"])], csr["outdeg"])
    deg_d = qd[np.searchsorted(q, dst)]

    # orient lower (deg, vid) -> higher; each undirected edge appears twice in
    # the symmetric CSR, so exactly one direction survives
    keep = (deg_s < deg_d) | ((deg_s == deg_d) & (src < dst))
    lo, hi = src[keep], dst[keep]
    lo_deg, hi_deg = deg_s[keep], deg_d[keep]

    # group by lo (already sorted by src within CSR, keep preserves order)
    srcs_u, start = np.unique(lo, return_index=True)
    counts = np.diff(np.concatenate([start, [len(lo)]]))

    # vectorized wedge generation: one gather per distinct out-degree class
    wb_parts, wc_parts, wa_parts = [], [], []
    for k in np.unique(counts):
        if k < 2:
            continue
        sel = counts == k
        starts_k = start[sel]
        gather = starts_k[:, None] + np.arange(k)[None, :]
        nb = hi[gather]          # (g, k) neighbor vids
        nbd = hi_deg[gather]     # neighbor degrees
        apex = lo[starts_k]      # wedge apex vertex per group
        ii, jj = np.triu_indices(k, 1)
        b, c = nb[:, ii].ravel(), nb[:, jj].ravel()
        bd, cd = nbd[:, ii].ravel(), nbd[:, jj].ravel()
        swap = (cd < bd) | ((cd == bd) & (c < b))
        wb_parts.append(np.where(swap, c, b))
        wc_parts.append(np.where(swap, b, c))
        wa_parts.append(np.repeat(apex, len(ii)))
    if wb_parts:
        wlo = np.concatenate(wb_parts)
        whi = np.concatenate(wc_parts)
        wap = np.concatenate(wa_parts)
    else:
        wlo, whi = empty_pair
        wap = np.empty(0, np.int64)

    parts = part_of(wlo, P)
    o = np.argsort(parts, kind="stable")
    wlo, whi, wap, parts = wlo[o], whi[o], wap[o], parts[o]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    wedge_out = tuple(
        (
            wlo[bounds[p] : bounds[p + 1]],
            whi[bounds[p] : bounds[p + 1]],
            wap[bounds[p] : bounds[p + 1]],
        )
        for p in range(P)
    )
    return (*wedge_out, (lo, hi))


@ray.remote
def _count_matches(oriented, *wedge_pieces):
    """Triangles closed in this shard: wedges whose (lo,hi) is an oriented edge."""
    import pandas as pd

    lo, hi = oriented
    if lo.size == 0:
        return 0
    wl = np.concatenate([w[0] for w in wedge_pieces])
    wh = np.concatenate([w[1] for w in wedge_pieces])
    if wl.size == 0:
        return 0
    edges = pd.DataFrame({"lo": lo, "hi": hi})
    wedges = pd.DataFrame({"lo": wl, "hi": wh})
    return int(len(wedges.merge(edges, on=["lo", "hi"], how="inner")))


@ray.remote
def _match_per_vertex(P, oriented, *wedge_pieces):
    """Matched triangles -> per-vertex increments routed by hash(vid).

    Each matched wedge (lo,hi,apex) is one triangle: +1 to all three
    vertices. Returns P (vids, counts) pieces (num_returns=P)."""
    import pandas as pd

    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    lo, hi = oriented
    wl = np.concatenate([w[0] for w in wedge_pieces]) if wedge_pieces else np.empty(0, np.int64)
    if lo.size == 0 or wl.size == 0:
        return empty if P == 1 else tuple(empty for _ in range(P))
    wh = np.concatenate([w[1] for w in wedge_pieces])
    wa = np.concatenate([w[2] for w in wedge_pieces])
    edges = pd.DataFrame({"lo": lo, "hi": hi, "e": 1})
    wedges = pd.DataFrame({"lo": wl, "hi": wh, "a": wa})
    m = wedges.merge(edges, on=["lo", "hi"], how="inner")
    tri_v = np.concatenate([m["lo"].values, m["hi"].values, m["a"].values]).astype(np.int64)
    vids, cnts = np.unique(tri_v, return_counts=True)
    parts = part_of(vids, P)
    o = np.argsort(parts, kind="stable")
    vids, cnts, parts = vids[o], cnts[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((vids[b[p] : b[p + 1]], cnts[b[p] : b[p + 1]].astype(np.int64)) for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _match_per_edge(P, oriented, *wedge_pieces):
    """Matched triangles -> per-EDGE increments routed by hash(min endpoint).

    Each matched wedge (lo, hi, apex) is one triangle whose three edges
    (apex,lo), (apex,hi), (lo,hi) each gain +1 support. Pairs are
    canonicalized (min, max) — the oriented order is by (degree, vid), not
    vid. Returns P ((a, b, counts)) pieces (num_returns=P)."""
    import pandas as pd

    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    lo, hi = oriented
    wl = np.concatenate([w[0] for w in wedge_pieces]) if wedge_pieces else np.empty(0, np.int64)
    if lo.size == 0 or wl.size == 0:
        return empty if P == 1 else tuple(empty for _ in range(P))
    wh = np.concatenate([w[1] for w in wedge_pieces])
    wa = np.concatenate([w[2] for w in wedge_pieces])
    edges = pd.DataFrame({"lo": lo, "hi": hi})
    wedges = pd.DataFrame({"lo": wl, "hi": wh, "a": wa})
    m = wedges.merge(edges, on=["lo", "hi"], how="inner")
    if not len(m):
        return empty if P == 1 else tuple(empty for _ in range(P))
    ml, mh, ma = m["lo"].values, m["hi"].values, m["a"].values
    u = np.concatenate([np.minimum(ma, ml), np.minimum(ma, mh), np.minimum(ml, mh)])
    v = np.concatenate([np.maximum(ma, ml), np.maximum(ma, mh), np.maximum(ml, mh)])
    # local pre-reduce before routing
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    new = np.empty(len(u), bool)
    new[0] = True
    new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.add.reduceat(np.ones(len(u), np.int64), starts)
    u, v = u[starts], v[starts]
    parts = part_of(u, P)
    o = np.argsort(parts, kind="stable")
    u, v, cnt, parts = u[o], v[o], cnt[o], parts[o]
    b = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((u[b[p] : b[p + 1]], v[b[p] : b[p + 1]], cnt[b[p] : b[p + 1]])
                for p in range(P))
    return out[0] if P == 1 else out


@ray.remote
def _reduce_pair_counts(*pieces):
    import pyarrow as pa

    u = np.concatenate([p[0] for p in pieces])
    v = np.concatenate([p[1] for p in pieces])
    c = np.concatenate([p[2] for p in pieces])
    if u.size == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    order = np.lexsort((v, u))
    u, v, c = u[order], v[order], c[order]
    new = np.empty(len(u), bool)
    new[0] = True
    new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(new)[0]
    return pa.table({"src": pa.array(u[starts]), "dst": pa.array(v[starts]),
                     "support": pa.array(np.add.reduceat(c, starts))})


def edge_triangle_support(edges, *, cfg: EngineConfig | None = None):
    """(src, dst, support) per canonical undirected edge in ≥1 triangle —
    support = number of triangles through the edge (the k-truss invariant;
    a k-truss keeps edges with support ≥ k−2).

    Same four waves as triangle_count; matched wedges fan out +1 to each of
    their triangle's three canonical edges, routed by hash(min endpoint)
    and pair-reduced per partition — never a global edge materialization."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
            _deg_resolve.options(num_returns=P).remote(
                vid_refs[p], deg[p], P, *[reqs[q][p] for q in range(P)]
            ),
            P,
        )
        for p in range(P)
    ]
    ow = [
        list(
            _orient_and_wedges.options(num_returns=P + 1).remote(
                csr[p], vid_refs[p], deg[p], P, *[resolved[q][p] for q in range(P)]
            )
        )
        for p in range(P)
    ]
    routed = [
        _as_list(
            _match_per_edge.options(num_returns=P).remote(
                P, ow[q][P], *[ow[p][q] for p in range(P)]
            ),
            P,
        )
        for q in range(P)
    ]
    tables = [_reduce_pair_counts.remote(*[routed[q][r] for q in range(P)]) for r in range(P)]
    return rd.from_arrow_refs(tables)


def ktruss(edges, k: int = 3, *, cfg: EngineConfig | None = None,
           max_rounds: int | None = None):
    """k-truss of the undirected simple graph: the maximal subgraph whose
    every edge closes ≥ k−2 triangles WITHIN the subgraph. Returns
    (edges Dataset of canonical (src, dst), rounds).

    Classic iterative peel: recompute per-edge support over the surviving
    edge set (edge_triangle_support — the full oriented-wedge wave, so each
    round is O(E·sqrt(E)/P) worst case), drop edges below k−2, repeat until
    the edge count is stable. Rounds = peel depth (small in practice; the
    events graph at sf0.01 stabilizes in ≤2). ``max_rounds`` raises beyond
    an oracle's unrolled cap."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cfg = cfg or EngineConfig()
    need = k - 2
    assert need >= 1, "ktruss requires k >= 3"

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("support"), need)
        return batch.filter(mask).select(["src", "dst"])

    cur = edges.select_columns(["src", "dst"]).materialize()
    prev_n = None
    rounds = 0
    while True:
        sup = edge_triangle_support(cur, cfg=cfg)
        cur = sup.map_batches(keep, batch_format="pyarrow").materialize()
        rounds += 1
        n = cur.count()
        if prev_n is not None and n == prev_n:
            break
        if n == 0:
            # explicit typed empty result: an all-empty materialized Dataset
            # loses its schema (None), which breaks downstream consumers
            import ray.data as rd

            cur = rd.from_arrow(
                pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
            )
            break
        # (stability already broke out above, so reaching the cap means
        # the edge set was still changing this round)
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(f"ktruss did not stabilize within {max_rounds} rounds")
        prev_n = n
    return cur, rounds


@ray.remote
def _reduce_counts(*pieces):
    import pyarrow as pa

    vids = np.concatenate([p[0] for p in pieces])
    cnts = np.concatenate([p[1] for p in pieces])
    if vids.size == 0:
        return pa.table({"vid": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())})
    order = np.argsort(vids, kind="stable")
    vids, cnts = vids[order], cnts[order]
    uniq, start = np.unique(vids, return_index=True)
    sums = np.add.reduceat(cnts, start)
    return pa.table({"vid": pa.array(uniq), "n_triangles": pa.array(sums)})


def triangle_count(edges, *, cfg: EngineConfig | None = None) -> int:
    """Exact triangle count of the undirected simple graph underlying ``edges``."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]

    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
            _deg_resolve.options(num_returns=P).remote(
                vid_refs[p], deg[p], P, *[reqs[q][p] for q in range(P)]
            ),
            P,
        )
        for p in range(P)
    ]
    ow = [
        list(
            _orient_and_wedges.options(num_returns=P + 1).remote(
                csr[p], vid_refs[p], deg[p], P, *[resolved[q][p] for q in range(P)]
            )
        )
        for p in range(P)
    ]
    counts = [
        _count_matches.remote(ow[q][P], *[ow[p][q] for p in range(P)]) for q in range(P)
    ]
    return int(sum(ray.get(counts)))


def triangle_counts_per_vertex(edges, *, cfg: EngineConfig | None = None):
    """(vid, n_triangles) per vertex with >=1 triangle.

    Same waves as triangle_count, but matched wedges carry their apex so
    each triangle credits all three vertices; per-vertex increments are
    exchanged by hash(vid) and reduced per partition.
    """
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [_as_list(_deg_request.options(num_returns=P).remote(csr[p], P), P) for p in range(P)]
    resolved = [
        _as_list(
            _deg_resolve.options(num_returns=P).remote(
                vid_refs[p], deg[p], P, *[reqs[q][p] for q in range(P)]
            ),
            P,
        )
        for p in range(P)
    ]
    ow = [
        list(
            _orient_and_wedges.options(num_returns=P + 1).remote(
                csr[p], vid_refs[p], deg[p], P, *[resolved[q][p] for q in range(P)]
            )
        )
        for p in range(P)
    ]
    routed = [
        _as_list(
            _match_per_vertex.options(num_returns=P).remote(
                P, ow[q][P], *[ow[p][q] for p in range(P)]
            ),
            P,
        )
        for q in range(P)
    ]
    tables = [_reduce_counts.remote(*[routed[q][r] for q in range(P)]) for r in range(P)]
    import ray.data as rd

    return rd.from_arrow_refs(tables)


def clustering_coefficient(edges, *, vertices=None, cfg: EngineConfig | None = None):
    """(vid, degree, n_triangles, lcc) — local clustering coefficient.

    lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, else 0.0; T from
    triangle_counts_per_vertex (vertices in no triangle → 0), deg = distinct
    neighbors (aggregates.degrees). One hash-partitioned left join; lcc is
    rounded to 6 decimals (both factors are exact ints, so the rounding only
    normalizes the float division for oracle comparison).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ccl_ray.stages.aggregates import degrees
    from ccl_ray.stages.exchange import hash_join

    cfg = cfg or EngineConfig()
    deg = degrees(edges, vertices)
    tri = triangle_counts_per_vertex(edges, cfg=cfg).rename_columns({"vid": "tvid"})
    # right side is ALL-empty on triangle-free graphs (sf0.001 events), where
    # Ray 2.49 loses the schema — pass it statically; hash_join's _tagged
    # pass normalizes block types, so no to_arrow_blocks needed
    joined = hash_join(
        deg, tri,
        left_on="vid", right_on="tvid", how="left outer",
        num_partitions=cfg.num_partitions,
        right_schema=[("tvid", pa.int64()), ("n_triangles", pa.int64())],
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.fill_null(batch.column("n_triangles"), 0).to_numpy(zero_copy_only=False)
        denom = d.astype(np.float64) * (d - 1)
        lcc = np.where(d >= 2, 2.0 * t / np.where(denom == 0, 1.0, denom), 0.0)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "degree": pa.array(d),
                "n_triangles": pa.array(t.astype(np.int64)),
                "lcc": pa.array(np.round(lcc, 6)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
