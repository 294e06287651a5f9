"""HyperBall: neighborhood function + effective diameter via per-vertex HLL.

The canonical web-scale distance sketch (Boldi–Rosa–Vigna's HyperBall /
HyperANF, the algorithm behind the published web- and social-graph
effective-diameter numbers): every vertex carries a HyperLogLog sketch of
the set of vertices within distance t; one BSP round unions each vertex's
sketch with its neighbors' (elementwise register max), so after t rounds
register state describes the radius-t ball. The neighborhood function
NF(t) = Σ_v |ball_t(v)| then falls out as the sum of per-vertex HLL
estimates, and the effective diameter is the smallest t with
NF(t) ≥ q·NF(∞). Exact per-pair distances never materialize — the state
is V·2^p bytes and each round ships one register row per unique (shard,
dst), which is what makes the operator feasible at 10^12-turn scale where
all-pairs BFS is not.

Engine shape: the same one-time scatter/combine plans as CC/PageRank
(state.shards), with 2D uint8 register payloads — np.maximum.reduceat
pre-reduces per (shard, dst) before anything ships, owners elementwise-max
into their state, convergence = zero changed registers (then t has reached
the graph's diameter and NF is exact-in-the-sketch). Message volume per
round is O(unique dst · 2^p) bytes on the dense path; once the changed
fraction drops below _SPARSE_FRAC the round switches to the frontier
exchange (cc_bsp's dirty machinery, 2D): only register ROWS that changed
last round ship, as (dst_ids, rows) pieces. Max-merge is idempotent-
monotone, so a clean vertex's row was already applied the round after it
last changed and re-shipping it could never flip a register — results are
bit-identical to the dense path (the numpy twin stays exact). Late rounds
(the long tail past the effective diameter, where only the sketch fringe
still moves) cost O(frontier edges · 2^p), not O(E · 2^p).

Everything is DETERMINISTIC given the vid set (splitmix64 vid hashing, no
RNG), so the gate twin replicates the registers bit-for-bit in numpy and
the comparison is exact equality, not a tolerance band; sketch ACCURACY
vs the true neighborhood function is pinned separately by a small-graph
BFS test (tests/test_hyperball.py).

Reference analog: none (the reference has no distance operators); this is
the scale path the exact sampled-BFS queries (closeness_sample,
diameter_sweep) cannot take.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    reduce_routed_sparse,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)

# below this changed-row fraction a round ships only changed register rows.
# Higher than cc_bsp's 0.10: a register row is 2^p bytes (vs an 8-byte
# label), so the sparse path's extra per-row id and its per-round frontier
# sort are amortized across 8× the payload — sparse pays off much earlier
_SPARSE_FRAC = 0.50


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a full-avalanche 64-bit mix (public-domain
    constant set), vectorized over uint64. Plain odd-constant multiplies
    keep low-bit structure (vid parity would bias the bucket choice)."""
    z = v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _clz64(w: np.ndarray) -> np.ndarray:
    """Count of leading zero bits (returns 63 for 0 — callers cap rho)."""
    n = np.zeros(len(w), np.int64)
    x = w.copy()
    one = np.uint64(1)
    for s in (32, 16, 8, 4, 2, 1):
        mask = x < (one << np.uint64(64 - s))
        n[mask] += s
        x[mask] = x[mask] << np.uint64(s)
    return np.minimum(n, 63)


def init_registers(vids: np.ndarray, p: int) -> np.ndarray:
    """(n, 2^p) uint8 registers for the singleton sets {v}."""
    m = 1 << p
    reg = np.zeros((len(vids), m), np.uint8)
    if not len(vids):
        return reg
    h = _mix64(vids)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    reg[np.arange(len(vids)), bucket] = rho
    return reg


def hll_estimates(reg: np.ndarray, p: int) -> np.ndarray:
    """Standard HLL estimate per row (with the small-range linear-counting
    correction; no large-range correction — 64-bit hashes don't saturate).
    Fully deterministic: the numpy twin reproduces it exactly."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    s = np.power(2.0, -reg.astype(np.float64)).sum(axis=1)
    raw = alpha * m * m / s
    zeros = (reg == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (zeros > 0)
    out = raw.copy()
    if small.any():
        out[small] = m * np.log(m / zeros[small].astype(np.float64))
    return out


@ray.remote
def _hb_init(vids, p):
    return init_registers(vids, p)


@ray.remote
def _n_rows(vids) -> int:
    return int(len(vids))


@ray.remote
def _hb_scatter(plan, reg, P, m):
    """Per-dst elementwise register max, routed (2D reduce_routed)."""
    if plan["n_edges"] == 0:
        return [np.empty((0, m), np.uint8)] * P
    vals = reg[plan["edge_src_idx"]][plan["dst_order"]]
    red = np.maximum.reduceat(vals, plan["seg_starts"], axis=0)
    routed = red[plan["uniq_perm"]]
    b = plan["bounds"]
    return [routed[b[q] : b[q + 1]] for q in range(P)]


@ray.remote(num_returns=3)
def _hb_combine(q, cplan, reg, *msg_objs):
    """max-merge incoming register rows → (reg, dirty row mask, changed)."""
    nodirt = np.zeros(reg.shape[0], bool)
    if reg.shape[0] == 0 or cplan["total"] == 0:
        return reg, nodirt, 0
    pieces = [m[q] for m in msg_objs]
    vals = np.concatenate(pieces, axis=0)
    red = np.maximum.reduceat(vals[cplan["order"]], cplan["starts"], axis=0)
    new = reg.copy()
    pos = cplan["pos"]
    merged = np.maximum(new[pos], red)
    ch_rows = (merged != new[pos]).any(axis=1)
    new[pos] = merged
    nodirt[pos[ch_rows]] = True
    return new, nodirt, int(ch_rows.sum())


@ray.remote
def _hb_scatter_sparse(plan, reg, dirty, P):
    """Frontier register exchange: only rows dirty since their last send
    ship, pre-max-reduced per unique dst → grouped (dst_ids, rows) pieces."""
    return reduce_routed_sparse(plan, reg, dirty, np.maximum, P)


@ray.remote(num_returns=3)
def _hb_combine_sparse(q, vids, reg, *msg_objs):
    """Sparse-piece max-merge → (reg, dirty row mask, changed)."""
    nodirt = np.zeros(reg.shape[0], bool)
    pieces = [m[q] for m in msg_objs]
    ids = [p[0] for p in pieces if len(p[0])]
    if not ids:
        return reg, nodirt, 0
    d = np.concatenate(ids)
    v = np.concatenate([p[1] for p in pieces if len(p[0])], axis=0)
    idx = np.searchsorted(vids, d)
    order = np.argsort(idx, kind="stable")
    idx, v = idx[order], v[order]
    newb = np.empty(len(idx), bool)
    newb[0] = True
    newb[1:] = idx[1:] != idx[:-1]
    starts = np.nonzero(newb)[0]
    pos = idx[starts]
    red = np.maximum.reduceat(v, starts, axis=0)
    new = reg.copy()
    merged = np.maximum(new[pos], red)
    ch_rows = (merged != new[pos]).any(axis=1)
    new[pos] = merged
    nodirt[pos[ch_rows]] = True
    return new, nodirt, int(ch_rows.sum())


@ray.remote
def _all_dirty_rows(reg):
    return np.ones(reg.shape[0], bool)


def _hb_round(plans, cplans, vid_refs, reg, dirty, sparse, P, m):
    """One HyperBall union round → (reg refs, dirty refs, changed refs)."""
    if sparse:
        outs = [
            _hb_scatter_sparse.remote(plans[q], reg[q], dirty[q], P)
            for q in range(P)
        ]
        res = [
            _hb_combine_sparse.remote(q, vid_refs[q], reg[q], *outs)
            for q in range(P)
        ]
    else:
        outs = [_hb_scatter.remote(plans[q], reg[q], P, m) for q in range(P)]
        res = [_hb_combine.remote(q, cplans[q], reg[q], *outs) for q in range(P)]
    return [r[0] for r in res], [r[1] for r in res], [r[2] for r in res]


@ray.remote
def _hb_nf(reg, p) -> float:
    return float(hll_estimates(reg, p).sum()) if reg.shape[0] else 0.0


def hyperball(
    edges,
    *,
    p: int = 6,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 128,
    round_to: int = 4,
):
    """(per-round Dataset (t, nf_est), final per-shard register refs,
    rounds) for the undirected graph of ``edges``. NF(0) counts the
    singletons; the loop stops when no register changes (t = diameter)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    m = 1 << p
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)
    from ccl_ray.state.shards import combine_plans

    cplans = combine_plans(vid_refs, plans, P)

    reg = [_hb_init.remote(vid_refs[q], p) for q in range(P)]
    nf = [(0, float(sum(ray.get([_hb_nf.remote(r, p) for r in reg]))))]
    n_total = int(sum(ray.get([_n_rows.remote(v) for v in vid_refs])))
    dirty = [_all_dirty_rows.remote(r) for r in reg]
    last_changed = n_total
    t = 0
    while t < max_rounds:
        t += 1
        sparse = n_total > 0 and last_changed / n_total < _SPARSE_FRAC
        reg, dirty, ch = _hb_round(plans, cplans, vid_refs, reg, dirty, sparse, P, m)
        changed = last_changed = int(sum(ray.get(ch)))
        if changed == 0:
            break
        nf.append((t, float(sum(ray.get([_hb_nf.remote(r, p) for r in reg])))))

    table = pa.table(
        {
            "t": pa.array([x[0] for x in nf], pa.int64()),
            "nf_est": pa.array([round(x[1], round_to) for x in nf], pa.float64()),
        }
    )
    return rd.from_arrow(table), reg, len(nf) - 1


def hyperball_oracle(
    src: np.ndarray, dst: np.ndarray, vids: np.ndarray, *, p: int = 6,
    max_rounds: int = 128,
) -> tuple[list[tuple[int, float]], np.ndarray]:
    """Driver numpy twin — identical hashing, merge and estimate rules.
    Returns (per-round (t, nf) list, final registers aligned to sorted
    vids)."""
    vids = np.sort(np.asarray(vids, np.int64))
    s = np.searchsorted(vids, np.concatenate([src, dst]).astype(np.int64))
    d = np.searchsorted(vids, np.concatenate([dst, src]).astype(np.int64))
    keep = s != d
    s, d = s[keep], d[keep]
    reg = init_registers(vids, p)
    nf = [(0, float(hll_estimates(reg, p).sum()))]
    for t in range(1, max_rounds + 1):
        new = reg.copy()
        np.maximum.at(new, d, reg[s])
        if (new == reg).all():
            break
        reg = new
        nf.append((t, float(hll_estimates(reg, p).sum())))
    return nf, reg


@ray.remote(num_returns=2)
def _hb_harmonic_update(reg, prev_est, h_acc, t, p):
    """(new per-vertex estimates, updated harmonic accumulator): the
    HyperANF harmonic rule h += (|B_t| − |B_{t−1}|)/t per vertex."""
    est = hll_estimates(reg, p)
    return est, h_acc + (est - prev_est) / float(t)


@ray.remote
def _hb_harmonic_table(vids, h_acc, round_to):
    return pa.table(
        {
            "vid": pa.array(vids),
            "harmonic": pa.array(np.round(h_acc, round_to)),
        }
    )


def hyperball_harmonic(
    edges,
    *,
    p: int = 6,
    vertices=None,
    cfg: EngineConfig | None = None,
    max_rounds: int = 128,
    round_to: int = 6,
):
    """((vid, harmonic) Dataset, rounds) — per-vertex HARMONIC centrality
    estimates from the HyperBall register stream (Boldi–Vigna HyperANF:
    h(v) = Σ_t (|B_t(v)| − |B_{t−1}(v)|)/t, the sketch estimate of
    Σ_{u≠v} 1/d(v,u)). Same deterministic register loop as hyperball();
    the only extra per-round state is two float64 vectors per shard, so
    the exchange volume is unchanged. Deterministic given the vid set —
    the numpy twin reproduces values bit-for-bit."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    m = 1 << p
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P, vertices_ds=vertices)
    plans = scatter_plans(csr, vid_refs, P)
    from ccl_ray.state.shards import combine_plans

    cplans = combine_plans(vid_refs, plans, P)

    reg = [_hb_init.remote(vid_refs[q], p) for q in range(P)]

    @ray.remote(num_returns=2)
    def _init_acc(r, p):
        est = hll_estimates(r, p)
        return est, np.zeros(r.shape[0], np.float64)

    init = [_init_acc.remote(reg[q], p) for q in range(P)]
    prev = [i[0] for i in init]
    acc = [i[1] for i in init]
    n_total = int(sum(ray.get([_n_rows.remote(v) for v in vid_refs])))
    dirty = [_all_dirty_rows.remote(r) for r in reg]
    last_changed = n_total
    t = 0
    while t < max_rounds:
        t += 1
        sparse = n_total > 0 and last_changed / n_total < _SPARSE_FRAC
        reg, dirty, ch = _hb_round(plans, cplans, vid_refs, reg, dirty, sparse, P, m)
        changed = last_changed = int(sum(ray.get(ch)))
        upd = [
            _hb_harmonic_update.remote(reg[q], prev[q], acc[q], t, p)
            for q in range(P)
        ]
        prev = [u[0] for u in upd]
        acc = [u[1] for u in upd]
        if changed == 0:
            break

    tables = [
        _hb_harmonic_table.remote(vid_refs[q], acc[q], round_to) for q in range(P)
    ]
    return rd.from_arrow_refs(tables), t


def hyperball_harmonic_oracle(
    src: np.ndarray, dst: np.ndarray, vids: np.ndarray, *, p: int = 6,
    max_rounds: int = 128, round_to: int = 6,
) -> dict:
    """Driver numpy twin of hyperball_harmonic — identical hashing, merge,
    estimate and accumulation order. {vid: rounded harmonic}."""
    vids = np.sort(np.asarray(vids, np.int64))
    s = np.searchsorted(vids, np.concatenate([src, dst]).astype(np.int64))
    d = np.searchsorted(vids, np.concatenate([dst, src]).astype(np.int64))
    keep = s != d
    s, d = s[keep], d[keep]
    reg = init_registers(vids, p)
    prev = hll_estimates(reg, p)
    acc = np.zeros(len(vids), np.float64)
    for t in range(1, max_rounds + 1):
        new = reg.copy()
        np.maximum.at(new, d, reg[s])
        stop = (new == reg).all()
        reg = new
        est = hll_estimates(reg, p)
        acc = acc + (est - prev) / float(t)
        prev = est
        if stop:
            break
    return {int(v): float(r) for v, r in zip(vids, np.round(acc, round_to))}
