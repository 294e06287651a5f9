"""sweep_cut (ACL conductance sweep) vs a sequential brute-force oracle."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.sweep import sweep_cut


def _brute(scores: dict, edges: list):
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda v: (-(scores[v] / deg[v]), v))
    vt = sum(deg.values())
    S = set()
    vol = 0
    internal = 0
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    best = None
    for k, v in enumerate(order, start=1):
        vol += deg[v]
        internal += sum(1 for u in adj[v] if u in S)
        S.add(v)
        if k >= len(order):
            break
        denom = min(vol, vt - vol)
        if denom <= 0:
            continue
        phi = (vol - 2 * internal) / denom
        if best is None or (phi, k) < best:
            best = (phi, k)
    return best[1], round(best[0], 6)


def _run(scores: dict, edges: list):
    ids = sorted(scores)
    sc = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "score": pa.array([float(scores[i]) for i in ids], pa.float64()),
        }
    )
    deg_counts = {}
    for a, b in edges:
        deg_counts[a] = deg_counts.get(a, 0) + 1
        deg_counts[b] = deg_counts.get(b, 0) + 1
    dg = pa.table(
        {
            "vid": pa.array(ids, pa.int64()),
            "degree": pa.array([deg_counts[i] for i in ids], pa.int64()),
        }
    )
    ed = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    out = sweep_cut(
        rd.from_arrow(sc).repartition(3),
        rd.from_arrow(dg).repartition(2),
        rd.from_arrow(ed).repartition(2),
    ).to_pandas()
    assert len(out) == 1
    return int(out["best_k"][0]), float(out["phi"][0])


def test_sweep_two_cliques_bridge():
    # two 4-cliques joined by one edge: the bridge cut (phi small) wins,
    # scores concentrated on clique A pull it first in the sweep
    ca, cb = [0, 1, 2, 3], [4, 5, 6, 7]
    edges = [(a, b) for i, a in enumerate(ca) for b in ca[i + 1:]]
    edges += [(a, b) for i, a in enumerate(cb) for b in cb[i + 1:]]
    edges.append((3, 4))
    scores = {v: (1.0 if v in ca else 0.01) for v in range(8)}
    want = _brute(scores, edges)
    assert want[0] == 4  # the clique-A prefix is the best cut
    got = _run(scores, edges)
    assert got == want


def test_sweep_random_vs_bruteforce():
    rng = np.random.RandomState(5)
    n = 40
    edges = set()
    for _ in range(120):
        a, b = rng.randint(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    present = sorted({v for e in edges for v in e})
    scores = {v: float(np.round(rng.rand(), 6)) for v in present}
    want = _brute(scores, edges)
    got = _run(scores, edges)
    assert got == want
