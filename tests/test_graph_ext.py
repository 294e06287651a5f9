"""BFS hops, k-core, link prediction, clustering coefficient, personalized
PageRank — the round-3 link-graph extension stages vs serial numpy oracles.

Oracles are O(V·E) serial reference implementations written here (no
networkx in the container); engine runs use P>1 to exercise the routed
exchange, and P=1 vs P=8 agreement pins partition invariance.
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.bfs import bfs_hops
from ccl_ray.stages.kcore import kcore_bsp
from ccl_ray.stages.linkpred import common_neighbors_topk
from ccl_ray.stages.pagerank_bsp import pagerank_bsp


def _edges_ds(src, dst, blocks=3):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(blocks)


def _vids_ds(vids):
    return rd.from_arrow(pa.table({"vid": pa.array(vids, pa.int64())}))


def _adj(src, dst, vids):
    """dict vid -> set of distinct neighbors (undirected, loop-free)."""
    nbr = {int(v): set() for v in vids}
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    return nbr


def _bfs_oracle(nbr, seeds):
    from collections import deque

    dist = {v: None for v in nbr}
    q = deque()
    for s in seeds:
        if s in dist:
            dist[s] = 0
            q.append(s)
    while q:
        u = q.popleft()
        for w in nbr[u]:
            if dist[w] is None:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _kcore_oracle(nbr, k):
    alive = {v: True for v in nbr}
    changed = True
    while changed:
        changed = False
        for v in nbr:
            if alive[v] and sum(alive[w] for w in nbr[v]) < k:
                alive[v] = False
                changed = True
    return alive


def _random_graph(seed, n=120, m=400):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n, m), rng.randint(0, n, m), np.arange(n)


def test_bfs_hops_vs_oracle():
    src, dst, vids = _random_graph(3)
    seeds = [0, 17, 55]
    nbr = _adj(src, dst, vids)
    want = _bfs_oracle(nbr, seeds)
    for P in (1, 8):
        res = bfs_hops(
            _edges_ds(src, dst), _vids_ds(seeds), vertices=_vids_ds(vids),
            cfg=EngineConfig(num_partitions=P),
        )
        df = res.dists.to_pandas()
        got = {
            int(v): (None if d is None or (isinstance(d, float) and np.isnan(d)) else int(d))
            for v, d in zip(df["vid"], df["dist"].astype(object))
        }
        assert got == want, f"P={P}"


def test_bfs_unreachable_and_seed_dedup():
    # two components; seeds only in the first, duplicated seed rows
    src = [0, 1, 10, 11]
    dst = [1, 2, 11, 12]
    res = bfs_hops(
        _edges_ds(src, dst), _vids_ds([0, 0, 2]),
        vertices=_vids_ds(range(13)), cfg=EngineConfig(num_partitions=4),
    )
    df = res.dists.to_pandas().set_index("vid")["dist"]
    assert df[0] == 0 and df[2] == 0 and df[1] == 1
    for v in (10, 11, 12, 5):
        assert df[v] is None or np.isnan(df[v])


def test_bfs_max_rounds_raises():
    src = list(range(0, 30))
    dst = list(range(1, 31))
    import pytest

    with pytest.raises(RuntimeError):
        bfs_hops(
            _edges_ds(src, dst), _vids_ds([0]), cfg=EngineConfig(num_partitions=2),
            max_rounds=5,
        )


def test_kcore_vs_oracle():
    src, dst, vids = _random_graph(11, n=100, m=260)
    nbr = _adj(src, dst, vids)
    for k in (2, 3):
        want = _kcore_oracle(nbr, k)
        for P in (1, 8):
            res = kcore_bsp(
                _edges_ds(src, dst), k, vertices=_vids_ds(vids),
                cfg=EngineConfig(num_partitions=P),
            )
            df = res.membership.to_pandas()
            got = dict(zip(df["vid"].astype(int), df["in_core"].astype(bool)))
            assert got == want, f"k={k} P={P}"


def test_kcore_triangle_plus_tail():
    # triangle {0,1,2} is the 2-core; the tail 2-3-4 peels off layer by layer
    src = [0, 1, 2, 2, 3]
    dst = [1, 2, 0, 3, 4]
    res = kcore_bsp(_edges_ds(src, dst), 2, cfg=EngineConfig(num_partitions=2))
    df = res.membership.to_pandas()
    got = dict(zip(df["vid"].astype(int), df["in_core"].astype(bool)))
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False}
    assert res.iterations >= 2  # peeling takes a wave per layer


def _cn_oracle(nbr, k):
    rows = []
    vs = sorted(nbr)
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            if b in nbr[a]:
                continue
            c = len(nbr[a] & nbr[b])
            if c > 0:
                rows.append((a, b, c))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_common_neighbors_vs_oracle():
    src, dst, vids = _random_graph(29, n=60, m=150)
    nbr = _adj(src, dst, vids)
    want = _cn_oracle(nbr, 20)
    for P in (1, 4):
        for cap in (512, 4):  # cap=4 forces the exact hub wedge path
            t = common_neighbors_topk(
                _edges_ds(src, dst), k=20, cfg=EngineConfig(num_partitions=P),
                max_center_degree=cap,
            )
            got = list(zip(*(t.column(c).to_pylist() for c in ("a", "b", "common_neighbors"))))
            assert got == want, f"P={P} cap={cap}"


def test_common_neighbors_degree_cap():
    # star center 0 with 10 leaves: every leaf pair shares neighbor 0
    src = [0] * 10
    dst = list(range(1, 11))
    t = common_neighbors_topk(_edges_ds(src, dst), k=5, cfg=EngineConfig(num_partitions=2))
    assert t.num_rows == 5
    assert t.column("common_neighbors").to_pylist() == [1] * 5
    # a cap below the hub degree routes the star center through the exact
    # hub path — the result must be identical, never truncated
    t2 = common_neighbors_topk(
        _edges_ds(src, dst), k=5, cfg=EngineConfig(num_partitions=2),
        max_center_degree=4,
    )
    assert t2.equals(t)


def _ppr_oracle(src, dst, vids, seeds, damping=0.85, iters=60):
    """Serial personalized PageRank: symmetric edges, restart at seeds."""
    nbr = {int(v): [] for v in vids}
    for s, d in zip(src, dst):
        nbr[int(s)].append(int(d))
        nbr[int(d)].append(int(s))
    idx = {v: i for i, v in enumerate(sorted(nbr))}
    n = len(idx)
    r = np.zeros(n)
    for s in seeds:
        r[idx[s]] += 1.0
    r /= r.sum()
    x = r.copy()
    deg = np.array([len(nbr[v]) for v in sorted(nbr)], dtype=float)
    for _ in range(iters):
        nx = np.zeros(n)
        for v, i in idx.items():
            if deg[i]:
                share = x[i] / deg[i]
                for w in nbr[v]:
                    nx[idx[w]] += share
        dangling = x[deg == 0].sum()
        x = (1 - damping) * r + damping * (nx + dangling * r)
    return {v: x[i] for v, i in idx.items()}


def test_personalized_pagerank_vs_oracle():
    src, dst, vids = _random_graph(41, n=80, m=200)
    seeds = [0, 7, 31]
    want = _ppr_oracle(src, dst, vids, seeds)
    res = pagerank_bsp(
        _edges_ds(src, dst), vertices=_vids_ds(vids),
        cfg=EngineConfig(num_partitions=4, pr_tol=1e-12, pr_max_iters=200),
        symmetrize=True, personalization=_vids_ds(seeds),
    )
    df = res.scores.to_pandas()
    got = dict(zip(df["vid"].astype(int), df["score"]))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_weighted_seeds_and_bad_seeds():
    src = [0, 1, 2]
    dst = [1, 2, 3]
    seeds = rd.from_arrow(
        pa.table({"vid": pa.array([0, 3], pa.int64()),
                  "weight": pa.array([3.0, 1.0], pa.float64())})
    )
    res = pagerank_bsp(
        _edges_ds(src, dst), cfg=EngineConfig(num_partitions=2, pr_tol=1e-10),
        symmetrize=True, personalization=seeds,
    )
    df = res.scores.to_pandas()
    got = dict(zip(df["vid"].astype(int), df["score"]))
    # 3x restart weight at 0 vs 1 at 3 -> strictly more mass at 0
    assert got[0] > got[3]
    # seeds with no positive weight on graph vertices -> ValueError
    import pytest

    bad = rd.from_arrow(pa.table({"vid": pa.array([999], pa.int64())}))
    with pytest.raises(ValueError):
        pagerank_bsp(
            _edges_ds(src, dst), cfg=EngineConfig(num_partitions=2),
            symmetrize=True, personalization=bad,
        )


def _aa_oracle(nbr, k):
    import math

    rows = []
    vs = sorted(nbr)
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            if b in nbr[a]:
                continue
            shared = nbr[a] & nbr[b]
            if shared:
                s = sum(1.0 / math.log(len(nbr[c])) for c in shared)
                rows.append((a, b, round(s, 6)))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_adamic_adar_vs_oracle():
    from ccl_ray.stages.linkpred import adamic_adar_topk

    src, dst, vids = _random_graph(53, n=60, m=150)
    nbr = _adj(src, dst, vids)
    want = _aa_oracle(nbr, 20)
    for P in (1, 4):
        for cap in (512, 4):
            t = adamic_adar_topk(
                _edges_ds(src, dst), k=20, cfg=EngineConfig(num_partitions=P),
                max_center_degree=cap,
            )
            got = list(zip(t.column("a").to_pylist(), t.column("b").to_pylist(),
                           t.column("aa_score").to_pylist()))
            assert got == want, f"P={P} cap={cap}"


def test_bfs_sparse_dense_fanout_agree(monkeypatch):
    """Force always-sparse and never-sparse; both must equal the oracle in
    both exchange modes (the hybrid default sits between them)."""
    import ccl_ray.stages.bfs as bfsmod

    src, dst, vids = _random_graph(77, n=200, m=500)
    seeds = [3, 50]
    want = _bfs_oracle(_adj(src, dst, vids), seeds)

    def run():
        res = bfs_hops(
            _edges_ds(src, dst), _vids_ds(seeds), vertices=_vids_ds(vids),
            cfg=EngineConfig(num_partitions=4, exchange=mode),
        )
        df = res.dists.to_pandas()
        return {
            int(v): (None if d is None or (isinstance(d, float) and np.isnan(d)) else int(d))
            for v, d in zip(df["vid"], df["dist"].astype(object))
        }

    for mode in ("grouped", "fanout"):
        for frac in (0.0, 1.1):
            monkeypatch.setattr(bfsmod, "_SPARSE_FRAC", frac)
            assert run() == want, f"mode={mode} frac={frac}"


def test_kcore_delta_fanout_deep_peel():
    """A long path peels one layer per round from both ends (many delta
    rounds); both exchange modes must match the oracle."""
    n = 40
    src = list(range(n - 1))
    dst = list(range(1, n))
    nbr = _adj(np.array(src), np.array(dst), np.arange(n))
    want = _kcore_oracle(nbr, 2)
    for mode in ("grouped", "fanout"):
        res = kcore_bsp(
            _edges_ds(src, dst), 2, cfg=EngineConfig(num_partitions=4, exchange=mode)
        )
        df = res.membership.to_pandas()
        got = dict(zip(df["vid"].astype(int), df["in_core"].astype(bool)))
        assert got == want, mode
        assert res.iterations >= n // 2 - 2  # one layer per round from each end


def _jaccard_oracle(nbr, k):
    rows = []
    vs = sorted(nbr)
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            if b in nbr[a]:
                continue
            inter = len(nbr[a] & nbr[b])
            if inter == 0:
                continue
            jac = round(inter / len(nbr[a] | nbr[b]), 6)
            rows.append((a, b, jac))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_jaccard_topk_vs_oracle():
    from ccl_ray.stages.linkpred import jaccard_topk

    src, dst, vids = _random_graph(41, n=60, m=150)
    nbr = _adj(src, dst, vids)
    want = _jaccard_oracle(nbr, 20)
    for P in (1, 4):
        for cap in (512, 4):
            t = jaccard_topk(
                _edges_ds(src, dst), k=20, cfg=EngineConfig(num_partitions=P),
                max_center_degree=cap,
            )
            got = list(zip(
                t.column("a").to_pylist(), t.column("b").to_pylist(),
                [round(x, 6) for x in t.column("jaccard").to_pylist()],
            ))
            assert got == want, f"P={P} cap={cap}"


def _support_oracle(nbr):
    out = {}
    for a in sorted(nbr):
        for b in nbr[a]:
            if a < b:
                s = len(nbr[a] & nbr[b])
                if s:
                    out[(a, b)] = s
    return out


def test_edge_triangle_support_vs_oracle():
    from ccl_ray.stages.triangles import edge_triangle_support

    src, dst, vids = _random_graph(43, n=50, m=260)
    nbr = _adj(src, dst, vids)
    want = _support_oracle(nbr)
    for P in (1, 4):
        df = edge_triangle_support(
            _edges_ds(src, dst), cfg=EngineConfig(num_partitions=P)
        ).to_pandas()
        got = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(df["src"], df["dst"], df["support"])
        }
        assert got == want, f"P={P}"
        # cross-invariant: sum of supports = 3 * triangle count
        from ccl_ray.stages.triangles import triangle_count

        assert sum(got.values()) == 3 * triangle_count(
            _edges_ds(src, dst), cfg=EngineConfig(num_partitions=P)
        )


def _dijkstra_oracle(src, dst, w, vids, seeds):
    import heapq

    adj = {int(v): [] for v in vids}
    for s, d, ww in zip(src, dst, w):
        s, d = int(s), int(d)
        if s != d:
            adj[s].append((d, float(ww)))
            adj[d].append((s, float(ww)))
    dist = {v: None for v in adj}
    h = [(0.0, s) for s in seeds if s in adj]
    for _, s in h:
        dist[s] = 0.0
    heapq.heapify(h)
    while h:
        dcur, u = heapq.heappop(h)
        if dist[u] is not None and dcur > dist[u]:
            continue
        for v, ww in adj[u]:
            nd = dcur + ww
            if dist[v] is None or nd < dist[v]:
                dist[v] = nd
                heapq.heappush(h, (nd, v))
    return dist


def test_sssp_weighted_vs_dijkstra():
    from ccl_ray.stages.sssp import sssp_weighted

    rng = np.random.RandomState(13)
    n, m = 80, 220
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    w = rng.randint(1, 9, m).astype(np.float64)
    vids = np.arange(n)
    seeds = [0, 31]
    want = _dijkstra_oracle(src, dst, w, vids, seeds)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.float64())})
    ).repartition(3)
    for P, mode in ((1, "grouped"), (8, "grouped"), (4, "fanout")):
        res = sssp_weighted(
            edges, _vids_ds(seeds), vertices=_vids_ds(vids),
            cfg=EngineConfig(num_partitions=P, exchange=mode),
        )
        df = res.dists.to_pandas()
        got = {
            int(v): (None if d is None or (isinstance(d, float) and np.isnan(d)) else float(d))
            for v, d in zip(df["vid"], df["dist"].astype(object))
        }
        assert got == want, f"P={P} mode={mode}"


def test_sssp_weighted_parallel_edges_take_min():
    """Parallel (src,dst) edges with different weights: the CSR dedupe must
    keep the MIN weight."""
    from ccl_ray.stages.sssp import sssp_weighted

    edges = rd.from_arrow(
        pa.table({"src": pa.array([0, 0], pa.int64()), "dst": pa.array([1, 1], pa.int64()),
                  "w": pa.array([5.0, 2.0], pa.float64())})
    )
    res = sssp_weighted(edges, _vids_ds([0]), cfg=EngineConfig(num_partitions=2))
    df = res.dists.to_pandas().set_index("vid")
    assert float(df.loc[1, "dist"]) == 2.0


def _hits_oracle_np(src, dst, n, iters):
    """Dense numpy HITS on the deduped loop-free directed graph."""
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        if s != d:
            A[int(s), int(d)] = 1.0
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iters):
        auth = A.T @ hub
        if auth.sum():
            auth = auth / auth.sum()
        hub = A @ auth
        if hub.sum():
            hub = hub / hub.sum()
    return auth, hub


def test_hits_fixed_vs_numpy():
    from ccl_ray.stages.hits import hits_fixed

    rng = np.random.RandomState(5)
    n, m = 70, 300
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    want_a, want_h = _hits_oracle_np(src, dst, n, 12)
    edges = _edges_ds(src, dst)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        df = hits_fixed(
            edges, iterations=12, vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P, exchange=mode), round_to=12,
        ).to_pandas().set_index("vid").sort_index()
        assert len(df) == n
        assert np.allclose(df["auth"].values, want_a, atol=1e-9), f"P={P} {mode}"
        assert np.allclose(df["hub"].values, want_h, atol=1e-9), f"P={P} {mode}"


def test_hits_converged_vs_numpy_oracle():
    """Run-to-convergence HITS matches the dense numpy twin (same half-step,
    normalize and stop semantics) — iteration count included."""
    from ccl_ray.oracle.unionfind import hits_oracle
    from ccl_ray.stages.hits import hits_converged

    rng = np.random.RandomState(9)
    n, m = 70, 300
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    tol = 1e-9
    want_a, want_h, want_it = hits_oracle(
        src, dst, np.arange(n), tol=tol, max_iters=80
    )
    edges = _edges_ds(src, dst)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        ds, iters = hits_converged(
            edges, tol=tol, max_iters=80, vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P, exchange=mode), round_to=12,
        )
        df = ds.to_pandas().set_index("vid").sort_index()
        assert iters == want_it, f"P={P} {mode}: {iters} != {want_it}"
        assert np.allclose(
            df["auth"].values, [want_a[v] for v in df.index], atol=1e-9
        ), f"P={P} {mode}"
        assert np.allclose(
            df["hub"].values, [want_h[v] for v in df.index], atol=1e-9
        ), f"P={P} {mode}"


def test_pagerank_weighted_converged_vs_numpy_oracle():
    from ccl_ray.oracle.unionfind import weighted_pagerank_oracle
    from ccl_ray.stages.wpagerank import pagerank_weighted

    rng = np.random.RandomState(13)
    n, m = 60, 200
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    w = (1 + (src + dst) % 7).astype(np.float64)
    tol = 1e-9
    want, want_it = weighted_pagerank_oracle(
        src, dst, w, np.arange(n), tol=tol, max_iters=200
    )
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.float64())})
    )
    for P in (1, 4):
        ds, iters = pagerank_weighted(
            edges, tol=tol, max_iters=200, vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P), round_to=12,
        )
        df = ds.to_pandas().set_index("vid").sort_index()
        assert iters == want_it, f"P={P}: {iters} != {want_it}"
        assert np.allclose(
            df["score"].values, [want[v] for v in df.index], atol=1e-9
        ), f"P={P}"


def test_hits_edgeless_graph_zero_scores():
    from ccl_ray.stages.hits import hits_fixed

    edges = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    df = hits_fixed(
        edges, iterations=3, vertices=_vids_ds([1, 2]),
        cfg=EngineConfig(num_partitions=2),
    ).to_pandas()
    assert sorted(df["vid"]) == [1, 2]
    assert (df["auth"] == 0).all() and (df["hub"] == 0).all()


def test_two_hop_vs_oracle():
    from ccl_ray.stages.linkpred import two_hop_neighborhood

    src, dst, vids = _random_graph(17, n=60, m=140)
    nbr = _adj(src, dst, vids)
    want = {}
    for v in nbr:
        reach = set(nbr[v])
        for w in nbr[v]:
            reach |= nbr[w]
        reach.discard(v)
        want[v] = len(reach)
    for P in (1, 4):
        for cap in (512, 4):
            df = two_hop_neighborhood(
                _edges_ds(src, dst), vertices=_vids_ds(vids),
                cfg=EngineConfig(num_partitions=P), max_center_degree=cap,
            ).to_pandas()
            got = dict(zip(df["vid"].astype(int), df["n_within_2"].astype(int)))
            assert got == want, f"P={P} cap={cap}"


def _ktruss_oracle(nbr, k):
    """Serial peel: drop edges with < k-2 common neighbors until stable."""
    edges = {(a, b) for a in nbr for b in nbr[a] if a < b}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {
            (a, b) for a, b in edges
            if len(adj.get(a, set()) & adj.get(b, set())) >= k - 2
        }
        if keep == edges:
            return edges
        edges = keep


def test_ktruss_vs_oracle():
    from ccl_ray.stages.triangles import ktruss

    src, dst, vids = _random_graph(47, n=40, m=220)
    nbr = _adj(src, dst, vids)
    for k in (3, 4):
        want = _ktruss_oracle(nbr, k)
        for P in (1, 4):
            out, rounds = ktruss(
                _edges_ds(src, dst), k, cfg=EngineConfig(num_partitions=P)
            )
            df = out.to_pandas()
            got = {(int(a), int(b)) for a, b in zip(df["src"], df["dst"])}
            assert got == want, f"k={k} P={P}"
            assert rounds >= 1


def test_ktruss_max_rounds_and_empty():
    import pytest

    from ccl_ray.stages.triangles import ktruss

    # K5 minus edge (0,1) IS a 4-truss: stabilization takes 2 rounds
    # (compute + confirm) — max_rounds=1 must raise, 2 must succeed
    src = [a for a in range(5) for b in range(a + 1, 5) if (a, b) != (0, 1)]
    dst = [b for a in range(5) for b in range(a + 1, 5) if (a, b) != (0, 1)]
    with pytest.raises(RuntimeError):
        ktruss(_edges_ds(src, dst), 4, cfg=EngineConfig(num_partitions=2), max_rounds=1)
    out, rounds = ktruss(
        _edges_ds(src, dst), 4, cfg=EngineConfig(num_partitions=2), max_rounds=2
    )
    assert rounds == 2 and out.count() == 9
    # triangle-free graph: empty truss with a usable schema
    out, _ = ktruss(_edges_ds([0, 1], [1, 2]), 3, cfg=EngineConfig(num_partitions=2))
    assert out.count() == 0
    # schema survives the empty result (to_pandas() of an all-empty Dataset
    # drops columns — the gate's _to_pandas handles that via schema())
    assert out.schema().names == ["src", "dst"]


def test_pagerank_weighted_vs_numpy():
    from ccl_ray.stages.wpagerank import pagerank_weighted_fixed

    rng = np.random.RandomState(61)
    n, m = 60, 200
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    w = rng.randint(1, 8, m).astype(np.float64)
    # serial oracle on the symmetrized deduped loop-free weighted graph
    und = {}
    for a, b, ww in zip(src, dst, w):
        a, b = int(a), int(b)
        if a != b:
            k = (min(a, b), max(a, b))
            und[k] = min(und.get(k, np.inf), float(ww))
    A = np.zeros((n, n))
    for (a, b), ww in und.items():
        A[a, b] = ww
        A[b, a] = ww
    W = A.sum(axis=1)
    T = np.divide(A, W[:, None], out=np.zeros_like(A), where=W[:, None] > 0)
    s = np.full(n, 1.0 / n)
    for _ in range(20):
        dang = s[W == 0].sum()
        s = 0.15 / n + 0.85 * (T.T @ s + dang / n)
    want = np.round(s, 10)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.float64())})
    ).repartition(3)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        df = pagerank_weighted_fixed(
            edges, iterations=20, vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P, exchange=mode),
        ).to_pandas().set_index("vid").sort_index()
        assert len(df) == n
        assert np.allclose(df["score"].values, want, atol=1e-9), f"P={P} {mode}"


def test_pagerank_weighted_isolated_vertex_dangling():
    """An isolated vertex contributes dangling mass each round and keeps a
    positive score; totals still sum to 1."""
    from ccl_ray.stages.wpagerank import pagerank_weighted_fixed

    edges = rd.from_arrow(
        pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64()),
                  "w": pa.array([2.0], pa.float64())})
    )
    df = pagerank_weighted_fixed(
        edges, iterations=30, vertices=_vids_ds([0, 1, 2]),
        cfg=EngineConfig(num_partitions=2),
    ).to_pandas().set_index("vid").sort_index()
    assert abs(df["score"].sum() - 1.0) < 1e-9
    assert df.loc[2, "score"] > 0
    assert abs(df.loc[0, "score"] - df.loc[1, "score"]) < 1e-12  # symmetric pair


def _lpa_oracle(nbr, iters):
    lab = {v: v for v in nbr}
    for _ in range(iters):
        new = {}
        for v in nbr:
            if not nbr[v]:
                new[v] = lab[v]
                continue
            cnt = {}
            for w in nbr[v]:
                cnt[lab[w]] = cnt.get(lab[w], 0) + 1
            mx = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == mx)
        lab = new
    return lab


def test_lpa_communities_vs_oracle():
    from ccl_ray.stages.lpa import lpa_communities

    src, dst, vids = _random_graph(53, n=70, m=180)
    nbr = _adj(src, dst, vids)
    for iters in (1, 5):
        want = _lpa_oracle(nbr, iters)
        for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
            df = lpa_communities(
                _edges_ds(src, dst), iterations=iters, vertices=_vids_ds(vids),
                cfg=EngineConfig(num_partitions=P, exchange=mode),
            ).to_pandas()
            got = dict(zip(df["vid"].astype(int), df["community"].astype(int)))
            assert got == want, f"iters={iters} P={P} {mode}"


def test_lpa_two_cliques_converge():
    """Two 4-cliques joined by one bridge edge: each clique adopts its min
    vid as community."""
    from ccl_ray.stages.lpa import lpa_communities

    src, dst = [], []
    for base in (0, 10):
        for a in range(4):
            for b in range(a + 1, 4):
                src.append(base + a)
                dst.append(base + b)
    src.append(3)
    dst.append(10)
    df = lpa_communities(
        _edges_ds(src, dst), iterations=5, cfg=EngineConfig(num_partitions=2)
    ).to_pandas()
    got = dict(zip(df["vid"].astype(int), df["community"].astype(int)))
    assert all(got[v] == 0 for v in (0, 1, 2, 3))
    assert all(got[v] == 10 for v in (11, 12, 13))


def test_bfs_cap_ok_settles_within_cap():
    """cap_ok=True: distances <= cap are exact, farther vertices unreached;
    no RuntimeError on long chains."""
    src = list(range(0, 30))
    dst = list(range(1, 31))
    res = bfs_hops(
        _edges_ds(src, dst), _vids_ds([0]), cfg=EngineConfig(num_partitions=2),
        max_rounds=5, cap_ok=True,
    )
    df = res.dists.to_pandas().set_index("vid")["dist"]
    for v in range(6):
        assert df[v] == v
    for v in range(6, 31):
        assert df[v] is None or np.isnan(df[v])


def test_modularity_vs_brute_force():
    """aggregates.modularity matches the textbook Q on a random graph with a
    random partition, at P=1 and P=4, including the exact integer partials."""
    from ccl_ray.stages.aggregates import modularity

    rng = np.random.RandomState(21)
    n, m_draw = 40, 120
    src = rng.randint(0, n, m_draw)
    dst = rng.randint(0, n, m_draw)
    comm_of = {v: int(rng.randint(0, 5)) for v in range(n)}

    edges = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src, dst) if a != b}
    m = len(edges)
    intra = sum(1 for a, b in edges if comm_of[a] == comm_of[b])
    deg = {v: 0 for v in range(n)}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    d_c = {}
    for v, c in comm_of.items():
        d_c[c] = d_c.get(c, 0) + deg[v]
    want_q = round(intra / m - sum(d * d for d in d_c.values()) / (4.0 * m * m), 6)

    comm_ds = rd.from_arrow(pa.table({
        "vid": pa.array(sorted(comm_of), pa.int64()),
        "community": pa.array([comm_of[v] for v in sorted(comm_of)], pa.int64()),
    }))
    for P in (1, 4):
        t = modularity(_edges_ds(src, dst), comm_ds, num_partitions=P)
        assert t.column("m").to_pylist() == [m], f"P={P}"
        assert t.column("intra_edges").to_pylist() == [intra], f"P={P}"
        assert t.column("n_communities").to_pylist() == [5], f"P={P}"
        assert t.column("modularity").to_pylist() == [want_q], f"P={P}"


def test_betweenness_vs_brandes_oracle():
    """Source-sampled Brandes over the BSP engine matches the serial oracle
    at P=1/4 in both exchange modes (float sums: allclose at 1e-9)."""
    from ccl_ray.oracle.unionfind import brandes_oracle
    from ccl_ray.stages.betweenness import betweenness_sample

    rng = np.random.RandomState(33)
    n, m = 60, 150
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    seeds = [0, 7, 23]
    want = brandes_oracle(src, dst, np.arange(n), seeds)
    edges = _edges_ds(src, dst)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        ds, levels = betweenness_sample(
            edges, seeds, vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P, exchange=mode), round_to=9,
        )
        df = ds.to_pandas().set_index("vid").sort_index()
        assert len(levels) == len(seeds)
        assert np.allclose(
            df["betweenness"].values, [want[v] for v in df.index], atol=1e-6
        ), f"P={P} {mode}"


def test_betweenness_star_path_exact():
    """Closed forms: star center carries all pairwise dependencies; path
    interior vertices carry (#left)·(#right) pair counts per endpoint seed."""
    from ccl_ray.oracle.unionfind import brandes_oracle
    from ccl_ray.stages.betweenness import betweenness_sample

    # path 0-1-2-3-4, seeds at both ends: delta profile is exact integers
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 4])
    want = brandes_oracle(src, dst, np.arange(5), [0, 4])
    ds, _ = betweenness_sample(
        _edges_ds(src, dst), [0, 4], vertices=_vids_ds(np.arange(5)),
        cfg=EngineConfig(num_partitions=2),
    )
    df = ds.to_pandas().set_index("vid").sort_index()
    # closed form: from seed 0, delta = (3,2,1,0) at vertices 1..4 and the
    # seed is excluded; symmetric from seed 4 -> interior vertices carry
    # 3+1 = 2+2 = 1+3 = 4.0 each, endpoints 0.0
    assert dict(zip(df.index, df["betweenness"])) == {
        0: 0.0, 1: 4.0, 2: 4.0, 3: 4.0, 4: 0.0,
    }
    assert np.allclose(df["betweenness"].values, [want[v] for v in df.index])


def _sigma_oracle(src, dst, vids, seeds):
    """Serial multi-source shortest-path counts over the DISTINCT loop-free
    undirected edges (0 = unreachable)."""
    nbr = _adj(src, dst, vids)
    dist = {int(v): None for v in vids}
    sig = {int(v): 0 for v in vids}
    frontier = sorted(set(int(s) for s in seeds))
    for s in frontier:
        dist[s], sig[s] = 0, 1
    t = 0
    while frontier:
        nxt = set()
        for u in frontier:
            for v in nbr[u]:
                if dist[v] is None or dist[v] == t + 1:
                    dist[v] = t + 1
                    sig[v] += sig[u]
                    nxt.add(v)
        frontier, t = sorted(nxt), t + 1
    return sig


def test_shortest_path_counts_vs_oracle():
    """Multi-source Brandes forward pass (shortest_path_counts) matches the
    serial sigma oracle at P=1/4 grouped+fanout; parallel (duplicate) edges
    are the CALLER's concern — the engine counts each CSR copy as a path, so
    the test feeds distinct edges, mirroring q_sssp_paths' deduped bundle."""
    from ccl_ray.stages.betweenness import shortest_path_counts

    rng = np.random.RandomState(44)
    n, m = 70, 180
    pairs = {(int(a), int(b)) for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m)) if a != b}
    pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    seeds = [0, 13, 13, 41]  # duplicate seed row must still count once
    want = _sigma_oracle(src, dst, np.arange(n), seeds)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        out = shortest_path_counts(
            _edges_ds(src, dst), _vids_ds(seeds), vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P, exchange=mode),
        )
        df = out.to_pandas().set_index("vid").sort_index()
        assert df["paths"].dtype == np.int64
        assert [want[v] for v in df.index] == df["paths"].tolist(), f"P={P} {mode}"


def test_eigenvector_centrality_vs_numpy():
    """Converged scores equal the (A+I) shifted-power oracle; iteration
    counts match; P=1 vs P=4 agree."""
    from ccl_ray.oracle.unionfind import eigenvector_oracle
    from ccl_ray.stages.hits import eigenvector_centrality

    rng = np.random.RandomState(5)
    n, m = 50, 160
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    tol = 1e-9
    want_a, want_it = eigenvector_oracle(src, dst, np.arange(n), tol=tol, max_iters=300)
    for P in (1, 4):
        ds, iters = eigenvector_centrality(
            _edges_ds(src, dst), tol=tol, max_iters=300,
            vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P), round_to=12,
        )
        df = ds.to_pandas().set_index("vid").sort_index()
        assert iters == want_it, f"P={P}"
        assert np.allclose(
            df["score"].values, [want_a[v] for v in df.index], atol=1e-9
        ), f"P={P}"


def test_eigenvector_bipartite_true_perron():
    """INDEPENDENT check against np.linalg.eigh on a bipartite path graph —
    the case where plain A or A² power iteration gives a wrong (mixed or
    oscillating) vector; the +I shift must recover the true Perron vector."""
    from ccl_ray.stages.hits import eigenvector_centrality

    n = 7  # path 0-1-2-...-6: connected and bipartite
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    A[dst, src] = 1.0
    w, v = np.linalg.eigh(A)
    perron = np.abs(v[:, np.argmax(w)])
    perron = perron / perron.sum()
    ds, _ = eigenvector_centrality(
        _edges_ds(src, dst), tol=1e-12, max_iters=2000,
        vertices=_vids_ds(np.arange(n)), cfg=EngineConfig(num_partitions=2),
        round_to=12,
    )
    df = ds.to_pandas().set_index("vid").sort_index()
    assert np.allclose(df["score"].values, perron, atol=1e-6)


def test_mis_vs_oracle_and_invariants():
    """Deterministic MIS equals the serial twin at P=1/4 in both exchange
    modes, and satisfies independence + maximality against the raw graph."""
    from ccl_ray.oracle.unionfind import mis_oracle
    from ccl_ray.stages.mis import maximal_independent_set

    rng = np.random.RandomState(44)
    n, m = 80, 220
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    want = mis_oracle(src, dst, np.arange(n))
    nbr = _adj(src, dst, np.arange(n))
    edges = _edges_ds(src, dst)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        ds, rounds = maximal_independent_set(
            edges, vertices=_vids_ds(np.arange(n)),
            cfg=EngineConfig(num_partitions=P, exchange=mode),
        )
        df = ds.to_pandas()
        got = {int(v) for v, f in zip(df["vid"], df["in_mis"]) if f}
        assert got == want, f"P={P} {mode}"
        assert rounds >= 1
        # independence
        for v in got:
            assert not (nbr[v] & got), f"adjacent pair in MIS (P={P})"
        # maximality
        for v in set(df["vid"].astype(int)) - got:
            assert nbr[v] & got, f"non-member {v} with no MIS neighbor (P={P})"


def test_mis_isolated_and_empty():
    from ccl_ray.stages.mis import maximal_independent_set

    # triangle + two isolated vertices: isolates always join
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    ds, _ = maximal_independent_set(
        _edges_ds(src, dst, blocks=1), vertices=_vids_ds(np.arange(5)),
        cfg=EngineConfig(num_partitions=2),
    )
    df = ds.to_pandas().set_index("vid").sort_index()
    assert bool(df.loc[3, "in_mis"]) and bool(df.loc[4, "in_mis"])
    assert int(df.loc[[0, 1, 2], "in_mis"].sum()) == 1


def test_katz_matches_numpy_twin(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.katz import katz_centrality, katz_oracle

    rng = np.random.default_rng(19)
    n, m = 180, 700
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    want, want_it, want_alpha = katz_oracle(src, dst, np.unique(np.concatenate([src, dst])))
    for P in (1, 4):
        ds, iters, alpha = katz_centrality(
            rd.from_arrow(t).repartition(4), cfg=EngineConfig(num_partitions=P)
        )
        assert iters == want_it and alpha == want_alpha, P
        df = ds.to_pandas()
        gaps = np.abs(df["katz"].values - np.array([want[int(v)] for v in df["vid"]]))
        assert gaps.max() < 1e-8, (P, gaps.max())


def test_katz_star_closed_form(ray_session):
    """Star K_{1,k}: fixpoint center = β(1+αk)/(1−α²k), leaf =
    β(1+α)/(1−α²k) with α = damping/k."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.katz import katz_centrality

    k = 6
    src = np.zeros(k, np.int64)
    dst = np.arange(1, k + 1).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ds, _, alpha = katz_centrality(
        rd.from_arrow(t), cfg=EngineConfig(num_partitions=3), tol=1e-12
    )
    df = ds.to_pandas().set_index("vid")["katz"]
    denom = 1 - alpha * alpha * k
    assert abs(df[0] - (1 + alpha * k) / denom) < 1e-6
    assert abs(df[3] - (1 + alpha) / denom) < 1e-6


def test_betweenness_batched_mixed_ecc_and_disconnected():
    """Batched multi-seed waves: seeds with very different eccentricities
    (star center ecc 1+tail, deep tail end) plus a seed in a separate
    component — per-seed levels land right and values match the oracle."""
    from ccl_ray.oracle.unionfind import brandes_oracle
    from ccl_ray.stages.betweenness import betweenness_sample

    # star center 0 with leaves 1..5, tail 5-6-7-8; island 20-21
    src = np.array([0, 0, 0, 0, 0, 5, 6, 7, 20])
    dst = np.array([1, 2, 3, 4, 5, 6, 7, 8, 21])
    vids = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 20, 21])
    seeds = [0, 8, 20]
    want = brandes_oracle(src, dst, vids, seeds)
    for P in (1, 3):
        ds, levels = betweenness_sample(
            _edges_ds(src, dst), seeds, vertices=_vids_ds(vids),
            cfg=EngineConfig(num_partitions=P), round_to=9,
        )
        df = ds.to_pandas().set_index("vid").sort_index()
        # ecc(0)=4 (0..8 via tail), ecc(8)=5, ecc(20)=1 (island)
        assert levels == [4, 5, 1], f"P={P}"
        assert np.allclose(
            df["betweenness"].values, [want[v] for v in df.index], atol=1e-9
        ), f"P={P}"


def test_ktruss_deep_peel_decremental_work_bound():
    """Triangulated m×m grid peels like an onion under k=4 — one boundary
    layer per round (peel depth ≈ m). Checks (a) exact agreement with the
    serial recompute oracle through a ≥5-deep peel, and (b) the decremental
    work counter: total common-neighbor candidates across ALL peel rounds
    stay O(E) (each edge is peeled once, contributing ≤ min-degree
    candidates), where the old recompute formulation re-swept every wedge
    of the surviving graph every round (≈ rounds × wedges)."""
    from ccl_ray.stages.triangles import ktruss

    m = 12
    vid = lambda r, c: r * m + c  # noqa: E731
    E = []
    for r in range(m):
        for c in range(m):
            if c + 1 < m:
                E.append((vid(r, c), vid(r, c + 1)))
            if r + 1 < m:
                E.append((vid(r, c), vid(r + 1, c)))
            if r + 1 < m and c + 1 < m:
                E.append((vid(r, c), vid(r + 1, c + 1)))
    src = np.array([a for a, b in E], np.int64)
    dst = np.array([b for a, b in E], np.int64)
    nbr = _adj(src, dst, np.arange(m * m))
    want = _ktruss_oracle(nbr, 4)
    for P in (1, 4):
        stats = {}
        out, rounds = ktruss(
            _edges_ds(src, dst), 4, cfg=EngineConfig(num_partitions=P),
            stats=stats,
        )
        df = out.to_pandas() if out.count() else None
        got = (
            {(int(a), int(b)) for a, b in zip(df["src"], df["dst"])}
            if df is not None else set()
        )
        assert got == want, f"P={P}"
        assert rounds >= 5, f"peel too shallow to exercise the cascade: {rounds}"
        # survivor counts strictly decrease down to the fixpoint
        alive = stats["alive_per_round"]
        assert all(a > b for a, b in zip(alive, alive[1:])), alive
        # decremental work bound: measured 928 candidates for E=385 at m=12;
        # 4·E leaves slack while staying far below rounds·E (the recompute
        # formulation's floor of full sweeps)
        assert sum(stats["candidates_per_round"]) < 4 * len(E), stats
        assert rounds * len(E) > 2 * sum(stats["candidates_per_round"])


def test_ktruss_decremental_matches_oracle_k5_dense():
    """Denser random graph at k=5: multi-edge-per-triangle deletions in the
    same round exercise the triple dedupe (a triangle with 2-3 peeled edges
    must decrement each survivor exactly once)."""
    from ccl_ray.stages.triangles import ktruss

    src, dst, vids = _random_graph(91, n=30, m=260)
    nbr = _adj(src, dst, vids)
    for k in (4, 5):
        want = _ktruss_oracle(nbr, k)
        for P in (1, 3):
            out, rounds = ktruss(
                _edges_ds(src, dst), k, cfg=EngineConfig(num_partitions=P)
            )
            df = out.to_pandas() if out.count() else None
            got = (
                {(int(a), int(b)) for a, b in zip(df["src"], df["dst"])}
                if df is not None else set()
            )
            assert got == want, f"k={k} P={P}"
