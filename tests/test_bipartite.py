"""bipartiteness_census vs a brute-force 2-coloring oracle."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.bipartite import bipartiteness_census


def _brute(edges, n_vertices):
    """(is_bipartite -> (n_components, n_vertices)) via BFS 2-coloring."""
    adj = {v: set() for v in range(n_vertices)}
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    color = {}
    out = {0: [0, 0], 1: [0, 0]}
    for start in range(n_vertices):
        if start in color:
            continue
        color[start] = 0
        comp, ok, queue = [start], True, [start]
        while queue:
            u = queue.pop()
            for w in adj[u]:
                if w == u:
                    ok = False
                    continue
                if w not in color:
                    color[w] = 1 - color[u]
                    comp.append(w)
                    queue.append(w)
                elif color[w] == color[u]:
                    ok = False
        out[int(ok)][0] += 1
        out[int(ok)][1] += len(comp)
    return {k: tuple(v) for k, v in out.items() if v[0]}


def _run(edges, n_vertices, P):
    et = pa.table(
        {"src": pa.array([e[0] for e in edges], pa.int64()),
         "dst": pa.array([e[1] for e in edges], pa.int64())}
    )
    vt = pa.table({"vid": pa.array(np.arange(n_vertices, dtype=np.int64))})
    got = bipartiteness_census(
        rd.from_arrow(et).repartition(2), vertices=rd.from_arrow(vt),
        cfg=EngineConfig(num_partitions=P),
    ).to_pandas().set_index("is_bipartite")
    return {
        int(k): (int(r["n_components"]), int(r["n_vertices"]))
        for k, r in got.iterrows()
    }


def test_bipartite_mixed_components():
    # even cycle (bip), odd cycle (non-bip), path (bip), isolated vertices
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]          # C4: bipartite
    edges += [(4, 5), (5, 6), (6, 4)]                  # C3: odd
    edges += [(7, 8), (8, 9)]                          # path: bipartite
    want = _brute(edges, 12)                           # vids 10, 11 isolated
    assert want == {1: (4, 9), 0: (1, 3)}              # oracle sanity
    for P in (1, 4):
        assert _run(edges, 12, P) == want, P


def test_bipartite_self_loop_and_parallel():
    # self loop -> odd; parallel edges don't change the verdict
    edges = [(0, 0), (1, 2), (1, 2), (2, 1)]
    want = _brute(edges, 3)
    assert want == {0: (1, 1), 1: (1, 2)}
    assert _run(edges, 3, 3) == want


def test_bipartite_random_vs_brute():
    rng = np.random.RandomState(7)
    n = 60
    edges = [tuple(sorted(rng.choice(n, 2, replace=False))) for _ in range(70)]
    want = _brute(edges, n)
    assert _run(edges, n, 4) == want
