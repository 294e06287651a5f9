"""densest_peel vs a sequential reference peel and a planted-clique probe."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.densest import densest_peel


def _ref_peel(edges):
    """Same parallel peel (deg*V <= 3E) in plain python."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    alive = {v for e in es for v in e}
    rows = []
    rnd = 0
    while alive:
        rnd += 1
        cur = [e for e in es if e[0] in alive and e[1] in alive]
        nv, ne = len(alive), len(cur)
        dens = ne / nv
        rows.append((rnd, nv, ne, float(np.copysign(np.floor(abs(dens) * 1e6 + 0.5) / 1e6, dens))))
        deg = {v: 0 for v in alive}
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        alive = {v for v in alive if deg[v] * nv > 3 * ne}
    return rows


def _run(edges, P):
    t = pa.table(
        {"src": pa.array([e[0] for e in edges], pa.int64()),
         "dst": pa.array([e[1] for e in edges], pa.int64())}
    )
    got = densest_peel(
        rd.from_arrow(t).repartition(2), cfg=EngineConfig(num_partitions=P)
    ).to_pandas()
    return list(map(tuple, got.values.tolist()))


def test_planted_clique_surfaces():
    # a 40-vertex path (density ~1/2) + a K8 on vids 100..107 (density 3.5):
    # the peel must strip the path and surface the clique round
    from itertools import combinations

    edges = [(i, i + 1) for i in range(40)]
    edges += [(100 + a, 100 + b) for a, b in combinations(range(8), 2)]
    want = _ref_peel(edges)
    assert max(r[3] for r in want) == 3.5  # the K8 round is the argmax
    assert _run(edges, 4) == want


def test_random_vs_reference():
    rng = np.random.RandomState(5)
    n = 50
    edges = list({tuple(sorted(rng.choice(n, 2, replace=False))) for _ in range(120)})
    want = _ref_peel(edges)
    for P in (1, 4):
        assert _run(edges, P) == want, P


def test_self_loops_dropped():
    edges = [(0, 0), (0, 1), (1, 2), (2, 0)]
    want = _ref_peel(edges)  # triangle; self loop ignored
    assert _run(edges, 2) == want
