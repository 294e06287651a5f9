"""k4_count vs itertools brute force and closed forms."""
from itertools import combinations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.cliques import k4_count


def _brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in es for v in e})
    n = 0
    for quad in combinations(verts, 4):
        if all(tuple(sorted(p)) in es for p in combinations(quad, 2)):
            n += 1
    return n


def _run(edges, P):
    t = pa.table(
        {"src": pa.array([e[0] for e in edges], pa.int64()),
         "dst": pa.array([e[1] for e in edges], pa.int64())}
    )
    return k4_count(rd.from_arrow(t).repartition(2), cfg=EngineConfig(num_partitions=P))


def test_k4_closed_forms():
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    assert _run(k4, 3) == 1
    k5 = list(combinations(range(5), 2))
    assert _run(k5, 2) == 5  # C(5,4)
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert _run(c4, 2) == 0
    k33 = [(a, b) for a in (0, 1, 2) for b in (3, 4, 5)]  # bipartite: none
    assert _run(k33, 4) == 0


def test_k4_random_vs_brute():
    rng = np.random.RandomState(11)
    n = 24
    edges = list(
        {tuple(sorted(rng.choice(n, 2, replace=False))) for _ in range(150)}
    )
    want = _brute(edges)
    assert want > 0  # dense enough to be a real test
    for P in (1, 4):
        assert _run(edges, P) == want, P


def test_k4_hub_star_plus_clique():
    # a hub fanning to 30 leaves (no K4) plus one K4 hanging off the hub
    edges = [(0, i) for i in range(1, 31)]
    edges += [(1, 2), (1, 3), (2, 3)]  # {0,1,2,3} closes a K4 via the hub
    assert _run(edges, 4) == 1
    assert _brute(edges) == 1
