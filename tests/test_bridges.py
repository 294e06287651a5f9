"""Distributed bridges + 2ecc vs the exact iterative Tarjan oracle."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.bridges import bridges_oracle
from ccl_ray.stages.bridges import bridges


def _naive_bridges(edges):
    """Independent second oracle: removal + connectivity check."""
    es = sorted({tuple(sorted(e)) for e in edges if e[0] != e[1]})

    def comps(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        for v in {x for e in es for x in e}:
            parent.setdefault(v, v)
        return frozenset(frozenset({v for v in parent if find(v) == r})
                         for r in {find(v) for v in parent})

    base = comps(es)
    return [e for e in es if comps([x for x in es if x != e]) != base]


def _run(edges, P, n_vertices=None):
    t = pa.table(
        {"src": pa.array([e[0] for e in edges], pa.int64()),
         "dst": pa.array([e[1] for e in edges], pa.int64())}
    )
    verts = None
    if n_vertices is not None:
        verts = rd.from_arrow(
            pa.table({"vid": pa.array(np.arange(n_vertices, dtype=np.int64))})
        )
    b, labs = bridges(
        rd.from_arrow(t).repartition(2), vertices=verts,
        cfg=EngineConfig(num_partitions=P),
    )
    # take_all, not to_pandas: an all-empty Dataset loses its columns there
    got_b = sorted((int(r["a"]), int(r["b"])) for r in b.take_all())
    ldf = labs.to_pandas()
    got_l = dict(zip(ldf["vid"].tolist(), ldf["label"].tolist()))
    return got_b, got_l


def test_bridges_textbook():
    # two triangles joined by a bridge, plus a pendant edge
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)]
    want_b, want_l = bridges_oracle([e[0] for e in edges], [e[1] for e in edges])
    assert want_b == [(2, 3), (5, 6)]
    assert want_b == _naive_bridges(edges)
    got_b, got_l = _run(edges, 3)
    assert got_b == want_b
    assert {v: got_l[v] for v in want_l} == want_l


def test_bridges_pure_tree_and_cycle():
    # a path: every edge is a bridge; a cycle: none
    path = [(i, i + 1) for i in range(6)]
    got_b, got_l = _run(path, 2)
    assert got_b == path
    assert len(set(got_l.values())) == 7  # every vertex its own 2ecc
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got_b, got_l = _run(cyc, 2)
    assert got_b == []
    assert len(set(got_l.values())) == 1


def test_bridges_empty_edges_explicit_vertices():
    verts = rd.from_arrow(pa.table({"vid": pa.array(np.arange(5, dtype=np.int64))}))
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    b, labs = bridges(empty, vertices=verts, cfg=EngineConfig(num_partitions=2))
    assert b.count() == 0
    ld = labs.to_pandas()
    assert sorted(ld["vid"]) == list(range(5))
    assert (ld["vid"] == ld["label"]).all()


def test_bridges_random_vs_both_oracles():
    rng = np.random.RandomState(13)
    n = 40
    edges = list({tuple(sorted(rng.choice(n, 2, replace=False))) for _ in range(55)})
    want_b, want_l = bridges_oracle([e[0] for e in edges], [e[1] for e in edges])
    assert want_b == _naive_bridges(edges)
    for P in (1, 4):
        got_b, got_l = _run(edges, P)
        assert got_b == want_b, P
        assert {v: got_l[v] for v in want_l} == want_l, P
