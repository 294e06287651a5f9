"""Jones-Plassmann coloring vs the sequential greedy oracle.

The JP schedule fires a vertex when all higher-priority neighbors are
colored, so the result equals the sequential greedy coloring in DESCENDING
priority order (a lower-priority neighbor can never be colored first)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.coloring import greedy_coloring
from ccl_ray.stages.mis import PRIO_K


def greedy_oracle(src, dst, vertices=None):
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    vs = np.unique(np.concatenate([src, dst]))
    if vertices is not None:
        vs = np.unique(np.concatenate([vs, np.asarray(vertices, np.int64)]))
    nbrs = {int(v): set() for v in vs}
    for a, b in zip(src, dst):
        if a != b:
            nbrs[int(a)].add(int(b))
            nbrs[int(b)].add(int(a))
    prio = {int(v): (int(v) * int(PRIO_K)) % (1 << 64) for v in vs}
    color = {}
    for v in sorted(nbrs, key=lambda x: -prio[x]):
        used = {color[u] for u in nbrs[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def _edges_ds(src, dst, blocks=4):
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def _check(src, dst, P, vertices=None, exchange="grouped"):
    cfg = EngineConfig(num_partitions=P, exchange=exchange)
    verts = (
        rd.from_arrow(pa.table({"vid": pa.array(vertices, pa.int64())}))
        if vertices is not None
        else None
    )
    ds, rounds = greedy_coloring(_edges_ds(src, dst), vertices=verts, cfg=cfg)
    df = ds.to_pandas()
    got = {int(v): int(c) for v, c in zip(df["vid"], df["color"])}
    want = greedy_oracle(src, dst, vertices)
    assert got == want
    # validity: no edge is monochromatic
    for a, b in zip(src, dst):
        if a != b:
            assert got[int(a)] != got[int(b)]
    return rounds


def test_triangle_and_path(ray_session):
    _check([0, 1, 2, 5, 6], [1, 2, 0, 6, 7], P=3)


def test_clique_uses_n_colors(ray_session):
    src, dst = [], []
    for i in range(6):
        for j in range(i + 1, 6):
            src.append(i)
            dst.append(j)
    cfg = EngineConfig(num_partitions=3)
    ds, _ = greedy_coloring(_edges_ds(src, dst), cfg=cfg)
    assert sorted(ds.to_pandas()["color"].tolist()) == list(range(6))


def test_random_graph_all_partitions(ray_session):
    rng = np.random.default_rng(17)
    n, m = 150, 700
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    for P in (1, 4):
        rounds = _check(src, dst, P=P)
        assert rounds <= 64


def test_isolated_vertices_color_zero(ray_session):
    got_rounds = _check([1, 2], [2, 3], P=2, vertices=[1, 2, 3, 50])
    assert got_rounds >= 1


def test_fanout_exchange_parity(ray_session):
    rng = np.random.default_rng(29)
    n, m = 90, 320
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    _check(src, dst, P=3, exchange="fanout")
