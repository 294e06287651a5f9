"""Core decomposition (iterated H-index) vs an exact peeling oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.coreness import core_decomposition


def peel_oracle(src, dst, vertices=None):
    """Exact core numbers by min-degree peeling (O(V²) fine at test size)."""
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
    core = {v: 0 for v in nbrs}
    alive = set(nbrs)
    deg = {v: len(nbrs[v]) for v in nbrs}
    k = 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.remove(v)
        for u in nbrs[v]:
            if u in alive:
                deg[u] -= 1
    return core


def _edges_ds(src, dst, blocks=4):
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def _check(src, dst, P, vertices=None, max_rounds=256):
    cfg = EngineConfig(num_partitions=P)
    verts = (
        rd.from_arrow(pa.table({"vid": pa.array(vertices, pa.int64())}))
        if vertices is not None
        else None
    )
    ds, rounds = core_decomposition(
        _edges_ds(src, dst), vertices=verts, cfg=cfg, max_rounds=max_rounds
    )
    df = ds.to_pandas()
    got = {int(v): int(c) for v, c in zip(df["vid"], df["coreness"])}
    want = peel_oracle(src, dst, vertices)
    assert got == want
    return rounds


def test_clique_plus_tail(ray_session):
    # K5 (coreness 4) with a path tail (coreness 1)
    src, dst = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            src.append(i)
            dst.append(j)
    src += [4, 10, 11]
    dst += [10, 11, 12]
    _check(src, dst, P=3)


def test_long_path_converges(ray_session):
    # induced path: H-index collapses one hop per round from each end
    n = 30
    src = list(range(n - 1))
    dst = list(range(1, n))
    rounds = _check(src, dst, P=4)
    assert rounds <= n


def test_random_graph_all_partitions(ray_session):
    rng = np.random.default_rng(11)
    n, m = 150, 700
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    for P in (1, 4):
        _check(src, dst, P=P)


def test_isolated_vertices_core_zero(ray_session):
    rounds = _check([1, 2], [2, 3], P=2, vertices=[1, 2, 3, 99, 100])
    assert rounds >= 1


def test_fanout_exchange_parity(ray_session):
    rng = np.random.default_rng(7)
    n, m = 80, 300
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    want = peel_oracle(src, dst)
    for mode in ("grouped", "fanout"):
        cfg = EngineConfig(num_partitions=3, exchange=mode)
        ds, _ = core_decomposition(_edges_ds(src, dst), cfg=cfg)
        df = ds.to_pandas()
        got = {int(v): int(c) for v, c in zip(df["vid"], df["coreness"])}
        assert got == want, mode
