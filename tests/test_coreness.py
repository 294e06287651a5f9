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


def test_coreness_checkpoint_resume(ray_session, tmp_path):
    """Kill-after-round-2 resume reaches the identical fixpoint with the
    same total round count (synchronous deterministic iteration)."""
    import shutil

    from ccl_ray.state.checkpoint import StateCheckpoint

    rng = np.random.default_rng(43)
    n, m = 120, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    cfg = EngineConfig(num_partitions=3)
    cold, cold_rounds = core_decomposition(_edges_ds(src, dst), cfg=cfg)
    want = {int(v): int(c) for v, c in zip(*[cold.to_pandas()[c] for c in ("vid", "coreness")])}
    assert cold_rounds > 3, "graph too easy for a resume test"

    root = str(tmp_path / "core_ck")
    ck = StateCheckpoint(root, ["c"])
    core_decomposition(_edges_ds(src, dst), cfg=cfg, checkpoint=ck)
    # simulate a kill after round 2: drop every later checkpoint
    import os

    for name in os.listdir(root):
        if name.startswith("round=") and int(name.split("=")[1]) > 2:
            shutil.rmtree(os.path.join(root, name))
    ds, rounds = core_decomposition(
        _edges_ds(src, dst), cfg=cfg, checkpoint=StateCheckpoint(root, ["c"])
    )
    df = ds.to_pandas()
    got = {int(v): int(c) for v, c in zip(df["vid"], df["coreness"])}
    assert got == want
    assert rounds == cold_rounds  # counter continues from the checkpoint

    # re-invoking on an ALREADY-CONVERGED checkpoint dir must not run an
    # extra round: the newest saved round has changed==0, so resume returns
    # the stored fixpoint with the identical round counter (round-4 ADVICE:
    # the old path re-ran one no-op round and reported rounds+1)
    ds2, rounds2 = core_decomposition(
        _edges_ds(src, dst), cfg=cfg, checkpoint=StateCheckpoint(root, ["c"])
    )
    df2 = ds2.to_pandas()
    got2 = {int(v): int(c) for v, c in zip(df2["vid"], df2["coreness"])}
    assert got2 == want
    assert rounds2 == cold_rounds


def test_coreness_consistent_with_kcore(ray_session):
    """Cross-operator invariant: the k-core (stages/kcore.py) is exactly
    the set of vertices with coreness >= k."""
    from ccl_ray.stages.kcore import kcore_bsp

    rng = np.random.default_rng(47)
    n, m = 140, 600
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    cfg = EngineConfig(num_partitions=4)
    ds, _ = core_decomposition(_edges_ds(src, dst), cfg=cfg)
    df = ds.to_pandas()
    core_map = {int(v): int(c) for v, c in zip(df["vid"], df["coreness"])}
    for k in (2, 3):
        kc = kcore_bsp(_edges_ds(src, dst), k, cfg=cfg).membership.to_pandas()
        in_k = {int(v) for v, m in zip(kc["vid"], kc["in_core"]) if m}
        want_k = {v for v, c in core_map.items() if c >= k}
        assert in_k == want_k, k
