"""Borůvka MSF vs the Kruskal union-find oracle (same strict edge order)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import cc_oracle, kruskal_oracle
from ccl_ray.stages.msf import minimum_spanning_forest


def _edges_ds(src, dst, w, blocks=4):
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "w": pa.array(w, pa.float64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _forest_set(forest):
    df = forest.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return list(zip(df["a"].tolist(), df["b"].tolist(), df["w"].tolist()))


def _check(src, dst, w, P, vertices=None):
    cfg = EngineConfig(num_partitions=P)
    verts = (
        rd.from_arrow(pa.table({"vid": pa.array(vertices, pa.int64())}))
        if vertices is not None
        else None
    )
    forest, labels, rounds = minimum_spanning_forest(
        _edges_ds(src, dst, w), weight_col="w", vertices=verts, cfg=cfg
    )
    got = _forest_set(forest)
    want = kruskal_oracle(np.asarray(src), np.asarray(dst), np.asarray(w))
    assert got == want, f"forest mismatch: {got} vs {want}"
    lab = labels.to_pandas().sort_values("vid")
    want_lab = cc_oracle(
        np.asarray(src, np.int64), np.asarray(dst, np.int64),
        np.asarray(vertices, np.int64) if vertices is not None else None,
    )
    assert {int(v): int(l) for v, l in zip(lab["vid"], lab["label"])} == want_lab
    return rounds


def test_msf_random_graph_matches_kruskal(ray_session):
    rng = np.random.default_rng(5)
    n, m = 200, 900
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    # tie-heavy integer weights: exercises the strict-total-order tie-break
    w = (1 + (src + dst) % 7).astype(np.float64)
    _check(src, dst, w, P=4)


def test_msf_chain_and_isolated_vertices(ray_session):
    src = np.array([0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 4], np.int64)
    w = np.array([3.0, 1.0, 2.0, 1.0])
    rounds = _check(src, dst, w, P=2, vertices=list(range(8)))
    assert rounds >= 1


def test_msf_partition_invariance(ray_session):
    rng = np.random.default_rng(9)
    n, m = 120, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 5, m).astype(np.float64)
    cfg1 = EngineConfig(num_partitions=1)
    cfg7 = EngineConfig(num_partitions=7)
    f1, _, _ = minimum_spanning_forest(_edges_ds(src, dst, w), weight_col="w", cfg=cfg1)
    f7, _, _ = minimum_spanning_forest(_edges_ds(src, dst, w), weight_col="w", cfg=cfg7)
    assert _forest_set(f1) == _forest_set(f7)


def test_msf_parallel_edges_and_self_loops(ray_session):
    src = np.array([0, 0, 0, 1, 2], np.int64)
    dst = np.array([1, 1, 0, 2, 2], np.int64)  # dup (0,1), self (0,0), (2,2)
    w = np.array([5.0, 2.0, 9.0, 4.0, 7.0])
    forest, _, _ = minimum_spanning_forest(
        _edges_ds(src, dst, w), weight_col="w", cfg=EngineConfig(num_partitions=3)
    )
    assert _forest_set(forest) == [(0, 1, 2.0), (1, 2, 4.0)]
