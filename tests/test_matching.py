"""Maximal matching vs the sequential greedy oracle (same priority order).

The mutual-minimum parallel rounds compute exactly the greedy maximal
matching over edges sorted by the injective priority — the standard
equivalence (each round matches every edge that is the minimum among its
still-alive conflicts, which is the same fixpoint the sequential scan
reaches)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.matching import PRIO_K, PRIO_K2, maximal_matching


def greedy_oracle(src, dst):
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    prio = pairs[:, 0].astype(np.uint64) * PRIO_K + pairs[:, 1].astype(np.uint64) * PRIO_K2
    order = np.argsort(prio)
    matched = set()
    out = []
    for i in order:
        u, v = int(pairs[i, 0]), int(pairs[i, 1])
        if u not in matched and v not in matched:
            matched.add(u)
            matched.add(v)
            out.append((u, v))
    return sorted(out)


def _edges_ds(src, dst, blocks=4):
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def _check(src, dst, P, exchange="grouped"):
    cfg = EngineConfig(num_partitions=P, exchange=exchange)
    ds, rounds = maximal_matching(_edges_ds(src, dst), cfg=cfg)
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    got = list(zip(df["src"].tolist(), df["dst"].tolist()))
    want = greedy_oracle(src, dst)
    assert got == want, f"{got} vs {want}"
    return rounds


def test_path_and_triangle(ray_session):
    # path 0-1-2-3 plus triangle 10-11-12
    _check([0, 1, 2, 10, 11, 12], [1, 2, 3, 11, 12, 10], P=3)


def test_star_matches_one_edge(ray_session):
    src = [0] * 8
    dst = list(range(1, 9))
    cfg = EngineConfig(num_partitions=4)
    ds, _ = maximal_matching(_edges_ds(src, dst), cfg=cfg)
    assert ds.count() == 1


def test_random_graph_all_partitions(ray_session):
    rng = np.random.default_rng(23)
    n, m = 200, 800
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    for P in (1, 4):
        rounds = _check(src, dst, P=P)
        assert rounds <= 32


def test_fanout_exchange_parity(ray_session):
    rng = np.random.default_rng(3)
    n, m = 100, 350
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    _check(src, dst, P=3, exchange="fanout")


def test_maximality(ray_session):
    # no alive edge may remain: every edge has a matched endpoint
    rng = np.random.default_rng(41)
    n, m = 120, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    cfg = EngineConfig(num_partitions=4)
    ds, _ = maximal_matching(_edges_ds(src, dst), cfg=cfg)
    df = ds.to_pandas()
    matched = set(df["src"]) | set(df["dst"])
    assert len(matched) == 2 * len(df)  # disjoint pairs
    for u, v in zip(src.tolist(), dst.tolist()):
        if u != v:
            assert u in matched or v in matched


def weighted_greedy_oracle(src, dst, wfun):
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    w = wfun(pairs[:, 0], pairs[:, 1])
    base = pairs[:, 0].astype(np.uint64) * PRIO_K + pairs[:, 1].astype(np.uint64) * PRIO_K2
    prio = ((np.uint64(7) - w.astype(np.uint64)) << np.uint64(61)) | (
        base >> np.uint64(3)
    )
    order = np.argsort(prio)
    matched = set()
    out = []
    for i in order:
        u, v = int(pairs[i, 0]), int(pairs[i, 1])
        if u not in matched and v not in matched:
            matched.add(u)
            matched.add(v)
            out.append((u, v))
    return sorted(out)


def test_weighted_matching_prefers_heavy_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.matching import maximal_matching

    # path 1-2-3: edge (2,3) has weight 7, (1,2) weight 1 -> (2,3) matches
    t = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 3], pa.int64()),
         "w": pa.array([1.0, 7.0], pa.float64())}
    )
    ds, _ = maximal_matching(
        rd.from_arrow(t), cfg=EngineConfig(num_partitions=2), weight_col="w"
    )
    assert ds.to_pandas().values.tolist() == [[2, 3]]


def test_weighted_matching_matches_weighted_oracle(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.matching import maximal_matching

    rng = np.random.default_rng(31)
    n, m = 150, 600
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    wfun = lambda a, b: (1 + (a + b) % 7).astype(np.int64)  # noqa: E731
    want = weighted_greedy_oracle(src, dst, wfun)
    t = pa.table(
        {"src": pa.array(src), "dst": pa.array(dst),
         "w": pa.array(wfun(np.minimum(src, dst), np.maximum(src, dst)).astype(np.float64))}
    )
    for P in (1, 4):
        ds, rounds = maximal_matching(
            rd.from_arrow(t).repartition(4),
            cfg=EngineConfig(num_partitions=P), weight_col="w",
        )
        df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        got = list(zip(df["src"].tolist(), df["dst"].tolist()))
        assert got == want, P


def test_matching_huge_vid_space(ray_session):
    # transcript-layout vids (conv<<22 | turn) exceed 2^32: the two-constant
    # priority must handle them (the old packed bijection could not)
    base = np.int64(1) << 40
    src = (base + np.array([0, 1, 2, 10], np.int64) * (1 << 22))
    dst = (base + np.array([1, 2, 3, 11], np.int64) * (1 << 22))
    _check(src.tolist(), dst.tolist(), P=3)
