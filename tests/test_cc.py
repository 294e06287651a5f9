import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import cc_oracle
from ccl_ray.stages.cc import connected_components as cc_dataset
from ccl_ray.stages.cc_bsp import connected_components_bsp


def _edges_ds(src, dst, blocks=4):
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def _labels_dict(res):
    t = res.labels.to_pandas()
    return dict(zip(t["vid"].astype(int), t["label"].astype(int)))


def _check(src, dst, vids=None, cfg=None, blocks=4):
    res = connected_components_bsp(
        _edges_ds(src, dst, blocks),
        vertices=rd.from_arrow(pa.table({"vid": pa.array(vids, pa.int64())})) if vids is not None else None,
        cfg=cfg or EngineConfig(num_partitions=4),
    )
    got = _labels_dict(res)
    want = cc_oracle(np.asarray(src), np.asarray(dst), np.asarray(vids) if vids is not None else None)
    assert got == want
    return res


def test_two_triangles_and_isolated():
    _check([1, 2, 3, 10, 11, 12], [2, 3, 1, 11, 12, 10], vids=[1, 2, 3, 10, 11, 12, 99])


def test_long_chain_converges_in_log_rounds():
    # worst case for plain hash-to-min: a path graph; pointer jumping must
    # bring rounds to O(log n) (SURVEY.md §2.3 C3's quadratic-loop fix)
    n = 512
    res = _check(
        list(range(n - 1)),
        list(range(1, n)),
        cfg=EngineConfig(num_partitions=4, cc_jump_rounds=2, cc_jump_every=1),
    )
    assert res.iterations <= 12
    # default policy (periodic compression) still converges in O(log n)
    res2 = _check(list(range(n - 1)), list(range(1, n)))
    assert res2.iterations <= 30


def test_random_graph_matches_oracle_any_partitioning():
    rng = np.random.RandomState(42)
    n, m = 2000, 3500
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    base = None
    for P in (1, 2, 8):
        res = _check(src, dst, cfg=EngineConfig(num_partitions=P), blocks=3)
        d = _labels_dict(res)
        if base is None:
            base = d
        else:
            # distributed-equals-serial (reference test_segmented_ccl analog,
            # ccl_marker_stack.py:1411-1686)
            assert d == base


def test_self_loops_and_duplicates():
    _check([1, 1, 2, 2, 5], [1, 2, 1, 3, 5])


def test_sparse_huge_vid_space():
    # vids far apart (hash-derived ids): exercises searchsorted alignment
    base = 10**17
    src = [base + 1, base + 5 * 10**16]
    dst = [base + 2, base + 5 * 10**16 + 7]
    _check(src, dst)


def test_dataset_strategy_small():
    # the pure-Dataset formulation (groupby/hash-join rounds) must agree;
    # kept small — its per-round driver overhead is the reason the BSP
    # shard engine is the default.
    src = [1, 2, 3, 10, 11, 12]
    dst = [2, 3, 1, 11, 12, 10]
    res = cc_dataset(_edges_ds(src, dst, 2), cfg=EngineConfig(num_partitions=2, cc_jump_rounds=1))
    got = _labels_dict(res)
    assert got == cc_oracle(np.asarray(src), np.asarray(dst))


def test_fanout_exchange_agrees_with_grouped():
    rng = np.random.RandomState(9)
    n, m = 800, 1500
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    a = _check(src, dst, cfg=EngineConfig(num_partitions=4, exchange="grouped"))
    b = _check(src, dst, cfg=EngineConfig(num_partitions=4, exchange="fanout"))
    assert _labels_dict(a) == _labels_dict(b)


def test_dust_filter_zeroes_small_components():
    from ccl_ray.stages.aggregates import component_sizes, dust_filter

    # one big component (100-104 chain), one small (110-111); vids start
    # above 0 because label 0 is the background value (reference A1)
    res = _check([100, 101, 102, 103, 110], [101, 102, 103, 104, 111])
    filtered = dust_filter(res.labels, min_size=3).to_pandas()
    d = dict(zip(filtered["vid"].astype(int), filtered["label"].astype(int)))
    assert d[110] == 0 and d[111] == 0             # dust zeroed (reference A1)
    assert d[100] == d[101] == d[102] == d[103] == d[104] == 100
    sizes = component_sizes(res.labels, min_size=3).to_pandas()
    assert len(sizes) == 1 and int(sizes["n_vertices"].iloc[0]) == 5


def test_cc_sparse_dense_fanout_agree(monkeypatch):
    """Force always-sparse and never-sparse frontier exchange; both must
    match the union-find oracle in both exchange modes (the hybrid default
    sits between them). A long chain with jump compression on exercises the
    jump-mask accumulation that feeds the sparse frontier."""
    import ccl_ray.stages.cc_bsp as ccmod

    rng = np.random.RandomState(7)
    n, m = 300, 420
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    chain = list(range(1000, 1128))
    src = np.concatenate([src, chain[:-1]])
    dst = np.concatenate([dst, chain[1:]])
    for frac in (0.0, 1.1):
        monkeypatch.setattr(ccmod, "_SPARSE_FRAC", frac)
        for mode in ("grouped", "fanout"):
            for jump_every in (1, 3):
                _check(
                    src, dst,
                    cfg=EngineConfig(
                        num_partitions=4, exchange=mode,
                        cc_jump_every=jump_every, cc_jump_rounds=2,
                    ),
                )
