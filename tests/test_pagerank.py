import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import pagerank_oracle
from ccl_ray.stages.pagerank_bsp import pagerank_bsp


def _ds(src, dst, blocks=3):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(blocks)


def _run(src, dst, vids=None, P=4, sym=False):
    v = rd.from_arrow(pa.table({"vid": pa.array(vids, pa.int64())})) if vids is not None else None
    res = pagerank_bsp(_ds(src, dst), vertices=v, cfg=EngineConfig(num_partitions=P), symmetrize=sym)
    df = res.scores.to_pandas()
    return dict(zip(df["vid"].astype(int), df["score"])), res


def _assert_close(got, want, tol=1e-6):
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < tol, (k, got[k], want[k])


def test_pagerank_with_dangling_and_hub():
    # hub 0 pointed at by many; vertex 99 dangling; 5 isolated-ish
    src = [1, 2, 3, 4, 0, 0, 5]
    dst = [0, 0, 0, 0, 1, 99, 0]
    vids = list(range(6)) + [99, 123]  # 123 fully isolated
    got, res = _run(src, dst, vids=vids)
    want = pagerank_oracle(np.array(src), np.array(dst), np.array(vids))
    _assert_close(got, want)
    # mass conservation
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_partition_invariance():
    rng = np.random.RandomState(7)
    n, m = 300, 1200
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    got1, _ = _run(src, dst, P=1)
    got8, _ = _run(src, dst, P=8)
    want = pagerank_oracle(src, dst, np.concatenate([src, dst]))
    _assert_close(got1, want)
    _assert_close(got8, want)


def test_pagerank_symmetrized():
    src = [1, 2, 3]
    dst = [2, 3, 4]
    got, _ = _run(src, dst, sym=True)
    want = pagerank_oracle(
        np.array(src + dst), np.array(dst + src), np.array(src + dst)
    )
    _assert_close(got, want)


def test_fanout_exchange_matches_oracle():
    rng = np.random.RandomState(13)
    n, m = 200, 600
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    v = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n), pa.int64())}))
    res = pagerank_bsp(_ds(src, dst), vertices=v,
                       cfg=EngineConfig(num_partitions=4, exchange="fanout"))
    df = res.scores.to_pandas()
    got = dict(zip(df["vid"].astype(int), df["score"]))
    want = pagerank_oracle(src, dst, np.arange(n))
    _assert_close(got, want)


def test_pagerank_warm_start_converges_fast_and_agrees():
    """init_scores = the fixpoint itself → convergence in O(1) iterations;
    warm start from a slightly different graph's fixpoint agrees with the
    cold fixpoint within the tol envelope and uses fewer iterations."""
    rng = np.random.RandomState(17)
    n, m = 300, 900
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    cfg = EngineConfig(num_partitions=4)
    cold = pagerank_bsp(_ds(src, dst), cfg=cfg)
    hot = pagerank_bsp(_ds(src, dst), cfg=cfg, init_scores=cold.scores)
    assert hot.iterations <= 3, hot.iterations
    c = cold.scores.to_pandas().set_index("vid")["score"]
    h = hot.scores.to_pandas().set_index("vid")["score"]
    assert float((h - c).abs().max()) <= 20 * cfg.pr_tol / (1 - cfg.pr_damping)

    # warm start after an edge delta: fewer iterations, same fixpoint
    keep = rng.random(m) > 0.05
    prev = pagerank_bsp(_ds(src[keep], dst[keep]),
                        vertices=rd.from_arrow(
                            pa.table({"vid": pa.array(np.arange(n), pa.int64())})),
                        cfg=cfg)
    warm = pagerank_bsp(_ds(src, dst), cfg=cfg, init_scores=prev.scores)
    assert warm.iterations < cold.iterations
    w = warm.scores.to_pandas().set_index("vid")["score"]
    assert float((w - c).abs().max()) <= 20 * cfg.pr_tol / (1 - cfg.pr_damping)
