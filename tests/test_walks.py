"""deterministic_walks vs a serial replay of the same argmin rule."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.walks import K1, K2, K3, deterministic_walks


def _oracle_walks(src, dst, seeds, L):
    adj = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj.setdefault(a, set()).add(b)
    rows = []
    for s in seeds:
        cur = int(s)
        rows.append((cur, 0, cur))
        for t in range(1, L + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            with np.errstate(over="ignore"):
                best = min(
                    nbrs,
                    key=lambda n: (
                        int(np.uint64(cur) * K1 + np.uint64(n) * K2 + np.uint64(t) * K3),
                        n,
                    ),
                )
            rows.append((int(s), t, best))
            cur = best
    return sorted(rows)


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_walks_match_oracle_across_partitionings():
    rng = np.random.default_rng(3)
    n, m = 60, 400
    src = rng.integers(0, n, m).astype(np.int64) * 7
    dst = rng.integers(0, n, m).astype(np.int64) * 7
    seeds = np.unique(src)[:20]
    want = _oracle_walks(src, dst, seeds, 5)
    sd = rd.from_arrow(pa.table({"vid": pa.array(seeds, pa.int64())}))
    for P, ex in ((1, "grouped"), (4, "grouped"), (3, "fanout"), (1, "fanout")):
        got = deterministic_walks(
            _ds(src, dst), sd, 5, cfg=EngineConfig(num_partitions=P, exchange=ex)
        ).to_pandas()
        rows = sorted(zip(got["wid"], got["step"], got["vid"]))
        assert [tuple(map(int, r)) for r in rows] == want, (P, ex)


def test_walks_dead_ends_and_duplicate_edges():
    # 1 -> 2 -> 3 (dead end); duplicate edges must not change the choice
    src = np.array([1, 1, 2, 2], np.int64)
    dst = np.array([2, 2, 3, 3], np.int64)
    sd = rd.from_arrow(pa.table({"vid": pa.array([1, 9], pa.int64())}))
    got = deterministic_walks(
        _ds(src, dst), sd, 4, cfg=EngineConfig(num_partitions=2)
    ).to_pandas()
    rows = sorted(zip(got["wid"], got["step"], got["vid"]))
    # walk 1: 1,2,3 then stops; walk 9: isolated seed, step 0 only
    assert [tuple(map(int, r)) for r in rows] == [
        (1, 0, 1), (1, 1, 2), (1, 2, 3), (9, 0, 9),
    ]
