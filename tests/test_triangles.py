import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import triangle_oracle
from ccl_ray.stages.triangles import triangle_count


def _ds(src, dst, blocks=3):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(blocks)


def test_k4_k3_path():
    # K4 (4 triangles) + K3 (1 triangle) + path (0)
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k3 = [(10, 11), (11, 12), (10, 12)]
    path = [(20, 21), (21, 22), (22, 23)]
    src, dst = zip(*(k4 + k3 + path))
    assert triangle_count(_ds(list(src), list(dst)), cfg=EngineConfig(num_partitions=4)) == 5


def test_duplicates_self_loops_and_direction_ignored():
    src = [1, 2, 3, 3, 1, 1]
    dst = [2, 3, 1, 1, 2, 1]  # triangle 1-2-3 with dup edge, reversed dup, self-loop
    assert triangle_count(_ds(src, dst), cfg=EngineConfig(num_partitions=2)) == 1


def test_random_skewed_matches_oracle_any_partitioning():
    rng = np.random.RandomState(11)
    # Zipf-skewed: hub vertices with high degree (orientation defense)
    n, m = 300, 2000
    src = (rng.zipf(1.5, m) % n).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    want = triangle_oracle(src, dst)
    for P in (1, 4, 8):
        got = triangle_count(_ds(src.tolist(), dst.tolist()), cfg=EngineConfig(num_partitions=P))
        assert got == want
