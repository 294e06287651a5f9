"""HyperLogLog distinct-count sketch vs exact cardinalities."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.sketch import hll_distinct


def test_hll_accuracy_across_cardinalities():
    """p=14 → σ ≈ 0.8%; assert 3σ (covers both the linear-counting and the
    raw-estimator branches) and determinism across partitionings."""
    for n in (100, 5_000, 200_000):
        vals = np.arange(n).repeat(3)
        np.random.RandomState(1).shuffle(vals)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(6)
        est4 = hll_distinct(ds, "x", num_partitions=4)
        assert abs(est4 - n) / n < 0.025, (n, est4)
        est1 = hll_distinct(ds, "x", num_partitions=1)
        # max-merge is order/partitioning-free → identical estimate
        assert est1 == est4, (n, est1, est4)


def test_hll_strings_and_empty():
    ds = rd.from_arrow(
        pa.table({"s": pa.array([f"u{i % 37}" for i in range(500)], pa.string())})
    ).repartition(4)
    est = hll_distinct(ds, "s")
    assert abs(est - 37) / 37 < 0.05
    empty = rd.from_arrow(pa.table({"s": pa.array([], pa.string())}))
    assert hll_distinct(empty, "s") == 0.0
