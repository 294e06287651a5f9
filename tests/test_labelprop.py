import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.labelprop import min_label_propagation


def _ds(src, dst, blocks=2):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(blocks)


def _seeds(pairs):
    v, s = zip(*pairs) if pairs else ([], [])
    return rd.from_arrow(
        pa.table({"vid": pa.array(list(v), pa.int64()), "seed": pa.array(list(s), pa.int64())})
    )


def _result(ds):
    df = ds.to_pandas()
    return {
        int(r.vid): (None if r.seed_label is None or np.isnan(r.seed_label) else int(r.seed_label))
        for r in df.itertuples()
    }


def test_bounded_rounds_khop_min():
    # path 0-1-2-3-4-5, seed 100 at vertex 0 only
    src = [0, 1, 2, 3, 4]
    dst = [1, 2, 3, 4, 5]
    seeds = _seeds([(0, 100)])
    got = _result(min_label_propagation(_ds(src, dst), seeds, rounds=2, cfg=EngineConfig(num_partitions=2)))
    # after 2 rounds the seed reaches distance <= 2
    assert got[0] == 100 and got[1] == 100 and got[2] == 100
    assert got[3] is None and got[4] is None and got[5] is None


def test_converged_component_min_seed():
    # two components; seeds only in one, two seeds -> min wins
    src = [0, 1, 10, 11]
    dst = [1, 2, 11, 12]
    seeds = _seeds([(2, 55), (0, 77)])
    got = _result(min_label_propagation(_ds(src, dst), seeds, rounds=None, cfg=EngineConfig(num_partitions=4)))
    assert got[0] == got[1] == got[2] == 55
    assert got[10] is None and got[11] is None and got[12] is None


def test_converged_no_seeds_all_null():
    got = _result(
        min_label_propagation(
            _ds([0, 1], [1, 2]), _seeds([]), rounds=None, cfg=EngineConfig(num_partitions=2)
        )
    )
    assert got == {0: None, 1: None, 2: None}


def test_bounded_rounds_no_seeds_all_null():
    got = _result(
        min_label_propagation(
            _ds([0, 1], [1, 2]), _seeds([]), rounds=2, cfg=EngineConfig(num_partitions=2)
        )
    )
    assert got == {0: None, 1: None, 2: None}


def test_khop_sparse_dense_agree(monkeypatch):
    """Forced-sparse and forced-dense k-hop propagation agree for every k;
    with 2 seeds out of 400 vertices the default is sparse from round 1."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    import ccl_ray.stages.cc_bsp as ccmod
    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.labelprop import min_label_propagation

    rng = np.random.RandomState(3)
    n, m = 400, 700
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    edges = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())}))
    seeds = rd.from_arrow(pa.table({"vid": pa.array([7, 250], pa.int64()),
                                    "seed": pa.array([70, 2500], pa.int64())}))
    for k in (1, 2, 4):
        base = None
        for frac in (0.0, 1.1):
            monkeypatch.setattr(ccmod, "_SPARSE_FRAC", frac)
            out = min_label_propagation(
                edges, seeds, rounds=k, cfg=EngineConfig(num_partitions=4)
            ).to_pandas().sort_values("vid").reset_index(drop=True)
            if base is None:
                base = out
            else:
                assert out.equals(base), f"k={k} frac={frac}"
