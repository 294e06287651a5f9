"""earliest_arrival (stages/temporal.py) vs a serial foremost-journey oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.temporal import earliest_arrival


def _edges_ds(src, dst, t, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "t": pa.array(t, pa.int64()),
            }
        )
    ).repartition(blocks)


def _seeds_ds(vids, arrs):
    return rd.from_arrow(
        pa.table({"vid": pa.array(vids, pa.int64()), "arr": pa.array(arrs, pa.int64())})
    )


def _vids_ds(vids):
    return rd.from_arrow(pa.table({"vid": pa.array(vids, pa.int64())}))


def _oracle(src, dst, t, n, seeds):
    """Serial fixpoint: arr[v] = min over self-keep and temporal edges."""
    arr = {v: None for v in range(n)}
    for v, a in seeds:
        arr[v] = a if arr[v] is None else min(arr[v], a)
    adj = {}
    for s, d, tt in zip(src, dst, t):
        if s != d:
            adj.setdefault(int(s), []).append((int(d), int(tt)))
            adj.setdefault(int(d), []).append((int(s), int(tt)))
    changed = True
    while changed:
        changed = False
        for u in range(n):
            if arr[u] is None:
                continue
            for v, tt in adj.get(u, []):
                if tt >= arr[u] and (arr[v] is None or tt < arr[v]):
                    arr[v] = tt
                    changed = True
    return arr


def _run(src, dst, t, seeds, n, P, mode="grouped", dedupe=False):
    res = earliest_arrival(
        _edges_ds(src, dst, t),
        _seeds_ds([s for s, _ in seeds], [a for _, a in seeds]),
        vertices=_vids_ds(list(range(n))),
        cfg=EngineConfig(num_partitions=P, exchange=mode),
        max_rounds=64, dedupe=dedupe,
    )
    df = res.arrivals.to_pandas().set_index("vid").sort_index()
    return {
        int(v): (None if np.isnan(a) else int(a))
        for v, a in df["arr"].items()
    }


def test_temporal_line_graph():
    """Chain with increasing vs decreasing timestamps: time-respecting paths
    follow the increasing direction only."""
    # 0-1 @10, 1-2 @20, 2-3 @5 : seed 0 active from 0
    got = _run([0, 1, 2], [1, 2, 3], [10, 20, 5], [(0, 0)], 4, P=2)
    # 3 unreachable: edge 2-3 happened at t=5, before 2 is reached (20)
    assert got == {0: 0, 1: 10, 2: 20, 3: None}


def test_temporal_seed_activation_time():
    """A seed activating after an adjacent edge's timestamp cannot use it."""
    got = _run([0, 1], [1, 2], [10, 30], [(0, 15)], 3, P=2)
    assert got == {0: 15, 1: None, 2: None}
    got = _run([0, 1], [1, 2], [20, 30], [(0, 15)], 3, P=2)
    assert got == {0: 15, 1: 20, 2: 30}


def test_temporal_multi_seed_min_and_duplicates():
    """Duplicate seed rows min-combine; the earlier activation wins."""
    got = _run([0, 1], [1, 2], [10, 20], [(0, 5), (0, 1), (2, 0)], 3, P=3)
    assert got == {0: 1, 1: 10, 2: 0}


def test_temporal_parallel_edges_keep_both():
    """dedupe=False keeps a LATER parallel copy that is still traversable
    after the min-ts copy's time has passed."""
    # 0-1 at t=5 and t=50; seed 0 active from 10: only the t=50 copy works
    got = _run([0, 0], [1, 1], [5, 50], [(0, 10)], 2, P=2, dedupe=False)
    assert got == {0: 10, 1: 50}
    # min-weight dedupe would keep only t=5 and strand vertex 1
    got = _run([0, 0], [1, 1], [5, 50], [(0, 10)], 2, P=2, dedupe=True)
    assert got == {0: 10, 1: None}


def test_temporal_vs_oracle_random():
    rng = np.random.RandomState(77)
    n, m = 60, 200
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    t = rng.randint(0, 100, m)
    keep = src != dst
    src, dst, t = src[keep], dst[keep], t[keep]
    seeds = [(0, 10), (17, 40), (33, 0)]
    want = _oracle(src, dst, t, n, seeds)
    for P, mode in ((1, "grouped"), (4, "grouped"), (4, "fanout")):
        got = _run(src, dst, t, seeds, n, P=P, mode=mode)
        assert got == want, f"P={P} {mode}"
