"""dag_levels (longest-path levels) vs a serial topological oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.dag import dag_levels


def _oracle_levels(src, dst, vids):
    """Serial longest-path-ending-at-v by repeated relaxation (small n)."""
    lvl = {int(v): 0 for v in vids}
    for v in src:
        lvl.setdefault(int(v), 0)
    for v in dst:
        lvl.setdefault(int(v), 0)
    for _ in range(len(lvl) + 1):
        changed = False
        for a, b in zip(src, dst):
            if lvl[int(a)] + 1 > lvl[int(b)]:
                lvl[int(b)] = lvl[int(a)] + 1
                changed = True
        if not changed:
            return lvl
    raise AssertionError("oracle: cycle")


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_dag_levels_random_dags_partitionings():
    rng = np.random.default_rng(7)
    for n, m in ((30, 80), (200, 600)):
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        # orient low->high vid: guaranteed acyclic
        src = np.minimum(a[keep], b[keep]) * 10 + 3
        dst = np.maximum(a[keep], b[keep]) * 10 + 3
        vids = np.arange(n) * 10 + 3
        want = _oracle_levels(src, dst, vids)
        for P, ex in ((1, "grouped"), (4, "grouped"), (3, "fanout")):
            cfg = EngineConfig(num_partitions=P, exchange=ex)
            labels, depth, waves = dag_levels(
                _ds(src, dst),
                vertices=rd.from_arrow(pa.table({"vid": pa.array(vids, pa.int64())})),
                cfg=cfg,
            )
            got = {int(r["vid"]): int(r["level"]) for r in labels.to_pandas().to_dict("records")}
            assert got == want, (P, ex)
            assert depth == max(want.values())


def test_dag_levels_chain_and_empty():
    # depth-9 chain: exactly 9 productive waves + 1 quiescent
    src = np.arange(9)
    dst = np.arange(1, 10)
    labels, depth, waves = dag_levels(_ds(src, dst), cfg=EngineConfig(num_partitions=2))
    assert depth == 9
    got = labels.to_pandas().sort_values("vid")["level"].tolist()
    assert got == list(range(10))

    empty = _ds([], [])
    labels, depth, waves = dag_levels(
        empty,
        vertices=rd.from_arrow(pa.table({"vid": pa.array([5, 6], pa.int64())})),
        cfg=EngineConfig(num_partitions=2),
    )
    assert depth == 0
    assert sorted(labels.to_pandas()["level"]) == [0, 0]


def test_dag_levels_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        dag_levels(_ds([1, 2, 3], [2, 3, 1]), cfg=EngineConfig(num_partitions=2))
    # self-loop is a cycle too
    with pytest.raises(ValueError, match="cycle"):
        dag_levels(_ds([1, 2], [1, 3]), cfg=EngineConfig(num_partitions=1))


def test_reachable_from_matches_closure():
    from ccl_ray.stages.dag import reachable_from

    rng = np.random.default_rng(13)
    n, m = 150, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)  # cyclic in general
    seeds = np.array([0, 7, 33], np.int64)

    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
    want, stack = set(seeds.tolist()), list(seeds.tolist())
    while stack:
        for w in adj.get(stack.pop(), ()):
            if w not in want:
                want.add(w)
                stack.append(w)

    sd = rd.from_arrow(pa.table({"vid": pa.array(seeds)}))
    vs = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
    for P, ex in ((1, "grouped"), (4, "grouped"), (3, "fanout")):
        labels, n_reached, waves = reachable_from(
            _ds(src, dst), sd, vertices=vs,
            cfg=EngineConfig(num_partitions=P, exchange=ex),
        )
        df = labels.to_pandas()
        got = set(df[df["reached"] == 1]["vid"].astype(int))
        assert got == want, (P, ex)
        assert n_reached == len(want)

    # seeds not in the graph are ignored; empty seed set reaches nothing
    labels, n_reached, _ = reachable_from(
        _ds(src, dst),
        rd.from_arrow(pa.table({"vid": pa.array([99999], pa.int64())})),
        vertices=vs, cfg=EngineConfig(num_partitions=2),
    )
    assert n_reached == 0
