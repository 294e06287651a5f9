"""Strongly connected components vs the serial Tarjan oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import scc_oracle
from ccl_ray.stages.scc import strongly_connected_components


def _run(src, dst, vids=None, P=4, exchange="grouped"):
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    verts = (
        rd.from_arrow(pa.table({"vid": pa.array(vids, pa.int64())}))
        if vids is not None
        else None
    )
    res = strongly_connected_components(
        edges, vertices=verts, cfg=EngineConfig(num_partitions=P, exchange=exchange)
    )
    df = res.labels.to_pandas()
    return dict(zip(df["vid"].tolist(), df["label"].tolist())), res


def test_scc_random_graphs_vs_tarjan():
    rng = np.random.RandomState(3)
    for n, m in ((30, 60), (200, 500), (500, 800)):
        src = rng.randint(0, n, m).astype(np.int64)
        dst = rng.randint(0, n, m).astype(np.int64)
        want = scc_oracle(src, dst, np.arange(n, dtype=np.int64))
        for P in (1, 4):
            got, _ = _run(src, dst, vids=np.arange(n), P=P)
            assert got == want, (n, m, P)


def test_scc_shapes():
    cases = {
        "cycle": ([0, 1, 2, 3, 4], [1, 2, 3, 4, 0]),
        "path": ([0, 1, 2, 3], [1, 2, 3, 4]),          # all-singleton (trim path)
        "fig8": ([0, 1, 2, 2, 3, 4], [1, 2, 0, 3, 4, 2]),  # two cycles sharing 2
        "selfloops": ([0, 1, 1], [0, 1, 2]),            # self-loops dropped
        "bidir": ([5, 6], [6, 5]),                      # 2-cycle
        "dag_diamond": ([0, 0, 1, 2], [1, 2, 3, 3]),
    }
    for name, (s, d) in cases.items():
        src, dst = np.array(s, np.int64), np.array(d, np.int64)
        want = scc_oracle(src, dst)
        for P in (1, 3):
            got, _ = _run(src, dst, P=P)
            assert got == want, (name, P, got, want)


def test_scc_fanout_exchange_parity():
    rng = np.random.RandomState(11)
    src = rng.randint(0, 120, 300).astype(np.int64)
    dst = rng.randint(0, 120, 300).astype(np.int64)
    want = scc_oracle(src, dst)
    got, _ = _run(src, dst, P=4, exchange="fanout")
    assert got == want


def test_scc_isolated_and_empty():
    got, _ = _run([], [], vids=[7, 9], P=2)
    assert got == {7: 7, 9: 9}
    # duplicate directed edges + isolated vertex via explicit vids
    got, _ = _run([1, 1, 2], [2, 2, 1], vids=[1, 2, 5], P=2)
    assert got == {1: 1, 2: 1, 5: 5}


def test_scc_chain_of_cycles():
    """Condensation is a chain: cycle -> cycle -> cycle (multiple outer
    rounds exercise the settle/delta re-trim path)."""
    # cycles {0,1,2}, {10,11,12}, {20,21,22} linked 2->10, 12->20
    src = np.array([0, 1, 2, 10, 11, 12, 20, 21, 22, 2, 12], np.int64)
    dst = np.array([1, 2, 0, 11, 12, 10, 21, 22, 20, 10, 20], np.int64)
    want = scc_oracle(src, dst)
    got, res = _run(src, dst, P=3)
    assert got == want
    assert res.outer_rounds >= 1


def test_scc_checkpoint_resume_bitwise_identical(tmp_path):
    """Kill-after-round-k resume: a partial run (max_outer=2) leaves
    per-round checkpoints; the resumed run starts from the newest complete
    round and produces the identical label map; a partition-count change
    refuses the checkpoint (fresh start, still identical labels)."""
    rng = np.random.RandomState(11)
    n, m = 300, 700
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    verts = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
    cfg = EngineConfig(num_partitions=4)

    base = strongly_connected_components(edges, vertices=verts, cfg=cfg)
    want = dict(zip(*[base.labels.to_pandas()[c].tolist() for c in ("vid", "label")]))
    assert base.outer_rounds >= 2, "graph must need >=2 outer rounds for this test"

    ck = str(tmp_path / "scc_ck")
    partial = strongly_connected_components(
        edges, vertices=verts, cfg=cfg, max_outer=2, checkpoint_dir=ck,
    )
    assert partial.outer_rounds == 2

    resumed = strongly_connected_components(
        edges, vertices=verts, cfg=cfg, checkpoint_dir=ck,
    )
    got = dict(zip(*[resumed.labels.to_pandas()[c].tolist() for c in ("vid", "label")]))
    assert got == want
    # resumed from round >= 1: fewer live outer rounds than the full run
    assert resumed.outer_rounds <= base.outer_rounds

    # partition-count change: checkpoint refused, fresh run, same labels
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        other = strongly_connected_components(
            edges, vertices=verts, cfg=EngineConfig(num_partitions=2),
            checkpoint_dir=ck,
        )
    got2 = dict(zip(*[other.labels.to_pandas()[c].tolist() for c in ("vid", "label")]))
    assert got2 == want
