"""Dense int32 vertex renumbering (state.dense): exactness vs the original-
domain BSP path and vs the union-find oracle, across partition counts,
sparse 64-bit vid spaces, isolated vertices and resume."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import cc_oracle
from ccl_ray.stages.cc_bsp import connected_components_bsp
from ccl_ray.stages.pagerank_bsp import pagerank_bsp


def _edges_tbl(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(3)


def _rand_graph(seed=7, n=300, m=500, stride=1):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, n, m).astype(np.int64) * stride
    d = rng.randint(0, n, m).astype(np.int64) * stride
    return s, d


def _sorted_labels(res):
    return res.labels.to_pandas().sort_values("vid").reset_index(drop=True)


def test_dense_matches_hash_path_and_oracle():
    s, d = _rand_graph()
    edges = _edges_tbl(s, d)
    want = cc_oracle(s, d)
    for P in [1, 4]:
        dense = _sorted_labels(
            connected_components_bsp(edges, cfg=EngineConfig(num_partitions=P, dense_ids=True))
        )
        hashp = _sorted_labels(
            connected_components_bsp(edges, cfg=EngineConfig(num_partitions=P, dense_ids=False))
        )
        assert dense.equals(hashp)
        got = dict(zip(dense["vid"], dense["label"]))
        assert got == want


def test_dense_sparse_64bit_vids_translate_exactly():
    # vids far above 2^32: dense rank must be int32 internally yet translate
    # back to the exact original 64-bit ids
    s, d = _rand_graph(seed=11, n=200, m=350, stride=(1 << 40) + 12345)
    edges = _edges_tbl(s, d)
    res = connected_components_bsp(edges, cfg=EngineConfig(num_partitions=4, dense_ids=True))
    df = _sorted_labels(res)
    assert set(df["vid"]) == set(s) | set(d)
    assert df["vid"].dtype == np.int64 and df["label"].dtype == np.int64
    assert cc_oracle(s, d) == dict(zip(df["vid"], df["label"]))


def test_dense_isolated_vertices_and_chain():
    # a long chain (worst case for propagation) plus isolated explicit vertices
    n = 200
    s = np.arange(n - 1, dtype=np.int64) * 3
    d = (np.arange(n - 1, dtype=np.int64) + 1) * 3
    edges = _edges_tbl(s, d)
    verts = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n + 50, dtype=np.int64) * 3, pa.int64())})
    )
    res = connected_components_bsp(
        edges, vertices=verts, cfg=EngineConfig(num_partitions=4, dense_ids=True)
    )
    df = _sorted_labels(res)
    assert len(df) == n + 50
    chain = df[df["vid"] < n * 3 - 2]
    assert (chain["label"] == 0).all()  # whole chain collapses to min vid 0
    iso = df[df["vid"] >= n * 3]
    assert (iso["label"] == iso["vid"]).all()  # isolated vertices self-label


def test_dense_pagerank_vids_translate():
    s, d = _rand_graph(seed=5)
    edges = _edges_tbl(s, d)
    a = pagerank_bsp(edges, cfg=EngineConfig(num_partitions=4, dense_ids=True), symmetrize=True)
    b = pagerank_bsp(edges, cfg=EngineConfig(num_partitions=4, dense_ids=False), symmetrize=True)
    da = a.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    db = b.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (da["vid"].values == db["vid"].values).all()
    assert np.allclose(da["score"].values, db["score"].values, rtol=0, atol=1e-12)


def test_dense_checkpoint_resume(tmp_path):
    from ccl_ray.state.checkpoint import ShardCheckpoint

    s, d = _rand_graph(seed=9)
    edges = _edges_tbl(s, d)
    cfg = EngineConfig(num_partitions=4, dense_ids=True, checkpoint_every=1)
    want = _sorted_labels(connected_components_bsp(edges, cfg=cfg))

    ck_dir = str(tmp_path / "dense_ck")
    cfg_short = EngineConfig(num_partitions=4, dense_ids=True, checkpoint_every=1, cc_max_iters=2)
    connected_components_bsp(edges, cfg=cfg_short, checkpoint=ShardCheckpoint(ck_dir))
    resumed = connected_components_bsp(edges, cfg=cfg, checkpoint=ShardCheckpoint(ck_dir))
    assert _sorted_labels(resumed).equals(want)


def test_dense_empty_edges_with_vertices():
    """Empty edge table + explicit vertices: every vertex self-labels.
    Exercises the degenerate splitter path (no samples → R=1)."""
    edges = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    verts = rd.from_arrow(pa.table({"vid": pa.array([5, 7, 11], pa.int64())}))
    res = connected_components_bsp(
        edges, vertices=verts, cfg=EngineConfig(num_partitions=3, dense_ids=True)
    )
    df = _sorted_labels(res)
    assert df["vid"].tolist() == [5, 7, 11]
    assert (df["label"] == df["vid"]).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)), min_size=0, max_size=80))
@settings(max_examples=15, deadline=None)
def test_dense_equals_hash_property(pairs):
    """Random small graphs: dense path labels == original-domain labels."""
    if not pairs:
        return
    s = np.array([a * 13 for a, _ in pairs], dtype=np.int64)
    d = np.array([b * 13 for _, b in pairs], dtype=np.int64)
    edges = _edges_tbl(s, d)
    dense = _sorted_labels(
        connected_components_bsp(edges, cfg=EngineConfig(num_partitions=3, dense_ids=True))
    )
    hashp = _sorted_labels(
        connected_components_bsp(edges, cfg=EngineConfig(num_partitions=3, dense_ids=False))
    )
    assert dense.equals(hashp)
