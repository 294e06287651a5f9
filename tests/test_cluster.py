"""Distributed k-means vs its driver numpy twin."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.cluster import kmeans_embed, kmeans_oracle


def _emb_ds(n=400, d=16, seed=3, blocks=5):
    rng = np.random.default_rng(seed)
    # three well-separated blobs so the run is insensitive to tie noise
    centers = rng.normal(size=(3, d)) * 10.0
    x = centers[rng.integers(0, 3, n)] + rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(x))})
    return rd.from_arrow(t).repartition(blocks), ids, x


def test_kmeans_matches_numpy_twin(ray_session):
    ds, ids, x = _emb_ds()
    k, iters = 3, 5
    assign_ds, cents, inertia, ran = kmeans_embed(ds, k=k, iters=iters)
    want_a, want_c, want_in = kmeans_oracle(ids, x, k=k, iters=iters)
    assert ran == iters
    assert np.allclose(cents, want_c, atol=1e-8)
    assert abs(inertia - want_in) <= 1e-9 * want_in
    got = assign_ds.to_pandas().sort_values("vec_id")
    assert (got["cluster"].values == want_a).all()


def test_kmeans_partition_invariance(ray_session):
    ds1, ids, x = _emb_ds(blocks=1)
    ds8, _, _ = _emb_ds(blocks=8)
    _, c1, i1, _ = kmeans_embed(ds1, k=4, iters=4)
    _, c8, i8, _ = kmeans_embed(ds8, k=4, iters=4)
    assert np.allclose(c1, c8, atol=1e-8)
    assert abs(i1 - i8) <= 1e-9 * i1
