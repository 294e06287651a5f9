"""semdedup_flags (per-cell cosine domination) vs a sequential brute oracle."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.cluster import _assign
from ccl_ray.stages.similarity import _semdedup_kernel, semdedup_flags


def _brute(ids, X, cents, tau):
    X = X.astype(np.float64)
    a, _ = _assign(X, cents)
    removed = np.zeros(len(ids), bool)
    for c in range(len(cents)):
        m = np.nonzero(a == c)[0]
        if not len(m):
            continue
        sub_ids, sub = ids[m], X[m]
        d2 = ((sub - cents[c]) ** 2).sum(axis=1)
        order = np.lexsort((sub_ids, d2))
        Xn = sub / np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
        for ri in range(len(order)):
            v = order[ri]
            for rj in range(ri):
                u = order[rj]
                if float(Xn[u] @ Xn[v]) >= tau:
                    removed[m[v]] = True
                    break
    return a, removed


def _run(ids, X, cents, tau):
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in X]),
        }
    )
    got = (
        semdedup_flags(rd.from_arrow(tbl).repartition(3), cents, tau=tau)
        .to_pandas()
        .sort_values("vec_id")
    )
    return (
        got["vec_id"].to_numpy(),
        got["cluster"].to_numpy(),
        got["removed"].to_numpy(),
    )


def test_semdedup_known_pair():
    # two near-identical vectors in one cell: the centroid-closest survives
    cents = np.array([[1.0, 0.0], [-1.0, 0.0]])
    X = np.array([[0.9, 0.01], [0.91, 0.0], [-0.8, 0.1], [0.0, 1.0]])
    ids = np.array([10, 11, 12, 13], np.int64)
    a, want = _brute(ids, X, cents, tau=0.99)
    assert want.sum() == 1  # exactly one of the near-dup pair is removed
    gid, gc, gr = _run(ids, X, cents, tau=0.99)
    assert (gid == ids).all() and (gc == a).all() and (gr == want).all()


def test_semdedup_random_vs_bruteforce():
    rng = np.random.RandomState(7)
    base = rng.randn(12, 8)
    # duplicate some rows with tiny noise so real near-dup sets exist
    X = np.vstack([base, base[:5] + 1e-3 * rng.randn(5, 8)])
    ids = np.arange(100, 100 + len(X), dtype=np.int64)
    cents = rng.randn(3, 8)
    a, want = _brute(ids, X, cents, tau=0.999)
    assert want.any()
    gid, gc, gr = _run(ids, X, cents, tau=0.999)
    assert (gid == ids).all() and (gc == a).all() and (gr == want).all()


def test_semdedup_kernel_blocked_matches_unblocked():
    rng = np.random.RandomState(3)
    X = rng.randn(300, 4)
    X[50:60] = X[0] + 1e-4  # a 11-member near-dup set spanning blocks
    ids = np.arange(300, dtype=np.int64)
    cent = X.mean(axis=0)
    full = _semdedup_kernel(ids, X, cent, 0.999, block=1 << 20)
    small = _semdedup_kernel(ids, X, cent, 0.999, block=16)
    assert (full == small).all() and full.any()
