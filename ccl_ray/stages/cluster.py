"""Distributed k-means (Lloyd) over an embedding column.

Document clustering is a staple of training-data curation (topic balancing,
cluster-based dedup sampling, domain mixing). The engine already buckets
embeddings with a driver-side seeded quantizer for IVF (similarity.py);
this is the full distributed version: every iteration is ONE streaming
pass over the corpus plus a k·d-sized exchange — the corpus itself never
shuffles and never lands on the driver.

Per iteration:
1. centroids broadcast once (ray.put via closure capture — k·d float64,
   tiny) into a per-batch vectorized assignment: argmin over
   -2·X·Cᵀ + ||c||² (one matmul per batch);
2. per-batch partial sums: (cluster, dim, s) rows — k·d rows per block,
   the classic combiner — plus per-batch inertia partials;
3. partial_sum_agg reduces to k·d rows; the driver folds them into the
   next centroid matrix (empty clusters keep their previous centroid).

Initialization is deterministic and order-free: the k vectors whose
md5_low64(id) is smallest ("bottom-k by hash", the sample.py contract) —
reproducible across partitionings, block orders, and cluster sizes, and
replicable by the numpy twin in the gate's kmeans_close row.

Determinism note: the reduced partial sums commute over float64 addition
up to ~1e-15 relative error; assignments are integral argmins and only
flip on exact near-ties, which the gate row therefore checks as booleans
(centroids allclose, inertia relative gap) rather than raw hashes.

Reference analog: none — the reference has no vector operators; this
fills SURVEY §2's training-data clustering lane alongside IVF-ANN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.sample import _md5_low64


def _vecs(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack(df[vec_col].values).astype(np.float64)


def _assign(x: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster index, squared distance) per row — ties go to the lowest
    cluster index (np.argmin), the same rule as the numpy twin."""
    d2 = x @ (-2.0 * cents.T) + (cents * cents).sum(axis=1)
    a = np.argmin(d2, axis=1)
    sq = (x * x).sum(axis=1) + d2[np.arange(len(x)), a]
    return a, np.maximum(sq, 0.0)


def _bottomk_init(emb: "rd.Dataset", k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Centroids = vectors of the k smallest md5_low64(id). Per-block
    bottom-k partials (k rows each) merge on the driver — bounded by
    k · num_blocks rows of d floats, never the corpus."""

    def partial(df: pd.DataFrame) -> pa.Table:
        h = _md5_low64(df[id_col].values)
        idx = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "h": pa.array(h[idx]),
                vec_col: pa.array(list(_vecs(df.iloc[idx], vec_col))),
            }
        )

    cand = emb.map_batches(partial, batch_format="pandas").to_pandas()
    order = np.argsort(cand["h"].values.astype(np.uint64), kind="stable")[:k]
    return np.stack(cand[vec_col].values[order]).astype(np.float64)


def kmeans_embed(
    emb: "rd.Dataset",
    *,
    k: int = 8,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Lloyd's k-means. Returns (assignments Dataset (id_col, cluster),
    centroids ndarray [k, d], inertia float, iters run)."""
    from ccl_ray.stages.aggregates import partial_sum_agg

    assert k > 0 and iters > 0
    cents = _bottomk_init(emb, k, id_col, vec_col)
    assert len(cents) == k, f"kmeans: fewer than k={k} input rows"
    d = cents.shape[1]
    inertia = float("nan")

    for _ in range(iters):
        c = cents  # rebind so each closure captures THIS iteration's matrix

        def stats(df: pd.DataFrame) -> pa.Table:
            if not len(df):
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.float64()),
                        "cnt": pa.array([], pa.float64()),
                        "sq": pa.array([], pa.float64()),
                    }
                )
            x = _vecs(df, vec_col)
            a, sq = _assign(x, c)
            sums = np.zeros((k, d))
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                    "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                    "s": pa.array(sums.ravel()),
                    # cnt/sq replicated across the d rows of cluster 0's dim
                    # column would skew sums — carry them on dim 0 rows only
                    "cnt": pa.array(np.where(
                        np.tile(np.arange(d), k) == 0, np.repeat(cnt, d), 0.0)),
                    "sq": pa.array(np.where(
                        np.tile(np.arange(d), k) == 0,
                        np.repeat(np.full(k, sq.sum() / k), d), 0.0)),
                }
            )

        red = partial_sum_agg(
            emb.map_batches(stats, batch_format="pandas"),
            ["cluster", "dim"],
            {"s": "s", "cnt": "cnt", "sq": "sq"},
        ).to_pandas()
        red = red.sort_values(["cluster", "dim"])
        sums = red["s"].values.reshape(k, d)
        cnt = red["cnt"].values.reshape(k, d)[:, 0]
        inertia = float(red["sq"].values.sum())
        new = cents.copy()
        nz = cnt > 0
        new[nz] = sums[nz] / cnt[nz, None]
        cents = new

    cfinal = cents

    def assign_out(df: pd.DataFrame) -> pa.Table:
        a, _ = _assign(_vecs(df, vec_col), cfinal)
        return pa.table(
            {
                id_col: pa.array(df[id_col].values.astype(np.int64)),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return emb.map_batches(assign_out, batch_format="pandas"), cents, inertia, iters


def kmeans_oracle(ids: np.ndarray, x: np.ndarray, *, k: int, iters: int):
    """Driver-side numpy twin: identical init, update and tie rules.
    Returns (assignments, centroids, inertia)."""
    h = _md5_low64(ids)
    cents = x[np.argsort(h, kind="stable")[:k]].astype(np.float64)
    x = x.astype(np.float64)
    a = np.zeros(len(x), np.int64)
    inertia = float("nan")
    for _ in range(iters):
        a, sq = _assign(x, cents)
        inertia = float(sq.sum())
        new = cents.copy()
        for j in range(k):
            m = a == j
            if m.any():
                new[j] = x[m].mean(axis=0)
        cents = new
    a, _ = _assign(x, cents)
    return a, cents, inertia
