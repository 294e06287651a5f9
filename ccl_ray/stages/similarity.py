"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: the query matrix is ray.put ONCE and read in
  each actor's __init__ (never re-shipped per batch); each batch does one
  numpy matmul; per-batch top-k candidates are combined by a tiny final
  groupby — the full similarity matrix never materializes.
- IVF variant: coarse k-means centroids (sampled, driver-side, seeded) →
  per-batch cluster assignment → probe only the nprobe nearest clusters.
  Same result contract, sub-linear scan at scale.
- cosine near-dup pairs for dedup (threshold instead of top-k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _to_matrix(series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _arrow_list_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<float> column, zero-copy
    on the flat values buffer (no per-row Python objects)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy()
    vals = arr.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    if len(lens) and (lens == lens[0]).all():
        start, stop = offs[0], offs[-1]
        return vals[start:stop].reshape(len(lens), lens[0]).astype(np.float64, copy=False)
    return np.stack([vals[offs[i] : offs[i + 1]] for i in range(len(lens))]).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


_PAIR_SCHEMA = None  # set lazily to avoid importing pa at module import cost


def _pair_table(a, b, s) -> "object":
    import pyarrow as pa

    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "sim": pa.array(s, pa.float64()),
        }
    )


class _CosineScan:
    """Arrow in / Arrow out so empty blocks keep their schema."""

    def __init__(self, queries_ref, k, threshold, exclude_self):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qm = _normalize(q["mat"])
        self.k = k
        self.threshold = threshold
        self.exclude_self = exclude_self

    def __call__(self, batch) -> "object":
        if batch.num_rows == 0:
            return _pair_table([], [], [])
        cm = _normalize(_arrow_list_matrix(batch.column("embedding")))
        cids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims = self.qm @ cm.T  # (Q, B)
        out_a, out_b, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            mask = np.ones(len(cids), dtype=bool)
            if self.exclude_self:
                mask &= cids != qid
            if self.threshold is not None:
                mask &= row >= self.threshold
            idx = np.nonzero(mask)[0]
            if self.k is not None and len(idx) > self.k:
                # deterministic per-batch prune: (-sim, b) order so ties at
                # the cut keep the smallest ids — matching the global
                # (sim desc, b asc) tie-break and the SQL row_number oracle
                order = np.lexsort((cids[idx], -row[idx]))
                idx = idx[order[: self.k]]
            out_a.append(np.full(len(idx), qid, dtype=np.int64))
            out_b.append(cids[idx])
            out_s.append(row[idx])
        return _pair_table(
            np.concatenate(out_a) if out_a else [],
            np.concatenate(out_b) if out_b else [],
            np.concatenate(out_s) if out_s else [],
        )


def _load_queries(embeddings: "rd.Dataset", query_ids) -> "ray.ObjectRef":
    import pyarrow as pa
    import pyarrow.compute as pc

    qset = pa.array(sorted(int(x) for x in query_ids), pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("vec_id"), value_set=qset))

    q = (
        embeddings.map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    return ray.put({"ids": q["vec_id"].values.astype(np.int64), "mat": _to_matrix(q["embedding"])})


def cosine_topk(
    embeddings: "rd.Dataset", query_ids, k: int = 5, *, round_to: int | None = 6
) -> "rd.Dataset":
    """(a, b, sim, rank): exact top-k neighbors per query by cosine.

    Deterministic order: sim desc, then b asc (ties broken by id).
    """
    ref = _load_queries(embeddings, query_ids)
    cands = embeddings.map_batches(
        _CosineScan,
        batch_format="pyarrow",
        concurrency=(1, 8), max_restarts=0,
        fn_constructor_args=(ref, k, None, True),
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "b"], ascending=[False, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        if round_to is not None:
            df["sim"] = df["sim"].round(round_to)
        return df

    return cands.groupby("a").map_groups(topk, batch_format="pandas")


def cosine_pairs(
    embeddings: "rd.Dataset", query_ids, threshold: float = 0.8, *, round_to: int | None = 6
) -> "rd.Dataset":
    """(a, b, sim): all pairs with cosine >= threshold for the given queries."""
    ref = _load_queries(embeddings, query_ids)
    out = embeddings.map_batches(
        _CosineScan,
        batch_format="pyarrow",
        concurrency=(1, 8), max_restarts=0,
        fn_constructor_args=(ref, None, threshold, True),
    )
    if round_to is not None:
        out = out.map_batches(
            lambda df: df.assign(sim=df["sim"].round(round_to)), batch_format="pandas"
        )
    return out


def embedding_dedup_pairs(
    embeddings: "rd.Dataset",
    threshold: float = 0.95,
    *,
    n_clusters: int = 16,
    assign_top: int = 2,
    seed: int = 0,
    round_to: int | None = 6,
) -> "rd.Dataset":
    """Near-duplicate vectors (a < b, cosine >= threshold) via IVF bucketing.

    Scale path — no driver-side id materialization, no all-pairs broadcast:
    a seeded coarse quantizer (sampled k-means) is broadcast once (ray.put);
    each vector routes to its ``assign_top`` nearest clusters inside
    map_batches; exact-cosine candidate verification happens within each
    cluster bucket (groupby); cross-bucket duplicates collapse via a tiny
    (a, b) groupby. Recall: a pair is found iff its members share a probed
    cluster — the standard IVF approximation, ~total for tight near-dups
    with assign_top >= 2. Partitioning assumption: a bucket holds ~
    N·assign_top/n_clusters vectors and is verified in one task — raise
    n_clusters with N to bound per-task memory/compute.

    APPROXIMATE by design (this replaced round 1's exact all-pairs
    broadcast, a scale-killer). ``assign_top=n_clusters`` recovers exact
    (quadratic) semantics for small corpora; the embedding_dedup query pins
    (threshold=0.45, n_clusters=16, assign_top=4), verified-total recall on
    the gate corpora at both sf0.001 and sf0.01.
    """
    import pyarrow as pa

    cents = kmeans_centroids(embeddings, n_clusters=n_clusters, seed=seed)
    ref = ray.put(cents)

    class Route:
        def __init__(self):
            self.cents = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                # explicit dtypes: a default-constructed empty frame would be
                # float64/object, and Ray 2.49 crashes when blocks of one
                # dataset disagree on schema
                return pd.DataFrame(
                    {
                        "cluster": pd.Series([], dtype=np.int64),
                        "vec_id": pd.Series([], dtype=np.int64),
                        "embedding": pd.Series([], dtype=object),
                    }
                )
            cm = _normalize(_to_matrix(df["embedding"]))
            ids = df["vec_id"].values.astype(np.int64)
            t = min(assign_top, len(self.cents))
            top = np.argsort(-(cm @ self.cents.T), axis=1)[:, :t]
            rep = np.repeat(np.arange(len(ids)), t)
            return pd.DataFrame(
                {
                    "cluster": top.ravel().astype(np.int64),
                    "vec_id": ids[rep],
                    "embedding": df["embedding"].values[rep],
                }
            )

    routed = embeddings.map_batches(Route, batch_format="pandas", concurrency=(1, 8), max_restarts=0)

    def bucket_pairs(df: pd.DataFrame) -> "pa.Table":
        sub = df.drop_duplicates("vec_id").sort_values("vec_id")
        ids = sub["vec_id"].values.astype(np.int64)
        if len(ids) < 2:
            return _pair_table([], [], [])
        m = _normalize(_to_matrix(sub["embedding"]))
        ii, jj = np.triu_indices(len(ids), 1)
        s = (m @ m.T)[ii, jj]
        keep = s >= threshold
        return _pair_table(ids[ii[keep]], ids[jj[keep]], s[keep])

    pairs = routed.groupby("cluster").map_groups(bucket_pairs, batch_format="pandas")

    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    out = partitioned_groupby_agg(pairs, ["a", "b"], {"sim": ("sim", "min")})

    def finish(df: pd.DataFrame) -> "pa.Table":
        sim = df["sim"].values.astype(np.float64)
        if round_to is not None:
            sim = np.round(sim, round_to)
        return _pair_table(df["a"].values.astype(np.int64), df["b"].values.astype(np.int64), sim)

    return out.map_batches(finish, batch_format="pandas")


def kmeans_centroids(
    embeddings: "rd.Dataset", n_clusters: int = 16, iters: int = 10, seed: int = 0, sample: int = 4096
) -> np.ndarray:
    """Seeded coarse k-means on a driver-side sample (IVF coarse quantizer)."""
    df = embeddings.limit(sample).to_pandas()
    x = _normalize(_to_matrix(df["embedding"]))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            m = x[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(
    embeddings: "rd.Dataset",
    query_ids,
    k: int = 5,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 0,
) -> "rd.Dataset":
    """Approximate top-k: scan only vectors in the nprobe clusters nearest
    each query (IVF). Returns same schema as cosine_topk."""
    cents = kmeans_centroids(embeddings, n_clusters=n_clusters, seed=seed)
    ref_q = _load_queries(embeddings, query_ids)
    q = ray.get(ref_q)
    qm = _normalize(q["mat"])
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put({"cents": cents, "probe": probe, "qids": q["ids"], "qm": qm})

    class Scan:
        def __init__(self):
            st = ray.get(ref)
            self.cents, self.probe, self.qids, self.qm = (
                st["cents"], st["probe"], st["qids"], st["qm"],
            )
            self.k = k

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            cm = _normalize(_to_matrix(df["embedding"]))
            cids = df["vec_id"].values.astype(np.int64)
            assign = np.argmax(cm @ self.cents.T, axis=1)
            sims = self.qm @ cm.T
            out = []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(assign, self.probe[qi]) & (cids != qid)
                idx = np.nonzero(mask)[0]
                row = sims[qi][idx]
                if len(idx) > self.k:
                    order = np.lexsort((cids[idx], -row))
                    idx, row = idx[order[: self.k]], row[order[: self.k]]
                out.append(pd.DataFrame({"a": qid, "b": cids[idx], "sim": row}))
            return (
                pd.concat(out, ignore_index=True)
                if out
                else pd.DataFrame({"a": [], "b": [], "sim": []})
            )

    cands = embeddings.map_batches(Scan, batch_format="pandas", concurrency=(1, 8), max_restarts=0)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "b"], ascending=[False, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["sim"] = df["sim"].round(6)
        return df

    return cands.groupby("a").map_groups(topk, batch_format="pandas")


def grouped_mean_embedding(
    ds: "rd.Dataset",
    key_col: str,
    vec_col: str = "embedding",
    *,
    round_to: int = 6,
) -> "rd.Dataset":
    """Per-key mean embedding (centroid): Dataset (key, dim, centroid) in
    long form — the embedding-aggregation primitive behind class
    centroids, IVF seeding and mean-pooled group representations.

    Scale shape: each block reduces to (key, dim, s, n) partial rows —
    present-key count × dim per block, never the vectors — then one
    partial-agg exchange at key × dim cardinality and a vectorized divide.
    Sums run in float64 regardless of the stored float32 (both for
    accuracy and to match the SQL twin's DOUBLE accumulation).
    """
    import pyarrow as pa

    from ccl_ray.stages.aggregates import partial_sum_agg

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        X = _arrow_list_matrix(t.column(vec_col))
        d = X.shape[1]
        order = np.argsort(keys, kind="stable")
        keys, X = keys[order], X[order]
        uniq, starts = np.unique(keys, return_index=True)
        sums = np.add.reduceat(X, starts, axis=0)
        counts = np.diff(np.concatenate([starts, [len(keys)]]))
        return pa.table(
            {
                key_col: pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, d).astype(np.int64)),
            }
        )

    agg = partial_sum_agg(
        ds.select_columns([key_col, vec_col]).map_batches(partials, batch_format="pyarrow"),
        [key_col, "dim"],
        {"s": "s", "n": "n"},
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: t.column(key_col),
                "dim": t.column("dim"),
                "centroid": pa.array(np.round(s / n, round_to), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _semdedup_kernel(
    ids: np.ndarray, X: np.ndarray, cent: np.ndarray, tau: float,
    block: int = 1024,
) -> np.ndarray:
    """Per-cluster SemDeDup flags, aligned to the input order.

    A vector v is removed iff some cluster-mate u with cosine(u, v) >= tau
    ranks strictly better, where rank = (squared distance to the cluster
    centroid, vec_id) lexicographic — the centroid-closest representative
    of every near-dup set survives, deterministically. Both the engine's
    per-cluster groups and the driver twin call THIS kernel on identical
    float64 inputs, so the comparison is exact. Pair scan is blocked
    ([block x n_seen] matmuls against earlier-ranked rows only), bounded by
    the per-cluster population — SemDeDup's k grows with corpus size
    (Abbas et al. 2023 run 50k clusters for LAION) precisely so n_c stays
    task-sized.
    """
    X = X.astype(np.float64, copy=False)
    d2 = ((X - cent.astype(np.float64)) ** 2).sum(axis=1)
    order = np.lexsort((ids, d2))
    Xo = X[order]
    n = len(ids)
    Xn = Xo / np.maximum(np.linalg.norm(Xo, axis=1, keepdims=True), 1e-12)
    removed_o = np.zeros(n, bool)
    for s in range(0, n, block):
        e = min(s + block, n)
        S = Xn[s:e] @ Xn[:e].T  # sims of block rows vs all rank-<e rows
        W = S[:, s:e]
        W[np.triu_indices_from(W, 0)] = -2.0  # within-block: only col<row
        hit = (W >= tau).any(axis=1)
        if s:
            hit |= (S[:, :s] >= tau).any(axis=1)
        removed_o[s:e] = hit
    removed = np.zeros(n, bool)
    removed[order] = removed_o
    return removed


def semdedup_flags(
    embeddings: "rd.Dataset",
    centroids: np.ndarray,
    *,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "rd.Dataset":
    """SemDeDup (Abbas et al. 2023): semantic dedup inside k-means cells.
    Returns (vec_id, cluster, removed) — removed=True marks vectors with a
    better-ranked cosine->=tau neighbour in the same cell (_semdedup_kernel
    rule; keep-one-per-near-dup-set, centroid-closest survives).

    Scale shape: the [k x d] quantizer broadcasts once (ray.put); ONE
    routed exchange of (cluster, id, vec) by Euclidean-nearest cell (the
    same tie rule as cluster._assign: lowest index wins); each cell runs
    the blocked kernel locally. Cell population is the partitioning
    assumption — k must scale with the corpus (paper: 50k cells).
    """
    import pyarrow as pa

    cents = np.asarray(centroids, np.float64)
    ref = ray.put(cents)

    class Route:
        def __init__(self):
            self.cents = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {
                        "cluster": pd.Series([], dtype=np.int64),
                        id_col: pd.Series([], dtype=np.int64),
                        vec_col: pd.Series([], dtype=object),
                    }
                )
            from ccl_ray.stages.cluster import _assign

            x = _to_matrix(df[vec_col]).astype(np.float64)
            a, _ = _assign(x, self.cents)
            return pd.DataFrame(
                {
                    "cluster": a.astype(np.int64),
                    id_col: df[id_col].values.astype(np.int64),
                    vec_col: df[vec_col].values,
                }
            )

    routed = embeddings.map_batches(
        Route, batch_format="pandas", concurrency=(1, 8), max_restarts=0
    )

    def cell(df: pd.DataFrame) -> pa.Table:
        ids = df[id_col].values.astype(np.int64)
        c = int(df["cluster"].values[0]) if len(df) else 0
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "removed": pa.array([], pa.bool_()),
                }
            )
        X = _to_matrix(df[vec_col])
        removed = _semdedup_kernel(ids, X, cents[c], tau)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(np.full(len(ids), c, np.int64)),
                "removed": pa.array(removed),
            }
        )

    return routed.groupby("cluster").map_groups(cell, batch_format="pandas")
