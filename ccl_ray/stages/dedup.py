"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Patterns (scale notes per 100 TB design):
- exact: 64-bit content hash per batch (vectorized) → partial (hash -> min
  id, count) per batch → one small groupby. Full text never shuffles.
- MinHash+LSH: shingle → signature per batch (rolling-hash, no Python
  per-shingle loops) → explode to (band, band_hash, doc_id) rows →
  groupby(band, band_hash) emits candidate pairs → exact-Jaccard verify by
  re-hashing only the candidate docs (broadcast of the candidate id set).
- SimHash: 64-bit sign-sum signature per batch; near-dup = equal signature
  (or banded buckets for hamming<=k).
- embedding cosine: see similarity.py (same kernels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ccl_ray.functions.hashing import (
    hash_strings_np,
    minhash_signature,
    rolling_hash_shingles,
    stable_hash64_np,
)


def exact_dedup(docs: "rd.Dataset", text_col: str = "text", id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, n_copies): doc_id = min id per distinct text.

    Assumes no 64-bit hash collisions among distinct texts (p ~ n^2/2^64);
    exact-by-construction on the test corpora, verified against the SQL
    GROUP BY text oracle.
    """

    def partial(df: pd.DataFrame) -> pa.Table:
        h = hash_strings_np(df[text_col].tolist()).astype(np.int64)
        g = pd.DataFrame({"h": h, "id": df[id_col].values}).groupby("h", sort=False)
        out = g["id"].min().rename("doc_id").reset_index()
        out["n_copies"] = g.size().values
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pandas")
    return (
        partials.groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Sum("n_copies", alias_name="n_copies"))
        .select_columns(["doc_id", "n_copies"])
    )


class MinHashSig:
    """Per-batch MinHash signatures (compiled once per actor)."""

    def __init__(self, num_perms: int = 64, shingle_k: int = 8):
        self.num_perms = num_perms
        self.k = shingle_k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(rolling_hash_shingles(t, self.k), self.num_perms)
            for t in df["text"]
        ]
        return pd.DataFrame({"doc_id": df["doc_id"].values, "sig": [s.astype(np.int64) for s in sigs]})


# buckets up to this size emit their complete pair set; larger buckets are
# star-expanded (transitively complete for clustering, capped for listing)
_ALLPAIR_CAP = 64


def minhash_candidates(
    docs: "rd.Dataset",
    *,
    num_perms: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
) -> "rd.Dataset":
    """LSH candidate pairs (a < b) from banded MinHash signatures."""
    rows = bands
    r = num_perms // bands

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_id = [], [], []
        for did, sig in zip(df["doc_id"].values, df["sig"].values):
            sig = np.asarray(sig, dtype=np.uint64)
            bh = stable_hash64_np(
                np.bitwise_xor.reduceat(sig, np.arange(0, len(sig), r))
                + np.arange(rows).astype(np.uint64)
            ).astype(np.int64)
            out_band.append(np.arange(rows, dtype=np.int64))
            out_hash.append(bh)
            out_id.append(np.full(rows, did, dtype=np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band) if out_band else np.empty(0, np.int64)),
                "bh": pa.array(np.concatenate(out_hash) if out_hash else np.empty(0, np.int64)),
                "doc_id": pa.array(np.concatenate(out_id) if out_id else np.empty(0, np.int64)),
            }
        )

    def pairs(df: pd.DataFrame) -> pa.Table:
        ids = np.unique(df["doc_id"].values.astype(np.int64))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if len(ids) <= _ALLPAIR_CAP:
            # complete pair set (the pairs contract) for normal buckets
            ii, jj = np.triu_indices(len(ids), 1)
            return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})
        # hot-bucket defense: star to the bucket min keeps O(k) edges; the
        # missing within-bucket pairs are still connected transitively, so
        # duplicate_clusters stays exact while the pairs listing is capped
        return pa.table({"a": pa.array(np.full(len(ids) - 1, ids[0])), "b": pa.array(ids[1:])})

    sigs = docs.map_batches(
        MinHashSig, batch_format="pandas", concurrency=(1, 8),
        fn_constructor_kwargs={"num_perms": num_perms, "shingle_k": shingle_k},
    )
    buckets = sigs.map_batches(explode, batch_format="pandas")
    cand = buckets.groupby(["band", "bh"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs
    from ray.data.aggregate import Count

    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).select_columns(["a", "b"])


def _list_col_to_np(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, values) of an Arrow list<int64> column, no per-row copies."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.offsets.to_numpy(), (
        arr.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    )


def ngram_jaccard_pairs(
    docs: "rd.Dataset",
    pairs: "rd.Dataset",
    *,
    shingle_k: int = 8,
    threshold: float = 0.5,
    num_partitions: int = 8,
) -> "rd.Dataset":
    """Exact Jaccard verification of candidate pairs — fully distributed.

    No driver-side data path: the candidate id set, the shingle table and
    the pair scoring all stay in Ray Data. Shape:
    (1) distinct candidate ids = pairs exploded + groupby;
    (2) shingle table = docs ⋈ ids (semi-join; only candidate docs are
        shingled, full text never reaches the driver);
    (3) pairs ⋈ shingles(a) ⋈ shingles(b) via hash_join;
    (4) per-batch vectorized Jaccard over the two ragged list columns
        (sorted-unique shingles → intersection = duplicate count after a
        per-row lexsort merge; no per-pair Python loop).
    """
    from ray.data.aggregate import Count

    from ccl_ray.stages.exchange import hash_join

    from ccl_ray.stages.aggregates import to_arrow_blocks

    # Arrow-normalize first: candidate pairs arrive as pandas blocks from
    # groupby.aggregate, and rename_columns/union on pandas blocks crashes
    # in Ray 2.49. Materialize: consumed 3× (ids ×2, join) — avoids diamond
    # stalls in the streaming executor.
    pairs = to_arrow_blocks(pairs).materialize()
    ids = (
        pairs.select_columns(["a"]).rename_columns({"a": "need_id"})
        .union(pairs.select_columns(["b"]).rename_columns({"b": "need_id"}))
        .groupby("need_id")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["need_id"])
    )

    cand_docs = hash_join(
        docs.select_columns(["doc_id", "text"]),
        ids,
        left_on="doc_id",
        right_on="need_id",
        num_partitions=num_partitions,
    )

    sh_type = pa.list_(pa.int64())

    def shingle(df: pd.DataFrame) -> pa.Table:
        sh = [rolling_hash_shingles(t, shingle_k).astype(np.int64) for t in df["text"]]
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].values, pa.int64()),
                "sh": pa.array(sh, sh_type),
            }
        )

    sh = cand_docs.map_batches(shingle, batch_format="pandas").materialize()  # reused for a and b

    j1 = hash_join(
        pairs,
        sh.rename_columns({"doc_id": "aid", "sh": "sh_a"}),
        left_on="a",
        right_on="aid",
        num_partitions=num_partitions,
    )
    j2 = hash_join(
        j1,
        sh.rename_columns({"doc_id": "bid", "sh": "sh_b"}),
        left_on="b",
        right_on="bid",
        num_partitions=num_partitions,
    )

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if n == 0:
            return empty
        offs_a, vals_a = _list_col_to_np(batch.column("sh_a"))
        offs_b, vals_b = _list_col_to_np(batch.column("sh_b"))
        len_a, len_b = np.diff(offs_a), np.diff(offs_b)
        rows = np.concatenate(
            [np.repeat(np.arange(n), len_a), np.repeat(np.arange(n), len_b)]
        )
        vals = np.concatenate([vals_a, vals_b])
        order = np.lexsort((vals, rows))
        rv, vv = rows[order], vals[order]
        dup = (rv[1:] == rv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.bincount(rv[1:][dup], minlength=n)
        union = len_a + len_b - inter
        jac = np.round(np.divide(inter, union, out=np.zeros(n), where=union > 0), 6)
        keep = (union > 0) & (jac >= threshold)
        return pa.table(
            {
                "a": pa.array(batch.column("a").to_numpy(zero_copy_only=False)[keep]),
                "b": pa.array(batch.column("b").to_numpy(zero_copy_only=False)[keep]),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def minhash_dedup_pairs(docs: "rd.Dataset", *, threshold: float = 0.5) -> "rd.Dataset":
    """MinHash-LSH candidates → exact-Jaccard verified near-dup pairs."""
    cand = minhash_candidates(docs)
    return ngram_jaccard_pairs(docs, cand, threshold=threshold)


class SimHashSig:
    """64-bit SimHash (sign-sum of token-hash bit vectors), vectorized per batch.

    Token hash = low 64 bits (first 16 hex chars) of md5(token) — chosen so
    the signature is bit-for-bit reproducible in ANSI SQL (md5 + bit
    arithmetic), giving the driver a value-hash oracle. md5 runs once per
    UNIQUE token in the batch (the vocabulary is much smaller than the token
    stream); the bit accumulation is one cumsum over the whole batch — no
    per-document or per-bit Python loop.
    """

    def __init__(self):
        import re

        self.tok = re.compile(r"[A-Za-z0-9]+")
        self.bits = np.arange(64, dtype=np.uint64)
        self.pow2 = np.uint64(1) << self.bits

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        toks_per_doc = [self.tok.findall(t.lower()) for t in df["text"]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        n = len(df)
        sig = np.zeros(n, dtype=np.uint64)
        total = int(lens.sum())
        if total:
            all_toks = np.empty(total, dtype=object)
            pos = 0
            for ts in toks_per_doc:
                all_toks[pos : pos + len(ts)] = ts
                pos += len(ts)
            uniq, inv = np.unique(all_toks, return_inverse=True)
            uh = np.fromiter(
                (int(hashlib.md5(u.encode("utf-8")).hexdigest()[:16], 16) for u in uniq),
                dtype=np.uint64,
                count=len(uniq),
            )
            h = uh[inv]
            pm = (((h[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64) * 2) - 1
            c = np.cumsum(pm, axis=0)
            ends = np.cumsum(lens)
            sums = np.zeros((n, 64), dtype=np.int64)
            nz = lens > 0
            e = ends[nz] - 1
            s = e - lens[nz]  # index before each doc's first token
            sums[nz] = c[e] - np.where((s >= 0)[:, None], c[np.maximum(s, 0)], 0)
            sig = ((sums > 0).astype(np.uint64) * self.pow2[None, :]).sum(axis=1)
        return pd.DataFrame({"doc_id": df["doc_id"].values, "simhash": sig.view(np.int64)})


def simhash_signatures(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(SimHashSig, batch_format="pandas", concurrency=(1, 8))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1).astype(np.int64)


def simhash_pairs(docs: "rd.Dataset", *, k: int = 3) -> "rd.Dataset":
    """Near-dup pairs (a < b, hamming ≤ k) via banded SimHash LSH.

    Pigeonhole: split the 64-bit signature into k+1 disjoint bands — any
    pair within hamming distance k agrees exactly on at least one band, so
    bucketing by (band, band_value) has total recall. Buckets verify true
    hamming via popcount(xor); hot buckets (> _ALLPAIR_CAP ids) emit the
    star to the min id only (same capped-listing contract as MinHash LSH).
    """
    nb = k + 1
    # band i covers bits [lo[i], lo[i+1]); last band absorbs the remainder
    lo = [round(i * 64 / nb) for i in range(nb + 1)]

    def explode(df: pd.DataFrame) -> pa.Table:
        sig = df["simhash"].values.astype(np.int64).view(np.uint64)
        n = len(sig)
        bands, bvals, ids, sigs = [], [], [], []
        for i in range(nb):
            w = lo[i + 1] - lo[i]
            mask = np.uint64((1 << w) - 1)
            bv = ((sig >> np.uint64(lo[i])) & mask).view(np.int64)
            bands.append(np.full(n, i, dtype=np.int64))
            bvals.append(bv)
            ids.append(df["doc_id"].values.astype(np.int64))
            sigs.append(sig.view(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands) if n else np.empty(0, np.int64)),
                "bv": pa.array(np.concatenate(bvals) if n else np.empty(0, np.int64)),
                "doc_id": pa.array(np.concatenate(ids) if n else np.empty(0, np.int64)),
                "sig": pa.array(np.concatenate(sigs) if n else np.empty(0, np.int64)),
            }
        )

    def pairs(df: pd.DataFrame) -> pa.Table:
        sub = df.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].values.astype(np.int64)
        sigs = sub["sig"].values.astype(np.int64).view(np.uint64)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if len(ids) < 2:
            return empty
        if len(ids) <= _ALLPAIR_CAP:
            ii, jj = np.triu_indices(len(ids), 1)
        else:  # hot-bucket star cap (see docstring)
            ii = np.zeros(len(ids) - 1, dtype=np.int64)
            jj = np.arange(1, len(ids), dtype=np.int64)
        ham = _popcount64(sigs[ii] ^ sigs[jj])
        keep = ham <= k
        return pa.table(
            {
                "a": pa.array(ids[ii][keep]),
                "b": pa.array(ids[jj][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    sigs = simhash_signatures(docs)
    buckets = sigs.map_batches(explode, batch_format="pandas")
    cand = buckets.groupby(["band", "bv"]).map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    out = cand.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))
    from ccl_ray.stages.aggregates import to_arrow_blocks

    return to_arrow_blocks(out)


def duplicate_clusters(docs: "rd.Dataset", *, threshold: float = 0.5, cfg=None) -> "rd.Dataset":
    """Near-duplicate CLUSTERS: MinHash-LSH pairs -> the engine's own
    connected components over the pair graph (the scalable alternative to
    driver-side union-find when the candidate set is large).

    Returns (doc_id, cluster) where cluster = min doc_id of the near-dup
    group; singleton documents are their own cluster.
    """
    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.cc_bsp import connected_components_bsp

    cfg = cfg or EngineConfig(num_partitions=4)
    pairs = minhash_dedup_pairs(docs, threshold=threshold)

    def to_edges(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(df["a"].values.astype(np.int64)),
                "dst": pa.array(df["b"].values.astype(np.int64)),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pandas")
    verts = docs.select_columns(["doc_id"]).rename_columns({"doc_id": "vid"})
    res = connected_components_bsp(edges, vertices=verts, cfg=cfg)
    return res.labels.rename_columns({"vid": "doc_id", "label": "cluster"})
