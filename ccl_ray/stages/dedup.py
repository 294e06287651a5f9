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


def ngram_jaccard_pairs(
    docs: "rd.Dataset",
    pairs: "rd.Dataset",
    *,
    shingle_k: int = 8,
    threshold: float = 0.5,
) -> "rd.Dataset":
    """Exact Jaccard verification of candidate pairs.

    The candidate id set is broadcast (ray.put once); shingle sets are
    recomputed only for candidate docs, then pairs are scored in one task.
    Scalable variant for huge candidate sets: hash-join pairs against a
    (doc_id, shingles) table instead — same semantics.
    """
    ids_needed = set()
    pair_rows = pairs.select_columns(["a", "b"]).to_pandas()
    ids_needed.update(pair_rows["a"].tolist())
    ids_needed.update(pair_rows["b"].tolist())
    ref = ray.put(ids_needed)

    class Shingles:
        def __init__(self):
            self.need = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["doc_id"].isin(self.need)]
            return pd.DataFrame(
                {
                    "doc_id": sub["doc_id"].values,
                    "sh": [rolling_hash_shingles(t, shingle_k).astype(np.int64) for t in sub["text"]],
                }
            )

    sh = docs.map_batches(Shingles, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    shing = dict(zip(sh["doc_id"], sh["sh"]))
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pair_rows["a"], pair_rows["b"]):
        sa, sb = shing.get(a), shing.get(b)
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(round(j, 6))
    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )


def minhash_dedup_pairs(docs: "rd.Dataset", *, threshold: float = 0.5) -> "rd.Dataset":
    """MinHash-LSH candidates → exact-Jaccard verified near-dup pairs."""
    cand = minhash_candidates(docs)
    return ngram_jaccard_pairs(docs, cand, threshold=threshold)


class SimHashSig:
    """64-bit SimHash over token hashes (sign-sum of bit vectors)."""

    def __init__(self):
        import re

        self.tok = re.compile(r"[A-Za-z0-9]+")
        self.bits = np.arange(64, dtype=np.uint64)

    def _sig(self, text: str) -> np.int64:
        toks = self.tok.findall(text.lower())
        if not toks:
            return np.int64(0)
        h = hash_strings_np(toks)
        bitmat = ((h[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
        sums = bitmat.sum(axis=0) * 2 - len(toks)  # +1/-1 sum per bit
        sig = np.uint64(0)
        for i in range(64):
            if sums[i] > 0:
                sig |= np.uint64(1) << np.uint64(i)
        return sig.astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].values, "simhash": [self._sig(t) for t in df["text"]]}
        )


def simhash_signatures(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(SimHashSig, batch_format="pandas", concurrency=(1, 8))


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
