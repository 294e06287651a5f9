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

    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    partials = docs.map_batches(partial, batch_format="pandas")
    return partitioned_groupby_agg(
        partials, ["h"], {"doc_id": ("doc_id", "min"), "n_copies": ("n_copies", "sum")}
    ).select_columns(["doc_id", "n_copies"])


class MinHashSig:
    """Per-batch MinHash signatures (permutation coefficients built once
    per actor in __init__, not per document)."""

    def __init__(self, num_perms: int = 64, shingle_k: int = 8):
        from ccl_ray.functions.hashing import minhash_coeffs

        self.num_perms = num_perms
        self.k = shingle_k
        self.coeffs = minhash_coeffs(num_perms)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(rolling_hash_shingles(t, self.k), self.num_perms, coeffs=self.coeffs)
            for t in df["text"]
        ]
        return pd.DataFrame({"doc_id": df["doc_id"].values, "sig": [s.astype(np.int64) for s in sigs]})


# Buckets up to this size emit their complete pair set; larger buckets are
# star-expanded to the bucket min: O(k) edges, transitively complete for
# clustering, but a CAPPED LISTING — the full-pair SQL oracles only hold on
# corpora whose buckets stay under the cap (true for the gate corpora:
# duplicate groups are ~10^1 docs). 256 bounds a hot bucket at ~32k pairs.
_ALLPAIR_CAP = 256

# SimHash bit accumulation processes at most this many tokens at once
# (the expanded ±1 matrix is 512 B/token → ≤ 32 MB peak per actor).
_SIMHASH_CHUNK = 1 << 16


def _emit_bucket_pairs(ids: np.ndarray, bucket_key_cols: list[np.ndarray], cap: int,
                       *, drop_over_cap: bool = False):
    """Vectorized pair emission for pre-lexsorted bucket rows.

    ``ids`` and the bucket key columns must already be sorted by
    (*bucket_key_cols, ids). Duplicate ids within a bucket are dropped
    first (a doc appears once per band by construction, but an upstream
    union/double-read must not produce a==b self-pairs). Returns (ai, bi)
    INDEX arrays into the deduplicated arrays plus the dedup mask — callers
    gather their own payload columns with them.

    Buckets larger than ``cap``: star-capped by default (the LSH recall
    contract); ``drop_over_cap=True`` drops them entirely instead — the
    stop-shingle semantics of the exact n-gram path, where the bucket key
    is a shingle and a hot shingle carries no similarity signal.
    """
    n = len(ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.ones(n, bool)
    new = np.empty(n, bool)
    new[0] = True
    same_bucket = np.ones(n - 1, bool)
    for col in bucket_key_cols:
        same_bucket &= col[1:] == col[:-1]
    new[1:] = ~same_bucket
    # drop duplicate ids within a bucket (ids sorted within bucket)
    keep = np.empty(n, bool)
    keep[0] = True
    keep[1:] = ~same_bucket | (ids[1:] != ids[:-1])
    ids = ids[keep]
    new = new[keep]
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.concatenate([starts, [len(ids)]]))
    out_a, out_b = [], []
    for s in np.unique(sizes):
        if s < 2:
            continue
        sel = starts[sizes == s]
        if s <= cap:
            # complete pair set; ids sorted within bucket → a < b
            ii, jj = np.triu_indices(int(s), 1)
            out_a.append((sel[:, None] + ii[None, :]).ravel())
            out_b.append((sel[:, None] + jj[None, :]).ravel())
        elif not drop_over_cap:
            # hot-bucket star cap (see _ALLPAIR_CAP note)
            out_a.append(np.repeat(sel, int(s) - 1))
            off = np.arange(1, int(s))
            out_b.append((sel[:, None] + off[None, :]).ravel())
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64), keep
    return np.concatenate(out_a), np.concatenate(out_b), keep


def minhash_candidates(
    docs: "rd.Dataset",
    *,
    num_perms: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
    num_partitions: int | None = None,
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

    # Pair emission is PARTITION-grouped, not bucket-grouped: most LSH
    # buckets are singletons, and Ray's map_groups pays a Python round-trip
    # per group (~1.6M groups at 100k docs ≈ minutes). Instead route bucket
    # rows by hash(band, bh) into P partitions and process each partition's
    # buckets with ONE vectorized pass (lexsort + per-size-class batch
    # emission) — identical output, O(P) groups.
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def route(batch: pa.Table) -> pa.Table:
        bh = batch.column("bh").to_numpy(zero_copy_only=False)
        band = batch.column("band").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            key = bh.view(np.uint64) * np.uint64(31) + band.view(np.uint64)
        part = (stable_hash64_np(key) % np.uint64(P)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def pairs_part(df: pd.DataFrame) -> pa.Table:
        band = df["band"].values.astype(np.int64)
        bh = df["bh"].values.astype(np.int64)
        ids = df["doc_id"].values.astype(np.int64)
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if len(ids) < 2:
            return empty
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        ai, bi, keep = _emit_bucket_pairs(ids, [band, bh], _ALLPAIR_CAP)
        if not len(ai):
            return empty
        ids = ids[keep]
        return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})

    from ccl_ray.functions.bind import bound_class

    # ctor kwargs baked into the class by value (not via fn_constructor_kwargs
    # through the object store) so actor restarts never fail on lost args.
    # max_restarts=0 because Ray Data still ships ITS OWN ctor args (the map
    # transformer) via the object store and warns that a restart after their
    # loss would fail (ray#53727) — such a restart could never succeed, so
    # disable core-level restart and let the pool's task retry replace dead
    # actors instead.
    sigs = docs.map_batches(
        bound_class(MinHashSig, num_perms=num_perms, shingle_k=shingle_k),
        batch_format="pandas", concurrency=(1, 8), max_restarts=0,
    )
    buckets = sigs.map_batches(explode, batch_format="pandas").map_batches(
        route, batch_format="pyarrow"
    )
    cand = buckets.groupby("part").map_groups(pairs_part, batch_format="pandas")
    # distinct pairs
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    return partitioned_groupby_agg(cand, ["a", "b"], {"_n": ("a", "count")}).select_columns(
        ["a", "b"]
    )


def _list_col_to_np(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, values) of an Arrow list<int64> column, no per-row copies."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.offsets.to_numpy(), (
        arr.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    )


def _jaccard_from_lists(offs_a, vals_a, offs_b, vals_b, n, threshold):
    """Vectorized exact Jaccard of n ragged sorted-unique shingle-list pairs.
    Returns (jaccard[n] rounded to 6, keep mask) — no per-pair Python loop:
    intersection size = duplicate count after a per-row lexsort merge.
    The threshold compares the UNROUNDED ratio (matching the SQL oracle's
    WHERE clause); rounding applies only to the reported value."""
    len_a, len_b = np.diff(offs_a), np.diff(offs_b)
    rows = np.concatenate([np.repeat(np.arange(n), len_a), np.repeat(np.arange(n), len_b)])
    vals = np.concatenate([vals_a, vals_b])
    order = np.lexsort((vals, rows))
    rv, vv = rows[order], vals[order]
    dup = (rv[1:] == rv[:-1]) & (vv[1:] == vv[:-1])
    inter = np.bincount(rv[1:][dup], minlength=n)
    union = len_a + len_b - inter
    raw = np.divide(inter, union, out=np.zeros(n), where=union > 0)
    return np.round(raw, 6), (union > 0) & (raw >= threshold)


def ngram_jaccard_pairs(
    docs: "rd.Dataset",
    pairs: "rd.Dataset",
    *,
    shingle_k: int = 8,
    threshold: float = 0.5,
    num_partitions: int | None = None,
    broadcast_ids_limit: int = 65536,
) -> "rd.Dataset":
    """Exact Jaccard verification of candidate pairs.

    Two paths, chosen by candidate-set size (bounded, never a driver loop):

    - SMALL (≤ broadcast_ids_limit candidate ids): broadcast the id array
      (ray.put, ≤ 512 KB at the default limit), shingle only candidate docs
      in map_batches, then score ALL pairs in one vectorized remote task
      (shingle payload bounded by limit × ~KB). Skips three shuffle ops —
      the right shape when LSH found few candidates.
    - LARGE: fully distributed — (1) distinct ids via groupby; (2) shingle
      table = docs ⋈ ids semi-join; (3) pairs ⋈ shingles(a) ⋈ shingles(b)
      via hash_join; (4) per-batch vectorized Jaccard. Nothing bounded by
      driver or single-task memory.
    """
    from ccl_ray.stages.aggregates import to_arrow_blocks
    from ccl_ray.stages.exchange import hash_join

    # Arrow-normalize first: candidate pairs arrive as pandas blocks from
    # groupby.aggregate, and rename_columns/union on pandas blocks crashes
    # in Ray 2.49. Materialize: consumed 3× (ids ×2, join) — avoids diamond
    # stalls in the streaming executor.
    pairs = to_arrow_blocks(pairs).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        # explicit-schema empty result (an all-empty Dataset loses columns)
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    if n_pairs * 2 <= broadcast_ids_limit:
        return _jaccard_broadcast(docs, pairs, shingle_k, threshold)
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    ids = partitioned_groupby_agg(
        pairs.select_columns(["a"]).rename_columns({"a": "need_id"}).union(
            pairs.select_columns(["b"]).rename_columns({"b": "need_id"})
        ),
        ["need_id"],
        {"_n": ("need_id", "count")},
    ).select_columns(["need_id"])

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
        if n == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        offs_a, vals_a = _list_col_to_np(batch.column("sh_a"))
        offs_b, vals_b = _list_col_to_np(batch.column("sh_b"))
        jac, keep = _jaccard_from_lists(offs_a, vals_a, offs_b, vals_b, n, threshold)
        return pa.table(
            {
                "a": pa.array(batch.column("a").to_numpy(zero_copy_only=False)[keep]),
                "b": pa.array(batch.column("b").to_numpy(zero_copy_only=False)[keep]),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def _jaccard_broadcast(docs: "rd.Dataset", pairs: "rd.Dataset", shingle_k: int,
                       threshold: float) -> "rd.Dataset":
    """Small-candidate-set verify: broadcast id array, one scoring task.

    Bounded by broadcast_ids_limit (caller-checked): the id broadcast is
    ≤ 512 KB and the single scoring task holds only candidate shingles
    (≤ limit × ~KB). The per-pair scoring itself is the same vectorized
    kernel as the distributed path — never a Python loop over pairs.
    """
    pair_df = pairs.select_columns(["a", "b"]).to_pandas()
    ids_arr = np.unique(np.concatenate([pair_df["a"].values, pair_df["b"].values])).astype(
        np.int64
    )
    ids_ref = ray.put(ids_arr)

    sh_type = pa.list_(pa.int64())

    class Shingles:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            sub = df[np.isin(df["doc_id"].values, self.ids)]
            sh = [rolling_hash_shingles(t, shingle_k).astype(np.int64) for t in sub["text"]]
            return pa.table(
                {
                    "doc_id": pa.array(sub["doc_id"].values, pa.int64()),
                    "sh": pa.array(sh, sh_type),
                }
            )

    sh = docs.map_batches(Shingles, batch_format="pandas", concurrency=(1, 8), max_restarts=0)

    def _run_gather(starts_sel, lens_sel):
        """Vectorized gather index for ragged runs: position k of run i maps
        to starts_sel[i] + (k - offs[i]). No per-run Python loop."""
        offs = np.concatenate([[0], np.cumsum(lens_sel)]).astype(np.int64)
        total = int(offs[-1])
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs[:-1], lens_sel)
            + np.repeat(starts_sel, lens_sel)
        )
        return idx, offs

    @ray.remote
    def score_all(pair_a, pair_b, *sh_tbls):
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        from ccl_ray.state.shards import as_arrow_block

        nonempty = [t for t in (as_arrow_block(t) for t in sh_tbls) if t.num_rows]
        if not nonempty or not len(pair_a):
            return empty
        tbl = pa.concat_tables(nonempty)
        doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        offs, vals = _list_col_to_np(tbl.column("sh"))
        lens = np.diff(offs)[order]
        starts = offs[:-1][order]
        # membership-checked lookup: a pair referencing a doc_id absent from
        # docs is DROPPED (the distributed path drops it via inner join;
        # an unchecked searchsorted would gather a neighbor's shingles)
        ia = np.searchsorted(doc_ids, pair_a)
        ib = np.searchsorted(doc_ids, pair_b)
        ok = (
            (ia < len(doc_ids))
            & (ib < len(doc_ids))
            & (doc_ids[np.minimum(ia, len(doc_ids) - 1)] == pair_a)
            & (doc_ids[np.minimum(ib, len(doc_ids) - 1)] == pair_b)
        )
        pair_a, pair_b, ia, ib = pair_a[ok], pair_b[ok], ia[ok], ib[ok]
        n = len(pair_a)
        if n == 0:
            return empty
        idx_a, offs_a = _run_gather(starts[ia], lens[ia])
        idx_b, offs_b = _run_gather(starts[ib], lens[ib])
        jac, keep = _jaccard_from_lists(
            offs_a, vals[idx_a], offs_b, vals[idx_b], n, threshold
        )
        return pa.table(
            {
                "a": pa.array(pair_a[keep], pa.int64()),
                "b": pa.array(pair_b[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    out_ref = score_all.remote(
        pair_df["a"].values.astype(np.int64),
        pair_df["b"].values.astype(np.int64),
        *sh.to_arrow_refs(),
    )
    return rd.from_arrow_refs([out_ref])


def minhash_dedup_pairs(
    docs: "rd.Dataset", *, threshold: float = 0.5, num_partitions: int | None = None
) -> "rd.Dataset":
    """MinHash-LSH candidates → exact-Jaccard verified near-dup pairs."""
    cand = minhash_candidates(docs, num_partitions=num_partitions)
    return ngram_jaccard_pairs(docs, cand, threshold=threshold, num_partitions=num_partitions)


def ngram_exact_candidates(
    docs: "rd.Dataset",
    *,
    shingle_k: int = 8,
    df_cap: int = 64,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """EXACT inverted-index candidate pairs: (a < b) doc pairs sharing at
    least one shingle with document frequency 2..``df_cap``.

    The deterministic counterpart of MinHash-LSH candidates: no
    probabilistic recall — every qualifying pair is emitted. Shingles with
    df > df_cap are DROPPED (stop-shingle pruning, the AllPairs/PPJoin
    prefix-filter family): a shingle shared by hundreds of documents
    carries no similarity signal but would emit O(df²) pairs. The pruning
    is part of the operator's documented semantics (the SQL twin applies
    the identical df window), so results are exact by definition, and a
    pair of genuinely similar docs shares many shingles — losing the hot
    ones does not lose the pair unless ALL its shared shingles are hot.

    Scale shape: one routed exchange of (gh, doc_id) shingle rows by
    hash(gh) — all rows of a shingle land in one partition, so df and the
    complete per-shingle pair set are computed partition-locally in one
    vectorized pass (the minhash_candidates partition-grouped emission);
    pair dedupe via the partial-agg combiner. No driver path, no
    broadcast.
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    P = resolve_partitions(num_partitions)

    def shingle(df: pd.DataFrame) -> pa.Table:
        rows, h = _shingle_rows(df, shingle_k)
        ids = df["doc_id"].values.astype(np.int64)[rows]
        part = (stable_hash64_np(h.view(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "gh": pa.array(h),
                "doc_id": pa.array(ids),
                "part": pa.array(part),
            }
        )

    def pairs_part(df: pd.DataFrame) -> pa.Table:
        gh = df["gh"].values.astype(np.int64)
        ids = df["doc_id"].values.astype(np.int64)
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if len(ids) < 2:
            return empty
        order = np.lexsort((ids, gh))
        gh, ids = gh[order], ids[order]
        ai, bi, keep = _emit_bucket_pairs(ids, [gh], df_cap, drop_over_cap=True)
        if not len(ai):
            return empty
        ids = ids[keep]
        return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})

    rows = docs.map_batches(shingle, batch_format="pandas")
    cand = rows.groupby("part").map_groups(pairs_part, batch_format="pandas")
    return partitioned_groupby_agg(cand, ["a", "b"], {"_n": ("a", "count")}).select_columns(
        ["a", "b"]
    )


def ngram_dedup_pairs(
    docs: "rd.Dataset",
    *,
    threshold: float = 0.5,
    df_cap: int = 64,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Exact n-gram-Jaccard near-dup pairs: inverted-index candidates
    (deterministic, df-capped — see ngram_exact_candidates) → exact
    Jaccard verification over the FULL shingle sets (hot shingles count
    toward the score, they are only pruned from candidate generation)."""
    cand = ngram_exact_candidates(docs, df_cap=df_cap, num_partitions=num_partitions)
    return ngram_jaccard_pairs(docs, cand, threshold=threshold, num_partitions=num_partitions)


class SimHashSig:
    """64-bit SimHash (sign-sum of token-hash bit vectors), vectorized per batch.

    Token hash = low 64 bits (first 16 hex chars) of md5(token) — chosen so
    the signature is bit-for-bit reproducible in ANSI SQL (md5 + bit
    arithmetic), giving the driver a value-hash oracle. md5 runs once per
    UNIQUE token in the batch (the vocabulary is much smaller than the token
    stream); the bit accumulation is one cumsum over the whole batch — no
    per-document or per-bit Python loop.
    """

    def __init__(self, chunk: int = _SIMHASH_CHUNK):
        import re

        self.tok = re.compile(r"[A-Za-z0-9]+")
        self.bits = np.arange(64, dtype=np.uint64)
        self.pow2 = np.uint64(1) << self.bits
        self.chunk = chunk

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
            # Bit accumulation in fixed-size token chunks: the ±1 matrix is
            # 512 B/token, so materializing it for a whole batch of long
            # documents would peak at hundreds of MB per actor. Each chunk
            # expands ≤ _SIMHASH_CHUNK tokens (≤ 32 MB), reduceat-sums its
            # contiguous per-doc runs, and adds them into the running sums
            # (run doc-ids are unique within a chunk, so += is exact).
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            sums = np.zeros((n, 64), dtype=np.int64)
            for start in range(0, total, self.chunk):
                end = min(start + self.chunk, total)
                pm = (
                    ((h[start:end, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
                    * 2
                ) - 1
                d = doc_idx[start:end]
                run_starts = np.concatenate(
                    [[0], np.nonzero(d[1:] != d[:-1])[0] + 1]
                ).astype(np.int64)
                sums[d[run_starts]] += np.add.reduceat(pm, run_starts, axis=0)
            sig = ((sums > 0).astype(np.uint64) * self.pow2[None, :]).sum(axis=1)
        return pd.DataFrame({"doc_id": df["doc_id"].values, "simhash": sig.view(np.int64)})


def simhash_signatures(docs: "rd.Dataset", *, chunk: int = _SIMHASH_CHUNK) -> "rd.Dataset":
    from ccl_ray.functions.bind import bound_class

    return docs.map_batches(
        bound_class(SimHashSig, chunk=chunk),
        batch_format="pandas",
        concurrency=(1, 8), max_restarts=0,
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1).astype(np.int64)


def simhash_pairs(
    docs: "rd.Dataset", *, k: int = 3, num_partitions: int | None = None
) -> "rd.Dataset":
    """Near-dup pairs (a < b, hamming ≤ k) via banded SimHash LSH.

    Pigeonhole: split the 64-bit signature into k+1 disjoint bands — any
    pair within hamming distance k agrees exactly on at least one band, so
    bucketing by (band, band_value) has total recall FOR BUCKETS UP TO
    _ALLPAIR_CAP ids. Hot buckets (> cap) emit only the hamming-verified
    star to the min id — a capped listing (the full-pair SQL oracle assumes
    no hot buckets, which holds on the gate corpora). Buckets verify true
    hamming via popcount(xor).
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

    # Partition-grouped pair emission (same rationale as minhash_candidates:
    # most buckets are singletons; never pay a Python round-trip per bucket)
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def route(batch: pa.Table) -> pa.Table:
        bv = batch.column("bv").to_numpy(zero_copy_only=False)
        band = batch.column("band").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            key = bv.view(np.uint64) * np.uint64(31) + band.view(np.uint64)
        part = (stable_hash64_np(key) % np.uint64(P)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def pairs_part(df: pd.DataFrame) -> pa.Table:
        band = df["band"].values.astype(np.int64)
        bv = df["bv"].values.astype(np.int64)
        ids = df["doc_id"].values.astype(np.int64)
        sg = df["sig"].values.astype(np.int64)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if len(ids) < 2:
            return empty
        order = np.lexsort((ids, bv, band))
        band, bv, ids, sg = band[order], bv[order], ids[order], sg[order]
        ai, bi, keep_rows = _emit_bucket_pairs(ids, [band, bv], _ALLPAIR_CAP)
        if not len(ai):
            return empty
        ids, sg = ids[keep_rows], sg[keep_rows]
        ham = _popcount64(sg[ai].view(np.uint64) ^ sg[bi].view(np.uint64))
        keep = ham <= k
        return pa.table(
            {
                "a": pa.array(ids[ai][keep]),
                "b": pa.array(ids[bi][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    sigs = simhash_signatures(docs)
    buckets = sigs.map_batches(explode, batch_format="pandas").map_batches(
        route, batch_format="pyarrow"
    )
    cand = buckets.groupby("part").map_groups(pairs_part, batch_format="pandas")
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    return partitioned_groupby_agg(cand, ["a", "b"], {"hamming": ("hamming", "min")})


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


# ------------------------------------------------------------ contamination


def _shingle_rows(df: pd.DataFrame, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(row position repeated per shingle, shingle hashes) — per-doc UNIQUE."""
    sh = [rolling_hash_shingles(t, k) for t in df["text"]]
    lens = np.array([len(s) for s in sh], dtype=np.int64)
    rows = np.repeat(np.arange(len(df), dtype=np.int64), lens)
    h = np.concatenate(sh) if sh else np.empty(0, np.uint64)
    return rows, h.astype(np.int64)


def benchmark_contamination(
    docs: "rd.Dataset",
    *,
    mod: int = 101,
    shingle_k: int = 8,
    broadcast_limit: int = 4_000_000,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Decontamination check: per NON-benchmark document, the number of its
    distinct ``shingle_k``-char shingles that appear in ANY benchmark
    document (benchmark = ``doc_id % mod == 0``). (doc_id, n_shared);
    n_shared > 0 flags the doc as contaminated by the held-out set.

    Scale shape: a benchmark suite is a FIXED-size corpus, so its distinct
    shingle-hash set is the classic broadcast small side (``ray.put`` once,
    ``searchsorted`` membership per batch — no shuffle touches the 100 TB
    doc side). If the set exceeds ``broadcast_limit`` hashes (32 MB at 4M),
    the op switches to the distributed path: explode doc shingles, inner
    hash-join against the distinct benchmark hashes, partition-grouped
    count — the same exchange shape as ngram_jaccard's LARGE mode.

    Shingle identity is the rolling 61-bit hash (functions.hashing): two
    distinct substrings collide with p ~ n^2/2^61 — the same accepted
    assumption as the minhash_pairs oracle (queries.py _JACCARD_CTE).
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def bench_hashes(df: pd.DataFrame) -> pa.Table:
        sub = df[(df["doc_id"] % mod) == 0]
        _, h = _shingle_rows(sub, shingle_k)
        return pa.table({"h": pa.array(np.unique(h), pa.int64())})

    bench_parts = docs.map_batches(bench_hashes, batch_format="pandas")
    from ccl_ray.stages.aggregates import partial_sum_agg

    bench_distinct = (
        partial_sum_agg(bench_parts, ["h"], {}, count_as="_n")
        .select_columns(["h"])
        .materialize()  # consumed twice: size probe + (broadcast | join side)
    )
    n_bench = bench_distinct.count()

    if n_bench <= broadcast_limit:
        from ccl_ray.state.shards import as_arrow_block

        blocks = [as_arrow_block(b) for b in ray.get(bench_distinct.to_arrow_refs())]
        bset = np.sort(
            np.concatenate(
                [
                    b.column("h").to_numpy(zero_copy_only=False)
                    for b in blocks
                    if "h" in b.column_names  # empty blocks carry no schema
                ]
                or [np.empty(0, np.int64)]
            )
        )
        ref = ray.put(bset)

        class Count:
            def __init__(self):
                self.bset = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pa.Table:
                sub = df[(df["doc_id"] % mod) != 0]
                rows, h = _shingle_rows(sub, shingle_k)
                if len(self.bset):
                    idx = np.searchsorted(self.bset, h)
                    idx_c = np.minimum(idx, len(self.bset) - 1)
                    hit = (self.bset[idx_c] == h).astype(np.int64)
                else:
                    hit = np.zeros(len(h), np.int64)
                out_ids = sub["doc_id"].values.astype(np.int64)
                n = np.zeros(len(sub), np.int64)
                if len(rows):
                    np.add.at(n, rows, hit)
                return pa.table({"doc_id": pa.array(out_ids), "n_shared": pa.array(n)})

        return docs.map_batches(Count, batch_format="pandas", concurrency=(1, 8), max_restarts=0)

    # distributed path: explode -> join -> partition-grouped count -> left join
    def doc_shingles(df: pd.DataFrame) -> pa.Table:
        sub = df[(df["doc_id"] % mod) != 0]
        rows, h = _shingle_rows(sub, shingle_k)
        ids = sub["doc_id"].values.astype(np.int64)[rows] if len(rows) else np.empty(0, np.int64)
        return pa.table({"doc_id": pa.array(ids), "dh": pa.array(h)})

    from ccl_ray.stages.exchange import hash_join

    doc_sh = docs.map_batches(doc_shingles, batch_format="pandas")
    hits = hash_join(
        doc_sh, bench_distinct, left_on="dh", right_on="h", how="inner",
        num_partitions=P,
        right_schema=[("h", pa.int64())],
    )
    # count per doc then re-attach zero-hit docs
    per_doc = partial_sum_agg(
        hits.select_columns(["doc_id"]), ["doc_id"], {}, count_as="n_hits"
    ).rename_columns({"doc_id": "hit_doc"})

    def nonbench_ids(df: pd.DataFrame) -> pa.Table:
        sub = df[(df["doc_id"] % mod) != 0]
        return pa.table({"doc_id": pa.array(sub["doc_id"].values.astype(np.int64))})

    base = docs.map_batches(nonbench_ids, batch_format="pandas")
    joined = hash_join(
        base, per_doc, left_on="doc_id", right_on="hit_doc", how="left outer",
        num_partitions=P,
        right_schema=[("hit_doc", pa.int64()), ("n_hits", pa.int64())],
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shared": pc.fill_null(t.column("n_hits"), 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def dup_span_counts(
    docs: "rd.Dataset",
    *,
    k: int = 5,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Per-document count of k-token window POSITIONS whose window text
    occurs in >= 2 DISTINCT documents — the cross-document exact-substring
    duplication signal (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", at fixed window granularity instead of suffix
    arrays). (doc_id, dup_windows); dup_windows == 0 for clean docs.

    Scale shape (100 TB): one tokenize+window pass (polars, all-Rust) emits
    (window_hash, doc_id, multiplicity) — ~one row per corpus token, the
    text itself never shuffles; ONE routed exchange by hash(window_hash)
    colocates each window value so document frequency and the per-doc
    duplicated-position sums are computed partition-locally in a single
    vectorized pass; per-doc partials then reduce in a tiny groupby and
    left-join back onto the doc ids for the zero rows. Window identity is
    the 64-bit SipHash of the space-joined token string
    (functions.hashing.hash_strings_np) — the same documented no-collision
    assumption as minhash_pairs / contamination (p ~ n_windows^2 / 2^64).
    """
    import polars as pl

    from ccl_ray.config import resolve_partitions
    from ccl_ray.stages.aggregates import partitioned_groupby_agg
    from ccl_ray.stages.exchange import hash_join

    P = resolve_partitions(num_partitions)

    def windows(df: pd.DataFrame) -> pa.Table:
        toks = _token_lists_pl_docs(df["text"].values)
        cols = [pl.col("tok")] + [
            pl.col("tok").shift(-j).over("i") for j in range(1, k)
        ]
        agg = (
            toks.lazy()
            .explode("tok", empty_as_null=True)
            .with_columns(g=pl.concat_str(cols, separator=" "))
            .drop_nulls("g")
            .group_by("i", "g")
            .agg(m=pl.len().cast(pl.Int64))
            .collect()
        )
        empty = pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if not len(agg):
            return empty
        gh = hash_strings_np(agg["g"].to_numpy()).astype(np.uint64)
        ids = df["doc_id"].values.astype(np.int64)[agg["i"].to_numpy()]
        part = (stable_hash64_np(gh) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "gh": pa.array(gh.view(np.int64)),
                "doc_id": pa.array(ids),
                "m": pa.array(agg["m"].to_numpy().astype(np.int64)),
                "part": pa.array(part),
            }
        )

    def part_counts(df: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
        if len(df) < 2:
            return empty
        gh = df["gh"].values.astype(np.int64)
        ids = df["doc_id"].values.astype(np.int64)
        m = df["m"].values.astype(np.int64)
        order = np.argsort(gh, kind="stable")
        gh, ids, m = gh[order], ids[order], m[order]
        starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
        cnt = np.diff(np.r_[starts, len(gh)])
        # (doc_id, gh) rows are globally unique (each doc lives in exactly
        # one input batch and windows() pre-groups per doc), so a window's
        # group size here IS its distinct-document frequency
        dup = np.repeat(cnt >= 2, cnt)
        if not dup.any():
            return empty
        ids_d, m_d = ids[dup], m[dup]
        uid, inv = np.unique(ids_d, return_inverse=True)
        s = np.zeros(len(uid), np.int64)
        np.add.at(s, inv, m_d)
        return pa.table({"doc_id": pa.array(uid), "c": pa.array(s)})

    rows = docs.map_batches(windows, batch_format="pandas")
    hits = rows.groupby("part").map_groups(part_counts, batch_format="pandas")
    per_doc = partitioned_groupby_agg(
        hits, ["doc_id"], {"dup_windows": ("c", "sum")}, num_partitions=P
    ).rename_columns({"doc_id": "hit_doc"})

    base = docs.map_batches(
        lambda df: pa.table(
            {"doc_id": pa.array(df["doc_id"].values.astype(np.int64))}
        ),
        batch_format="pandas",
    )
    joined = hash_join(
        base, per_doc, left_on="doc_id", right_on="hit_doc", how="left outer",
        num_partitions=P,
        right_schema=[("hit_doc", pa.int64()), ("dup_windows", pa.int64())],
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "dup_windows": pc.fill_null(t.column("dup_windows"), 0).cast(
                    pa.int64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _token_lists_pl_docs(texts: np.ndarray):
    """text.py's all-Rust lowercase tokenizer (shared import indirection)."""
    from ccl_ray.stages.text import _token_lists_pl

    return _token_lists_pl(texts)
