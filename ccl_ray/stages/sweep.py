"""Sweep-cut local clustering (Andersen-Chung-Lang 2006): given per-vertex
diffusion scores (e.g. personalized PageRank), order vertices by
score/degree and return the prefix with minimum conductance.

Ray-Data-first shape: ONE exact global rank over (score/degree desc, vid)
(stages/rank.py — sorted blocks + P-scalar offsets), TWO hash joins to
stamp endpoint ranks onto the deduped edges (an edge becomes internal to
the prefix at k = max(rank_src, rank_dst) — so the whole conductance curve
falls out of two prefix sums), a rank-ordered block cumsum (per-block sums
to the driver = P scalars, exclusive scan, vectorized local cumsums), and
a per-block top-1 + driver argmin. Nothing quadratic, nothing broadcast
beyond P scalars; cut/vol arithmetic is exact int64.

conductance(S_k) = cut(S_k) / min(vol(S_k), vol(V)-vol(S_k)) over proper
nonempty prefixes (k = 1 .. n-1); ties break toward the smallest k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


@ray.remote
def _blk_sums(b, dcol: str, ccol: str):
    if b.num_rows == 0 or dcol not in b.column_names:  # schema-less empties
        return 0, 0, 0
    d = b.column(dcol).to_numpy(zero_copy_only=False).astype(np.int64)
    c = b.column(ccol).to_numpy(zero_copy_only=False).astype(np.int64)
    return int(d.sum()), int(c.sum()), b.num_rows


@ray.remote
def _blk_phi_top1(b, dcol: str, ccol: str, off_d: int, off_c: int,
                  vol_total: int, n_total: int, off_rows: int):
    """Per-block best (phi, k): local cumsums + global offsets."""
    if b.num_rows == 0 or dcol not in b.column_names:
        return None
    d = b.column(dcol).to_numpy(zero_copy_only=False).astype(np.int64)
    c = b.column(ccol).to_numpy(zero_copy_only=False).astype(np.int64)
    vol = np.cumsum(d) + off_d
    internal = np.cumsum(c) + off_c
    cut = vol - 2 * internal
    k = np.arange(1, len(d) + 1, dtype=np.int64) + off_rows
    denom = np.minimum(vol, vol_total - vol)
    valid = (k < n_total) & (denom > 0)
    if not valid.any():
        return None
    phi = np.full(len(d), np.inf)
    phi[valid] = cut[valid] / denom[valid]
    i = int(np.lexsort((k, phi))[0])
    if not np.isfinite(phi[i]):
        return None
    return float(phi[i]), int(k[i])


def sweep_cut(
    scores: "rd.Dataset",
    degrees: "rd.Dataset",
    edges: "rd.Dataset",
    *,
    id_col: str = "event_id",
    score_col: str = "score",
) -> pa.Table:
    """(best_k, phi) single-row table. ``scores``: (id_col, score_col);
    ``degrees``: (vid, degree) simple degrees >= 1 for every scored vertex;
    ``edges``: DISTINCT undirected (src, dst) simple edges, src != dst."""
    from ccl_ray.stages.exchange import hash_join
    from ccl_ray.stages.aggregates import partial_sum_agg
    from ccl_ray.stages.rank import global_rank

    j = hash_join(
        scores, degrees.rename_columns({"vid": "dv", "degree": "d"}),
        left_on=id_col, right_on="dv", num_partitions=8,
    )

    def mkq(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vid": t.column(id_col),
                "d": pa.array(d),
                "negq": pa.array(-(s / d)),
            }
        )

    ranked = global_rank(
        j.map_batches(mkq, batch_format="pyarrow"), ["negq", "vid"], out="rnk"
    )

    r_small = ranked.select_columns(["vid", "rnk"])
    e1 = hash_join(
        edges.select_columns(["src", "dst"]),
        r_small.rename_columns({"vid": "sv", "rnk": "ra"}),
        left_on="src", right_on="sv", num_partitions=8,
    )
    e2 = hash_join(
        e1, r_small.rename_columns({"vid": "tv", "rnk": "rb"}),
        left_on="dst", right_on="tv", num_partitions=8,
    )

    def closing_rank(t: pa.Table) -> pa.Table:
        ra = t.column("ra").to_numpy(zero_copy_only=False).astype(np.int64)
        rb = t.column("rb").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"rnk": pa.array(np.maximum(ra, rb))})

    hist = partial_sum_agg(
        e2.map_batches(closing_rank, batch_format="pyarrow"),
        ["rnk"], {}, count_as="c",
    ).rename_columns({"rnk": "h_rnk"})

    curve = hash_join(
        ranked.select_columns(["rnk", "d"]), hist,
        left_on="rnk", right_on="h_rnk", how="left outer",
        num_partitions=8,
        right_schema=[("h_rnk", pa.int64()), ("c", pa.int64())],
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "rnk": t.column("rnk"),
                "d": t.column("d"),
                "c": pc.fill_null(t.column("c"), 0).cast(pa.int64()),
            }
        )

    ordered = (
        curve.map_batches(fill, batch_format="pyarrow").sort("rnk").materialize()
    )
    refs = ordered.to_arrow_refs()
    sums = ray.get([_blk_sums.remote(b, "d", "c") for b in refs])
    d_off = np.concatenate([[0], np.cumsum([s[0] for s in sums])[:-1]]).astype(np.int64)
    c_off = np.concatenate([[0], np.cumsum([s[1] for s in sums])[:-1]]).astype(np.int64)
    r_off = np.concatenate([[0], np.cumsum([s[2] for s in sums])[:-1]]).astype(np.int64)
    vol_total = int(sum(s[0] for s in sums))
    n_total = int(sum(s[2] for s in sums))
    tops = [
        t
        for t in ray.get(
            [
                _blk_phi_top1.remote(
                    b, "d", "c", int(do), int(co), vol_total, n_total, int(ro)
                )
                for b, do, co, ro in zip(refs, d_off, c_off, r_off)
            ]
        )
        if t is not None
    ]
    if not tops:
        return pa.table(
            {"best_k": pa.array([], pa.int64()), "phi": pa.array([], pa.float64())}
        )
    phi, k = min(tops, key=lambda t: (t[0], t[1]))
    return pa.table(
        {"best_k": pa.array([k], pa.int64()),
         "phi": pa.array([round(phi, 6)], pa.float64())}
    )
