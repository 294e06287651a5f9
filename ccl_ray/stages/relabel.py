"""Translation-table label algebra as table operations.

The reference's translation tables are lists of [set(old_labels), new_label]
applied by per-label masked scatter loops (ccl_backsub, ccl_marker_stack.py
:65-86 — its own flagged hot spot) and composed pairwise
(ccl_compose_translations, ccl_marker_stack.py:88-122). Here a translation
is just a (old, new) Arrow table:

- apply  = broadcast-dict map inside map_batches (translation tables are
  orders of magnitude smaller than the labeled data — the broadcast-small-
  side join of SURVEY.md §2.5 J1); unmatched labels pass through.
- compose = one pandas merge on the small tables themselves
  (x0.new == x1.old), with unmatched entries of both passed through —
  exactly the reference's pass-through semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def compose_translations(x0: pd.DataFrame, x1: pd.DataFrame) -> pd.DataFrame:
    """x01 = x1 ∘ x0 on columns (old, new); pass-through for unmatched.

    Matches reference semantics (ccl_marker_stack.py:88-122): entries of x0
    whose new has a continuation in x1 are rewritten; x0 entries without a
    continuation and x1 entries not consumed by x0 are kept as-is.
    """
    m = x0.merge(x1, left_on="new", right_on="old", how="left", suffixes=("", "_1"))
    composed = pd.DataFrame(
        {"old": m["old"], "new": m["new_1"].where(m["new_1"].notna(), m["new"])}
    )
    # an x1 entry (o -> n) still applies to input o unless x0 remaps o away;
    # composed rows already cover every o in x0.old
    leftover = x1[~x1["old"].isin(set(x0["old"]))]
    out = pd.concat([composed, leftover[["old", "new"]]], ignore_index=True)
    return out.drop_duplicates(subset=["old"], keep="first").reset_index(drop=True)


def apply_translation(
    ds: "rd.Dataset", translation: pd.DataFrame, col: str, out_col: str | None = None
) -> "rd.Dataset":
    """Rewrite ``col`` through the (old, new) table; unmatched pass through.

    The translation is ray.put ONCE and read per actor/worker — never
    re-shipped per batch.
    """
    out_col = out_col or col
    ref = ray.put(dict(zip(translation["old"].tolist(), translation["new"].tolist())))

    class Apply:
        def __init__(self):
            self.mapping = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vals = batch[col]
            mapped = vals.map(self.mapping)
            batch[out_col] = mapped.where(mapped.notna(), vals)
            return batch

    return ds.map_batches(Apply, batch_format="pandas", concurrency=(1, 4), max_restarts=0)


# Label spaces up to this many DISTINCT labels are broadcast to workers
# (a sorted int64 array: 2M labels = 16 MB — cheap and join-free). Above
# it the distributed sort + rank-join path runs instead: the worst case
# (near-all-isolated vertices → components ≈ vertices) must never
# materialize the label space on the driver.
_LABEL_BROADCAST_LIMIT = 2_000_000


def _distinct_labels(ds: "rd.Dataset", col: str) -> "rd.Dataset":
    from ccl_ray.stages.aggregates import partial_sum_agg

    return partial_sum_agg(ds, [col], {}, count_as="_n").select_columns([col]).materialize()


def _densify_distributed(
    ds: "rd.Dataset", distinct: "rd.Dataset", col: str, out_col: str
) -> "rd.Dataset":
    """Distributed dense rank: sort the distinct labels, exclusive-scan the
    per-block row counts (P scalars on the driver — never the labels), rank
    each block in place, and hash-join the (label → rank) mapping back.
    """
    from ccl_ray.stages.exchange import hash_join

    blocks = distinct.sort(col).to_arrow_refs()

    from ccl_ray.state.shards import as_arrow_block as _as_arrow

    @ray.remote
    def _nrows(b) -> int:
        return _as_arrow(b).num_rows

    counts = ray.get([_nrows.remote(b) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]

    @ray.remote
    def _rank_block(b, off: int):
        b = _as_arrow(b)
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table(
                {"__dl_key": pa.array([], pa.int64()), out_col: pa.array([], pa.int64())}
            )
        lab = b.column(col).cast(pa.int64())
        return pa.table(
            {
                "__dl_key": lab,
                out_col: pa.array(off + np.arange(b.num_rows, dtype=np.int64)),
            }
        )

    mapping = rd.from_arrow_refs(
        [_rank_block.remote(b, int(o)) for b, o in zip(blocks, offsets)]
    )
    return hash_join(ds, mapping, left_on=col, right_on="__dl_key")


def densify_labels(
    ds: "rd.Dataset",
    col: str = "label",
    out_col: str = "dlabel",
    *,
    broadcast_limit: int = _LABEL_BROADCAST_LIMIT,
) -> "rd.Dataset":
    """Renumber labels to a dense 0..k-1 range by ascending label order.

    Reference M6 (ccl2d.py:192-196, ccl_marker_stack.py:623-630): only
    needed when a consumer wants compact label ids; component identity is
    already canonical (min-vid). Up to ``broadcast_limit`` distinct labels
    the sorted label array is broadcast once (components ≪ vertices on
    typical graphs); above it the distributed sort + rank-join path runs —
    the driver only ever holds P per-block row counts.
    """
    distinct = _distinct_labels(ds, col)
    if distinct.count() > broadcast_limit:
        return _densify_distributed(ds, distinct, col, out_col)

    order = np.sort(distinct.to_pandas()[col].values.astype(np.int64))
    ref = ray.put(order)

    class Rank:
        def __init__(self):
            self.order = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            ranks = np.searchsorted(self.order, vals)
            out = batch.append_column(out_col, pa.array(ranks.astype(np.int64)))
            return out

    return ds.map_batches(Rank, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def eol_labels(present: "rd.Dataset") -> "rd.Dataset":
    """Anti-join EOL detection (reference C7, ccl_marker_stack.py:664-667).

    ``present``: (label:int64, t:int64) distinct observations. Returns the
    (label, t) pairs with no (label, t+1) — 'component died after t'.
    Implemented as union-tag + groupby-aggregate: no join needed.
    """

    def tag(batch: pa.Table) -> pa.Table:
        lab = batch.column("label")
        t = batch.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        return pa.table(
            {
                "label": pa.chunked_array([lab, lab]).combine_chunks(),
                "t": pa.array(np.concatenate([t, t - 1])),
                "cur": pa.array(np.concatenate([np.ones(n, np.int64), np.zeros(n, np.int64)])),
                "nxt": pa.array(np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)])),
            }
        )

    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    agg = partitioned_groupby_agg(
        present.map_batches(tag, batch_format="pyarrow"),
        ["label", "t"],
        {"n_cur": ("cur", "sum"), "n_nxt": ("nxt", "sum")},
    )

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.greater(batch.column("n_cur"), 0), pc.equal(batch.column("n_nxt"), 0)
        )
        return batch.filter(mask).select(["label", "t"])

    return agg.map_batches(pick, batch_format="pyarrow")
