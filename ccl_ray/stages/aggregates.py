"""Aggregation operators: partial pre-aggregation, component stats, degrees.

The scale rule (SURVEY.md §4): never feed raw rows to a groupby when a
vectorized per-batch partial can shrink the shuffle first. Every function
here follows map_batches(partial) → groupby(small).aggregate(final).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def to_arrow_blocks(ds: "rd.Dataset") -> "rd.Dataset":
    """Normalize block type to Arrow (groupby.aggregate emits pandas blocks;
    unioning those with Arrow blocks breaks Ray's sort sampling)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def partial_sum_agg(
    ds: "rd.Dataset",
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
) -> "rd.Dataset":
    """groupby(keys) with per-batch partial sums (combiner) before the shuffle.

    ``sums``: {input_col: output_name}; ``count_as``: optional row-count name.
    """

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(keys, sort=False, dropna=False)
        out = g[list(sums)].sum().rename(columns=sums)
        if count_as:
            out[count_as] = g.size()
        # Arrow out: every stage feeding a shuffle emits Arrow blocks —
        # mixing pandas and Arrow blocks breaks Ray's sort sampling
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [Sum(out, alias_name=out) for out in sums.values()]
    if count_as:
        aggs.append(Sum(count_as, alias_name=count_as))
    return partials.groupby(keys).aggregate(*aggs)


def component_sizes(labels: "rd.Dataset", min_size: int = 0) -> "rd.Dataset":
    """(label, n_vertices) — reference A1 component-size count + dust filter
    (ccl_marker_stack.py:904-930): components below min_size are dropped."""
    sizes = partial_sum_agg(labels, ["label"], {}, count_as="n_vertices")
    if min_size > 1:
        import pyarrow.compute as pc

        sizes = sizes.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n_vertices"), min_size)),
            batch_format="pyarrow",
        )
    return sizes


def dust_filter(labels: "rd.Dataset", min_size: int) -> "rd.Dataset":
    """Zero-out members of small components (reference semantics: label -> 0).

    Returns (vid, label) with dust labels rewritten to 0 — the reference's
    background value (ccl_marker_stack.py:918-926). Caveat: if vid 0 exists,
    its component's canonical label is also 0; callers needing an
    unambiguous sentinel should offset their vid space (transcript vids
    always do).
    """
    import ray

    keep = component_sizes(labels, min_size).select_columns(["label"]).to_pandas()
    ref = ray.put(set(keep["label"].tolist()))

    class Zero:
        def __init__(self):
            self.keep = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["label"] = df["label"].where(df["label"].isin(self.keep), 0)
            return df

    return labels.map_batches(Zero, batch_format="pandas", concurrency=(1, 4))


def component_ages(labeled_t: "rd.Dataset") -> "rd.Dataset":
    """(label, age) where age = #distinct t the component appears in.

    Reference A2 'ages' (ccl_marker_stack.py:990-1003): component lifetime
    in slices. Two-stage distinct-count: groupby(label,t) then groupby(label).
    """
    distinct = partial_sum_agg(labeled_t, ["label", "t"], {}, count_as="_n").select_columns(
        ["label", "t"]
    )
    return partial_sum_agg(distinct, ["label"], {}, count_as="age")


def top_k_components(labels: "rd.Dataset", k: int = 10) -> "rd.Dataset":
    """Reference A3 largest-k (contrib/cc3d.ipynb cell 11): size desc, label asc."""
    return component_sizes(labels).sort(["n_vertices", "label"], descending=[True, False]).limit(k)


def id_stats(labels: "rd.Dataset") -> pa.Table:
    """Reference A4 id-space stats (ccl_marker_stack.py:1017-1028)."""
    distinct = component_sizes(labels).select_columns(["label"])
    out = distinct.aggregate(
        Count(alias_name="n_components"),
        Min("label", alias_name="min_label"),
        Max("label", alias_name="max_label"),
    )
    return pa.table(
        {
            "n_components": pa.array([out["n_components"]], pa.int64()),
            "min_label": pa.array([out["min_label"]], pa.int64()),
            "max_label": pa.array([out["max_label"]], pa.int64()),
        }
    )


def degrees(edges: "rd.Dataset", vertices: "rd.Dataset" | None = None) -> "rd.Dataset":
    """(vid, degree) over the simple undirected graph (distinct neighbors);
    vertices with no edges get degree 0 via a union (no join needed)."""

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        d = batch.column("dst")
        return pa.table(
            {
                "vid": pa.chunked_array([s, d]).combine_chunks(),
                "nbr": pa.chunked_array([d, s]).combine_chunks(),
            }
        )

    pairs = edges.select_columns(["src", "dst"]).map_batches(both, batch_format="pyarrow")
    distinct_pairs = partial_sum_agg(pairs, ["vid", "nbr"], {}, count_as="_n").select_columns(
        ["vid", "nbr"]
    )
    deg = partial_sum_agg(distinct_pairs, ["vid"], {}, count_as="degree")
    if vertices is not None:
        def zero(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": batch.column("vid"),
                    "degree": pa.array(np.zeros(batch.num_rows, np.int64)),
                }
            )

        zeros = vertices.select_columns(["vid"]).map_batches(zero, batch_format="pyarrow")
        deg = (
            to_arrow_blocks(deg)
            .union(zeros)
            .groupby("vid")
            .aggregate(Sum("degree", alias_name="degree"))
        )
    return deg
