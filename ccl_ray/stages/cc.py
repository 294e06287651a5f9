"""Distributed connected components over an edge table (the engine flagship).

This is the Ray-Data-native generalization of the reference's label algebra:
per-slice CCL + cross-slice equivalence reconciliation + transitive closure +
backward translation sweep (reference: ccl2d.py:19-222, ccl_marker_stack.py
:128-218, :262-723, :485-530, :986-1010) collapse into ONE fixpoint:
min-label ("hash-to-min") propagation over the edge table, accelerated with
pointer jumping so long chains converge in O(log n) rounds instead of the
reference's O(slices) serial sweep and O(n^2)-per-round closure loop
(ccl_marker_stack.py:485-530, the reference's own flagged hot spot).

Canonical label = min vertex id in the component. This replaces the
reference's order-dependent ``marker_base`` counter (ccl_marker_stack.py
:270-272, 565-588) with a deterministic, order-free labeling — distributed
runs at any partition count agree exactly.

Per iteration (all Ray Data ops, streaming, no driver-side row loops):
  1. gather  : sym_edges ⋈ labels on src  (hash join, num_partitions P)
  2. combine : union candidate msgs with current labels → groupby(vid).min
  3. jump    : labels ⋈ labels on (label == vid) — path compression
  4. converge: `changed` = tiny column-sum aggregate, not a materialization
Label state is materialized once per iteration (cuts lineage; the analog of
the reference checkpointing nothing and holding every slice in RAM —
ccl_marker_stack.py:732-733) and optionally checkpointed to Parquet with a
manifest for kill-resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.exchange import hash_join

# Sentinel for "no previous label" on message rows; Min() picks the real old
# label from the self-row, so no nullable-int columns flow through the shuffle.
_INT64_MAX = (1 << 63) - 1


@dataclass
class CCResult:
    labels: "rd.Dataset"          # (vid:int64, label:int64)
    iterations: int
    metrics: list = field(default_factory=list)  # per-iter dicts


def _pin(ds: "rd.Dataset", P: int) -> "rd.Dataset":
    """Coalesce to P blocks and materialize.

    Every shuffle/union multiplies block counts; without pinning, per-task
    scheduling overhead compounds geometrically across iterations (observed
    4 -> 9 -> 22 -> 44 blocks on a toy graph). Repartition without shuffle
    only splits/merges block boundaries — no row movement.
    """
    return ds.repartition(P).materialize()


def symmetrize(edges: "rd.Dataset") -> "rd.Dataset":
    """Emit both directions of each undirected edge: (src,dst) and (dst,src)."""

    def both(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        dst = batch.column("dst")
        return pa.table(
            {
                "src": pa.chunked_array([src, dst]).combine_chunks(),
                "dst": pa.chunked_array([dst, src]).combine_chunks(),
            }
        )

    return edges.select_columns(["src", "dst"]).map_batches(both, batch_format="pyarrow")


def init_labels(edges: "rd.Dataset", vertices: "rd.Dataset" | None, cfg: EngineConfig) -> "rd.Dataset":
    """labels(vid, label=vid) over all edge endpoints ∪ explicit vertices.

    Explicit ``vertices`` keeps isolated vids in play (the reference's
    background-0 pixels are absent; our isolated turns must survive so
    per-component aggregates and PageRank mass are correct).
    """
    ends = edges.select_columns(["src"]).rename_columns({"src": "vid"}).union(
        edges.select_columns(["dst"]).rename_columns({"dst": "vid"})
    )
    if vertices is not None:
        ends = ends.union(vertices.select_columns(["vid"]))
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    return partitioned_groupby_agg(ends, ["vid"], {"label": ("vid", "min")})


def _propagate_round(
    sym_edges: "rd.Dataset",
    labels: "rd.Dataset",
    cfg: EngineConfig,
) -> "rd.Dataset":
    """One hash-to-min round; returns ds (vid, label, old)."""
    P = cfg.num_partitions
    lab_r = labels.rename_columns({"vid": "jvid", "label": "jlabel"})
    joined = hash_join(sym_edges, lab_r, left_on="src", right_on="jvid", num_partitions=P)

    def msgs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        import numpy as np

        return pa.table(
            {
                "vid": batch.column("dst"),
                "cand": batch.column("jlabel"),
                "old": pa.array(np.full(n, _INT64_MAX, dtype=np.int64)),
            }
        )

    def selfrows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "cand": batch.column("label"),
                "old": batch.column("label"),
            }
        )

    stream = joined.map_batches(msgs, batch_format="pyarrow").union(
        labels.map_batches(selfrows, batch_format="pyarrow")
    )
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    return partitioned_groupby_agg(
        stream, ["vid"], {"label": ("cand", "min"), "old": ("old", "min")}, num_partitions=P
    )


def _jump_round(labels3: "rd.Dataset", cfg: EngineConfig) -> "rd.Dataset":
    """Pointer jump: label[v] <- label[label[v]]. Input/output (vid,label,old)."""
    P = cfg.num_partitions
    parent = labels3.select_columns(["vid", "label"]).rename_columns(
        {"vid": "pvid", "label": "plabel"}
    )
    j = hash_join(labels3, parent, left_on="label", right_on="pvid", how="left outer", num_partitions=P)

    def coalesce(batch: pa.Table) -> pa.Table:
        lab = pc.coalesce(batch.column("plabel"), batch.column("label"))
        return pa.table({"vid": batch.column("vid"), "label": lab, "old": batch.column("old")})

    return j.map_batches(coalesce, batch_format="pyarrow")


def connected_components(
    edges: "rd.Dataset",
    *,
    vertices: "rd.Dataset" | None = None,
    cfg: EngineConfig | None = None,
    checkpoint=None,
) -> CCResult:
    """Exact connected components; labels = min vid per component.

    Checkpoint/resume is provided by the default BSP engine
    (cc_bsp.connected_components_bsp + state.checkpoint.ShardCheckpoint);
    this alternate Dataset formulation intentionally does not support it.
    """
    if checkpoint is not None:
        raise NotImplementedError(
            "checkpointing is supported by the BSP engine (connected_components_bsp); "
            "the Dataset strategy is a semantics-parity path only"
        )
    cfg = cfg or EngineConfig()
    sym = _pin(symmetrize(edges), cfg.num_partitions)  # static across iterations
    n_dir_edges = sym.count()

    start_iter = 0
    labels = _pin(init_labels(edges, vertices, cfg), cfg.num_partitions)

    metrics: list[dict] = []
    it = start_iter
    while it < cfg.cc_max_iters:
        t0 = time.perf_counter()
        # Materialize at round boundaries: (a) cuts per-iteration lineage so
        # the lazy engine never re-executes prior rounds, (b) the jump round
        # consumes its input twice (child + parent side of the self-join) —
        # feeding it an unmaterialized diamond would duplicate the subplan
        # and can stall the streaming executor on small CPU counts.
        grouped = _pin(_propagate_round(sym, labels, cfg), cfg.num_partitions)
        for _ in range(cfg.cc_jump_rounds):
            grouped = _pin(_jump_round(grouped, cfg), cfg.num_partitions)

        def flag(batch: pa.Table) -> pa.Table:
            ch = pc.cast(pc.not_equal(batch.column("label"), batch.column("old")), pa.int64())
            return pa.table(
                {"vid": batch.column("vid"), "label": batch.column("label"), "changed": ch}
            )

        new_labels = grouped.map_batches(flag, batch_format="pyarrow").materialize()
        changed = new_labels.sum("changed") or 0
        labels = _pin(new_labels.select_columns(["vid", "label"]), cfg.num_partitions)
        it += 1
        wall = time.perf_counter() - t0
        metrics.append(
            {
                "iter": it,
                "changed": int(changed),
                "edges": int(n_dir_edges),
                "wall_s": wall,
                "edges_per_sec": n_dir_edges / wall if wall > 0 else 0.0,
            }
        )
        if changed == 0:
            break

    return CCResult(labels=labels, iterations=it - start_iter, metrics=metrics)
