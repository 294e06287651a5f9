"""Densest-subgraph greedy peeling (Bahmani-Kumar-Vassilvitskii shape).

Charikar's greedy peel removes ONE min-degree vertex per step — inherently
sequential. The parallel variant removes EVERY vertex whose degree is at
most (1+ε)·(average degree) per round; with ε = 1/2 the threshold test is

    deg(v) · |V| ≤ 3 · |E|        (exact integer arithmetic)

so the engine and a SQL twin peel bit-identical vertex sets (no float
threshold anywhere), the round count is ≤ log_{3/2}|V| (each round keeps
only vertices strictly above 1.5× the average, which fewer than 2/3 of
vertices can be), and the max-density round is a 2(1+ε) = 3-approximation
of the optimum [Bahmani, Kumar, Vassilvitskii, VLDB 2012; Charikar 2000].

Per round (all Dataset ops, nothing vertex- or edge-sized on the driver):
  degrees = one partial-agg over both edge ends, left-joined onto the
  alive-vertex table (isolated survivors count with degree 0 and are
  peeled immediately); survivors filter with the integer rule; edges
  semi-join the shrinking alive set on both endpoints. Driver traffic is
  two ints per round (|V|, |E|).

Output: one row per non-empty round — (round, n_vertices, n_edges,
density) — the full peel trajectory; the densest round is the argmax row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccl_ray.config import EngineConfig


def densest_peel(
    edges,
    *,
    cfg: EngineConfig | None = None,
    max_rounds: int = 48,
):
    """Peel trajectory table of the 3-approx densest-subgraph greedy.

    ``edges``: (src, dst) Dataset, treated as a simple undirected graph
    (callers pass deduped src<dst edges; self loops are dropped). Raises
    if the peel needs more than ``max_rounds`` rounds (can't happen for
    |V| < 1.5^48 ≈ 3e8 per the geometric shrink argument — raise the cap
    for a larger vertex domain)."""
    from ccl_ray.stages.aggregates import partial_sum_agg
    from ccl_ray.stages.exchange import broadcast_lookup_join

    cfg = cfg or EngineConfig()

    def ends(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(np.concatenate([s, d]), pa.int64())})

    def drop_self(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t.column("src"), t.column("dst")))

    cur_edges = (
        edges.select_columns(["src", "dst"])
        .map_batches(drop_self, batch_format="pyarrow")
        .materialize()
    )
    alive = partial_sum_agg(
        cur_edges.map_batches(ends, batch_format="pyarrow"), ["vid"], {},
        count_as="_d",
    ).select_columns(["vid"]).materialize()

    rows = []
    rnd = 0
    while True:
        rnd += 1
        nv = alive.count()
        if nv == 0:
            break
        if rnd > max_rounds:
            raise RuntimeError(f"densest_peel: not converged in {max_rounds} rounds")
        ne = cur_edges.count()
        dens = ne / nv
        dens = float(np.copysign(np.floor(abs(dens) * 1e6 + 0.5) / 1e6, dens))
        rows.append((rnd, nv, ne, dens))

        deg = partial_sum_agg(
            cur_edges.map_batches(ends, batch_format="pyarrow"), ["vid"], {},
            count_as="deg",
        )

        # survivors straight from the degree table: every vertex in it is
        # alive (edges are alive-filtered), and an alive vertex ABSENT from
        # it is isolated (degree 0), which never passes 0·nv > 3·ne — the
        # explicit alive⟕deg join is unnecessary
        def keep(t: pa.Table, _nv=nv, _ne=ne) -> pa.Table:
            d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(d * _nv > 3 * _ne)).select(["vid"])

        alive = deg.map_batches(keep, batch_format="pyarrow").materialize()
        if alive.count() == 0:
            break  # everyone peeled; an empty Dataset has no schema to join
        # endpoint semi-joins: broadcast the (shrinking) alive set when it
        # fits (size-guarded; falls back to the hash-partitioned join)
        cur_edges = broadcast_lookup_join(
            broadcast_lookup_join(
                cur_edges, alive, big_key="src", small_key="vid", value_cols=[]
            ),
            alive, big_key="dst", small_key="vid", value_cols=[],
        ).materialize()

    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "n_vertices": pa.array([r[1] for r in rows], pa.int64()),
            "n_edges": pa.array([r[2] for r in rows], pa.int64()),
            "density": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
