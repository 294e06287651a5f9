"""Per-component bipartiteness census over an undirected edge table.

Composition of the engine's own primitives, no new exchange machinery:

  1. CC min-vid labels (stages/cc_bsp.py) — one root per component (the
     label IS the component's min vid, so the distinct-label table is the
     root seed set for free).
  2. One multi-source BFS from ALL roots at once (stages/bfs.py) — each
     vertex's hop distance is to its own component's root because
     components are disjoint; parity = dist & 1.
  3. A component is non-bipartite iff some DISTINCT edge joins equal
     parities (a root→u→v→root odd closed walk ⇒ odd cycle; conversely a
     bipartite component's BFS layering is a proper 2-coloring). This is
     equivalent to the odd-cycle / bipartite-double-cover criterion a
     reachability twin uses (a vertex reachable with both parities).

Scale shape: parity and label tables are |V|-sized and hash-JOIN onto the
edge list (never broadcast); the final census is a partial-agg reduction,
so nothing vertex- or edge-sized reaches the driver. Cost = one CC run +
one BFS (both O(frontier) waves) + three hash joins over E.

Reference semantics: CCL labels components (reference ccl.py equivalence
classes); bipartiteness is the classic odd-cycle extension of the same
label-propagation machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ccl_ray.config import EngineConfig


def bipartiteness_census(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    shards: dict | None = None,
    labels=None,
    max_rounds: int = 256,
):
    """(is_bipartite: 0/1, n_components, n_vertices) census Dataset.

    ``edges``: (src, dst) Dataset — treated undirected; parallel edges and
    self loops are tolerated (self loops make their component non-bipartite,
    matching the odd-cycle definition). ``labels``: optional prebuilt
    (vid, label) min-vid CC labels; ``shards``: optional symmetric bundle
    reused across the CC and BFS passes.
    """
    import ray.data as rd  # noqa: F401  (Dataset types flow through)

    from ccl_ray.stages.aggregates import partial_sum_agg
    from ccl_ray.stages.bfs import bfs_hops
    from ccl_ray.stages.cc_bsp import connected_components_bsp
    from ccl_ray.stages.exchange import hash_join

    # rename via an Arrow projection, not Dataset.rename_columns: on a
    # materialized dataset Ray 2.49 can serve a STALE .schema() (old names)
    # while blocks carry the new ones, and hash_join trusts .schema()
    def _ren(ds, mapping: dict, types: dict):
        out = ds.map_batches(
            lambda t: t.rename_columns([mapping.get(n, n) for n in t.column_names]),
            batch_format="pyarrow",
        )
        return out, pa.schema([(mapping.get(n, n), ty) for n, ty in types.items()])

    cfg = cfg or EngineConfig()
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, cfg.num_partitions, vertices_ds=vertices,
            symmetrize=True, dense=cfg.dense_ids,
        )
    if labels is None:
        labels = connected_components_bsp(
            edges, cfg=cfg, shards=shards
        ).labels.materialize()

    sizes = partial_sum_agg(
        labels.select_columns(["label"]), ["label"], {}, count_as="nv"
    ).materialize()
    seeds, _ = _ren(
        sizes.select_columns(["label"]), {"label": "vid"}, {"label": pa.int64()}
    )
    dist = bfs_hops(
        edges, seeds, cfg=cfg, max_rounds=max_rounds, shards=shards
    ).dists

    def par(t: pa.Table) -> pa.Table:
        d = t.column("dist").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pv": t.column("vid"), "p": pa.array(d & 1)})

    parity = dist.map_batches(par, batch_format="pyarrow").materialize()

    # DISTINCT edges: parallel copies would only repeat the same parity
    # verdict; self loops survive (src == dst ⇒ equal parity ⇒ odd).
    dedup = partial_sum_agg(
        edges.select_columns(["src", "dst"]), ["src", "dst"], {}, count_as="_n"
    ).select_columns(["src", "dst"])
    ptypes = {"pv": pa.int64(), "p": pa.int64()}
    ps_ds, ps_schema = _ren(parity, {"pv": "sv", "p": "ps"}, ptypes)
    pd_ds, pd_schema = _ren(parity, {"pv": "dv", "p": "pd"}, ptypes)
    j1 = hash_join(
        dedup, ps_ds, left_on="src", right_on="sv", num_partitions=8,
        right_schema=ps_schema,
    )
    j2 = hash_join(
        j1, pd_ds, left_on="dst", right_on="dv", num_partitions=8,
        right_schema=pd_schema,
    )
    odd = j2.map_batches(
        lambda t: t.filter(pc.equal(t.column("ps"), t.column("pd"))).select(["src"]),
        batch_format="pyarrow",
    )
    lab_ds, lab_schema = _ren(
        labels, {"vid": "lv", "label": "broot"},
        {"vid": pa.int64(), "label": pa.int64()},
    )
    oddlab = hash_join(
        odd, lab_ds, left_on="src", right_on="lv", num_partitions=8,
        left_schema=pa.schema([("src", pa.int64())]),
        right_schema=lab_schema,
    )
    badroots = partial_sum_agg(
        oddlab.select_columns(["broot"]), ["broot"], {}, count_as="bad"
    )
    flag = hash_join(
        sizes, badroots, left_on="label", right_on="broot", how="left outer",
        num_partitions=8,
        right_schema=pa.schema([("broot", pa.int64()), ("bad", pa.int64())]),
    )

    def census(t: pa.Table) -> pa.Table:
        bad = t.column("bad").to_numpy(zero_copy_only=False)
        is_bip = (pd.isna(bad)).astype(np.int64)
        return pa.table({"is_bipartite": pa.array(is_bip), "nv": t.column("nv")})

    return partial_sum_agg(
        flag.map_batches(census, batch_format="pyarrow"),
        ["is_bipartite"], {"nv": "n_vertices"}, count_as="n_components",
    )
