"""Distributed bridge finding + 2-edge-connected components.

An edge is a BRIDGE iff it lies on no cycle. The classic Tarjan low-link
needs a DFS — inherently sequential — so the engine uses the spanning-tree
+ cycle-space tagging construction instead (the sketch underlying
Ahn-Guha-McGregor-style connectivity samplers, used here deterministically):

  1. BFS forest from each component's min-vid root (the engine's CC labels
     supply the roots; the BFS supplies depths). Parent(v) = the min-vid
     neighbor at depth(v)−1 — deterministic, no races.
  2. Every NON-tree edge {x, y} gets a 64-bit tag = stable hash of the
     pair, XOR-added at both endpoints. A non-tree edge covers exactly the
     tree path x..y, and XOR telescopes along tree paths.
  3. Subtree XOR by ANCESTOR HOP-DOUBLING (⌈log₂ height⌉ rounds, not
     height waves — transcript/event BFS trees reach depth in the
     hundreds through per-user chains). Invariant: after round k,
     s_k(v) = XOR of tags over descendants of v within distance < 2^k
     (self included) and A_k(v) = v's 2^k-th ancestor (−1 past the
     root). Step: s_{k+1}(v) = s_k(v) XOR ⨁_{u: A_k(u)=v} s_k(u)
     (each descendant at offset [2^k, 2^{k+1}) routes through exactly
     one such u), and A_{k+1}(v) = A_k(A_k(v)). After 2^K > height,
     s_K(v) is the XOR over the whole subtree — i.e. over the non-tree
     edges with EXACTLY ONE endpoint in subtree(v), the set covering
     tree edge (parent(v), v). That edge is a bridge iff the set is
     empty, certified by s_K(v) == 0 (false positive only if distinct
     tags XOR to zero: ≈ 2⁻⁶⁴ per edge; the bridges_close gate query
     cross-checks the full bridge SET against an exact iterative Tarjan
     oracle every run). Non-tree edges are never bridges.
  4. 2-edge-connected components = the engine's own BSP CC over the
     non-bridge edge set (isolated vertices keep their own label).

Scale shape: parents/ancestors/accumulators are |V|-sized Datasets that
move only through hash joins and per-round xor-reduces; the round count
is log₂(forest height); nothing vertex- or edge-sized reaches the
driver. Per round: one ancestor-doubling join + one union-reduce merge
(pushes ride the merge unaggregated — XOR is associative, the per-v
reduce absorbs them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ccl_ray.config import EngineConfig


def _dbg(msg: str) -> None:
    import os
    import time

    if os.environ.get("CCL_BRIDGES_DEBUG"):
        print(f"[bridges {time.time():.1f}] {msg}", flush=True)


def _xor_agg(ds, key: str, col: str, P: int):
    """(key, col) with ``col`` XOR-reduced per key — hash(key)-routed."""
    from ccl_ray.functions.hashing import hash_part_np

    out_schema = pa.schema([(key, pa.int64()), (col, pa.int64())])

    def route(t: pa.Table) -> pa.Table:
        return pa.table(
            {key: t.column(key), col: t.column(col),
             "part": pa.array(hash_part_np(t.column(key), pa.int64(), P))}
        )

    def reduce_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        k = df[key].to_numpy(np.int64)
        v = df[col].to_numpy(np.int64)
        o = np.argsort(k, kind="stable")
        k, v = k[o], v[o]
        new = np.empty(len(k), bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {key: pa.array(k[starts]),
             col: pa.array(np.bitwise_xor.reduceat(v, starts))}
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pandas")
    )


def _merge_xor_state(ds, P: int):
    """(v, parent, depth, acc) rows merged per v: parent/depth by max
    (push rows carry −1), acc by XOR — one hash(v)-routed reduce."""
    from ccl_ray.functions.hashing import hash_part_np

    out_schema = pa.schema(
        [("v", pa.int64()), ("parent", pa.int64()),
         ("depth", pa.int64()), ("acc", pa.int64())]
    )

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(hash_part_np(t.column("v"), pa.int64(), P))
        )

    def reduce_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        v = df["v"].to_numpy(np.int64)
        o = np.argsort(v, kind="stable")
        v = v[o]
        par = df["parent"].to_numpy(np.int64)[o]
        dep = df["depth"].to_numpy(np.int64)[o]
        acc = df["acc"].to_numpy(np.int64)[o]
        new = np.empty(len(v), bool)
        new[0] = True
        new[1:] = v[1:] != v[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "v": pa.array(v[starts]),
                "parent": pa.array(np.maximum.reduceat(par, starts)),
                "depth": pa.array(np.maximum.reduceat(dep, starts)),
                "acc": pa.array(np.bitwise_xor.reduceat(acc, starts)),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pandas")
    )


def bridges(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    shards: dict | None = None,
    labels=None,
    max_rounds: int = 256,
):
    """(bridge_edges Dataset (a, b), twoecc_labels Dataset (vid, label)).

    ``edges``: DISTINCT (src, dst) simple undirected edges (src < dst, no
    self loops — callers pass the deduped set). ``labels``/``shards``:
    optional prebuilt CC labels / symmetric shard bundle, reused across
    the CC and BFS passes.
    """
    import ray.data as rd  # noqa: F401

    from ccl_ray.functions.hashing import stable_hash64_np
    from ccl_ray.stages.aggregates import partial_sum_agg, partitioned_groupby_agg
    from ccl_ray.stages.bfs import bfs_hops
    from ccl_ray.stages.cc_bsp import connected_components_bsp
    from ccl_ray.stages.exchange import hash_join

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    if shards is None:
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, P, vertices_ds=vertices, symmetrize=True, dense=cfg.dense_ids
        )
    _dbg('setup: shards done')
    if labels is None:
        labels = connected_components_bsp(
            edges, cfg=cfg, shards=shards
        ).labels.materialize()

    roots = partial_sum_agg(
        labels.select_columns(["label"]), ["label"], {}, count_as="_n"
    ).map_batches(
        lambda t: pa.table({"vid": t.column("label")}), batch_format="pyarrow"
    )
    _dbg('cc done')
    dist = bfs_hops(
        edges, roots, cfg=cfg, max_rounds=max_rounds, shards=shards
    ).dists.materialize()

    # parent(v) = min-vid neighbor at depth(v)-1 over both edge orientations
    def both(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {"u": pa.array(np.concatenate([s, d]), pa.int64()),
             "v": pa.array(np.concatenate([d, s]), pa.int64())}
        )

    _dbg('bfs done')
    und = edges.map_batches(both, batch_format="pyarrow")
    d_u = dist.map_batches(
        lambda t: t.rename_columns(["uu", "du"]), batch_format="pyarrow"
    )
    d_v = dist.map_batches(
        lambda t: t.rename_columns(["vv", "dv"]), batch_format="pyarrow"
    )
    dsch = lambda a, b: pa.schema([(a, pa.int64()), (b, pa.int64())])  # noqa: E731
    j = hash_join(
        und, d_u, left_on="u", right_on="uu", num_partitions=P,
        left_schema=dsch("u", "v"), right_schema=dsch("uu", "du"),
    )
    j = hash_join(
        j, d_v, left_on="v", right_on="vv", num_partitions=P,
        left_schema=pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("du", pa.int64())]
        ),
        right_schema=dsch("vv", "dv"),
    )
    cand = j.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("du"), pc.subtract(t.column("dv"), pa.scalar(1, pa.int64())))
        ).select(["v", "u"]),
        batch_format="pyarrow",
    )
    _dbg('cand built')
    parent = partitioned_groupby_agg(
        cand, ["v"], {"parent": ("u", "min")}, num_partitions=P
    ).materialize()

    _dbg('parent done')
    # tree-edge pair census: non-tree edge <=> pair absent from tree set
    tree_pairs = parent.map_batches(
        lambda t: pa.table(
            {
                "src": pc.min_element_wise(t.column("v"), t.column("parent")),
                "dst": pc.max_element_wise(t.column("v"), t.column("parent")),
                "is_tree": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    all_pairs = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column("src"), "dst": t.column("dst"),
             "is_tree": pa.array(np.zeros(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )
    marked = partial_sum_agg(
        all_pairs.union(tree_pairs), ["src", "dst"], {"is_tree": "is_tree"}
    ).materialize()
    _dbg('marked done')
    nontree = marked.map_batches(
        lambda t: t.filter(pc.equal(t.column("is_tree"), 0)).select(["src", "dst"]),
        batch_format="pyarrow",
    )

    # XOR contributions of non-tree edges at both endpoints
    def contrib(t: pa.Table) -> pa.Table:
        a = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        tag = (
            stable_hash64_np(a, seed=11).astype(np.int64)
            ^ stable_hash64_np(b, seed=29).astype(np.int64)
        )
        return pa.table(
            {"vid": pa.array(np.concatenate([a, b])),
             "acc": pa.array(np.concatenate([tag, tag]))}
        )

    acc0 = _xor_agg(nontree.map_batches(contrib, batch_format="pyarrow"), "vid", "acc", P)

    # state: (v, parent, depth, acc). Built null-free: tree rows (acc 0)
    # union contribution rows (parent/depth −1), merged by the same
    # XOR/max reduce the waves use — a left-outer join here could
    # round-trip the int64 tags through pandas float64 inside the shuffle.
    tree_rows = hash_join(
        parent, dist.map_batches(
            lambda t: t.rename_columns(["dv2", "depth"]), batch_format="pyarrow"
        ),
        left_on="v", right_on="dv2", num_partitions=P,
        left_schema=dsch("v", "parent"), right_schema=dsch("dv2", "depth"),
    ).map_batches(
        lambda t: t.append_column(
            "acc", pa.array(np.zeros(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
    )
    acc_rows = acc0.map_batches(
        lambda t: pa.table(
            {
                "v": t.column("vid"),
                "parent": pa.array(np.full(t.num_rows, -1, np.int64)),
                "depth": pa.array(np.full(t.num_rows, -1, np.int64)),
                "acc": t.column("acc"),
            }
        ),
        batch_format="pyarrow",
    )
    # Roots are seeded explicitly (parent −1, acc 0): the ancestor-doubling
    # join below is INNER, so every reachable A_k value — in particular a
    # root with no non-tree incidence — must exist as a state row or its
    # children's rows would drop out of the join.
    root_rows = roots.map_batches(
        lambda t: pa.table(
            {
                "v": t.column("vid"),
                "parent": pa.array(np.full(t.num_rows, -1, np.int64)),
                "depth": pa.array(np.zeros(t.num_rows, np.int64)),
                "acc": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    st0 = _merge_xor_state(
        tree_rows.union(acc_rows).union(root_rows), P
    ).materialize()
    _dbg('st0 done')
    dmax = int(st0.max("depth") or 0)
    _dbg(f'dmax={dmax}')

    # Hop-doubling climb state (v, parent, anc, s): parent is the fixed
    # tree parent (−1 at roots), anc = A_k(v), s = s_k(v). Sentinels:
    # push/delta rows carry parent = anc = −2 so the per-v max-reduce
    # recovers the base row's values (base parent/anc ≥ −1, exactly one
    # base row per v — every vertex has one, roots included, so every
    # push target and every A_k value resolves). Pushes ride the merge
    # UNAGGREGATED — XOR is associative, the reduce absorbs them — so
    # each round costs one ancestor join + one merge shuffle.
    state = st0.map_batches(
        lambda t: pa.table(
            {"v": t.column("v"), "parent": t.column("parent"),
             "anc": t.column("parent"), "s": t.column("acc")}
        ),
        batch_format="pyarrow",
    ).materialize()

    csch = pa.schema(
        [("v", pa.int64()), ("parent", pa.int64()),
         ("anc", pa.int64()), ("s", pa.int64())]
    )

    def _merge_climb(ds):
        def route(t: pa.Table) -> pa.Table:
            from ccl_ray.functions.hashing import hash_part_np

            return t.append_column(
                "part", pa.array(hash_part_np(t.column("v"), pa.int64(), P))
            )

        def reduce_part(df: pd.DataFrame) -> pa.Table:
            if not len(df):
                return csch.empty_table()
            v = df["v"].to_numpy(np.int64)
            o = np.argsort(v, kind="stable")
            v = v[o]
            par = df["parent"].to_numpy(np.int64)[o]
            anc = df["anc"].to_numpy(np.int64)[o]
            s = df["s"].to_numpy(np.int64)[o]
            new = np.empty(len(v), bool)
            new[0] = True
            new[1:] = v[1:] != v[:-1]
            starts = np.nonzero(new)[0]
            return pa.table(
                {
                    "v": pa.array(v[starts]),
                    "parent": pa.array(np.maximum.reduceat(par, starts)),
                    "anc": pa.array(np.maximum.reduceat(anc, starts)),
                    "s": pa.array(np.bitwise_xor.reduceat(s, starts)),
                }
            )

        return (
            ds.map_batches(route, batch_format="pyarrow")
            .groupby("part")
            .map_groups(reduce_part, batch_format="pandas")
        )

    for _k in range(dmax.bit_length()):  # smallest K with 2^K > height
        pushes = state.map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        "v": f.column("anc"),
                        "parent": pa.array(np.full(f.num_rows, -2, np.int64)),
                        "anc": pa.array(np.full(f.num_rows, -2, np.int64)),
                        "s": f.column("s"),
                    }
                )
            )(t.filter(pc.greater_equal(t.column("anc"), 0))),
            batch_format="pyarrow",
        )
        amap = state.map_batches(
            lambda t: pa.table({"av": t.column("v"), "aanc": t.column("anc")}),
            batch_format="pyarrow",
        )
        has = state.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("anc"), 0)),
            batch_format="pyarrow",
        )
        keep = state.map_batches(
            lambda t: t.filter(pc.less(t.column("anc"), 0)),
            batch_format="pyarrow",
        )
        doubled = hash_join(
            has, amap, left_on="anc", right_on="av", num_partitions=P,
            left_schema=csch,
            right_schema=pa.schema([("av", pa.int64()), ("aanc", pa.int64())]),
        ).map_batches(
            lambda t: pa.table(
                {"v": t.column("v"), "parent": t.column("parent"),
                 "anc": t.column("aanc"), "s": t.column("s")}
            ),
            batch_format="pyarrow",
        )
        # repartition(P): union + sort-groupby multiply block count ~3x per
        # round (3, 9, 27, ... blocks measured) and per-round wall grows
        # with it — coalescing back to P blocks keeps rounds flat.
        state = (
            _merge_climb(doubled.union(keep).union(pushes))
            .repartition(P)
            .materialize()
        )
        _dbg(f'round {_k} done, rows={state.count()}')

    import ray.data as rd

    bridge_ds = state.map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "a": pc.min_element_wise(f.column("v"), f.column("parent")),
                    "b": pc.max_element_wise(f.column("v"), f.column("parent")),
                }
            )
        )(
            t.filter(
                pc.and_(
                    pc.greater_equal(t.column("parent"), 0),
                    pc.equal(t.column("s"), 0),
                )
            )
        ),
        batch_format="pyarrow",
    ).materialize()
    _dbg('bridge extract done')
    if bridge_ds.count() == 0:
        bridge_ds = rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )

    # 2ecc = CC over the non-bridge edges (every vertex present via vertices)
    marked_b = partial_sum_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"src": t.column("src"), "dst": t.column("dst"),
                 "isb": pa.array(np.zeros(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ).union(
            bridge_ds.map_batches(
                lambda t: pa.table(
                    {"src": t.column("a"), "dst": t.column("b"),
                     "isb": pa.array(np.ones(t.num_rows, np.int64))}
                ),
                batch_format="pyarrow",
            )
        ),
        ["src", "dst"], {"isb": "isb"},
    )
    nonbridge = marked_b.map_batches(
        lambda t: t.filter(pc.equal(t.column("isb"), 0)).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    allv = dist.select_columns(["vid"])
    _dbg('starting 2ecc cc')
    twoecc = connected_components_bsp(
        nonbridge, vertices=allv, cfg=cfg
    ).labels.materialize()
    return bridge_ds, twoecc
