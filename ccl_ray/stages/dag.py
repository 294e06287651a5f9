"""Longest-path levels of a DAG over directed hash-partitioned CSR shards.

level(v) = the longest directed path length ending at v (0 for sources) —
the topological "generation" downstream schedulers use to batch a
condensation DAG (stage N cannot start before stage N-1), and the DAG
depth is max(level). Algorithm: max-relaxation to fixpoint on the same
one-time shard-plan machinery as cc_bsp/scc — every wave ships
level(u)+1 along u→v from CHANGED vertices only (sparse frontier,
np.maximum reduce), so wave w costs O(frontier edges) and the wave count
equals the DAG depth. On a cyclic input levels would grow forever; the
driver asserts progress stops within ``max_rounds`` and raises (a cycle
is a caller bug — run scc first and condense).

Reference parity: the reference (michaelleerilee/CCL) has no directed
scheduling pass; this extends the link-graph suite (SCC → condensation →
levels is the full directed-connectivity story).
"""

from __future__ import annotations

import numpy as np

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.state.shards import (
    apply_sparse_pieces,
    as_piece_list,
    reduce_routed_sparse,
    scatter_plans,
    shard_edges_csr,
    shard_vertices,
)


@ray.remote
def _init_levels(vids):
    return {"vids": vids, "level": np.zeros(len(vids), np.int64)}


@ray.remote
def _scatter_levels(plan, state, dirty, P, fanout):
    pieces = reduce_routed_sparse(plan, state["level"] + 1, dirty, np.maximum, P)
    if fanout:
        return pieces[0] if P == 1 else tuple(pieces)
    return pieces


@ray.remote(num_returns=3)
def _apply_levels(q, grouped, state, *msg_objs):
    pieces = [m[q] for m in msg_objs] if grouped else list(msg_objs)
    st = dict(state)
    vids = st["vids"]
    if len(vids) == 0:
        return st, 0, np.zeros(0, dtype=bool)
    new, changed = apply_sparse_pieces(vids, st["level"], pieces, np.maximum)
    if changed.any():
        out = st["level"].copy()
        out[changed] = new[changed]
        st["level"] = out
    return st, int(changed.sum()), changed


@ray.remote
def _levels_table(state):
    import pyarrow as pa

    return pa.table(
        {"vid": pa.array(state["vids"]), "level": pa.array(state["level"])}
    )


def dag_levels(
    edges,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 100_000,
):
    """(labels Dataset (vid, level), depth, waves) for a DIRECTED ACYCLIC
    edge Dataset. Raises on a cycle (progress past ``max_rounds`` waves).
    Self-loops are rejected the same way (a self-loop IS a cycle)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    vid_refs = shard_vertices(edges, P, vertices_ds=vertices,
                              src_col=src_col, dst_col=dst_col)
    csr = shard_edges_csr(edges, P, symmetrize=False, dedupe=True,
                          drop_self=False, src_col=src_col, dst_col=dst_col)
    plans = scatter_plans(csr, vid_refs, P)

    vids_local = ray.get(vid_refs)
    n_verts = sum(len(v) for v in vids_local)
    # a DAG's depth is < |V|, so any run past |V| waves proves a cycle
    limit = min(max_rounds, n_verts + 1)
    states = [_init_levels.remote(v) for v in vid_refs]
    dirty = [ray.put(np.ones(len(v), dtype=bool)) for v in vids_local]
    waves = 0
    while True:
        if waves >= limit:
            raise ValueError(
                f"dag_levels: no fixpoint after {waves} waves — input has a cycle"
            )
        if grouped:
            outs = [
                _scatter_levels.remote(plans[p], states[p], dirty[p], P, False)
                for p in range(P)
            ]
            res = [
                _apply_levels.remote(q, True, states[q], *outs) for q in range(P)
            ]
        else:
            outs = [
                as_piece_list(
                    _scatter_levels.options(num_returns=P).remote(
                        plans[p], states[p], dirty[p], P, True
                    ),
                    P,
                )
                for p in range(P)
            ]
            res = [
                _apply_levels.remote(q, False, states[q], *[outs[p][q] for p in range(P)])
                for q in range(P)
            ]
        states = [r[0] for r in res]
        dirty = [r[2] for r in res]
        waves += 1
        if sum(ray.get([r[1] for r in res])) == 0:
            break

    import ray.data as rd

    tables = ray.get([_levels_table.remote(s) for s in states])
    labels = rd.from_arrow(tables)
    depth = max((int(t.column("level").to_numpy().max()) for t in tables
                 if t.num_rows), default=0)
    return labels, depth, waves


@ray.remote
def _init_reach(vids, seed_vids):
    r = np.zeros(len(vids), np.int64)
    if len(seed_vids) and len(vids):
        idx = np.searchsorted(vids, seed_vids)
        ok = (idx < len(vids)) & (vids[np.minimum(idx, len(vids) - 1)] == seed_vids)
        r[idx[ok]] = 1
    return {"vids": vids, "level": r}


@ray.remote
def _seed_mask(state):
    return state["level"] > 0


@ray.remote
def _scatter_reach(plan, state, dirty, P, fanout):
    """Ship constant-1 indicators from the dirty (newly reached) frontier —
    values stay in {0,1}, so the maximum-combine fixpoint exists on ANY
    graph (unlike the +1 level relaxation, which diverges on cycles)."""
    ones = np.ones(len(state["vids"]), np.int64)
    pieces = reduce_routed_sparse(plan, ones, dirty, np.maximum, P)
    if fanout:
        return pieces[0] if P == 1 else tuple(pieces)
    return pieces


def reachable_from(
    edges,
    seeds,
    *,
    vertices=None,
    cfg: EngineConfig | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """(labels Dataset (vid, reached int64 0/1), n_reached, waves): forward
    reachability closure from a seed set on a DIRECTED edge Dataset —
    indicator-OR propagation to fixpoint on the dag_levels sparse-frontier
    machinery (constant-1 scatter + maximum combine == OR), converging on
    ANY graph, cyclic included, in eccentricity(seeds) waves of
    O(frontier edges) each. Wave 0 frontier = the seeds only.

    ``seeds``: Dataset with a ``vid`` column (vids not in the graph are
    ignored; seeds themselves count as reached).
    """
    import ray.data as rd

    from ccl_ray.state.shards import as_arrow_block, part_of

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    grouped = cfg.exchange == "grouped"

    vid_refs = shard_vertices(edges, P, vertices_ds=vertices,
                              src_col=src_col, dst_col=dst_col)
    csr = shard_edges_csr(edges, P, symmetrize=False, dedupe=True,
                          drop_self=False, src_col=src_col, dst_col=dst_col)
    plans = scatter_plans(csr, vid_refs, P)

    # route seed vids to owning shards (tiny -- seed cardinality)
    seed_parts: list[list[np.ndarray]] = [[] for _ in range(P)]
    for blk in ray.get(seeds.to_arrow_refs()):
        t = as_arrow_block(blk)
        # zero-row blocks downstream of a join can carry an EMPTY schema
        if t.num_rows == 0 or "vid" not in t.column_names:
            continue
        v = np.unique(t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64))
        parts = part_of(v, P)
        for p in range(P):
            seed_parts[p].append(v[parts == p])
    seed_refs = [
        ray.put(np.unique(np.concatenate(sp)) if sp else np.empty(0, np.int64))
        for sp in seed_parts
    ]

    states = [_init_reach.remote(vid_refs[p], seed_refs[p]) for p in range(P)]
    dirty = [_seed_mask.remote(s) for s in states]
    waves = 0
    while True:
        if grouped:
            outs = [
                _scatter_reach.remote(plans[p], states[p], dirty[p], P, False)
                for p in range(P)
            ]
            res = [_apply_levels.remote(q, True, states[q], *outs) for q in range(P)]
        else:
            outs = [
                as_piece_list(
                    _scatter_reach.options(num_returns=P).remote(
                        plans[p], states[p], dirty[p], P, True
                    ),
                    P,
                )
                for p in range(P)
            ]
            res = [
                _apply_levels.remote(q, False, states[q], *[outs[p][q] for p in range(P)])
                for q in range(P)
            ]
        states = [r[0] for r in res]
        dirty = [r[2] for r in res]
        waves += 1
        if sum(ray.get([r[1] for r in res])) == 0:
            break

    tables = ray.get([_levels_table.remote(s) for s in states])
    labels = rd.from_arrow(tables).map_batches(
        lambda t: t.rename_columns(["vid", "reached"]), batch_format="pyarrow"
    )
    n_reached = sum(
        int(t.column("level").to_numpy().sum()) for t in tables if t.num_rows
    )
    return labels, n_reached, waves


def bowtie_regions(
    directed,
    labels,
    *,
    vertices,
    cfg: EngineConfig | None = None,
    num_partitions: int | None = None,
):
    """Broder bow-tie decomposition of a directed graph (Broder et al. 2000,
    "Graph structure in the Web"): Dataset ``(vid, region)`` with region in
    {core, in, out, tube, tendril_in, tendril_out, disc}.

    - core: the largest SCC (ties broken by min canonical label);
    - in:   reaches core (not core);   out: reached from core (not core);
    - tube: reachable from IN and reaches OUT without touching core (any
      core-passing path would put the vertex in OUT, so the exclusion is
      implied — no path filtering needed);
    - tendril_in / tendril_out: exactly one of the two; disc: neither.

    ``labels`` is an SCC labeling Dataset ``(vid, label)`` covering every
    vertex in ``vertices`` (stages/scc output). Distributed shape: one
    |SCC|-bounded size aggregate picks core, then FOUR reachability
    closures (reachable_from — sparse-frontier indicator-OR, each wave
    O(frontier edges); the two backward ones just swap src/dst column
    names) and a chain of |V|-sized hash-partitioned joins assemble the
    per-vertex indicators; classification is one vectorized numpy
    where-chain per batch. Nothing driver-side exceeds one row.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd  # noqa: F401

    from ccl_ray.stages.aggregates import partial_sum_agg
    from ccl_ray.stages.exchange import hash_join

    cfg = cfg or EngineConfig()

    sizes = partial_sum_agg(labels, ["label"], {}, count_as="n")
    top = sizes.sort(["n", "label"], descending=[True, False]).limit(1).take_all()
    core_label = int(top[0]["label"])

    def _core_vids(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t.column("label"), core_label))
        return pa.table({"vid": keep.column("vid").cast(pa.int64())})

    core = labels.map_batches(_core_vids, batch_format="pyarrow").materialize()

    fwd, _, _ = reachable_from(directed, core, vertices=vertices, cfg=cfg)
    bwd, _, _ = reachable_from(
        directed, core, vertices=vertices, cfg=cfg, src_col="dst", dst_col="src"
    )
    fwd = fwd.materialize()
    bwd = bwd.materialize()

    def _seed_set(reach_ds):
        # reached==1 minus core — the |V|-sized sides co-partition on vid
        lab_j = labels.map_batches(
            lambda t: pa.table(
                {"jv": t.column("vid").cast(pa.int64()), "label": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        j = hash_join(
            reach_ds, lab_j, left_on="vid", right_on="jv",
            num_partitions=num_partitions,
        )

        def pick(t: pa.Table) -> pa.Table:
            r = t.column("reached").to_numpy(zero_copy_only=False).astype(np.int64)
            lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
            v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"vid": pa.array(v[(r == 1) & (lab != core_label)])})

        return j.map_batches(pick, batch_format="pyarrow").materialize()

    in_seeds = _seed_set(bwd)
    out_seeds = _seed_set(fwd)

    rin, _, _ = reachable_from(directed, in_seeds, vertices=vertices, cfg=cfg)
    rout, _, _ = reachable_from(
        directed, out_seeds, vertices=vertices, cfg=cfg,
        src_col="dst", dst_col="src",
    )

    cur = labels
    for name, ds in (("f", fwd), ("b", bwd), ("ri", rin), ("ro", rout)):
        ind = ds.map_batches(
            lambda t, n=name: pa.table(
                {f"j{n}": t.column("vid").cast(pa.int64()), n: t.column("reached")}
            ),
            batch_format="pyarrow",
        )
        cur = hash_join(
            cur, ind, left_on="vid", right_on=f"j{name}",
            num_partitions=num_partitions,
        )

    def classify(t: pa.Table) -> pa.Table:
        def col(n):
            return t.column(n).to_numpy(zero_copy_only=False).astype(np.int64)

        lab, f, b, ri, ro = col("label"), col("f"), col("b"), col("ri"), col("ro")
        region = np.where(
            lab == core_label, "core",
            np.where(
                b == 1, "in",
                np.where(
                    f == 1, "out",
                    np.where(
                        (ri == 1) & (ro == 1), "tube",
                        np.where(
                            ri == 1, "tendril_in",
                            np.where(ro == 1, "tendril_out", "disc"),
                        ),
                    ),
                ),
            ),
        )
        return pa.table(
            {"vid": pa.array(col("vid")), "region": pa.array(region, pa.string())}
        )

    return cur.map_batches(classify, batch_format="pyarrow")
