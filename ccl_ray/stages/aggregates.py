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
from ray.data.aggregate import Count, Max, Min


def to_arrow_blocks(ds: "rd.Dataset") -> "rd.Dataset":
    """Normalize block type to Arrow (groupby.aggregate emits pandas blocks;
    unioning those with Arrow blocks breaks Ray's sort sampling)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def partitioned_groupby_agg(
    ds: "rd.Dataset",
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """groupby(keys) as a partition-grouped vectorized reduce.

    ``spec``: {out_col: (in_col, op)} with op in {"sum", "min", "max",
    "count"}. Rows are routed by ``hash(keys) % P`` and each of the P
    partitions runs ONE vectorized pandas groupby — Ray's native
    ``groupby().aggregate()`` walks group boundaries in Python (measured
    ~30k groups/s: 36 s for a 1M-component label space at 16 CPUs), so any
    groupby whose key cardinality grows with the data must come through
    here instead. Same shuffle shape as exchange.hash_join (proven ~1M
    rows/s/CPU on the sort by the P-valued part column).
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy(deep=False)
        df["__part"] = (h % np.uint64(P)).astype(np.int32)
        return df

    def final(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, op) in spec.items():
            cols[out] = g.size() if op == "count" else g[col].agg(op)
        out_df = pd.DataFrame(cols).reset_index()
        # Arrow out: every stage feeding a shuffle emits Arrow blocks —
        # mixing pandas and Arrow blocks breaks Ray's sort sampling
        return pa.Table.from_pandas(out_df, preserve_index=False)

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(final, batch_format="pandas")
    )


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
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    spec = {out: (out, "sum") for out in sums.values()}
    if count_as:
        spec[count_as] = (count_as, "sum")
    return partitioned_groupby_agg(partials, keys, spec)


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


# see relabel._LABEL_BROADCAST_LIMIT — same rationale: keep-sets up to this
# many labels broadcast as a set; above it a distributed left-outer
# semi-join runs so the driver never materializes the label space.
_KEEP_BROADCAST_LIMIT = 2_000_000


def dust_filter(
    labels: "rd.Dataset", min_size: int, *, broadcast_limit: int = _KEEP_BROADCAST_LIMIT
) -> "rd.Dataset":
    """Zero-out members of small components (reference semantics: label -> 0).

    Returns (vid, label) with dust labels rewritten to 0 — the reference's
    background value (ccl_marker_stack.py:918-926). Caveat: if vid 0 exists,
    its component's canonical label is also 0; callers needing an
    unambiguous sentinel should offset their vid space (transcript vids
    always do). Keep-sets above ``broadcast_limit`` labels run as a
    distributed left-outer semi-join instead of a driver-built set.
    """
    import ray

    keep_ds = to_arrow_blocks(
        component_sizes(labels, min_size).select_columns(["label"])
    ).materialize()

    if keep_ds.count() > broadcast_limit:
        from ccl_ray.stages.exchange import hash_join

        marked = keep_ds.map_batches(
            lambda t: pa.table(
                {
                    "__keep_lab": t.column("label").cast(pa.int64()),
                    "__keep": pa.array(np.ones(t.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(labels, marked, left_on="label", right_on="__keep_lab",
                           how="left outer")

        def zero(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lab = batch.column("label")
            kept = pc.if_else(
                pc.is_valid(batch.column("__keep")), lab, pa.scalar(0, lab.type)
            )
            cols = {n: batch.column(n) for n in batch.column_names if n != "__keep"}
            cols["label"] = kept
            return pa.table(cols)

        return joined.map_batches(zero, batch_format="pyarrow")

    ref = ray.put(set(keep_ds.to_pandas()["label"].tolist()))

    class Zero:
        def __init__(self):
            self.keep = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["label"] = df["label"].where(df["label"].isin(self.keep), 0)
            return df

    return labels.map_batches(Zero, batch_format="pandas", concurrency=(1, 4), max_restarts=0)


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
        deg = partitioned_groupby_agg(
            to_arrow_blocks(deg).union(zeros), ["vid"], {"degree": ("degree", "sum")}
        )
    return deg


def grouped_zscore(
    ds: "rd.Dataset",
    *,
    group_col: str,
    val_col: str,
    out_col: str = "z",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Per-group z-score: z = (x − mean_g) / stddev_pop_g, rounded to 6
    (0 where the group's deviation is 0) — the anomaly-flagging pass over
    an already-aggregated table (e.g. per-(type, hour) counts).

    Groups route by hash(group_col) % P; one vectorized pandas transform
    per partition handles all its groups. Input rows pass through with the
    z column appended."""
    import pyarrow as pa

    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = ds.schema()
    gtype = dict(zip(in_schema.names, in_schema.types))[group_col]
    out_fields = [(n, t) for n, t in zip(in_schema.names, in_schema.types)]
    out_schema = pa.schema(out_fields + [(out_col, pa.float64())])

    def route(batch: pa.Table) -> pa.Table:
        gcol = batch.column(group_col)
        return batch.append_column(
            "part", pa.array(hash_part_np(gcol, gtype, P))
        )

    def z_part(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["part"])
        if not len(df):
            return out_schema.empty_table()
        g = df.groupby(group_col)[val_col]
        m = g.transform("mean")
        sd = g.transform("std", ddof=0)
        z = np.where(sd.values > 0, (df[val_col].values - m.values) / sd.values, 0.0)
        df[out_col] = np.round(z, 6)
        return pa.Table.from_pandas(df, schema=out_schema, preserve_index=False)

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(z_part, batch_format="pandas")
    )


def degree_assortativity(edges: "rd.Dataset", *, cfg=None):
    """Degree assortativity coefficient (Pearson r of endpoint degrees over
    both orientations of every distinct undirected edge) as a 1-row Arrow
    table, rounded to 6.

    All moment sums (Σx, Σy, Σxy, Σx², Σy², m) are INTEGER-exact (degrees
    are ints), so task order cannot perturb the value — the only float
    arithmetic is the closed form evaluated once on the driver. Shape: one
    symmetric CSR shard build, the triangles stage's degree
    request/resolve wave (deg(dst) arrives partition-locally), one int64
    moment reduction per shard. No joins, no extra shuffles."""
    import ray

    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.triangles import _deg_request, _deg_resolve, _degrees
    from ccl_ray.state.shards import shard_edges_csr, shard_vertices

    cfg = cfg or EngineConfig()
    P = cfg.num_partitions
    csr = shard_edges_csr(edges, P, symmetrize=True, dedupe=True, drop_self=True)
    vid_refs = shard_vertices(edges, P)
    deg = [_degrees.remote(csr[p], vid_refs[p]) for p in range(P)]
    reqs = [
        _deg_request.options(num_returns=P).remote(csr[p], P) if P > 1
        else [_deg_request.remote(csr[p], P)]
        for p in range(P)
    ]
    reqs = [list(r) if P > 1 else r for r in reqs]
    resolved = [
        _deg_resolve.options(num_returns=P).remote(
            vid_refs[p], deg[p], P, *[reqs[q][p] for q in range(P)]
        ) if P > 1
        else [_deg_resolve.remote(vid_refs[p], deg[p], P, *[reqs[q][p] for q in range(P)])]
        for p in range(P)
    ]
    resolved = [list(r) if P > 1 else r for r in resolved]

    @ray.remote
    def _moments(csr_p, vids_p, deg_p, *resp_pieces):
        if csr_p["srcs"].size == 0:
            return np.zeros(6, np.int64)
        q = np.concatenate([r[0] for r in resp_pieces])
        qd = np.concatenate([r[1] for r in resp_pieces])
        order = np.argsort(q, kind="stable")
        q, qd = q[order], qd[order]
        x = np.repeat(deg_p[np.searchsorted(vids_p, csr_p["srcs"])], csr_p["outdeg"])
        y = qd[np.searchsorted(q, csr_p["dst"])]
        return np.array(
            [len(x), x.sum(), y.sum(), (x * y).sum(), (x * x).sum(), (y * y).sum()],
            np.int64,
        )

    parts = ray.get([
        _moments.remote(csr[p], vid_refs[p], deg[p], *[resolved[q][p] for q in range(P)])
        for p in range(P)
    ])
    m, sx, sy, sxy, sxx, syy = (float(v) for v in np.sum(parts, axis=0))
    if m == 0:
        r = 0.0
    else:
        vx = sxx / m - (sx / m) * (sx / m)
        vy = syy / m - (sy / m) * (sy / m)
        r = 0.0 if vx <= 0 or vy <= 0 else (
            (sxy / m - (sx / m) * (sy / m)) / (np.sqrt(vx) * np.sqrt(vy))
        )
    return pa.table({"assortativity": pa.array([round(float(r), 6)], pa.float64())})


def grouped_quantiles(
    ds: "rd.Dataset",
    *,
    group_col: str,
    val_col: str,
    quantiles: tuple = (0.5, 0.9),
    out_cols: tuple = ("med", "p90"),
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Exact per-group linear-interpolation quantiles (the SQL
    ``quantile_cont`` formula — identical to numpy 'linear'), rounded to 6.

    Groups route by hash(group_col) % P; each partition sorts its groups
    once and evaluates all requested quantiles vectorized. A group's values
    fit one task — the same contract as sessionize (per-key state)."""
    import pyarrow as pa

    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = ds.schema()
    gtype = dict(zip(in_schema.names, in_schema.types))[group_col]
    out_schema = pa.schema(
        [(group_col, gtype)] + [(c, pa.float64()) for c in out_cols]
    )

    def route(batch: pa.Table) -> pa.Table:
        gcol = batch.column(group_col)
        return pa.table(
            {
                group_col: gcol,
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(gcol, gtype, P)),
            }
        )

    def q_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        q = (
            df.groupby(group_col, sort=True)[val_col]
            .quantile(list(quantiles), interpolation="linear")
            .unstack()
        )
        out = {group_col: q.index.values}
        for c, p in zip(out_cols, quantiles):
            out[c] = np.round(q[p].values.astype(np.float64), 6)
        return pa.Table.from_pydict(out, schema=out_schema)

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(q_part, batch_format="pandas")
    )


def modularity(
    edges: "rd.Dataset",
    communities: "rd.Dataset",
    *,
    num_partitions: int | None = None,
) -> pa.Table:
    """Newman modularity Q of the vertex partition ``communities``
    (vid, community) over the simple undirected loop-free graph of
    ``edges`` (canonicalized min→max + deduped here):

        Q = intra/m − Σ_c d_c² / (4 m²)

    m = #distinct undirected edges, intra = #edges whose endpoints share a
    community, d_c = Σ degree over community c. Every partial is
    INTEGER-exact — the squared community-degree sum is accumulated in
    Python ints per block (arbitrary precision, no int64 overflow at any
    scale) and shipped as strings — so the single float expression at the
    end evaluates in the same operation order as the SQL oracle
    (community-quality analog of the reference's per-component aggregates,
    ccl_marker_stack.py:904-930). Distributed shape: one edge dedupe, two
    hash joins (community resolve per endpoint), degree + per-community
    sum partials; the driver only ever sees P-bounded scalar partials.

    Returns a 1-row Arrow table (m, intra_edges, n_communities,
    modularity round 6)."""
    from ccl_ray.stages.exchange import hash_join

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d))}
        )

    canon_e = (
        partial_sum_agg(
            edges.select_columns(["src", "dst"]).map_batches(canon, batch_format="pyarrow"),
            ["a", "b"], {}, count_as="_n",
        )
        .select_columns(["a", "b"])
        .materialize()
    )
    m = canon_e.count()
    nc = partial_sum_agg(
        communities.select_columns(["community"]), ["community"], {}, count_as="_n"
    ).count()
    if m == 0:
        # no edges → both Q terms are 0; skip the joins entirely (an
        # all-empty dataset downstream of map_batches has no schema to join)
        return pa.table(
            {
                "m": pa.array([0], pa.int64()),
                "intra_edges": pa.array([0], pa.int64()),
                "n_communities": pa.array([nc], pa.int64()),
                "modularity": pa.array([0.0], pa.float64()),
            }
        )

    ca = communities.rename_columns({"vid": "av", "community": "ca"})
    cb = communities.rename_columns({"vid": "bv", "community": "cb"})
    j2 = hash_join(
        hash_join(canon_e, ca, left_on="a", right_on="av",
                  num_partitions=num_partitions),
        cb, left_on="b", right_on="bv", num_partitions=num_partitions,
    )

    def intra_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eq = pc.sum(pc.cast(pc.equal(batch.column("ca"), batch.column("cb")),
                            pa.int64())).as_py()
        return pa.table({"n": pa.array([int(eq or 0)], pa.int64())})

    intra = int(
        j2.map_batches(intra_part, batch_format="pyarrow").to_pandas()["n"].sum()
    )

    deg = degrees(canon_e.rename_columns({"a": "src", "b": "dst"}))
    jd = hash_join(
        deg, communities.rename_columns({"vid": "dv"}),
        left_on="vid", right_on="dv", num_partitions=num_partitions,
    )
    # d_c per community of the PARTITION (a community of isolated vertices
    # still counts toward nc above; it contributes 0 to both Q terms)
    dc = partial_sum_agg(
        jd.select_columns(["community", "degree"]), ["community"], {"degree": "d_c"}
    ).materialize()

    def s2_part(df: pd.DataFrame) -> pa.Table:
        v = df["d_c"].to_numpy().astype(object)
        return pa.table({"s2": pa.array([str(int((v * v).sum()) if len(v) else 0)],
                                        pa.string())})

    s2 = sum(
        int(x) for x in
        dc.map_batches(s2_part, batch_format="pandas").to_pandas()["s2"]
    )

    q = 0.0 if m == 0 else round(intra / m - s2 / (4.0 * m * m), 6)
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "intra_edges": pa.array([intra], pa.int64()),
            "n_communities": pa.array([nc], pa.int64()),
            "modularity": pa.array([q], pa.float64()),
        }
    )


def rollup_sum(
    ds: "rd.Dataset",
    keys: list[str],
    sums: dict[str, str],
    *,
    count_as: str | None = None,
    all_token: str = "ALL",
) -> "rd.Dataset":
    """GROUP BY ROLLUP(keys): every prefix grouping set, rolled-up key
    columns carrying ``all_token`` (a sentinel instead of SQL's NULL so the
    output is unambiguous when real keys can be null).

    Scale shape: the fact table is aggregated ONCE at the finest
    granularity (partial_sum_agg — per-batch combiner, one key exchange);
    every coarser level is re-aggregated from the FINEST AGGREGATE, whose
    cardinality is the distinct key-combination count — for rollup-shaped
    keys (low-cardinality dimensions) that is orders of magnitude below
    the fact rows, so the cascade is a single tiny block. Never aggregate
    the fact table once per level.
    """
    val_cols = list(sums.values()) + ([count_as] if count_as else [])
    finest = partial_sum_agg(ds, keys, sums, count_as=count_as)

    def cascade(df: pd.DataFrame) -> pd.DataFrame:
        levels = [df[keys + val_cols]]
        cur = df
        for i in range(len(keys) - 1, -1, -1):
            cur = cur.copy()
            cur[keys[i]] = all_token
            grouped = (
                cur.groupby(keys, sort=False, dropna=False)[val_cols].sum().reset_index()
            )
            levels.append(grouped[keys + val_cols])
            cur = grouped
        return pd.concat(levels, ignore_index=True)

    return finest.repartition(1).map_batches(cascade, batch_format="pandas")


def cube_sum(
    ds: "rd.Dataset",
    keys: list[str],
    sums: dict[str, str],
    *,
    count_as: str | None = None,
    all_token: str = "ALL",
) -> "rd.Dataset":
    """GROUP BY CUBE(keys): every one of the 2^k grouping sets, rolled-up
    key columns carrying ``all_token`` (the rollup_sum sentinel contract).

    Same scale shape as rollup_sum: the fact table aggregates ONCE at the
    finest granularity; all coarser sets re-aggregate from that tiny
    finest aggregate (cardinality = distinct key combinations), so the
    2^k fan-out never touches fact rows."""
    import itertools

    import pandas as pd

    val_cols = list(sums.values()) + ([count_as] if count_as else [])
    finest = partial_sum_agg(ds, keys, sums, count_as=count_as)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        levels = [df[keys + val_cols]]
        for r in range(len(keys)):
            for kept in itertools.combinations(keys, r):
                cur = df.copy()
                for c in keys:
                    if c not in kept:
                        cur[c] = all_token
                grouped = (
                    cur.groupby(keys, sort=False, dropna=False)[val_cols]
                    .sum()
                    .reset_index()
                )
                levels.append(grouped[keys + val_cols])
        return pd.concat(levels, ignore_index=True)

    return finest.repartition(1).map_batches(expand, batch_format="pandas")
