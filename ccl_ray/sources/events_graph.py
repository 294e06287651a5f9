"""Events → graph adapter (driver-contract tables, TESTDATA.md).

Mirrors the transcripts derivation on the `events` table so every graph
operator has a DuckDB-checkable oracle over the provided test data:

- vertices = events (vid = event_id)
- adjacency edges (etype 0): consecutive events of the same user, ordered
  by (ts, event_id) — the analog of turn adjacency within a conversation
- co-occurrence edges (etype 1): events sharing (event_type, hour bucket),
  star-expanded to the group's min event_id — the analog of shared-tool
  co-occurrence

Both rules are chosen to be exactly expressible in ANSI SQL (window lag /
group-min) so __ray_entry__.oracle_sql can verify them value-for-value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _edge_table(src: np.ndarray, dst: np.ndarray, etype: int) -> pa.Table:
    """Arrow out (even when empty): shuffle stages must see one block type."""
    n = len(src)
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "etype": pa.array(np.full(n, etype, dtype=np.int32)),
            "w": pa.array(np.ones(n, dtype=np.float64)),
        }
    )


def read_events(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )


def adjacency_edges(events: "rd.Dataset", *, num_partitions: int | None = None) -> "rd.Dataset":
    """(src,dst) = consecutive events per user by (ts, event_id); src<dst canonical.

    Partition-grouped: users route by hash(user_id) % P and each partition
    handles ALL its users in one lexsort pass — a per-user map_groups would
    pay a Python round-trip per user (100k+ groups at sf0.1; billions at
    10^12-turn scale).
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import stable_hash64_np

    P = resolve_partitions(num_partitions)

    def route(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        part = (stable_hash64_np(u.view(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "part": pa.array(part),
            }
        )

    def adj_part(df: pd.DataFrame) -> pa.Table:
        if len(df) < 2:
            return _edge_table(np.empty(0, np.int64), np.empty(0, np.int64), 0)
        e = df["event_id"].values.astype(np.int64)
        u = df["user_id"].values.astype(np.int64)
        ts = df["ts"].values
        order = np.lexsort((e, ts.astype("datetime64[us]").astype(np.int64), u))
        e, u = e[order], u[order]
        same = u[1:] == u[:-1]
        a, b = e[:-1][same], e[1:][same]
        return _edge_table(np.minimum(a, b), np.maximum(a, b), 0)

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(adj_part, batch_format="pandas")
    )


# SQL-expressible skew salt: sub-stars are per (event_type, hour, event_id %
# EVENT_SALTS), then one tiny chain over the salt-hub minima reconnects the
# group — a hot (event_type, hour) bucket is never regrouped whole into one
# task. Components are invariant (chain keeps each bucket connected); the
# oracle uses the identical `event_id % EVENT_SALTS` rule.
EVENT_SALTS = 8


def cooccurrence_edges(events: "rd.Dataset", *, num_partitions: int | None = None) -> "rd.Dataset":
    """Salted star edges within (event_type, hour(ts), salt) + salt-hub chain.

    Both passes are partition-grouped (hash of the group key % P, one
    vectorized lexsort pass per partition) — a per-bucket map_groups costs
    a Python round-trip per (type, hour, salt) bucket (~30k at sf0.1).
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import stable_hash64_np

    P = resolve_partitions(num_partitions)

    def key(batch: pa.Table) -> pa.Table:
        hr = pc.floor_temporal(batch.column("ts"), unit="hour")
        eid = batch.column("event_id").cast(pa.int64())
        hr_us = hr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch.column("event_type")
        from ccl_ray.functions.hashing import hash_strings_np

        with np.errstate(over="ignore"):
            gkey = hash_strings_np(et.to_numpy(zero_copy_only=False)) * np.uint64(
                1099511628211
            ) + hr_us.view(np.uint64)
        part = (stable_hash64_np(gkey) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "event_id": eid,
                "event_type": et,
                "hr": hr,
                "salt": pc.bit_wise_and(eid, EVENT_SALTS - 1),  # == % for 2^k
                "part": pa.array(part),
            }
        )

    def stars_part(df: pd.DataFrame) -> pa.Table:
        if len(df) < 2:
            return _edge_table(np.empty(0, np.int64), np.empty(0, np.int64), 1)
        e = df["event_id"].values.astype(np.int64)
        hr = df["hr"].values.astype("datetime64[us]").astype(np.int64)
        salt = df["salt"].values.astype(np.int64)
        et = df["event_type"].values
        # vectorized per-bucket star: sort by (type, hr, salt, event_id);
        # each row after a bucket's first links to the bucket min (ffill of
        # the bucket-start event_id via maximum.accumulate on start indices)
        order = np.lexsort((e, salt, hr, et))
        e, hr, salt, et = e[order], hr[order], salt[order], et[order]
        n = len(e)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (et[1:] != et[:-1]) | (hr[1:] != hr[:-1]) | (salt[1:] != salt[:-1])
        start_idx = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        hub = e[start_idx]
        member = ~new
        return _edge_table(hub[member], e[member], 1)

    keyed = events.map_batches(key, batch_format="pyarrow")
    stars = keyed.groupby("part").map_groups(stars_part, batch_format="pandas")

    # chain the salt-hub minima per (event_type, hr): pre-reduced to one row
    # per (event_type, hr, salt) so the regroup is tiny (no skew
    # re-concentration); the per-(type,hr) chain pass is equally vectorized
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    hubs = partitioned_groupby_agg(
        keyed, ["event_type", "hr", "salt"], {"mn": ("event_id", "min")}
    )

    def chains_all(df: pd.DataFrame) -> pa.Table:
        if len(df) < 2:
            return _edge_table(np.empty(0, np.int64), np.empty(0, np.int64), 1)
        mn = df["mn"].values.astype(np.int64)
        hr = df["hr"].values.astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].values
        order = np.lexsort((mn, hr, et))
        mn, hr, et = mn[order], hr[order], et[order]
        same = (et[1:] == et[:-1]) & (hr[1:] == hr[:-1])
        return _edge_table(mn[:-1][same], mn[1:][same], 1)

    # the hub table is tiny (types × hours × salts rows) — one pass over the
    # whole table (batch_size=None → entire block; a default-sized batch
    # split would lose chain edges at batch boundaries)
    chains = hubs.repartition(1).map_batches(chains_all, batch_format="pandas", batch_size=None)
    return stars.union(chains)


def build_event_edges(sf_dir: str) -> "rd.Dataset":
    """Materialized: nearly every consumer (CSR shards + vertex shards, or
    per-round truss rebuilds) reads the edge Dataset more than once, and an
    unmaterialized build would re-run both derivations per consumer."""
    ev = read_events(sf_dir)
    return adjacency_edges(ev).union(cooccurrence_edges(ev)).materialize()


def event_vertices(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).rename_columns(
        {"event_id": "vid"}
    )
