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


def adjacency_edges(events: "rd.Dataset") -> "rd.Dataset":
    """(src,dst) = consecutive events per user by (ts, event_id); src<dst canonical."""

    def adj(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["ts", "event_id"])
        e = df["event_id"].values.astype(np.int64)
        a, b = (e[:-1], e[1:]) if len(e) > 1 else (e[:0], e[:0])
        return _edge_table(np.minimum(a, b), np.maximum(a, b), 0)

    return events.groupby("user_id").map_groups(adj, batch_format="pandas")


# SQL-expressible skew salt: sub-stars are per (event_type, hour, event_id %
# EVENT_SALTS), then one tiny chain over the salt-hub minima reconnects the
# group — a hot (event_type, hour) bucket is never regrouped whole into one
# task. Components are invariant (chain keeps each bucket connected); the
# oracle uses the identical `event_id % EVENT_SALTS` rule.
EVENT_SALTS = 8


def cooccurrence_edges(events: "rd.Dataset") -> "rd.Dataset":
    """Salted star edges within (event_type, hour(ts), salt) + salt-hub chain."""

    def key(batch: pa.Table) -> pa.Table:
        hr = pc.floor_temporal(batch.column("ts"), unit="hour")
        eid = batch.column("event_id").cast(pa.int64())
        return pa.table(
            {
                "event_id": eid,
                "event_type": batch.column("event_type"),
                "hr": hr,
                "salt": pc.bit_wise_and(eid, EVENT_SALTS - 1),  # == % for 2^k
            }
        )

    def star(df: pd.DataFrame) -> pa.Table:
        e = np.sort(df["event_id"].values.astype(np.int64))
        if len(e) < 2:
            return _edge_table(e[:0], e[:0], 1)
        return _edge_table(np.full(len(e) - 1, e[0]), e[1:], 1)

    keyed = events.map_batches(key, batch_format="pyarrow")
    stars = keyed.groupby(["event_type", "hr", "salt"]).map_groups(star, batch_format="pandas")

    # chain the salt-hub minima per (event_type, hr): pre-reduced to one row
    # per (event_type, hr, salt) so the regroup is tiny (no skew re-concentration)
    from ray.data.aggregate import Min

    hubs = keyed.groupby(["event_type", "hr", "salt"]).aggregate(Min("event_id", alias_name="mn"))

    def chain(df: pd.DataFrame) -> pa.Table:
        h = np.sort(df["mn"].values.astype(np.int64))
        if len(h) < 2:
            return _edge_table(h[:0], h[:0], 1)
        return _edge_table(h[:-1], h[1:], 1)

    chains = hubs.groupby(["event_type", "hr"]).map_groups(chain, batch_format="pandas")
    return stars.union(chains)


def build_event_edges(sf_dir: str) -> "rd.Dataset":
    ev = read_events(sf_dir)
    return adjacency_edges(ev).union(cooccurrence_edges(ev))


def event_vertices(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).rename_columns(
        {"event_id": "vid"}
    )
