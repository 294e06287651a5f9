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


def cooccurrence_edges(events: "rd.Dataset") -> "rd.Dataset":
    """Star edges within (event_type, hour(ts)) groups: (min event_id) -> others."""

    def key(batch: pa.Table) -> pa.Table:
        hr = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "hr": hr,
            }
        )

    def star(df: pd.DataFrame) -> pa.Table:
        e = np.sort(df["event_id"].values.astype(np.int64))
        if len(e) < 2:
            return _edge_table(e[:0], e[:0], 1)
        return _edge_table(np.full(len(e) - 1, e[0]), e[1:], 1)

    return (
        events.map_batches(key, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .map_groups(star, batch_format="pandas")
    )


def build_event_edges(sf_dir: str) -> "rd.Dataset":
    ev = read_events(sf_dir)
    return adjacency_edges(ev).union(cooccurrence_edges(ev))


def event_vertices(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).rename_columns(
        {"event_id": "vid"}
    )
