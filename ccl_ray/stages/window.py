"""Stream-shaped operators over an ordered, partitioned log.

Ray Data has no event-time windows/watermarks (SURVEY.md §2.9: neither does
the reference); windows are expressed as groupby(key) + per-group pandas
over the sorted group, with the ordering assumption stated here: events of
one key fit one group and are processed in (ts, event_id) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def sessionize(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> "rd.Dataset":
    """Gap-based session windows per key.

    Returns (key, session_idx, n_events, t_start, t_end): a new session
    starts when the gap to the previous event of the same key exceeds
    ``gap_minutes``. session_idx is 1-based in (ts, id) order.
    """
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def per_key(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([ts_col, id_col])
        ts = df[ts_col].values
        brk = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            brk[1:] = (np.diff(ts) > gap).astype(np.int64)
        sess = np.cumsum(brk)
        g = pd.DataFrame({key: df[key].values, "session_idx": sess, ts_col: ts}).groupby(
            [key, "session_idx"], sort=False
        )
        out = g.agg(n_events=(ts_col, "size"), t_start=(ts_col, "min"), t_end=(ts_col, "max"))
        out = out.reset_index()
        # Explicit Arrow schema: the driver's value-hash does NOT normalize
        # dtypes, so emit exactly what the SQL oracle emits — int64 counters
        # and timestamp[us] (from_pandas would default to timestamp[ns]).
        key_type = pa.Table.from_pandas(df[[key]].head(0), preserve_index=False).schema.field(key).type
        schema = pa.schema(
            [
                (key, key_type),
                ("session_idx", pa.int64()),
                ("n_events", pa.int64()),
                ("t_start", pa.timestamp("us")),
                ("t_end", pa.timestamp("us")),
            ]
        )
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return events.groupby(key).map_groups(per_key, batch_format="pandas")
