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


def hopping_window(
    events: "rd.Dataset",
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    size_hours: int = 2,
    hop_hours: int = 1,
) -> "rd.Dataset":
    """Hopping (sliding) window aggregate: per (key, window start), the
    sum/count of events whose ts falls in [w_start, w_start + size).

    Each event belongs to size/hop consecutive windows, so the map stage
    EMITS size/hop rows per event (a per-batch Arrow explode — no shuffle
    amplification beyond the factor itself), then one partial-aggregated
    groupby does the rest. Sums rounded to 2 (fixed-point inputs).
    """
    assert size_hours % hop_hours == 0, "size must be a multiple of hop"
    n_win = size_hours // hop_hours
    hop_us = hop_hours * 3_600_000_000
    # resolve the key's Arrow type once from the input schema (the final
    # explicit output schema must not hardcode string — int keys are legal)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us  # floor to hop grid
        starts = (
            np.concatenate([base - h * hop_us for h in range(n_win)])
            if n
            else np.empty(0, np.int64)
        )
        keys_np = batch.column(key).to_numpy(zero_copy_only=False)
        keys = np.concatenate([keys_np] * n_win) if n else keys_np
        vals_np = batch.column(val_col).to_numpy(zero_copy_only=False)
        vals = np.concatenate([vals_np] * n_win) if n else vals_np
        return pa.table(
            {
                key: pa.array(keys, key_type),
                "w_start": pa.array(starts).cast(pa.timestamp("us")),
                val_col: pa.array(vals, pa.float64()),
            }
        )

    from ccl_ray.stages.aggregates import partial_sum_agg

    agg = partial_sum_agg(
        events.map_batches(explode, batch_format="pyarrow"),
        [key, "w_start"],
        {val_col: "sum_value"},
        count_as="n_events",
    )

    def rnd(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df.assign(sum_value=df["sum_value"].round(2)),
            schema=pa.schema(
                [
                    (key, key_type),
                    ("w_start", pa.timestamp("us")),
                    ("sum_value", pa.float64()),
                    ("n_events", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    return agg.map_batches(rnd, batch_format="pandas")


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
        # Infer the key type from ONE REAL ROW (map_groups groups are never
        # empty): a zero-row object column would infer the null type and
        # make the cast below crash for string keys.
        key_type = pa.Table.from_pandas(df[[key]].head(1), preserve_index=False).schema.field(key).type
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
