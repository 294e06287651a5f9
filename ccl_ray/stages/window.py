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


def running_window(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Per-row window functions over a hash-partitioned, per-key ordered log
    (the SQL ``OVER (PARTITION BY key ORDER BY ts, id)`` family):

    - ``running_count`` — ROW_NUMBER per key
    - ``running_cents`` — cumulative sum of ``floor(val*100 + 0.5)`` as
      int64 (exact integer arithmetic: no float-summation-order hazard in
      the value hash; both sides compute the same half-up fixed-point)
    - ``delta_us`` — microseconds since the PREVIOUS row of the same key
      (LAG delta; null on each key's first row)

    Same shape as sessionize: rows route by hash(key) % P, then ONE
    vectorized lexsort + segment-cumsum pass per partition handles all its
    keys — no per-key Python round-trips, O(rows/P · log) per task.
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    id_type = dict(zip(in_schema.names, in_schema.types))[id_col]
    out_schema = pa.schema(
        [
            (id_col, id_type),
            (key, key_type),
            ("running_count", pa.int64()),
            ("running_cents", pa.int64()),
            ("delta_us", pa.int64()),
        ]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def run_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        ids = df[id_col].values
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        order = np.lexsort((ids, ts, kcodes))
        ts, ids, kcodes = ts[order], ids[order], kcodes[order]
        vals = df[val_col].values[order]
        n = len(ids)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = kcodes[1:] != kcodes[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        idx = np.arange(n)
        running_count = idx - key_start + 1
        vals = np.asarray(vals, np.float64)
        # a NaN here would become an undefined int64 and silently corrupt the
        # cumulative sum for every later row of the key — fail loudly instead
        assert not np.isnan(vals).any(), "running_window: null/NaN value rows"
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        csum = np.cumsum(cents)
        seg_base = csum[key_start] - cents[key_start]
        running_cents = csum - seg_base
        delta = np.empty(n, np.int64)
        delta[0] = 0
        delta[1:] = ts[1:] - ts[:-1]
        return pa.table(
            {
                id_col: pa.array(ids).cast(id_type),
                key: pa.array(df[key].values[order], key_type),
                "running_count": pa.array(running_count),
                "running_cents": pa.array(running_cents),
                "delta_us": pa.array(delta, pa.int64(), mask=new_key),
            }
        )

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(run_part, batch_format="pandas")
    )


def ema_scan(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    alpha: float = 0.5,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Per-key exponential moving average in (ts, id) order — the linear
    recurrence y_i = α·x_i + (1−α)·y_{i−1} with y_1 = x_1 (the stateful
    ordered scan SQL can only express as a recursive CTE).

    Shape: rows route by hash(key) % P like running_window, then the
    per-partition kernel runs the recurrence SEQUENTIALLY IN POSITION and
    VECTORIZED ACROSS KEYS: rows bucket by their within-key position (one
    stable argsort), and step k updates every key's k-th row in one numpy
    gather/scatter — in the (key, ts, id) lexsorted layout the previous row
    of the same key is literally index r−1. O(rows/P) vector work +
    max-segment-length tiny steps per task; the float op order is exactly
    the SQL recursion's (no reassociation), so rounded values hash-match.
    Output: (id, key, ema) with ema rounded to 1e-6.
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    id_type = dict(zip(in_schema.names, in_schema.types))[id_col]
    out_schema = pa.schema([(id_col, id_type), (key, key_type), ("ema", pa.float64())])

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    a, b = float(alpha), 1.0 - float(alpha)

    def run_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        ids = df[id_col].values
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        order = np.lexsort((ids, ts, kcodes))
        ids, kcodes = ids[order], kcodes[order]
        x = np.asarray(df[val_col].values[order], np.float64)
        assert not np.isnan(x).any(), "ema_scan: null/NaN value rows"
        n = len(ids)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = kcodes[1:] != kcodes[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        pos = np.arange(n) - key_start
        by_pos = np.argsort(pos, kind="stable")
        counts = np.bincount(pos)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        y = np.empty(n, np.float64)
        first = by_pos[: offsets[1]]
        y[first] = x[first]
        for kk in range(1, len(counts)):
            rk = by_pos[offsets[kk]: offsets[kk + 1]]
            y[rk] = a * x[rk] + b * y[rk - 1]
        return pa.table(
            {
                id_col: pa.array(ids).cast(id_type),
                key: pa.array(df[key].values[order], key_type),
                # half-AWAY-from-zero like SQL round(): α=½ EMAs are dyadic
                # rationals, so exact .5 ties at the 6th decimal are common
                # and np.round's half-to-even would drift from the twin
                "ema": pa.array(
                    np.copysign(np.floor(np.abs(y) * 1e6 + 0.5) / 1e6, y),
                    pa.float64(),
                ),
            }
        )

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(run_part, batch_format="pandas")
    )


def cusum_drift(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    total_sum: int = 0,
    total_n: int = 1,
    scale: int = 1_000_000,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Per-key CUSUM drift statistic, integer-exact: with vi =
    floor(value·scale) and global totals S = Σ vi, N = count(*), the drift
    of a key is max_k |Σ_{i≤k} (N·vi − S)| over its prefix in (ts, id)
    order — the classic change-detection scan (a key whose values sit
    above/below the corpus mean accumulates deviation linearly; N·vi − S
    avoids the mean division so BOTH sides stay exact integers and the
    value-hash cannot drift by an ulp).

    ``total_sum`` / ``total_n`` are the exact global integers (computed by
    the caller with one scalar aggregate — two ints cross the driver, never
    rows). Shape: rows route by hash(key) % P, one lexsort per partition,
    segmented cumsum + maximum.reduceat — O(rows/P) vector work, one
    shuffle. Overflow guard: asserts |cumsum| < 2^62 (at vi ≤ 5.6e8 and
    N = 1e5 that allows ~8000 rows/key; rows/key shrinks as N grows since
    N multiplies the bound linearly but rows/key grows sublinearly in sf).
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema([(key, key_type), ("drift", pa.int64())])
    S, N = int(total_sum), int(total_n)

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def run_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        ids = df[id_col].values
        kvals = df[key].values
        kcodes, kuniq = pd.factorize(kvals, sort=True)
        order = np.lexsort((ids, ts, kcodes))
        kcodes = kcodes[order]
        vi = np.floor(np.asarray(df[val_col].values[order], np.float64) * scale)
        d = N * vi.astype(np.int64) - S
        n = len(d)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = kcodes[1:] != kcodes[:-1]
        starts = np.flatnonzero(new_key)
        # a-priori overflow guard (checked BEFORE the cumsum can wrap): the
        # segmented trick runs ONE GLOBAL cumsum, so bound |Σd| over the
        # whole partition, not just the longest key run
        assert int(np.abs(d).max(initial=0)) * n < (1 << 62), (
            "cusum_drift: int64 headroom (shrink the partition or scale)"
        )
        cs = np.cumsum(d)
        # per-key cumsum: subtract the global running total just before
        # each key's first row (0 for the first key)
        base = np.zeros(n, np.int64)
        base[starts[1:]] = cs[starts[1:] - 1]
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        cs = cs - base[key_start]
        acs = np.abs(cs)
        drift = np.maximum.reduceat(acs, starts)
        return pa.table(
            {
                key: pa.array(kuniq[kcodes[starts]], key_type),
                "drift": pa.array(drift.astype(np.int64)),
            }
        )

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(run_part, batch_format="pandas")
    )


def collect_seq(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    sep: str = ",",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Ordered collect/group-concat: per key, the ``sep``-joined sequence of
    ``val_col`` in (ts, id) order plus the element count — the SQL
    ``string_agg(x, sep ORDER BY ts, id)`` / collect_list pattern (e.g.
    per-user event-type journeys, per-conversation role sequences).

    Keys route by hash(key) % P; each partition sorts once and joins per
    key (string building is inherently per-key; the sort and grouping are
    vectorized). A key's full sequence lives in one task — same contract
    as sessionize."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [(key, key_type), ("seq", pa.string()), ("n_events", pa.int64())]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def concat_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        df = df.sort_values([key, ts_col, id_col], kind="stable")
        g = df.groupby(key, sort=True)[val_col]
        out = pd.DataFrame(
            {"seq": g.agg(sep.join), "n_events": g.size().astype(np.int64)}
        ).reset_index()
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(concat_part, batch_format="pandas")
    )


def lag_transitions(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """First-order Markov transition counts: per key in (ts, id) order, the
    (previous ``val_col``, current ``val_col``) bigram, counted globally —
    (from_type, to_type, n). The SQL ``LAG(x) OVER (PARTITION BY key ORDER
    BY ts, id)`` + GROUP BY pattern (user-journey transition matrices,
    conversation role grammars).

    Same shape as running_window: rows route by hash(key) % P, each
    partition does ONE vectorized lexsort, masks out each key's first row
    (no predecessor), and pre-aggregates its (from, to) counts — the
    shuffle after the per-partition pass carries at most |types|^2 rows per
    partition, so the final combine is O(P · types^2) regardless of row
    count."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np
    from ccl_ray.stages.aggregates import partial_sum_agg

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [("from_type", pa.string()), ("to_type", pa.string()), ("n", pa.int64())]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def trans_part(df: pd.DataFrame) -> pa.Table:
        if len(df) < 1:
            return out_schema.empty_table()
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df[id_col].values, ts, kcodes))
        kcodes = kcodes[order]
        vals = df[val_col].values[order]
        same_key = np.zeros(len(df), bool)
        same_key[1:] = kcodes[1:] == kcodes[:-1]
        frm = np.roll(vals, 1)[same_key]
        to = vals[same_key]
        if not len(to):
            return out_schema.empty_table()
        out = (
            pd.DataFrame({"from_type": frm, "to_type": to})
            .groupby(["from_type", "to_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    partials = (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(trans_part, batch_format="pandas")
    )
    return partial_sum_agg(partials, ["from_type", "to_type"], {"n": "n"})


def lag_ngrams(
    events: "rd.Dataset",
    n: int,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Order-(n−1) Markov n-gram counts: per key in (ts, id) order, every
    window of n consecutive ``val_col`` values, counted globally —
    (t1..tn, cnt). lag_transitions is the n=2 special case kept separate
    for its fixed (from_type, to_type) schema; windows never cross keys
    (a row contributes only when its n−1 predecessors share its key).
    Same shuffle bound: per-partition pre-aggregation caps the exchange at
    |vocab|^n rows per partition."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np
    from ccl_ray.stages.aggregates import partial_sum_agg

    assert n >= 2, "lag_ngrams: n must be >= 2"
    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    cols = [f"t{i + 1}" for i in range(n)]
    out_schema = pa.schema([(c, pa.string()) for c in cols] + [("cnt", pa.int64())])

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def gram_part(df: pd.DataFrame) -> pa.Table:
        if len(df) < n:
            return out_schema.empty_table()
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df[id_col].values, ts, kcodes))
        kcodes = kcodes[order]
        vals = df[val_col].values[order]
        ok = kcodes[n - 1 :] == kcodes[: len(kcodes) - n + 1]
        if not ok.any():
            return out_schema.empty_table()
        data = {
            cols[i]: vals[i : len(vals) - n + 1 + i][ok] for i in range(n)
        }
        out = (
            pd.DataFrame(data)
            .groupby(cols, sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    partials = (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gram_part, batch_format="pandas")
    )
    return partial_sum_agg(partials, cols, {"cnt": "cnt"})


def ordered_gaps(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attr_col: str = "event_type",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Inter-event gaps: per key in (ts, id) order, the microseconds since
    the key's PREVIOUS row, attributed to the LATER row's ``attr_col`` —
    (attr, delta_us), one row per non-first event. Feeds grouped
    distributions of arrival gaps (e.g. exact_group_quantile for median
    inter-event time per type). Same single-lexsort partition pass as
    running_window."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema([(attr_col, pa.string()), ("delta_us", pa.int64())])

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                attr_col: batch.column(attr_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def gaps_part(df: pd.DataFrame) -> pa.Table:
        if len(df) < 2:
            return out_schema.empty_table()
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df[id_col].values, ts, kcodes))
        kcodes, ts = kcodes[order], ts[order]
        attrs = df[attr_col].values[order]
        same = kcodes[1:] == kcodes[:-1]
        delta = (ts[1:] - ts[:-1])[same]
        return pa.table(
            {attr_col: pa.array(attrs[1:][same], pa.string()),
             "delta_us": pa.array(delta, pa.int64())}
        )

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps_part, batch_format="pandas")
    )


def longest_streak(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """(key, n_events, max_streak): the longest run of consecutive equal
    ``val_col`` values per key in (ts, id) order — the gaps-and-islands
    run-length statistic, computed as one vectorized run-boundary cumsum
    per hash(key) partition (no per-key Python)."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [(key, key_type), ("n_events", pa.int64()), ("max_streak", pa.int64())]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def streak_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df[id_col].values, ts, kcodes))
        kcodes = kcodes[order]
        vals = df[val_col].values[order]
        n = len(vals)
        # run id increments at every key change or value change
        new_run = np.empty(n, bool)
        new_run[0] = True
        new_run[1:] = (kcodes[1:] != kcodes[:-1]) | (vals[1:] != vals[:-1])
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_key = kcodes[new_run]  # key code of each run
        per = pd.DataFrame({"k": run_key, "len": run_len})
        g = per.groupby("k", sort=True)["len"]
        keys_sorted = df[key].values[order][new_run]
        # first run of each key carries the key's value at the group index
        firsts = pd.Series(keys_sorted).groupby(run_key, sort=True).first()
        nev = pd.Series(np.ones(n, np.int64)).groupby(kcodes, sort=True).sum()
        return pa.table(
            {
                key: pa.array(firsts.to_numpy(), key_type),
                "n_events": pa.array(nev.to_numpy(np.int64)),
                "max_streak": pa.array(g.max().to_numpy(np.int64)),
            }
        )

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(streak_part, batch_format="pandas")
    )


def windowed_pairs(
    events: "rd.Dataset",
    delta_us: int,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Episode mining: (type_from, type_to, n_pairs) over all ORDERED event
    pairs of one key at most ``delta_us`` apart — pair (i → j) counts when
    i precedes j in (ts, id) order and ts_j − ts_i ≤ δ. Fully vectorized
    per hash(key) partition: one lexsort, per-row window lower bounds via a
    single searchsorted over a per-key-offset composite key (each key's
    block is shifted by span+δ+2 so bounds cannot cross keys), then the
    repeat/arange gather expands windows without a Python loop. Work is
    Σ window sizes — bounded by δ × per-key event rate, stated, not hidden;
    per-partition pre-aggregation caps the shuffle at |vocab|² rows."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_part_np
    from ccl_ray.stages.aggregates import partial_sum_agg

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [("type_from", pa.string()), ("type_to", pa.string()), ("n_pairs", pa.int64())]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                val_col: batch.column(val_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def pairs_part(df: pd.DataFrame) -> pa.Table:
        if len(df) < 2:
            return out_schema.empty_table()
        kcodes, _ = pd.factorize(df[key].values, sort=True)
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df[id_col].values, ts, kcodes))
        kcodes, ts = kcodes[order], ts[order]
        vals = df[val_col].values[order]
        rel = ts - ts.min()
        span = int(rel.max()) + delta_us + 2
        ckey = kcodes.astype(np.int64) * span + rel
        lo = np.searchsorted(ckey, ckey - delta_us, side="left")
        idx = np.arange(len(ckey))
        cnt = idx - lo  # window [lo_j, j) — all earlier rows of the same key
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        rep_lo = np.repeat(lo, cnt)
        rep_cum = np.repeat(np.cumsum(cnt) - cnt, cnt)
        i_pos = rep_lo + (np.arange(total) - rep_cum)
        j_pos = np.repeat(idx, cnt)
        out = (
            pd.DataFrame({"type_from": vals[i_pos], "type_to": vals[j_pos]})
            .groupby(["type_from", "type_to"], sort=False)
            .size()
            .rename("n_pairs")
            .reset_index()
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    partials = (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
    )
    return partial_sum_agg(partials, ["type_from", "type_to"], {"n_pairs": "n_pairs"})


def sessionize(
    events: "rd.Dataset",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Gap-based session windows per key.

    Returns (key, session_idx, n_events, t_start, t_end): a new session
    starts when the gap to the previous event of the same key exceeds
    ``gap_minutes``. session_idx is 1-based in (ts, id) order.
    """
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    # Partition-grouped: keys route by hash(key) % P and one vectorized
    # lexsort pass per partition sessionizes ALL its keys (a per-key
    # map_groups pays a Python round-trip per user — 100k+ at sf0.1).
    from ccl_ray.functions.hashing import hash_part_np

    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)  # ~1/P of the rows per task
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [
            (key, key_type),
            ("session_idx", pa.int64()),
            ("n_events", pa.int64()),
            ("t_start", pa.timestamp("us")),
            ("t_end", pa.timestamp("us")),
        ]
    )

    def route(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key)
        return pa.table(
            {
                key: kcol,
                ts_col: batch.column(ts_col),
                id_col: batch.column(id_col),
                "part": pa.array(hash_part_np(kcol, key_type, P)),
            }
        )

    def sess_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        keys = df[key].values
        ts = df[ts_col].values.astype("datetime64[us]")
        ids = df[id_col].values
        # factorize keys for lexsort regardless of dtype
        kcodes, _ = pd.factorize(keys, sort=True)
        order = np.lexsort((ids, ts.astype(np.int64), kcodes))
        keys, ts, kcodes = keys[order], ts[order], kcodes[order]
        n = len(keys)
        brk = np.ones(n, dtype=np.int64)
        same_key = kcodes[1:] == kcodes[:-1]
        brk[1:] = (~same_key | (np.diff(ts) > gap)).astype(np.int64)
        # per-key session index: global break-cumsum rebased per key run
        csum = np.cumsum(brk)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = ~same_key
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        sess = csum - (csum[key_start] - 1)
        # session boundaries: rows where brk == 1
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [n]])
        out = pd.DataFrame(
            {
                key: keys[starts],
                "session_idx": sess[starts],
                "n_events": (ends - starts).astype(np.int64),
                "t_start": ts[starts],
                "t_end": ts[ends - 1],
            }
        )
        # Explicit Arrow schema: the driver's value-hash does NOT normalize
        # dtypes — emit exactly what the SQL oracle emits (int64 counters,
        # timestamp[us])
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return (
        events.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sess_part, batch_format="pandas")
    )


def funnel_counts(
    events: "rd.Dataset",
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Sequential funnel: users who performed ``steps`` in order, each step
    STRICTLY after the previous one (the earliest-completion chain — stage
    k's threshold is the minimal ts completing stages 1..k, so a user
    counts iff any ordered chain exists). Returns (stage, step, n_users),
    stage 1..len(steps), n_users monotonically non-increasing.

    Scale shape: one hash(user) exchange (a user's events land in one
    partition), then a single vectorized per-partition pass — segmented
    min per step via np.minimum.at over factorized user codes, no sort and
    no per-user Python loop; per-partition stage counts reduce through the
    partial-agg combiner.
    """
    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_strings_np, stable_hash64_np
    from ccl_ray.stages.aggregates import partial_sum_agg

    P = resolve_partitions(num_partitions)
    NEG, POS = -(2**62), 2**62

    def route(t: pa.Table) -> pa.Table:
        col = t.column(user_col)
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype == object:
            h = hash_strings_np(v)
        else:
            h = stable_hash64_np(v.astype(np.int64).view(np.uint64))
        return t.append_column("part", pa.array((h % np.uint64(P)).astype(np.int64)))

    out_schema = pa.schema(
        [("stage", pa.int64()), ("step", pa.string()), ("n_users", pa.int64())]
    )

    def funnel_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        codes, _ = pd.factorize(df[user_col].values, sort=False)
        ts = df[ts_col].values.astype("datetime64[us]").astype(np.int64)
        et = df[type_col].values
        nseg = int(codes.max()) + 1
        thr = np.full(nseg, NEG, np.int64)
        reached = np.ones(nseg, bool)
        counts = []
        for step in steps:
            m = (et == step) & (ts > thr[codes]) & reached[codes]
            cand = np.where(m, ts, POS)
            new = np.full(nseg, POS, np.int64)
            np.minimum.at(new, codes, cand)
            reached &= new < POS
            thr = new
            counts.append(int(reached.sum()))
        return pa.table(
            {
                "stage": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
                "step": pa.array(list(steps), pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    parts = (
        events.select_columns([user_col, ts_col, type_col])
        .map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(funnel_part, batch_format="pandas")
    )
    return partial_sum_agg(parts, ["stage", "step"], {"n_users": "n_users"})


def max_concurrency(
    events: "rd.Dataset",
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    bucket_us: int = 3_600_000_000,
    num_partitions: int | None = None,
) -> pa.Table:
    """Per-key maximum interval concurrency (the classic +1/−1 sweep,
    distributed by time bucket). Each event spans the half-open interval
    [t, t + (1 + floor(value)) seconds) — an end at instant t never
    overlaps a start at t, so ends order before starts on ties (the SQL
    twin's ORDER BY t, d with d ∈ {−1, +1} sorts identically).

    Scale shape: the global time-ordered scan a single-node sweep needs is
    decomposed by FIXED time buckets (default 1 h) — every interval
    endpoint routes by hash((key, bucket)) % P, each partition lexsorts its
    own (key, bucket) segments once and emits per-bucket (net, localmax)
    pairs, and the cross-bucket stitch is an exclusive prefix sum over the
    per-(key, bucket) summary table: max_conc(key) = max_b(offset_b +
    max(0, localmax_b)) where offset_b = Σ net over earlier buckets.
    Concurrency between buckets equals some offset_b and is covered by the
    max(0, ·) term. The summary table is keys × occupied-buckets rows
    (time-span / bucket_us — bounded by calendar time, not data volume;
    ~720 rows/key per month of data), the documented driver pull; the
    event endpoints themselves never leave their partitions.

    Returns an in-memory pa.Table (key, max_conc int64) — key-cardinality
    sized. Exact integers end to end.
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)
    in_schema = events.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    if not isinstance(key_type, pa.DataType):  # pandas-backed input blocks
        try:
            key_type = pa.from_numpy_dtype(np.dtype(key_type))
        except (TypeError, pa.ArrowNotImplementedError):
            key_type = pa.string()
    out_schema = pa.schema(
        [(key, key_type), ("bucket", pa.int64()),
         ("net", pa.int64()), ("localmax", pa.int64())]
    )

    def endpoints(t: pa.Table) -> pa.Table:
        # normalize to µs BEFORE the int cast: pandas-backed blocks carry
        # timestamp[ns] and a bare int64 cast would mix ns with µs durations
        s = (
            t.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        dur = (
            1 + np.floor(t.column(val_col).to_numpy(zero_copy_only=False))
        ).astype(np.int64) * 1_000_000
        e = s + dur
        kcol = t.column(key)
        return pa.table(
            {
                key: pa.concat_arrays([kcol.combine_chunks(), kcol.combine_chunks()]),
                "t": pa.array(np.concatenate([s, e])),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
                    )
                ),
            }
        )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["bucket"] = df["t"].to_numpy(np.int64) // bucket_us
        h = pd.util.hash_pandas_object(df[[key, "bucket"]], index=False).to_numpy()
        df["part"] = (h % np.uint64(P)).astype(np.int32)
        return df

    def sweep_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        kcodes, kuniq = pd.factorize(df[key].values, sort=True)
        b = df["bucket"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        order = np.lexsort((d, t, b, kcodes))  # ends before starts on tied t
        kcodes, b, d = kcodes[order], b[order], d[order]
        n = len(d)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (kcodes[1:] != kcodes[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        cs = np.cumsum(d)
        base = np.zeros(n, np.int64)
        base[starts[1:]] = cs[starts[1:] - 1]
        seg_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        cs = cs - base[seg_start]  # per-(key,bucket) local prefix sums
        nets = np.add.reduceat(d, starts)
        localmax = np.maximum.reduceat(cs, starts)
        return pa.table(
            {
                key: pa.array(kuniq[kcodes[starts]], key_type),
                "bucket": pa.array(b[starts]),
                "net": pa.array(nets.astype(np.int64)),
                "localmax": pa.array(localmax.astype(np.int64)),
            }
        )

    summary = (
        events.select_columns([key, ts_col, val_col])
        .map_batches(endpoints, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(sweep_part, batch_format="pandas")
        .to_pandas()
    )
    if not len(summary):  # all-empty Datasets lose their columns in to_pandas
        return out_schema.empty_table().select([key]).append_column(
            "max_conc", pa.array([], pa.int64())
        )
    # cross-bucket stitch: exclusive prefix of net per key in bucket order
    summary = summary.sort_values([key, "bucket"], kind="stable")
    g = summary.groupby(key, sort=True)
    offset = g["net"].cumsum() - summary["net"]
    cand = offset + np.maximum(summary["localmax"].to_numpy(np.int64), 0)
    best = cand.groupby(summary[key]).max()
    return pa.table(
        {key: pa.array(best.index.to_numpy(), key_type),
         "max_conc": pa.array(best.to_numpy(np.int64))}
    )
