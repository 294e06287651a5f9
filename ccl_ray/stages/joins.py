"""Custom join operators Ray Data lacks: as-of join and range join.

Both follow the contract's custom-operator recipe: compositions of
map_batches + groupby(...).map_groups with an explicit partitioning
assumption, fully vectorized inside each group.

- asof_join: per (left key, left ts), the newest right row with
  right ts <= left ts. Partitioning: hash(key) — all rows of one key meet
  in one group; per-group matching is ONE lexsort + running-maximum scan
  (no per-key or per-row Python).
- range_count_join: per left row, COUNT of right rows with the same key
  and right ts in [left ts - window, left ts). Partitioning: (key, time
  bucket) with build-side replication to the next bucket — the window
  spans at most ceil(window/bucket)+1 buckets, so each (probe, build)
  pair meets exactly once in the probe's own bucket; per-group counting is
  two vectorized searchsorteds. A hot (key, bucket) can be salted by the
  caller like the co-occurrence stars; counts then need a re-sum.

Reference parity note: the reference has no joins at all (SURVEY §2.5 —
its "joins" are label-matching scans); these operators extend the engine
for the training-data/log workloads the north_rule targets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.functions.hashing import stable_hash64_np

_US_PER_HOUR = 3_600_000_000


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Left as-of join: newest right row per key with right_ts <= left_ts.

    Right must be UNIQUE per (key, ts) — pre-aggregate first (a duplicate
    (key, ts) would make "the" matched row ambiguous; DuckDB's ASOF has the
    same requirement for deterministic output). Unmatched left rows keep
    null right values. Output: all left columns + right_vals. Join keys may
    be integer or string (strings route via hash_strings_np and compare via
    per-group factorized codes — no int cast).
    """
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def _key_parts(col: pa.ChunkedArray) -> np.ndarray:
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            from ccl_ray.functions.hashing import hash_strings_np

            h = hash_strings_np(col.to_numpy(zero_copy_only=False))
        else:
            k = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            h = stable_hash64_np(k.view(np.uint64))
        return (h % np.uint64(P)).astype(np.int32)

    def _key_codes(lcol: pa.ChunkedArray, rcol: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
        """int64 codes comparable across the two sides (exact, no hashing)."""
        if pa.types.is_string(lcol.type) or pa.types.is_large_string(lcol.type):
            lk = lcol.to_numpy(zero_copy_only=False)
            rk = rcol.to_numpy(zero_copy_only=False)
            codes, _ = pd.factorize(np.concatenate([rk, lk]))
            return codes[len(rk):].astype(np.int64), codes[: len(rk)].astype(np.int64)
        return (
            lcol.cast(pa.int64()).to_numpy(zero_copy_only=False),
            rcol.cast(pa.int64()).to_numpy(zero_copy_only=False),
        )
    lsch = pa.schema([pa.field(n, t) for n, t in zip(left.schema().names, left.schema().types)])
    rsch = pa.schema([pa.field(n, t) for n, t in zip(right.schema().names, right.schema().types)])
    l_names = list(lsch.names)

    def tag(side: int, key_col: str, names: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            part = _key_parts(batch.column(key_col))
            cols = {"__part": pa.array(part), "__side": pa.array(np.full(batch.num_rows, side, np.int8))}
            for n in l_names:
                cols[n] = batch.column(n) if n in batch.column_names else pa.nulls(
                    batch.num_rows, lsch.field(n).type
                )
            for n in rsch.names:
                cols[n] = batch.column(n) if n in batch.column_names else pa.nulls(
                    batch.num_rows, rsch.field(n).type
                )
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag(0, left_key, l_names), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_key, l_names), batch_format="pyarrow")
    )

    out_names = l_names + right_vals

    def match(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0))
        rt = group.filter(pa.array(side == 1))
        if lt.num_rows == 0:
            return pa.table({n: pa.nulls(0, (lsch.field(n) if n in l_names else rsch.field(n)).type) for n in out_names})
        lk, rk = _key_codes(lt.column(left_key), rt.column(right_key))
        lts = lt.column(left_ts).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        rts = rt.column(right_ts).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        nl, nr = len(lk), len(rk)
        keys = np.concatenate([rk, lk])
        tss = np.concatenate([rts, lts])
        tagv = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
        orig = np.concatenate([np.arange(nr), np.arange(nl)])
        order = np.lexsort((tagv, tss, keys))  # (key, ts, right-before-left)
        keys_s, tag_s, orig_s = keys[order], tagv[order], orig[order]
        right_pos = np.where(tag_s == 0, np.arange(len(order)), -1)
        last_right = np.maximum.accumulate(right_pos)
        is_left = tag_s == 1
        lr = last_right[is_left]
        # valid only if the preceding right row is in the SAME key run
        valid = (lr >= 0) & (keys_s[np.maximum(lr, 0)] == keys_s[is_left])
        match_right = np.where(valid, orig_s[np.maximum(lr, 0)], -1)
        left_orig = orig_s[is_left]
        # scatter back into left order
        match_full = np.empty(nl, np.int64)
        match_full[left_orig] = match_right
        import pyarrow.compute as pc

        idx = pa.array(np.where(match_full >= 0, match_full, 0), pa.int64())
        mask = pa.array(match_full >= 0)
        cols = {n: lt.column(n) for n in l_names}
        for n in right_vals:
            taken = pc.take(rt.column(n), idx) if nr else pa.nulls(nl, rsch.field(n).type)
            cols[n] = pc.if_else(mask, taken, pa.nulls(nl, rsch.field(n).type)) if nr else taken
        return pa.table({n: cols[n] for n in out_names})

    return tagged.groupby("__part").map_groups(match, batch_format="pyarrow")


def range_count_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    key: str,
    ts_col: str,
    window_hours: int = 1,
    out_col: str = "n_in_window",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Per left row: count of right rows with same key and ts in
    [left_ts - window, left_ts).

    Bucketed replication + partition-grouped counting: probe rows go to
    their window-sized time bucket, build rows replicate forward one
    bucket (every candidate pair meets exactly once in the probe's
    bucket); buckets route by hash(key, bucket) % P and each partition
    counts ALL its buckets in ONE pass — a merged lexsort where each probe
    contributes two sentinel rows (at ts and ts-window) and the count is
    the difference of build-cumsums, rebased per (key, bucket) segment.
    No per-bucket Python round-trip and no per-bucket loop.
    """
    win_us = window_hours * _US_PER_HOUR
    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
            keys = batch.column(key).to_numpy(zero_copy_only=False)
            ids = (
                batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
                if side == 0
                else np.full(n, -1, np.int64)
            )
            bucket = ts // win_us
            if side == 0:
                b = [bucket]
            else:
                b = [bucket, bucket + 1]  # build side replicates forward
            reps = len(b)
            return pa.table(
                {
                    key: pa.array(np.concatenate([keys] * reps) if n else keys,
                                  batch.schema.field(key).type),
                    "bucket": pa.array(np.concatenate(b) if n else np.empty(0, np.int64)),
                    "ts_us": pa.array(np.concatenate([ts] * reps) if n else ts),
                    "pid": pa.array(np.concatenate([ids] * reps) if n else ids),
                    "probe": pa.array(
                        np.concatenate([np.full(n, side == 0, bool)] * reps)
                        if n
                        else np.empty(0, bool)
                    ),
                }
            )

        return fn

    def route(batch: pa.Table) -> pa.Table:
        from ccl_ray.functions.hashing import hash_strings_np

        keys = batch.column(key).to_numpy(zero_copy_only=False)
        bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
        if keys.dtype == object:
            kh = hash_strings_np(keys)
        else:
            kh = stable_hash64_np(keys.astype(np.int64).view(np.uint64))
        with np.errstate(over="ignore"):
            part = (
                stable_hash64_np(kh * np.uint64(1099511628211) + bucket.view(np.uint64))
                % np.uint64(P)
            ).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    both = (
        left.map_batches(prep(0), batch_format="pyarrow")
        .union(right.map_batches(prep(1), batch_format="pyarrow"))
        .map_batches(route, batch_format="pyarrow")
    )

    def count_part(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()), out_col: pa.array([], pa.int64())})
        if not len(df):
            return empty
        keys = df[key].values
        kcodes, _ = pd.factorize(keys, sort=True)
        bucket = df["bucket"].values.astype(np.int64)
        ts = df["ts_us"].values.astype(np.int64)
        pid = df["pid"].values.astype(np.int64)
        probe = df["probe"].values.astype(bool)
        # explode: builds once; probes → two sentinel rows (hi at ts,
        # lo at ts - win). Sentinels sort BEFORE builds at equal ts (the
        # window is [ts-win, ts): equal-ts builds count at the lo bound and
        # not at the hi bound — both achieved by the same tie order).
        b_sel = ~probe
        p_sel = probe
        k2 = np.concatenate([kcodes[b_sel], kcodes[p_sel], kcodes[p_sel]])
        bk2 = np.concatenate([bucket[b_sel], bucket[p_sel], bucket[p_sel]])
        ts2 = np.concatenate([ts[b_sel], ts[p_sel], ts[p_sel] - win_us])
        n_b, n_p = int(b_sel.sum()), int(p_sel.sum())
        if n_p == 0:
            return empty
        is_build = np.concatenate([np.ones(n_b, np.int64), np.zeros(2 * n_p, np.int64)])
        # sentinel id: 0..n_p-1 = hi rows, n_p..2n_p-1 = lo rows
        sent = np.concatenate(
            [np.full(n_b, -1, np.int64), np.arange(n_p), np.arange(n_p) + n_p]
        )
        order = np.lexsort((is_build, ts2, bk2, k2))
        kb, bb, ib, sb = k2[order], bk2[order], is_build[order], sent[order]
        n = len(kb)
        cum = np.concatenate([[0], np.cumsum(ib)])  # builds before row i = cum[i]
        seg_new = np.empty(n, bool)
        seg_new[0] = True
        seg_new[1:] = (kb[1:] != kb[:-1]) | (bb[1:] != bb[:-1])
        seg_start = np.maximum.accumulate(np.where(seg_new, np.arange(n), 0))
        builds_before = cum[np.arange(n)] - cum[seg_start]
        hi = np.zeros(n_p, np.int64)
        lo = np.zeros(n_p, np.int64)
        is_hi = (sb >= 0) & (sb < n_p)
        is_lo = sb >= n_p
        hi[sb[is_hi]] = builds_before[is_hi]
        lo[sb[is_lo] - n_p] = builds_before[is_lo]
        cnt = hi - lo
        return pa.table(
            {
                id_col: pa.array(pid[p_sel]),
                out_col: pa.array(cnt),
            }
        )

    return both.groupby("part").map_groups(count_part, batch_format="pandas")
