"""Exact distributed order statistics (k-th smallest / quantiles) per group.

The t-digest in stages/sketch.py answers quantile queries approximately in one
pass; this module answers them EXACTLY with a radix bisection — the classic
distributed-selection tradeoff (multiple cheap counting scans instead of one
approximate sketch). Reference parity: the reference engine has no quantile
operator at all; this is part of the training-data extension surface
(per-group exact medians for quality-score cut lines, length caps, etc.).

Algorithm (per group, all groups advanced together):
  1. Map each float64 to a uint64 whose unsigned order equals the float's
     total order (IEEE-754 trick: flip all bits of negatives, flip only the
     sign bit of non-negatives; -0.0 normalized to +0.0 first so the two
     zeros cannot straddle a selection boundary).
  2. Four rounds of 16-bit radix counting: each round histograms the current
     digit of the rows still matching the group's selected prefix, the
     driver picks the digit where the cumulative count crosses k, and the
     prefix extends by 16 bits. After 4 rounds the prefix IS the value.
  3. Even-count interpolation needs the k-th and (k+1)-th statistics; both
     targets ride the same scan (one histogram serves both while their
     prefixes agree, which is every round until they diverge — each round
     histograms the union of live prefixes, at most 2 per group).

Scale shape: each round is one map_batches counting pass producing sparse
(group, prefix_id, digit, count) partials + a partial-agg reduce; the
driver-side pull is bounded by groups × live-prefixes × 65536 rows of int64
(a few MB for the gate's ~10 groups — document the G·2^16 bound when adding
high-cardinality group keys; for those, cut the digit to 8 bits). Data rows
never move: 4 counting scans replace a full sort-based shuffle of the column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _order_key(x: np.ndarray) -> np.ndarray:
    """uint64 keys whose unsigned order equals the float64 total order."""
    x = np.where(x == 0.0, 0.0, x)  # -0.0 -> +0.0
    b = np.ascontiguousarray(x, np.float64).view(np.uint64)
    neg = b >> np.uint64(63) == 1
    out = np.where(neg, ~b, b | np.uint64(1 << 63))
    return out.astype(np.uint64)


def _key_to_float(k: int) -> float:
    """Inverse of _order_key for a single selected key."""
    k = int(k)
    if k & (1 << 63):
        raw = k & ~(1 << 63)
    else:
        raw = (~k) & ((1 << 64) - 1)
    return float(np.array([raw], np.uint64).view(np.float64)[0])


def exact_group_quantile(
    ds: "rd.Dataset",
    group: str,
    col: str,
    q: float = 0.5,
) -> "rd.Dataset":
    """(group, n, q<q>) — the EXACT per-group quantile with SQL
    quantile_cont interpolation: h = (n-1)*q, result = x_lo + (x_hi - x_lo)
    * frac(h) over the 0-indexed order statistics lo=floor(h), hi=ceil(h).
    q=0.5 is the exact median. Rounded to 1e-6 half-away-from-zero to match
    SQL round()."""
    from ccl_ray.stages.aggregates import partial_sum_agg

    # one counting-side materialization: group sizes (tiny)
    sizes = partial_sum_agg(
        ds.select_columns([group]), [group], {}, count_as="n"
    ).to_pandas()
    sizes = sizes.sort_values(group).reset_index(drop=True)
    groups = list(sizes[group])
    gidx = {g: i for i, g in enumerate(groups)}
    n = sizes["n"].to_numpy(np.int64)

    # per-group selection targets (0-indexed ranks), 1 or 2 per group
    h = (n - 1) * float(q)
    lo_rank = np.floor(h).astype(np.int64)
    hi_rank = np.ceil(h).astype(np.int64)
    frac = h - lo_rank

    # state per (group, target): remaining rank within the live prefix,
    # and the 16-bit digits selected so far
    targets: dict[tuple[int, int], dict] = {}
    for i in range(len(groups)):
        targets[(i, 0)] = {"rank": int(lo_rank[i]), "digits": ()}
        if hi_rank[i] != lo_rank[i]:
            targets[(i, 1)] = {"rank": int(hi_rank[i]), "digits": ()}

    data = ds.select_columns([group, col]).materialize()

    for rnd in range(4):
        shift = np.uint64(48 - 16 * rnd)
        # live prefixes this round (≤2 per group: the lo/hi targets share
        # one histogram until their selected digits diverge)
        pref_id: dict[tuple[int, tuple], int] = {}
        for (gi, _t), st in targets.items():
            pref_id.setdefault((gi, st["digits"]), len(pref_id))

        def count_round(df: pd.DataFrame, _pref=pref_id, _gidx=gidx,
                        _rnd=rnd, _shift=shift) -> pa.Table:
            vals = np.asarray(df[col].values, np.float64)
            keys = _order_key(vals)
            gis = df[group].map(_gidx).to_numpy(np.int64)
            out_p, out_d, out_c = [], [], []
            for (gi, digits), pid in _pref.items():
                m = gis == gi
                k = keys[m]
                for lvl, dg in enumerate(digits):
                    k = k[(k >> np.uint64(48 - 16 * lvl)) & np.uint64(0xFFFF) == dg]
                if not len(k):
                    continue
                dig = ((k >> _shift) & np.uint64(0xFFFF)).astype(np.int64)
                u, c = np.unique(dig, return_counts=True)
                out_p.extend([pid] * len(u))
                out_d.extend(u.tolist())
                out_c.extend(c.tolist())
            return pa.table(
                {"pid": pa.array(out_p, pa.int64()),
                 "dig": pa.array(out_d, pa.int64()),
                 "cnt": pa.array(out_c, pa.int64())}
            )

        hist = partial_sum_agg(
            data.map_batches(count_round, batch_format="pandas"),
            ["pid", "dig"], {"cnt": "cnt"},
        ).to_pandas()  # bounded: live-prefixes × ≤65536 rows

        # advance every target through its prefix's histogram
        by_pid = {pid: grp.sort_values("dig") for pid, grp in hist.groupby("pid")}
        for (gi, _t), st in targets.items():
            pid = pref_id[(gi, st["digits"])]
            gh = by_pid[pid]
            digs = gh["dig"].to_numpy(np.int64)
            cnts = gh["cnt"].to_numpy(np.int64)
            cum = np.cumsum(cnts)
            j = int(np.searchsorted(cum, st["rank"] + 1))
            before = int(cum[j - 1]) if j else 0
            st["rank"] -= before
            st["digits"] = st["digits"] + (int(digs[j]),)

    # assemble: digits -> uint64 key -> float
    res_lo = np.empty(len(groups), np.float64)
    res_hi = np.empty(len(groups), np.float64)
    for (gi, t), st in targets.items():
        k = 0
        for dg in st["digits"]:
            k = (k << 16) | dg
        v = _key_to_float(k)
        if t == 0:
            res_lo[gi] = v
        else:
            res_hi[gi] = v
    for i in range(len(groups)):
        if (i, 1) not in targets:
            res_hi[i] = res_lo[i]
    # SQL quantile_cont interpolation order: lo + (hi - lo) * frac
    out = res_lo + (res_hi - res_lo) * frac
    out = np.copysign(np.floor(np.abs(out) * 1e6 + 0.5) / 1e6, out)

    table = pa.table(
        {
            group: pa.Table.from_pandas(sizes[[group]], preserve_index=False).column(group),
            "n": pa.array(n, pa.int64()),
            f"q{str(q).replace('.', '_')}": pa.array(out, pa.float64()),
        }
    )
    return rd.from_arrow(table)


def exact_group_weighted_median(
    ds: "rd.Dataset",
    group: str,
    col: str,
    weight_col: str,
) -> "rd.Dataset":
    """(group, tw, wmedian) — the EXACT per-group lower weighted median:
    the smallest value x with cumweight(<= x) * 2 >= total_weight (integer
    weights; the SQL window twin is ``min(value) WHERE cw*2 >= tw``).

    Same radix bisection as exact_group_quantile with the counting
    histogram summing WEIGHTS instead of rows — one target per group, no
    interpolation (the answer is an actual data value, bit-exact)."""
    from ccl_ray.stages.aggregates import partial_sum_agg

    sizes = partial_sum_agg(
        ds.select_columns([group, weight_col]), [group], {weight_col: "tw"}
    ).to_pandas()
    sizes = sizes.sort_values(group).reset_index(drop=True)
    groups = list(sizes[group])
    gidx = {g: i for i, g in enumerate(groups)}
    tw = sizes["tw"].to_numpy(np.int64)

    # smallest x with cumw >= ceil(tw/2): 1-indexed weighted rank target
    want = (tw + 1) // 2
    state = [{"rank": int(w), "digits": ()} for w in want]

    data = ds.select_columns([group, col, weight_col]).materialize()

    for rnd in range(4):
        shift = np.uint64(48 - 16 * rnd)

        def count_round(df: pd.DataFrame, _state=state, _gidx=gidx,
                        _shift=shift, _rnd=rnd) -> pa.Table:
            vals = np.asarray(df[col].values, np.float64)
            wts = np.asarray(df[weight_col].values, np.int64)
            keys = _order_key(vals)
            gis = df[group].map(_gidx).to_numpy(np.int64)
            out_g, out_d, out_c = [], [], []
            for gi, st in enumerate(_state):
                m = gis == gi
                k, w = keys[m], wts[m]
                for lvl, dg in enumerate(st["digits"]):
                    keep = (k >> np.uint64(48 - 16 * lvl)) & np.uint64(0xFFFF) == dg
                    k, w = k[keep], w[keep]
                if not len(k):
                    continue
                dig = ((k >> _shift) & np.uint64(0xFFFF)).astype(np.int64)
                order = np.argsort(dig, kind="stable")
                dig, w = dig[order], w[order]
                new = np.empty(len(dig), bool)
                new[0] = True
                new[1:] = dig[1:] != dig[:-1]
                starts = np.nonzero(new)[0]
                out_g.extend([gi] * len(starts))
                out_d.extend(dig[starts].tolist())
                out_c.extend(np.add.reduceat(w, starts).tolist())
            return pa.table(
                {"gi": pa.array(out_g, pa.int64()),
                 "dig": pa.array(out_d, pa.int64()),
                 "cnt": pa.array(out_c, pa.int64())}
            )

        hist = partial_sum_agg(
            data.map_batches(count_round, batch_format="pandas"),
            ["gi", "dig"], {"cnt": "cnt"},
        ).to_pandas()
        by_gi = {gi: grp.sort_values("dig") for gi, grp in hist.groupby("gi")}
        for gi, st in enumerate(state):
            gh = by_gi[gi]
            digs = gh["dig"].to_numpy(np.int64)
            cnts = gh["cnt"].to_numpy(np.int64)
            cum = np.cumsum(cnts)
            j = int(np.searchsorted(cum, st["rank"]))
            before = int(cum[j - 1]) if j else 0
            st["rank"] -= before
            st["digits"] = st["digits"] + (int(digs[j]),)

    res = np.empty(len(groups), np.float64)
    for gi, st in enumerate(state):
        k = 0
        for dg in st["digits"]:
            k = (k << 16) | dg
        res[gi] = _key_to_float(k)

    table = pa.table(
        {
            group: pa.Table.from_pandas(sizes[[group]], preserve_index=False).column(group),
            "tw": pa.array(tw, pa.int64()),
            "wmedian": pa.array(res, pa.float64()),
        }
    )
    return rd.from_arrow(table)
