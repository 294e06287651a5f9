"""Standalone replica of the driver's correctness gate at an arbitrary sf.

Runs every queries() entry against its oracle_sql() twin (row count, sorted
column names, order-insensitive value equality) and prints one line per query.

Usage: python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
        if len(df.columns) == 0:
            df = pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in res.schema().base_schema}
            )
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    # sort float columns on ROUNDED values: engine/oracle floats differing
    # within the allclose tolerance would otherwise interleave differently
    # when the preceding sort keys tie, failing the positional compare
    keys = {}
    for c in df.columns:
        keys[c] = (
            np.round(df[c].values.astype(np.float64), 6)
            if np.issubdtype(df[c].dtype, np.floating)
            else df[c]
        )
    order = pd.DataFrame(keys, index=df.index).sort_values(
        list(df.columns), kind="stable"
    ).index
    return df.loc[order].reset_index(drop=True)


def _values_close(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            if not np.allclose(
                np.asarray(av, dtype=np.float64),
                np.asarray(bv, dtype=np.float64),
                rtol=1e-9,
                atol=1e-9,
                equal_nan=True,
            ):
                return False
        else:
            if not (np.asarray(av) == np.asarray(bv)).all():
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = _to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:<24} ray raised: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ray_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"ROWS  {name:<24} rows={len(got)} (no oracle) [{ray_s:.1f}s]")
            continue
        t0 = time.perf_counter()
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:<24} oracle raised: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql_s = time.perf_counter() - t0
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                ok_vals = _values_close(_canon(got), _canon(exp))
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name:<24} compare raised: {type(e).__name__}: {e}")
                n_fail += 1
                continue
        status = "pass" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
            detail = f" rows {len(got)}/{len(exp)} cols_ok={ok_cols} vals_ok={ok_vals}"
        else:
            detail = f" rows={len(got)}"
        print(f"{status}  {name:<24}{detail} [ray {ray_s:.1f}s, sql {sql_s:.1f}s]")
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
