"""Mini-driver: every queries() entry vs its oracle_sql() twin (sf0.001).

Replicates the external correctness gate: row count, column names, and
order-insensitive value equality (sorted by all columns). Catching a
mismatch here is much cheaper than at the driver's sf0.01 run.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

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
            # Ray quirk: to_pandas() of an all-empty Dataset drops the
            # schema even though ds.schema() knows it
            df = pd.DataFrame({f.name: pd.Series(dtype="object") for f in res.schema().base_schema})
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
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con):
    got_raw = _to_pandas(ALL_QUERIES[name](SF_DIR))
    want_raw = con.execute(ORACLES[name]).df()
    # Driver-faithful dtype-KIND check: the external gate hashes values
    # without normalizing dtypes, so int64 vs HUGEINT→float64 fails there
    # even when values match (this is what broke sessionize in round 1).
    # Timestamp unit skew (ns vs us) is known-tolerated (events_hourly was
    # green in round 1), hence kind — not exact dtype — comparison.
    for c in sorted(set(got_raw.columns) & set(want_raw.columns)):
        gd, wd = got_raw[c].dtype, want_raw[c].dtype
        if len(got_raw) and len(want_raw):
            assert gd.kind == wd.kind, f"{name}.{c}: engine dtype {gd} !~ oracle dtype {wd}"
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"rows: ray={len(got)} sql={len(want)}"
    for c in got.columns:
        g, w = got[c].values, want[c].values
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            both_nan = pd.isna(g) & pd.isna(w)
            ok = both_nan | np.isclose(
                g.astype(np.float64), w.astype(np.float64), rtol=0, atol=1e-9, equal_nan=True
            )
            assert ok.all(), f"{name}.{c}: {np.argwhere(~ok)[:5]}"
        else:
            assert (g == w).all() or (pd.isna(g) == pd.isna(w)).all() and (
                g[~pd.isna(g)] == w[~pd.isna(w)]
            ).all(), f"{name}.{c}"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    got = _to_pandas(ALL_QUERIES[name](SF_DIR))
    assert len(got) >= 0 and len(got.columns) > 0


def test_entry_smoke():
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
    assert set(df.columns) == {"event_id", "label", "score"}


def test_sessionize_string_key_and_hopping_int_key():
    """Key-type plumbing: windows must work for string AND int keys."""
    import pyarrow as pa

    import ray.data as rd

    from ccl_ray.stages.window import hopping_window, sessionize

    ev = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "ts", "value"])
    s = sessionize(ev, key="event_type", gap_minutes=30).to_pandas()
    assert len(s) > 0 and s["event_type"].dtype == object
    h = hopping_window(ev, key="user_id", size_hours=2, hop_hours=1).to_pandas()
    assert len(h) > 0 and str(h["user_id"].dtype) == "int64"
