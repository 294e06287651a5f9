"""Round-5 batch-11 operators: per-group bottom-k sampling and the
integer-exact per-key CUSUM drift scan (each vs a sequential brute-force
oracle, with P variation for partition invariance)."""
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.sample import group_bottomk
from ccl_ray.stages.window import cusum_drift


def _md5_low(v) -> int:
    return int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16], "little")


def _mk_docs(n=200, langs=("de", "en", "fr")):
    rng = np.random.RandomState(7)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 13 + 5,
            "lang": rng.choice(langs, n),
        }
    )


def test_group_bottomk_vs_bruteforce():
    df = _mk_docs()
    want = (
        df.assign(h=[_md5_low(v) for v in df["doc_id"]])
        .sort_values(["lang", "h", "doc_id"])
        .groupby("lang")
        .head(7)[["doc_id", "lang"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    for P in (1, 4):
        ds = rd.from_pandas(df).repartition(P)
        got = (
            group_bottomk(ds, 7, id_col="doc_id", group_col="lang")
            .to_pandas()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "lang"]], want)


def test_group_bottomk_small_groups_kept_whole():
    # a group with fewer than k rows must survive intact
    df = pd.DataFrame(
        {"doc_id": np.arange(12, dtype=np.int64), "lang": ["x"] * 10 + ["y"] * 2}
    )
    got = group_bottomk(rd.from_pandas(df).repartition(3), 5,
                        id_col="doc_id", group_col="lang").to_pandas()
    assert (got["lang"] == "y").sum() == 2
    assert (got["lang"] == "x").sum() == 5


def _brute_cusum(df, S, N):
    out = {}
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cs, best = 0, 0
        for v in g["value"]:
            cs += N * int(np.floor(v * 1e6)) - S
            best = max(best, abs(cs))
        out[uid] = best
    return out


def test_cusum_drift_vs_bruteforce():
    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
            "value": rng.uniform(-3.0, 9.0, n).round(3),
        }
    )
    vi = np.floor(df["value"].values * 1e6).astype(np.int64)
    S, N = int(vi.sum()), n
    want = _brute_cusum(df, S, N)
    for P in (1, 4):
        ds = rd.from_pandas(df).repartition(P)
        got = cusum_drift(ds, total_sum=S, total_n=N).to_pandas()
        got_map = dict(zip(got["user_id"], got["drift"]))
        assert got_map == want


def test_cusum_drift_overflow_guard():
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.zeros(4, np.int64),
            "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(range(4), unit="s"),
            "value": [1e9, 1e9, 1e9, 1e9],
        }
    )
    import pytest

    with pytest.raises(Exception, match="headroom"):
        cusum_drift(
            rd.from_pandas(df), total_sum=0, total_n=10**9
        ).to_pandas()
