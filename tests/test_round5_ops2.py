"""Round-5 batch-3 operators: greedy max-coverage, n-gram lags, streaks,
ordered gaps (each vs a sequential brute-force oracle, P variation)."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.setcover import greedy_max_coverage
from ccl_ray.stages.window import lag_ngrams, longest_streak, ordered_gaps

TOK = __import__("re").compile("[A-Za-z0-9]+")


def _brute_cover(docs, k):
    sets = {d: set(TOK.findall(t.lower())) for d, t in docs}
    covered = set()
    out = []
    for r in range(1, k + 1):
        gains = {d: len(s - covered) for d, s in sets.items() if len(s - covered)}
        if not gains:
            break
        best = max(gains, key=lambda d: (gains[d], -d))
        covered |= sets[best]
        out.append((r, best, gains[best], len(covered)))
    return out


def test_greedy_max_coverage_vs_bruteforce():
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab, rng.randint(1, 15))))
        for i in range(25)
    ]
    want = _brute_cover(docs, 5)
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    for P in (1, 4):
        got = greedy_max_coverage(
            rd.from_arrow(tbl).repartition(3), 5,
            cfg=EngineConfig(num_partitions=P),
        ).to_pandas()
        assert list(map(tuple, got.values.tolist())) == want, P


def test_greedy_max_coverage_early_stop():
    # 2 docs covering everything: round 3+ has no uncovered pairs -> 2 rows
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b c", "d e"], pa.string())})
    got = greedy_max_coverage(rd.from_arrow(tbl), 5,
                              cfg=EngineConfig(num_partitions=2)).to_pandas()
    assert got["round"].tolist() == [1, 2]
    assert got["doc_id"].tolist() == [1, 2]
    assert got["covered_total"].tolist() == [3, 5]


def test_lag_ngrams_trigram_known():
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime(["2024-01-01"] * 6) + pd.to_timedelta(
                [0, 1, 2, 3, 0, 1], unit="m"),
            "event_type": ["a", "b", "a", "b", "a", "b"],
        }
    )
    # user 1: abab -> (a,b,a), (b,a,b); user 2: ab -> too short
    ds = rd.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)).repartition(2)
    got = (
        lag_ngrams(ds, 3, num_partitions=3)
        .to_pandas().sort_values(["t1", "t2", "t3"]).reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"t1": ["a", "b"], "t2": ["b", "a"], "t3": ["a", "b"], "cnt": [1, 1]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_streak(df):
    out = {}
    for u, grp in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        vals = grp["event_type"].tolist()
        best = cur = 1
        for i in range(1, len(vals)):
            cur = cur + 1 if vals[i] == vals[i - 1] else 1
            best = max(best, cur)
        out[u] = (len(vals), best)
    return out


def test_longest_streak_vs_bruteforce():
    rng = np.random.RandomState(23)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 40, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
            "event_type": rng.choice(["a", "b"], n),  # 2 types -> long runs
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = longest_streak(ds, num_partitions=4).to_pandas().set_index("user_id")
    for u, (nev, best) in _brute_streak(df).items():
        assert got.loc[u, "n_events"] == nev
        assert got.loc[u, "max_streak"] == best, u


def test_ordered_gaps_known():
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:01",
                 "2024-01-01 00:01:01", "2024-01-01 05:00:00"]),
            "event_type": ["a", "b", "a", "b"],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(ev, preserve_index=False))
    got = (
        ordered_gaps(ds, num_partitions=3)
        .to_pandas().sort_values("delta_us").reset_index(drop=True)
    )
    # user 1 gaps: 1s to (b), 60s to (a); user 2: single event, none
    want = pd.DataFrame(
        {"event_type": ["b", "a"], "delta_us": [1_000_000, 60_000_000]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_windowed_pairs(df, delta_us):
    out = {}
    rows = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    for u, grp in rows.groupby("user_id"):
        g = grp.reset_index(drop=True)
        ts = g["ts"].values.astype("datetime64[us]").astype("int64")
        for j in range(len(g)):
            for i in range(j):
                if ts[j] - ts[i] <= delta_us:
                    k = (g["event_type"][i], g["event_type"][j])
                    out[k] = out.get(k, 0) + 1
    return out


def test_windowed_pairs_vs_bruteforce():
    from ccl_ray.stages.window import windowed_pairs

    rng = np.random.RandomState(31)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 12, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 36_000, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    # duplicate-ts probe: two same-user rows at the identical microsecond
    df.loc[1, ["user_id", "ts"]] = [df.loc[0, "user_id"], df.loc[0, "ts"]]
    want = _brute_windowed_pairs(df, 600_000_000)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    for P in (1, 5):
        got = windowed_pairs(ds, 600_000_000, num_partitions=P).to_pandas()
        got = {(r.type_from, r.type_to): r.n_pairs for r in got.itertuples()}
        assert got == want, P
