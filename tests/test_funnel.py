"""funnel_counts: ordered-chain semantics, strictness, partition invariance."""

import numpy as np
import pandas as pd

import ray.data as rd

from ccl_ray.stages.window import funnel_counts


def _ds(rows, P=1):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df).repartition(P)


def _counts(ds, steps=("a", "b", "c")):
    out = funnel_counts(ds, list(steps)).to_pandas().sort_values("stage")
    return out["n_users"].tolist()


def test_funnel_chain_semantics():
    rows = [
        # u1 completes a->b->c in order
        (1, "2026-01-01 00:00", "a"), (1, "2026-01-01 01:00", "b"),
        (1, "2026-01-01 02:00", "c"),
        # u2 does b before a: reaches stage 1 (a) only — its b precedes a
        (2, "2026-01-01 00:00", "b"), (2, "2026-01-01 01:00", "a"),
        # u3: a then c (no b): stage 1 only
        (3, "2026-01-01 00:00", "a"), (3, "2026-01-01 01:00", "c"),
        # u4: never does a
        (4, "2026-01-01 00:00", "b"), (4, "2026-01-01 01:00", "c"),
        # u5: a, b at the SAME ts as a -> strict > excludes the chain
        (5, "2026-01-01 00:00", "a"), (5, "2026-01-01 00:00", "b"),
        # u6: earliest-completion subtlety — late a also works via early a
        (6, "2026-01-01 00:00", "a"), (6, "2026-01-01 05:00", "a"),
        (6, "2026-01-01 01:00", "b"), (6, "2026-01-01 02:00", "c"),
    ]
    for P in (1, 4):
        assert _counts(_ds(rows, P)) == [5, 2, 2], P


def test_funnel_empty_and_missing_steps():
    assert _counts(_ds([(1, "2026-01-01", "x")])) == [0, 0, 0]
    empty = _ds([(1, "2026-01-01", "a")]).filter(lambda r: False)
    out = funnel_counts(empty, ["a", "b", "c"]).to_pandas()
    # all-empty input: either explicit zero rows or no rows at all
    assert len(out) == 0 or sorted(out["n_users"]) == [0, 0, 0]


def test_funnel_matches_bruteforce_random():
    rng = np.random.default_rng(9)
    n = 5000
    rows = list(
        zip(
            rng.integers(0, 200, n),
            pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="m"),
            rng.choice(["a", "b", "c", "x"], n),
        )
    )
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])

    def brute(df, steps):
        counts = [0] * len(steps)
        for _, g in df.groupby("user_id"):
            thr = pd.Timestamp.min
            for i, s in enumerate(steps):
                cand = g[(g["event_type"] == s) & (g["ts"] > thr)]["ts"]
                if not len(cand):
                    break
                thr = cand.min()
                counts[i] += 1
        return counts

    want = brute(df, ["a", "b", "c"])
    assert _counts(_ds(rows, 5)) == want
